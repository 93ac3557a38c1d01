package graft.io.v2

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 fvecs reader: `spark.read.format("fvecs").load(path)`
  * → `(id BIGINT, vec ARRAY<FLOAT>)` — SURVEY §2.1's scalable route as
  * a first-class source (the programmatic twin is
  * [[graft.io.Fvecs.readDistributed]]; both replace the reference's
  * whole-file driver ingest, `utilities.py:46-65` + `main.py:31`).
  *
  * fvecs has no sync markers, but real corpora (SIFT/GIST/Deep) are
  * fixed-dim, so record boundaries are computable: probe the first
  * record's dim, require `len % (4 + 4·dim) == 0`, and plan
  * record-aligned byte-range partitions. Ids are the global record
  * index, derived from each range's offset — no zipWithIndex pass.
  *
  * Operator pushdown, because a custom source should behave like a
  * built-in one under Catalyst:
  *  - LIMIT caps the planned record count (an `input_max`-style read
  *    plans only ⌈limit/recsPerChunk⌉ partitions);
  *  - column pruning: an id-only projection performs ZERO file reads
  *    (ids are arithmetic over the range), and `count(*)`-style scans
  *    with empty schemas skip decoding entirely.
  *
  * Reads go through the Hadoop FileSystem API with the driver's
  * configuration broadcast to tasks (credentials/FS impls survive on a
  * real cluster, [[org.apache.spark.graft.HadoopConfBridge]]). */
class FvecsDataSource extends TableProvider with DataSourceRegister {
  /** Component width: 4 = float32 (fvecs), 1 = uint8 (bvecs). */
  protected def compBytes: Int = 4
  override def shortName(): String = "fvecs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FvecsTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      s"${shortName()} source needs a path: " +
        s"spark.read.format(\"${shortName()}\").load(path)")
    new FvecsTable(path, compBytes)
  }
}

/** `spark.read.format("bvecs").load(path)` — the same splittable
  * record-aligned scan over bigann's uint8 layout (`int32 dim` +
  * `dim × uint8`), components promoted to float exactly like
  * [[graft.io.Fvecs.decodeBvecs]]. bigann base files run 100 GB+; this
  * keeps them off the driver (the programmatic twin is
  * [[graft.io.Fvecs.readDistributedBvecs]]). */
class BvecsDataSource extends FvecsDataSource {
  override protected def compBytes: Int = 1
  override def shortName(): String = "bvecs"
}

object FvecsTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
}

class FvecsTable(path: String, compBytes: Int = 4) extends Table with SupportsRead {
  override def name(): String =
    s"${if (compBytes == 1) "bvecs" else "fvecs"}:$path"
  override def schema(): StructType = FvecsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FvecsScanBuilder(path, compBytes, options)
}

class FvecsScanBuilder(path: String, compBytes: Int, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var limit: Long = -1L
  private var required: StructType = FvecsTable.Schema

  override def pushLimit(l: Int): Boolean = { limit = l.toLong; true }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val chunkBytes = Option(options.get("chunkbytes")).map(_.toLong)
      .getOrElse(128L << 20)
    new FvecsScan(path, compBytes, chunkBytes, limit, required)
  }
}

final case class FvecsInputPartition(startRec: Long, nRecs: Long) extends InputPartition

class FvecsScan(path: String, compBytes: Int, chunkBytes: Long, limit: Long,
                required: StructType)
    extends Scan with Batch {

  private def fmt: String = if (compBytes == 1) "bvecs" else "fvecs"

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"$fmt $path (limit=$limit, columns=${required.fieldNames.mkString(",")})"

  // (dim, stride, totalRecs) probed once on the driver at planning time
  private lazy val layout: (Int, Long, Long) = {
    val spark = SparkSession.active
    val hp = new HPath(path)
    val fs = FileSystem.get(hp.toUri, spark.sparkContext.hadoopConfiguration)
    val fileLen = fs.getFileStatus(hp).getLen
    require(fileLen >= 4, s"empty/truncated $fmt file: $path")
    val header = new Array[Byte](4)
    val in = fs.open(hp)
    try in.readFully(0L, header) finally in.close()
    val dim = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(dim > 0, s"corrupt $fmt: leading dim=$dim in $path")
    val stride = 4L + compBytes.toLong * dim
    require(fileLen % stride == 0,
      s"$path is not fixed-dim (len=$fileLen, first dim=$dim): " +
        s"variable-dim $fmt is not splittable; use the graft.io.Fvecs driver codec")
    val total = fileLen / stride
    (dim, stride, if (limit >= 0) math.min(total, limit) else total)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (_, stride, totalRecs) = layout
    require(chunkBytes > 0 && chunkBytes <= (1L << 30),
      s"chunkbytes must be in (0, 1 GiB], got $chunkBytes")
    val recsPerChunk = math.max(1L, chunkBytes / stride)
    (0L until totalRecs by recsPerChunk)
      .map(s => FvecsInputPartition(s, math.min(recsPerChunk, totalRecs - s)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (dim, stride, _) = layout
    val conf = org.apache.spark.graft.HadoopConfBridge
      .broadcast(SparkSession.active.sparkContext,
        SparkSession.active.sparkContext.hadoopConfiguration)
    new FvecsReaderFactory(path, compBytes, dim, stride, required, conf)
  }
}

class FvecsReaderFactory(path: String, compBytes: Int, dim: Int, stride: Long,
                         required: StructType,
                         conf: org.apache.spark.graft.HadoopConfBridge.Handle)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[FvecsInputPartition]
    new FvecsPartitionReader(path, compBytes, dim, stride, required, conf,
      fp.startRec, fp.nRecs)
  }
}

class FvecsPartitionReader(path: String, compBytes: Int, dim: Int, stride: Long,
                           required: StructType,
                           conf: org.apache.spark.graft.HadoopConfBridge.Handle,
                           startRec: Long, nRecs: Long)
    extends PartitionReader[InternalRow] {

  private val needVec = required.fieldNames.contains("vec")
  private val fields = required.fieldNames

  // The byte range is read only when vectors are projected; an id-only
  // (or empty, count(*)) schema is pure arithmetic.
  private lazy val bb: ByteBuffer = {
    val fs = FileSystem.get(new java.net.URI(path), conf.conf)
    val in = fs.open(new HPath(path))
    try {
      val buf = new Array[Byte]((nRecs * stride).toInt)
      in.readFully(startRec * stride, buf)
      ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    } finally in.close()
  }

  private var rec = -1L

  override def next(): Boolean = { rec += 1; rec < nRecs }

  override def get(): InternalRow = {
    val values = fields.map {
      case "id" => (startRec + rec): java.lang.Long
      case "vec" =>
        bb.position((rec * stride).toInt)
        val d = bb.getInt
        require(d == dim,
          s"corrupt vecs: record ${startRec + rec} has dim=$d, expected $dim")
        val v = new Array[Float](dim)
        var i = 0
        if (compBytes == 1)
          while (i < dim) { v(i) = (bb.get() & 0xff).toFloat; i += 1 }
        else
          while (i < dim) { v(i) = bb.getFloat; i += 1 }
        ArrayData.toArrayData(v)
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}
