package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, SparkSession}

/** fvecs/ivecs binary codecs — the reference's ingest formats
  * (`utilities.py:46-143` readers, `utilities.py:32-40` writer).
  * Layout per record, little-endian, no header: `int32 dim` then
  * `dim × float32` (fvecs) or `dim × int32` (ivecs); node id is the
  * 0-based record index (`utilities.py:61,82`).
  *
  * The codec is driver/fixture-side: harness data arrives as parquet
  * (TESTDATA.md), and a 100 TB deployment would read vectors from a
  * splittable columnar format, not from this stream format. `toDataset`
  * bridges small fvecs fixtures into a distributed Dataset.
  */
object Fvecs {

  private def checkDim(dim: Int, remaining: Int, id: Long): Unit =
    require(dim > 0 && dim.toLong * 4 <= remaining,
      s"corrupt/truncated vecs file: record $id declares dim=$dim " +
        s"with only $remaining payload bytes left")

  def decodeFvecs(bytes: Array[Byte], inputMax: Int = 0): Seq[(Long, Array[Float])] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(Long, Array[Float])]
    var id = 0L
    while (bb.remaining() >= 4 && (inputMax <= 0 || id < inputMax)) {
      val dim = bb.getInt
      checkDim(dim, bb.remaining(), id)
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getFloat; i += 1 }
      out += ((id, v))
      id += 1
    }
    out.result()
  }

  def encodeFvecs(vecs: Seq[Array[Float]]): Array[Byte] = {
    val size = vecs.map(v => 4 + 4 * v.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => bb.putInt(v.length); v.foreach(bb.putFloat) }
    bb.array()
  }

  /** ivecs reader; k > 0 truncates each vector to its first k components
    * (ground-truth convention, `utilities.py:121-123`). */
  def decodeIvecs(bytes: Array[Byte], inputMax: Int = 0, k: Int = 0): Seq[(Long, Array[Int])] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(Long, Array[Int])]
    var id = 0L
    while (bb.remaining() >= 4 && (inputMax <= 0 || id < inputMax)) {
      val dim = bb.getInt
      checkDim(dim, bb.remaining(), id)
      val v = new Array[Int](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getInt; i += 1 }
      out += ((id, if (k > 0 && k < dim) v.take(k) else v))
      id += 1
    }
    out.result()
  }

  def encodeIvecs(vecs: Seq[Array[Int]]): Array[Byte] = {
    val size = vecs.map(v => 4 + 4 * v.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => bb.putInt(v.length); v.foreach(bb.putInt) }
    bb.array()
  }

  def readFvecsFile(path: String, inputMax: Int = 0): Seq[(Long, Array[Float])] =
    decodeFvecs(Files.readAllBytes(Paths.get(path)), inputMax)

  def writeFvecsFile(path: String, vecs: Seq[Array[Float]]): Unit =
    Files.write(Paths.get(path), encodeFvecs(vecs))

  /** Fixture bridge: fvecs bytes → Dataset[(id, vec)]. */
  def toDataset(spark: SparkSession, bytes: Array[Byte],
                inputMax: Int = 0): Dataset[(Long, Array[Float])] = {
    import spark.implicits._
    spark.createDataset(decodeFvecs(bytes, inputMax))
  }
}
