package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Sampling + signal operators that are imperative at the row/group
  * grain but fully distributed:
  *
  *  - per-stratum deterministic reservoir (the "show me 5 docs per
  *    language" debugging/QA sample, and the per-key sampling shape
  *    MRDF's divide uses) via the bottom-n ReservoirSample Aggregator —
  *    order-independent, so the same sample comes back on any
  *    partitioning or cluster size;
  *  - compression-ratio quality signal (deflate bytes ÷ raw bytes):
  *    the classic cheap redundancy detector — boilerplate and
  *    template spam compress far better than prose. Genuine per-row
  *    imperative work (a zlib pass), so it runs in `mapPartitions`
  *    with one Deflater per partition — the documented last-resort
  *    tier, used for exactly the case the guidance reserves it for. */
object SampleOps {

  /** 5 deterministic sample doc ids per language (bottom-5 splitmix64
    * ranks). One partial-aggregated shuffle of (lang → ≤5 ids). */
  def reservoirPerLang(docs: DataFrame, n: Int = 5, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.agg.ReservoirSample(n, seed)
    docs.select(col("lang"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"),
        array_join(transform(col("sample.ids"), _.cast("string")), ",")
          .as("sample_ids"))
      .orderBy(col("lang"))
  }

  /** Per-document deflate ratio, bucketed to stable 2-decimal values.
    * One Deflater per partition, reused across rows (allocation-free
    * steady state); no shuffle at any corpus size. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        rows.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            math.rint(compressed.toDouble / raw.length * 100) / 100)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
      .orderBy(col("doc_id"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      // Seeded-deterministic but splitmix64 is not ANSI-mirrorable ⇒
      // rows-only; the spec proves the sample equals a local bottom-n
      // and survives repartitioning bit-identically.
      "q76_reservoir_sample",
      (s, dir) => reservoirPerLang(Tables.load(s, dir, "documents")),
      None,
      doc = "Deterministic 5-per-language reservoir (order-independent bottom-n)"),

    Declared(
      // zlib output length is JVM-deterministic but not ANSI-SQL ⇒
      // rows-only; the spec proves the redundancy ordering property
      // and bit-identical reruns.
      "q77_compression_ratio",
      (s, dir) => compressionRatio(Tables.load(s, dir, "documents")),
      None,
      doc = "Deflate-ratio quality signal (redundancy detector, row-local)")
  )
}
