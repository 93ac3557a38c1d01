package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed
  * partition-wise through typed Datasets (the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * The container has no imaging/audio libs, so the *decode* step is a
  * clearly-marked deterministic stub over the bytes; everything
  * Spark-side — binary schema, partition-wise batching, typed output
  * shape, chunking — is real and oracle-tested. The testdata has no
  * binary table, so documents.text (UTF-8 bytes) stands in as payload.
  */
object Multimodal {

  final case class Media(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, mean_px: Double)
  final case class Chunk(doc_id: Long, chunk_idx: Int, chunk_len: Int)

  def asMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")).as[Media]
  }

  /** Partition-wise "decode": real pipeline shape, stubbed decoder.
    * A production build swaps the body for an actual image decode
    * (JPEG → WxH, mean pixel); the fake is a pure function of the
    * bytes so the DuckDB oracle can mirror it. */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // STUB DECODE — deterministic fake in lieu of an image library.
        val n = m.payload.length
        var s = 0L; var i = 0
        while (i < n) { s += m.payload(i) & 0xff; i += 1 }
        val mean = BigDecimal(s.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        // Long math: n*31 would overflow Int past ~69 MB payloads and
        // diverge from the oracle's BIGINT arithmetic.
        MediaMeta(m.doc_id, n, 64 + n % 128, (64L + (n.toLong * 31L) % 128L).toInt, mean)
      }
    }
  }

  /** Fixed-size payload chunking — the frame-sampling/batching shape
    * (video frames, audio windows) without the codec. */
  def chunked(media: Dataset[Media], size: Int = 256): Dataset[Chunk] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(size).zipWithIndex.map {
        case (c, i) => Chunk(m.doc_id, i, c.length)
      }
    }
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q31_media_meta",
      (s, dir) => decodeMeta(asMedia(Tables.load(s, dir, "documents")))
        .toDF().orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  CAST(64 + strlen(text) % 128 AS INTEGER) AS width,
        |  CAST(64 + (strlen(text) * 31) % 128 AS INTEGER) AS height,
        |  round(CAST(list_reduce(list_transform(range(length(text)),
        |      i -> CAST(ord(substr(text, CAST(i + 1 AS INTEGER), 1)) AS BIGINT)),
        |      (a, b) -> a + b) AS DOUBLE) / strlen(text), 4) AS mean_px
        |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Binary payload metadata via partition-wise typed decode (stubbed)"),

    Declared(
      "q32_media_chunks",
      (s, dir) => chunked(asMedia(Tables.load(s, dir, "documents")))
        .toDF().orderBy(col("doc_id"), col("chunk_idx")),
      Some("""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(length(substr(text, CAST(i * 256 + 1 AS INTEGER), 256)) AS INTEGER) AS chunk_len
        |FROM (SELECT doc_id, text,
        |        unnest(range(CAST(ceil(strlen(text) / 256.0) AS BIGINT))) AS i
        |      FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin),
      doc = "Fixed-size binary chunking (frame-sample plumbing)")
  )
}
