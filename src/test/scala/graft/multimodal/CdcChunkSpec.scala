package graft.multimodal

import graft.SparkSpec

class CdcChunkSpec extends SparkSpec {

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, b) => Multimodal.Media(id, b) })
  }

  private val rnd = new scala.util.Random(42)
  private val base: Array[Byte] = Array.fill(4096)(rnd.nextInt(256).toByte)

  test("chunk lengths respect bounds and reassemble the payload") {
    val chunks = Multimodal.cdcChunks(media((1L, base))).collect()
      .sortBy(_.chunk_idx)
    assert(chunks.map(_.chunk_len).sum == base.length)
    // every chunk except possibly the last respects [min, max]
    chunks.init.foreach { c =>
      assert(c.chunk_len >= 16 && c.chunk_len <= 256, c.toString)
    }
    assert(chunks.last.chunk_len <= 256)
    assert(chunks.length > 4, "fixture should produce several chunks")
  }

  test("an insertion shifts one boundary, not every block (CDC property)") {
    val shifted: Array[Byte] = Array[Byte](1, 2, 3, 4, 5, 6, 7) ++ base
    val a = Multimodal.cdcChunks(media((1L, base))).collect()
      .map(c => (c.chunk_len, c.chunk_hash)).toSet
    val b = Multimodal.cdcChunks(media((2L, shifted))).collect()
      .map(c => (c.chunk_len, c.chunk_hash)).toSet
    val shared = (a & b).size.toDouble / a.size
    // fixed-size 256-byte blocks would share ZERO chunks after a
    // 7-byte insertion; content-defined cuts resynchronize
    assert(shared >= 0.5, s"only ${(a & b).size}/${a.size} chunks survived the shift")
  }

  test("identical payloads dedup fully; sharing stats are deterministic") {
    val two = media((1L, base), (2L, base))
    val stats = Multimodal.chunkSharing(Multimodal.cdcChunks(two)).collect().head
    assert(stats.getAs[Long]("n_total_refs") == 2 * stats.getAs[Long]("n_unique_chunks"))
    assert(stats.getAs[Double]("dedup_ratio") == 2.0)
    val again = Multimodal.chunkSharing(
      Multimodal.cdcChunks(two.repartition(5))).collect().head
    assert(again.toString == stats.toString)
  }

  test("ascii guard: the documents table is pure ASCII (oracle byte/char equivalence)") {
    // The q115/q185 DuckDB oracles sample CODE POINTS (ord(substr(...)))
    // while the Spark side hashes UTF-8 PAYLOAD BYTES; the two agree
    // iff every document is pure ASCII. Fail loudly here if the data
    // generator ever emits non-ASCII text (see Multimodal.phashOracle).
    import org.apache.spark.sql.functions._
    val nonAscii = graft.Tables.load(spark, sf0001, "documents")
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text; q115/q185 oracles assume byte==char")
  }
}
