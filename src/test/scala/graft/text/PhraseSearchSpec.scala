package graft.text

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("doc and occurrence counts, overlapping repeats, zero-hit phrases") {
    val docs = Seq(
      (1L, "the table scan was a table scan indeed"),
      (2L, "a Table Scan is case folded"),
      (3L, "a a a a"),
      (4L, "nothing relevant")
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs,
      Seq("table scan", "a a", "missing phrase"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("table scan") == ((2L, 3L))) // docs 1 (×2) and 2 (×1)
    // "a a a a" has THREE overlapping "a a" bigrams; doc 1 has one "a a"? no.
    assert(got("a a") == ((1L, 3L)))
    assert(got("missing phrase") == ((0L, 0L)))
  }

  test("matches a LIKE-based membership oracle on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Retrieval.phraseSearch(d, Seq("fast table"))
      .collect()(0).getLong(1)
    val like = d.filter(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit(" "),
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.col("text")),
        org.apache.spark.sql.functions.lit(" "))
        .contains(" fast table ")).count()
    assert(got == like)
  }
}
