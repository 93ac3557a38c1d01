package graft.text

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {

  // 1-based token positions; n = 3 keeps the toy corpora readable
  private def spans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SpanDedup.dupSpans(docs.toDF("doc_id", "text"), n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("dupSpans: a phrase shared by two docs yields one maximal span in each") {
    // "x y z w" shared ⇒ 3-grams at positions (x y z) and (y z w) in
    // both docs: overlapping positions merge into ONE span of 4 tokens
    val got = spans(Seq(
      (1L, "a b x y z w c"),   // shared tokens at positions 3..6
      (2L, "x y z w q r s")))  // shared tokens at positions 1..4
    assert(got == Seq(
      (1L, 3L, 6L, 2L, 4L),
      (2L, 1L, 4L, 2L, 4L)), got.mkString(", "))
  }

  test("dupSpans: disjoint repeats give separate islands; in-doc repetition counts") {
    // doc 3 repeats its own 3-gram "m m m" at positions 1 and 5 —
    // occurrence count 2 without any second document; gap 5-1=4 > n=3
    // keeps the two spans separate
    val got = spans(Seq((3L, "m m m q m m m")))
    assert(got == Seq(
      (3L, 1L, 3L, 1L, 3L),
      (3L, 5L, 7L, 1L, 3L)), got.mkString(", "))
  }

  test("contaminationSpans: only train positions sharing a benchmark gram flag; benchmark docs never emit") {
    import spark.implicits._
    // doc 10 is the benchmark (doc_id % 10 == 0); doc 11 contains its
    // phrase at positions 3..5; doc 12 shares nothing
    val got = SpanDedup.contaminationSpans(Seq(
      (10L, "secret eval answer x y"),
      (11L, "a b secret eval answer"),
      (12L, "p q r s t")).toDF("doc_id", "text"), n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq((11L, 3L, 5L, 1L, 3L)), got.mkString(", "))
  }

  test("dupSpans: fully-duplicated docs collapse to one whole-doc span; unique docs emit nothing") {
    // doc 10/11 are identical: every 3-gram (positions 1..4) occurs
    // twice, consecutive positions merge into ONE span covering the
    // whole document; doc 12 shares nothing and emits no row
    val got = spans(Seq(
      (10L, "a b c d e f"),
      (11L, "a b c d e f"),
      (12L, "p q r s t u v")))
    assert(got == Seq(
      (10L, 1L, 6L, 4L, 6L),
      (11L, 1L, 6L, 4L, 6L)), got.mkString(", "))
  }
}
