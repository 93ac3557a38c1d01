package graft.text

import graft.SparkSpec

/** Hand-built corpora pinning the exact-substring rules at n = 3 (the
  * declared queries run n = 50; the chain/keep-first/merge logic is
  * n-independent). */
class ExactSubstrSpec extends SparkSpec {

  private def spans(docs: Seq[(Long, String)], maxOcc: Int = ExactSubstr.MaxOcc)
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    ExactSubstr.sharedSubstrings(docs.toDF("doc_id", "text"), n = 3, maxOcc = maxOcc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
  }

  private def dedupText(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    ExactSubstr.substrDedupText(docs.toDF("doc_id", "text"), n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  private val corpus = Seq(
    (1L, "a b c d e"),
    (2L, "c d e f g"),
    (4L, "a b c d e f g"))

  test("sharedSubstrings: diagonal chains emit MAXIMAL spans, one row per pair alignment") {
    // three consecutive matching 3-grams = ONE 5-token span, not three
    // 3-token rows; every ordered pair alignment appears once
    val got = spans(corpus)
    assert(got == Seq(
      (1L, 1L, 5L, 4L, 1L, 5L, 5L), // "a b c d e" shared 1↔4
      (1L, 3L, 5L, 2L, 1L, 3L, 3L), // "c d e" shared 1↔2
      (2L, 1L, 5L, 4L, 3L, 7L, 5L)), // "c d e f g" shared 2↔4
      got.mkString(", "))
  }

  test("sharedSubstrings: a mid-span token mismatch breaks the chain into separate maximal runs") {
    // docs share "p q r" and "t u v" but differ at the token between:
    // two 3-token spans, never a fused 7-token one
    val got = spans(Seq(
      (1L, "p q r s t u v"),
      (2L, "p q r z t u v")))
    assert(got == Seq(
      (1L, 1L, 3L, 2L, 1L, 3L, 3L),
      (1L, 5L, 7L, 2L, 5L, 7L, 3L)), got.mkString(", "))
  }

  test("sharedSubstrings: same-doc repetition pairs at its own diagonal") {
    val got = spans(Seq((5L, "m n o x m n o")))
    assert(got == Seq((5L, 1L, 3L, 5L, 5L, 7L, 3L)), got.mkString(", "))
  }

  test("substrDedupText: corpus-first occurrence survives, later copies cut, overlapping removals merge") {
    val got = dedupText(corpus)
    assert(got == Seq(
      // doc 1 is corpus-first for everything it shares — untouched
      (1L, 5L, 0L, "a b c d e"),
      // doc 2 loses "c d e" (shared with earlier doc 1), keeps "f g"
      (2L, 5L, 3L, "f g"),
      // doc 4's removals [1,5] (vs doc 1) and [3,7] (vs doc 2) MERGE
      // into [1,7] — the whole doc is cut, empty survivor
      (4L, 7L, 7L, "")), got.mkString(", "))
  }

  test("substrDedupText: in-doc repetition keeps the first occurrence") {
    val got = dedupText(Seq((5L, "m n o x m n o")))
    assert(got == Seq((5L, 7L, 3L, "m n o x")), got.mkString(", "))
  }

  test("maxOcc cap drops heavy grams from pairing and reports them — no silent truncation") {
    // "c d e" occurs in all three docs (occ 3): with maxOcc = 2 every
    // alignment containing only capped grams disappears
    val got = spans(corpus, maxOcc = 2)
    // occ("c d e") = 3 > 2 ⇒ the 1↔2 "c d e" span is gone; the long
    // spans survive on their other (occ-2) grams but BREAK at the
    // capped gram position
    assert(!got.contains((1L, 3L, 5L, 2L, 1L, 3L, 3L)), got.mkString(", "))
    import spark.implicits._
    val dropped = ExactSubstr.droppedHeavyGrams(
        corpus.toDF("doc_id", "text"), n = 3, maxOcc = 2)
      .collect().head
    assert(dropped.getLong(0) == 1L, s"one capped gram, got $dropped")
    assert(dropped.getLong(1) == 3L)
  }
}
