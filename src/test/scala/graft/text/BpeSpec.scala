package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("bpeMerges: hand-computed merges on low/low/lower, early stop") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val out = Bpe.bpeMerges(docs, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pairs r1: (l,o)=3 (o,w)=3 tie → "l o" < "o w"; r2: (lo,w)=3;
    // r3: (low,e)=1 vs (e,r)=1 tie → "e r" < "low e"; r4: (low,er)=1;
    // r5: nothing left to merge → early stop after 4 merges
    assert(out.toSeq == Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
  }

  test("bpeMerges: run-sharing pairs merge fully within a round") {
    import spark.implicits._
    // "abab": chars a b a b → pair (a,b)=2 wins round 1; the two
    // occurrences share the separator, so the double-pass must merge
    // BOTH: "ab ab" → round 2 merges (ab, ab)
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val out = Bpe.bpeMerges(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)))
  }
}
