package graft.text

import graft.SparkSpec

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("ngramNovelty: first doc fully novel, exact copy fully stale") {
    val docs = Seq(
      (1L, "a b c d", "s1"),       // shingles: abc, bcd — both first here
      (2L, "a b c d", "s1"),       // exact copy → 0 novel
      (3L, "a b c x y z", "s2")    // abc stale; bcx, cxy, xyz novel → 3/4
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1000000L)))
    assert(out(2L) == ((2L, 0L, 0L)))
    assert(out(3L) == ((4L, 3L, 750000L)))
  }

  test("ngramNovelty: repeated shingle within one doc counts once") {
    val docs = Seq((1L, "a b c a b c a b c", "s")) // distinct: abc,bca,cab
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.ngramNovelty(docs).collect().head
    assert(out.getLong(1) == 3L) // bounded by distinct shingles
    assert(out.getLong(3) == 1000000L)
  }

  test("crossSourceDup: counts distinct shared contents per source pair") {
    val docs = Seq(
      (1L, "shared one", "a"), (2L, "shared one", "b"),   // a∩b
      (3L, "shared two", "a"), (4L, "shared two", "b"),   // a∩b again
      (5L, "shared one", "c"),                            // a∩c, b∩c
      (6L, "only in a", "a"),
      (7L, "shared one", "a")                             // dup within a: no double count
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.crossSourceDup(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }
}
