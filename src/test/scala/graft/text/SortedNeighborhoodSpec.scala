package graft.text

import graft.SparkSpec

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  test("adjacent-sorting near-dups pair; sub-threshold prefix-mates don't") {
    val out = Dedup.sortedNeighborhoodPairs(docsOf(Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma delta"),       // identical → jaccard 1.0
      (3L, "en", "alpha wholly different words after the shared prefix start"),
      (4L, "en", "zz unrelated text entirely")
    ))).collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out.keySet == Set((1L, 2L))) // 1-3/2-3 candidates exist but fail τ
    assert(out((1L, 2L)) == 1000000L)
  }

  test("window w=3 reaches two ahead but not three") {
    // sort order by key: a1, a2, a3, a4 — (a1,a4) is 3 apart → unseen
    // even though a1 and a4 are identical near-dups
    val twin = "twin doc body shared by first and last"
    val out = Dedup.sortedNeighborhoodPairs(docsOf(Seq(
      (1L, "en", "aa " + twin),
      (2L, "en", "ab filler one completely other content here"),
      (3L, "en", "ac filler two completely other content here"),
      (4L, "en", "ad " + twin)
    )), w = 3, tauPpm = 500000L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(!out.contains((1L, 4L))) // the method's documented blind spot
    assert(out.contains((2L, 3L))) // the adjacent filler pair IS caught
  }

  test("pairs never cross languages") {
    val out = Dedup.sortedNeighborhoodPairs(docsOf(Seq(
      (1L, "en", "same text in two languages"),
      (2L, "fr", "same text in two languages")
    ))).collect()
    assert(out.isEmpty)
  }
}
