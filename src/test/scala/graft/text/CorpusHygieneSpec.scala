package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusHygieneSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalDocs: longest member wins, ties to smallest id") {
    val clusters = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), // cluster 1
      (4L, 4L, true)                                    // singleton
    ).toDF("doc_id", "cluster", "is_canonical")
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // 2 and 3 tie on length → 2 wins
      (4L, 5L)
    ).toDF("doc_id", "n_chars")
    val out = canon(clusters, docs)
    assert(out == Map(1L -> ((2L, 3L, 70L)), 4L -> ((4L, 1L, 5L))))
  }

  private def canon(clusters: org.apache.spark.sql.DataFrame,
                    docs: org.apache.spark.sql.DataFrame) =
    CorpusHygiene.canonicalDocs(clusters, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("vocabCoverage: OOV rate against the top-K cut") {
    // vocabK=2 keeps the two most frequent words ("a" ×3, "b" ×2)
    val docs = Seq(
      (1L, "a b a", "s"),   // all in vocab → 0 OOV
      (2L, "a b rare", "s") // 1 of 3 OOV → 333 permille
    ).toDF("doc_id", "text", "source")
    val out = CorpusHygiene.vocabCoverage(docs, vocabK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0L)))
    assert(out(2L) == ((3L, 1L, 333L)))
  }

  test("leakageSplit: same content prefix => same cluster and split") {
    val twin = "x" * 100 // identical 80-char prefix
    val docs = Seq(
      (1L, twin + "tail one", "s"),
      (7L, twin + "tail two", "s"),
      (9L, "something else entirely", "s")
    ).toDF("doc_id", "text", "source")
    val out = CorpusHygiene.leakageSplit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == out(7L))      // grouped: identical cluster AND split
    assert(out(1L)._1 == 1L)        // representative = min doc_id
    assert(out(9L)._1 == 9L)        // singleton is its own cluster
    assert(Set("train", "val", "test").contains(out(9L)._2))
  }

  test("leakageSplit: split fractions are buckets of the cluster hash") {
    // 200 singleton docs: expect roughly 80/10/10 (deterministic md5)
    val docs = (1L to 200L).map(i => (i, s"unique document body $i", "s"))
      .toDF("doc_id", "text", "source")
    val counts = CorpusHygiene.leakageSplit(docs)
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 200L)
    assert(counts("train") > 120L && counts("train") < 190L)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 10L)
  }
}
