package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guarantee gates for the space-saving heavy-hitter summary — the
  * laws hold under ANY partition layout even though the reported SET
  * may vary with it (documented in SpaceSaving). */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(docs: org.apache.spark.sql.DataFrame): Map[String, Long] =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("vocab <= m: the summary IS the exact count with zero error") {
    val docs = Seq((1L, "a b a c"), (2L, "b a d")).toDF("doc_id", "text")
    val got = CorpusStats.spaceSavingTopWords(spark, docs, m = 16).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L), ("d", 1L, 0L)))
  }

  test("estimate sandwich (est-err <= true <= est) on real docs, any layout") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val exact = exactCounts(docs)
    val n = exact.values.sum
    Seq(docs, docs.repartition(7)).foreach { d =>
      val got = CorpusStats.spaceSavingTopWords(spark, d, m = 16).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.nonEmpty && got.length <= 16)
      got.foreach { case (w, est, err) =>
        val t = exact.getOrElse(w, 0L)
        assert(est >= t, s"$w: est $est under true $t")
        assert(est - err <= t, s"$w: est-err ${est - err} over true $t")
      }
      // coverage: anything clearly heavy (true > 2N/m) must be reported
      val reported = got.map(_._1).toSet
      exact.filter(_._2 > 2 * n / 16).keys.foreach { w =>
        assert(reported(w), s"heavy word $w missing from the summary")
      }
    }
  }

  test("planted heavy hitter dominates the summary across partitions") {
    val rows = (1L to 200L).map { i =>
      // "hot" is half of every doc; the tail words are all distinct
      (i, s"hot w${i}a w${i}b hot")
    }
    val docs = rows.toDF("doc_id", "text").repartition(13)
    val got = CorpusStats.spaceSavingTopWords(spark, docs, m = 8).collect()
    assert(got.head.getString(0) == "hot")
    assert(got.head.getLong(1) >= 400L) // est >= true = 400
  }
}
