package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemperatureMixtureSpec extends SparkSpec {

  test("temperatureMixture: sqrt-flattened allocation, capped at availability, deterministic draw") {
    import spark.implicits._
    // sources sized 16 / 4 / 1 → weights 4 / 2 / 1, W = 7; N = 7 →
    // targets 4 / 2 / 1 (the smallest source is NOT starved, the
    // biggest is flattened from 16/21 of the corpus to 4/7 of the draw)
    val docs = ((1 to 16).map(i => (i.toLong, "big")) ++
      (17 to 20).map(i => (i.toLong, "mid")) ++
      Seq((21L, "tiny")))
      .toDF("doc_id", "source")
      .withColumn("text", lit("x"))
    val got = SampleOps.temperatureMixture(docs, nTarget = 7L)
    val perSource = got.groupBy(col("source")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perSource == Map("big" -> 4L, "mid" -> 2L, "tiny" -> 1L), perSource)
    // ranks are 1..target within each source
    val ranks = got.collect().map(r => (r.getString(0), r.getInt(2)))
    assert(ranks.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq })
    // the draw is a pure function of the data
    val again = SampleOps.temperatureMixture(docs, nTarget = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val first = got.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(first == again)
  }

  test("temperatureMixture: uniform sources split the budget evenly") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val perSource = SampleOps.temperatureMixture(docs, nTarget = 8L)
      .groupBy(col("source")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perSource == Map("s0" -> 2L, "s1" -> 2L, "s2" -> 2L, "s3" -> 2L),
      perSource)
  }
}
