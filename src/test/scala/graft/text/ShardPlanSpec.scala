package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardPlanSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Long)*) = rows.toDF("doc_id", "n_chars")

  test("assignment equals the local round-robin over (n_chars desc, doc_id)") {
    val rows = (1L to 37L).map(id => id -> (id * 7 % 11 + 1))
    val expected = rows.sortBy { case (id, n) => (-n, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i % 8 }.toMap
    val got = ShardPlan.shardAssignment(docs(rows: _*), shards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("every shard present and doc counts within 1 of each other") {
    val rows = (1L to 100L).map(id => id -> (100L + id % 13))
    val plan = ShardPlan.balancedShards(docs(rows: _*), shards = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(plan.keySet == (0 until 8).toSet)
    assert(plan.values.max - plan.values.min <= 1)
  }

  test("repartition-invariant") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = ShardPlan.balancedShards(d).collect().toSeq
    val b = ShardPlan.balancedShards(d.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("epochShuffle: pos is a 1..N bijection per epoch") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = d.count()
    val out = ShardPlan.epochShuffle(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    (0 to 1).foreach { ep =>
      val poss = out.filter(_._1 == ep).map(_._3).sorted.toSeq
      assert(poss == (1L to n).toSeq, s"epoch $ep positions not a bijection")
    }
  }

  test("epochShuffle: bucket-offset rank equals the serial global rank") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val serial = d
      .select(col("doc_id"), explode(sequence(lit(0), lit(1))).as("epoch"))
      .withColumn("k", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch")).orderBy(col("k"), col("doc_id"))).cast("long"))
      .select(col("epoch"), col("doc_id"), col("pos"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = ShardPlan.epochShuffle(d).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == serial)
  }

  test("epochShuffle: epochs order differently; reruns are identical") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = ShardPlan.epochShuffle(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byEpoch = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byEpoch(0) != byEpoch(1), "both epochs produced the same order")
    val rerun = ShardPlan.epochShuffle(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == rerun.toSeq)
  }
}
