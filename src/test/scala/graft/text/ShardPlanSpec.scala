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
}
