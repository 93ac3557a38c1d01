package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BlockedDedupSpec extends SparkSpec {

  test("blocked pairs == all-pairs restricted to equal labels (sf0.001)") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val blocked = SimilarityQueries.blockedCosinePairs(emb, 0.35)
      .select(col("d1"), col("d2"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val labels = emb.select(col("vec_id"), col("label"))
    val allPairs = SimilarityQueries.cosineNearDupPairs(emb, 0.35)
      .join(labels.as("la"), col("d1") === col("la.vec_id"))
      .join(labels.as("lb"), col("d2") === col("lb.vec_id"))
      .filter(col("la.label") === col("lb.label"))
      .select(col("d1"), col("d2"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(blocked == allPairs)
    assert(blocked.nonEmpty)
  }
}
