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

  test("ivfBlockedPairs: subset of exact pairs, high recall on planted clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 300).map { i =>
      val c = i % 10
      (i.toLong, centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val exact = SimilarityQueries.cosineNearDupPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Ann.ivfBlockedPairs(emb, 0.9, nlist = 10, nassign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // precision is exact by construction (scores computed on real
    // vectors): every blocked pair IS an exact pair, same sim
    assert(blocked.subsetOf(exact))
    // recall: multi-assigned k-means lists must catch nearly all
    // planted near-dups
    val recall = blocked.size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.8, s"recall $recall over ${exact.size}")
  }

  test("ivfBlockedPairs: deterministic under repartition (seeded quantizer)") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val once = Ann.ivfBlockedPairs(emb, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = Ann.ivfBlockedPairs(emb.repartition(7), 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == again)
  }
}
