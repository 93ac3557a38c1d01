package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SemDeDupSpec extends SparkSpec {

  test("semDedup: keep-lowest-id within near-dup groups, planted clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(2)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // ids 0..59: two well-separated planted clusters; within each, ids
    // ≡ 0 (mod 3) get two near-identical copies right after them
    val rows = (0 until 60).map { i =>
      val c = i % 2
      val base = centers(c)
      val jitter = if (i % 3 == 0) 0.001f else 0.5f
      (i.toLong, base.map(x => x + jitter * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = SemDeDup.semDedup(emb, tau = 0.999, nlist = 2, iters = 3)
    val got = out.collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.size == 60)

    // independently recompute the rule from the query's own cluster
    // assignment + exact pair predicate
    val lists = out.select(col("vec_id"), col("cid"))
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .join(lists.as("ca"), col("a.vec_id") === col("ca.vec_id"))
      .join(lists.as("cb"), col("b.vec_id") === col("cb.vec_id"))
      .filter(col("ca.cid") === col("cb.cid"))
      .filter(round(graft.linalg.Distances.cosineSimilarity(
        col("a.embedding"), col("b.embedding")), 6) >= 0.999)
      .select(col("b.vec_id").as("dropped"))
      .collect().map(_.getLong(0)).toSet
    (0 until 60).foreach { i =>
      assert(got(i.toLong) == !pairs.contains(i.toLong), s"id $i")
    }
    // the planted near-identical copies around each i ≡ 0 (mod 3) must
    // actually produce drops — the rule is exercised, not vacuous
    assert(got.values.count(_ == false) >= 10,
      s"only ${got.values.count(_ == false)} drops")
    // and every drop has a kept lower-id witness in its cluster
    assert(got.values.count(_ == true) >= 2)
  }

  test("semDedup: keep set is prefix-stable — lowest id of every cluster always survives (sf0.001)") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val out = SemDeDup.semDedup(emb).cache()
    val firstPerCluster = out.groupBy(col("cid")).agg(min(col("vec_id")).as("vec_id"))
    val kept = out.filter(col("keep")).select(col("vec_id"))
    assert(firstPerCluster.join(kept, "vec_id").count() == firstPerCluster.count())
    out.unpersist()
    ()
  }
}
