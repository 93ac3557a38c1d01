package graft.similarity

import graft.SparkSpec

class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("tight separated clusters score near 1; singleton and lone-cluster score 0") {
    // two tight clusters far apart, one singleton cluster
    val rows = Seq(
      (0L, Seq(0f, 0f), 0), (1L, Seq(0f, 1f), 0), (2L, Seq(1f, 0f), 0),
      (10L, Seq(100f, 0f), 1), (11L, Seq(100f, 1f), 1), (12L, Seq(101f, 0f), 1),
      (20L, Seq(50f, 50f), 2))
    val out = GraftSilhouetteHarness.run(rows.toDF("vec_id", "embedding", "label"))
    // cluster members: intra ≈ 1.2, nearest other cluster ≈ 70-100 ⇒ s ≈ 0.98+
    Seq(0L, 1L, 2L, 10L, 11L, 12L).foreach { id =>
      assert(out(id) > 950000L, s"id $id got ${out(id)} ppm")
    }
    // singleton cluster: a undefined ⇒ 0 by convention
    assert(out(20L) == 0L)
  }

  test("a point between two clusters scores near 0; misplaced point negative") {
    val rows = Seq(
      (0L, Seq(0f, 0f), 0), (1L, Seq(0f, 1f), 0),
      (10L, Seq(10f, 0f), 1), (11L, Seq(10f, 1f), 1),
      // geometrically inside cluster 1 but labeled 0 ⇒ negative s
      (5L, Seq(10f, 0.5f), 0))
    val out = GraftSilhouetteHarness.run(rows.toDF("vec_id", "embedding", "label"))
    assert(out(5L) < 0L, s"misplaced point got ${out(5L)} ppm")
    // its true-cluster mates are dragged down but stay positive
    assert(out(10L) > 0L && out(11L) > 0L)
  }
}

private object GraftSilhouetteHarness {
  def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    EmbeddingStats.silhouette(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
}
