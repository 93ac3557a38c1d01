package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EnergySegmentsSpec extends SparkSpec {

  test("energySegments: hand-checked islands on a planted payload") {
    import spark.implicits._
    // win=4: doc text built from 4-char blocks; 'm' (109) sits 13 from
    // the 96 reference → energy 4·169=676; 'a' (97) → 4·1=4. Windows:
    // [loud, quiet, loud, loud, quiet, quiet] → total 2044; mean ≈ 341
    // → active = the three loud windows → islands {0} (len 1, dropped
    // by minWins=2) and {2,3} (kept).
    val text = "mmmm" + "aaaa" + "mmmm" + "mmmm" + "aaaa" + "aaaa"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Multimodal.energySegments(docs, win = 4, minWins = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2, 3, 2L, 2 * 676L)), got.mkString(", "))
  }

  test("energySegments: per-doc threshold adapts (uniform doc emits nothing)") {
    import spark.implicits._
    // a uniform payload has every window AT the mean — strictly-above
    // threshold keeps none, so no segment can leak from a flat signal
    val docs = Seq((1L, "zzzz" * 8)).toDF("doc_id", "text")
    assert(Multimodal.energySegments(docs, win = 4, minWins = 1).count() == 0)
  }

  test("truncationOverlap: full-width truncation is a perfect overlap") {
    // dims = the full embedding width ⇒ both rankings identical ⇒
    // overlap_frac 1.0 for every query id
    val got = graft.similarity.EmbeddingStats
      .truncationOverlap(spark, sf0001, dims = 64, k = 10)
      .agg(min(col("overlap_frac")), max(col("overlap_frac")), count(lit(1)))
      .head()
    assert(got.getDouble(0) == 1.0 && got.getDouble(1) == 1.0)
    assert(got.getLong(2) == graft.Tables.load(spark, sf0001, "embeddings").count())
  }
}
