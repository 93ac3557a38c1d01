package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Embedding-column analytics: per-label centroids in long (label, dim,
  * value) form — the building block for cluster profiling, IVF seeding
  * (q36 consumes centroids), and embedding-drift monitoring between
  * corpus snapshots.
  *
  * Double determinism: each float component is quantized to integer
  * micros BEFORE the sum (q68's idiom), so the per-(label, dim) mean is
  * exact integer math divided once at the end — engine-identical where
  * a float sum's order-dependence is not. posexplode keeps the dim
  * index without a join; the shuffle is one hash-agg on (label, dim),
  * partial-aggregated map-side. */
object EmbeddingStats {

  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v").cast("double") * 1e6).cast("long")).as("sum_micro"))
      .select(col("label"), col("dim"), col("n"),
        round(col("sum_micro").cast("double") / col("n") / 1e6, 4).as("centroid"))
      .orderBy(col("label"), col("dim"))

  val declared: Seq[Declared] = Seq(
    Declared(
      "q73_label_centroids",
      (s, dir) => labelCentroids(Tables.load(s, dir, "embeddings")),
      Some("""WITH e AS (SELECT label,
        |        unnest(range(0, len(embedding))) AS dim,
        |        unnest(embedding) AS v
        |      FROM embeddings)
        |SELECT label, CAST(dim AS INTEGER) AS dim, count(*) AS n,
        |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1000000, 4) AS centroid
        |FROM e GROUP BY label, dim ORDER BY label, dim""".stripMargin),
      doc = "Per-label embedding centroids, long form (cluster profile / IVF seed)")
  )
}
