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

  /** Per-language embedding-norm profile — a documents ⋈ embeddings
    * metadata join (doc_id ≡ vec_id in the testdata): per lang, vector
    * count and the micro-quantized mean/min/max L2 norm. The norm is a
    * strict left fold (bit-identical in DuckDB's list_reduce); the
    * mean quantizes per row before summation (q68's idiom). One
    * broadcast-size dimension join + one hash-agg. */
  def normByLang(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val norm = graft.linalg.Distances.l2Norm(col("embedding"))
    embeddings
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id"))
      .select(col("lang"), round(norm * 1e6).cast("long").as("norm_micro"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("norm_micro")).cast("double") / count(lit(1)) / 1e6, 4)
          .as("avg_norm"),
        round(min(col("norm_micro")).cast("double") / 1e6, 4).as("min_norm"),
        round(max(col("norm_micro")).cast("double") / 1e6, 4).as("max_norm"))
      .orderBy(col("lang"))
  }

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
      doc = "Per-label embedding centroids, long form (cluster profile / IVF seed)"),

    Declared(
      "q83_norm_by_lang",
      (s, dir) => normByLang(Tables.load(s, dir, "documents"),
        Tables.load(s, dir, "embeddings")),
      Some {
        val norm = graft.DuckSql.l2Norm("embedding")
        s"""WITH j AS (SELECT d.lang,
           |    CAST(round($norm * 1000000) AS BIGINT) AS norm_micro
           |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id)
           |SELECT lang, count(*) AS n,
           |  round(CAST(sum(norm_micro) AS DOUBLE) / count(*) / 1000000, 4) AS avg_norm,
           |  round(CAST(min(norm_micro) AS DOUBLE) / 1000000, 4) AS min_norm,
           |  round(CAST(max(norm_micro) AS DOUBLE) / 1000000, 4) AS max_norm
           |FROM j GROUP BY lang ORDER BY lang""".stripMargin
      },
      doc = "Per-language L2-norm profile (documents ⋈ embeddings metadata join)")
  )
}
