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

  /** Int8 absmax quantization error profile: per vector, scale =
    * max|component|, codes = round(127·v/scale); per label, vector
    * count, RMS reconstruction error and mean scale — the go/no-go
    * readout for storing a 100 TB embedding corpus at 1 byte/dim (4×
    * smaller scans; IVF/LSH recall is insensitive to err ≪ scale).
    *
    * Determinism: scale is an order-independent max; per-element err is
    * a fixed double expression of (v, scale); err² and scale are
    * integer-quantized BEFORE summation (q68's idiom) so the hash
    * matches DuckDB bit-for-bit. Row-local + one hash-agg — no extra
    * shuffle at any corpus size. */
  def quantizationError(embeddings: DataFrame): DataFrame = {
    val amax = array_max(transform(col("embedding"),
      x => abs(x.cast("double"))))
    embeddings
      .select(col("label"), col("vec_id"), amax.as("amax"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .filter(col("amax") > 0)
      .withColumn("vd", col("v").cast("double"))
      .withColumn("err", col("vd")
        - round(col("vd") * 127 / col("amax")) * col("amax") / 127)
      .groupBy(col("label"))
      .agg(count_distinct(col("vec_id")).as("n_vecs"),
        count(lit(1)).as("n_vals"),
        sum(round(col("err") * col("err") * 1e12).cast("long")).as("sse_p"),
        sum(round(col("amax") * 1e6).cast("long")).as("amax_micro"))
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("sse_p").cast("double") / col("n_vals")) / 1e6, 6)
          .as("rmse"),
        round(col("amax_micro").cast("double") / col("n_vals") / 1e6, 4)
          .as("avg_scale"))
      .orderBy(col("label"))
  }

  /** Upper-triangle covariance matrix of the embedding columns in long
    * (i, j, cov) form — the PCA / whitening / correlated-dim-detection
    * building block. The 64×64 outer product expands ROW-LOCALLY
    * (nested transform + one explode, no self-join), then one hash-agg
    * on (i, j) partial-aggregates map-side: the shuffle carries
    * ≤ dim²/2 rows per map task at any corpus size. Products and sums
    * quantize to integers before summation (q68's idiom), so
    * cov = (Σxy − ΣxΣy/n)/(n−1) evaluates the identical closed form in
    * both engines. */
  def covarianceMatrix(embeddings: DataFrame): DataFrame =
    embeddings
      .select(explode(flatten(transform(col("embedding"), (x, i) =>
        transform(col("embedding"), (y, j) =>
          struct(i.as("i"), j.as("j"),
            round(x.cast("double") * y.cast("double") * 1e12).cast("long")
              .as("xy_p"),
            round(x.cast("double") * 1e6).cast("long").as("x_u"),
            round(y.cast("double") * 1e6).cast("long").as("y_u"))))))
        .as("c"))
      .filter(col("c.i") <= col("c.j"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("c.xy_p")).as("sxy"),
        sum(col("c.x_u")).as("sx"), sum(col("c.y_u")).as("sy"))
      .select(col("i"), col("j"), col("n"),
        round((col("sxy").cast("double") / 1e12
          - col("sx").cast("double") * col("sy").cast("double") / 1e12 / col("n"))
          / (col("n") - 1), 8).as("cov"))
      .orderBy(col("i"), col("j"))

  val declared: Seq[Declared] = Seq(
    Declared(
      "q94_covariance",
      (s, dir) => covarianceMatrix(Tables.load(s, dir, "embeddings")),
      Some("""WITH e AS (SELECT vec_id,
        |        CAST(unnest(range(0, len(embedding))) AS INTEGER) AS i,
        |        CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings),
        |p AS (SELECT a.i, b.i AS j,
        |        CAST(round(a.x * b.x * 1000000000000) AS BIGINT) AS xy_p,
        |        CAST(round(a.x * 1000000) AS BIGINT) AS x_u,
        |        CAST(round(b.x * 1000000) AS BIGINT) AS y_u
        |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i)
        |SELECT i, j, count(*) AS n,
        |  round((CAST(sum(xy_p) AS DOUBLE) / 1000000000000
        |    - CAST(sum(x_u) AS DOUBLE) * CAST(sum(y_u) AS DOUBLE)
        |      / 1000000000000 / count(*))
        |    / (count(*) - 1), 8) AS cov
        |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin),
      doc = "Embedding covariance matrix, long upper-triangle form (PCA substrate)"),

    Declared(
      "q87_int8_quant",
      (s, dir) => quantizationError(Tables.load(s, dir, "embeddings")),
      Some("""WITH e AS (SELECT label, vec_id,
        |        list_max(list_transform(embedding,
        |          x -> abs(CAST(x AS DOUBLE)))) AS amax,
        |        unnest(embedding) AS v
        |      FROM embeddings),
        |r AS (SELECT label, vec_id, amax,
        |        CAST(v AS DOUBLE)
        |          - round(CAST(v AS DOUBLE) * 127 / amax) * amax / 127 AS err
        |      FROM e WHERE amax > 0)
        |SELECT label, count(DISTINCT vec_id) AS n_vecs,
        |  round(sqrt(CAST(sum(CAST(round(err * err * 1000000000000) AS BIGINT))
        |    AS DOUBLE) / count(*)) / 1000000, 6) AS rmse,
        |  round(CAST(sum(CAST(round(amax * 1000000) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1000000, 4) AS avg_scale
        |FROM r GROUP BY label ORDER BY label""".stripMargin),
      doc = "Int8 absmax quantization RMS error per label (1 byte/dim storage)"),

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
