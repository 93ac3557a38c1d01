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
    * building block.
    *
    * Each element is micro-quantized ONCE by a Catalyst `round` (the
    * one place rounding semantics matter, kept in the engine so it
    * matches the DuckDB oracle's `round` exactly); from there the
    * [[graft.agg.CovarianceMoments]] Aggregator accumulates n, Σx and
    * the packed upper-triangle Σx·y in pure integer math. Earlier form
    * exploded N·d² struct rows through a Generate into a d²-key
    * shuffle (15.8 s at sf0.1); the moment buffer does the same sums
    * with d²/2 multiply-adds per row map-side, and the shuffle carries
    * one ~2 KB·d²/2 buffer per task at ANY corpus size. cov =
    * (Σxy − ΣxΣy/n)/(n−1) evaluates the identical closed form in both
    * engines on identical integers. */
  def covarianceMatrix(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val quant = embeddings
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xu"))
      .as[Array[Long]]
    quant
      .select(new graft.agg.CovarianceMoments().toColumn.name("cells"))
      .toDF("cells")
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
        round((col("c.sxy").cast("double") / 1e12
          - col("c.sx").cast("double") * col("c.sy").cast("double")
            / 1e12 / col("c.n"))
          / (col("c.n") - 1), 8).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Round-half-away-from-zero on doubles — the one rounding rule both
    * engines' `round()` implement; every driver-side quantization here
    * must use it (math.rint is half-EVEN and would drift). */
  private def rnd(x: Double): Double =
    if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)

  /** Top principal component by power iteration — the PCA substrate
    * over the q94 moment pass.
    *
    * The DATA-side work is one [[covarianceMatrix]] aggregation (one
    * scan, one d²/2 moment buffer per task); the d×d matrix itself is
    * an aggregate of fixed size INDEPENDENT of corpus rows, so the
    * 2,080-cell collect is a driver scalar in the same sense as a
    * convergence ratio — the iteration then costs d² flops per step,
    * which no cluster should pay shuffles for.
    *
    * Every iterate is quantized to integer micros after an
    * IEEE-exact normalize (products and squares quantize BEFORE their
    * sums, q68's idiom), so the whole 30-step trajectory is
    * bit-identical in any engine: the DuckDB oracle replays it as a
    * recursive CTE over the same covariance CTE and must land on the
    * same integers. Output is integer micros/ppm only — no float
    * columns to drift. */
  def pcaTopComponent(embeddings: DataFrame, iters: Int = 30): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cells = covarianceMatrix(embeddings)
      .select(col("i"), col("j"), col("cov")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val d = cells.map(_._1).max + 1
    val a = Array.ofDim[Double](d, d)
    cells.foreach { case (i, j, c) => a(i)(j) = c; a(j)(i) = c }
    val trace =
      cells.collect { case (i, j, c) if i == j => rnd(c * 1e8).toLong }
        .sum.toDouble / 1e8
    val vU = Array.fill(d)(rnd(1e6 / math.sqrt(d.toDouble)).toLong)
    var nrmU = 0L
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L
        var j = 0
        while (j < d) { s += rnd(a(i)(j) * vU(j) * 1e6).toLong; j += 1 }
        s.toDouble / 1e12
      }
      var nq = 0L
      var i = 0
      while (i < d) { nq += rnd(w(i) * w(i) * 1e12).toLong; i += 1 }
      val nrm = math.sqrt(nq.toDouble) / 1e6
      i = 0
      while (i < d) { vU(i) = rnd(w(i) / nrm * 1e6).toLong; i += 1 }
      nrmU = rnd(nrm * 1e6).toLong
    }
    val vePpm = rnd(nrmU.toDouble / 1e6 / trace * 1e6).toLong
    spark.createDataset((0 until d).map(i => (i, vU(i), nrmU, vePpm)))
      .toDF("dim", "loading_micro", "eigval_micro", "var_explained_ppm")
      .orderBy(col("dim"))
  }

  /** Shared covariance CTE text for the q94/q100 oracles. */
  private val covCte: String =
    """q AS (SELECT vec_id,
      |        list_transform(embedding,
      |          x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xu
      |      FROM embeddings),
      |e AS (SELECT vec_id,
      |        CAST(unnest(range(0, len(xu))) AS INTEGER) AS i,
      |        unnest(xu) AS x
      |      FROM q),
      |p AS (SELECT a.i, b.i AS j, a.x * b.x AS xy_p, a.x AS x_u, b.x AS y_u
      |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i),
      |c AS (SELECT i, j, count(*) AS n,
      |        round((CAST(sum(xy_p) AS DOUBLE) / 1000000000000
      |          - CAST(sum(x_u) AS DOUBLE) * CAST(sum(y_u) AS DOUBLE)
      |            / 1000000000000 / count(*))
      |          / (count(*) - 1), 8) AS cov
      |      FROM p GROUP BY i, j)""".stripMargin

  /** Silhouette score per point over the label clustering — the
    * cluster-quality metric of the embedding family: s = (b − a) /
    * max(a, b) with a = mean intra-cluster distance, b = nearest other
    * cluster's mean distance; s = 0 for singleton/degenerate cases
    * (the standard convention).
    *
    * Determinism: each pair distance quantizes to integer MICROS via
    * floor() BEFORE any sum (floor of an identical double is binary —
    * no decimal-repr rounding divergence), so a and b are one double
    * division over exact integers and the final s lands as floor-ppm.
    *
    * This is the exact all-pairs form — the evaluation-time baseline,
    * like q54 for dedup; at corpus scale you sample points per label
    * (the metric is a mean — a uniform sample estimates it) or reuse
    * the q102/q108 blocked pair streams. One broadcast of the vector
    * table, one (i, lj) partial-agg shuffle — no row explosion beyond
    * the pair stream itself. */
  def silhouette(embeddings: DataFrame): DataFrame = {
    val a = embeddings.select(col("vec_id").as("i"), col("label").as("li"),
      col("embedding").as("vi"))
    val b = embeddings.select(col("vec_id").as("j"), col("label").as("lj"),
      col("embedding").as("vj"))
    val perLabel = a.join(broadcast(b), col("i") =!= col("j"))
      .select(col("i"), col("li"), col("lj"),
        floor(graft.linalg.Distances.euclidean(col("vi"), col("vj")) * 1e6)
          .cast("long").as("dm"))
      .groupBy(col("i"), col("li"), col("lj"))
      .agg(sum(col("dm")).as("s"), count(lit(1)).as("c"))
    val intra = perLabel.filter(col("li") === col("lj"))
      .select(col("i"), (col("s").cast("double") / col("c")).as("a_mean"),
        col("c").as("n_same"))
    val inter = perLabel.filter(col("li") =!= col("lj"))
      .select(col("i"), (col("s").cast("double") / col("c")).as("m"))
      .groupBy(col("i")).agg(min(col("m")).as("b_mean"))
    embeddings.select(col("vec_id"), col("label"))
      .join(intra, col("vec_id") === intra("i"), "left").drop("i")
      .join(inter, col("vec_id") === inter("i"), "left").drop("i")
      .select(col("vec_id"), col("label"),
        coalesce(col("n_same"), lit(0L)).as("n_same"),
        when(col("a_mean").isNull || col("b_mean").isNull ||
          greatest(col("a_mean"), col("b_mean")) === 0.0, 0L)
          .otherwise(floor((col("b_mean") - col("a_mean"))
            / greatest(col("a_mean"), col("b_mean")) * 1e6).cast("long"))
          .as("s_ppm"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-truncation quality — the storage/recall design question
    * every 100 TB vector deployment asks first: if vectors are stored
    * (or first-pass searched) at a prefix of their dimensions, how much
    * of the exact top-k survives? Per query id: |top-k(full dims) ∩
    * top-k(first `dims` dims)| / k. Both rankings run through the fused
    * [[org.apache.spark.sql.graft.TopKJoin]] (the full side reuses the
    * shared materialized knn10 table), the overlap is one co-partitioned
    * (id, nbr) semi join + hash-agg. Exact-oracle class by design — the
    * measurement is what you run on a SAMPLE before committing the
    * storage layout; the production search path is the IVF/PQ family. */
  def truncationOverlap(s: org.apache.spark.sql.SparkSession, dir: String,
                        dims: Int = 16, k: Int = 10): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val trunc = emb.select(col("vec_id"),
      slice(col("embedding"), 1, dims).as("embedding"))
    val truncK = org.apache.spark.sql.graft.TopKJoin
      .knn(trunc.repartition(col("vec_id")), trunc, k)
      .select(col("id"), col("nbr"))
    // The shared materialized knn10 table IS the k=10 full-dims arm;
    // any other k computes its own exact top-k (round-10 advice: the
    // hard-wired table silently gave a k≠10 call a k=10 full arm).
    val fullK =
      if (k == 10) graft.knn.KnnQueries.knn10(s, dir).select(col("id"), col("nbr"))
      else org.apache.spark.sql.graft.TopKJoin
        .knn(emb.select(col("vec_id"), col("embedding")).repartition(col("vec_id")),
          emb.select(col("vec_id"), col("embedding")), k)
        .select(col("id"), col("nbr"))
    val common = fullK.join(truncK, Seq("id", "nbr"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_common"))
    emb.select(col("vec_id").as("id"))
      .join(common, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)) / k.toDouble, 4).as("overlap_frac"))
      .orderBy(col("id"))
  }

  private def truncOverlapOracle(dims: Int, k: Int): String = {
    val df = graft.DuckSql.euclidean("a.embedding", "b.embedding")
    val dt = graft.DuckSql.euclidean(s"a.embedding[1:$dims]", s"b.embedding[1:$dims]")
    s"""WITH fullr AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS nbr,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY round($df, 6), b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |tr AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS nbr,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY round($dt, 6), b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |f10 AS (SELECT id, nbr FROM fullr WHERE rn <= $k),
       |t10 AS (SELECT id, nbr FROM tr WHERE rn <= $k),
       |ov AS (SELECT f10.id, count(*) AS n_common
       |       FROM f10 JOIN t10 ON f10.id = t10.id AND f10.nbr = t10.nbr
       |       GROUP BY 1)
       |SELECT e.vec_id AS id, coalesce(n_common, 0) AS n_common,
       |  round(coalesce(n_common, 0) / $k.0, 4) AS overlap_frac
       |FROM embeddings e LEFT JOIN ov ON e.vec_id = ov.id
       |ORDER BY id""".stripMargin
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q208_trunc_overlap",
      (s, dir) => truncationOverlap(s, dir),
      Some(truncOverlapOracle(dims = 16, k = 10)),
      doc = "Embedding-truncation quality: per-query overlap of exact top-10 at 16 prefix dims vs full dims (Matryoshka-style storage/recall tradeoff), both rankings via the fused TopKJoin"),

    Declared(
      "q130_silhouette",
      (s, dir) => silhouette(Tables.load(s, dir, "embeddings")),
      Some {
        val d = graft.DuckSql.euclidean("a.embedding", "b.embedding")
        s"""WITH pairs AS (
           |  SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
           |         CAST(floor($d * 1000000.0) AS BIGINT) AS dm
           |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
           |pl AS (SELECT i, li, lj, sum(dm) AS s, count(*) AS c
           |       FROM pairs GROUP BY 1, 2, 3),
           |aa AS (SELECT i, CAST(s AS DOUBLE) / c AS a_mean, c AS n_same
           |       FROM pl WHERE li = lj),
           |bb AS (SELECT i, min(CAST(s AS DOUBLE) / c) AS b_mean
           |       FROM pl WHERE li <> lj GROUP BY 1)
           |SELECT e.vec_id, e.label, coalesce(aa.n_same, 0) AS n_same,
           |  CASE WHEN aa.i IS NULL OR bb.i IS NULL
           |         OR greatest(a_mean, b_mean) = 0 THEN 0
           |       ELSE CAST(floor((b_mean - a_mean)
           |              / greatest(a_mean, b_mean) * 1000000.0) AS BIGINT)
           |  END AS s_ppm
           |FROM embeddings e
           |LEFT JOIN aa ON aa.i = e.vec_id
           |LEFT JOIN bb ON bb.i = e.vec_id
           |ORDER BY e.vec_id""".stripMargin
      },
      doc = "Per-point silhouette over the label clustering (floor-micro exact)"),

    Declared(
      "q100_pca_power",
      (s, dir) => pcaTopComponent(Tables.load(s, dir, "embeddings")),
      Some(s"""WITH RECURSIVE $covCte,
        |f AS (SELECT i, j, cov FROM c
        |      UNION ALL SELECT j, i, cov FROM c WHERE i <> j),
        |dims AS (SELECT DISTINCT i FROM c),
        |nd AS (SELECT count(*) AS d FROM dims),
        |tr AS (SELECT CAST(sum(CAST(round(cov * 100000000) AS BIGINT)) AS DOUBLE)
        |              / 100000000 AS t
        |       FROM c WHERE i = j),
        |pv AS (
        |  SELECT 0 AS it, i,
        |    CAST(round(1000000 / sqrt(CAST((SELECT d FROM nd) AS DOUBLE)))
        |      AS BIGINT) AS v_u,
        |    CAST(0 AS BIGINT) AS nrm_u
        |  FROM dims
        |  UNION ALL
        |  SELECT z.it, z.i,
        |    CAST(round(z.w / z.nrm * 1000000) AS BIGINT) AS v_u,
        |    CAST(round(z.nrm * 1000000) AS BIGINT) AS nrm_u
        |  FROM (
        |    SELECT s.it, s.i, s.w,
        |      sqrt(CAST(sum(CAST(round(s.w * s.w * 1000000000000) AS BIGINT))
        |             OVER () AS DOUBLE)) / 1000000 AS nrm
        |    FROM (
        |      SELECT p.it + 1 AS it, f.i,
        |        CAST(sum(CAST(round(f.cov * p.v_u * 1000000) AS BIGINT))
        |          AS DOUBLE) / 1000000000000 AS w
        |      FROM pv p JOIN f ON f.j = p.i
        |      GROUP BY p.it, f.i
        |    ) s
        |  ) z WHERE z.it <= 30
        |)
        |SELECT i AS dim, v_u AS loading_micro, nrm_u AS eigval_micro,
        |  CAST(round(CAST(nrm_u AS DOUBLE) / 1000000 / (SELECT t FROM tr)
        |    * 1000000) AS BIGINT) AS var_explained_ppm
        |FROM pv WHERE it = 30 ORDER BY dim""".stripMargin),
      doc = "PC1 by integer-quantized power iteration over the q94 moment pass"),

    Declared(
      "q94_covariance",
      (s, dir) => covarianceMatrix(Tables.load(s, dir, "embeddings")),
      Some("""WITH q AS (SELECT vec_id,
        |        list_transform(embedding,
        |          x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xu
        |      FROM embeddings),
        |e AS (SELECT vec_id,
        |        CAST(unnest(range(0, len(xu))) AS INTEGER) AS i,
        |        unnest(xu) AS x
        |      FROM q),
        |p AS (SELECT a.i, b.i AS j, a.x * b.x AS xy_p, a.x AS x_u, b.x AS y_u
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
