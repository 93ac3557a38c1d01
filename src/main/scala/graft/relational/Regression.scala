package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Per-group ordinary-least-squares trend (slope / intercept / r²) —
  * the regr_slope/regr_intercept/regr_r2 family computed from exact
  * integer moments: one aggregation pass collects (n, Σx, Σy, Σxy,
  * Σx², Σy²) as BIGINTs (x = days since epoch, y = floor-dollars (floor of an
  * identical double is binary-deterministic; cents would overflow the
  * Σy² BIGINT at scale — Spark wraps silently where DuckDB promotes) — all
  * products < 2⁶³, sums exact), then the closed forms evaluate in
  * doubles over identical integers on both engines — bit-identical
  * without any rounding, where a naive float covar accumulates in
  * shuffle order and drifts.
  *
  * Scale: one map-side-partial hash aggregation; output = one row per
  * group. The moment trick is the same one the covariance matrix
  * (q94) and A/B readout (q118) use — OLS closes the classic-stats
  * family. */
object Regression {

  /** Price trend per order priority: totalprice (floor-dollars) regressed on
    * order date (days since epoch). */
  def priceTrend(orders: DataFrame): DataFrame = {
    val pts = orders.select(col("o_orderpriority").as("grp"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("x"),
      floor(col("o_totalprice")).cast("long").as("y"))
    val m = pts.groupBy(col("grp")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val covN = d("n") * d("sxy") - d("sx") * d("sy") // n·cov scaled
    val varxN = d("n") * d("sxx") - d("sx") * d("sx")
    val varyN = d("n") * d("syy") - d("sy") * d("sy")
    // NULLIF guard: a degenerate group (zero x- or y-variance) yields NULL,
    // not an ANSI divide-by-zero error — mirrored in the oracle SQL
    def nz(c: org.apache.spark.sql.Column) = when(c =!= 0.0, c)
    m.select(col("grp"), col("n"),
        (covN / nz(varxN)).as("slope_dollars_per_day"),
        ((d("sy") - covN / nz(varxN) * d("sx")) / d("n")).as("intercept_dollars"),
        (covN * covN / nz(varxN * varyN)).as("r2"))
      .orderBy(col("grp"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q131_regression",
      (s, dir) => priceTrend(Tables.load(s, dir, "orders")),
      Some("""WITH pts AS (SELECT o_orderpriority AS grp,
        |        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
        |        CAST(floor(o_totalprice) AS BIGINT) AS y
        |      FROM orders),
        |m AS (SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |      FROM pts GROUP BY grp)
        |SELECT grp, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope_dollars_per_day,
        |  (CAST(sy AS DOUBLE)
        |     - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)
        |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_dollars,
        |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0) AS r2
        |FROM m ORDER BY grp""".stripMargin),
      doc = "Per-group OLS trend from exact integer moments (regr_slope family)")
  )
}
