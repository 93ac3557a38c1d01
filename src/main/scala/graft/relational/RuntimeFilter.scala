package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Explicit Bloom-prefiltered join — the 100 TB shuffle-reduction
  * pattern made deterministic: when a selective dimension joins a huge
  * fact, the expensive part is shuffling fact rows that will never
  * match. Build a Bloom filter over the dim's join keys (a distributed
  * sketch aggregation — bit-OR merge, tiny bitset to the driver), embed
  * it in the plan as a binary literal probed by the codegen'd
  * BloomFilterMightContain predicate (SketchExpressions), and drop
  * non-matching fact rows AT THE SCAN, before
  * the exchange. Blooms have no false negatives, so the subsequent
  * exact join sees every true match; false positives only ride along
  * to the join, which removes them — the composed result is PROVABLY
  * identical to the plain join (the oracle and the equivalence spec
  * both assert it).
  *
  * Spark 4's optimizer can inject the same shape on its own
  * (spark.sql.optimizer.runtime.bloomFilter.*) when cost heuristics
  * fire; this operator is the explicit, always-on form — the plan
  * gate in the spec pins the filter BELOW the fact-side exchange,
  * where the optimizer's version is best-effort. */
object RuntimeFilter {

  /** Inner equi-join of `fact` to `dim` on `factKey` = `dimKey`, with
    * a broadcast Bloom prefilter on the fact side. Results are
    * identical to the plain join for ANY fpp. */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame,
                           factKey: String, dimKey: String,
                           expectedItems: Long = 100000L,
                           fpp: Double = 0.01): DataFrame = {
    val bf = dim.select(col(dimKey)).na.drop()
      .stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(
        org.apache.spark.sql.graft.SketchExpressions.mightContainLong(bf, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Revenue by supplier for low-nation suppliers: the declared shape —
    * selective dim (~1/5 of suppliers), wide fact (lineitem). Money in
    * exact integer cents. */
  def lowNationSupplierRevenue(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val dim = supplier.filter(col("s_nationkey") < 5)
      .select(col("s_suppkey"), col("s_name"))
    bloomPrefilteredJoin(lineitem, dim, "l_suppkey", "s_suppkey")
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum((round(col("l_extendedprice") * 100).cast("long") * (lit(100L) -
          round(col("l_discount") * 100).cast("long")))).as("revenue_c4"))
      .orderBy(col("s_suppkey"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q164_bloom_join",
      (s, dir) => lowNationSupplierRevenue(
        Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "supplier")),
      // The oracle is the PLAIN join — the Bloom prefilter must be
      // invisible in the result.
      Some("""SELECT s_suppkey, s_name, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    AS revenue_c4
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey < 5
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin),
      doc = "Bloom-prefiltered join: broadcast key sketch drops non-matching fact rows before the shuffle; provably result-identical to the plain join")
  )
}
