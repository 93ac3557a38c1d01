package graft

/** Plan-shape regression gates: the scale properties the engine claims
  * (predicate pushdown into parquet scans, broadcast dimension joins,
  * aggregated — not windowed — top-k selection) asserted against the
  * actual executed plans, so a refactor that silently loses one fails
  * the suite instead of the 100× scale-up. */
class PlanSpecs extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf0001).queryExecution.executedPlan.toString

  test("q01/q02/q53 date predicates reach the parquet scan (PushedFilters)") {
    assert(plan("q01_pricing_summary").contains("LessThan(l_shipdate"),
      "q01 must push the l_shipdate bound into the scan")
    assert(plan("q02_filter_project").contains("GreaterThanOrEqual(l_shipdate"),
      "q02 must push the l_shipdate bound into the scan")
    val p53 = plan("q53_shipping_priority")
    assert(p53.contains("LessThan(o_orderdate") &&
      p53.contains("GreaterThanOrEqual(l_shipdate"),
      "q53 must push both date bounds into the scans")
  }

  test("dimension joins broadcast (q03 customer, q53 dims)") {
    assert(plan("q03_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q53_shipping_priority").contains("BroadcastHashJoin"))
  }

  test("knn top-k is aggregated, not windowed (N·k shuffle, not N²)") {
    // The declared knn_* queries read the shared materialized graph
    // (Materialized.table), so the scale-critical plan shape lives in
    // the producer — assert on knnGraph itself.
    val emb = Tables.load(spark, sf0001, "embeddings")
    val p = graft.knn.BruteForceKnn.knnGraph(emb, 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      "pair stream must come from the broadcast NL join")
    assert(!p.contains("Window"),
      "per-id selection must be the TopKByWeight aggregation, not a window sort")
  }
}
