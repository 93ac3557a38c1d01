package graft.knn

import graft.SparkSpec

class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long, Double)*) =
    rows.toDF("id", "nbr", "dist")

  test("a cheaper two-hop path beats the direct edge (BFS would not)") {
    // source 0: direct 0→3 costs 10; 0→1→3 costs 2+3=5
    val g = edges((0L, 3L, 10.0), (0L, 1L, 2.0), (1L, 3L, 3.0))
    val got = GraphAnalytics.ssspMicro(g, sourceMod = 100L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(3L) == Some(5000000L))
    assert(got(1L) == Some(2000000L))
    assert(got(0L) == Some(0L))
  }

  test("a settled distance improves in a later round; unreached stays null") {
    // 0→4 direct = 100; 0→1→2→4 = 1+1+1 = 3 (settles 4 at round 1,
    // improves it at round 3). Node 9 has no in-path from a source.
    val g = edges((0L, 4L, 100.0), (0L, 1L, 1.0), (1L, 2L, 1.0),
      (2L, 4L, 1.0), (9L, 4L, 1.0))
    val got = GraphAnalytics.ssspMicro(g, sourceMod = 100L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(4L) == Some(3000000L))
    assert(got(9L) == None)
  }

  test("hop bound truncates: a path needing 5 edges is not taken") {
    val g = edges((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0))
    val got = GraphAnalytics.ssspMicro(g, sourceMod = 100L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(4L) == Some(4000000L))
    assert(got(5L) == None, "5 edges from the source exceeds maxHops = 4")
  }

  test("multi-source takes the nearest source; repartition-invariant") {
    // sources 0 and 100; node 50 is 7.0 from 0 but 2.0 from 100
    val g = edges((0L, 50L, 7.0), (100L, 50L, 2.0), (50L, 60L, 1.0))
    val a = GraphAnalytics.ssspMicro(g, sourceMod = 100L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(a(50L) == Some(2000000L))
    assert(a(60L) == Some(3000000L))
    val b = GraphAnalytics.ssspMicro(g.repartition(5), sourceMod = 100L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(a == b)
  }
}
