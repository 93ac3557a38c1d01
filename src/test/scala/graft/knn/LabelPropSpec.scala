package graft.knn

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], rounds: Int = 5): Map[Long, Long] = {
    import spark.implicits._
    GraphAnalytics.labelPropagation(edges.toDF("id", "nbr"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def sym(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("two cliques joined by one bridge edge resolve to two communities") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3–10
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = run(edges)
    // min-label ties pull each clique to its smallest member
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
  }

  test("one-way edges are not mutual: every node keeps its own label") {
    val oneWay = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(oneWay)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("sync update is deterministic under repartition") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 1L), (2L, 5L)).toDF("id", "nbr")
    val a = GraphAnalytics.labelPropagation(edges.repartition(1), 4)
      .collect().toSeq.map(_.toString)
    val b = GraphAnalytics.labelPropagation(edges.repartition(9), 4)
      .collect().toSeq.map(_.toString)
    assert(a == b)
    assert(edges.select(col("id")).distinct().count() == a.size)
  }
}
