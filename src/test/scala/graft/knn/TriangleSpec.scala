package graft.knn

import graft.SparkSpec

class TriangleSpec extends SparkSpec {

  test("triangleCounts: mutual triangle, one-way edges, square without diagonals") {
    import spark.implicits._
    def both(a: Long, b: Long): Seq[(Long, Long)] = Seq((a, b), (b, a))
    val edges = (
      // triangle 1-2-3, fully mutual
      both(1, 2) ++ both(2, 3) ++ both(1, 3) ++
        // one-way 4→1: not mutual, contributes nothing
        Seq((4L, 1L)) ++
        // mutual square 5-6-7-8 without diagonals: zero triangles
        both(5, 6) ++ both(6, 7) ++ both(7, 8) ++ both(5, 8)
      ).toDF("id", "nbr")

    val got = GraphAnalytics.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
  }

  test("clusteringCoefficient: triangle=1.0, square=0, one-way degree 0") {
    import spark.implicits._
    def both(a: Long, b: Long): Seq[(Long, Long)] = Seq((a, b), (b, a))
    val edges = (
      both(1, 2) ++ both(2, 3) ++ both(1, 3) ++ // mutual triangle
        Seq((4L, 1L)) ++                        // one-way: mutual deg 0
        both(5, 6) ++ both(6, 7) ++ both(7, 8) ++ both(5, 8) // square
      ).toDF("id", "nbr")
    val got = GraphAnalytics.clusteringCoefficient(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // triangle nodes: deg 2, 1 triangle, C = 2*1/(2*1) = 1.0 → 1e6 ppm
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((2L, 1L, 1000000L)))
    // one-way node: no mutual edges → deg 0, coeff 0
    assert(got(4L) == ((0L, 0L, 0L)))
    // square nodes: deg 2, no triangles → 0
    assert(got(5L) == ((2L, 0L, 0L)))
    assert(got(8L) == ((2L, 0L, 0L)))
  }

  test("clusteringCoefficient: 4-clique minus one edge gives 2/3") {
    import spark.implicits._
    def both(a: Long, b: Long): Seq[(Long, Long)] = Seq((a, b), (b, a))
    // 1-2-3-4 complete except edge (3,4): node 1 has deg 3, triangles
    // (1,2,3) and (1,2,4) → C(1) = 2*2/(3*2) = 2/3 → 666666 ppm (floor)
    val edges = (both(1, 2) ++ both(1, 3) ++ both(1, 4) ++
      both(2, 3) ++ both(2, 4)).toDF("id", "nbr")
    val got = GraphAnalytics.clusteringCoefficient(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 666666L)
    assert(got(2L) == 666666L)
    assert(got(3L) == 1000000L) // deg 2 (1,2), one triangle
    assert(got(4L) == 1000000L)
  }
}
