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
}
