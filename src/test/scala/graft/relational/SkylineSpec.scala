package graft.relational

import graft.{SparkSpec, Tables}

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force O(n²) dominance reference. */
  private def brute(pts: Seq[(Long, Long, Int)]): Set[(Long, Long, Int)] =
    pts.filter { a =>
      !pts.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.toSet

  private def sky(s: Seq[(Long, Long, Int)]): Set[(Long, Long, Int)] =
    Skyline.sweep(s.iterator).toSet

  test("hand case: frontier keeps ties, drops dominated rows") {
    // 1 and 2 tie on (100, 5) — both survive; 3 is the cheaper-smaller
    // frontier point; 4 dominated by 1/2; 5 dominated by 3 (same
    // price, smaller size)
    val pts = Seq(
      (1L, 100L, 5), (2L, 100L, 5), (3L, 50L, 3), (4L, 120L, 5), (5L, 50L, 2))
    val out = Skyline.skyline2d(pts.toDS()).collect().toSet
    assert(out == Set((1L, 100L, 5), (2L, 100L, 5), (3L, 50L, 3)))
    assert(out == brute(pts))
  }

  test("merge law + brute-force equality (property, 300 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      // small value domains force price ties, size ties and duplicates
      val pts = List.fill(rnd.nextInt(40))(
        (rnd.nextLong(), rnd.nextInt(12).toLong, rnd.nextInt(6)))
      val (a, b) = pts.splitAt(pts.length / 2)
      val whole = sky(pts)
      assert(whole == sky((sky(a) ++ sky(b)).toSeq), s"merge law broke on $pts")
      assert(whole == brute(pts), s"brute mismatch on $pts")
    }
  }

  test("anti-correlated planted set: O(n) frontier exact at any partitioning") {
    // price = i AND size = i: paying more always buys strictly more,
    // so no point dominates any other — EVERY point is on the
    // frontier, the adversarial case for the old coalesce(1) merge
    // (survivors = n in one task).
    val n = 5000
    val frontier = (0 until n).map(i => (i.toLong, i.toLong, i))
    // noise at the same price but strictly smaller size: all dominated
    val noise = (0 until n).map(i => (100000L + i, i.toLong, i - 3))
    val pts = new scala.util.Random(7).shuffle(frontier ++ noise)
    Seq(1, 13, 64).foreach { p =>
      val out = Skyline.skyline2d(pts.toDS().repartition(p)).collect().toSet
      assert(out == frontier.toSet, s"frontier wrong at $p partitions")
    }
  }

  test("partition count does not change the frontier (sf0.001 parts)") {
    val part = Tables.load(spark, sf0001, "part")
    val one = Skyline.partFrontier(part.repartition(1)).collect().toSeq
    val many = Skyline.partFrontier(part.repartition(13)).collect().toSeq
    assert(one.nonEmpty && one.map(_.toString) == many.map(_.toString))
  }
}
