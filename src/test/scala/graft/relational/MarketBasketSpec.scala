package graft.relational

import graft.SparkSpec

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  /** lineitem-shaped frame from (orderkey, partkey). */
  private def itemsOf(rows: Seq[(Long, Long)]) =
    rows.toDF("l_orderkey", "l_partkey")

  test("coPurchase: support over baskets, lift from basket frequencies") {
    // baskets: 1 = {10,20,30}, 2 = {10,20}, 3 = {10} (dropped: size 1)
    val out = MarketBasket.coPurchase(itemsOf(Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L)
    ))).collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // n_baskets=2 (order 3 excluded); freq over kept baskets: 10→2, 20→2, 30→1
    assert(byPair((10L, 20L)) == ((2L, 2L, 2L, 1000000L))) // lift 2*2/(2*2)=1
    assert(byPair((10L, 30L)) == ((1L, 2L, 1L, 1000000L))) // 1*2/(2*1)=1
    assert(byPair((20L, 30L)) == ((1L, 2L, 1L, 1000000L)))
    // top by support: (10,20) first
    assert((out.head.getLong(0), out.head.getLong(1)) == ((10L, 20L)))
  }

  test("coPurchase: duplicate part lines collapse; mega-baskets dropped") {
    val out = MarketBasket.coPurchase(itemsOf(Seq(
      // order 1: part 10 twice + part 20 → one pair with support 1
      (1L, 10L), (1L, 10L), (1L, 20L),
      // order 2: 4 distinct parts — dropped by maxBasket=3
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L)
    )), maxBasket = 3).collect()
    assert(out.length == 1)
    assert((out.head.getLong(0), out.head.getLong(1), out.head.getLong(2)) ==
      ((10L, 20L, 1L)))
  }

  test("coPurchase: anti-correlated pair has lift below 1") {
    // 10 baskets: {1,2} ×1, {1,3} ×9 — pair (1,2) support 1,
    // freq 1→10, 2→1 → lift = 1*10/(10*1) = 1.0; make it sub-1:
    // add {2,4} ×4: freq 2→5, n=14 → lift(1,2) = 1*14/(10*5) = 0.28
    val rows =
      Seq((100L, 1L), (100L, 2L)) ++
        (1 to 9).flatMap(i => Seq((200L + i, 1L), (200L + i, 3L))) ++
        (1 to 4).flatMap(i => Seq((300L + i, 2L), (300L + i, 4L)))
    val out = MarketBasket.coPurchase(itemsOf(rows)).collect()
    val lift = out.collectFirst {
      case r if r.getLong(0) == 1L && r.getLong(1) == 2L => r.getLong(5)
    }.get
    assert(lift == 280000L) // 0.28 in ppm
  }
}
