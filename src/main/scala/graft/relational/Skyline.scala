package graft.relational

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Distributed 2-D skyline (Pareto frontier) — "no other row is at
  * least as good on both dimensions and strictly better on one".
  * Here: parts no other part matches with price ≤ AND size ≥ (one
  * strict) — the cheaper-and-bigger frontier.
  *
  * Scale design (Börzsönyi et al., ICDE 2001, divide-and-conquer
  * form): the skyline operator is MERGEABLE — skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)) — so phase 1 runs the O(n log n)
  * sort-sweep per partition with NO shuffle at all, and phase 2 runs
  * the identical sweep once over the per-partition survivors. Only
  * survivors cross the wire: for correlated dimensions that is a few
  * rows per partition regardless of partition size. (The adversarial
  * bound is output-size — a fully anti-correlated dataset has an O(n)
  * skyline, and no algorithm beats its own output.) The merge law is
  * ScalaCheck-style spec-gated; the whole operator is oracled against
  * the textbook NOT EXISTS form in DuckDB.
  *
  * Prices quantize to integer cents before any comparison, so the
  * dominance test is exact integer math in both engines. */
object Skyline {

  /** One sort-sweep pass: rows sorted (price asc, size desc, id asc);
    * a price group's max-size rows survive iff that size strictly
    * beats every strictly-cheaper size seen so far. Equal (price,
    * size) rows never dominate each other — all survive. */
  private[relational] def sweep(rows: Iterator[(Long, Long, Int)]): Iterator[(Long, Long, Int)] = {
    val sorted = rows.toArray.sortBy { case (id, price, size) => (price, -size, id) }
    val out = Array.newBuilder[(Long, Long, Int)]
    var bestCheaper = Int.MinValue // max size among strictly cheaper rows
    var i = 0
    while (i < sorted.length) {
      val price = sorted(i)._2
      val groupMax = sorted(i)._3 // first of the price group = its max size
      // emit the group's max-size rows if they beat every cheaper row
      if (groupMax > bestCheaper) {
        var j = i
        while (j < sorted.length && sorted(j)._2 == price && sorted(j)._3 == groupMax) {
          out += sorted(j); j += 1
        }
      }
      // skip the rest of the price group (dominated by the group max)
      while (i < sorted.length && sorted(i)._2 == price) i += 1
      if (groupMax > bestCheaper) bestCheaper = groupMax
    }
    out.result().iterator
  }

  /** Two-phase distributed skyline over `(id, price_cents, size)`.
    *
    * Phase 1: shuffle-free local skylines. Phase 2: range-partition the
    * survivors on price (equal prices co-locate, so every row in range
    * partition i is strictly cheaper than every row in partition i+1),
    * then sweep each range LOCALLY and keep only rows whose size
    * strictly beats the running max size of all cheaper partitions —
    * that running max is one Int per partition, computed by a
    * P-row collect and broadcast back. Rows with price strictly lower
    * dominate iff their size is ≥, so the prefix max is the complete
    * cross-partition dominance summary in 2-D.
    *
    * The previous form merged all survivors through `coalesce(1)` — one
    * task holding the whole frontier, which for anti-correlated data is
    * O(n). This shape keeps the output distributed end-to-end; the only
    * driver traffic is the P-value boundary exchange.
    *
    * Note: the boundary exchange is a cross-partition dependency, so
    * construction runs two eager jobs (range sampling + the per-
    * partition max collect) — same eager-builder tier as the kmeans /
    * BPE-training queries. Nothing stays persisted: the survivor RDD's
    * range shuffle is re-fetched (not recomputed) when the returned
    * Dataset is consumed. */
  def skyline2d(points: Dataset[(Long, Long, Int)]): Dataset[(Long, Long, Int)] = {
    val spark = points.sparkSession
    import spark.implicits._
    val locals = points.mapPartitions(sweep)
    val nRange = spark.sessionState.conf.numShufflePartitions
    // Deliberately NOT persisted (ADVICE r5: a persisted survivor RDD
    // leaked across library calls): the two consumers below evaluate
    // the same RDD object, so the second pass re-fetches the range
    // shuffle's map outputs from disk — Spark retains shuffle files
    // for live RDDs independently of persist() — rather than
    // recomputing the scan, and nothing stays pinned after return.
    val ranged = locals.repartitionByRange(nRange, $"_2").rdd
    // One value per range partition crosses the driver: its max size.
    // Long-typed with Long.MinValue as the "no cheaper partition yet"
    // sentinel — an Int sentinel would collide with rows whose size IS
    // Int.MinValue (a legal value of the generic entry point) and
    // silently drop undominated frontier rows.
    val maxes = ranged.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue
      it.foreach(r => if (r._3.toLong > m) m = r._3.toLong)
      Iterator.single((i, m))
    }.collect().toMap
    val nParts = ranged.getNumPartitions
    val prefix = new Array[Long](nParts) // max size over partitions < i
    var run = Long.MinValue
    var i = 0
    while (i < nParts) {
      prefix(i) = run
      run = math.max(run, maxes.getOrElse(i, Long.MinValue))
      i += 1
    }
    val bc = spark.sparkContext.broadcast(prefix)
    // Post-filtering the local sweep on `size > prefix` is equivalent to
    // seeding the sweep's bestCheaper with the prefix max: the sweep
    // emits only per-price-group max sizes, so the filter removes
    // exactly the groups an externally-seeded sweep would skip.
    val out = ranged.mapPartitionsWithIndex { (pid, it) =>
      val floor = bc.value(pid)
      sweep(it).filter(_._3.toLong > floor)
    }
    spark.createDataset(out)
  }

  /** The cheaper-and-bigger part frontier, as a declared query. */
  def partFrontier(part: DataFrame): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    val pts = part.select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size"))
      .as[(Long, Long, Int)]
    skyline2d(pts).toDF("p_partkey", "price_cents", "p_size")
      .orderBy(col("p_partkey"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q127_skyline",
      (s, dir) => partFrontier(Tables.load(s, dir, "part")),
      Some("""WITH p AS (SELECT p_partkey,
        |        CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |        p_size
        |      FROM part)
        |SELECT p_partkey, price_cents, p_size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin),
      doc = "2-D skyline via shuffle-free local sweeps + survivor merge (Pareto frontier)")
  )
}
