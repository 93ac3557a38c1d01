package graft.relational

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val (labels, converged) = ConnectedComponents.label(
      nodes.toDF("id"), edges.toDF("a", "b"))
    assert(converged)
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labels chains, cycles, and singletons with the component min") {
    // chain 1-2-3-4, triangle 10-11-12 (+ duplicate/reversed edges),
    // isolated 20
    val got = run(
      Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L),
      Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
        (12L, 10L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long path converges to one component (diameter stress)") {
    val n = 20L
    val got = run(0L to n, (0L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
  }

  test("unconverged cap is reported, not silently wrong") {
    import spark.implicits._
    val (_, converged) = ConnectedComponents.label(
      (0L to 10L).toDF("id"),
      (0L until 10L).map(i => (i, i + 1)).toDF("a", "b"),
      maxIter = 2)
    assert(!converged)
  }

  test("leaves no pinned RDDs behind (shared-session hygiene)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, _) = ConnectedComponents.label(
      Seq(1L, 2L, 3L).toDF("id"), Seq((1L, 2L)).toDF("a", "b"))
    labels.count()
    graft.Checkpoints.release(labels)
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("property: labels equal a union-find oracle on random graphs (30 cases)") {
    val rnd = new scala.util.Random(19)
    (1 to 30).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val nodes = (0L until n.toLong).toSeq
      val edges = Seq.fill(rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      // local union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(v => v -> {
        // component label = min member id; min root via full scan
        val r = find(v.toInt)
        nodes.filter(u => find(u.toInt) == r).min
      }).toMap
      val got = run(nodes, edges)
      assert(got == expected, s"n=$n edges=$edges")
    }
  }

  test("minhash clusters track exact-Jaccard clusters (label agreement ≥ 0.9)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val exact = graft.text.PipelineOps.dupClusters(docs, 0.5)
      .select(col("doc_id"), col("cluster").as("exact"))
    val sketch = graft.text.PipelineOps.dupClusters(docs, 0.5,
        pairsOverride = Some(graft.text.Dedup.minhashPairs(docs, 0.5)
          .select(col("d1"), col("d2"))))
      .select(col("doc_id"), col("cluster").as("sketch"))
    val joined = exact.join(sketch, "doc_id")
    val n = joined.count()
    val agree = joined.filter(col("exact") === col("sketch")).count()
    assert(n > 0 && agree.toDouble / n >= 0.9,
      s"label agreement ${agree.toDouble / n} below 0.9")
  }

  test("chunkWindows: boundary lengths produce hand-computed windows") {
    import spark.implicits._
    // win=10, stride=6 → overlap 4; lengths chosen at the boundaries
    val docs = Seq(
      (1L, "a" * 9),   // L < win           → 1 window, short
      (2L, "b" * 10),  // L == win          → 1 window, exact
      (3L, "c" * 11),  // L == win+1        → 2 windows (2nd = 5 chars)
      (4L, "d" * 16),  // L == win+stride   → 2 windows (2nd exact tail)
      (5L, "e" * 17)   // L == win+stride+1 → 3 windows (3rd = 5 chars)
    ).toDF("doc_id", "text")
    val got = graft.text.PipelineOps.chunkWindows(docs, winChars = 10, stride = 6)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(
      (1L, 0L, 9), (2L, 0L, 10),
      (3L, 0L, 10), (3L, 1L, 5),
      (4L, 0L, 10), (4L, 1L, 10),
      (5L, 0L, 10), (5L, 1L, 10), (5L, 2L, 5)))
    // every char position is covered by at least one window
    val covered = got.groupBy(_._1).map { case (id, cs) =>
      id -> cs.map { case (_, idx, n) => (idx * 6 + 1, idx * 6 + n) }
        .sortBy(_._1) }
    covered.foreach { case (id, spans) =>
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 <= e1 + 1, s"gap in doc $id")
        case _ => ()
      }
    }
  }

  test("dup clusters: every member maps to its component's min doc id") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = graft.text.PipelineOps.dupClusters(docs, 0.1)
    val rows = out.collect()
    assert(rows.length == docs.count())
    // cluster label is always ≤ member id, and each cluster's canonical
    // member is exactly its label
    assert(rows.forall(r => r.getLong(1) <= r.getLong(0)))
    val canon = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(1)).toSet == canon)
  }
}
