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
