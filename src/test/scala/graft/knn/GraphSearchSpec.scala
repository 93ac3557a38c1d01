package graft.knn

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec, Tables}

/** Serving gates for the graph-based greedy ANN search (q219): the
  * declared row cross-verifies the hop machinery against DuckDB on the
  * exact graph; these specs gate the QUALITY claim — the built MRDF
  * graph, served by the same operator, finds true neighbors on data
  * with real locality structure (the testdata embeddings are
  * cosine-isotropic, so quality gates live on planted corpora — the
  * q171/AnnSpec doctrine). */
class GraphSearchSpec extends SparkSpec {

  private def plantedCorpus(n: Long, dim: Int, clusters: Int, seed: Long) = {
    val f = java.nio.file.Files
      .createTempFile(s"graft-gs-$n-$seed", ".fvecs")
    f.toFile.deleteOnExit()
    graft.io.FvecsGen.write(f.toString, n, dim, seed, clusters)
    graft.io.Fvecs.readAuto(spark, f.toString).toDF("vec_id", "embedding")
      .localCheckpoint()
  }

  private def recallAt10(got: org.apache.spark.sql.DataFrame,
                         truth: org.apache.spark.sql.DataFrame): Double = {
    val g = got.select(col("qid"), col("nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = truth.collect().map(r => (r.getLong(0), r.getLong(1)))
    t.count(g.contains).toDouble / t.length
  }

  test("beam search over the built MRDF graph: recall@10 >= 0.9 on planted clusters") {
    // A kNN graph of well-separated clusters is DISCONNECTED across
    // clusters (each node's k neighbors are cluster-mates), so greedy
    // navigation cannot cross components — the navigability caveat
    // HNSW's long links exist to solve. The serving recipe for
    // clustered corpora is therefore entry COVERAGE: a best-of-S
    // md5-seeded entry set with S >> clusters (every seed is scored,
    // expansion then descends inside the query's own cluster). Here
    // S=64 over 16 clusters (per-cluster miss (15/16)^64 ≈ 1.6%).
    val vecs = plantedCorpus(2000, 32, clusters = 16, seed = 7L)
    val edges = graft.mrdf.Mrdf.buildGraph(vecs, graft.mrdf.MrdfQueries.testParams)
    try {
      val queries = vecs.filter(col("vec_id") % 20 === 0) // 100 queries
      val got = GraphSearch.beamSearch(vecs, edges, queries,
        k = 10, beam = 8, hops = 4, nSeeds = 64)
      val truth = org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, 10)
        .select(col("id").as("qid"), col("nbr"))
      val r = recallAt10(got, truth)
      info(f"MRDF-graph beam-search recall@10 = $r%.4f")
      assert(r >= 0.9, f"recall@10 $r%.4f below the 0.9 serving gate")
    } finally graft.Checkpoints.release(edges)
  }

  test("beam search over the EXACT graph navigates multi-hop on a connected corpus") {
    // pure-navigation gate: uniform LOW-dim data has a connected,
    // navigable kNN graph (near-Delaunay), so high recall from only 4
    // entry points REQUIRES the hop machinery to walk the graph — the
    // seeds alone cover a vanishing fraction of the space
    val vecs = plantedCorpus(1000, 4, clusters = 0, seed = 11L)
    val exact = BruteForceKnn.knnGraph(vecs, 10)
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val got = GraphSearch.beamSearch(vecs, exact, queries,
      k = 10, beam = 8, hops = 8, nSeeds = 4)
    val truth = org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, 10)
      .select(col("id").as("qid"), col("nbr"))
    val r = recallAt10(got, truth)
    info(f"exact-graph beam-search recall@10 = $r%.4f")
    assert(r >= 0.9, f"recall@10 $r%.4f below 0.9 - navigation failed")
    // and the same search WITHOUT hops (seeds only) must be far worse,
    // proving the recall above comes from graph traversal
    val noHops = GraphSearch.beamSearch(vecs, exact, queries,
      k = 10, beam = 8, hops = 0, nSeeds = 4)
    val r0 = recallAt10(noHops, truth)
    info(f"seeds-only recall@10 = $r0%.4f")
    assert(r0 < 0.2, f"seeds-only recall $r0%.4f unexpectedly high")
  }

  test("routed entry matches flat coverage recall on clustered MRDF graph with 8x fewer entries") {
    // same corpus/graph claim as the coverage test, but the router
    // enters at the query's OWN cluster: <= nprobe*seedsPerList = 8
    // scored entries per query instead of the 64-seed coverage set
    val vecs = plantedCorpus(2000, 32, clusters = 16, seed = 7L)
    val edges = graft.mrdf.Mrdf.buildGraph(vecs, graft.mrdf.MrdfQueries.testParams)
    try {
      val queries = vecs.filter(col("vec_id") % 20 === 0)
      val got = GraphSearch.routedBeamSearch(vecs, edges, queries,
        k = 10, beam = 8, hops = 4, nlist = 32, nprobe = 2,
        seedsPerList = 4, kmeansIters = 3, portableQuantizer = false)
      val truth = org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, 10)
        .select(col("id").as("qid"), col("nbr"))
      val r = recallAt10(got, truth)
      info(f"routed-entry beam-search recall@10 = $r%.4f")
      assert(r >= 0.9, f"recall@10 $r%.4f below the 0.9 serving gate")
    } finally graft.Checkpoints.release(edges)
  }

  test("long links bridge the disconnected clustered graph from 4 flat seeds") {
    // the exact kNN graph of well-separated clusters is disconnected:
    // 4 flat seeds reach at most 4 clusters and recall collapses; the
    // hub-pool long links (pool >> clusters) restore navigability
    // without coverage-sized entries or a router
    val vecs = plantedCorpus(2000, 32, clusters = 16, seed = 7L)
    val exact = BruteForceKnn.knnGraph(vecs, 10).localCheckpoint()
    val queries = vecs.filter(col("vec_id") % 20 === 0)
    val truth = org.apache.spark.sql.graft.TopKJoin.knn(queries, vecs, 10)
      .select(col("id").as("qid"), col("nbr"))
    val plain = GraphSearch.beamSearch(vecs, exact, queries,
      k = 10, beam = 8, hops = 6, nSeeds = 4)
    val rPlain = recallAt10(plain, truth)
    val linked = GraphSearch.withLongLinks(vecs, exact,
      poolSize = 64, perNode = 4).localCheckpoint()
    val got = GraphSearch.beamSearch(vecs, linked, queries,
      k = 10, beam = 8, hops = 8, nSeeds = 4)
    val r = recallAt10(got, truth)
    info(f"plain-graph recall@10 = $rPlain%.4f, long-linked = $r%.4f")
    assert(rPlain < 0.5, f"plain graph unexpectedly navigable ($rPlain%.4f)")
    assert(r >= 0.9, f"long-linked recall@10 $r%.4f below the 0.9 gate")
  }

  test("q219 contract: deterministic reruns, contiguous ranks, no self, correct dists") {
    val out1 = Registry.byName("q219_graph_ann_search").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val out2 = Registry.byName("q219_graph_ann_search").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out1.toSeq == out2.toSeq, "beam search must be rerun-deterministic")
    assert(out1.nonEmpty)
    out1.foreach { case (qid, nbr, _, _) => assert(qid != nbr, "self excluded") }
    out1.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.size).toSeq,
        s"qid $q ranks must be contiguous from 1")
    }
    // reported dist = true rounded euclidean distance for the pair
    val emb = Tables.load(spark, sf0001, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out1.take(50).foreach { case (qid, nbr, d, _) =>
      val qv = emb(qid); val nv = emb(nbr)
      val expect = BigDecimal(math.sqrt(
        qv.zip(nv).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(d - expect) < 1e-9, s"dist mismatch for ($qid,$nbr)")
    }
  }

  test("hop-1 state bound holds: visited set never exceeds seeds + hops*beam*outdegree") {
    val vecs = plantedCorpus(500, 8, clusters = 10, seed = 3L)
    val exact = BruteForceKnn.knnGraph(vecs, 10)
    val queries = vecs.filter(col("vec_id") < 5)
    // k large enough to return the whole visited set
    val got = GraphSearch.beamSearch(vecs, exact, queries,
      k = 1000, beam = 4, hops = 3, nSeeds = 4)
    val maxVisited = got.groupBy(col("qid")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxVisited <= 4 + 3 * 4 * 10,
      s"visited-set bound violated: $maxVisited")
  }
}
