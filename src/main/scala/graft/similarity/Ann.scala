package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.linalg.Distances

/** Approximate nearest-neighbor search over the embedding column —
  * the scale path beyond brute force (north-star extension).
  *
  * Two bucketing strategies, both ending in exact cosine re-ranking of
  * the candidate set only:
  *  - LSH: random-hyperplane sign bits, banded so a query meets only
  *    docs sharing a band value — at 100 TB the join is bucket-local,
  *    no N² pairs, no broadcast of the big side.
  *  - IVF: per-label centroids (the coarse quantizer); queries probe
  *    the nprobe nearest centroids and scan only those inverted lists.
  * Seeded hyperplanes ⇒ deterministic, but not SQL-mirrorable (no
  * oracle); recall vs brute force is asserted in ScalaTest.
  */
object Ann {

  /** The deterministic ±1 hyperplanes behind [[lshBands]] — exposed so
    * the ann_quality oracle generator can embed the SAME constants as
    * SQL literals (the q129 generated-mirror pattern): the planes, not
    * the RNG, are the shared contract between engines. */
  def lshPlanes(dim: Int, bands: Int, bitsPerBand: Int,
                seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(bands * bitsPerBand)(
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** Sign-bit LSH signature bands. planes = bands × bitsPerBand
    * hyperplanes with deterministic ±1 components from `seed`. */
  def lshBands(emb: DataFrame, dim: Int, bands: Int, bitsPerBand: Int,
               seed: Long, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val planes = lshPlanes(dim, bands, bitsPerBand, seed)
    // codegen DotProduct, not an interpreted aggregate/zip_with lambda:
    // 32 projections per vector make the signature the LSH hot path
    def bit(p: Int): Column =
      when(Distances.dot(col(vecCol), typedlit(planes(p).toSeq)) >= 0, 1L)
        .otherwise(0L)
    val bandCols = (0 until bands).map { b =>
      val v = (0 until bitsPerBand)
        .map(i => bit(b * bitsPerBand + i) * lit(1L << i))
        .reduce(_ + _)
      struct(lit(b).as("band"), v.as("bv"))
    }
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("vec"), col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  /** LSH-bucketed approximate cosine top-k for a query subset. */
  def lshTopK(emb: DataFrame, k: Int, dim: Int, queryPred: Column,
              bands: Int = 4, bitsPerBand: Int = 8, seed: Long = 42L): DataFrame = {
    // materialized once: the signature computation feeds the query side
    // and the candidate side of the bucket join
    val buckets = lshBands(emb, dim, bands, bitsPerBand, seed).localCheckpoint()
    val q = buckets.filter(queryPred).select(
      col("id").as("qid"), col("vec").as("qv"), col("band"), col("bv"))
    val cands = q.join(buckets.select(col("id").as("nbr"), col("vec").as("cv"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
      .dropDuplicates("qid", "nbr")
    rerank(cands, k)
  }

  /** Distributed Lloyd's k-means — the IVF coarse quantizer. Seeded
    * deterministic init (bottom-k by hash, the same order-independent
    * sampler as MRDF's centroid pick); each round is one broadcast
    * argmin join + one per-(cluster, dim) mean. Centroid tables are k
    * rows — driver-free and broadcast-sized at any data scale. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 5, seed: Long = 42L,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pts = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // orderBy+limit is a distributed TakeOrdered; the (unpartitioned)
    // row_number window then only ever sees k rows
    // LAZY localCheckpoint chain (round-14): every round's plan sees a
    // truncated LogicalRDD leaf, but the eager variant paid one
    // driver-synced job per round (iters+1 jobs of latency per
    // training); the lazy chain materializes every round inside the
    // consumer's single action. Superseded rounds' blocks (k rows
    // each) are released by the harness sweep after the action.
    var cent = pts
      .withColumn("h", xxhash64(lit(seed), col("id")))
      .orderBy(col("h"), col("id")).limit(k)
      .withColumn("cid", row_number().over(
        Window.orderBy(col("h"), col("id"))) - 1)
      .select(col("cid"), col("vec").as("cvec"))
      .localCheckpoint(eager = false)
    (1 to iters).foreach { _ =>
      // argmin as min(struct(d, cid, vec)): map-side partial agg → one
      // row per point crosses the shuffle, vs N×k for a window argmin
      val assigned = pts.join(broadcast(cent))
        .select(col("id"), struct(
          Distances.euclidean(col("vec"), col("cvec")).as("d"),
          col("cid").as("cid"), col("vec").as("vec")).as("cand"))
        .groupBy(col("id")).agg(min(col("cand")).as("m"))
        .select(col("m.cid").as("cid"), col("m.vec").as("vec"))
      cent = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("s"))
        .select(col("cid"), transform(col("s"), e => e("m").cast("float")).as("cvec"))
        .localCheckpoint(eager = false)
    }
    cent
  }

  /** Cross-engine-exact distributed Lloyd's — [[kmeansCentroids]]'
    * oracle-mirrorable twin (the generated-mirror doctrine applied to
    * an ITERATIVE float algorithm): init is bottom-k by the portable
    * md5 rank (not xxhash64, which DuckDB lacks), and each round's
    * centroid mean is a SEQUENTIAL double fold over member values in
    * id order — `avg`'s partial aggregation is order-free and thus not
    * bit-reproducible across engines. Every argmin ties on (d, cid).
    * [[kmeansCentroids]] (xxhash init, plain avg — the order-free
    * shapes you want at 100 TB) remains the scale path. */
  def kmeansCentroidsPortable(emb: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pts = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // PACKED single-row rounds (round-15, guide §2/§5): the training
    // corpus is bounded (the TrainTargetN sample rule) and the centroid
    // table is k rows, yet the unpacked loop paid THREE shuffles per
    // round (argmin groupBy(id), mean groupBy(cid,pos), repack
    // groupBy(cid)) — ~18 shuffle stages of pure scheduling latency per
    // training at any scale. Each round is now ONE global aggregation:
    // centroids ride in a single packed row (cents: array<struct<cid,
    // cvec>>), the argmin is a narrow broadcast projection over the
    // point scan, and the member-sorted mean folds run as HOFs inside
    // the aggregated row. Every numeric shape is IDENTICAL to the
    // unpacked form (and thus to the DuckDB oracle texts): same md5
    // bottom-k init ordered by (hk, id), same (d, cid) argmin
    // tie-break, same sequential CAST-to-DOUBLE fold over members in
    // id order per dim, same double/count division, same final FLOAT
    // cast. LAZY localCheckpoint chain per round as before (round-14):
    // all rounds execute inside the consumer's one action.
    def packedMeans(assigned: DataFrame): DataFrame =
      assigned
        .agg(array_sort(collect_list(
          struct(col("cid"), col("id"), col("vec")))).as("all"))
        // `all` is sorted by (cid, id): cids come out ascending and
        // each filtered group keeps id order — the fold order the
        // oracle replays
        .select(col("all"),
          array_distinct(transform(col("all"), e => e.getField("cid")))
            .as("cids"))
        .select(col("cids"),
          transform(col("cids"),
            c => filter(col("all"), e => e.getField("cid") === c))
            .as("groups"))
        .select(zip_with(col("cids"), col("groups"), (c, g) =>
          struct(c.as("cid"),
            transform(
              sequence(lit(0), size(element_at(g, 1).getField("vec")) - 1),
              pos => (aggregate(g, lit(0.0), (acc, e) =>
                acc + element_at(e.getField("vec"), pos + 1).cast("double"))
                / size(g)).cast("float")).as("cvec"))).as("cents"))
    var cent = pts
      .withColumn("hk", conv(substring(
        md5(concat(lit("km|"), col("id").cast("string"))), 1, 15), 16, 10)
        .cast("long"))
      .agg(array_sort(collect_list(
        struct(col("hk"), col("id"), col("vec")))).as("all"))
      .select(slice(col("all"), 1, k).as("top"))
      .select(transform(col("top"), (e, i) =>
        struct(i.cast("int").as("cid"), e.getField("vec").as("cvec")))
        .as("cents"))
      .localCheckpoint(eager = false)
    (1 to iters).foreach { _ =>
      val assigned = pts.crossJoin(broadcast(cent))
        .select(col("id"), col("vec"),
          array_min(transform(col("cents"), c => struct(
            Distances.euclidean(col("vec"), c.getField("cvec")).as("d"),
            c.getField("cid").as("cid")))).getField("cid").as("cid"))
      cent = packedMeans(assigned).localCheckpoint(eager = false)
    }
    cent.select(explode(col("cents")).as("c"))
      .select(col("c.cid").as("cid"), col("c.cvec").as("cvec"))
  }

  /** Per-(process, sfDir) MATERIALIZED portable router (round-14
    * optimization): several declared queries train the IDENTICAL
    * portable Lloyd's quantizer over the same corpus each invocation —
    * q175/q218/q223/q225/q229 all train (nlist=8, iters=5) on the full
    * embeddings table, q220/q227/q230 on the same 75% base slice. Like
    * the shared knn10 graph, the training result is a deterministic
    * pure function of the corpus, and (cid INT, cvec ARRAY<FLOAT>)
    * round-trips parquet bit-exactly, so the first timed consumer pays
    * the build and the rest scan it — exactly the production shape
    * (one training job, many consumers). Callers MUST key by the
    * corpus + every training parameter; the reset-per-bench-pass
    * semantics of [[graft.Materialized]] keep warm-cache numbers
    * honest. */
  def sharedPortableCentroids(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, corpusKey: String, nlist: Int, iters: Int)
      (corpus: => DataFrame): DataFrame =
    // the Lloyd's chain is `iters` bounded-size rounds — scope the
    // build to the iterative-build regime (round-15, measured: the
    // shared router train was 3 s warm at the session's 32 partitions,
    // dominated by tiny-task setup and per-stage planning, not compute)
    graft.Tuning.withIterativeBuild(spark) {
      graft.Materialized.table(spark, sfDir, s"kmpc-$corpusKey-n$nlist-i$iters")(
        kmeansCentroidsPortable(corpus, nlist, iters))
    }

  /** [[ivfKmeansTopK]] over the portable quantizer — the variant the
    * q175 oracle replays end to end (init, every Lloyd's round, list
    * assignment, probes, exact re-rank). `cent` supplies a precomputed
    * router (it must equal `kmeansCentroidsPortable(emb, nlist,
    * kmeansIters)` — the [[sharedPortableCentroids]] hook). */
  def ivfKmeansTopKPortable(emb: DataFrame, k: Int, queryPred: Column,
      nlist: Int = 8, nprobe: Int = 3, kmeansIters: Int = 5,
      cent0: Option[DataFrame] = None): DataFrame = {
    val cent = cent0.getOrElse(kmeansCentroidsPortable(emb, nlist, kmeansIters))
    val pts = emb.select(col("vec_id").as("nbr"), col("embedding").as("cv"))
    val lists = pts.join(broadcast(cent))
      .select(col("nbr"), struct(
        Distances.euclidean(col("cv"), col("cvec")).as("d"),
        col("cid").as("cid"), col("cv").as("cv")).as("cand"))
      .groupBy(col("nbr")).agg(min(col("cand")).as("m"))
      .select(col("m.cid").as("cid"), col("nbr"), col("m.cv").as("cv"))
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("cd", Distances.euclidean(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("cid"))))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val cands = probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
    rerank(cands, k)
  }

  /** IVF with the k-means quantizer: build inverted lists by nearest
    * centroid, probe the nprobe nearest lists per query, exact re-rank. */
  def ivfKmeansTopK(emb: DataFrame, k: Int, queryPred: Column,
                    nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 5,
                    seed: Long = 42L): DataFrame = {
    val cent = kmeansCentroids(emb, nlist, kmeansIters, seed)
    val pts = emb.select(col("vec_id").as("nbr"), col("embedding").as("cv"))
    val lists = pts.join(broadcast(cent))
      .select(col("nbr"), struct(
        Distances.euclidean(col("cv"), col("cvec")).as("d"),
        col("cid").as("cid"), col("cv").as("cv")).as("cand"))
      .groupBy(col("nbr")).agg(min(col("cand")).as("m"))
      .select(col("m.cid").as("cid"), col("nbr"), col("m.cv").as("cv"))
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("cd", Distances.euclidean(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("cid"))))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val cands = probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
    rerank(cands, k)
  }

  /** IVF-style ANN: coarse centroids from the label column (the
    * testdata's cluster assignment), queries probe the nprobe nearest
    * centroids, exact re-rank inside the probed lists. */
  def ivfTopK(emb: DataFrame, k: Int, queryPred: Column,
              nprobe: Int = 2): DataFrame = {
    // centroid per label: mean vector via posexplode + per-(label,pos) avg
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("s"))
      .select(col("label").as("clabel"),
        transform(col("s"), e => e("m").cast("float")).as("cvec"))
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("cd", Distances.euclidean(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("clabel"))))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("clabel"))
    val cands = probes.join(
        emb.select(col("vec_id").as("nbr"), col("embedding").as("cv"), col("label")),
        col("clabel") === col("label"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
    rerank(cands, k)
  }

  /** [[ivfTopK]] with cross-engine-exact centroids: the per-(label, dim)
    * mean is computed as a SEQUENTIAL double fold over the values in
    * vec_id order (`aggregate` over a sorted collect_list) instead of
    * `avg` — floating-point addition isn't associative, so only a
    * defined fold order lets DuckDB reproduce the centroid bit-for-bit
    * (the DuckSql left-fold convention). This is the ORACLE-MIRRORABLE
    * variant driving the ann_quality scorecard; [[ivfTopK]]'s plain
    * `avg` (an order-free partial aggregation, the shape you want at
    * 100 TB where a per-group sorted list is an anti-pattern) remains
    * the scale path — at scale the two differ by ulps that only matter
    * to hash equality, not to neighbor quality. */
  def ivfTopKOracled(emb: DataFrame, k: Int, queryPred: Column,
                     nprobe: Int = 2): DataFrame = {
    val cent = emb
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(struct(col("vec_id"), col("x")))).as("s"))
      .withColumn("m", expr(
        "aggregate(s, CAST(0 AS DOUBLE), (acc, e) -> acc + CAST(e.x AS DOUBLE)) / n"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
      .select(col("label").as("clabel"),
        transform(col("dims"), e => e("m").cast("float")).as("cvec"))
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("cd", Distances.euclidean(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("clabel"))))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("clabel"))
    val cands = probes.join(
        emb.select(col("vec_id").as("nbr"), col("embedding").as("cv"), col("label")),
        col("clabel") === col("label"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
    rerank(cands, k)
  }

  /** IVF-blocked semantic near-dup pairs — the 100 TB dedup path for
    * the embedding space: the k-means coarse quantizer ([[kmeansCentroids]])
    * assigns every vector to its `nassign` nearest lists (multi-assign
    * so near-boundary pairs still share a list), and candidate pairs
    * form ONLY within a list — Σ B² work instead of N², with B bounded
    * by list balance rather than corpus size. q54 (exact all-pairs) is
    * the oracle this approximates; q102 is the same shape with given
    * labels as blocks. Every emitted pair's sim is EXACT (computed on
    * the real vectors), so output ⊆ q54's rows with identical scores —
    * only recall, never precision, is approximate. */
  def ivfBlockedPairs(emb: DataFrame, threshold: Double, nlist: Int = 16,
                      nassign: Int = 2, kmeansIters: Int = 5,
                      seed: Long = 42L): DataFrame = {
    val cent = kmeansCentroids(emb, nlist, kmeansIters, seed)
    val pts = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val assign = pts.join(broadcast(cent))
      .withColumn("d", Distances.euclidean(col("v"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d"), col("cid"))))
      .filter(col("pr") <= nassign)
      .select(col("cid"), col("id"), col("v"))
    val a = assign.select(col("cid"), col("id").as("d1"), col("v").as("va"))
    val b = assign.select(col("cid"), col("id").as("d2"), col("v").as("vb"))
    a.join(b, Seq("cid"))
      .filter(col("d1") < col("d2"))
      .withColumn("sim", round(Distances.cosineSimilarity(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      // a pair sharing two lists meets twice; sim is deterministic, so
      // the dedup shuffle carries only the (few) near-dup pairs
      .select(col("d1"), col("d2"), col("sim"))
      .dropDuplicates("d1", "d2")
  }

  /** Exact cosine re-rank of (qid, qv, nbr, cv) candidates → top-k,
    * via the TopKByWeight partial aggregation (≤ k per query cross the
    * shuffle, not the whole candidate set). */
  private[similarity] def rerank(cands: DataFrame, k: Int): DataFrame =
    graft.agg.TopKByWeight.topKBySimilarity(
      cands.select(col("qid"), col("nbr"),
        round(Distances.cosineSimilarity(col("qv"), col("cv")), 6).as("sim")),
      k)
}
