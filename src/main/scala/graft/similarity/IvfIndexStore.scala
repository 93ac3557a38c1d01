package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}
import graft.linalg.Distances

/** Persistent ANN index: the portable IVF quantizer written as parquet
  * artifacts and served back WITHOUT the training corpus — the
  * production separation of index build (one batch job) from search
  * (many later jobs) that every vector store implements, expressed as
  * plain Spark sources/sinks.
  *
  * Layout under an index dir:
  *  - `centroids/` (cid, cvec)            — the nlist coarse centers;
  *  - `lists/`     (cid, vec_id, embedding) — every vector in its
  *    nearest-centroid inverted list (the index is self-contained:
  *    search never touches the original table);
  *  - `meta/`      one row (n_vectors, dim, nlist, kmeans_iters,
  *    fingerprint) — fingerprint = bit_xor of xxhash64(vec_id,
  *    embedding), order-independent, so staleness against a claimed
  *    corpus is CHECKABLE instead of assumed.
  *
  * Losslessness is driver-PROVEN, not asserted: q218 builds, writes,
  * reloads and searches, and its oracle is the SAME generated SQL as
  * q175's in-memory pipeline — floats round-trip parquet bit-exactly,
  * so the persisted search must hash-match the never-persisted one.
  *
  * Scale shape: build = one broadcast-argmin assignment over the
  * corpus + the k-means rounds (both the q36b/q175 shapes); the lists
  * sink partitions by cid naturally; search broadcasts the nlist-row
  * centroid table, probes explode to nprobe equi-join keys against
  * the lists, and the re-rank is the TopKByWeight partial aggregation
  * (≤ k rows per query cross the shuffle). */
object IvfIndexStore {

  private val K = 10

  /** Build the portable IVF index over `emb` and write it under `dir`.
    * Deterministic for a given corpus (md5 bottom-k init, ordered-fold
    * means — [[Ann.kmeansCentroidsPortable]]). */
  def write(emb: DataFrame, dir: String, nlist: Int = 8,
            kmeansIters: Int = 5): Unit = {
    val cent = Ann.kmeansCentroidsPortable(emb, nlist, kmeansIters)
    val pts = emb.select(col("vec_id"), col("embedding"))
    val lists = pts.join(broadcast(cent))
      .select(col("vec_id"), struct(
        Distances.euclidean(col("embedding"), col("cvec")).as("d"),
        col("cid").as("cid"), col("embedding").as("v")).as("cand"))
      .groupBy(col("vec_id")).agg(min(col("cand")).as("m"))
      .select(col("m.cid").as("cid"), col("vec_id"), col("m.v").as("embedding"))
    val meta = pts.agg(
      count(lit(1)).as("n_vectors"),
      max(size(col("embedding"))).cast("int").as("dim"),
      bit_xor(xxhash64(col("vec_id"), col("embedding"))).as("fingerprint"))
      .select(col("n_vectors"), col("dim"), lit(nlist).as("nlist"),
        lit(kmeansIters).as("kmeans_iters"), col("fingerprint"))
    cent.write.mode("overwrite").parquet(s"$dir/centroids")
    lists.write.mode("overwrite").parquet(s"$dir/lists")
    meta.write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** True iff the index under `dir` was built over exactly `emb`
    * (count + order-independent content fingerprint). */
  def isFreshFor(spark: SparkSession, dir: String, emb: DataFrame): Boolean = {
    val m = spark.read.parquet(s"$dir/meta").collect()(0)
    val c = emb.agg(count(lit(1)),
      bit_xor(xxhash64(col("vec_id"), col("embedding")))).collect()(0)
    m.getAs[Long]("n_vectors") == c.getLong(0) &&
      m.getAs[Long]("fingerprint") == c.getLong(1)
  }

  /** Search the PERSISTED index: `queries` = (vec_id, embedding) rows;
    * output (qid, nbr, sim, rn) — identical contract (and, for the
    * same build params, identical rows) to
    * [[Ann.ivfKmeansTopKPortable]]. Reads only the index dir. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int = K, nprobe: Int = 3): DataFrame = {
    val cent = spark.read.parquet(s"$dir/centroids")
    val lists = spark.read.parquet(s"$dir/lists")
      .select(col("cid"), col("vec_id").as("nbr"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("cd", Distances.euclidean(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("cid"))))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val cands = probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("nbr"))
      .select(col("qid"), col("qv"), col("nbr"), col("cv"))
    Ann.rerank(cands, k)
  }

  /** Full persisted cycle for the declared row: build → write → load →
    * search, a FRESH index dir per invocation so every bench/verify
    * run pays the whole cycle (no cross-run cache can stale). */
  def buildAndSearch(emb: DataFrame, k: Int = K, nprobe: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    val dir = Files.createTempDirectory("graft-ivfidx-")
    dir.toFile.deleteOnExit()
    write(emb, dir.toString)
    require(isFreshFor(spark, dir.toString, emb),
      "index fingerprint must match the corpus it was just built from")
    search(spark, dir.toString, emb.filter(col("vec_id") < 20), k, nprobe)
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q218_ann_index_persist",
      (s, dir) => buildAndSearch(Tables.load(s, dir, "embeddings"))
        .orderBy(col("qid"), col("rn")),
      Some(SimilarityQueries.ivfKmeansPortableOracle(K, nlist = 8,
        nprobe = 3, iters = 5)),
      doc = "Persistent IVF index: build -> parquet (centroids/lists/meta+fingerprint) -> reload -> search, serving WITHOUT the training corpus; the oracle is q175's in-memory pipeline SQL, proving the persisted round-trip lossless")
  )
}
