package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, DuckSql, Tables}
import graft.linalg.Distances

/** Similarity search over the embedding column (north-star extension):
  * brute-force cosine top-k as the exact baseline (oracle-matched);
  * LSH/IVF approximate variants live in [[Ann]] (recall-tested). */
object SimilarityQueries {

  private val K = 10

  /** Top-k cosine neighbors for a query subset against the full set.
    * The candidate side is broadcast; similarity is rounded before
    * ranking with (sim desc, nbr) tie-break for oracle determinism.
    * Selection is the TopKByWeight partial aggregation — the shuffle
    * carries ≤ k candidates per query, not the full pair stream.
    *
    * Compositional form; kept as the row-for-row equivalence reference
    * for the fused [[org.apache.spark.sql.graft.TopKJoin.cosineTopK]]
    * operator that the declared q30 runs (the fused node never
    * materializes the pair stream at all). */
  def cosineTopK(emb: DataFrame, k: Int, queryPred: org.apache.spark.sql.Column): DataFrame = {
    val q = emb.filter(queryPred).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("nbr"), col("embedding").as("cv"))
    graft.agg.TopKByWeight.topKBySimilarity(
      q.join(broadcast(c), col("qid") =!= col("nbr"))
        .select(col("qid"), col("nbr"),
          round(Distances.cosineSimilarity(col("qv"), col("cv")), 6).as("sim")),
      k)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member
    * of the dedup family (exact all-pairs form; the LSH/IVF buckets in
    * [[Ann]] are the 100 TB path, this is their oracle). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("vb"))
    a.join(broadcast(b), col("d1") < col("d2"))
      .withColumn("sim", round(Distances.cosineSimilarity(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }

  /** Blocked (partitioned) cosine near-dup pairs: candidates only meet
    * inside the same block — here the label column; in production the
    * block is an IVF/k-means cluster id (q36b's coarse quantizer),
    * which bounds block size by construction. Turns the O(N²) pair
    * stream into Σ_b B², the standard semantic-dedup scale shape: a
    * shuffle-hash self-join on the block key, pairs generated
    * partition-locally, nothing else moves. q54 (all-pairs) is this
    * query's recall oracle at test scale. */
  def blockedCosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("label"), col("vec_id").as("d1"), col("embedding").as("va"))
    val b = emb.select(col("label"), col("vec_id").as("d2"), col("embedding").as("vb"))
    a.join(b, "label")
      .filter(col("d1") < col("d2"))
      .withColumn("sim", round(Distances.cosineSimilarity(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("label"), col("d1"), col("d2"), col("sim"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q102_blocked_neardup",
      (s, dir) => blockedCosinePairs(Tables.load(s, dir, "embeddings"), 0.35)
        .orderBy(col("label"), col("d1"), col("d2")),
      Some {
        val sim = DuckSql.cosineSimilarity("a.embedding", "b.embedding")
        s"""SELECT label, d1, d2, sim FROM (
           |  SELECT a.label, a.vec_id AS d1, b.vec_id AS d2, round($sim, 6) AS sim
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id < b.vec_id)
           |WHERE sim >= 0.35 ORDER BY label, d1, d2""".stripMargin
      },
      doc = "Blocked cosine near-dup: pairs meet only within a block (Σ B² not N²)"),

    Declared(
      "q54_embedding_dedup",
      (s, dir) => cosineNearDupPairs(Tables.load(s, dir, "embeddings"), 0.35)
        .orderBy(col("d1"), col("d2")),
      Some {
        val sim = DuckSql.cosineSimilarity("a.embedding", "b.embedding")
        s"""SELECT d1, d2, sim FROM (
           |  SELECT a.vec_id AS d1, b.vec_id AS d2, round($sim, 6) AS sim
           |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
           |WHERE sim >= 0.35 ORDER BY d1, d2""".stripMargin
      },
      doc = "Embedding-cosine near-dup pairs (exact; LSH/IVF are the scale path)"),

    Declared(
      "q108_ivf_blocked_dedup",
      (s, dir) => Ann.ivfBlockedPairs(Tables.load(s, dir, "embeddings"), 0.35)
        .orderBy(col("d1"), col("d2")),
      None,
      doc = "IVF-blocked semantic near-dup pairs (k-means lists; seeded ⇒ rows-only)"),

    Declared(
      "q126_ann_pq",
      (s, dir) => Pq.adcTopK(Tables.load(s, dir, "embeddings"), K,
        queryPred = col("vec_id") < 20)
        .orderBy(col("qid"), col("rn")),
      None,
      doc = "Product-quantization ANN: grouped-kmeans codebooks, ADC scan over codes, exact re-rank (seeded ⇒ rows-only)"),

    Declared(
      "q35_ann_lsh",
      (s, dir) => Ann.lshTopK(Tables.load(s, dir, "embeddings"), K, dim = 64,
        queryPred = col("id") < 20)
        .orderBy(col("qid"), col("rn")),
      None,
      doc = "LSH-bucketed approximate cosine top-k (recall-tested vs exact)"),

    Declared(
      "q36b_ann_ivf_kmeans",
      (s, dir) => Ann.ivfKmeansTopK(Tables.load(s, dir, "embeddings"), K,
        queryPred = col("vec_id") < 20, nlist = 8, nprobe = 3)
        .orderBy(col("qid"), col("rn")),
      None,
      doc = "IVF over distributed k-means coarse quantizer (rows-only)"),

    Declared(
      "q36_ann_ivf",
      (s, dir) => Ann.ivfTopK(Tables.load(s, dir, "embeddings"), K,
        queryPred = col("vec_id") < 20)
        .orderBy(col("qid"), col("rn")),
      None,
      doc = "IVF (centroid-probed) approximate cosine top-k"),

    Declared(
      "q30_cosine_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        org.apache.spark.sql.graft.TopKJoin
          .cosineTopK(emb.filter(col("vec_id") < 20), emb, K)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val sim = DuckSql.cosineSimilarity("a.embedding", "b.embedding")
        s"""WITH pairs AS (
           |  SELECT a.vec_id AS qid, b.vec_id AS nbr, round($sim, 6) AS sim
           |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
           |  WHERE a.vec_id < 20
           |), ranked AS (
           |  SELECT qid, nbr, sim,
           |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nbr) AS rn
           |  FROM pairs)
           |SELECT qid, nbr, sim, CAST(rn AS INTEGER) AS rn
           |FROM ranked WHERE rn <= $K ORDER BY qid, rn""".stripMargin
      },
      doc = "Brute-force cosine top-k (exact ANN baseline)")
  )
}
