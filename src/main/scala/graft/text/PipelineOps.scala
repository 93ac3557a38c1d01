package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}
import graft.relational.ConnectedComponents

/** Round-3 training-data pipeline operators (north-star extensions):
  *
  *  - duplicate clustering: near-dup PAIRS → connected components →
  *    per-document canonical id (the step an actual dedup run needs
  *    after q25/q33 emit pairs);
  *  - sequence packing: contiguous token-budget binning per
  *    (lang, shard) — the pretraining batch-assembly shape;
  *  - TF-IDF keyword extraction: top terms per document;
  *  - language rebalancing: deterministic content-hash stratified
  *    downsampling of overrepresented languages.
  *
  * All four are ANSI-mirrorable and oracle-checked (the clustering
  * oracle is a DuckDB recursive-CTE transitive closure — fine at
  * oracle scale; the Spark side is the distributed min-label loop).
  */
object PipelineOps {

  /** Near-duplicate clusters over the capped-Jaccard pair graph:
    * (doc_id, cluster = min doc id in its component, is_canonical).
    * Docs in no pair are their own singleton cluster. */
  def dupClusters(docs: DataFrame, threshold: Double,
                  pairsOverride: Option[DataFrame] = None,
                  maxIter: Int = 25): DataFrame = {
    val pairs = pairsOverride.getOrElse(TextQueries.jaccardPairs(docs, threshold))
    val nodes = docs.select(col("doc_id").cast("long").as("id"))
    val (labels, converged) = ConnectedComponents.label(
      nodes,
      pairs.select(col("d1").cast("long").as("a"), col("d2").cast("long").as("b")),
      maxIter)
    require(converged, "connected components did not reach a fixpoint")
    labels
      .select(col("id").as("doc_id"), col("comp").as("cluster"),
        (col("id") === col("comp")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic contiguous sequence packing: per (lang, shard),
    * docs in id order are assigned to token-budget bins by their
    * cumulative token count. Shard = portable md5 bucket — the
    * parallelism unit: the running sum inside one (lang, shard) is
    * inherently sequential, so at corpus scale the shard count (here
    * 4, in production thousands) is what bounds the per-task window. */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 4): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"),
      // q28's BPE estimate: tokens ≈ ceil(chars / 4)
      ceil(length(col("text")).cast("double") / 4.0).as("tokens"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % shards).as("shard"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget.toDouble).cast("long"))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))
      .orderBy(col("lang"), col("shard"), col("bin"))
  }

  /** Top-`topK` TF-IDF terms per document (q56's tokenization; idf =
    * ln(N/df); rank by rounded score desc, term asc — deterministic
    * across engines). The rank runs over per-doc term counts (already
    * one row per (doc, term)), so the window input is the tf table,
    * not the token stream; Spark's WindowGroupLimit prunes it to ≤
    * topK per doc map-side. */
  def tfidf(docs: DataFrame, topK: Int = 5): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("word"))
    // materialized once: tf feeds both the df aggregation and the
    // scoring join (the harness sweep releases the pinned blocks)
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // document frequency falls out of tf (already one row per
    // (doc, term)) — no second explode + distinct over the token stream
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("word")).crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("doc_id"), col("word"), col("score"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Language-balance downsampling: every language is kept at ≤ the
    * smallest language's volume via a per-stratum keep rate (permille,
    * floored) applied as a deterministic content-hash Bernoulli filter
    * (q37's portable md5 bucket). Row-local after a 5-row broadcast —
    * no shuffle touches the corpus. */
  def langBalance(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val target = counts.agg(min(col("n_docs")).as("target"))
    val rates = counts.crossJoin(target)
      .withColumn("keep_permille",
        least(lit(1000L),
          floor(col("target") * lit(1000.0) / col("n_docs")).cast("long")))
      .select(col("lang"), col("n_docs"), col("keep_permille"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 1000 < col("keep_permille"))
      .groupBy(col("lang"), col("n_docs"), col("keep_permille"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Sliding context-window chunking: split each document into
    * `winChars`-char windows advancing by `stride` (overlap =
    * winChars − stride) — the long-document splitting step before
    * sequence packing. Row-local explode: no shuffle at any corpus
    * size. Window count for length L: 1 if L ≤ winChars, else
    * ⌈(L − winChars)/stride⌉ + 1 (last window may be short). */
  def chunkWindows(docs: DataFrame, winChars: Int = 200, stride: Int = 150): DataFrame = {
    val nChunks = when(length(col("text")) <= winChars, lit(1L))
      .otherwise(ceil((length(col("text")) - lit(winChars)).cast("double") / stride) + 1L)
    docs.select(col("doc_id"), col("text"), nChunks.as("n_chunks"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"),
        col("text"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(text, CAST(chunk_idx * $stride + 1 AS INT), $winChars)")
          .as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Temperature-based source mixing (the multinomial-sampling weights
    * a pretraining run uses to rebalance corpora): integer weight
    * w_s = round(n_s^τ) — integer so the cross-engine sum is exact —
    * target fraction w_s/Σw, and the implied per-doc up/down-sampling
    * factor. One tiny aggregation; everything else is arithmetic. */
  def sourceMixture(docs: DataFrame, temperature: Double = 0.7): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val weighted = counts.withColumn("w",
      round(pow(col("n_docs").cast("double"), temperature)).cast("long"))
    val totals = weighted.agg(sum(col("w")).as("w_total"),
      sum(col("n_docs")).as("n_total"))
    weighted.crossJoin(totals)
      .select(col("source"), col("n_docs"), col("w"),
        round(col("w").cast("double") / col("w_total"), 6).as("target_frac"),
        round(col("w").cast("double") / col("w_total")
          * col("n_total") / col("n_docs"), 4).as("sample_factor"))
      .orderBy(col("source"))
  }

  private val Budget = 2048
  private val Shards = 4

  /** The τ=0.1 near-dup cluster assignment, materialized once per
    * process/sf: the connected-components loop is the expensive step
    * and both q58 and the canonical-selection query (q154) consume the
    * same labels. */
  def sharedDupClusters(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Materialized.table(s, dir, "dup_clusters") {
      dupClusters(Tables.load(s, dir, "documents"), 0.1,
        pairsOverride = Some(TextQueries.sharedJaccardPairs(s, dir, 0.1)))
    }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q58_dup_clusters",
      (s, dir) => sharedDupClusters(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE ${TextQueries.jaccardCtes(0.1)},
        |e AS (SELECT d1 AS a, d2 AS b FROM jp
        |      UNION ALL SELECT d2, d1 FROM jp),
        |r AS (SELECT doc_id AS src, doc_id AS dst FROM documents
        |      UNION
        |      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a)
        |SELECT src AS doc_id, min(dst) AS cluster,
        |       (src = min(dst)) AS is_canonical
        |FROM r GROUP BY src ORDER BY doc_id""".stripMargin),
      doc = "Near-dup clusters: pairs → connected components → canonical id"),

    Declared(
      // The 100 TB sketch-dedup path end-to-end AND driver-green:
      // portable-md5 MinHash+LSH pairs (q172's pipeline) → connected
      // components → canonical id, oracled by replaying the pair CTEs
      // plus the q58 recursive-closure mirror.
      "q174_minhash_clusters_portable",
      (s, dir) => dupClusters(Tables.load(s, dir, "documents"), 0.5,
        pairsOverride = Some(
          Dedup.sharedPortablePairs(s, dir).select(col("d1"), col("d2")))),
      Some(s"""WITH RECURSIVE ${Dedup.minhashPortableCtes(500000L, 16, 2)},
        |e AS (SELECT d1 AS a, d2 AS b FROM mp
        |      UNION ALL SELECT d2, d1 FROM mp),
        |r AS (SELECT doc_id AS src, doc_id AS dst FROM documents
        |      UNION
        |      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a)
        |SELECT src AS doc_id, min(dst) AS cluster,
        |       (src = min(dst)) AS is_canonical
        |FROM r GROUP BY src ORDER BY doc_id""".stripMargin),
      doc = "Near-dup clusters over the portable MinHash-LSH pairs — the sketch dedup story (pairs AND clusters) driver-verified end-to-end"),

    Declared(
      // The 100 TB dedup path end-to-end: MinHash+LSH candidate pairs
      // (banded bucket join, never N²) → connected components →
      // canonical id per doc. Sketch-based ⇒ rows-only for the driver;
      // the spec gates label agreement vs the exact-Jaccard clusters.
      "q62_minhash_clusters",
      (s, dir) => dupClusters(Tables.load(s, dir, "documents"), 0.5,
        pairsOverride = Some(
          Dedup.minhashPairs(Tables.load(s, dir, "documents"), 0.5)
            .select(col("d1"), col("d2")))),
      None,
      doc = "Near-dup clusters over MinHash-LSH pairs (sketch ⇒ rows-only)"),

    Declared(
      "q59_pack_sequences",
      (s, dir) => packSequences(Tables.load(s, dir, "documents"), Budget, Shards),
      Some(s"""WITH d AS (SELECT doc_id, lang,
        |   CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tokens,
        |   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |     % $Shards AS shard
        | FROM documents),
        |c AS (SELECT *, coalesce(sum(tokens) OVER (
        |        PARTITION BY lang, shard ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM d)
        |SELECT lang, shard, CAST(floor(cum_before / $Budget.0) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2, 3 ORDER BY lang, shard, bin""".stripMargin),
      doc = "Token-budget sequence packing per (lang, md5 shard)"),

    Declared(
      "q60_tfidf",
      (s, dir) => tfidf(Tables.load(s, dir, "documents")),
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |        FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, word,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, word) AS rn FROM scored)
        |SELECT doc_id, word, score, CAST(rn AS INTEGER) AS rn
        |FROM ranked WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin),
      doc = "Top-5 TF-IDF terms per document"),

    Declared(
      "q63_chunk_windows",
      (s, dir) => chunkWindows(Tables.load(s, dir, "documents")),
      Some("""WITH d AS (SELECT doc_id, text,
        |    CASE WHEN length(text) <= 200 THEN 1
        |         ELSE CAST(ceil(CAST(length(text) - 200 AS DOUBLE) / 150) AS BIGINT) + 1
        |    END AS n_chunks
        |  FROM documents),
        |e AS (SELECT doc_id, text,
        |        unnest(range(n_chunks)) AS chunk_idx FROM d)
        |SELECT doc_id, chunk_idx,
        |  substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200) AS chunk,
        |  CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200))
        |    AS INTEGER) AS chunk_chars
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin),
      doc = "Sliding 200-char context windows, stride 150 (long-doc splitting)"),

    Declared(
      "q64_source_mixture",
      (s, dir) => sourceMixture(Tables.load(s, dir, "documents")),
      Some("""WITH counts AS (SELECT source, count(*) AS n_docs
        |        FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        CAST(round(pow(CAST(n_docs AS DOUBLE), 0.7)) AS BIGINT) AS w
        |      FROM counts),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total,
        |             CAST(sum(n_docs) AS BIGINT) AS n_total FROM w)
        |SELECT source, n_docs, w,
        |  round(CAST(w AS DOUBLE) / w_total, 6) AS target_frac,
        |  round(CAST(w AS DOUBLE) / w_total * n_total / n_docs, 4) AS sample_factor
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin),
      doc = "Temperature-0.7 source-mixture weights (pretraining data mixing)"),

    Declared(
      "q61_lang_balance",
      (s, dir) => langBalance(Tables.load(s, dir, "documents")),
      Some("""WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT min(n_docs) AS target FROM counts),
        |rates AS (SELECT lang, n_docs,
        |    least(1000, CAST(floor(target * 1000.0 / n_docs) AS BIGINT)) AS keep_permille
        |  FROM counts CROSS JOIN t)
        |SELECT d.lang, r.n_docs, r.keep_permille, count(*) AS n_sampled
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 1000 < keep_permille
        |GROUP BY 1, 2, 3 ORDER BY d.lang""".stripMargin),
      doc = "Language-balance stratified downsampling (portable hash)")
  )
}
