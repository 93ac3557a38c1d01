package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Corpus-hygiene operators that close the loop from *detection*
  * (pair mining, clustering) to *decision* (which rows survive, where
  * they go):
  *
  *  - canonical-document selection: per near-dup cluster keep the
  *    highest-quality member (longest text, ties to the smallest id) —
  *    the policy step after q58's clustering;
  *  - vocabulary coverage / OOV rate: per document, the fraction of
  *    token occurrences outside the global top-K vocabulary — the
  *    cheap gibberish/footer/code detector;
  *  - leakage-safe train/val/test split: the split unit is the
  *    content-key CLUSTER, not the document, so exact re-crawls can
  *    never straddle train and eval (the contamination mode a plain
  *    per-doc hash split invites).
  */
object CorpusHygiene {

  /** Per-cluster canonical pick over the shared τ=0.1 near-dup labels:
    * `(cluster, canon_doc, n_members, total_chars)`.
    *
    * The pick is a `max_by` over the unique ordering struct
    * `(n_chars, −doc_id)` — a partial-aggregable hash agg (map-side
    * combine, one ≤|clusters|-row shuffle), not a window sort over the
    * corpus. */
  def canonicalDocs(clusters: DataFrame, docs: DataFrame): DataFrame =
    clusters.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id"))).as("canon_doc"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("cluster"))

  /** Per-doc out-of-vocabulary rate vs the global top-`vocabK` terms
    * (freq desc, term asc — deterministic cut). The vocabulary is a
    * broadcast semi-join probe: the token stream is never shuffled on
    * content, only the per-doc counts move. */
  def vocabCoverage(docs: DataFrame, vocabK: Int = 1000): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("word"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(vocabK)
      .select(col("word"))
    val tot = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val inv = words.join(broadcast(vocab), Seq("word"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_invocab"))
    val oov = col("n_tokens") - coalesce(col("n_invocab"), lit(0L))
    tot.join(inv, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), oov.as("n_oov"),
        floor(lit(1000L) * oov.cast("double") / col("n_tokens"))
          .cast("long").as("oov_permille"))
      .orderBy(col("doc_id"))
  }

  /** Group-disjoint 80/10/10 split: cluster = min doc_id sharing the
    * normalized `keyLen`-char content prefix (q152's canonical key);
    * the split bucket hashes the CLUSTER representative, so every
    * member of a group lands in the same split by construction.
    * One content-key shuffle (the exact-dedup budget); the md5 bucket
    * is the engine-portable q37 convention. */
  def leakageSplit(docs: DataFrame, keyLen: Int = 80): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      substring(lower(col("text")), 1, keyLen).as("k"))
    val groups = keyed.groupBy(col("k")).agg(min(col("doc_id")).as("cluster"))
    val bucket = conv(substring(md5(col("cluster").cast("string")), 1, 6), 16, 10)
      .cast("long") % 10
    keyed.join(groups, Seq("k"))
      .select(col("doc_id"), col("cluster"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q154_canonical_docs",
      (s, dir) => canonicalDocs(PipelineOps.sharedDupClusters(s, dir),
        Tables.load(s, dir, "documents")),
      Some(s"""WITH RECURSIVE ${TextQueries.jaccardCtes(0.1)},
        |e AS (SELECT d1 AS a, d2 AS b FROM jp
        |      UNION ALL SELECT d2, d1 FROM jp),
        |r AS (SELECT doc_id AS src, doc_id AS dst FROM documents
        |      UNION
        |      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
        |c AS (SELECT src AS doc_id, min(dst) AS cluster FROM r GROUP BY src),
        |m AS (SELECT c.doc_id, c.cluster, d.n_chars,
        |        row_number() OVER (PARTITION BY c.cluster
        |          ORDER BY d.n_chars DESC, c.doc_id) AS rn
        |      FROM c JOIN documents d USING (doc_id))
        |SELECT cluster, max(CASE WHEN rn = 1 THEN doc_id END) AS canon_doc,
        |  count(*) AS n_members, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM m GROUP BY cluster ORDER BY cluster""".stripMargin),
      doc = "Canonical doc per near-dup cluster (longest text, ties to min id)"),

    Declared(
      "q155_vocab_coverage",
      (s, dir) => vocabCoverage(Tables.load(s, dir, "documents")),
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |        FROM documents),
        |v AS (SELECT word FROM (SELECT word, count(*) AS freq FROM w GROUP BY 1)
        |      ORDER BY freq DESC, word LIMIT 1000),
        |t AS (SELECT doc_id, count(*) AS n_tokens FROM w GROUP BY 1),
        |i AS (SELECT doc_id, count(*) AS n_invocab FROM w
        |      WHERE word IN (SELECT word FROM v) GROUP BY 1)
        |SELECT t.doc_id, n_tokens,
        |  n_tokens - coalesce(n_invocab, 0) AS n_oov,
        |  CAST(floor(1000.0 * (n_tokens - coalesce(n_invocab, 0)) / n_tokens)
        |    AS BIGINT) AS oov_permille
        |FROM t LEFT JOIN i ON t.doc_id = i.doc_id
        |ORDER BY t.doc_id""".stripMargin),
      doc = "Per-doc OOV rate vs global top-1000 vocabulary (broadcast probe)"),

    Declared(
      "q156_leakage_split",
      (s, dir) => leakageSplit(Tables.load(s, dir, "documents")),
      Some("""WITH k AS (SELECT doc_id, substr(lower(text), 1, 80) AS k
        |        FROM documents),
        |g AS (SELECT k, min(doc_id) AS cluster FROM k GROUP BY 1),
        |j AS (SELECT doc_id, cluster,
        |        CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 6)) AS BIGINT)
        |          % 10 AS bucket
        |      FROM k JOIN g USING (k))
        |SELECT doc_id, cluster,
        |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM j ORDER BY doc_id""".stripMargin),
      doc = "Group-disjoint 80/10/10 split keyed on content-prefix clusters")
  )
}
