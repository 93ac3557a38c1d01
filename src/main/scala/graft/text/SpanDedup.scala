package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Duplicate-span detection — exact substring dedup at n-gram grain
  * (the "dedup training data at the span level, not the document
  * level" operator of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022: most web duplication is long
  * repeated SPANS inside otherwise-distinct documents, which
  * document-grain MinHash/Jaccard cannot remove).
  *
  * Pipeline: positional word n-grams per document → corpus-wide
  * occurrence count per n-gram → positions whose n-gram occurs ≥ 2
  * times anywhere → per-document merge of overlapping/adjacent
  * duplicated positions into MAXIMAL spans (gaps-and-islands: two
  * duplicated n-gram positions p₁ < p₂ belong to one span iff
  * p₂ − p₁ ≤ n, i.e. their token ranges overlap or touch).
  *
  * Scale shape (the 100 TB story): the occurrence count is one
  * map-side-combined hash aggregation on the n-gram key (the same
  * inverted-index substrate as q25, but COUNT-only — no posting lists
  * ship); the duplicated-key join back is a co-partitioned equi-join
  * on that key; the island merge is a per-document window (documents
  * are bounded, so no partition outgrows a task). Nothing is ever
  * all-pairs, and the suffix-array construction of the paper is
  * replaced by the n-gram inverted index — the standard distributed
  * approximation (spans shorter than n tokens are not found, spans
  * are found at n-gram resolution).
  *
  * Spark groups by the 64-bit xxhash of the n-gram, the oracle by the
  * n-gram STRING — a hash collision would be caught by the driver
  * diff, not hidden (q69's convention). */
object SpanDedup {

  /** Positional (NOT distinct) word n-grams: (doc_id, p, g) with p
    * 1-based and g the xxhash64 of the n words — a doc repeating a
    * phrase must keep every occurrence. Shared with [[ExactSubstr]]. */
  private[graft] def positionalGrams(docs: DataFrame, n: Int): DataFrame = {
    val ws = col("ws")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(ws) >= n)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(ws) - lit(n - 1)),
          i => xxhash64((0 until n).map(o => element_at(ws, i + lit(o))): _*))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("g"))
  }

  /** Flagged positions (doc_id, p) → maximal spans: two flagged n-gram
    * starts p₁ < p₂ merge iff p₂ − p₁ ≤ n (token ranges overlap or
    * touch); gaps-and-islands per document. */
  private def maximalSpans(flagged: DataFrame, n: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    flagged.withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byDoc) <= n, 0L).otherwise(1L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Maximal duplicated-span table: (doc_id, span_start, span_end,
    * n_grams, span_tokens), token positions 1-based inclusive. */
  def dupSpans(docs: DataFrame, n: Int = 5, minOcc: Int = 2): DataFrame = {
    val grams = positionalGrams(docs, n)
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc)
      .select(col("g"))
    maximalSpans(grams.join(dup, Seq("g")).select(col("doc_id"), col("p")), n)
  }

  /** Span-grain decontamination — WHERE a training document overlaps
    * the benchmark slice, not merely whether (q55/q70 flag docs; this
    * reports the exact token ranges to excise, the surgical form of
    * Lee et al.'s span removal applied to train-vs-eval contamination).
    * A train-doc position is flagged iff its n-gram occurs ANYWHERE in
    * the benchmark slice (doc_id ≡ 0 mod 10, q55's convention);
    * flagged positions merge into maximal spans.
    *
    * Scale shape: the benchmark gram set is a distinct projection of
    * the (small) held-out slice; the probe is one co-partitioned
    * semi-join on the gram key; the island merge is the per-document
    * window. The train corpus never self-joins. */
  def contaminationSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    val grams = positionalGrams(docs, n)
    val bench = grams.filter(col("doc_id") % 10 === 0).select(col("g")).distinct()
    val flagged = grams.filter(col("doc_id") % 10 =!= 0)
      .join(bench, Seq("g"))
      .select(col("doc_id"), col("p"))
    maximalSpans(flagged, n)
  }

  private def dupSpansOracle(n: Int, minOcc: Int): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g AS MATERIALIZED (
       |  SELECT doc_id, p,
       |    ${(0 until n).map(o => s"ws[p+$o]").mkString(" || ' ' || ")} AS gram
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${n - 2})) AS p
       |        FROM w WHERE len(ws) >= $n)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= $minOcc),
       |d AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
       |i AS (SELECT doc_id, p,
       |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= $n
       |             THEN 0 ELSE 1 END AS brk
       |      FROM d),
       |s AS (SELECT doc_id, p,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
       |      FROM i)
       |SELECT doc_id, min(p) AS span_start, max(p) + ${n - 1} AS span_end,
       |  count(*) AS n_grams,
       |  max(p) + ${n - 1} - min(p) + 1 AS span_tokens
       |FROM s GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  private def contaminationSpansOracle(n: Int): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g AS MATERIALIZED (
       |  SELECT doc_id, p,
       |    ${(0 until n).map(o => s"ws[p+$o]").mkString(" || ' ' || ")} AS gram
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${n - 2})) AS p
       |        FROM w WHERE len(ws) >= $n)),
       |bench AS MATERIALIZED (
       |  SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
       |d AS (SELECT doc_id, p FROM g JOIN bench USING (gram)
       |      WHERE doc_id % 10 <> 0),
       |i AS (SELECT doc_id, p,
       |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= $n
       |             THEN 0 ELSE 1 END AS brk
       |      FROM d),
       |s AS (SELECT doc_id, p,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
       |      FROM i)
       |SELECT doc_id, min(p) AS span_start, max(p) + ${n - 1} AS span_end,
       |  count(*) AS n_grams,
       |  max(p) + ${n - 1} - min(p) + 1 AS span_tokens
       |FROM s GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q180_dup_spans",
      (s, dir) => dupSpans(Tables.load(s, dir, "documents")),
      Some(dupSpansOracle(5, 2)),
      doc = "Maximal duplicated 5-gram spans per document (Lee et al. span-grain exact dedup, n-gram inverted-index form)"),

    Declared(
      "q189_decontam_spans",
      (s, dir) => contaminationSpans(Tables.load(s, dir, "documents")),
      Some(contaminationSpansOracle(5)),
      doc = "Span-grain decontamination: the exact token ranges where a training doc overlaps the benchmark slice (semi-join on the gram key, maximal-island merge) - the surgical form of q55/q70's doc-level flags")
  )
}
