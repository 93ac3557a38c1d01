package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Round-4 training-data pipeline operators (north-star extensions),
  * all ANSI-mirrorable and oracle-checked:
  *
  *  - deterministic stratified train/val/test split — the hash-bucket
  *    assignment a pipeline freezes before any training run so the
  *    held-out slices never drift between reruns or engines;
  *  - PII-style regex scrub: redact a sensitive-term pattern and
  *    report match/char deltas per document (the corpus has no real
  *    PII, so a vocabulary stand-in pattern exercises the mechanics);
  *  - cross-document shared n-gram coverage — the sequence-level
  *    duplication signal of Lee et al., "Deduplicating Training Data
  *    Makes Language Models Better" (ACL'22): how much of a document
  *    is 8-grams that also occur elsewhere in the corpus;
  *  - corpus-trained bigram-LM scoring — the CCNet-style "perplexity
  *    filter" shape: train bigram counts over the corpus, score each
  *    document by average negative log-likelihood. Integer-micro
  *    summation keeps the double math engine-exact.
  *
  * Scale shape: everything is explode → hash-agg → equi-join on the
  * token/shingle key; no driver data path, no N² pair-up anywhere.
  */
object CorpusOps {

  /** Deterministic 80/10/10 split by portable content hash (q37/q61's
    * md5 bucket idiom), reported per (source, split). Freezing the
    * assignment to a hash of the stable doc id — never randomness —
    * is what makes the split reproducible across engines and reruns. */
  def trainSplit(docs: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 100
    docs
      .withColumn("split",
        when(bucket < 80, lit("train"))
          .when(bucket < 90, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  /** Sensitive-term pattern for the scrub demo — word-boundary
    * alternation, the same regex shape an email/phone scrub uses.
    * RE2 (DuckDB) and java.util.regex (Spark) agree on this subset. */
  private val SensitivePat = "\\b(key|hash|index)\\b"

  /** Redaction report: per document, how many pattern matches were
    * scrubbed and the char sizes before/after replacing each match
    * with "[REDACTED]". Row-local — no shuffle at any corpus size. */
  def redact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(SensitivePat), lit(0))).as("n_matches"),
      length(col("text")).as("orig_chars"),
      length(regexp_replace(col("text"), SensitivePat, "[REDACTED]")).as("red_chars"))
      .orderBy(col("doc_id"))

  /** Cross-document shared n-gram coverage: per document, the fraction
    * of its distinct word `n`-grams that occur in ≥ 2 distinct
    * documents corpus-wide. Single pass: document frequency comes from
    * a whole-partition window over the shingle (shingles are distinct
    * per doc, so a plain count IS the distinct-doc count), then one
    * aggregation by doc — two shuffles total, no join, no
    * re-materialization. Shingles shuffle as 64-bit hashes, not
    * strings (q25's trick: same counts, collisions ~n²/2⁶⁴, half the
    * shuffle bytes). Documents with fewer than `n` words carry no
    * n-grams and are absent, as in the q55 decontamination semantics. */
  def sharedNgrams(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = TextQueries.hashedWordShingles(docs, n)
    val df = count(lit(1)).over(Window.partitionBy(col("shingle")))
    sh.withColumn("df", df)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_ngrams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_ngrams"), 4)
          .as("shared_frac"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-trained bigram-LM scoring: p(w2|w1) = c(w1,w2)/c(w1·)
    * over bigram OCCURRENCES, each document scored by its average
    * negative log-likelihood. Per-occurrence −ln p is rounded to
    * integer micro-nats BEFORE summing, so the cross-engine result is
    * exact integer math (float sums are order-dependent; a sum of
    * rounded longs is not). Documents with < 2 words carry no bigrams
    * and are absent. */
  def bigramNll(docs: DataFrame): DataFrame = {
    val ws = split(lower(col("text")), " ")
    val bg = docs.filter(size(ws) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1).as("w1"),
          slice(ws, lit(2), size(ws) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("nll_micro",
        round(-log(col("c12").cast("double") / col("c1")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("nll_micro_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("nll_micro_sum").cast("double") / col("n_bigrams") / 1e6, 4)
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q65_train_split",
      (s, dir) => trainSplit(Tables.load(s, dir, "documents")),
      Some("""WITH b AS (SELECT source, n_chars,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY 1, 2 ORDER BY source, split""".stripMargin),
      doc = "Deterministic 80/10/10 hash split per source (frozen holdout)"),

    Declared(
      "q66_redact",
      (s, dir) => redact(Tables.load(s, dir, "documents")),
      Some("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(key|hash|index)\b'))
        |    AS INTEGER) AS n_matches,
        |  CAST(length(text) AS INTEGER) AS orig_chars,
        |  CAST(length(regexp_replace(text, '\b(key|hash|index)\b',
        |    '[REDACTED]', 'g')) AS INTEGER) AS red_chars
        |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Regex scrub report: matches + char delta per doc (PII mechanics)"),

    Declared(
      "q67_shared_ngrams",
      (s, dir) => sharedNgrams(Tables.load(s, dir, "documents")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws) - 6),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
        |             || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]))
        |           AS shingle
        |       FROM w WHERE len(ws) >= 8),
        |df AS (SELECT shingle FROM sh GROUP BY shingle
        |       HAVING count(DISTINCT doc_id) >= 2),
        |tot AS (SELECT doc_id, count(*) AS n_ngrams FROM sh GROUP BY doc_id),
        |shr AS (SELECT doc_id, count(*) AS n_shared FROM sh
        |        WHERE shingle IN (SELECT shingle FROM df) GROUP BY doc_id)
        |SELECT tot.doc_id, n_ngrams, coalesce(n_shared, 0) AS n_shared,
        |  round(CAST(coalesce(n_shared, 0) AS DOUBLE) / n_ngrams, 4) AS shared_frac
        |FROM tot LEFT JOIN shr ON tot.doc_id = shr.doc_id
        |ORDER BY tot.doc_id""".stripMargin),
      doc = "Cross-doc shared 8-gram coverage (sequence-dedup signal, Lee'22)"),

    Declared(
      "q68_bigram_nll",
      (s, dir) => bigramNll(Tables.load(s, dir, "documents")),
      Some("""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |b0 AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws)),
        |           i -> ws[i] || chr(9) || ws[i+1])) AS bgs
        |       FROM d WHERE len(ws) >= 2),
        |b AS (SELECT doc_id, string_split(bgs, chr(9))[1] AS w1,
        |             string_split(bgs, chr(9))[2] AS w2 FROM b0),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |s AS (SELECT doc_id,
        |        CAST(round(-ln(CAST(c12 AS DOUBLE) / c1) * 1000000) AS BIGINT) AS nm
        |      FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(nm) AS DOUBLE) / count(*) / 1000000, 4) AS avg_nll
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Bigram-LM avg negative log-likelihood per doc (perplexity filter)")
  )
}
