package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Corpus-curation operators a production training-data pipeline runs
  * beside dedup/quality (north-star extensions, all ANSI-mirrorable):
  *
  *  - benchmark decontamination: flag training docs sharing word
  *    n-grams with a held-out evaluation slice — the standard
  *    train/test-overlap sweep before a training run;
  *  - corpus vocabulary: global term frequencies (tokenizer/vocab
  *    construction input, and a drift check between corpus snapshots);
  *  - repetition signals: duplicate-sentence fraction and top-word
  *    concentration per document (Gopher-style quality rules).
  *
  * Scale shape: everything is explode → hash-agg → equi-join; the
  * decontamination join is a semi-join against the (much smaller)
  * benchmark shingle set, broadcastable at any training-corpus size.
  */
object CurationQueries {

  /** Training docs sharing ≥ 1 word n-gram with the benchmark slice
    * (stand-in: doc_id ≡ 0 (mod 10)), with overlap counts/ratio. */
  def contamination(docs: DataFrame, n: Int = 5,
                    shinglesOverride: Option[DataFrame] = None): DataFrame = {
    // materialized once: the shingle table feeds the benchmark slice,
    // the train slice, and the totals agg — without it Catalyst
    // re-runs the shingle Generate per consumer (same pattern as
    // jaccardPairs); the harness sweep releases the pinned blocks.
    // Hashed shingles: the semi-join and counts only need key identity.
    // The declared wiring passes the Materialized shared table (also
    // consumed by q70) via shinglesOverride.
    val sh = shinglesOverride.getOrElse(
      TextQueries.hashedWordShingles(docs, n).localCheckpoint())
    val bench = sh.filter(col("doc_id") % 10 === 0).select(col("shingle")).distinct()
    val train = sh.filter(col("doc_id") % 10 =!= 0)
    val totals = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val shared = train.join(broadcast(bench), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    totals.join(shared, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double")
          / col("n_shingles"), 4).as("contamination"))
      .orderBy(col("doc_id"))
  }

  /** Global term frequencies, top `limit` by (freq desc, word). */
  def vocabulary(docs: DataFrame, limitN: Int = 100): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(limitN)

  /** Per-doc repetition signals: duplicate-sentence fraction and
    * top-word concentration (Gopher-style repetition quality rules). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val sents = docs.select(col("doc_id"), explode(split(col("text"), "\\. ")).as("s"))
    val sentStats = sents.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sent"), countDistinct(col("s")).as("n_uniq_sent"))
    val wc = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val wordStats = wc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), max(col("c")).as("max_word_freq"))
    sentStats.join(wordStats, Seq("doc_id"))
      .select(col("doc_id"), col("n_sent"), col("n_uniq_sent"),
        round(lit(1.0) - col("n_uniq_sent").cast("double") / col("n_sent"), 4)
          .as("dup_sent_frac"),
        col("n_words"), col("max_word_freq"),
        round(col("max_word_freq").cast("double") / col("n_words"), 4)
          .as("top_word_frac"))
      .orderBy(col("doc_id"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q55_decontamination",
      (s, dir) => contamination(Tables.load(s, dir, "documents"),
        shinglesOverride = Some(TextQueries.sharedHashedShingles(s, dir, 5))),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws) - 3),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
        |       FROM w WHERE len(ws) >= 5),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
        |train AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
        |shr AS (SELECT doc_id, count(*) AS n_shared FROM train
        |        WHERE shingle IN (SELECT shingle FROM bench) GROUP BY doc_id)
        |SELECT tot.doc_id, n_shingles,
        |  coalesce(n_shared, 0) AS n_shared,
        |  round(CAST(coalesce(n_shared, 0) AS DOUBLE) / n_shingles, 4) AS contamination
        |FROM tot LEFT JOIN shr ON tot.doc_id = shr.doc_id
        |ORDER BY tot.doc_id""".stripMargin),
      doc = "Benchmark decontamination: 5-gram overlap vs held-out slice"),

    Declared(
      "q56_vocabulary",
      (s, dir) => vocabulary(Tables.load(s, dir, "documents")),
      Some("""SELECT word, count(*) AS freq
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY freq DESC, word LIMIT 100""".stripMargin),
      doc = "Corpus vocabulary: global top-100 term frequencies"),

    Declared(
      "q57_repetition",
      (s, dir) => repetitionSignals(Tables.load(s, dir, "documents")),
      Some("""WITH s AS (SELECT doc_id, unnest(string_split(text, '. ')) AS snt FROM documents),
        |ss AS (SELECT doc_id, count(*) AS n_sent,
        |              count(DISTINCT snt) AS n_uniq_sent FROM s GROUP BY doc_id),
        |w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd FROM documents),
        |wc AS (SELECT doc_id, wd, count(*) AS c FROM w GROUP BY doc_id, wd),
        |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |              max(c) AS max_word_freq FROM wc GROUP BY doc_id)
        |SELECT ss.doc_id, n_sent, n_uniq_sent,
        |  round(1.0 - CAST(n_uniq_sent AS DOUBLE) / n_sent, 4) AS dup_sent_frac,
        |  n_words, max_word_freq,
        |  round(CAST(max_word_freq AS DOUBLE) / n_words, 4) AS top_word_frac
        |FROM ss JOIN ws ON ss.doc_id = ws.doc_id
        |ORDER BY ss.doc_id""".stripMargin),
      doc = "Gopher-style repetition signals (dup sentences, top-word mass)")
  )
}
