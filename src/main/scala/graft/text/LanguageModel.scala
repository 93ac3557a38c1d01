package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Statistical language-model scoring — the perplexity quality filter
  * every large-scale curation pipeline runs (CCNet trains a 5-gram
  * KenLM and drops the worst-perplexity tail; Gopher/MassiveText and
  * RefinedWeb keep variants of the same gate). Reference scope: the
  * corpus-quality family of `testdatascalability.py`-style document
  * scoring; model here is an add-one-smoothed bigram LM trained on the
  * corpus itself and applied back to every document.
  *
  * Scale design (100 TB):
  *  - The model is a (w1, w2) → count table built by ONE hash
  *    aggregation of the corpus bigram stream — map-side partials, no
  *    sort. Context counts c(w1) derive from the bigram table (vocab²
  *    worst-case rows, corpus-independent), never from a second corpus
  *    pass.
  *  - Scoring joins per-document DISTINCT bigrams (pre-aggregated with
  *    multiplicity `n`) against the model, co-partitioned on (w1, w2)
  *    — the probe volume is bounded by distinct bigrams per doc, not
  *    token count, and a hot bigram ("of the") is 1:N against a single
  *    model row, so no join explosion exists.
  *  - The vocabulary size is a 1-row broadcast scalar; the only
  *    corpus-sized shuffles are the two hash aggs and the final
  *    per-doc sum.
  *
  * Double determinism (the repo-wide idiom): every log term is derived
  * from four exact integers (n, c12, c1, V), the smoothed probability
  * is one correctly-rounded double division, and the n·ln(p) term is
  * quantized to integer nano-nats BEFORE summation — long addition is
  * order-independent where float addition is not. The per-token score
  * is a floor of an exact-integer double division (all operands
  * < 2⁵³), which floors identically on both engines.
  */
object LanguageModel {

  /** Per-document mean negative log-likelihood (nano-nats/bigram)
    * under an add-one-smoothed bigram LM trained on the whole corpus.
    * Documents with fewer than two tokens have no bigrams and drop
    * out (mirrored in the oracle). Higher = more surprising = the
    * candidate for the quality-filter tail. */
  def bigramNll(docs: DataFrame): DataFrame = {
    // spread the bigram-struct explode beyond the scan's few input
    // splits; doc_id partitioning co-partitions the docBg aggregation
    val ws = docs.select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .repartition(col("doc_id"))
    // bind the words array BEFORE the lambda (lambda bodies re-evaluate
    // outer expressions per element — the round-4 shingle finding)
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // one corpus pass; feeds both the model aggregation and the probe
    val docBg = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val c12 = docBg.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = ws.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // ln p(w2|w1) with add-one smoothing, quantized per (doc, bigram)
    val termNano = round(col("n") *
      log((col("c12") + 1).cast("double") / (col("c1") + col("v"))) * 1e9)
      .cast("long")
    docBg.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n"), termNano.as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), sum(col("t")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        floor((-col("s")).cast("double") / col("n_bigrams"))
          .cast("long").as("nll_nano_tok"))
      .orderBy(col("doc_id"))
  }

  /** The CCNet perplexity GATE over [[bigramNll]]: label every document
    * head/middle/tail by its language's perplexity terciles (CCNet
    * trains a KenLM per language, buckets by perplexity thirds, and
    * keeps head+middle for training). Tercile cutoffs come from a
    * deterministic bottom-`k` KMV row sample per language (md5 rank on
    * doc_id — q197's portable-quantile idiom) with NEAREST-RANK
    * selection on the integer nano-nat scores, so the cutoffs — and
    * hence every label — replay exactly in SQL.
    *
    * Scale shape: the LM scoring is q137's co-partitioned probe; the
    * sample build's per-lang windows carry ≤ k rows per partition after
    * WindowGroupLimit map-side pruning; cutoffs broadcast (2 longs per
    * language) and the labeling pass is row-local. */
  def perplexityGate(docs: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized: the per-doc score table feeds BOTH the cutoff
    // sample and the final labeling join — without it the whole LM
    // chain (bigram aggs + vocab scalar) executes twice
    val scores = bigramNll(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .localCheckpoint()
    val h = scores.select(col("lang"), col("doc_id"), col("nll_nano_tok"),
      conv(substring(md5(concat(lit("pg|"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long").as("h"))
    val wB = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val sk = h.withColumn("rn", row_number().over(wB)).filter(col("rn") <= k)
    val wV = Window.partitionBy(col("lang"))
      .orderBy(col("nll_nano_tok"), col("doc_id"))
    val cuts = sk.withColumn("vr", row_number().over(wV))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"), col("m"))
      .agg(
        max(when(col("vr") === expr("(m + 2) div 3"), col("nll_nano_tok"))).as("t1"),
        max(when(col("vr") === expr("(2 * m + 2) div 3"), col("nll_nano_tok"))).as("t2"))
      .select(col("lang"), col("t1"), col("t2"))
    scores.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("nll_nano_tok"),
        when(col("nll_nano_tok") <= col("t1"), lit("head"))
          .when(col("nll_nano_tok") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  private def perplexityGateOracle(k: Int): String =
    s"""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM documents),
       |bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
       |       FROM (SELECT doc_id, w,
       |               unnest(generate_series(1, len(w) - 1)) AS i
       |             FROM ws)),
       |docbg AS (SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY 1, 2, 3),
       |c12 AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c12
       |        FROM docbg GROUP BY 1, 2),
       |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v
       |      FROM (SELECT unnest(w) AS tok FROM ws)),
       |terms AS (SELECT doc_id, n,
       |    CAST(round(n * ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v))
       |      * 1000000000) AS BIGINT) AS t
       |  FROM docbg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
       |nll AS MATERIALIZED (
       |  SELECT doc_id, CAST(floor(CAST(-sum(t) AS DOUBLE) / sum(n)) AS BIGINT)
       |    AS nll_nano_tok
       |  FROM terms GROUP BY doc_id),
       |sc AS MATERIALIZED (
       |  SELECT d.lang, nll.doc_id, nll.nll_nano_tok,
       |    CAST(('0x' || substr(md5('pg|' || CAST(nll.doc_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS h
       |  FROM nll JOIN documents d ON d.doc_id = nll.doc_id),
       |sk AS (SELECT lang, doc_id, nll_nano_tok FROM (
       |    SELECT lang, doc_id, nll_nano_tok,
       |      row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
       |    FROM sc) WHERE rn <= $k),
       |o AS (SELECT lang, nll_nano_tok,
       |        row_number() OVER (PARTITION BY lang
       |                           ORDER BY nll_nano_tok, doc_id) AS vr,
       |        count(*) OVER (PARTITION BY lang) AS m
       |      FROM sk),
       |cuts AS (SELECT lang,
       |    max(CASE WHEN vr = (m + 2) // 3 THEN nll_nano_tok END) AS t1,
       |    max(CASE WHEN vr = (2 * m + 2) // 3 THEN nll_nano_tok END) AS t2
       |  FROM o GROUP BY lang, m)
       |SELECT sc.doc_id, sc.lang, sc.nll_nano_tok,
       |  CASE WHEN sc.nll_nano_tok <= cuts.t1 THEN 'head'
       |       WHEN sc.nll_nano_tok <= cuts.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM sc JOIN cuts USING (lang) ORDER BY sc.doc_id""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q137_lm_perplexity",
      (s, dir) => bigramNll(Tables.load(s, dir, "documents")),
      Some("""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |        FROM documents),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |       FROM (SELECT doc_id, w,
        |               unnest(generate_series(1, len(w) - 1)) AS i
        |             FROM ws)),
        |docbg AS (SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c12
        |        FROM docbg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v
        |      FROM (SELECT unnest(w) AS tok FROM ws)),
        |terms AS (SELECT doc_id, n,
        |    CAST(round(n * ln(CAST(c12 + 1 AS DOUBLE) / (c1 + v))
        |      * 1000000000) AS BIGINT) AS t
        |  FROM docbg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(-sum(t) AS DOUBLE) / sum(n)) AS BIGINT) AS nll_nano_tok
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Bigram-LM perplexity quality score per document (add-one smoothing, nano-nat quantized)"),

    Declared(
      "q190_dsir_importance",
      (s, dir) => dsirScores(Tables.load(s, dir, "documents")),
      Some(dsirOracle),
      doc = "DSIR importance weights: per-doc log-ratio of target-slice vs raw-slice bigram LMs (add-one smoothing, nano-nat terms summed as integers) - the data-selection score of Xie et al. 2023 over the q137 LM substrate"),

    Declared(
      "q203_perplexity_gate",
      (s, dir) => perplexityGate(Tables.load(s, dir, "documents")),
      Some(perplexityGateOracle(k = 256)),
      doc = "CCNet perplexity gate: head/middle/tail label per doc by per-language perplexity terciles (portable KMV sample cutoffs, integer nano-nat scores)")
  )

  /** Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    * reduced to its verifiable core: score every RAW-pool document by
    * the log-likelihood ratio of a TARGET-domain bigram LM (trained on
    * the held-out slice, doc_id ≡ 0 mod 10 — q55's benchmark
    * convention) against a RAW-pool bigram LM; high scores mark the
    * raw documents most target-like, i.e. the ones importance
    * resampling would keep. Both LMs are q137's add-one-smoothed
    * bigram model; each per-bigram term n·(ln p_t − ln p_r) is
    * quantized to integer nano-nats BEFORE the per-doc sum (the
    * repo-wide "longs add order-free, floats don't" idiom), so the
    * only float op chain per term is fixed-length and 1e-9-quantized.
    *
    * Scale shape: two slice-local hash aggregations build the models;
    * scoring is two co-partitioned joins on the bigram key (target
    * side LEFT — an unseen bigram backs off to the 1/(c1+V) smoothing
    * mass); the vocab sizes are 1-row broadcast scalars. */
  def dsirScores(docs: DataFrame): DataFrame = {
    val ws = docs.select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val docBg = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both model builds and the probe
    val isTarget = col("doc_id") % 10 === 0
    def lm(slice: DataFrame, suffix: String) = {
      val c12 = slice.groupBy(col("w1"), col("w2"))
        .agg(sum(col("n")).as(s"c12$suffix"))
      val c1 = c12.groupBy(col("w1"))
        .agg(sum(col(s"c12$suffix")).as(s"c1$suffix"))
      (c12, c1)
    }
    val (c12t, c1t) = lm(docBg.filter(isTarget), "t")
    val (c12r, c1r) = lm(docBg.filter(!isTarget), "r")
    def vocab(pred: org.apache.spark.sql.Column) = ws.filter(pred)
      .select(explode(col("ws")).as("tok"))
    val vt = vocab(isTarget).agg(countDistinct(col("tok")).as("vt"))
    val vr = vocab(!isTarget).agg(countDistinct(col("tok")).as("vr"))
    val term = round(col("n") *
      (log((coalesce(col("c12t"), lit(0L)) + 1).cast("double")
        / (coalesce(col("c1t"), lit(0L)) + col("vt")))
        - log((col("c12r") + 1).cast("double") / (col("c1r") + col("vr"))))
      * 1e9).cast("long")
    docBg.filter(!isTarget)
      .join(c12t, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .join(c12r, Seq("w1", "w2"))
      .join(c1r, Seq("w1"))
      .crossJoin(broadcast(vt)).crossJoin(broadcast(vr))
      .select(col("doc_id"), col("n"), term.as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), sum(col("t")).as("score_nano"))
      .orderBy(col("doc_id"))
  }

  // def, not val: `declared` above captures it during object init,
  // before a later val would have been assigned
  private def dsirOracle: String =
    """WITH ws AS MATERIALIZED (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |       FROM (SELECT doc_id, w,
      |               unnest(generate_series(1, len(w) - 1)) AS i
      |             FROM ws)),
      |docbg AS MATERIALIZED (
      |  SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY 1, 2, 3),
      |c12t AS MATERIALIZED (
      |  SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c12t
      |  FROM docbg WHERE doc_id % 10 = 0 GROUP BY 1, 2),
      |c1t AS (SELECT w1, CAST(sum(c12t) AS BIGINT) AS c1t FROM c12t GROUP BY 1),
      |c12r AS MATERIALIZED (
      |  SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c12r
      |  FROM docbg WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
      |c1r AS (SELECT w1, CAST(sum(c12r) AS BIGINT) AS c1r FROM c12r GROUP BY 1),
      |vt AS (SELECT count(DISTINCT tok) AS vt
      |       FROM (SELECT unnest(w) AS tok FROM ws WHERE doc_id % 10 = 0)),
      |vr AS (SELECT count(DISTINCT tok) AS vr
      |       FROM (SELECT unnest(w) AS tok FROM ws WHERE doc_id % 10 <> 0)),
      |terms AS (
      |  SELECT d.doc_id, d.n,
      |    CAST(round(d.n *
      |      (ln(CAST(coalesce(c12t.c12t, 0) + 1 AS DOUBLE)
      |         / (coalesce(c1t.c1t, 0) + vt))
      |       - ln(CAST(c12r.c12r + 1 AS DOUBLE) / (c1r.c1r + vr)))
      |      * 1000000000) AS BIGINT) AS t
      |  FROM docbg d
      |  LEFT JOIN c12t ON c12t.w1 = d.w1 AND c12t.w2 = d.w2
      |  LEFT JOIN c1t ON c1t.w1 = d.w1
      |  JOIN c12r ON c12r.w1 = d.w1 AND c12r.w2 = d.w2
      |  JOIN c1r ON c1r.w1 = d.w1
      |  CROSS JOIN vt CROSS JOIN vr
      |  WHERE d.doc_id % 10 <> 0)
      |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
      |  CAST(sum(t) AS BIGINT) AS score_nano
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
