package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Supervised bag-of-words classifier, trained distributedly — the
  * fastText-style quality/language tagger of a curation pipeline
  * (label docs with a cheap linear model, gate or route on the
  * prediction), reduced to its exactly-verifiable core:
  *
  *  - TRAIN (docs with doc_id % 10 ≠ 0): the model is the per-class
  *    token-frequency table cnt(w, c) plus class totals T_c — one
  *    map-side-combined aggregation each; the model is data, not
  *    driver state.
  *  - PREDICT (held-out docs, doc_id % 10 = 0): class affinity
  *    score(d, c) = (Σ_{token occurrences w ∈ d} cnt(w, c)) / T_c —
  *    the class-conditional expected token frequency. Unseen tokens
  *    contribute 0 (inner join); the argmax ties on class name.
  *  - REPORT: the confusion matrix (true lang × predicted lang).
  *
  * Cross-engine exactness by construction: both factors of every score
  * are exact integer sums; the single double division is
  * correctly-rounded IEEE in any engine, so comparisons — and hence
  * the argmax — cannot drift. (A log-prob naive Bayes would put a
  * transcendental `ln` on every token, whose last-ulp rounding is NOT
  * pinned across engines; the affinity form keeps the verifiable
  * contract with the same join/aggregate scale shape.)
  *
  * Scale shape: model build is two hash aggregations over the token
  * stream; scoring is one co-partitioned join token-stream ⋈ model on
  * the token key, then a per-(doc, class) partial agg; the argmax is a
  * width-|classes| window per doc. Nothing is all-pairs, and the model
  * join key (token) is the natural partition key at 100 TB. */
object Classifier {

  /** Confusion matrix (lang, pred, n_docs) of the held-out split under
    * the train-split class-affinity model. */
  def tokenClassifier(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(lower(col("text")), " ")).as("w"))
    val train = toks.filter(col("doc_id") % 10 =!= 0)
    val model = train.groupBy(col("w"), col("lang").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val totals = train.groupBy(col("lang").as("c")).agg(count(lit(1)).as("tt"))
    val langs = train.select(col("lang").as("c")).distinct()
    val held = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"))
    val overlap = toks.filter(col("doc_id") % 10 === 0)
      .join(model, Seq("w"))
      .groupBy(col("doc_id"), col("c")).agg(sum(col("cnt")).as("s"))
    val scored = held
      .crossJoin(broadcast(langs))
      .join(broadcast(totals), Seq("c"))
      .join(overlap, Seq("doc_id", "c"), "left")
      .select(col("doc_id"), col("lang"), col("c"),
        (coalesce(col("s"), lit(0L)).cast("double") / col("tt")).as("score"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("c"))
    scored.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .groupBy(col("lang"), col("c").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred"))
  }

  private val tokenClassifierOracle: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |tr AS MATERIALIZED (SELECT * FROM t WHERE doc_id % 10 <> 0),
      |m AS MATERIALIZED (SELECT w, lang AS c, count(*) AS cnt
      |                   FROM tr GROUP BY 1, 2),
      |tot AS (SELECT lang AS c, count(*) AS tt FROM tr GROUP BY 1),
      |langs AS (SELECT DISTINCT lang AS c FROM tr),
      |hd AS (SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 0),
      |s AS MATERIALIZED (
      |  SELECT t.doc_id, m.c, sum(m.cnt) AS s
      |  FROM t JOIN m ON t.w = m.w
      |  WHERE t.doc_id % 10 = 0 GROUP BY 1, 2),
      |sc AS (
      |  SELECT hd.doc_id, hd.lang, l.c,
      |    CAST(coalesce(s.s, 0) AS DOUBLE) / tot.tt AS score
      |  FROM hd CROSS JOIN langs l
      |  JOIN tot ON tot.c = l.c
      |  LEFT JOIN s ON s.doc_id = hd.doc_id AND s.c = l.c),
      |p AS (
      |  SELECT doc_id, lang, c,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn
      |  FROM sc)
      |SELECT lang, c AS pred, count(*) AS n_docs
      |FROM p WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q182_token_classifier",
      (s, dir) => tokenClassifier(Tables.load(s, dir, "documents")),
      Some(tokenClassifierOracle),
      doc = "Bag-of-words class-affinity classifier: train token-frequency model on the 90% split, predict language of the held-out 10%, report the confusion matrix; integer-exact scoring makes train AND predict cross-engine-verifiable")
  )
}
