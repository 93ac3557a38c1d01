package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** BM25 query scoring over the corpus — the retrieval building block a
  * training-data pipeline uses for targeted corpus slicing ("pull the
  * documents most about X") and for dataset search tooling.
  *
  * Scale shape: the token explode + (doc, term) count is one hash
  * aggregation with map-side partials; document frequency and the
  * corpus length stats are aggregates OF that table (no second pass
  * over the token stream); the per-term idf table is a ≤|query|-row
  * broadcast. Nothing shuffles the corpus more than once at any size.
  *
  * Determinism: tf, dl, df, N are integers; avgdl enters as the same
  * sum/count double in both engines; each (doc, term) partial score is
  * quantized to integer micros BEFORE the per-doc sum (q68's idiom) so
  * the cross-engine hash compares exact integers. k1 = 1.2, b = 0.75
  * (the standard Robertson parameters); idf = ln(1 + (N − df + 0.5) /
  * (df + 0.5)) — the Lucene form, strictly positive. */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Per-doc BM25 integer-micro scores for every doc matching ≥ 1
    * query term — the ranking substrate [[bm25]] tops and
    * [[rrfFusion]]'s lexical arm consumes. */
  def bm25Scores(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val ws = split(lower(col("text")), " ")
    val toks = docs.select(col("doc_id"), size(ws).as("dl"),
      explode(ws).as("word"))
    val tf = toks.filter(col("word").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(ws)).as("sum_dl"))
    tf
      .join(broadcast(dfreq), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", log(lit(1.0)
        + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part_micro", round(col("idf")
        * (col("tf") * lit(K1 + 1.0))
        / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
        * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("part_micro")).as("score_micro"))
  }

  def bm25(docs: DataFrame, terms: Seq[String], topN: Int = 50): DataFrame = {
    bm25Scores(docs, terms)
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(topN)
      // round AT the micro grid (6 dp), never coarser: a micro-quantized
      // value can sit exactly on a half boundary of a coarser grid, and
      // Spark rounds the shortest decimal repr of the double while
      // DuckDB rounds the binary value — 1.18935 → 1.1894 vs 1.1893.
      // At the value's own quantum the boundary is 0.5e-6 away ≫ 1 ulp.
      .select(col("doc_id"), col("n_terms"),
        round(col("score_micro").cast("double") / 1e6, 6).as("score"))
  }

  private def bm25Oracle(terms: Seq[String], topN: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word
       |      FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |            FROM documents)),
       |tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM t
       |       WHERE word IN ($termList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs,
       |            sum(len(string_split(lower(text), ' '))) AS sum_dl
       |          FROM documents),
       |scored AS (SELECT tf.doc_id,
       |    CAST(round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
       |        / (CAST(df AS DOUBLE) + 0.5))
       |      * (tf * ${K1 + 1.0})
       |      / (tf + $K1 * (${1.0 - B} + $B * dl
       |          / (CAST(sum_dl AS DOUBLE) / n_docs)))
       |      * 1000000) AS BIGINT) AS part_micro
       |  FROM tf JOIN dfreq USING (word) CROSS JOIN stats)
       |SELECT doc_id, count(*) AS n_terms,
       |  round(CAST(sum(part_micro) AS DOUBLE) / 1000000, 6) AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY sum(part_micro) DESC, doc_id LIMIT $topN""".stripMargin
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.,
    * SIGIR'09): the lexical arm is the BM25 top-`topK` for the query
    * terms, the semantic arm is the exact-distance top-`topK` around a
    * query-by-example vector (`vec_id = 0`, the document/embedding id
    * spaces are aligned in the testdata), and each doc's fused score is
    * Σ_arms ⌊1e6 / (60 + rank)⌋ — integer micros, absent-arm
    * contribution 0, so the fusion is exact cross-engine.
    *
    * Scale shape: each arm reduces to ≤ topK rows via distributed
    * TakeOrdered BEFORE any ranking; ranks are then assigned by a
    * broadcast ≤ topK × topK comparison-count join (1 + #better), NEVER
    * a global window — the fused table is two tiny lists, whatever the
    * corpus size. */
  def rrfFusion(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                kRrf: Int = 60, topK: Int = 100, topN: Int = 50): DataFrame = {
    def rankOf(top: DataFrame, better: (Column, Column) => Column): DataFrame =
      top.as("x").join(broadcast(top.as("y")),
          better(col("y.key"), col("x.key")) ||
            (col("y.key") === col("x.key") && col("y.doc_id") < col("x.doc_id")),
          "left")
        .groupBy(col("x.doc_id").as("doc_id"))
        .agg((count(col("y.doc_id")) + 1L).as("rank"))
    val lexTop = bm25Scores(docs, terms)
      .select(col("doc_id"), col("score_micro").as("key"))
      .orderBy(col("key").desc, col("doc_id")).limit(topK)
      .localCheckpoint() // feeds both sides of the rank join
    val lexRank = rankOf(lexTop, _ > _).withColumnRenamed("rank", "lex_rank")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val semTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(graft.linalg.Distances.euclidean(col("embedding"), col("qv")), 6)
          .as("key"))
      .orderBy(col("key"), col("doc_id")).limit(topK)
      .localCheckpoint()
    val semRank = rankOf(semTop, _ < _).withColumnRenamed("rank", "sem_rank")
    lexRank.join(semRank, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        (when(col("lex_rank").isNull, 0L)
          .otherwise(expr(s"1000000 div ($kRrf + lex_rank)"))
          + when(col("sem_rank").isNull, 0L)
            .otherwise(expr(s"1000000 div ($kRrf + sem_rank)"))).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(topN)
  }

  /** CTE chain producing `lr(doc_id, lex_rank)` and `sr(doc_id,
    * sem_rank)` — the two retrieval arms' top-`topK` rank tables,
    * shared verbatim by the q202 fusion oracle and the q210 RBO oracle
    * so the arm semantics cannot drift between them. */
  private def armCtes(terms: Seq[String], topK: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val d = graft.DuckSql.euclidean("e.embedding", "q.qv")
    s"""t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word
       |      FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
       |            FROM documents)),
       |tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM t
       |       WHERE word IN ($termList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs,
       |            sum(len(string_split(lower(text), ' '))) AS sum_dl
       |          FROM documents),
       |lex AS (SELECT tf.doc_id,
       |    CAST(round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
       |        / (CAST(df AS DOUBLE) + 0.5))
       |      * (tf * ${K1 + 1.0})
       |      / (tf + $K1 * (${1.0 - B} + $B * dl
       |          / (CAST(sum_dl AS DOUBLE) / n_docs)))
       |      * 1000000) AS BIGINT) AS part_micro
       |  FROM tf JOIN dfreq USING (word) CROSS JOIN stats),
       |lexall AS (SELECT doc_id, CAST(sum(part_micro) AS BIGINT) AS key
       |           FROM lex GROUP BY 1),
       |tl AS MATERIALIZED (SELECT doc_id, key FROM lexall
       |      ORDER BY key DESC, doc_id LIMIT $topK),
       |lr AS (SELECT x.doc_id, 1 + count(y.doc_id) AS lex_rank
       |       FROM tl x LEFT JOIN tl y
       |         ON (y.key > x.key OR (y.key = x.key AND y.doc_id < x.doc_id))
       |       GROUP BY x.doc_id),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |ts AS MATERIALIZED (
       |  SELECT e.vec_id AS doc_id, round($d, 6) AS key
       |  FROM embeddings e, q WHERE e.vec_id <> 0
       |  ORDER BY key, doc_id LIMIT $topK),
       |sr AS (SELECT x.doc_id, 1 + count(y.doc_id) AS sem_rank
       |       FROM ts x LEFT JOIN ts y
       |         ON (y.key < x.key OR (y.key = x.key AND y.doc_id < x.doc_id))
       |       GROUP BY x.doc_id)""".stripMargin
  }

  private def rrfOracle(terms: Seq[String], kRrf: Int, topK: Int,
                        topN: Int): String = {
    s"""WITH ${armCtes(terms, topK)}
       |SELECT coalesce(lr.doc_id, sr.doc_id) AS doc_id,
       |  coalesce(lex_rank, 0) AS lex_rank,
       |  coalesce(sem_rank, 0) AS sem_rank,
       |  CAST(coalesce(1000000 // ($kRrf + lex_rank), 0)
       |     + coalesce(1000000 // ($kRrf + sem_rank), 0) AS BIGINT) AS rrf_micro
       |FROM lr FULL OUTER JOIN sr ON lr.doc_id = sr.doc_id
       |ORDER BY rrf_micro DESC, doc_id LIMIT $topN""".stripMargin
  }

  /** Rank-biased-overlap weights in integer nanos: W_d = (1−p)·p^(d−1)/d.
    * Computed ONCE here and spliced as literals into both the Spark
    * plan and the oracle SQL, so the two sides share exact integers and
    * the RBO sum is order-independent BIGINT arithmetic — no float fold
    * to align. */
  private def rboWeightsNano(k: Int, p: Double): Seq[(Long, Long)] =
    Seq.tabulate(k)(i =>
      ((i + 1).toLong, math.round((1 - p) * math.pow(p, i) / (i + 1) * 1e9)))

  /** Rank-biased overlap (Webber et al. 2010, truncated at depth `k`)
    * between the two retrieval arms of [[rrfFusion]] — the standard
    * answer to "how differently do my lexical and semantic retrievers
    * rank?", which is the diagnostic run before choosing fusion
    * weights. RBO@k = Σ_{d=1..k} (1−p)·p^(d−1)·|A_d ∩ B_d|/d; an item
    * in both top-k lists at ranks (ra, rb) enters every depth
    * d ≥ max(ra, rb), so the per-depth overlap is one broadcast
    * θ-join over ≤ k rows. Emits the per-depth overlap and the running
    * RBO so the depth profile is inspectable, not just the scalar.
    *
    * Scale shape: inherits [[rrfFusion]]'s — arms reduce via
    * distributed TakeOrdered to k rows each before anything ranks;
    * everything after is ≤ k² broadcast work, whatever the corpus. */
  def rboArms(docs: DataFrame, emb: DataFrame, terms: Seq[String],
              k: Int = 10, p: Double = 0.9): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val fused = rrfFusion(docs, emb, terms, topK = k, topN = 2 * k)
    val both = fused.filter(col("lex_rank") >= 1 && col("sem_rank") >= 1)
      .select(greatest(col("lex_rank"), col("sem_rank")).as("d_min"))
    val w = rboWeightsNano(k, p).toDF("depth", "wnano")
    val ov = s.range(1, k + 1).toDF("depth")
      .join(broadcast(both), col("d_min") <= col("depth"), "left")
      .groupBy(col("depth")).agg(count(col("d_min")).as("ov"))
    // contributions materialize once (they sit atop the two arm scans);
    // the ≤ k² running-sum self-join then reads the checkpoint
    val contrib = ov.join(broadcast(w), Seq("depth"))
      .select(col("depth"), col("ov"), (col("ov") * col("wnano")).as("c"))
      .localCheckpoint()
    contrib.as("a")
      .join(broadcast(contrib.as("b")), col("b.depth") <= col("a.depth"))
      .groupBy(col("a.depth").as("depth"), col("a.ov").as("ov"))
      .agg(sum(col("b.c")).as("rbo_nano"))
      .select(col("depth"), col("ov"), col("rbo_nano"),
        round(col("rbo_nano") / 1e9, 6).as("rbo"))
      .orderBy(col("depth"))
  }

  private def rboOracle(terms: Seq[String], k: Int, p: Double): String = {
    val vals = rboWeightsNano(k, p)
      .map { case (d, w) => s"($d, $w)" }.mkString(", ")
    s"""WITH ${armCtes(terms, k)},
       |inboth AS (SELECT greatest(lex_rank, sem_rank) AS d_min
       |         FROM lr JOIN sr ON lr.doc_id = sr.doc_id),
       |w(depth, wnano) AS (VALUES $vals),
       |depths AS (SELECT unnest(range(1, ${k + 1})) AS depth),
       |ov AS (SELECT depth, count(d_min) AS ov
       |       FROM depths LEFT JOIN inboth ON d_min <= depth GROUP BY 1),
       |c AS (SELECT depth, ov, ov * wnano AS c FROM ov JOIN w USING (depth))
       |SELECT CAST(a.depth AS BIGINT) AS depth, a.ov,
       |  CAST(sum(b.c) AS BIGINT) AS rbo_nano,
       |  round(CAST(sum(b.c) AS DOUBLE) / 1e9, 6) AS rbo
       |FROM c a JOIN c b ON b.depth <= a.depth
       |GROUP BY a.depth, a.ov ORDER BY depth""".stripMargin
  }

  /** Batch phrase search: each 2-word phrase's document and occurrence
    * counts in one corpus pass. The phrase list BROADCASTS into the
    * bigram stream right after the generator — a pipelined broadcast
    * hash join filters inside the scan stage, so the corpus is never
    * shuffled on content and the only exchange carries ≤ |phrases|
    * groups of partial aggregates. Zero-hit phrases survive via the
    * left join (count of NULL doc_id = 0). This is the scan-side dual
    * of an inverted index: for a bounded query batch at 100 TB, one
    * pruned scan beats materializing postings. */
  def phraseSearch(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = phrases.toDF("phrase")
      .select(col("phrase"), split(col("phrase"), " ").as("pw"))
      .select(col("phrase"), col("pw")(0).as("w1"), col("pw")(1).as("w2"))
    val ws = col("ws")
    val bg = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(ws) - lit(2)),
        i => struct(element_at(ws, i + 1).as("w1"),
          element_at(ws, i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    broadcast(p).join(bg, Seq("w1", "w2"), "left")
      .groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(col("doc_id")).as("n_occurrences"))
      .orderBy(col("phrase"))
  }

  private def phraseOracle(phrases: Seq[String]): String = {
    val vals = phrases.map { ph =>
      val Array(w1, w2) = ph.split(" ")
      s"('$ph', '$w1', '$w2')"
    }.mkString(",\n|    ")
    s"""WITH ph(phrase, w1, w2) AS (VALUES
      |    $vals),
      |ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |       FROM (SELECT doc_id, w,
      |               unnest(generate_series(1, len(w) - 1)) AS i
      |             FROM ws))
      |SELECT phrase, count(DISTINCT doc_id) AS n_docs,
      |  count(doc_id) AS n_occurrences
      |FROM ph LEFT JOIN bg USING (w1, w2)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Prefix autocompletion table: the top `k` corpus words (by exact
    * frequency, word-ordered ties) for every distinct leading
    * `prefixLen`-char prefix — the offline artifact a typeahead
    * service serves.
    *
    * Scale shape: the corpus is touched once by the word-count
    * aggregation; everything after runs on the vocabulary (bounded,
    * Heaps-law-sublinear), and the per-prefix rank is a window over
    * ≤ |vocab| rows that WindowGroupLimit prunes to k per prefix on
    * the map side before the shuffle. */
  def autocomplete(docs: DataFrame, prefixLen: Int = 2, k: Int = 3): DataFrame = {
    val counts = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > prefixLen)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("prefix")).orderBy(col("n").desc, col("w"))
    counts
      .withColumn("prefix", substring(col("w"), 1, prefixLen))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("prefix"), col("rn"), col("w").as("word"), col("n"))
      .orderBy(col("prefix"), col("rn"))
  }

  private def autocompleteOracle(prefixLen: Int, k: Int): String =
    s"""WITH c AS (
       |  SELECT w, count(*) AS n FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE length(w) > $prefixLen GROUP BY 1),
       |r AS (
       |  SELECT substr(w, 1, $prefixLen) AS prefix, w, n,
       |         row_number() OVER (PARTITION BY substr(w, 1, $prefixLen)
       |                            ORDER BY n DESC, w) AS rn
       |  FROM c)
       |SELECT prefix, CAST(rn AS INT) AS rn, w AS word, n FROM r WHERE rn <= $k
       |ORDER BY prefix, rn""".stripMargin

  /** Inverted-index construction — the search-side artifact itself:
    * per term, document frequency, total term frequency, and a bounded
    * postings sample (the 8 smallest doc_ids, comma-joined so the
    * driver comparator sees a scalar string, the round-1 array-column
    * lesson).
    *
    * Scale shape: ONE token pass feeds the (term, doc) tf aggregation;
    * the stats agg runs over that table, and the postings sample is a
    * row_number window IMMEDIATELY filtered to rn ≤ 8 — the
    * WindowGroupLimit rewrite prunes each map partition to 8 candidate
    * rows per term before the shuffle sort, so a stop word's posting
    * list never materializes anywhere. The two branches rejoin
    * co-partitioned on term. */
  def invertedIndex(docs: DataFrame, sampleK: Int = 8): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val sample = perDoc
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sampleK)
      .groupBy(col("term"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings_sample"))
    stats.join(sample, Seq("term"))
      .select(col("term"), col("df"), col("tf_total"), col("postings_sample"))
      .orderBy(col("term"))
  }

  private val QueryTerms = Seq("vector", "join", "scan")
  private val Phrases = Seq("table scan", "hash join", "fast table",
    "slow query", "key agg", "no hits")

  val declared: Seq[Declared] = Seq(
    Declared(
      "q103_bm25",
      (s, dir) => bm25(Tables.load(s, dir, "documents"), QueryTerms),
      Some(bm25Oracle(QueryTerms, 50)),
      doc = "BM25 query scoring (k1=1.2, b=0.75): one token pass + broadcast idf"),

    Declared(
      "q202_rrf_fusion",
      (s, dir) => rrfFusion(Tables.load(s, dir, "documents"),
        Tables.load(s, dir, "embeddings"), QueryTerms),
      Some(rrfOracle(QueryTerms, kRrf = 60, topK = 100, topN = 50)),
      doc = "Hybrid retrieval: BM25 top-100 + exact-kNN top-100 around vec 0 fused by integer-micro Reciprocal Rank Fusion (no global window - TakeOrdered arms, broadcast rank joins)"),

    Declared(
      "q210_rank_rbo",
      (s, dir) => rboArms(Tables.load(s, dir, "documents"),
        Tables.load(s, dir, "embeddings"), QueryTerms),
      Some(rboOracle(QueryTerms, k = 10, p = 0.9)),
      doc = "Rank-biased overlap (p=0.9, depth 10) between the BM25 and exact-kNN retrieval arms - the retriever-agreement diagnostic behind fusion-weight choices; integer-nano weights shared verbatim with the oracle"),

    Declared(
      "q142_phrase_search",
      (s, dir) => phraseSearch(Tables.load(s, dir, "documents"), Phrases),
      Some(phraseOracle(Phrases)),
      doc = "Batch phrase search: broadcast phrase probe into the bigram stream, no content shuffle"),

    Declared(
      "q146_autocomplete",
      (s, dir) => autocomplete(Tables.load(s, dir, "documents")),
      Some(autocompleteOracle(2, 3)),
      doc = "Prefix autocompletion: top-3 corpus words per 2-char prefix (vocab-bounded, WindowGroupLimit-pruned)"),

    Declared(
      "q162_inverted_index",
      (s, dir) => invertedIndex(Tables.load(s, dir, "documents")),
      Some("""WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |pd AS (SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
        |s AS (SELECT term, count(*) AS df,
        |        CAST(sum(tf) AS BIGINT) AS tf_total
        |      FROM pd GROUP BY 1),
        |r AS (SELECT term, doc_id,
        |        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |      FROM pd),
        |ps AS (SELECT term,
        |         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |           AS postings_sample
        |       FROM r WHERE rn <= 8 GROUP BY 1)
        |SELECT s.term, s.df, s.tf_total, ps.postings_sample
        |FROM s JOIN ps USING (term) ORDER BY term""".stripMargin),
      doc = "Inverted index: per-term df/tf + bounded postings sample (WindowGroupLimit map-side pruning)")
  )
}
