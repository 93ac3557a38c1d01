package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Sampling + signal operators that are imperative at the row/group
  * grain but fully distributed:
  *
  *  - per-stratum deterministic reservoir (the "show me 5 docs per
  *    language" debugging/QA sample, and the per-key sampling shape
  *    MRDF's divide uses) via the bottom-n ReservoirSample Aggregator —
  *    order-independent, so the same sample comes back on any
  *    partitioning or cluster size;
  *  - compression-ratio quality signal (deflate bytes ÷ raw bytes):
  *    the classic cheap redundancy detector — boilerplate and
  *    template spam compress far better than prose. Genuine per-row
  *    imperative work (a zlib pass), so it runs in `mapPartitions`
  *    with one Deflater per partition — the documented last-resort
  *    tier, used for exactly the case the guidance reserves it for. */
object SampleOps {

  /** 5 deterministic sample doc ids per language (bottom-5 splitmix64
    * ranks). One partial-aggregated shuffle of (lang → ≤5 ids). */
  def reservoirPerLang(docs: DataFrame, n: Int = 5, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.agg.ReservoirSample(n, seed)
    docs.select(col("lang"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"),
        array_join(transform(col("sample.ids"), _.cast("string")), ",")
          .as("sample_ids"))
      .orderBy(col("lang"))
  }

  /** Portable twin of [[reservoirPerLang]] (q76b): the identical
    * per-key bottom-n sketch aggregation — same [[graft.agg.BottomN]]
    * insert, same (rank, id) tie-break, same output contract — but the
    * rank is an engine-portable md5 prefix (60 bits: 15 hex chars fit a
    * signed long in both engines) computed IN the plan, so a SQL oracle
    * replays the sample exactly. This makes the §2.10 reservoir row
    * driver-hash-exercised; the splitmix64 original (q76) remains the
    * declared throughput path. */
  def reservoirPerLangPortable(docs: DataFrame, n: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.agg.RankedSample(n)
    docs.select(
        conv(substring(md5(concat(lit("res|"), col("doc_id").cast("string"))), 1, 15),
          16, 10).cast("long").as("h"),
        col("lang"), col("doc_id"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .mapValues(t => graft.agg.Keyed(t._1, t._3))
      .agg(agg.toColumn.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"),
        array_join(transform(col("sample.ids"), _.cast("string")), ",")
          .as("sample_ids"))
      .orderBy(col("lang"))
  }

  /** Per-document deflate ratio, bucketed to stable 2-decimal values.
    * One Deflater per partition, reused across rows (allocation-free
    * steady state); no shuffle at any corpus size. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        rows.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            math.rint(compressed.toDouble / raw.length * 100) / 100)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
      .orderBy(col("doc_id"))
  }

  /** Exact-allocation stratified subsample: exactly min(`n`, stratum
    * size) docs per language, chosen by portable md5 rank (q37/q61's
    * hash idiom) — the "same 20 docs per language on any engine, any
    * cluster" QA slice. Per-stratum ranking window; Spark's
    * WindowGroupLimit prunes to ≤ n per stratum map-side. */
  def stratifiedFixed(docs: DataFrame, n: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank = substring(md5(col("doc_id").cast("string")), 1, 8)
    val w = Window.partitionBy(col("lang")).orderBy(rank, col("doc_id"))
    docs.select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .orderBy(col("lang"), col("rk"))
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-Res):
    * priority = ln(u)/w with u a portable md5-derived uniform and
    * w = n_chars; the top-`n` priorities are a w-proportional sample.
    * Deterministic AND engine-portable — both engines derive the same
    * u from the same md5 hex — so unlike rand()-based sampling this is
    * fully oracle-checkable. Priorities are quantized to integer picos
    * before ranking (q68's idiom): ln() may differ across libm
    * implementations in the last ulp, and an order-by on raw doubles
    * would let that flip a rank.
    *
    * Scale: priority is row-local; the global top-n rank is a
    * WindowGroupLimit, so each map task forwards only its local top-n —
    * the shuffle carries n·partitions rows, never the corpus. */
  def weightedSample(docs: DataFrame, n: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // u ∈ (0, 1]: 32 md5 bits + 1 so ln(u) is finite.
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    val priPicos = round(log(u) / col("n_chars") * 1e12).cast("long")
    val w = Window.orderBy(col("pri_p").desc, col("doc_id"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"), priPicos.as("pri_p"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .orderBy(col("rk"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q98_weighted_sample",
      (s, dir) => weightedSample(Tables.load(s, dir, "documents")),
      Some("""WITH p AS (
        |  SELECT doc_id, lang, n_chars,
        |         CAST(round(ln((CAST(concat('0x',
        |             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |             + 1.0) / 4294967296.0)
        |           / n_chars * 1000000000000) AS BIGINT) AS pri_p
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY pri_p DESC, doc_id) AS rk
        |      FROM p)
        |SELECT doc_id, lang, n_chars, pri_p, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin),
      doc = "Weighted sample w/o replacement (A-Res, portable hash priorities)"),

    Declared(
      "q78_stratified_fixed",
      (s, dir) => stratifiedFixed(Tables.load(s, dir, "documents")),
      Some("""WITH r AS (SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |       FROM documents)
        |SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM r
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin),
      doc = "Exact-allocation stratified sample: 20 per language by portable hash"),

    Declared(
      // Seeded-deterministic but splitmix64 is not ANSI-mirrorable ⇒
      // rows-only; the spec proves the sample equals a local bottom-n
      // and survives repartitioning bit-identically.
      "q76_reservoir_sample",
      (s, dir) => reservoirPerLang(Tables.load(s, dir, "documents")),
      None,
      doc = "Deterministic 5-per-language reservoir (order-independent bottom-n)"),

    Declared(
      "q76b_reservoir_portable",
      (s, dir) => reservoirPerLangPortable(Tables.load(s, dir, "documents")),
      Some("""WITH p AS (
        |  SELECT lang, doc_id,
        |         CAST(concat('0x', substr(md5('res|' || CAST(doc_id AS VARCHAR)),
        |           1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT lang, doc_id, h,
        |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        |      FROM p)
        |SELECT lang,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h, doc_id) AS sample_ids
        |FROM r WHERE rk <= 5 GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "Portable twin of q76: per-language bottom-5 reservoir by md5 rank (same BottomN aggregation, oracle-replayable)"),

    Declared(
      // zlib output length is JVM-deterministic but not ANSI-SQL ⇒
      // rows-only; the spec proves the redundancy ordering property
      // and bit-identical reruns.
      "q77_compression_ratio",
      (s, dir) => compressionRatio(Tables.load(s, dir, "documents")),
      None,
      doc = "Deflate-ratio quality signal (redundancy detector, row-local)"),

    Declared(
      "q186_temperature_mixture",
      (s, dir) => temperatureMixture(Tables.load(s, dir, "documents")),
      Some(temperatureMixtureOracle(1000L)),
      doc = "Temperature-rebalanced source mixture (alpha = 0.5): per-source targets proportional to sqrt(count), capped at availability, drawn as the deterministic per-source bottom-k by portable hash")
  )

  /** Temperature-based source rebalancing — the training-mixture
    * sampler of multilingual/multi-source corpora (mT5 / UniMax
    * shape): draw from source s proportionally to n_s^α with α = 1/2,
    * flattening the head without starving the tail. The per-source
    * target is `min(n_s, floor(N · √n_s / Σ √n_s))`; the draw itself
    * is the q78 deterministic bottom-k by portable md5 rank.
    *
    * Cross-engine exactness: √ and ÷ are correctly-rounded IEEE ops,
    * and Σ √n_s is a source-ORDERED left fold (float addition is not
    * associative; the pinned order makes both engines run the same op
    * sequence). The per-source count table is bounded by the source
    * cardinality — a driver-scalar fold, same class as the BPE round
    * constants. At 100 TB the only corpus-sized work is one count
    * aggregation and the per-source rank window (q78's accepted
    * shape; a production variant replaces the window with a rank
    * threshold probe). */
  def temperatureMixture(docs: DataFrame, nTarget: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weights = counts.map { case (_, n) => math.sqrt(n.toDouble) }
    val totalW = weights.foldLeft(0.0)(_ + _)
    val targets = counts.zip(weights).map { case ((src, n), wi) =>
      (src, math.min(n, math.floor(nTarget * wi / totalW).toLong))
    }.toSeq.toDF("source", "target")
    val win = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 8)
          .as("hk"))
      .withColumn("rk", row_number().over(win))
      .join(broadcast(targets), Seq("source"))
      .filter(col("rk") <= col("target"))
      .select(col("source"), col("doc_id"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  private def temperatureMixtureOracle(nTarget: Long): String =
    s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
       |w AS (SELECT source, n_s, sqrt(CAST(n_s AS DOUBLE)) AS w FROM c),
       |tw AS (SELECT list_reduce(
       |         list_prepend(CAST(0 AS DOUBLE), list(w ORDER BY source)),
       |         (a, b) -> a + b) AS tw FROM w),
       |t AS (SELECT source,
       |        least(n_s, CAST(floor($nTarget * w / tw) AS BIGINT)) AS target
       |      FROM w, tw),
       |r AS (SELECT source, doc_id,
       |        row_number() OVER (PARTITION BY source
       |          ORDER BY substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8),
       |                   doc_id) AS rk
       |      FROM documents)
       |SELECT r.source, r.doc_id, CAST(rk AS INTEGER) AS rk
       |FROM r JOIN t ON t.source = r.source
       |WHERE rk <= target
       |ORDER BY r.source, rk""".stripMargin
}
