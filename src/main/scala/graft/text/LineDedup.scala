package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Sentence-level exact dedup + Bloom-filter decontamination — the two
  * corpus-hygiene operators that complete the dedup family below the
  * document grain and above the shuffle-join cost floor:
  *
  *  - repeated-line removal (CCNet / RefinedWeb): an occurrence of a
  *    sentence survives only where it first appears corpus-wide
  *    (minimum (doc_id, pos)); every other copy is dropped. Reported
  *    per document as kept/total counts.
  *  - Bloom-filter decontamination: the 100 TB shape of q55 — instead
  *    of shuffling the training corpus's shingles into a semi-join
  *    against the benchmark set, build one Bloom filter over the
  *    benchmark shingles (distributed sketch aggregation, bitset to
  *    the driver) and broadcast it; the scan side then never shuffles
  *    at all. Zero false negatives by construction; false positives
  *    bounded by the configured fpp (over-flagging only, the safe
  *    direction for decontamination).
  */
object LineDedup {

  /** Per-document repeated-sentence removal report: of `n_sents`
    * sentence occurrences, `n_kept` are globally-first occurrences
    * (minimum (doc_id, pos) per distinct sentence). One sort-shuffle
    * on the 64-bit sentence hash (whole-partition min window — q67's
    * shape), one hash-agg by doc. */
  def lineDedup(docs: DataFrame): DataFrame = {
    val sents = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("h"))
    val firstOcc = min(struct(col("doc_id"), col("pos")))
      .over(Window.partitionBy(col("h")))
    sents
      .withColumn("keep",
        struct(col("doc_id"), col("pos")) === firstOcc)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sents"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), col("n_sents"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_sents"), 4).as("kept_frac"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate-line audit (CCNet-style): a sentence appearing in
    * ≥ `minDf` DISTINCT documents of the same source is boilerplate
    * (navigation chrome, footers, legal text — the web-pipeline class
    * repeated-content detector ABOVE the single-first-occurrence grain
    * of [[lineDedup]]). Reported per document as boilerplate counts +
    * floor-ppm share.
    *
    * Scale shape: the df table is one distinct + one hash-agg on the
    * (source, line-hash) key — map-side combined, never a self-join;
    * the join back is co-partitioned on the same key. Spark groups by
    * the 64-bit line hash; the oracle groups by the line STRING, so a
    * hash collision would be caught, not hidden (q69's convention). */
  def boilerplateAudit(docs: DataFrame, minDf: Int = 3): DataFrame = {
    val lines = docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), "\\. ")).as("line"))
      .select(col("doc_id"), col("source"), xxhash64(col("line")).as("h"))
    val df = lines.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("df"))
    lines.join(df, Seq("source", "h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_lines"), col("n_boiler"),
        floor(lit(1e6) * col("n_boiler") / col("n_lines")).cast("long")
          .as("boiler_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-slice membership filter: Bloom over the held-out slice's
    * distinct hashed `n`-gram shingles (q55's slice convention,
    * doc_id ≡ 0 mod 10). `expectedItems`/`fpp` size the bitset; the
    * build is a distributed sketch aggregation (bit-OR merge ⇒
    * insertion-order independent ⇒ deterministic output for a
    * deterministic input set). Scan side: the bitset rides the plan as
    * a binary literal probed by the codegen'd BloomFilterMightContain
    * predicate (see SketchExpressions), one hash-agg by doc — the
    * training corpus is never shuffled on content. */
  def bloomDecontaminate(docs: DataFrame, n: Int = 5,
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01,
                         shinglesOverride: Option[DataFrame] = None): DataFrame = {
    val sh = shinglesOverride.getOrElse(
      TextQueries.hashedWordShingles(docs, n).localCheckpoint())
    val bf = sh.filter(col("doc_id") % 10 === 0)
      .select(col("shingle")).distinct()
      .stat.bloomFilter("shingle", expectedItems, fpp)
    val mightContain =
      org.apache.spark.sql.graft.SketchExpressions.mightContainLong(bf, col("shingle"))
    sh.filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(mightContain, 1L).otherwise(0L)).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
        (col("n_bloom_hits") > 0L).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** [[bloomDecontaminate]]'s oracle-mirrorable twin: the SAME
    * broadcast-bitset / no-content-shuffle shape, but the Bloom filter
    * itself is rebuilt from portable primitives — k=4 bit positions per
    * shingle derived from md5 (the portable-hash idiom of q172–q177)
    * into an m=2^17-bit set — so a SQL engine can replay the filter
    * EXACTLY, false positives included. The build side aggregates to
    * ≤ m distinct bit positions BEFORE the driver collect (the
    * transfer is bounded by the bitset size — 16 KiB here — never by
    * the benchmark corpus); the probe side is a codegen'd
    * [[org.apache.spark.sql.graft.BitsetContains]] conjunction over a
    * plan-literal bitset, so the training corpus again never shuffles
    * on content. */
  def bloomDecontaminatePortable(docs: DataFrame, n: Int = 5,
                                 mBits: Int = 1 << 17,
                                 k: Int = 4): DataFrame = {
    // Kirsch–Mitzenmacher double hashing: the k bit positions derive
    // from ONE md5 per shingle (two 56-bit digest lanes, pos_j =
    // (h1 + j·h2) mod m) — the construction K-M 2006 proved loses no
    // Bloom-filter accuracy, at 1/k the hashing cost. The digest is
    // hoisted into projected lane columns BEFORE the checkpoint, so
    // the one-md5 cost is structural — the earlier form instantiated
    // two md5 expressions per probe position (8 per shingle at k=4)
    // and relied on subexpression elimination, which is not guaranteed
    // inside aggregate expressions (round-9 advice).
    def pos(j: Int): Column = (col("bf_h1") + lit(j.toLong) * col("bf_h2")) % mBits
    val sh = TextQueries.wordShingles(docs, n)
      .withColumn("bf_md5", md5(concat(lit("bf|"), col("shingle"))))
      .select(col("doc_id"), col("shingle"),
        conv(substring(col("bf_md5"), 1, 14), 16, 10).cast("long").as("bf_h1"),
        conv(substring(col("bf_md5"), 17, 14), 16, 10).cast("long").as("bf_h2"))
      .localCheckpoint()
    val setBits = sh.filter(col("doc_id") % 10 === 0)
      .select(explode(array((0 until k).map(pos): _*)).as("p"))
      .distinct() // ≤ mBits rows by construction — this caps the collect
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val bits = new Array[Byte](mBits / 8)
    setBits.foreach { p =>
      bits((p >> 3).toInt) = (bits((p >> 3).toInt) | (1 << (p & 7L).toInt)).toByte
    }
    val mightContain = (0 until k)
      .map(j => org.apache.spark.sql.graft.SketchExpressions
        .bitsetContains(bits, pos(j)))
      .reduce(_ && _)
    sh.filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(mightContain, 1L).otherwise(0L)).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
        (col("n_bloom_hits") > 0L).as("flagged"))
      .orderBy(col("doc_id"))
  }

  private def bloomPortableOracle(n: Int, mBits: Int, k: Int): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |      i -> ${(0 until n).map(o => s"ws[i+$o]").mkString(" || ' ' || ")})) AS shingle
       |  FROM w WHERE len(ws) >= $n),
       |hl AS (
       |  SELECT doc_id, shingle,
       |    CAST(('0x' || substr(md5('bf|' || shingle), 1, 14)) AS BIGINT) AS h1,
       |    CAST(('0x' || substr(md5('bf|' || shingle), 17, 14)) AS BIGINT) AS h2
       |  FROM sh),
       |pos AS MATERIALIZED (
       |  SELECT doc_id, shingle, j, (h1 + j * h2) % $mBits AS p
       |  FROM hl, range($k) t(j)),
       |b AS MATERIALIZED (SELECT DISTINCT p FROM pos WHERE doc_id % 10 = 0),
       |tr AS (
       |  SELECT doc_id, shingle,
       |    sum(CASE WHEN p IN (SELECT p FROM b) THEN 1 ELSE 0 END) AS nset
       |  FROM pos WHERE doc_id % 10 <> 0 GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN nset = $k THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       |  sum(CASE WHEN nset = $k THEN 1 ELSE 0 END) > 0 AS flagged
       |FROM tr GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q69_line_dedup",
      (s, dir) => lineDedup(Tables.load(s, dir, "documents")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, '. ') AS ss FROM documents),
        |s AS (SELECT doc_id,
        |        unnest(range(1, len(ss) + 1)) AS pos,
        |        unnest(ss) AS snt
        |      FROM w),
        |k AS (SELECT doc_id, snt,
        |        row_number() OVER (PARTITION BY snt ORDER BY doc_id, pos) AS rn
        |      FROM s)
        |SELECT doc_id, count(*) AS n_sents,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS kept_frac
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Repeated-sentence removal: keep first global occurrence (CCNet line dedup)"),

    Declared(
      "q176_boilerplate",
      (s, dir) => boilerplateAudit(Tables.load(s, dir, "documents")),
      Some("""WITH l AS (
        |  SELECT doc_id, source, unnest(string_split(text, '. ')) AS line
        |  FROM documents),
        |d AS (
        |  SELECT source, line, count(DISTINCT doc_id) AS df
        |  FROM l GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(floor(1e6 * sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END)
        |    / count(*)) AS BIGINT) AS boiler_ppm
        |FROM l JOIN d USING (source, line)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "Boilerplate-line audit: sentences in >=3 distinct docs of the same source flagged per doc (CCNet-style repeated-content detector)"),

    Declared(
      // Deterministic (bit-OR sketch merge) but not ANSI-expressible ⇒
      // rows-only for the driver; the spec proves zero false negatives
      // vs the exact q55 semi-join and bounds the false-positive rate.
      "q70_bloom_decontam",
      (s, dir) => bloomDecontaminate(Tables.load(s, dir, "documents"),
        shinglesOverride = Some(TextQueries.sharedHashedShingles(s, dir, 5))),
      None,
      doc = "Bloom-filter decontamination (broadcast bitset, no content shuffle)"),

    Declared(
      "q198_bloom_portable",
      (s, dir) => bloomDecontaminatePortable(Tables.load(s, dir, "documents")),
      Some(bloomPortableOracle(n = 5, mBits = 1 << 17, k = 4)),
      doc = "Portable-hash Bloom decontamination (md5 bit positions, exact SQL replay incl. false positives)")
  )
}
