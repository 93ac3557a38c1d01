package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Declared

/** Near-duplicate detection at scale (north-star extension):
  * MinHash+LSH banding and SimHash over `documents`.
  *
  * Both are hash-sketch methods — deterministic (xxhash64, fixed band
  * layout) but not ANSI-SQL-mirrorable, so they are declared without a
  * DuckDB oracle (rows-only driver check) and validated in ScalaTest
  * against exact n-gram Jaccard ([[TextQueries.jaccardPairs]]).
  *
  * Scale shape: signatures are one groupBy over the exploded shingle
  * table (map-side combined mins); candidate generation joins on
  * (band, bandHash) — only colliding docs ever meet, never N².
  */
object Dedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands

  /** MinHash signature per doc: h_i = min over shingles of
    * xxhash64(i, shingle), i < NumHashes — shingle identity is its
    * 64-bit hash (hashedWordShingles), which only re-bases the hash
    * family; MinHash's uniformity assumption is unchanged. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = TextQueries.hashedWordShingles(docs)
    val mins = (0 until NumHashes)
      .map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: docs sharing any (band, bandHash) bucket become a
    * candidate pair; estimated Jaccard = fraction of equal signature
    * components. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // materialized once: the signature table feeds both bucket-join
    // sides AND both estimate joins (4× recompute of the shingle
    // explode + 32-way agg otherwise); harness sweep releases it
    val sig = minhashSignatures(docs).localCheckpoint()
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}")): _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val est = (0 until NumHashes)
      .map(i => when(col(s"s1.h$i") === col(s"s2.h$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / NumHashes
    cands
      .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("est_jaccard", round(est, 4))
      .filter(col("est_jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit j is the sign of
    * Σ_tokens (±1 by bit j of xxhash64(token)). */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j"))
    val packed = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    tokens.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** Near-dup pairs by SimHash: 4×16-bit chunk banding (a pair within
    * Hamming distance ≤ 3 must agree on ≥ 1 chunk), then exact Hamming
    * filter via bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    // materialized once: both chunk-join sides read the signature table
    val sig = simhash(docs).localCheckpoint()
    val chunks = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"),
            shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*))
          .as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Portable-hash MinHash+LSH — the oracle-mirrorable twin of
    * [[minhashPairs]] (q129's generated-mirror doctrine applied to the
    * sketch dedup family): the hash family is the repo's portable md5
    * convention (`conv(substr(md5(i || '|' || shingle), 1, 15), 16,
    * 10)` — 60 bits, positive in both engines), the band key is the
    * comma-joined component string (equality is all banding needs — no
    * second hash to port), and the Jaccard estimate is floor-ppm over
    * exact integers. 16 hashes × 8 bands × 2 rows: md5 is ~10× xxhash,
    * so the portable family is half-width — this variant exists to be
    * driver-verified end-to-end; [[minhashPairs]] (xxhash64, 32-wide)
    * stays the throughput path. NOTE: MinHash needs an (approximately)
    * min-wise independent hash PER SLOT — the Kirsch–Mitzenmacher
    * two-lane trick that is correct for the Bloom probe (q198) is NOT
    * sound here: `h_i = h1 + i·h2` makes the per-doc minimizers
    * correlated across slots (one low-(h1,h2) shingle wins many i),
    * inflating the Jaccard estimate (measured: 25 → 131 "pairs" at
    * sf0.01 against an exact-overlap truth of 25). Hence numH true
    * md5 evaluations per shingle, by design.
    *
    * Scale shape identical to q33: signature = ONE map-side-combined
    * min-agg over the exploded (shingle × i) stream (the explode is
    * row-local; ≤ NumH rows per doc cross the shuffle), candidates
    * meet only on (band, key) collisions, never N². */
  def minhashPortable(docs: DataFrame, tauPpm: Long = 500000L,
                      numH: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    def md5Long(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    // The ×numH md5 stream rides wordShingles' doc_id repartition —
    // without it the whole hash family ran inside the scan's single
    // map task at test scale (measured 4.2 s of serial wall at sf0.1
    // vs ~0.4 s spread).
    val sh = TextQueries.wordShingles(docs)
    val sig = sh
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(numH - 1))).as("i"), col("shingle"))
      .select(col("doc_id"), col("i"),
        md5Long(concat(col("i").cast("string"), lit("|"), col("shingle"))).as("h"))
      .groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("h"))
      .localCheckpoint() // feeds the band join AND both estimate joins
    val bands = sig
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("i"), col("h")))),
        e => e("h").cast("string")), ",").as("bh"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cands
      .join(sig.select(col("doc_id").as("d1"), col("i"), col("h").as("h1")), Seq("d1"))
      .join(sig.select(col("doc_id").as("d2"), col("i"), col("h").as("h2")),
        Seq("d2", "i"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("neq"))
      .select(col("d1"), col("d2"),
        floor(lit(1e6) * col("neq") / lit(numH)).cast("long").as("est_ppm"))
      .filter(col("est_ppm") >= tauPpm)
      // checkpoint BEFORE the global sort: the range partitioner's
      // boundary-sampling pass re-evaluates its child, and here the
      // child is the whole band-join + estimate chain while the
      // surviving pair set is tiny (measured: halves the pipeline)
      .localCheckpoint()
      .orderBy(col("d1"), col("d2"))
  }

  /** The q172 pipeline as reusable CTEs ending in `mp(d1, d2, est_ppm)`
    * — shared by the pairs oracle and the clusters oracle (q174). */
  private[text] def minhashPortableCtes(tauPpm: Long, numH: Int,
                                        rowsPerBand: Int): String =
    s"""sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
       |             x -> ws[x] || ' ' || ws[x+1] || ' ' || ws[x+2])) AS shingle
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |    WHERE len(ws) >= 3)),
       |hi AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    min(CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || shingle),
       |      1, 15)) AS BIGINT)) AS h
       |  FROM sh, range($numH) t(i) GROUP BY 1, 2),
       |bnd AS (
       |  SELECT doc_id, i // $rowsPerBand AS band,
       |         string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS bh
       |  FROM hi GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |eq AS (
       |  SELECT d1, d2, sum(CASE WHEN h1.h = h2.h THEN 1 ELSE 0 END) AS neq
       |  FROM cand JOIN hi h1 ON h1.doc_id = cand.d1
       |            JOIN hi h2 ON h2.doc_id = cand.d2 AND h2.i = h1.i
       |  GROUP BY 1, 2),
       |mp AS MATERIALIZED (
       |  SELECT d1, d2, est_ppm FROM (
       |    SELECT d1, d2,
       |      CAST(floor(1e6 * neq / $numH) AS BIGINT) AS est_ppm FROM eq)
       |  WHERE est_ppm >= $tauPpm)""".stripMargin

  /** The portable pairs, materialized once per (process, sfDir):
    * q172 declares them and q174's clustering consumes them — one md5
    * signature build per process, not per consumer. */
  def sharedPortablePairs(s: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame =
    graft.Materialized.table(s, dir, "minhash_portable") {
      minhashPortable(graft.Tables.load(s, dir, "documents"))
    }

  private def minhashPortableOracle(tauPpm: Long, numH: Int,
                                    rowsPerBand: Int): String =
    s"""WITH ${minhashPortableCtes(tauPpm, numH, rowsPerBand)}
       |SELECT d1, d2, est_ppm FROM mp ORDER BY d1, d2""".stripMargin

  /** Portable-hash SimHash near-dup pairs — [[simhashPairs]]' oracle-
    * mirrorable twin: a 60-bit fingerprint (bit j = sign of Σ_tokens ±1
    * by bit j of the portable md5 hash — 60 bits keeps every shift and
    * the packed value positive BIGINT in both engines), 4×15-bit chunk
    * banding (pigeonhole: hamming ≤ 3 forces ≥ 1 equal chunk, so the
    * candidate set is EXACT at this threshold), bit_count(xor) verify.
    * All-integer arithmetic end to end — nothing to drift. The xxhash64
    * 64-bit form (q34/q34b) stays the throughput path. */
  def simhashPortablePairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bits = 60
    val chunkBits = 15
    val tok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      // spread the md5 + ×60 bit expansion beyond the scan's few input
      // splits (minhashPortable's finding — at test scale the whole
      // token stream otherwise hashes inside one map task)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    // One pass, no row blowup: all `bits` per-bit ±1 sums as aggregate
    // columns of a single doc_id hash-agg (q34's shape — the previous
    // explode(sequence(0, bits-1)) multiplied the token stream ×60
    // before a two-level aggregation; measured ~2× on the whole query).
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j"))
    val packed = (0 until bits)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val sig = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("sh"))
      .localCheckpoint() // feeds both chunk-join sides
    val chunks = sig.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(bits / chunkBits - 1))).as("c"))
      .select(col("doc_id"), col("sh"), col("c"),
        expr(s"shiftright(sh, c * $chunkBits) & ${(1 << chunkBits) - 1}").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("d1"), col("d2"))
  }

  private def simhashPortableOracle(maxHamming: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |        FROM documents)),
       |bits AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM tok, range(60) t(j) GROUP BY 1, 2),
       |sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
       |      AS BIGINT) AS sh
       |  FROM bits GROUP BY 1),
       |chunks AS (
       |  SELECT doc_id, sh, c, (sh >> (c * 15)) & 32767 AS v
       |  FROM sig, range(4) t(c)),
       |p AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |  FROM chunks a JOIN chunks b
       |    ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
       |SELECT d1, d2, hamming FROM p
       |WHERE hamming <= $maxHamming ORDER BY d1, d2""".stripMargin

  /** Sorted-neighborhood near-dup candidates (Hernández & Stolfo,
    * SIGMOD'95): sort each language's documents by a cheap blocking key
    * (the normalized text prefix), slide a window of `w`, and verify
    * only the ≤ (w−1)·N neighbor pairs with exact word-set Jaccard.
    * The classic entity-resolution alternative to hash blocking: linear
    * candidate count by construction (vs MinHash's collision-dependent
    * count), at the cost of only finding near-dups that sort close.
    *
    * Scale shape: one sort-shuffle on (lang, key) — the window's lead()
    * needs no second pass; the Jaccard verify is row-local on the pair
    * (array_distinct/intersect of the two bound word arrays). At 100 TB
    * the sort is a range-partitioned TeraSort-shape exchange, and the
    * window's (w−1) lookahead crosses partition bounds correctly by
    * definition of the window frame. Jaccard is floor-ppm over exact
    * integer set sizes. */
  def sortedNeighborhoodPairs(docs: DataFrame, w: Int = 3,
      tauPpm: Long = 500000L, keyLen: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.select(col("doc_id"), col("lang"),
      substring(lower(col("text")), 1, keyLen).as("key"),
      array_distinct(split(lower(col("text")), " ")).as("ws"))
    val win = Window.partitionBy(col("lang")).orderBy(col("key"), col("doc_id"))
    val nbrCols = (1 until w).map(i =>
      struct(lead(col("doc_id"), i).over(win).as("doc_id"),
        lead(col("ws"), i).over(win).as("ws")).as(s"nb$i"))
    val withNbrs = keyed.select(
      Seq(col("lang"), col("doc_id"), col("ws")) ++ nbrCols: _*)
    val pairs = withNbrs
      .select(col("lang"), col("doc_id").as("d1"), col("ws").as("ws1"),
        explode(array((1 until w).map(i => col(s"nb$i")): _*)).as("nb"))
      .filter(col("nb.doc_id").isNotNull)
      .select(col("lang"), col("d1"), col("nb.doc_id").as("d2"),
        size(array_intersect(col("ws1"), col("nb.ws"))).as("inter"),
        size(col("ws1")).as("s1"), size(col("nb.ws")).as("s2"))
    pairs
      .select(col("lang"), col("d1"), col("d2"),
        floor(lit(1e6) * col("inter").cast("double")
          / (col("s1") + col("s2") - col("inter")).cast("double")).cast("long")
          .as("jaccard_ppm"))
      .filter(col("jaccard_ppm") >= tauPpm)
      .orderBy(col("lang"), col("d1"), col("d2"))
  }

  private def snmOracle(w: Int, tauPpm: Long, keyLen: Int): String =
    s"""WITH k AS (
       |  SELECT doc_id, lang, substr(lower(text), 1, $keyLen) AS key,
       |         list_distinct(string_split(lower(text), ' ')) AS ws
       |  FROM documents),
       |n AS (
       |  SELECT lang, doc_id AS d1, ws AS ws1,
       |         lead(doc_id, 1) OVER w AS n1_id, lead(ws, 1) OVER w AS n1_ws,
       |         lead(doc_id, 2) OVER w AS n2_id, lead(ws, 2) OVER w AS n2_ws
       |  FROM k WINDOW w AS (PARTITION BY lang ORDER BY key, doc_id)),
       |p AS (
       |  SELECT lang, d1, n1_id AS d2, len(list_intersect(ws1, n1_ws)) AS i,
       |         len(ws1) AS s1, len(n1_ws) AS s2 FROM n WHERE n1_id IS NOT NULL
       |  UNION ALL
       |  SELECT lang, d1, n2_id, len(list_intersect(ws1, n2_ws)),
       |         len(ws1), len(n2_ws) FROM n WHERE n2_id IS NOT NULL),
       |j AS (
       |  SELECT lang, d1, d2,
       |    CAST(floor(1e6 * CAST(i AS DOUBLE)
       |         / CAST(s1 + s2 - i AS DOUBLE)) AS BIGINT) AS jaccard_ppm
       |  FROM p)
       |SELECT lang, d1, d2, jaccard_ppm FROM j
       |WHERE jaccard_ppm >= $tauPpm ORDER BY lang, d1, d2""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q148_sorted_neighborhood",
      (s, dir) => sortedNeighborhoodPairs(graft.Tables.load(s, dir, "documents")),
      Some(snmOracle(3, 500000L, 24)),
      doc = "Sorted-neighborhood near-dup pairs (SIGMOD'95 blocking, window w=3, exact Jaccard verify)"),

    Declared(
      "q172_minhash_portable",
      (s, dir) => sharedPortablePairs(s, dir).orderBy(col("d1"), col("d2")),
      Some(minhashPortableOracle(500000L, 16, 2)),
      doc = "MinHash+LSH with the portable md5 hash family — the sketch dedup pipeline driver-verified end-to-end (banding, signature mins, ppm estimate); q33's xxhash64 form stays the throughput path"),

    Declared(
      "q173_simhash_portable",
      (s, dir) => simhashPortablePairs(graft.Tables.load(s, dir, "documents")),
      Some(simhashPortableOracle(3)),
      doc = "SimHash near-dup pairs on the portable md5 hash family (60-bit fingerprint, 4x15-bit banding, exact at hamming<=3) — driver-verified end-to-end; q34's xxhash64 form stays the throughput path"),

    Declared(
      "q33_minhash_pairs",
      (s, dir) => minhashPairs(graft.Tables.load(s, dir, "documents"), 0.5)
        .orderBy(col("d1"), col("d2")),
      None,
      doc = "MinHash+LSH near-dup candidate pairs (sketch ⇒ rows-only)"),

    Declared(
      "q34_simhash",
      (s, dir) => simhash(graft.Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      None,
      doc = "64-bit SimHash fingerprints (xxhash64 ⇒ rows-only)"),

    Declared(
      // maxHamming = 3 is the banding's completeness bound: 4 chunks
      // and ≤ 3 differing bits force ≥ 1 identical chunk (pigeonhole),
      // so at this threshold the candidate set is EXACT. A larger
      // threshold would silently miss pairs that differ in every chunk.
      "q34b_simhash_pairs",
      (s, dir) => simhashPairs(graft.Tables.load(s, dir, "documents"), 3)
        .orderBy(col("d1"), col("d2")),
      None,
      doc = "SimHash near-dup pairs via 16-bit chunk banding (exact ≤ 3 bits)")
  )
}
