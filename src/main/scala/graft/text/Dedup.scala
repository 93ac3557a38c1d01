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

  val declared: Seq[Declared] = Seq(
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
