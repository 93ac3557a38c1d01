package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed
  * partition-wise through typed Datasets (the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * The container has no imaging/audio libs, so the *decode* step is a
  * clearly-marked deterministic stub over the bytes; everything
  * Spark-side — binary schema, partition-wise batching, typed output
  * shape, chunking — is real and oracle-tested. The testdata has no
  * binary table, so documents.text (UTF-8 bytes) stands in as payload.
  */
object Multimodal {

  final case class Media(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, mean_px: Double)
  final case class Chunk(doc_id: Long, chunk_idx: Int, chunk_len: Int)

  def asMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")).as[Media]
  }

  /** Partition-wise "decode": real pipeline shape, stubbed decoder.
    * A production build swaps the body for an actual image decode
    * (JPEG → WxH, mean pixel); the fake is a pure function of the
    * bytes so the DuckDB oracle can mirror it. */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // STUB DECODE — deterministic fake in lieu of an image library.
        val n = m.payload.length
        var s = 0L; var i = 0
        while (i < n) { s += m.payload(i) & 0xff; i += 1 }
        val mean = BigDecimal(s.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        // Long math: n*31 would overflow Int past ~69 MB payloads and
        // diverge from the oracle's BIGINT arithmetic.
        MediaMeta(m.doc_id, n, 64 + n % 128, (64L + (n.toLong * 31L) % 128L).toInt, mean)
      }
    }
  }

  /** Fixed-size payload chunking — the frame-sampling/batching shape
    * (video frames, audio windows) without the codec. */
  def chunked(media: Dataset[Media], size: Int = 256): Dataset[Chunk] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(size).zipWithIndex.map {
        case (c, i) => Chunk(m.doc_id, i, c.length)
      }
    }
  }

  final case class CdcChunk(doc_id: Long, chunk_idx: Int, chunk_len: Int,
                            chunk_hash: Long)

  /** Content-defined chunking (Rabin-style): a rolling hash over the
    * byte stream cuts a chunk boundary wherever `hash % modulus == 0`
    * (subject to min/max chunk bounds) — so an insertion near the
    * start of a payload shifts ONE boundary instead of re-aligning
    * every fixed-size block. This is the storage-dedup primitive for
    * binary columns: identical regions of different payloads produce
    * identical (length, hash) chunks wherever the cut points
    * resynchronize. Genuine per-byte imperative work ⇒ the documented
    * mapPartitions tier (same as the deflate signal q77). */
  def cdcChunks(media: Dataset[Media], modulus: Int = 64,
                minLen: Int = 16, maxLen: Int = 256,
                window: Int = 16): Dataset[CdcChunk] = {
    val spark = media.sparkSession
    import spark.implicits._
    // The boundary test hashes a SLIDING window of the byte stream —
    // never the bytes since the last cut. A chunk-anchored hash would
    // make every boundary depend on where the previous one fell, so a
    // single inserted byte re-cuts the whole tail; the window hash
    // depends only on the local `window` bytes and resynchronizes as
    // soon as the window clears the edit (the CDC property the spec
    // asserts). Long overflow wraps identically everywhere ⇒
    // deterministic.
    val topPow: Long = {
      var p = 1L; var i = 0
      while (i < window) { p *= 131L; i += 1 }; p
    }
    media.flatMap { m =>
      val out = Seq.newBuilder[CdcChunk]
      val bytes = m.payload
      var start = 0
      var idx = 0
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = h * 131L + (bytes(i) & 0xff)
        if (i >= window) h -= topPow * (bytes(i - window) & 0xff)
        val len = i - start + 1
        val cut = len >= maxLen ||
          (len >= minLen && (h & 0x7fffffffffffffffL) % modulus == 0)
        if (cut || i == bytes.length - 1) {
          // chunk content hash: polynomial over the chunk's own bytes
          var ch = 0L
          var j = start
          while (j <= i) { ch = ch * 1099511628211L + (bytes(j) & 0xff); j += 1 }
          out += CdcChunk(m.doc_id, idx, len, ch)
          idx += 1; start = i + 1
        }
        i += 1
      }
      out.result()
    }
  }

  /** Cross-payload chunk sharing: how many distinct payloads contain
    * each chunk, and the dedup ratio the chunk store would achieve. */
  def chunkSharing(chunks: Dataset[CdcChunk]): DataFrame =
    chunks.toDF()
      .groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(count(lit(1)).as("n_refs"),
        count_distinct(col("doc_id")).as("n_docs"))
      .agg(count(lit(1)).as("n_unique_chunks"),
        sum(col("n_refs")).as("n_total_refs"),
        sum(col("chunk_len")).as("unique_bytes"),
        sum(col("chunk_len") * col("n_refs")).as("total_bytes"))
      .select(col("n_unique_chunks"), col("n_total_refs"),
        col("unique_bytes"), col("total_bytes"),
        round(col("total_bytes").cast("double") / col("unique_bytes"), 4)
          .as("dedup_ratio"))

  /** Perceptual-hash near-duplicate pairs over binary payloads — the
    * image/audio near-dup member of the dedup family with the decode
    * stubbed (q31's convention: payload bytes stand in for the decoded
    * sample stream). The fingerprint is the classic blockhash shape:
    * split the sample stream into 60 equal-position buckets, bit j = 1
    * iff bucket j's mean sample exceeds the payload mean — all-integer
    * (`60·s_j > S` avoids the division), so the bit vector cannot
    * drift across engines. Candidates then meet ONLY on an equal
    * 15-bit fingerprint chunk (pigeonhole: hamming ≤ 3 forces ≥ 1 of 4
    * chunks equal — the q173 banding), verified by bit_count(xor).
    *
    * Scale shape: fingerprinting is row-local (one pass over each
    * payload in a typed map, the realistic decode tier); the band join
    * is bucketed on (chunk, value) — never all-pairs; the verify is
    * row-local integer xor. */
  def phashFingerprints(media: Dataset[Media], bits: Int = 60): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val p = m.payload
      val L = p.length
      if (L < bits) Iterator.empty
      else {
        val sums = new Array[Long](bits)
        var total = 0L
        var i = 0
        while (i < L) {
          val v = (p(i) & 0xff).toLong
          sums(((i.toLong * bits) / L).toInt) += v
          total += v
          i += 1
        }
        var ph = 0L
        var j = 0
        while (j < bits) {
          if (sums(j) * bits > total) ph |= 1L << j
          j += 1
        }
        Iterator((m.doc_id, ph))
      }
    }.toDF("doc_id", "ph")
  }

  /** Banded near-dup pairs over [[phashFingerprints]] (exact at
    * `maxHamming` ≤ 3 for 4×15-bit chunks by pigeonhole). */
  def phashPairs(media: Dataset[Media], maxHamming: Int = 3): DataFrame = {
    val bits = 60
    val chunkBits = 15
    val sig = phashFingerprints(media, bits).localCheckpoint()
    val chunks = sig.select(col("doc_id"), col("ph"),
        explode(sequence(lit(0), lit(bits / chunkBits - 1))).as("c"))
      .select(col("doc_id"), col("ph"), col("c"),
        expr(s"shiftright(ph, c * $chunkBits) & ${(1 << chunkBits) - 1}").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.ph ^ b.ph)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("d1"), col("d2"))
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, sig: Long)

  /** Per-frame integer blockhash signatures over fixed-length byte
    * windows of the payload — the video-decode tier with the codec
    * stubbed (q31's convention: a real build swaps the byte windows
    * for decoded frames). Row-local typed flatMap, one pass/frame. */
  def frameSignatures(media: Dataset[Media], frameLen: Int = 64,
                      bits: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameLen).zipWithIndex.map { case (f, idx) =>
        val L = f.length
        val sums = new Array[Long](bits)
        var tot = 0L
        var i = 0
        while (i < L) {
          val v = (f(i) & 0xff).toLong
          sums(((i.toLong * bits) / L).toInt) += v
          tot += v
          i += 1
        }
        var sg = 0L
        var j = 0
        while (j < bits) {
          if (sums(j) * bits > tot) sg |= 1L << j
          j += 1
        }
        Frame(m.doc_id, idx, L, sg)
      }
    }
  }

  /** Temporal frame sampling — the VLM-training frame-extraction
    * pipeline: keep every `stride`-th frame (uniform coverage) PLUS
    * every scene change (signature hamming vs the PREVIOUS frame ≥
    * `minHamming` — previous frame, not previous kept, so the rule is
    * windowed `lag`, never a data-dependent chain). Decode tier is the
    * row-local [[frameSignatures]]; the sampling rule is declarative —
    * a per-doc window (bounded by frames-per-payload, never global).
    * All-integer signatures ⇒ nothing to drift cross-engine. */
  def frameSample(media: Dataset[Media], frameLen: Int = 64,
                  stride: Int = 4, minHamming: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSignatures(media, frameLen).toDF()
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("scene_change",
        coalesce(col("prev").isNotNull &&
          expr("bit_count(sig ^ prev)") >= minHamming, lit(false)))
      .filter(col("frame_idx") % stride === 0 || col("scene_change"))
      .select(col("doc_id"), col("frame_idx"), col("sig"), col("scene_change"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private def frameSampleOracle(frameLen: Int, bits: Int, stride: Int,
                                minHamming: Int): String =
    s"""WITH fr AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |    substr(text, CAST(i * $frameLen + 1 AS INTEGER), $frameLen) AS f
       |  FROM (SELECT doc_id, text,
       |          unnest(range(CAST(ceil(strlen(text) / $frameLen.0) AS BIGINT))) AS i
       |        FROM documents WHERE strlen(text) > 0)),
       |ch AS (
       |  SELECT doc_id, frame_idx,
       |    (CAST(p AS BIGINT) * $bits) // strlen(f) AS j,
       |    ord(substr(f, CAST(p + 1 AS INTEGER), 1)) AS c
       |  FROM (SELECT doc_id, frame_idx, f, unnest(range(strlen(f))) AS p FROM fr)),
       |bs AS (SELECT doc_id, frame_idx, j, sum(c) AS sj FROM ch GROUP BY 1, 2, 3),
       |wt AS (SELECT doc_id, frame_idx, j, sj,
       |         sum(sj) OVER (PARTITION BY doc_id, frame_idx) AS tot FROM bs),
       |sig AS MATERIALIZED (
       |  SELECT doc_id, frame_idx,
       |    CAST(sum(CASE WHEN sj * $bits > tot
       |         THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER) ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM wt GROUP BY 1, 2),
       |lg AS (
       |  SELECT doc_id, frame_idx, sig,
       |    lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
       |  FROM sig),
       |sc AS (
       |  SELECT doc_id, frame_idx, sig,
       |    coalesce(prev IS NOT NULL
       |      AND bit_count(xor(sig, prev)) >= $minHamming, false) AS scene_change
       |  FROM lg)
       |SELECT doc_id, frame_idx, sig, scene_change FROM sc
       |WHERE frame_idx % $stride = 0 OR scene_change
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** ASCII-only equivalence assumption (shared with [[cdcOracle]]):
    * the Spark side hashes UTF-8 PAYLOAD BYTES (`encode(text,'UTF-8')`)
    * while this oracle samples CODE POINTS via `ord(substr(text,i,1))`
    * over `range(0, strlen(text))`. The two views coincide exactly iff
    * the text is pure ASCII (one byte per code point, same values),
    * which holds for the driver's generated `documents` table and is
    * ASSERTED by `CdcChunkSpec`'s ascii-guard test — a generator
    * change to non-ASCII fails that spec loudly instead of silently
    * diverging here. */
  private def phashOracle(maxHamming: Int): String =
    s"""WITH ch AS MATERIALIZED (
       |  SELECT doc_id, len, (CAST(i AS BIGINT) * 60) // len AS j,
       |         ord(substr(text, CAST(i + 1 AS INTEGER), 1)) AS c
       |  FROM (SELECT doc_id, text, strlen(text) AS len,
       |          unnest(range(0, strlen(text))) AS i
       |        FROM documents WHERE strlen(text) >= 60)),
       |bs AS (SELECT doc_id, j, sum(c) AS sj FROM ch GROUP BY 1, 2),
       |wt AS (SELECT doc_id, j, sj,
       |         sum(sj) OVER (PARTITION BY doc_id) AS s FROM bs),
       |sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN sj * 60 > s
       |         THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END)
       |      AS BIGINT) AS ph
       |  FROM wt GROUP BY 1),
       |chunks AS (
       |  SELECT doc_id, ph, c, (ph >> (c * 15)) & 32767 AS v
       |  FROM sig, range(4) t(c)),
       |p AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
       |  FROM chunks a JOIN chunks b
       |    ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
       |SELECT d1, d2, hamming FROM p
       |WHERE hamming <= $maxHamming ORDER BY d1, d2""".stripMargin

  /** DuckDB mirror of [[cdcChunks]] + [[chunkSharing]] — the
    * imperative per-byte mapPartitions tier replayed exactly:
    *
    *  - the sliding-window hash is POSITION-LOCAL (it depends only on
    *    the trailing `window` bytes), so it needs no fold: h(i) =
    *    Σ_p b[i−p]·131^p with the 16 powers of 131 mod 2⁶⁴ embedded as
    *    literals, Java's signed-long wrap replayed as HUGEINT mod 2⁶⁴
    *    (and the `& Long.MaxValue` mask as mod 2⁶³);
    *  - the data-dependent cut CHAIN (each cut depends on the previous
    *    one through the min/max bounds) is a recursive CTE: next cut =
    *    least(doc end, start+maxLen−1, first boundary ≥ start+minLen−1);
    *  - chunk content hashes fold per chunk in HUGEINT mod 2⁶⁴; the
    *    output groups on (hash, len), where signed-vs-unsigned
    *    representation cannot matter (only equality does). */
  private def cdcOracle: String = {
    val pows = (0 until 16).map(p =>
      java.math.BigInteger.valueOf(131).pow(p)
        .mod(java.math.BigInteger.ONE.shiftLeft(64)))
    val terms = pows.zipWithIndex.map { case (pw, p) =>
      s"(CAST(coalesce(b[i-$p], 0) AS HUGEINT) * $pw)" }.mkString(" + ")
    s"""WITH RECURSIVE d AS MATERIALIZED (
       |  SELECT doc_id, strlen(text) AS L,
       |         list_transform(range(1, strlen(text)+1),
       |           i -> ord(substr(text, CAST(i AS INT), 1))) AS b
       |  FROM documents WHERE strlen(text) > 0),
       |wh AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    (($terms) % 18446744073709551616) % 9223372036854775808 AS hm
       |  FROM (SELECT doc_id, L, b, unnest(range(1, L+1)) AS i FROM d)),
       |bd AS MATERIALIZED (SELECT doc_id, i AS c FROM wh WHERE hm % 64 = 0),
       |lens AS MATERIALIZED (SELECT doc_id, L FROM d),
       |cuts AS (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS s,
       |    least(L, least(CAST(256 AS BIGINT),
       |      coalesce((SELECT min(c) FROM bd
       |                WHERE bd.doc_id = lens.doc_id AND c >= 16),
       |        9223372036854775807))) AS e, L
       |  FROM lens
       |  UNION ALL
       |  SELECT doc_id, e + 1,
       |    least(L, least(e + 256,
       |      coalesce((SELECT min(c) FROM bd
       |                WHERE bd.doc_id = cuts.doc_id AND c >= e + 16),
       |        9223372036854775807))), L
       |  FROM cuts WHERE e < L),
       |ch AS MATERIALIZED (
       |  SELECT c.doc_id, e - s + 1 AS chunk_len,
       |    list_reduce(
       |      list_prepend(CAST(0 AS HUGEINT), d.b[CAST(s AS INT):CAST(e AS INT)]),
       |      (a, x) -> (a * 1099511628211 + x) % 18446744073709551616) AS chash
       |  FROM cuts c JOIN d USING (doc_id)),
       |g AS (SELECT chash, chunk_len, count(*) AS n_refs FROM ch GROUP BY 1, 2)
       |SELECT CAST(count(*) AS BIGINT) AS n_unique_chunks,
       |  CAST(sum(n_refs) AS BIGINT) AS n_total_refs,
       |  CAST(sum(chunk_len) AS BIGINT) AS unique_bytes,
       |  CAST(sum(chunk_len * n_refs) AS BIGINT) AS total_bytes,
       |  round(CAST(sum(chunk_len * n_refs) AS DOUBLE) / sum(chunk_len), 4)
       |    AS dedup_ratio
       |FROM g""".stripMargin
  }

  /** Audio-shaped VAD segmentation — the silence-trim / speech-segment
    * extraction every ASR-data pipeline runs at ingest, with the PCM
    * decode stubbed (payload bytes stand in for audio samples, the
    * established multimodal convention here): per-window energy
    * (Σ (b−96)² over `win`-byte non-overlapping windows, full windows
    * only), a per-document ADAPTIVE threshold (windows above the doc's
    * mean energy — integer-exact: `energy·n_win > total`), and
    * gaps-and-islands merging of consecutive active windows with a
    * minimum segment duration (`minWins`).
    *
    * Scale shape: one row-local window explode (bounded by payload
    * size), one doc-partitioned analytic for the threshold and the
    * island numbering, one hash-agg for the segments — nothing global,
    * no typed row-at-a-time hop. */
  def energySegments(docs: DataFrame, win: Int = 64, minWins: Int = 2): DataFrame = {
    val wins = docs
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / win).cast("int").as("n_win"))
      .filter(col("n_win") >= 1)
      .select(col("doc_id"), col("n_win"),
        posexplode(transform(sequence(lit(0), col("n_win") - 1), w =>
          aggregate(
            transform(sequence(lit(1), lit(win)), i => {
              val c = ascii(col("text").substr(w * win + i, lit(1))).cast("long")
              (c - 96L) * (c - 96L)
            }),
            lit(0L), (acc, x) => acc + x))))
      .withColumnRenamed("pos", "win_idx")
      .withColumnRenamed("col", "energy")
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    wins
      .withColumn("total", sum(col("energy")).over(byDoc))
      .filter(col("energy") * col("n_win") > col("total"))
      .withColumn("grp", col("win_idx") - row_number().over(ordered))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("win_idx")).as("seg_start"), max(col("win_idx")).as("seg_end"),
        count(lit(1)).as("n_wins"), sum(col("energy")).as("seg_energy"))
      .filter(col("n_wins") >= minWins)
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_wins"), col("seg_energy"))
      .orderBy(col("doc_id"), col("seg_start"))
  }

  private def energySegmentsOracle(win: Int, minWins: Int): String =
    s"""WITH d AS (SELECT doc_id, text, CAST(strlen(text) // $win AS INTEGER) AS n_win
       |           FROM documents WHERE strlen(text) >= $win),
       |wn AS MATERIALIZED (
       |  SELECT doc_id, n_win, CAST(w AS INTEGER) AS win_idx,
       |    list_reduce(list_transform(range(1, ${win + 1}),
       |      i -> (CAST(ord(substr(text, CAST(w * $win + i AS INTEGER), 1)) AS BIGINT) - 96)
       |         * (CAST(ord(substr(text, CAST(w * $win + i AS INTEGER), 1)) AS BIGINT) - 96)),
       |      (a, b) -> a + b) AS energy
       |  FROM (SELECT doc_id, text, n_win, unnest(range(n_win)) AS w FROM d)),
       |tot AS (SELECT doc_id, sum(energy) AS total FROM wn GROUP BY 1),
       |act AS (SELECT wn.doc_id, win_idx, energy,
       |          row_number() OVER (PARTITION BY wn.doc_id ORDER BY win_idx) AS rn
       |        FROM wn JOIN tot ON wn.doc_id = tot.doc_id
       |        WHERE energy * n_win > total),
       |seg AS (SELECT doc_id, win_idx - rn AS grp, min(win_idx) AS seg_start,
       |          max(win_idx) AS seg_end, count(*) AS n_wins,
       |          CAST(sum(energy) AS BIGINT) AS seg_energy
       |        FROM act GROUP BY 1, 2)
       |SELECT doc_id, seg_start, seg_end, n_wins, seg_energy
       |FROM seg WHERE n_wins >= $minWins
       |ORDER BY doc_id, seg_start""".stripMargin

  val declared: Seq[Declared] = Seq(
    Declared(
      "q207_energy_segments",
      (s, dir) => energySegments(Tables.load(s, dir, "documents")),
      Some(energySegmentsOracle(win = 64, minWins = 2)),
      doc = "Audio-shaped VAD segmentation: 64-byte windowed energy, per-doc adaptive threshold (integer-exact), island merge with min-duration - the ASR silence-trim/segment-extraction pipeline with the PCM decode stubbed"),

    Declared(
      "q185_phash_neardup",
      (s, dir) => phashPairs(asMedia(Tables.load(s, dir, "documents"))),
      Some(phashOracle(3)),
      doc = "Perceptual-hash near-dup pairs over binary payloads: blockhash fingerprint (row-local typed decode tier), 4x15-bit chunk banding, bit_count verify - the image near-dup pipeline with the decode stubbed"),

    Declared(
      "q115_cdc_chunks",
      (s, dir) => chunkSharing(cdcChunks(asMedia(Tables.load(s, dir, "documents")))),
      Some(cdcOracle),
      doc = "Content-defined chunking dedup stats - the per-byte rolling-hash mapPartitions tier, replayed exactly in the oracle (position-local window hash with mod-2^64 literals, recursive-CTE cut chain)"),

    Declared(
      "q31_media_meta",
      (s, dir) => decodeMeta(asMedia(Tables.load(s, dir, "documents")))
        .toDF().orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  CAST(64 + strlen(text) % 128 AS INTEGER) AS width,
        |  CAST(64 + (strlen(text) * 31) % 128 AS INTEGER) AS height,
        |  round(CAST(list_reduce(list_transform(range(length(text)),
        |      i -> CAST(ord(substr(text, CAST(i + 1 AS INTEGER), 1)) AS BIGINT)),
        |      (a, b) -> a + b) AS DOUBLE) / strlen(text), 4) AS mean_px
        |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Binary payload metadata via partition-wise typed decode (stubbed)"),

    Declared(
      "q32_media_chunks",
      (s, dir) => chunked(asMedia(Tables.load(s, dir, "documents")))
        .toDF().orderBy(col("doc_id"), col("chunk_idx")),
      Some("""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(length(substr(text, CAST(i * 256 + 1 AS INTEGER), 256)) AS INTEGER) AS chunk_len
        |FROM (SELECT doc_id, text,
        |        unnest(range(CAST(ceil(strlen(text) / 256.0) AS BIGINT))) AS i
        |      FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin),
      doc = "Fixed-size binary chunking (frame-sample plumbing)"),

    Declared(
      "q200_frame_sample",
      (s, dir) => frameSample(asMedia(Tables.load(s, dir, "documents"))),
      Some(frameSampleOracle(frameLen = 64, bits = 16, stride = 4, minHamming = 6)),
      doc = "Temporal frame sampling with scene-change detection: every 4th frame plus frames whose 16-bit blockhash moves >=6 bits vs the previous frame (VLM frame-extraction pipeline, decode stubbed)")
  )
}
