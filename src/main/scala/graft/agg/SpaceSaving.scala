package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One reported heavy hitter: `est` OVERestimates the true count by at
  * most `err` (true ≤ est ≤ true + err). */
final case class SSItem(word: String, est: Long, err: Long)

/** Output wrapper so the product encoder handles the Seq. */
final case class SSOut(items: Seq[SSItem])

/** Space-saving summary: parallel arrays kept unordered, ≤ m live
  * entries. Arrays are encodable fields (partials ship across the
  * shuffle) but mutated in place on the hot path — `reduce` runs once
  * per token occurrence. */
final case class SSBuf(var words: Array[String], var counts: Array[Long],
                       var errs: Array[Long], var n: Int)

/** Space-saving heavy hitters (Metwally et al. ICDT'05) as a typed
  * mergeable Aggregator — the frequency-summary member of the sketch
  * family next to Count-Min (q74), HLL (q111) and Bloom (q70): m
  * counters track the heavy hitters of an unbounded vocabulary with
  * per-item guarantee true ≤ est ≤ true + err and err bounded by the
  * summary's minimum count (≤ N/m).
  *
  * Unlike the exact vocabulary count (q56's groupBy — one shuffle row
  * per DISTINCT WORD), the summary is a partial aggregation: each map
  * task reduces its token stream to ≤ m entries before the shuffle, so
  * a 100 TB corpus with a billion-word vocabulary ships m rows per
  * task instead of the vocabulary.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.
  * PODS'12): counters sum pointwise; a word absent from a FULL other
  * summary charges that summary's minimum count to both est and err
  * (its true count there cannot exceed the min, or it would be
  * present); the union then truncates to the m largest. Per-item
  * over/under guarantees survive both steps by construction.
  *
  * Determinism caveat (documented, spec-gated): the reported set — not
  * the guarantees — can depend on partitioning (eviction order is
  * data-order-sensitive). Ties evict the lexicographically LARGEST
  * minimum-count word, so any remaining variation comes from Spark's
  * partition layout only; the declared query is rows-only for the
  * driver, and the spec asserts the estimate/coverage laws that hold
  * under ANY layout. */
final class SpaceSaving(m: Int)
    extends Aggregator[String, SSBuf, SSOut] {

  override def zero: SSBuf =
    SSBuf(new Array[String](m), new Array[Long](m), new Array[Long](m), 0)

  /** Index of the eviction victim: minimum count, ties to the largest
    * word (deterministic given buffer content). */
  private def victim(b: SSBuf): Int = {
    var v = 0
    var i = 1
    while (i < b.n) {
      if (b.counts(i) < b.counts(v) ||
        (b.counts(i) == b.counts(v) && b.words(i) > b.words(v))) v = i
      i += 1
    }
    v
  }

  override def reduce(b: SSBuf, w: String): SSBuf = {
    var i = 0
    while (i < b.n && b.words(i) != w) i += 1
    if (i < b.n) b.counts(i) += 1
    else if (b.n < m) {
      b.words(b.n) = w; b.counts(b.n) = 1L; b.errs(b.n) = 0L; b.n += 1
    } else {
      val v = victim(b)
      val cMin = b.counts(v)
      b.words(v) = w; b.counts(v) = cMin + 1; b.errs(v) = cMin
    }
    b
  }

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    // a full summary's min count bounds the true count of any absent word
    def minOf(x: SSBuf): Long =
      if (x.n < m) 0L
      else { var mn = x.counts(0); var i = 1; while (i < x.n) { if (x.counts(i) < mn) mn = x.counts(i); i += 1 }; mn }
    val minA = minOf(a)
    val minB = minOf(b)
    val union = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < a.n) { union(a.words(i)) = (a.counts(i), a.errs(i)); i += 1 }
    i = 0
    while (i < b.n) {
      union.get(b.words(i)) match {
        case Some((c, e)) => union(b.words(i)) = (c + b.counts(i), e + b.errs(i))
        case None => union(b.words(i)) = (b.counts(i) + minA, b.errs(i) + minA)
      }
      i += 1
    }
    // words only in a missed b's stream: charge b's min
    var j = 0
    while (j < a.n) {
      if (!((0 until b.n).exists(k => b.words(k) == a.words(j)))) {
        val (c, e) = union(a.words(j))
        union(a.words(j)) = (c + minB, e + minB)
      }
      j += 1
    }
    val kept = union.toSeq
      .sortBy { case (w, (c, _)) => (-c, w) }
      .take(m)
    // Preserve the buffer invariant capacity == m: reduce() indexes up to
    // words(n) assuming room for m entries, so a truncated kept.size-length
    // array would AIOOBE if Spark ever fed reduce() a post-merge buffer.
    val words = new Array[String](m)
    val counts = new Array[Long](m)
    val errs = new Array[Long](m)
    var p = 0
    kept.foreach { case (w, (c, e)) =>
      words(p) = w; counts(p) = c; errs(p) = e; p += 1
    }
    SSBuf(words, counts, errs, kept.size)
  }

  override def finish(b: SSBuf): SSOut =
    SSOut((0 until b.n)
      .map(i => SSItem(b.words(i), b.counts(i), b.errs(i)))
      .sortBy(it => (-it.est, it.word)))

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[SSOut] = Encoders.product[SSOut]
}
