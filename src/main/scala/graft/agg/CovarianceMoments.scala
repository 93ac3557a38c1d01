package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One output cell of the upper-triangle covariance moment matrix. */
final case class CovCell(i: Int, j: Int, n: Long, sxy: Long, sx: Long, sy: Long)

/** Moment buffer: row count, per-dim micro sums, packed upper-triangle
  * pico product sums. Arrays are allocated lazily on the first row so
  * the aggregator needs no a-priori dimensionality. */
final case class CovBuf(n: Long, s: Array[Long], p: Array[Long])

/** Distributed second-moment accumulator for the embedding covariance
  * matrix (q94). Input rows are ALREADY micro-quantized Long vectors
  * (the Catalyst projection does the one per-element `round`, keeping
  * rounding semantics identical to the DuckDB oracle); from there this
  * is pure integer math — n, Σx_i, and the packed upper-triangle
  * Σx_i·x_j — so partial aggregation is an elementwise add and the
  * result is bit-identical on any partitioning.
  *
  * Scale: replaces the d² row-expansion (explode of ~d²·N structs
  * through a Generate and a d²-key shuffle) with O(d²) integer
  * multiply-adds per row in the partial-agg buffer: the shuffle
  * carries ONE ~(d²/2)-long buffer per map task, never N·d² rows.
  * Long headroom: |x|≤~10 ⇒ |x_u|≤1e7 ⇒ |x_u·y_u|≤1e14; overflow
  * needs Σ over ~9e4 billion rows per (i,j) — beyond that, shard the
  * input and merge buffers hierarchically (treeAggregate shape). */
final class CovarianceMoments
    extends Aggregator[Array[Long], CovBuf, Array[CovCell]] {

  override def zero: CovBuf = CovBuf(0L, null, null)

  private def alloc(d: Int): CovBuf =
    CovBuf(0L, new Array[Long](d), new Array[Long](d * (d + 1) / 2))

  override def reduce(b0: CovBuf, xu: Array[Long]): CovBuf = {
    val b = if (b0.s == null) alloc(xu.length) else b0
    val d = xu.length
    require(b.s.length == d, s"ragged embedding: ${b.s.length} vs $d")
    var i = 0
    var t = 0
    while (i < d) {
      val xi = xu(i)
      b.s(i) += xi
      var j = i
      while (j < d) {
        b.p(t) += xi * xu(j)
        t += 1
        j += 1
      }
      i += 1
    }
    CovBuf(b.n + 1, b.s, b.p)
  }

  override def merge(a: CovBuf, b: CovBuf): CovBuf =
    if (a.s == null) b
    else if (b.s == null) a
    else {
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      var t = 0
      while (t < a.p.length) { a.p(t) += b.p(t); t += 1 }
      CovBuf(a.n + b.n, a.s, a.p)
    }

  override def finish(b: CovBuf): Array[CovCell] =
    if (b.s == null) Array.empty
    else {
      val d = b.s.length
      val out = new Array[CovCell](d * (d + 1) / 2)
      var i = 0
      var t = 0
      while (i < d) {
        var j = i
        while (j < d) {
          out(t) = CovCell(i, j, b.n, b.p(t), b.s(i), b.s(j))
          t += 1
          j += 1
        }
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  override def outputEncoder: Encoder[Array[CovCell]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[CovCell]]()
}
