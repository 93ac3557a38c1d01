package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class Keyed(h: Long, id: Long)
final case class KeyedList(items: Seq[Keyed])
final case class IdList(ids: Seq[Long])

final case class KeyedVec(h: Long, id: Long, vec: Array[Float])
final case class KeyedVecList(items: Seq[KeyedVec], cnt: Long)

/** Deterministic n-sample per key — replaces the reference's reservoir
  * (`utilities.py:15-30`, buggy per SURVEY §3 B3: replacement index
  * drawn from the reservoir length, so not uniform).
  *
  * Instead of sequential Algorithm R (whose output depends on partition
  * visit order — nondeterministic on a cluster), this is a *bottom-n
  * sketch*: every item gets a pseudo-random rank `h = mix(seed, id)`
  * (splitmix64 finalizer — public-domain constant mixing, same family
  * Spark's xxhash uses) and the n smallest ranks win. Order-independent
  * ⇒ identical samples on any partitioning, mergeable map-side, and
  * uniform for distinct ids.
  */
final class ReservoirSample(n: Int, seed: Long)
    extends Aggregator[Long, KeyedList, IdList] {

  private def mix(id: Long): Long = {
    var z = id + seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def insert(sorted: Seq[Keyed], e: Keyed): Seq[Keyed] =
    BottomN.insert(n, sorted, e)

  override def zero: KeyedList = KeyedList(Vector.empty)
  override def reduce(b: KeyedList, id: Long): KeyedList =
    KeyedList(insert(b.items, Keyed(mix(id), id)))
  override def merge(x: KeyedList, y: KeyedList): KeyedList =
    KeyedList(y.items.foldLeft(x.items)(insert))
  override def finish(r: KeyedList): IdList = IdList(r.items.map(_.id))
  override def bufferEncoder: Encoder[KeyedList] = Encoders.product[KeyedList]
  override def outputEncoder: Encoder[IdList] = Encoders.product[IdList]
}

/** Shared bottom-n insert under the (h, id) order with id-dedup — the
  * single implementation behind [[ReservoirSample]] and
  * [[RankedSample]], so the seeded original and its portable twin
  * cannot drift in tie-break or dedup semantics. */
private[agg] object BottomN {
  def insert(n: Int, sorted: Seq[Keyed], e: Keyed): Seq[Keyed] = {
    if (sorted.exists(_.id == e.id)) return sorted
    if (sorted.length >= n) {
      val last = sorted.last
      if (e.h > last.h || (e.h == last.h && e.id >= last.id)) return sorted
    }
    val i = sorted.indexWhere(x => x.h > e.h || (x.h == e.h && x.id > e.id))
    val ins = if (i < 0) sorted :+ e else sorted.patch(i, Seq(e), 0)
    if (ins.length > n) ins.dropRight(ins.length - n) else ins
  }
}

/** [[ReservoirSample]] with the rank supplied by the CALLER instead of
  * the internal splitmix64 mix — the portable-twin form: the plan
  * computes an engine-portable rank (md5 prefix) so an external SQL
  * oracle can replay the identical sample, while the aggregation shape
  * (per-key bottom-n sketch, order-independent, map-side partial) stays
  * exactly [[ReservoirSample]]'s. */
final class RankedSample(n: Int) extends Aggregator[Keyed, KeyedList, IdList] {
  override def zero: KeyedList = KeyedList(Vector.empty)
  override def reduce(b: KeyedList, e: Keyed): KeyedList =
    KeyedList(BottomN.insert(n, b.items, e))
  override def merge(x: KeyedList, y: KeyedList): KeyedList =
    KeyedList(y.items.foldLeft(x.items)(BottomN.insert(n, _, _)))
  override def finish(r: KeyedList): IdList = IdList(r.items.map(_.id))
  override def bufferEncoder: Encoder[KeyedList] = Encoders.product[KeyedList]
  override def outputEncoder: Encoder[IdList] = Encoders.product[IdList]
}

/** [[ReservoirSample]] fused with a count: one pass per key yields
  * (group size, deterministic bottom-n of (rank, id) carrying each
  * winner's vector). The MRDF divide phase needs both per block —
  * fusing them makes each division level a single aggregation job
  * instead of a histogram job plus a sampling job.
  * Same splitmix64 ranking, same order-independence and merge law;
  * items stay sorted by (rank, id), so a position is a stable
  * per-key index. */
final class VecSample(n: Int, seed: Long)
    extends Aggregator[(Long, Array[Float]), KeyedVecList, KeyedVecList] {

  private def mix(id: Long): Long = {
    var z = id + seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def insert(sorted: Seq[KeyedVec], e: KeyedVec): Seq[KeyedVec] = {
    if (sorted.exists(_.id == e.id)) return sorted
    if (sorted.length >= n) {
      val last = sorted.last
      if (e.h > last.h || (e.h == last.h && e.id >= last.id)) return sorted
    }
    val i = sorted.indexWhere(x => x.h > e.h || (x.h == e.h && x.id > e.id))
    val ins = if (i < 0) sorted :+ e else sorted.patch(i, Seq(e), 0)
    if (ins.length > n) ins.dropRight(ins.length - n) else ins
  }

  override def zero: KeyedVecList = KeyedVecList(Vector.empty, 0L)
  override def reduce(b: KeyedVecList, r: (Long, Array[Float])): KeyedVecList =
    KeyedVecList(insert(b.items, KeyedVec(mix(r._1), r._1, r._2)), b.cnt + 1)
  override def merge(x: KeyedVecList, y: KeyedVecList): KeyedVecList =
    KeyedVecList(y.items.foldLeft(x.items)(insert), x.cnt + y.cnt)
  override def finish(r: KeyedVecList): KeyedVecList = r
  override def bufferEncoder: Encoder[KeyedVecList] = Encoders.product[KeyedVecList]
  override def outputEncoder: Encoder[KeyedVecList] = Encoders.product[KeyedVecList]
}
