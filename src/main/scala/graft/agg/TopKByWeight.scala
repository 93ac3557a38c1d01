package graft.agg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions.{col, lit, row_number}

/** One weighted edge candidate (neighbor id, weight). */
final case class WEdge(nbr: Long, w: Double)

/** Output wrapper so the product encoder handles the Seq. */
final case class EdgeList(edges: Seq[WEdge])

/** Mutable top-k buffer: parallel primitive arrays kept sorted by
  * (w, nbr), `n` live entries. A case class of encodable fields so the
  * product encoder can ship partial buffers across the shuffle, but
  * mutated in place on the hot path — the aggregator's reduce runs
  * once per candidate edge (the N² pair stream in brute-force KNN), so
  * per-row immutable-Vector copies dominate the whole aggregation. */
final case class TopKBuf(nbrs: Array[Long], ws: Array[Double], var n: Int)

/** Typed k-min merge Aggregator — the per-key top-k of the reference's
  * `graph_update` reduceByKey (`mrdf.py:166-170`) and `nn_update_heap`
  * (`nndescent.py:174-192`), rebuilt as a Catalyst-aggregable unit.
  *
  * Unlike a window top-k (full shuffle, then sort), an Aggregator gets
  * partial/final aggregation for free: each map task pre-merges its
  * edges down to ≤ k per id before the shuffle — at 100 TB that is the
  * difference between shuffling all candidate edges and shuffling k per
  * key. Dedupes by neighbor id (keeping the smaller weight) and orders
  * by (w, nbr) — the reference's deterministic tie-break (mrdf.py:169).
  *
  * Merge law (ScalaCheck-verified): topK(a ++ b) == topK(topK(a) ++
  * topK(b)) — the property the reference's reduceByKey relies on.
  */
final class TopKByWeight(k: Int) extends Aggregator[WEdge, TopKBuf, EdgeList] {

  /** In-place sorted insert with nbr-dedup (keep smaller w). O(k) scan
    * + arraycopy, zero allocation on the reject path (the common case
    * once the buffer is full of closer neighbors). */
  private def insert(b: TopKBuf, nbr: Long, w: Double): TopKBuf = {
    val nbrs = b.nbrs
    val ws = b.ws
    // existing entry for this neighbor: keep the smaller weight
    var e = 0
    while (e < b.n && nbrs(e) != nbr) e += 1
    if (e < b.n) {
      if (ws(e) <= w) return b
      // remove the worse duplicate, then fall through to re-insert
      System.arraycopy(nbrs, e + 1, nbrs, e, b.n - e - 1)
      System.arraycopy(ws, e + 1, ws, e, b.n - e - 1)
      b.n -= 1
    } else if (b.n >= k) {
      val lw = ws(b.n - 1)
      if (w > lw || (w == lw && nbr >= nbrs(b.n - 1))) return b
    }
    // insertion point under the (w, nbr) order
    var i = 0
    while (i < b.n && (ws(i) < w || (ws(i) == w && nbrs(i) < nbr))) i += 1
    val newN = math.min(b.n + 1, k)
    System.arraycopy(nbrs, i, nbrs, i + 1, newN - i - 1)
    System.arraycopy(ws, i, ws, i + 1, newN - i - 1)
    nbrs(i) = nbr
    ws(i) = w
    b.n = newN
    b
  }

  override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Double](k), 0)
  override def reduce(b: TopKBuf, a: WEdge): TopKBuf = insert(b, a.nbr, a.w)
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var i = 0
    var b = x
    while (i < y.n) { b = insert(b, y.nbrs(i), y.ws(i)); i += 1 }
    b
  }
  override def finish(r: TopKBuf): EdgeList =
    EdgeList((0 until r.n).map(i => WEdge(r.nbrs(i), r.ws(i))))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[EdgeList] = Encoders.product[EdgeList]
}

/** One weighted edge candidate with provenance: `old` marks an edge
  * already present in the running graph (vs freshly proposed this
  * round). */
final case class TaggedEdge(nbr: Long, w: Double, old: Boolean)

/** [[TopKBuf]] plus the set of neighbor ids seen with the old tag.
  * `oldNbrs` is independent of the top-k entries: an old edge evicted
  * by the k-limit must still mark its neighbor as previously-known, or
  * the provenance would depend on arrival order. The old graph holds
  * ≤ k edges per id, so the set is bounded by k (the array still grows
  * defensively if a caller feeds more). */
final case class TaggedTopKBuf(nbrs: Array[Long], ws: Array[Double],
                               var n: Int,
                               var oldNbrs: Array[Long], var on: Int)

/** Edge-list output with per-edge provenance. */
final case class TaggedEdgeList(edges: Seq[TaggedEdge])

/** [[TopKByWeight]] with a provenance bit per output edge: `old` is
  * true iff that (id, nbr) appeared among the old-tagged inputs at
  * all — exactly the membership test a `left_anti` join against the
  * previous graph would compute. This fuses the MRDF convergence
  * Δ-count into the merge itself — `changed = count of !old` over the
  * merged table — replacing a per-round anti-join of the merged graph
  * against the previous one (two |E|-sized shuffles per iteration at
  * cluster scale) with a column scan of the already-checkpointed merge
  * output. Same (w, nbr) order and smaller-weight dedup as the
  * untagged aggregator; the property spec asserts edge-set equality
  * with [[TopKByWeight]], the membership semantics of the tag, and the
  * merge law under random splits. */
final class TaggedTopKByWeight(k: Int)
    extends Aggregator[TaggedEdge, TaggedTopKBuf, TaggedEdgeList] {

  private val inner = new TopKByWeight(k)

  private def addOld(b: TaggedTopKBuf, nbr: Long): Unit = {
    var i = 0
    while (i < b.on && b.oldNbrs(i) != nbr) i += 1
    if (i == b.on) {
      if (b.on == b.oldNbrs.length) {
        val g = new Array[Long](b.oldNbrs.length * 2 + 1)
        System.arraycopy(b.oldNbrs, 0, g, 0, b.on)
        b.oldNbrs = g
      }
      b.oldNbrs(b.on) = nbr
      b.on += 1
    }
  }

  private def asTopK(b: TaggedTopKBuf): TopKBuf = TopKBuf(b.nbrs, b.ws, b.n)

  override def zero: TaggedTopKBuf =
    TaggedTopKBuf(new Array[Long](k), new Array[Double](k), 0, new Array[Long](k), 0)
  override def reduce(b: TaggedTopKBuf, a: TaggedEdge): TaggedTopKBuf = {
    if (a.old) addOld(b, a.nbr)
    b.n = inner.reduce(asTopK(b), WEdge(a.nbr, a.w)).n
    b
  }
  override def merge(x: TaggedTopKBuf, y: TaggedTopKBuf): TaggedTopKBuf = {
    var i = 0
    while (i < y.on) { addOld(x, y.oldNbrs(i)); i += 1 }
    x.n = inner.merge(asTopK(x), asTopK(y)).n
    x
  }
  override def finish(r: TaggedTopKBuf): TaggedEdgeList = {
    val oldSet = (0 until r.on).map(r.oldNbrs).toSet
    TaggedEdgeList((0 until r.n).map(i =>
      TaggedEdge(r.nbrs(i), r.ws(i), oldSet(r.nbrs(i)))))
  }
  override def bufferEncoder: Encoder[TaggedTopKBuf] = Encoders.product[TaggedTopKBuf]
  override def outputEncoder: Encoder[TaggedEdgeList] = Encoders.product[TaggedEdgeList]
}

object TopKByWeight {

  /** Per-id k-min over an `(id, nbr, dist)` edge table — the shared
    * reduction of brute-force KNN and the MRDF graph merge. Shuffles
    * ≤ k edges per id (map-side partial aggregation), where a window
    * top-k would shuffle and sort every candidate edge. */
  def perId(edges: DataFrame, k: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("id"), col("nbr"), col("dist")).as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => WEdge(t._2, t._3))
      .agg(new TopKByWeight(k).toColumn.name("top"))
      .flatMap { case (id, el) => el.edges.map(e => (id, e.nbr, e.w)) }
      .toDF("id", "nbr", "dist")
  }

  /** Per-id k-min over an old ∪ fresh edge union, with per-edge
    * provenance: output columns (id, nbr, dist, is_old) where `is_old`
    * is true iff that (id, nbr) existed in `old`. The MRDF merge uses
    * this to read its convergence Δ (count of !is_old) off the merged
    * table directly instead of re-joining it against the previous
    * graph. */
  def perIdTagged(old: DataFrame, fresh: DataFrame, k: Int): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val tagged = old.select(col("id"), col("nbr"), col("dist"), lit(true).as("old"))
      .unionByName(fresh.select(col("id"), col("nbr"), col("dist"), lit(false).as("old")))
    tagged.as[(Long, Long, Double, Boolean)]
      .groupByKey(_._1)
      .mapValues(t => TaggedEdge(t._2, t._3, t._4))
      .agg(new TaggedTopKByWeight(k).toColumn.name("top"))
      .flatMap { case (id, el) => el.edges.map(e => (id, e.nbr, e.w, e.old)) }
      .toDF("id", "nbr", "dist", "is_old")
  }

  /** Per-qid top-k by similarity DESC (ties by nbr asc), with a 1-based
    * rank — the ranked-list output shape of the similarity family.
    * Weight = −sim maps (sim desc, nbr) onto the aggregator's (w, nbr)
    * order; double negation is sign-flip-exact, so values round-trip
    * bit-identically. The rank window runs over the already-reduced
    * ≤ k rows per qid, not the candidate stream. */
  def topKBySimilarity(cands: DataFrame, k: Int): DataFrame = {
    val top = perId(
      cands.select(col("qid").as("id"), col("nbr"), (-col("sim")).as("dist")), k)
    val w = Window.partitionBy(col("id")).orderBy(col("dist"), col("nbr"))
    top.withColumn("rn", row_number().over(w))
      .select(col("id").as("qid"), col("nbr"), (-col("dist")).as("sim"), col("rn"))
  }
}
