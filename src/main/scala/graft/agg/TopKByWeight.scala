package graft.agg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions.{col, row_number}

/** One weighted edge candidate (neighbor id, weight). */
final case class WEdge(nbr: Long, w: Double)

/** Buffer/output wrapper so the product encoder handles the Seq. */
final case class EdgeList(edges: Seq[WEdge])

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
final class TopKByWeight(k: Int) extends Aggregator[WEdge, EdgeList, EdgeList] {

  private def insert(sorted: Seq[WEdge], e: WEdge): Seq[WEdge] = {
    val existing = sorted.indexWhere(_.nbr == e.nbr)
    val base =
      if (existing < 0) sorted
      else if (sorted(existing).w <= e.w) return sorted
      else sorted.patch(existing, Nil, 1)
    if (base.length >= k) {
      val last = base.last
      if (e.w > last.w || (e.w == last.w && e.nbr >= last.nbr)) return base
    }
    val i = base.indexWhere(x => x.w > e.w || (x.w == e.w && x.nbr > e.nbr))
    val inserted = if (i < 0) base :+ e else base.patch(i, Seq(e), 0)
    if (inserted.length > k) inserted.dropRight(inserted.length - k) else inserted
  }

  override def zero: EdgeList = EdgeList(Vector.empty)
  override def reduce(b: EdgeList, a: WEdge): EdgeList = EdgeList(insert(b.edges, a))
  override def merge(x: EdgeList, y: EdgeList): EdgeList =
    EdgeList(y.edges.foldLeft(x.edges)(insert))
  override def finish(r: EdgeList): EdgeList = r
  override def bufferEncoder: Encoder[EdgeList] = Encoders.product[EdgeList]
  override def outputEncoder: Encoder[EdgeList] = Encoders.product[EdgeList]
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
