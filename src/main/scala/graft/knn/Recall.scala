package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-vs-graph recall — rebuilds `getrecall.py:14-35`:
  * |KNN ∩ approx| / (k·N) via an id join + array intersection. */
object Recall {

  /** Both inputs in adjacency shape (id, nbrs: array). k is taken from
    * the truth graph's list length per row (reference infers it from
    * the first line, `getrecall.py:28`; per-row is strictly safer).
    *
    * LEFT join from truth: a node absent from the approx graph
    * contributes 0 matches but keeps its k edges in the denominator —
    * an inner join would silently drop it from both, scoring a graph
    * that lost nodes as if it were complete (the reference's
    * denominator is k·count(truth) unconditionally, getrecall.py:30). */
  def recall(truth: DataFrame, approx: DataFrame): DataFrame = {
    truth.alias("t")
      .join(approx.alias("a"), col("t.id") === col("a.id"), "left_outer")
      .select(
        coalesce(size(array_intersect(col("t.nbrs"), col("a.nbrs"))), lit(0))
          .cast("long").as("matched"),
        size(col("t.nbrs")).cast("long").as("k"))
      .agg((sum(col("matched")).cast("double") / sum(col("k")).cast("double")).as("recall"))
  }
}
