package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.linalg.Distances

/** Exact k-nearest-neighbor graph — rebuilds the reference's
  * brute-force path (`knn.py:4-26`: broadcast dict + per-row scan)
  * as a Spark-first broadcast join + window top-k.
  *
  * Scale notes: the right side is broadcast (embeddings are the small
  * dimension table of this workload); the N×N pair stream never
  * materializes — it flows through whole-stage codegen into the
  * per-id top-k window. For N beyond ~10⁵ use [[graft.mrdf.Mrdf]]
  * (blocked approximate graph) — this operator is the exact oracle.
  */
object BruteForceKnn {

  /** Edge-table KNN graph: (id, nbr, dist), k nearest per id.
    *
    * Distances are rounded to 6 dp BEFORE ranking and ties broken by
    * neighbor id, so the selected set and order are identical across
    * engines (oracle determinism, SURVEY.md §7).
    *
    * The per-id selection is the [[graft.agg.TopKByWeight]] partial
    * aggregation, not a window top-k: each map task reduces its pair
    * stream to ≤ k edges per id before the shuffle, so the exchange
    * carries N·k edges instead of the N² pair stream — at scale that
    * is the whole ballgame.
    */
  def knnGraph(vecs: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vecs.select(col(idCol).as("id"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("nbr"), col(vecCol).as("vb"))
    graft.agg.TopKByWeight.perId(
      a.join(broadcast(b), col("id") =!= col("nbr"))
        .select(col("id"), col("nbr"),
          round(Distances.euclidean(col("va"), col("vb")), 6).as("dist")),
      k)
  }

  /** G2 adjacency output shape `(id, [nbr...])` — reference
    * `mrdf.py:199-215` (`format_g`). Input edges must already carry a
    * deterministic (dist, nbr) order; `sort_array` on (dist, nbr)
    * structs preserves it per row. */
  def asAdjacency(edges: DataFrame): DataFrame =
    edges
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("dist"), col("nbr")))).as("sorted"))
      .select(col("id"), transform(col("sorted"), s => s("nbr")).as("nbrs"))
}
