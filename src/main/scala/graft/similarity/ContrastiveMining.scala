package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, DuckSql, Tables}
import graft.linalg.Distances

/** Hard-negative mining for contrastive training: for every vector,
  * the k nearest vectors carrying a DIFFERENT label — the batch-mining
  * step of metric-learning / embedding-model training (the negatives
  * that sit closest to the anchor are the informative ones).
  *
  * Same scale shape as [[graft.knn.BruteForceKnn]]: broadcast the
  * vector table, stream the label-mismatched pair space through
  * whole-stage codegen into the [[graft.agg.TopKByWeight]] partial
  * aggregation — the shuffle carries ≤ N·k edges, never the N² pair
  * stream. For N beyond broadcast range the IVF/LSH bucketed variants
  * (q35/q36) are the candidate generators; this is the exact oracle.
  */
object ContrastiveMining {

  /** (id, nbr, dist): k nearest different-label neighbors per id.
    * Distances rounded to 6 dp BEFORE ranking, ties by nbr — the
    * engine-portable determinism convention of the knn family.
    *
    * Compositional form (broadcast NL pair stream → TopKByWeight);
    * kept as the row-for-row equivalence reference for the fused
    * [[org.apache.spark.sql.graft.TopKJoin.hardNegatives]] operator
    * that the declared query runs (the fused node never materializes
    * the label-mismatch pair stream — N·k rows total). */
  def hardNegatives(vecs: DataFrame, k: Int = 3): DataFrame = {
    val a = vecs.select(col("vec_id").as("id"), col("embedding").as("va"),
      col("label").as("la"))
    val b = vecs.select(col("vec_id").as("nbr"), col("embedding").as("vb"),
      col("label").as("lb"))
    graft.agg.TopKByWeight.perId(
      a.join(broadcast(b), col("la") =!= col("lb"))
        .select(col("id"), col("nbr"),
          round(Distances.euclidean(col("va"), col("vb")), 6).as("dist")),
      k)
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q153_hard_negatives",
      (s, dir) => org.apache.spark.sql.graft.TopKJoin
        .hardNegatives(Tables.load(s, dir, "embeddings"), k = 3)
        .orderBy(col("id"), col("dist"), col("nbr")),
      Some {
        val d = DuckSql.euclidean("a.embedding", "b.embedding")
        s"""WITH pairs AS (
           |  SELECT a.vec_id AS id, b.vec_id AS nbr, round($d, 6) AS dist
           |  FROM embeddings a JOIN embeddings b ON a.label <> b.label
           |), ranked AS (
           |  SELECT id, nbr, dist,
           |         row_number() OVER (PARTITION BY id ORDER BY dist, nbr) AS rn
           |  FROM pairs)
           |SELECT id, nbr, dist FROM ranked WHERE rn <= 3
           |ORDER BY id, dist, nbr""".stripMargin
      },
      doc = "Hard-negative mining: 3 nearest different-label vectors per anchor")
  )
}
