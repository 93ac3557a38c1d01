package graft.knn

import org.apache.spark.sql.functions._

import graft.{Declared, DuckSql, Tables}

/** Declared oracle queries for the KNN surface (SURVEY.md §2.9). */
object KnnQueries {

  private val K = 10

  /** DuckDB mirror of BruteForceKnn.knnGraph on `embeddings`. */
  private val knnOracle: String = {
    val d = DuckSql.euclidean("a.embedding", "b.embedding")
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS id, b.vec_id AS nbr, round($d, 6) AS dist
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT id, nbr, dist,
       |         row_number() OVER (PARTITION BY id ORDER BY dist, nbr) AS rn
       |  FROM pairs
       |)
       |SELECT id, nbr, dist FROM ranked WHERE rn <= $K
       |ORDER BY id, dist, nbr""".stripMargin
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "knn_bruteforce",
      (s, dir) => BruteForceKnn
        .knnGraph(Tables.load(s, dir, "embeddings"), K)
        .orderBy(col("id"), col("dist"), col("nbr")),
      Some(knnOracle),
      doc = "Exact k-NN edge table over embeddings (flagship; knn.py:4-26)"),

    Declared(
      "knn_adjacency",
      (s, dir) => BruteForceKnn
        .asAdjacency(BruteForceKnn.knnGraph(Tables.load(s, dir, "embeddings"), K))
        .orderBy(col("id")),
      Some {
        val d = DuckSql.euclidean("a.embedding", "b.embedding")
        s"""WITH pairs AS (
           |  SELECT a.vec_id AS id, b.vec_id AS nbr, round($d, 6) AS dist
           |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
           |), ranked AS (
           |  SELECT id, nbr, dist,
           |         row_number() OVER (PARTITION BY id ORDER BY dist, nbr) AS rn
           |  FROM pairs
           |)
           |SELECT id, list(nbr ORDER BY dist, nbr) AS nbrs
           |FROM ranked WHERE rn <= $K GROUP BY id ORDER BY id""".stripMargin
      },
      doc = "G2 adjacency output (id, [nbr...]) — mrdf.py:199-215")
  )
}
