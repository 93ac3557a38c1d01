package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Drives the reference-compatible CLI end-to-end: fvecs in →
  * MRDF + brute-force text graphs out → recall scored between them —
  * the reference's own validation workflow (README.md:52-58). */
class CliSpec extends SparkSpec {

  test("main.py-compatible workflow: fvecs → graphs → recall ≥ 0.9") {
    val base = Files.createTempDirectory("graft-cli").toString
    // fixture fvecs from the first 200 testdata embeddings
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .orderBy(col("vec_id")).limit(200)
      .collect().map(_.getSeq[Float](1).toArray)
    io.Fvecs.writeFvecsFile(s"$base/in.fvecs", vecs.toSeq)

    Main.run(spark, Array(
      "--inputfile", s"$base/in.fvecs", "--outputfile", s"$base/knn",
      "--k", "10", "--bruteforce", "true"))
    Main.run(spark, Array(
      "--inputfile", s"$base/in.fvecs", "--outputfile", s"$base/mrdf",
      "--k", "10", "--rho", "4", "--alpha", "100", "--tau", "0.01",
      "--randomseed", "42", "--maxiterations", "10"))
    val recall = GetRecall.run(spark,
      Array("--knn", s"$base/knn", "--mrdf", s"$base/mrdf"))
    info(s"CLI recall = $recall")
    assert(recall >= 0.9, s"recall $recall")

    // output format is the reference's: "(id, [n1, n2, ...])"
    val firstLine = spark.read.text(s"$base/knn")
      .orderBy(col("value")).limit(1).collect()(0).getString(0)
    assert(firstLine.matches("""\(\d+, \[\d+(, \d+)*\]\)"""), firstLine)

    // getrecallivecs completion: ivecs ground truth vs the mrdf graph
    val truthAdj = io.GraphText.read(spark, s"$base/knn")
      .orderBy(col("id")).collect()
      .map(r => r.getSeq[Long](1).map(_.toInt).toArray)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/gt.ivecs"),
      io.Fvecs.encodeIvecs(truthAdj.toSeq))
    val r2 = GetRecallIvecs.run(spark,
      Array("--groundtruth", s"$base/gt.ivecs", "--graph", s"$base/mrdf"))
    assert(math.abs(r2 - recall) < 1e-9,
      s"ivecs-scored recall $r2 must equal text-scored $recall")
  }
}
