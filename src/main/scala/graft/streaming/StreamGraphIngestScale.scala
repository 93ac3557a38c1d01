package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.knn.{GraphIndexStore, GraphSearch}

/** Scale measurement for STREAMED graph-index ingest (round-13 verdict
  * #3 / SCALING `round14_stream_graph_ingest`): the q230 shape at the
  * high-rate grain — a 200k-vector persisted index (MRDF-built graph,
  * sampled-router default) ingesting successive arrival waves through
  * a REAL streaming query whose `foreachBatch` applies
  * [[GraphIndexStore.ingestBatchApprox]]: every arriving vector enters
  * through the index's STORED router (no corpus rescan), the adjacency
  * is patched beam-bounded, and the fingerprint chains per batch.
  * Reported per batch: wall, per-insert ms; at the end: base-query and
  * all-query recall@10 vs the exact top-k truth over the grown corpus
  * — the decayed-quality number the compaction policy reads.
  *
  * Usage: `runMain graft.streaming.StreamGraphIngestScale
  * [nBase] [deltaPct] [waves]` */
object StreamGraphIngestScale {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 200000L
    val deltaPct = if (args.length > 1) args(1).toInt else 2
    val waves = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("StreamGraphIngestScale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val deltaN = nBase * deltaPct / 100
    val nTotal = nBase + waves * deltaN
    val path = s"/root/repo/target/scaling/mix${nTotal / 1000}k_seed42.fvecs"
    val f = new java.io.File(path)
    if (!f.exists() || f.length() != nTotal * (4L + 4L * 64)) {
      Option(f.getParentFile).foreach(_.mkdirs())
      graft.io.FvecsGen.write(path, nTotal, 64, 42L, 1000)
    }
    val vecs = graft.io.Fvecs.readAuto(spark, path)
      .toDF("vec_id", "embedding").localCheckpoint()
    val base = vecs.filter(col("vec_id") < nBase).localCheckpoint()

    val t0 = System.nanoTime()
    val edges = graft.mrdf.Mrdf.buildGraph(base,
      graft.mrdf.Mrdf.Params(alpha = 12000)).localCheckpoint()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sgi-scale-").toString
    val t1 = System.nanoTime()
    GraphIndexStore.write(base, edges, dir, k = 10, nlist = 1024,
      kmeansIters = 3, seedsPerList = 8)
    val writeSec = (System.nanoTime() - t1) / 1e9
    graft.Checkpoints.release(edges)
    println(f"[stream-graph-ingest] base=$nBase buildSec=$buildSec%.1f " +
      f"indexWriteSec=$writeSec%.1f")

    // arrival waves as single-file replay batches (the q230 source
    // shape at scale), one micro-batch each
    val src = StreamingPipelines.tempDirCleanedOnExit("graft-sgi-scale-src")
    (1 to waves).foreach { w =>
      val lo = nBase + (w - 1) * deltaN
      val hi = nBase + w * deltaN
      StreamingPipelines.writeReplayBatch(
        vecs.filter(col("vec_id") >= lo && col("vec_id") < hi), src, w)
    }
    val ckpt = StreamingPipelines.tempDirCleanedOnExit("graft-sgi-scale-ck")
    val batchWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val arrivals = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val apply: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, id) =>
      if (!b.isEmpty) {
        val t = System.nanoTime()
        GraphIndexStore.ingestBatchApprox(b.sparkSession, dir, b)
        val sec = (System.nanoTime() - t) / 1e9
        batchWalls += sec
        println(f"[stream-graph-ingest] batch=$id rows=$deltaN " +
          f"ingestSec=$sec%.1f perInsertMs=${sec * 1000.0 / deltaN}%.2f")
      }
    val tS = System.nanoTime()
    val q = arrivals.writeStream
      .foreachBatch(apply)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(3600000)
    require(finished, "streamed ingest did not finish within the budget")
    val streamSec = (System.nanoTime() - tS) / 1e9
    require(batchWalls.size == waves,
      s"expected $waves ingest batches, got ${batchWalls.size}")
    require(GraphIndexStore.isFreshFor(spark, dir, vecs),
      "the batch-chained fingerprint must validate the grown corpus")

    val step = math.max(1L, nBase / 256L)
    val patched = spark.read.parquet(s"$dir/edges").localCheckpoint()
    def recallOf(qs: org.apache.spark.sql.DataFrame): Double = {
      val got = patched.join(qs.select(col("vec_id").as("id")), Seq("id"),
          "left_semi")
        .select(col("id"), col("nbr")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = org.apache.spark.sql.graft.TopKJoin.knn(qs, vecs, 10)
        .select(col("id"), col("nbr")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      truth.count(got.contains).toDouble / truth.length
    }
    val bRec = recallOf(base.filter(col("vec_id") % step === 0))
    val aRec = recallOf(vecs.filter(col("vec_id") % step === 0))
    println(f"[stream-graph-ingest] total: waves=$waves deltaRows=$deltaN " +
      f"streamSec=$streamSec%.1f " +
      f"perBatch=[${batchWalls.map(w => f"$w%.1f").mkString(",")}] " +
      f"baseRecall=$bRec%.4f allRecall=$aRec%.4f")
    GraphIndexStore.deleteIndexDir(dir)
    spark.stop()
  }
}
