package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  private def runOnce(srcDir: String, stateDir: String, ckpt: String): Unit = {
    val q = StreamingPipelines.upsertStreamSink(
        StreamingPipelines.readEventsStream(spark, srcDir), stateDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
  }

  test("streamed snapshot equals the batch last-write-wins compaction") {
    val base = Files.createTempDirectory("upsert").toString
    val src = s"$base/src"; val state = s"$base/state"; val ck = s"$base/ck"
    val ev = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 5.0),
      (2L, "2024-01-01 11:00:00", 1L, "click", 7.0),   // winner for user 1
      (3L, "2024-01-01 10:30:00", 2L, "view", 0.05),   // tombstone, then...
      (4L, "2024-01-01 12:00:00", 2L, "view", 3.0),    // ...revived later
      (5L, "2024-01-01 09:00:00", 3L, "view", 1.0),
      (6L, "2024-01-01 13:00:00", 3L, "error", 0.01))) // user 3 deleted
    ev.write.parquet(src)
    runOnce(src, state, ck)
    val got = StreamingPipelines.upsertView(spark, state).get
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L))) // user 3 tombstoned out
  }

  test("restart continues from the snapshot; older update cannot revive a delete") {
    val base = Files.createTempDirectory("upsert").toString
    val src = s"$base/src"; val state = s"$base/state"; val ck = s"$base/ck"
    new java.io.File(src).mkdirs()
    // batch 1: a live row for user 7 and a LATE delete for user 8
    eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view", 9.0),
      (2L, "2024-01-01 18:00:00", 8L, "error", 0.0)))
      .write.parquet(s"$src/b1")
    runOnce(s"$src/*", state, ck)
    // batch 2 (separate run, same checkpoint): an OLDER update for user 8
    eventsDf(Seq((3L, "2024-01-01 12:00:00", 8L, "view", 4.0)))
      .write.parquet(s"$src/b2")
    runOnce(s"$src/*", state, ck)
    val view = StreamingPipelines.upsertView(spark, state).get
    assert(view.filter(col("user_id") === 8L).isEmpty,
      "an out-of-order update must not resurrect a deleted key")
    assert(view.filter(col("user_id") === 7L).count() == 1,
      "prior state must survive the restart")
  }
}
