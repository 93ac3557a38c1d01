package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** Token-balanced output sharding — the layout step that turns a
  * curated corpus into S training shards of near-equal token budget
  * (downstream data loaders stream shards round-robin; a fat shard
  * straggles the epoch).
  *
  * Assignment is round-robin by GLOBAL size rank (largest docs deal
  * first), which bounds the per-shard spread by one max-document once
  * docs-per-shard ≫ 1 — but the global rank is computed WITHOUT a
  * global sort of the data: the corpus first collapses to
  * (n_chars, count) — one map-combinable agg, ≤ max-length rows at ANY
  * corpus size — giving each length its cumulative rank offset; the
  * within-length tiebreak is a row_number windowed BY LENGTH (hash-
  * partitioned, never a single-partition window). rank = offset +
  * within. This is the q71/q134 value-grain idiom applied to ranking.
  *
  * All-integer (ranks, modulo, char sums) ⇒ engine-exact. Output is S
  * rows at any corpus size. */
object ShardPlan {

  def balancedShards(docs: DataFrame, shards: Int = 8): DataFrame = {
    val byLen = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val offW = Window.orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ max-length rows: the window is over the aggregated table only
    val offsets = byLen
      .withColumn("offset", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .select(col("n_chars"), col("offset"))
    val within = Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .withColumn("within", row_number().over(within))
      .join(broadcast(offsets), Seq("n_chars"))
      .withColumn("shard",
        pmod(col("offset") + col("within") - 1, lit(shards.toLong)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("shard"))
  }

  /** Per-doc assignment (not declared; feeds a partitioned writer). */
  def shardAssignment(docs: DataFrame, shards: Int = 8): DataFrame = {
    val byLen = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val offW = Window.orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byLen
      .withColumn("offset", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .select(col("n_chars"), col("offset"))
    val within = Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .withColumn("within", row_number().over(within))
      .join(broadcast(offsets), Seq("n_chars"))
      .select(col("doc_id"),
        pmod(col("offset") + col("within") - 1, lit(shards.toLong))
          .cast("int").as("shard"))
  }

  val declared: Seq[Declared] = Seq(
    Declared(
      "q141_balanced_shards",
      (s, dir) => balancedShards(Tables.load(s, dir, "documents")),
      Some("""WITH ranked AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |SELECT CAST((rk - 1) % 8 AS INT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  min(doc_id) AS first_doc
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Token-balanced training shards via value-grain global rank (no global data sort)")
  )
}
