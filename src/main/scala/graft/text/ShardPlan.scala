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

  /** Deterministic epoch shuffle — the data-loader permutation step:
    * each training epoch must visit every document exactly once in a
    * pseudo-random order that is REPRODUCIBLE (restarts mid-epoch must
    * not reshuffle) and DIFFERENT across epochs. Order key =
    * md5(epoch:doc_id) — the repo's portable-hash idiom, identical
    * bytes in any engine.
    *
    * The global position is computed WITHOUT a global sort: the md5's
    * first byte buckets each doc into 256 ranges that partition the
    * key space ORDER-COMPATIBLY (bucket is a prefix of the sort key);
    * per-(epoch, bucket) counts give each bucket its cumulative offset
    * (a ≤ 512-row window), and the within-bucket row_number windows BY
    * BUCKET — hash-partitioned, ~N/256 rows per partition at any
    * corpus size. pos = offset + within is the exact global rank: the
    * q141 value-grain idiom with a hash prefix standing in for the
    * value grain. */
  def epochShuffle(docs: DataFrame, epochs: Int = 2): DataFrame = {
    val keyed = docs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("k",
        md5(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("b", conv(substring(col("k"), 1, 2), 16, 10).cast("long"))
    val offW = Window.partitionBy(col("epoch")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("epoch"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .select(col("epoch"), col("b"), col("offset"))
    val within = Window.partitionBy(col("epoch"), col("b"))
      .orderBy(col("k"), col("doc_id"))
    keyed
      .withColumn("within", row_number().over(within))
      .join(broadcast(offsets), Seq("epoch", "b"))
      .select(col("epoch"), col("doc_id"),
        (col("offset") + col("within")).as("pos"))
      .orderBy(col("epoch"), col("pos"))
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
      doc = "Token-balanced training shards via value-grain global rank (no global data sort)"),

    Declared(
      "q159_epoch_shuffle",
      (s, dir) => epochShuffle(Tables.load(s, dir, "documents")),
      // row_number over the FULL key order per epoch is the oracle's
      // (serial) form of the bucket-offset rank — equal by key-prefix
      // order compatibility.
      Some("""WITH keyed AS (
        |  SELECT CAST(e.epoch AS INT) AS epoch, d.doc_id,
        |         md5(CAST(e.epoch AS VARCHAR) || ':' ||
        |             CAST(d.doc_id AS VARCHAR)) AS k
        |  FROM documents d,
        |       (SELECT unnest(range(0, 2)) AS epoch) e)
        |SELECT epoch, doc_id,
        |  row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
        |FROM keyed ORDER BY epoch, pos""".stripMargin),
      doc = "Deterministic per-epoch training shuffle: portable-md5 order, global rank via bucket offsets (no global sort)")
  )
}
