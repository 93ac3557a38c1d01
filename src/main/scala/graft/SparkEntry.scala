package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All declared queries live in [[Registry]]; this object is just the
  * wiring the driver harness calls. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Brute-force exact KNN over embeddings — scan → broadcast join →
    * codegen'd distance fold → TopKByWeight partial aggregation
    * (SURVEY.md §7 step 4). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("knn_bruteforce").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. ListMap:
    * iteration preserves Registry order, so (a) per-query bench
    * timings are comparable across rounds (a hash-ordered Map
    * reshuffled execution whenever a query was added), and (b) shared
    * Materialized tables are paid by the query family that declares
    * them, not an arbitrary hash neighbor. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      Registry.all.map(d => d.name -> d.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for seeded/approximate ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
