package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's text graph interchange format — one Python-tuple
  * line per node, sorted by id: `(id, [n1, n2, ...])`
  * (written `main.py:46` via `saveAsTextFile`, documented
  * `README.md:43-50`, parsed with `ast.literal_eval` at
  * `getrecall.py:25-26`).
  *
  * Kept as a distributed text sink/scan so graphs produced by the
  * reference can be scored by [[graft.knn.Recall]] and vice versa.
  * (Parquet is the preferred interchange at scale — this is the
  * compatibility path.)
  */
object GraphText {

  /** Adjacency (id, nbrs: array<long>) → formatted lines. */
  def format(adj: DataFrame): DataFrame =
    adj.orderBy(col("id"))
      .select(format_string("(%d, [%s])", col("id"),
        array_join(col("nbrs"), ", ")).as("value"))

  def write(adj: DataFrame, path: String): Unit =
    format(adj).write.mode("overwrite").text(path)

  /** Text lines → adjacency (id, nbrs). Empty neighbor lists parse to
    * an empty array (the reference can emit `(id, [])`). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  def parse(lines: DataFrame): DataFrame =
    lines
      .select(
        regexp_extract(col("value"), "^\\((\\d+),", 1).cast("long").as("id"),
        regexp_extract(col("value"), "\\[(.*)\\]", 1).as("body"))
      .select(col("id"),
        when(length(trim(col("body"))) === 0, array().cast("array<long>"))
          .otherwise(transform(split(col("body"), ",\\s*"), x => x.cast("long")))
          .as("nbrs"))
}
