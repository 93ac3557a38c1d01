package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column front-ends over Catalyst's sketch-probe expressions.
  *
  * [[mightContainLong]] turns a driver-built [[BloomFilter]] into a
  * codegen'd probe: the serialized bitset rides the plan as a binary
  * Literal (exactly how Spark's own injected runtime bloom filters
  * materialize — a scalar-subquery result folded to a constant) and the
  * per-row test is `BloomFilterMightContain`, a native Predicate with
  * `doGenCode`, so the probe stays inside whole-stage codegen instead
  * of dropping to a Scala UDF call per row. Spark caches the
  * deserialized filter per-expression-instance, so the cost per task is
  * one deserialize, then primitive `mightContainLong` calls.
  */
object SketchExpressions {

  /** `bf.mightContainLong(value)` as a codegen-friendly Column.
    * `value` must be integral (the probe is on the long value itself,
    * matching `DataFrameStatFunctions.bloomFilter`'s putLong inserts).
    */
  def mightContainLong(bf: BloomFilter, value: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expression(value)))
  }
}
