package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}
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

  /** Raw-bitset membership probe: bit `pos` of a plan-literal byte
    * array (bit b lives at byte b>>3, intra-byte position b&7). Unlike
    * [[mightContainLong]] — whose hash family is Spark's own and hence
    * JVM-only — this expression carries NO hashing: the caller derives
    * positions from any portable hash (the md5 idiom) and an oracle
    * engine can replay the exact same bitset semantics, false
    * positives included. Out-of-range positions probe to false. */
  def bitsetContains(bits: Array[Byte], pos: Column): Column =
    ColumnBridge.column(BitsetContains(
      Literal(bits, BinaryType), ColumnBridge.expression(pos)))
}

/** Codegen predicate `(bits[pos >> 3] >> (pos & 7)) & 1 == 1` over a
  * binary bitset (normally a folded Literal riding the plan, exactly
  * how Spark's injected runtime bloom filters materialize). */
case class BitsetContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitset_contains"

  override def nullSafeEval(bitsAny: Any, posAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[Array[Byte]]
    val pos = posAny.asInstanceOf[Long]
    pos >= 0L && pos < bits.length.toLong * 8L &&
      ((bits((pos >> 3).toInt) >> (pos & 7L).toInt) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, pos) => {
      s"""
         |${ev.value} = $pos >= 0L && $pos < ((long) $bits.length) * 8L
         |  && (($bits[(int) ($pos >> 3)] >> (int) ($pos & 7L)) & 1) == 1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetContains =
    copy(left = newLeft, right = newRight)
}
