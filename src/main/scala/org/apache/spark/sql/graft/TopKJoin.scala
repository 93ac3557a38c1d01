package org.apache.spark.sql.graft

import java.math.RoundingMode

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Fused top-k join — the whole-operator Catalyst extension tier
  * (SURVEY.md §4 named this exact operator as the one case where a
  * custom `SparkStrategy` becomes interesting): exact KNN against a
  * broadcastable side WITHOUT materializing the N·M pair stream.
  *
  * The compositional form (`BruteForceKnn.knnGraph`) is a broadcast
  * nested-loop join producing one row per (id, nbr) pair, followed by
  * the TopKByWeight partial aggregation — correct and scalable, but
  * every candidate pair exists as a row between the two operators.
  * This node fuses the loop and the heap: each probe row scans the
  * broadcast side and keeps its k best in a primitive-array buffer;
  * only N·k rows are ever produced. Same output contract as
  * `knnGraph` — distances rounded to 6 dp (identical `BigDecimal`
  * HALF_UP semantics to Spark's `round`), ties and self-pairs handled
  * identically — which the equivalence spec asserts row-for-row.
  *
  * Wiring: [[TopKJoinPlan]] (logical) is planned by
  * [[TopKJoinStrategy]] into [[TopKJoinExec]] (physical); the
  * strategy installs via `spark.experimental.extraStrategies` (the
  * public per-session injection point; `GraftExtensions` injects it
  * too for extension-built sessions).
  *
  * Scale shape: identical to the compositional form — the probe side
  * streams partition-local (never shuffled), the build side must fit
  * in one broadcast. For two huge sides, divide first (MRDF) — this
  * node is the per-block / oracle-baseline engine. */
case class TopKJoinPlan(left: LogicalPlan, right: LogicalPlan, k: Int,
    // output lives in the CONSTRUCTOR so tree copies (withNewChildren
    // during analysis/optimization) preserve the exprIds parents have
    // already bound to — a `val` would mint fresh ids on every copy
    override val output: Seq[Attribute] = TopKJoinPlan.freshOutput())
    extends BinaryNode {
  // this node PRODUCES its output (it is not projected from children) —
  // without this CheckAnalysis reports the attrs missing from input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // ...and it CONSUMES every child column by position inside doExecute,
  // invisibly to Catalyst: without declaring the references,
  // ColumnPruning inserts empty Projects over the children and the
  // positional reads walk off the rows (JVM-level crash, found by the
  // count() plan — collect() didn't trigger the pruning)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): TopKJoinPlan =
    copy(left = newLeft, right = newRight)
}

object TopKJoinPlan {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("id", LongType, nullable = false)(),
    AttributeReference("nbr", LongType, nullable = false)(),
    AttributeReference("dist", DoubleType, nullable = false)())
}

object TopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ TopKJoinPlan(l, r, k, _) =>
      TopKJoinExec(p.output, planLater(l), planLater(r), k) :: Nil
    case _ => Nil
  }
}

/** Physical fused broadcast-KNN. Children contracts (enforced by the
  * [[TopKJoin.knn]] entry point's projections): left = (id LONG,
  * vec ARRAY<FLOAT>), right = (id LONG, vec ARRAY<FLOAT>). */
case class TopKJoinExec(output: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan, k: Int)
    extends BinaryExecNode {

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): TopKJoinExec =
    copy(left = newLeft, right = newRight)

  /** Spark's round(x, 6): decimal HALF_UP on the double's shortest
    * decimal representation — byte-identical to the compositional
    * plan's `round(euclidean_distance(...), 6)`. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      .doubleValue()

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val buildRows = right.executeCollect()
    val n = buildRows.length
    val buildIds = new Array[Long](n)
    val buildVecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      buildIds(i) = buildRows(i).getLong(0)
      buildVecs(i) = buildRows(i).getArray(1).toFloatArray()
      i += 1
    }
    val bc = sparkContext.broadcast((buildIds, buildVecs))

    left.execute().mapPartitionsInternal { iter =>
      val (ids, vecs) = bc.value
      val m = ids.length
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](LongType, LongType, DoubleType))
      val outRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      iter.flatMap { row =>
        val id = row.getLong(0)
        val va = row.getArray(1).toFloatArray()
        // primitive top-k buffer sorted by (dist, nbr) — TopKBuf's law
        val bNbrs = new Array[Long](kLocal)
        val bDist = new Array[Double](kLocal)
        var bn = 0
        var j = 0
        while (j < m) {
          if (ids(j) != id) {
            val vb = vecs(j)
            val len = math.min(va.length, vb.length)
            // early-exit against the current k-th distance: the partial
            // squared sum is monotone, so crossing the bound proves
            // rejection (NnDescentLocal's pruning argument). The k-th
            // dist is ROUNDED to 6 dp, so a candidate with true dist in
            // (w, w + 0.5e-6] can still round EQUAL and win its nbr
            // tie — the 1e-6 slack keeps every such candidate alive;
            // s > (w+1e-6)² ⟹ rounded dist > w ⟹ safe reject.
            val bound =
              if (bn == kLocal) {
                val w = bDist(kLocal - 1) + 1e-6; w * w
              } else Double.MaxValue
            var s = 0.0
            var t = 0
            while (t < len && s <= bound) {
              val d = va(t).toDouble - vb(t).toDouble
              s += d * d
              t += 1
            }
            if (t == len && s <= bound) {
              val dist = round6(math.sqrt(s))
              val nbr = ids(j)
              if (bn < kLocal ||
                dist < bDist(bn - 1) ||
                (dist == bDist(bn - 1) && nbr < bNbrs(bn - 1))) {
                // insertion point under (dist, nbr)
                var p = 0
                while (p < bn && (bDist(p) < dist ||
                  (bDist(p) == dist && bNbrs(p) < nbr))) p += 1
                val newN = math.min(bn + 1, kLocal)
                var q = newN - 1
                while (q > p) {
                  bNbrs(q) = bNbrs(q - 1); bDist(q) = bDist(q - 1); q -= 1
                }
                if (p < newN) { bNbrs(p) = nbr; bDist(p) = dist; bn = newN }
              }
            }
          }
          j += 1
        }
        (0 until bn).iterator.map { e =>
          outRow.update(0, id)
          outRow.update(1, bNbrs(e))
          outRow.update(2, bDist(e))
          proj(outRow).copy(): InternalRow
        }
      }
    }
  }
}

object TopKJoin {

  /** Install the strategy on `spark` (idempotent). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(TopKJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKJoinStrategy
  }

  /** Exact KNN of `probe` against `build` through the fused operator.
    * Output (id, nbr, dist): the k nearest build rows per probe row,
    * self-pairs excluded, dist rounded to 6 dp — `knnGraph`'s exact
    * contract. */
  def knn(probe: DataFrame, build: DataFrame, k: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val l = probe.select(col(idCol).cast("long"), col(vecCol))
      .queryExecution.analyzed
    val r = build.select(col(idCol).cast("long"), col(vecCol))
      .queryExecution.analyzed
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKJoinPlan(l, r, k))
  }
}
