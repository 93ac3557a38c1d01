package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{CosineSimilarity, DistanceComparisonRewrite, DotProduct, EuclideanDistance, SquaredEuclidean}

/** SparkSessionExtensions hook — registers graft's custom expressions
  * as SQL functions so `spark.sql("... euclidean_distance(a, b) ...")`
  * works cluster-wide:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("euclidean_distance"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[EuclideanDistance].getName, "euclidean_distance"),
        (children: Seq[Expression]) => EuclideanDistance(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "cosine_similarity"),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("squared_euclidean"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SquaredEuclidean].getName, "squared_euclidean"),
        (children: Seq[Expression]) => SquaredEuclidean(children(0), children(1))))
    // Range-search comparisons drop their sqrt (see the rule's boundary
    // caveat — extension sessions opt in; harness sessions stay exact).
    ext.injectOptimizerRule(_ => DistanceComparisonRewrite)
    // Whole-operator tier: the fused broadcast top-k join (TopKJoin).
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKJoinStrategy)
  }
}
