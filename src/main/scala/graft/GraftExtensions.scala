package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftnative.NativeExpressions.{CosineSimilarityF32, JaroWinklerSimilarity, LevenshteinBounded}

/** Session extension registering graft's native SQL functions, so a cluster
  * configured with
  * `spark.sql.extensions=graft.GraftExtensions`
  * can call them from plain SQL (`SELECT cosine_f32(a.vec, b.vec) …`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimilarityF32].getName, "cosine_f32"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityF32(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("levenshtein_bounded"),
      new ExpressionInfo(classOf[LevenshteinBounded].getName, "levenshtein_bounded"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LevenshteinBounded(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinklerSimilarity(exprs(0), exprs(1))))
    // optimizer rewrite: thresholded full-DP levenshtein comparisons run banded
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graftnative.BoundedLevenshteinRewrite)
    // whole-operator extension: the native AS-OF join's planner strategy
    // (the DataFrame entry NativeAsOf.join also injects it per-session)
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftnative.AsOfJoinStrategy)
  }
}
