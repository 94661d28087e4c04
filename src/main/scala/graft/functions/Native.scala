package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftnative.NativeExpressions

/** graft-facing wrappers for the native Catalyst expressions (which live
  * under org.apache.spark.sql.graftnative for `private[sql]` API access —
  * see NativeExpressions' scaladoc). */
object Native {

  /** `cosine_f32(vecA, vecB)` — codegen'd cosine similarity over two
    * `array<float>` columns; double in [-1,1], 0.0 for zero-norm inputs. */
  def cosineF32(a: Column, b: Column): Column = NativeExpressions.cosineF32(a, b)

  /** Register the native functions for SQL use on an existing session
    * (clusters set `spark.sql.extensions=graft.GraftExtensions` instead). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32",
      exprs => NativeExpressions.CosineSimilarityF32(exprs(0), exprs(1)),
      "built-in")
}
