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

  /** `levenshtein_bounded(s, t, k)` — exact edit distance when ≤ k, else
    * k+1; banded O(k·n) DP with early exit (vs O(n²) full levenshtein). */
  def levenshteinBounded(a: Column, b: Column, k: Column): Column =
    NativeExpressions.levenshteinBounded(a, b, k)

  /** `jaro_winkler(a, b)` — codegen'd Jaro-Winkler similarity in [0,1];
    * standard Winkler parameters (prefix ≤ 4, p = 0.1, boost > 0.7),
    * bit-compatible with DuckDB's jaro_winkler_similarity. */
  def jaroWinkler(a: Column, b: Column): Column =
    NativeExpressions.jaroWinkler(a, b)

  /** `bloom_agg(xxhash64(key), items, bits)` — distributed Bloom build via
    * the engine's runtime-filter aggregate; returns one binary sketch. */
  def bloomFilterAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    NativeExpressions.bloomFilterAgg(key, expectedItems, numBits)

  /** `bloom_might_contain(lit(sketch), xxhash64(key))` — codegen'd probe. */
  def bloomMightContain(bloomBinary: Column, key: Column): Column =
    NativeExpressions.bloomMightContain(bloomBinary, key)

  /** `bounded_collect_set(e, cap)` — collect_set with a HARD per-key
    * buffer bound: up to `cap` distinct non-null values, NULL (set
    * dropped) once a key exceeds the cap. The hub-safety valve for
    * aggregates whose per-key group size is unbounded at scale. The
    * optional accumulator counts overflowed keys so a caller can run the
    * optimistic bounded plan and fall back (e.g. re-run the round through
    * a streaming join) only when the driver reads a non-zero count after
    * the action. */
  def boundedCollectSet(e: Column, cap: Int,
      overflowCounter: Option[org.apache.spark.util.LongAccumulator] = None): Column =
    NativeExpressions.boundedCollectSet(e, cap, overflowCounter)

  /** Register the native functions for SQL use on an existing session
    * (clusters set `spark.sql.extensions=graft.GraftExtensions` instead). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32",
      exprs => NativeExpressions.CosineSimilarityF32(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_bounded",
      exprs => NativeExpressions.LevenshteinBounded(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => NativeExpressions.JaroWinklerSimilarity(exprs(0), exprs(1)),
      "built-in")
  }
}
