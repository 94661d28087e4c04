package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable DataSketches pipelines — the approximate tier that rounds out
  * the sketch family (HLL distincts, GK percentile, Bloom membership,
  * Misra–Gries heavy hitters, Count-Min point queries):
  *
  *  - KLL quantile sketches (Karnin–Lang–Liberty 2016): per-partition
  *    sketches merge into whole-data quantile estimates with a PROVEN
  *    normalized rank-error bound — the mergeable upgrade of a one-shot
  *    approx_percentile, usable per batch/day exactly like the HLL
  *    pipeline (sketch once, merge forever, never re-scan history).
  *  - Theta sketches (the set-operation sketch): distinct-count estimates
  *    for A, B AND their intersection/union/difference — the overlap
  *    questions HLL alone cannot answer.
  *
  * Shape contract: the distributed pass emits ONE small (≈KB) sketch per
  * partition via mapPartitions; the driver folds that partition-count-
  * sized list (bounded by parallelism, not data) — the same "small by
  * contract" collect as ANN query vectors. Theta estimates are
  * deterministic (hash-order thresholding, no RNG) and partitioning-
  * invariant; KLL compaction flips coins, so its estimates carry a rank-
  * error GUARANTEE rather than replay determinism — both are therefore
  * spec-verified (☆), not SQL-oracled. */
object Sketches {

  /** One serialized KLL(k) sketch per partition of `valueCol`. */
  def kllPartitionSketches(df: DataFrame, valueCol: String, k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).na.drop().as[Double]
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(sk.update)
        Iterator(sk.toByteArray)
      }.toDF("sketch")
  }

  /** Merge KLL sketch rows and read quantile estimates + the sketch's own
    * normalized rank-error bound. Accepts the output of
    * [[kllPartitionSketches]] from ANY number of batches. */
  def kllMergeQuantiles(sketches: DataFrame, probs: Seq[Double],
                        k: Int = 200, exactOracleGuard: Boolean = false): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val parts = sketches.select(col("sketch")).as[Array[Byte]].collect()
    val merged = KllDoublesSketch.newHeapInstance(k)
    parts.foreach(b => merged.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    // Exact-regime guard: the order-statistic oracle (q356) is valid ONLY
    // while n ≤ k — no compaction, no coin flips, every item retained. Past
    // that the sketch is honestly approximate and an exact oracle compare
    // would fail nondeterministically; a caller on the oracle path asks for
    // a LOUD failure instead (sf0.1 events already has 100k > k=65535).
    if (exactOracleGuard && merged.getN > k)
      throw new IllegalStateException(
        s"KLL exact-regime oracle requires n <= k=$k (no compaction); merged n=${merged.getN}. " +
        "Run the oracle verify at sf<=0.01; larger SFs are the approximate regime " +
        "(rank-error envelope asserted in SketchesSpec), not oracle-checkable.")
    val err = merged.getNormalizedRankError(false)
    val rows = probs.map { p =>
      Row(p, if (merged.isEmpty) null else java.lang.Double.valueOf(merged.getQuantile(p)),
        merged.getN, err)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("p", DoubleType, false),
        StructField("estimate", DoubleType, true),
        StructField("n", LongType, false),
        StructField("rank_error", DoubleType, false))))
  }

  private def thetaUnionOf(df: DataFrame, valueCol: String): CompactSketch = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(valueCol).cast("string")).na.drop().as[String]
      .mapPartitions { it =>
        val sk = UpdateSketch.builder().build()
        it.foreach(sk.update)
        Iterator(sk.compact().toByteArray)
      }.collect()
    val u = SetOperation.builder().buildUnion()
    parts.foreach(b => u.union(Memory.wrap(b)))
    u.getResult
  }

  /** Distinct-count estimates for two keyed populations and their set
    * algebra: |A|, |B|, |A∩B|, |A∪B|, |A∖B| — e.g. "how many users both
    * viewed AND purchased" without an exact distinct-join. */
  def thetaSetOps(dfA: DataFrame, aCol: String,
                  dfB: DataFrame, bCol: String): DataFrame = {
    val spark = dfA.sparkSession
    val a = thetaUnionOf(dfA, aCol)
    val b = thetaUnionOf(dfB, bCol)
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(a); inter.intersect(b)
    val un = SetOperation.builder().buildUnion()
    un.union(a); un.union(b)
    val diff = SetOperation.builder().buildANotB().aNotB(a, b)
    val row = Row(a.getEstimate, b.getEstimate, inter.getResult.getEstimate,
      un.getResult.getEstimate, diff.getEstimate)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1),
      StructType(Seq("est_a", "est_b", "est_intersection", "est_union", "est_a_not_b")
        .map(StructField(_, DoubleType, false))))
  }
}
