package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows whose point column falls inside
  * [start, end) of an intervals table.
  *
  * Spark has no native inequality-join operator — a naive
  * `f.join(i, f("ts") >= i("start") && f("ts") < i("end"))` plans as a
  * BroadcastNestedLoopJoin (all-pairs per partition): quadratic, and the
  * classic 100 TB cliff. This implementation buckets time at a caller-chosen
  * granularity: intervals explode to the buckets they cover, points map to
  * exactly ONE bucket, and the match becomes a hash EQUI-join on the bucket
  * key followed by the exact containment filter. Each (point, interval) pair
  * meets in exactly one bucket, so no dedup pass is needed.
  *
  * Cost: the interval side grows by ×(avg interval length / granularity) —
  * pick granularity near the typical interval length so the blowup is a
  * small constant; the fact side never duplicates and never shuffles more
  * than a plain equi-join would.
  */
object RangeJoin {

  /** Join `points` (with `tsCol`, seconds-precision timestamp) to
    * `intervals` (with `startCol`/`endCol`, end exclusive) on containment.
    * `bucketSeconds` is the bucketing granularity. Output: all point columns
    * + all interval columns. */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    // cast-to-long = epoch seconds; works for timestamp and timestamp_ntz
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    val b = lit(bucketSeconds)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(secs(col(startCol)) / b),
                       floor((secs(col(endCol)) - 1) / b))))
    val pt = points.withColumn("__bucket", floor(secs(col(tsCol)) / b))
    pt.join(iv, "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
