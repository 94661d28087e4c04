package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (getOrCreate → one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Test-harness-only tuning for the Spark 4 state-store snapshot-lag
      // reporter: HDFS-backed stores upload snapshots from the MAINTENANCE
      // thread (default interval 60 s), but spec streams run ~50
      // micro-batches in a few seconds and stop before the first tick —
      // so the coordinator logged every store as "falling behind: no
      // upload for query run" (benign: per-batch deltas are durable and
      // correctness never depended on snapshots, which only compact
      // recovery). A 2 s interval lets maintenance actually fire inside
      // the specs; production defaults are untouched (SURVEY §3 note).
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
