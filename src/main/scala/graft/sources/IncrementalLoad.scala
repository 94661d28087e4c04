package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch ingest: process only files that appeared since the last
  * run — the batch analog of the reference's queue-driven worker handoff
  * (sqs_service.py) when uploads land in an object-store prefix instead of a
  * queue.
  *
  * The checkpoint stores the max file-modification-time already processed
  * (single tiny text file, written atomically via rename). Each load:
  *   1. reads the prefix with the `_metadata` hidden column — Spark's file
  *      metadata, no extra listing pass;
  *   2. keeps rows from files strictly newer than the checkpoint;
  *   3. advances the checkpoint to the max seen.
  * Replaying a load after a crash BEFORE the checkpoint write re-reads the
  * same files — pair with the staging row-hash dedup for exactly-once
  * effect (at-least-once delivery + idempotent sink, same as the stream). */
object IncrementalLoad {

  private def readCheckpoint(spark: SparkSession, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    }
  }

  private def writeCheckpoint(spark: SparkSession, path: String, value: Long): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(path), false)
    fs.rename(tmp, new Path(path))
  }

  /** Load rows from files under `dir` newer than the checkpoint; advance it.
    * Returns the new-rows DataFrame (already materialized — the checkpoint
    * only advances after the data is safely read). */
  def loadNew(spark: SparkSession, dir: String, checkpointPath: String,
              format: String = "parquet"): DataFrame = {
    val last = readCheckpoint(spark, checkpointPath)
    val withMeta = spark.read.format(format).load(dir)
      .withColumn("__mtime",
        unix_millis(col("_metadata.file_modification_time")))
    val fresh = withMeta.where(col("__mtime") > last)
    // materialize BEFORE advancing the checkpoint: a crash in between just
    // replays the same files next run (at-least-once)
    val out = fresh.drop("__mtime").localCheckpoint(true)
    val maxSeen = withMeta.agg(max("__mtime")).head()
    if (!maxSeen.isNullAt(0) && maxSeen.getLong(0) > last)
      writeCheckpoint(spark, checkpointPath, maxSeen.getLong(0))
    out
  }
}
