package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write paths — the Spark analog of the reference's object-store IO
  * (s3_service.py upload/download) and insert/append repository semantics
  * (job_repository.py:96-145 create; staging writes).
  *
  * Scale design: all writes are partitioned parquet. Partition columns are
  * chosen by the caller to match downstream read predicates, so partition
  * PRUNING (not file listing) bounds every later scan; dynamic partition
  * overwrite makes re-processing a batch idempotent (replay-safe — the
  * staging_row_hash equivalent at file granularity). */
object Sinks {

  /** Partitioned parquet write. `mode=Append` is the insert/create analog. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Idempotent batch re-process: overwrite ONLY the partitions present in
    * `df`, leaving sibling partitions intact (dynamic partition overwrite). */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Write a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join with NO exchange on either side — the
    * co-located-join layout for fact⋈fact joins too big to broadcast
    * (staging ⋈ contacts at 100 TB). Catalog-backed (saveAsTable) because
    * bucket metadata lives in the metastore. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Compact small files in a partitioned dataset: rewrite each partition to
    * `filesPerPartition` files (the small-upload-files problem at scale). */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              filesPerPartition: Int = 1): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "_compact_tmp"
    df.repartition(filesPerPartition, partitionCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Audited write: land the frame as parquet AND collect ingest metrics
    * (row count, per-column null counts, an exact decimal sum) from the
    * SAME pass via Spark's `Observation` API — the metrics ride the write
    * job as accumulators, so there is NO second scan (the count()-after-
    * write anti-pattern doubles every ingest's IO; at 100 TB that is the
    * whole bill). This is the reference's row_count/error_count job
    * bookkeeping (job model: total/processed/error counts) done the
    * Spark-native way.
    *
    * Returns the metric map, e.g. `n_rows`, `null_<col>`, `sum_<col>`. */
  def writeAudited(df: DataFrame, path: String,
                   nullCols: Seq[String], sumCol: Option[String]): Map[String, Any] = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation("ingest_audit")
    val metrics: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n_rows") +:
      (nullCols.map(c => sum(col(c).isNull.cast("long")).as(s"null_$c")) ++
       sumCol.map(c => sum(col(c).cast("decimal(18,2)")).cast("string").as(s"sum_$c")).toSeq)
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    obs.get
  }

  /** Small-file compaction PLAN — the metadata step before [[compact]]'s
    * physical rewrite: given a file manifest (partition, file, bytes),
    * assign files to target-sized rewrite bins and report each bin's
    * fill. `compact`'s fixed filesPerPartition is the blunt tool; this
    * is the size-aware plan a table service computes nightly ("this
    * partition's 412 4-MB files become 13 128-MB files; that one is
    * already one 130-MB file — skip it"). The small-files problem IS
    * the 100 TB problem: every downstream scan pays per-file open cost.
    *
    * Deterministic streaming split, not best-fit bin packing: files
    * order by name within a partition (listing order — rewrites stay
    * sequential byte ranges) and a file starts bin
    * ⌊bytes_before / target⌋. One window pass per partition (running
    * sum, O(1) state) + one hash aggregate; all arithmetic exact
    * integers. A bin can overshoot by at most one file; a single file
    * larger than the target gets its own flagged bin row via the same
    * formula. Emits every bin with n_files/bytes plus `undersized`
    * (the tail bin) — callers skip partitions whose ONLY bin is a
    * single already-right-sized file. */
  def compactionPlan(manifest: DataFrame, partCol: String, fileCol: String,
                     sizeCol: org.apache.spark.sql.Column,
                     targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy("part").orderBy("file")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .select(col(partCol).as("part"), col(fileCol).as("file"),
        sizeCol.cast("long").as("bytes"))
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("bin", expr(s"(cum - bytes) div ${targetBytes}"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes_total"),
        min("file").as("first_file"), max("file").as("last_file"))
      .select(col("part"), col("bin").cast("long").as("bin"),
        col("n_files").cast("long").as("n_files"),
        col("bytes_total").cast("long").as("bytes_total"),
        col("first_file"), col("last_file"),
        (col("bytes_total") < targetBytes).as("undersized"))
      .orderBy("part", "bin")
  }
}
