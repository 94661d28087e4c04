package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet — the reference accepts arbitrary
  * uploaded files (s3_service.py) and the training-data world speaks JSONL;
  * ORC covers warehouse interop, CSV covers export.
  *
  * Every read takes an EXPLICIT schema: schema inference is a full extra
  * pass over the data (at 100 TB, a second 100 TB scan) and can silently
  * widen types between batches. Writers are plain distributed writes — one
  * file per partition, no driver funnel; pair with Sinks.compact when many
  * small batches accumulate. */
object Formats {

  /** JSON Lines write (one object per row, newline-delimited). */
  def writeJsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** JSON Lines read with a fixed schema. Rows that don't parse land in
    * `_corrupt_record`-free null rows under PERMISSIVE; use FAILFAST to
    * surface bad data immediately (the csv_validator-style strictness). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                failFast: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** ORC write/read — columnar interop with Hive-side warehouses. Predicate
    * pushdown and column pruning work as with parquet. */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** CSV export with header; delimiter configurable (the write-side mirror
    * of CsvIngest's sniffing read). Scalars only — Spark refuses arrays. */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").option("delimiter", delimiter).csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              delimiter: String = ","): DataFrame =
    spark.read.schema(schema).option("header", "true").option("delimiter", delimiter).csv(path)

  /** Schema-evolution read: one DataFrame over parquet batches whose schemas
    * differ by ADDED columns (the normal evolution of a long-lived ingest
    * dir — new fields appear, old files stay). `mergeSchema` unions the
    * per-file schemas; rows from pre-evolution batches surface the new
    * columns as null. Incompatible type changes on a shared column fail the
    * read loudly rather than silently coercing.
    *
    * Scale note: schema merging reads every file FOOTER (not the data) on
    * the driver's file-index pass — cheap per file but O(files); on a
    * million-file dir prefer declaring the target schema explicitly (the
    * [[readJsonl]]/[[readOrc]] convention) and letting parquet null-fill,
    * which skips the merge pass entirely. This entry point is for the
    * schema-discovery moment, not the steady-state pipeline. */
  def readEvolvedParquet(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Fixed-width record ingestion (mainframe exports, COBOL copybook dumps,
    * legacy billing files — the classic format Spark has no native reader
    * for). Composed the idiomatic way rather than via a custom DataSource:
    * the distributed `text` source handles splitting/parallelism, and each
    * column is one codegen'd substring+trim projection, so the whole read
    * stays in WholeStageCodegen with zero extra passes. `colSpecs` are
    * (name, width) pairs in record order; short lines yield null for
    * columns past their end (substring beyond length → empty → null via
    * nullif), mirroring PERMISSIVE csv. Values are trimmed strings — cast
    * downstream with an explicit schema, same convention as [[readCsv]]. */
  def readFixedWidth(spark: SparkSession, path: String,
                     colSpecs: Seq[(String, Int)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, nullif, substring, trim, lit}
    require(colSpecs.nonEmpty && colSpecs.forall(_._2 > 0), "widths must be positive")
    val offsets = colSpecs.scanLeft(1) { case (off, (_, w)) => off + w }
    val cols = colSpecs.zip(offsets).map { case ((name, w), off) =>
      nullif(trim(substring(col("value"), off, w)), lit("")).as(name)
    }
    spark.read.text(path).select(cols: _*)
  }
}
