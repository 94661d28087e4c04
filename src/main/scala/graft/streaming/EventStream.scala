package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming analog of the reference's SQS worker handoff
  * (/root/reference/src/app/services/sqs_service.py): events arrive
  * incrementally (files standing in for queue messages), are deduplicated on
  * the idempotency key, and roll up into windowed aggregates.
  *
  * The transform is written once and applied to BOTH the streaming and the
  * batch DataFrame — Structured Streaming's core contract — so batch parity
  * is checked in tests by literally running the same function twice.
  *
  * Scale notes: watermark bounds state; dropDuplicates carries the watermark
  * so the dedup state also ages out; sink partitioning comes from the
  * window×type grouping (the one shuffle).
  */
object EventStream {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly window × event_type rollup; identical semantics batch/stream.
    * (Streaming requires `window()`, not date_trunc, to track state.) */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id") // SQS at-least-once → exactly-once on the idempotency key
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("total_value"))

  /** File-source stream over a directory of event parquet drops (the queue
    * analog). Processes everything currently available, then stops. */
  def runFileStream(spark: SparkSession, srcDir: String, checkpointDir: String,
                    sinkTable: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", "4") // micro-batch granularity
      .parquet(srcDir)
    hourlyAgg(stream).writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
