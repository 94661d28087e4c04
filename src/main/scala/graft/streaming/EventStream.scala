package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, Trigger}
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
    * (Streaming requires `window()`, not date_trunc, to track state.)
    * Streaming dedup uses dropDuplicatesWithinWatermark so the per-event_id
    * state is EVICTED once the watermark passes — a bare
    * dropDuplicates("event_id") would keep one state entry per event
    * forever (the event-time column isn't in the dedup subset, so the
    * watermark never clears it). */
  def hourlyAgg(events: DataFrame): DataFrame = {
    val marked = events.withWatermark("ts", "2 hours")
    // SQS at-least-once → exactly-once on the idempotency key
    val deduped =
      if (events.isStreaming) marked.dropDuplicatesWithinWatermark("event_id")
      else marked.dropDuplicates("event_id")
    deduped
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("total_value"))
  }

  /** Streaming session windows: per-user sessions close after `gapMinutes`
    * of silence (the streaming twin of Analytics.sessionize). Spark's
    * session_window merges overlapping per-event windows in state and the
    * watermark evicts closed sessions — state is bounded by ACTIVE sessions,
    * not history. Works identically on a batch frame (no watermark needed)
    * so batch/stream parity is testable. */
  def sessionAgg(events: DataFrame, gapMinutes: Int): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
  }

  // ------------------------------------------------------- stateful worker

  /** One queue message: a progress signal for a job. */
  case class JobEvent(jobId: Long, eventType: String, ts: java.sql.Timestamp, rows: Long)

  /** Live worker state per job (the reference worker's in-flight bookkeeping). */
  case class JobProgress(jobId: Long, status: String, rowsProcessed: Long,
                         nEvents: Long, lastUpdate: java.sql.Timestamp)

  /** The reference worker's job state machine
    * (models/job.py:11-17 statuses; worker semantics implied by the
    * repositories): PENDING → PROCESSING on the first progress message,
    * → COMPLETED / FAILED on a terminal message; terminal states are sticky.
    * Implemented with flatMapGroupsWithState so state is partitioned by
    * jobId (scales horizontally) and evicted via processing-time timeout —
    * emits one updated JobProgress row per state change. */
  def trackJobs(events: Dataset[JobEvent],
                timeout: String = "1 hour"): Dataset[JobProgress] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.jobId)
      .flatMapGroupsWithState[JobProgress, JobProgress](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (jobId: Long, msgs: Iterator[JobEvent], state: GroupState[JobProgress]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(last) // flush final snapshot on eviction
          } else {
            var cur = state.getOption.getOrElse(
              JobProgress(jobId, "PENDING", 0L, 0L, new java.sql.Timestamp(0)))
            val terminal = Set("COMPLETED", "FAILED")
            msgs.toSeq.sortBy(_.ts.getTime).foreach { m =>
              if (!terminal.contains(cur.status)) { // terminal states are sticky
                val next = m.eventType match {
                  case "progress" => "PROCESSING"
                  case "complete" => "COMPLETED"
                  case "error"    => "FAILED"
                  case "review"   => "NEEDS_REVIEW"
                  case _          => cur.status
                }
                cur = JobProgress(jobId, next, cur.rowsProcessed + m.rows,
                  cur.nEvents + 1, m.ts)
              }
            }
            state.update(cur)
            state.setTimeoutDuration(timeout)
            Iterator(cur)
          }
      }
  }

  case class QuotaEvent(userId: Long, eventId: Long, es: Long)
  case class QuotaVerdict(userId: Long, eventId: Long, es: Long,
                          allowed: Boolean, tokensAfter: Double)
  case class Bucket(tokens: Double, lastEs: Long) // public: the state encoder's codegen needs it

  /** Per-key token-bucket quota gate (the streaming rate limiter the
    * reference's API tier implies): each key refills `ratePerSec` tokens
    * up to `burst`; an event passes iff a full token is available and
    * spends it — retry storms and runaway producers get flagged per event
    * instead of poisoning downstream aggregates. Refill is EVENT-TIME
    * driven (deterministic given the input, replay-safe), state is one
    * (tokens, lastTs) pair per key partitioned by
    * flatMapGroupsWithState — scales horizontally, evicted by
    * processing-time timeout like [[trackJobs]]. Within a micro-batch,
    * events apply in (es, eventId) order, so verdicts don't depend on
    * arrival interleaving. The SAME fold runs in [[quotaGateBatch]] —
    * batch parity is a spec assertion, not a hope. */
  def quotaGate(events: Dataset[QuotaEvent], ratePerSec: Double, burst: Double,
                timeout: String = "1 hour"): Dataset[QuotaVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[Bucket, QuotaVerdict](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, msgs: Iterator[QuotaEvent], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cur = state.getOption.getOrElse(Bucket(burst, Long.MinValue))
            val out = msgs.toSeq.sortBy(e => (e.es, e.eventId)).map { e =>
              val (v, next) = applyQuota(cur, e, ratePerSec, burst)
              cur = next
              v
            }
            state.update(cur)
            state.setTimeoutDuration(timeout)
            out.iterator
          }
      }
  }

  /** One token-bucket step — shared verbatim by stream and batch paths. */
  private def applyQuota(b: Bucket, e: QuotaEvent, ratePerSec: Double,
                         burst: Double): (QuotaVerdict, Bucket) = {
    val elapsed = if (b.lastEs == Long.MinValue) 0L else math.max(0L, e.es - b.lastEs)
    val refilled = math.min(burst, b.tokens + elapsed * ratePerSec)
    val allowed = refilled >= 1.0
    val after = if (allowed) refilled - 1.0 else refilled
    (QuotaVerdict(e.userId, e.eventId, e.es, allowed, after),
      Bucket(after, e.es))
  }

  /** Batch twin of [[quotaGate]]: the identical fold per key over the
    * full history — the parity reference, and the backfill path when a
    * quota policy changes retroactively. */
  def quotaGateBatch(events: Dataset[QuotaEvent], ratePerSec: Double,
                     burst: Double): Dataset[QuotaVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId).flatMapGroups { (_, it) =>
      var cur = Bucket(burst, Long.MinValue)
      it.toSeq.sortBy(e => (e.es, e.eventId)).map { e =>
        val (v, next) = applyQuota(cur, e, ratePerSec, burst)
        cur = next
        v
      }.iterator
    }
  }

  /** Stream → partitioned table with EXACTLY-ONCE table contents: each
    * micro-batch lands via dynamic-partition overwrite (Sinks) into
    * partitions keyed by (_batch_id, event_type). The batch id is the
    * idempotency unit: replaying batch N after a crash rewrites ONLY batch
    * N's partitions (no duplicates), while later batches land beside —
    * never over — earlier ones. event_type stays a partition column so
    * downstream readers still prune on it. */
  def runIdempotentSink(spark: SparkSession, srcDir: String, checkpointDir: String,
                        outDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.Sinks.overwritePartitions(
          batch.dropDuplicates("event_id")
            .withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId)),
          outDir, Seq("_batch_id", "event_type"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup gate for document ingestion: each micro-batch of new
    * documents is (1) deduped within the batch by content fingerprint,
    * (2) anti-joined against the persistent fingerprint store (documents
    * already accepted by ANY earlier batch or run), and only the survivors
    * land in `acceptedDir` — their fingerprints append to the store so the
    * next batch sees them.
    *
    * Scale: the store holds ONE 32-char hash per accepted doc (not the
    * text); the anti-join is a hash join on the fingerprint. At 100 TB the
    * store is ~3 orders of magnitude smaller than the corpus — broadcast
    * or shuffle-join territory, never a scan of accepted content.
    *
    * Exactly-once under crash replay: BOTH writes are dynamic-partition
    * OVERWRITES keyed by batch id, so a replayed micro-batch rewrites its
    * own partitions instead of appending beside them — the worst-case
    * crash (accepted landed, store didn't, checkpoint uncommitted)
    * converges on restart. `failAtBatch` is the spec's failure-injection
    * hook: it throws at exactly that point of the named batch.
    * (A plain append sink would double-accept on that interleaving — the
    * round-6 review asked for this to be PROVEN, not asserted.) */
  def runDedupGate(spark: SparkSession, srcDir: String, checkpointDir: String,
                   storeDir: String, acceptedDir: String,
                   failAtBatch: Option[Long] = None): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val fresh = batch
          .withColumn("fingerprint", graft.functions.Cols.fingerprint(col("text")))
          .dropDuplicates("fingerprint")
        val store = try s.read.parquet(storeDir).select("fingerprint")
          catch { case _: Exception => s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL("fingerprint STRING")) }
        val accepted = fresh.join(store, Seq("fingerprint"), "left_anti")
          .localCheckpoint() // pin BEFORE the store grows: the anti-join must see the pre-append store
        graft.sources.Sinks.overwritePartitions(
          accepted.select(col("doc_id"), col("text"), col("fingerprint"),
            lit(batchId).as("_batch_id")), acceptedDir, Seq("_batch_id"))
        // the nastiest crash point: output landed, store/checkpoint didn't
        if (failAtBatch.contains(batchId))
          throw new RuntimeException(s"injected crash after accept of batch $batchId")
        graft.sources.Sinks.overwritePartitions(
          accepted.select(col("fingerprint"), lit(batchId).as("_batch_id")),
          storeDir, Seq("_batch_id"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-static enrichment: join the streaming fact against a STATIC
    * dimension. Spark re-reads/broadcasts the static side per micro-batch
    * (no state is kept for it), so the pattern scales with the stream, not
    * with history — the standard lookup-table enrichment shape. Works
    * identically on a batch frame, so parity is testable. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
             dimKey: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // drop the DIM side's key by reference, not by name — drop(dimKey) would
    // remove BOTH columns when the stream and dimension share the key name
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")
      .drop(dim(dimKey))
  }

  /** Stream-stream interval join: attribute each conversion to the same
    * user's click within the preceding `windowMinutes` — the canonical
    * two-stream correlation (impression↔click, request↔response). Both
    * sides carry watermarks and the join predicate bounds conversion time
    * to [click, click + window], so Spark can PROVE when click state is
    * complete and evict it — an unbounded-state stream-stream join never
    * ships. Inner join: late/unmatched rows age out with the watermark.
    * The same function applied to two batch frames gives the batch-parity
    * oracle for the spec. */
  def clickConversionJoin(clicks: DataFrame, conversions: DataFrame,
                          windowMinutes: Int): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val v = conversions.select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
      .withWatermark("conv_ts", "1 hour")
    c.join(v,
      c("user_id") === v("user_id") &&
        col("conv_ts") >= col("click_ts") &&
        col("conv_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(c("user_id"), col("click_id"), col("conv_id"),
        col("click_ts"), col("conv_ts"))
  }

  /** Windowed distribution snapshots for streaming drift monitoring: per
    * event-time window, clamped-bin counts of `valueCol` against REFERENCE
    * bin edges (fixed lo/hi from the reference sample — edges must NOT move
    * with the stream or every window would look stable against itself).
    * Output rows are the mergeable inputs of the PSI gate
    * (graft.operators.Evaluation.psi's cells): each closed window's counts
    * compare against the reference counts WITHOUT re-scanning history —
    * the streaming form of the drift gate. The same function runs on a
    * batch frame (parity tested); watermark bounds window state. */
  def distributionSnapshot(events: DataFrame, valueCol: String,
                           lo: Double, hi: Double, bins: Int,
                           windowLen: String = "1 hour"): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins in [2,1000]")
    val width = (hi - lo) / bins
    val bin =
      if (width == 0d) lit(0)
      else least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol).cast("double") - lit(lo)) / lit(width)))).cast("long")
    val src = if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), windowLen).as("w"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("bin"), col("n"))
  }

  /** File-source stream over a directory of event parquet drops (the queue
    * analog). Processes everything currently available, then stops. */
  case class MetricEvent(userId: Long, eventId: Long, value: Double)
  case class AnomalyVerdict(userId: Long, eventId: Long, value: Double,
                            nSeen: Long, anomalous: Boolean)
  // public: the TWS state encoder's codegen needs it
  case class Welford(n: Long, mean: Double, m2: Double)

  /** Per-key running z-score gate on the `transformWithState` API (the
    * arbitrary-state operator that supersedes flatMapGroupsWithState):
    * each user's value stream keeps Welford (n, mean, M2) state and an
    * event is flagged when it sits > `z` standard deviations from THAT
    * USER's history-so-far (never including itself) — the streaming
    * ingest-quality tripwire ([[graft.operators.Analytics]]' batch
    * z-score twin judges against the global distribution; this one
    * personalizes and never re-scans history).
    *
    * State story: ONE fixed-size value-state row per active user —
    * O(users), not O(events); under TimeMode.ProcessingTime a TTLConfig
    * ages idle keys out of the store entirely (the TWS-native state
    * bound; fMGWS needed hand-rolled timeouts for the same thing — see
    * the note in init). Requires the RocksDB state store provider (the
    * TWS contract). Within a micro-batch, rows apply in eventId order so
    * replayed batches fold identically. */
  class RunningZScoreProcessor(z: Double, minHistory: Int)
      extends StatefulProcessor[Long, MetricEvent, AnomalyVerdict] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Welford] = _
    override def init(outputMode: OutputMode, timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      // production note: under TimeMode.ProcessingTime, pass
      // TTLConfig(Duration.ofHours(...)) here and idle keys age out of the
      // store entirely. The operator runs TimeMode.None by default because
      // pending TTL timers keep an AvailableNow drain alive until they
      // fire — wrong shape for the replay/backfill path this gate serves.
      st = getHandle.getValueState[Welford]("welford",
        org.apache.spark.sql.Encoders.product[Welford],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[MetricEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[AnomalyVerdict] = {
      var s = if (st.exists()) st.get() else Welford(0L, 0d, 0d)
      val out = rows.toSeq.sortBy(_.eventId).map { e =>
        val sd = if (s.n >= 2) math.sqrt(s.m2 / (s.n - 1)) else 0d
        val flagged = s.n >= minHistory && sd > 0d &&
          math.abs(e.value - s.mean) > z * sd
        val n1 = s.n + 1
        val d = e.value - s.mean
        val mean1 = s.mean + d / n1
        s = Welford(n1, mean1, s.m2 + d * (e.value - mean1))
        AnomalyVerdict(e.userId, e.eventId, e.value, n1, flagged)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Wire [[RunningZScoreProcessor]] onto a stream (or batch frame — TWS
    * runs in both). Caller's session must use the RocksDB state store
    * provider for streaming. */
  def anomalyGate(events: Dataset[MetricEvent], z: Double = 3.0,
                  minHistory: Int = 5): Dataset[AnomalyVerdict] = {
    import org.apache.spark.sql.Encoders
    implicit val outEnc: org.apache.spark.sql.Encoder[AnomalyVerdict] =
      Encoders.product[AnomalyVerdict]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new RunningZScoreProcessor(z, minHistory),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

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
