package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured-Streaming ingestion (SQS analog): micro-batch file stream must
  * produce the same hourly rollup as the batch path, and the at-least-once
  * duplicate delivery must be collapsed by the event_id idempotency key. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("session windows: stream equals batch; sessions split on the gap") {
    val src = Files.createTempDirectory("graft_sess_src").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 7: two sessions (45-min gap with a 30-min threshold); user 8: one
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 10:55:00"), 7L, "click", 4.0, "{}"),
      (4L, ts("2024-01-01 09:00:00"), 8L, "view", 8.0, "{}"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.toDF(cols: _*).write.mode("append").parquet(src)

    val stream = spark.readStream.schema(EventStream.EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = EventStream.sessionAgg(stream, 30).writeStream
      .format("memory").queryName("sess_sink").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("sess_sink")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = EventStream.sessionAgg(rows.toDF(cols: _*), 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch == Set(
      (7L, ts("2024-01-01 10:00:00"), 2L),  // session 1: events 1,2
      (7L, ts("2024-01-01 10:55:00"), 1L),  // session 2 after the 45-min gap
      (8L, ts("2024-01-01 09:00:00"), 1L)))
  }

  test("quota gate: token bucket passes/drops deterministically; stream equals batch fold") {
    import spark.implicits._
    import EventStream.{QuotaEvent, QuotaVerdict}
    val src = Files.createTempDirectory("graft_quota_src").toString
    val ckpt = Files.createTempDirectory("graft_quota_ckpt").toString
    // rate 0.1 tok/s, burst 2: events at t=0,1,2 → first two pass on the
    // burst, third finds 0.2 tokens; after 100 s enough refills for one more
    val evs = Seq(QuotaEvent(1L, 1L, 1000L), QuotaEvent(1L, 2L, 1001L),
      QuotaEvent(1L, 3L, 1002L), QuotaEvent(1L, 4L, 1102L),
      QuotaEvent(2L, 9L, 1000L)) // other key: independent bucket
    // one file → one micro-batch: event-time order within the batch is
    // what the gate sorts on; cross-batch ordering is the file feed's job
    evs.toDF("userId", "eventId", "es").coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("userId LONG, eventId LONG, es LONG")
      .option("maxFilesPerTrigger", "1").parquet(src).as[QuotaEvent]
    val q = EventStream.quotaGate(stream, ratePerSec = 0.1, burst = 2.0)
      .writeStream.format("memory").queryName("quota_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("quota_sink").as[QuotaVerdict]
      .collect().map(v => v.eventId -> v.allowed).toMap
    assert(streamed == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true,
      9L -> true), streamed.toString)
    val batch = EventStream.quotaGateBatch(evs.toDS(), 0.1, 2.0)
      .collect().map(v => (v.eventId, v.allowed, v.tokensAfter)).toSet
    val streamedFull = spark.table("quota_sink").as[QuotaVerdict]
      .collect().map(v => (v.eventId, v.allowed, v.tokensAfter)).toSet
    assert(streamedFull == batch, s"stream=$streamedFull batch=$batch")
  }

  test("dedup gate: in-batch, cross-batch, and cross-RUN duplicates all collapse") {
    val base = Files.createTempDirectory("graft_gate").toString
    val src = base + "/src"; val store = base + "/store"; val acc = base + "/accepted"

    Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha  DOC")) // 3 ≡ 1 modulo case/ws
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val q1 = EventStream.runDedupGate(spark, src, base + "/ck1", store, acc)
    q1.awaitTermination(60000)
    val first = spark.read.parquet(acc).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first.length == 2 && first.contains(2L)) // one of {1,3} + 2

    // second RUN (fresh checkpoint): redelivers old content + one new doc
    Seq((4L, "beta doc"), (5L, "gamma doc"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val q2 = EventStream.runDedupGate(spark, src, base + "/ck2", store, acc)
    q2.awaitTermination(60000)
    val all = spark.read.parquet(acc)
    assert(all.count() == 3, all.collect().mkString(",")) // {alpha, beta, gamma} exactly once
    assert(all.select("fingerprint").distinct().count() == 3)
    assert(spark.read.parquet(acc).where(col("doc_id") === 5L).count() == 1)
  }

  test("dedup gate: mid-stream crash + restart from checkpoint is exactly-once") {
    val base = Files.createTempDirectory("graft_gate_crash").toString
    val src = base + "/src"; val store = base + "/store"; val acc = base + "/accepted"
    val ck = base + "/ck"
    // four files, maxFilesPerTrigger=2 → two micro-batches; doc 4 ≡ doc 1
    Seq((1L, "alpha doc")).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((2L, "beta doc")).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((3L, "gamma doc")).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((4L, "ALPHA   doc")).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    // run 1 crashes at the WORST point of batch 1: accepted written, store
    // and checkpoint commit not — the interleaving a plain append sink
    // turns into duplicates
    val q1 = EventStream.runDedupGate(spark, src, ck, store, acc, failAtBatch = Some(1L))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000)
    }
    // restart from the SAME checkpoint, no failpoint: batch 1 replays and
    // its partition is overwritten, not appended beside
    val q2 = EventStream.runDedupGate(spark, src, ck, store, acc)
    q2.awaitTermination(120000)
    val all = spark.read.parquet(acc)
    assert(all.count() == 3, s"exactly-once contents: ${all.collect().mkString(",")}")
    assert(all.select("fingerprint").distinct().count() == 3)
    assert(all.groupBy("fingerprint").count().agg(max("count")).head().getLong(0) == 1L,
      "no fingerprint accepted twice across crash + replay")
    // third run, same checkpoint, NO new input: nothing reprocesses
    val q3 = EventStream.runDedupGate(spark, src, ck, store, acc)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(acc).count() == 3, "idle restart changes nothing")
  }

  test("drift monitor: windowed state survives a checkpoint restart; closed windows emit once") {
    val base = Files.createTempDirectory("graft_drift_restart").toString
    val src = base + "/src"; val ck = base + "/ck"; val out = base + "/out"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(EventStream.EventSchema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = EventStream.distributionSnapshot(stream, "value", 0.0, 100.0, 10)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // run 1: the 10:00 window's events + a 13:30 event that advances the
    // watermark (2 h) to 11:30, closing ONLY the 10:00 window
    Seq((1L, ts("2024-01-01 10:05:00"), 7L, "click", 5.0, "{}"),
        (2L, ts("2024-01-01 10:15:00"), 7L, "click", 55.0, "{}"),
        (3L, ts("2024-01-01 11:10:00"), 8L, "click", 25.0, "{}"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtime: the 13:30 file MUST form batch 2
    Seq((4L, ts("2024-01-01 13:30:00"), 8L, "click", 75.0, "{}"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(src)
    runOnce()
    def emitted() = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSeq.sorted
    val afterRun1 = emitted()
    assert(afterRun1 == Seq(("2024-01-01 10:00:00.0", 0L, 1L), ("2024-01-01 10:00:00.0", 5L, 1L)),
      s"only the closed 10:00 window emits: $afterRun1")
    // run 2 (RESTART, same checkpoint): one 16:00 event moves the watermark
    // to 14:00, closing the 11:00 and 13:00 windows — the 11:00 snapshot's
    // count comes entirely from run-1 data, provable state carry-over
    Seq((5L, ts("2024-01-01 16:00:00"), 9L, "click", 95.0, "{}"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val afterRun2 = emitted()
    assert(afterRun2 == Seq(
      ("2024-01-01 10:00:00.0", 0L, 1L), ("2024-01-01 10:00:00.0", 5L, 1L),
      ("2024-01-01 11:00:00.0", 2L, 1L), ("2024-01-01 13:00:00.0", 7L, 1L)),
      s"restart merged checkpointed state, each window exactly once: $afterRun2")
  }

  test("file stream hourly agg matches batch, dedupes redelivered events") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 2.0, "{}"),
      (2L, ts("2024-01-01 10:40:00"), 7L, "click", 3.0, "{}"),
      (3L, ts("2024-01-01 11:10:00"), 8L, "view", 5.0, "{}"))
    val batch2 = Seq(
      (2L, ts("2024-01-01 10:40:00"), 7L, "click", 3.0, "{}"), // redelivery (SQS at-least-once)
      (4L, ts("2024-01-01 11:20:00"), 8L, "view", 7.0, "{}"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    batch1.toDF(cols: _*).write.mode("append").parquet(src)
    batch2.toDF(cols: _*).write.mode("append").parquet(src)

    val q = EventStream.runFileStream(spark, src, ckpt, "stream_sink")
    q.awaitTermination(60000)

    val streamed = spark.table("stream_sink")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq

    // batch twin over the DEDUPLICATED events (same function, batch input)
    val batchDf = (batch1 ++ batch2).toDF(cols: _*).dropDuplicates("event_id")
    val expected = EventStream.hourlyAgg(batchDf)
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq

    assert(streamed == expected)
    assert(streamed.map(_._3).sum == 4) // 4 distinct events despite 5 deliveries
  }

  test("stream-static enrichment: micro-batch join against a static dimension") {
    val src = Files.createTempDirectory("graft_enrich_src").toString
    val ckpt = Files.createTempDirectory("graft_enrich_ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 8L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 99L, "view", 3.0, "{}")) // no dim row
      .toDF(cols: _*).write.mode("append").parquet(src)
    val dim = Seq((7L, "pro"), (8L, "free")).toDF("u_id", "tier")

    val stream = spark.readStream.schema(EventStream.EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = EventStream.enrich(stream, dim, "user_id", "u_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enrich_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("enrich_sink")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("pro"), 2L -> Some("free"), 3L -> None), out.toString)
  }

  test("stream-stream interval join: conversions match clicks within the window; batch parity") {
    val clickSrc = Files.createTempDirectory("graft_ss_click").toString
    val convSrc = Files.createTempDirectory("graft_ss_conv").toString
    val ckpt = Files.createTempDirectory("graft_ss_ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 12:00:00"), 8L, "click", 0.0, "{}"))
    val convs = Seq(
      (11L, ts("2024-01-01 10:20:00"), 7L, "purchase", 9.0, "{}"), // 20 min after click 1
      (12L, ts("2024-01-01 13:30:00"), 8L, "purchase", 5.0, "{}"), // 90 min after click 2 — outside
      (13L, ts("2024-01-01 09:00:00"), 7L, "purchase", 1.0, "{}")) // BEFORE any click
    clicks.toDF(cols: _*).write.mode("append").parquet(clickSrc)
    convs.toDF(cols: _*).write.mode("append").parquet(convSrc)

    def src(dir: String) = spark.readStream.schema(EventStream.EventSchema).parquet(dir)
    val q = EventStream.clickConversionJoin(src(clickSrc), src(convSrc), 30)
      .writeStream.format("memory").queryName("ss_join_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("ss_join_sink")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(streamed == Set((1L, 11L)), streamed.toString) // only the in-window pair

    // batch parity: the SAME function over batch frames gives the same pairs
    val batch = EventStream.clickConversionJoin(
        clicks.toDF(cols: _*), convs.toDF(cols: _*), 30)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch == streamed, s"batch=$batch streamed=$streamed")
  }

  test("drift snapshot: stream equals batch; values clamp into reference bins") {
    val src = Files.createTempDirectory("graft_drift_src").toString
    val ckpt = Files.createTempDirectory("graft_drift_ckpt").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 5.0, "{}"),   // bin 0
      (2L, ts("2024-01-01 10:15:00"), 7L, "click", 55.0, "{}"),  // bin 5
      (3L, ts("2024-01-01 10:25:00"), 8L, "click", -40.0, "{}"), // clamps to bin 0
      (4L, ts("2024-01-01 11:10:00"), 8L, "click", 999.0, "{}")) // clamps to bin 9
    rows.toDF(cols: _*).write.mode("append").parquet(src)

    val stream = spark.readStream.schema(EventStream.EventSchema).parquet(src)
    val q = EventStream.distributionSnapshot(stream, "value", 0.0, 100.0, 10)
      .writeStream.format("memory").queryName("drift_sink")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    def render(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("window_start", "bin").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSeq
    val streamed = render(spark.table("drift_sink"))
    val batch = render(EventStream.distributionSnapshot(rows.toDF(cols: _*), "value", 0.0, 100.0, 10))
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch == Seq(
      ("2024-01-01 10:00:00.0", 0L, 2L), ("2024-01-01 10:00:00.0", 5L, 1L),
      ("2024-01-01 11:00:00.0", 9L, 1L)))
  }

  test("anomaly gate (transformWithState): per-user z-score, cross-batch state, batch parity") {
    import spark.implicits._
    import EventStream.{AnomalyVerdict, MetricEvent}
    val src = Files.createTempDirectory("graft_tws_src").toString
    val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
    // batch 1 (history): user 7 alternates 10/12 (sd ≈ 1.1); user 8 constant
    val hist = (1 to 6).map(i => MetricEvent(7L, i.toLong, if (i % 2 == 0) 12.0 else 10.0)) ++
               (1 to 6).map(i => MetricEvent(8L, i.toLong, 5.0))
    hist.toDS().coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // distinct mtime → file 2 forms the second micro-batch
    // batch 2 (probes): 100 is ~80σ off user 7's history; 11 is on-profile;
    // user 8 has zero variance so nothing can flag
    val probes = Seq(MetricEvent(7L, 10L, 100.0), MetricEvent(7L, 11L, 11.0),
                     MetricEvent(8L, 10L, 5.0))
    probes.toDS().coalesce(1).write.mode("append").parquet(src)

    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("userId LONG, eventId LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(src).as[MetricEvent]
      val q = EventStream.anomalyGate(stream).writeStream
        .format("memory").queryName("tws_sink").outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val out = spark.table("tws_sink").as[AnomalyVerdict].collect()
        .map(v => (v.userId, v.eventId) -> ((v.nSeen, v.anomalous))).toMap
      assert(out.size == 15)
      // cross-batch continuity: the probe sees n = 7, not 1 — state carried
      assert(out((7L, 10L)) == ((7L, true)), out.toString)
      assert(out((7L, 11L))._2 == false)       // post-spike sd absorbs 11
      assert(out((8L, 10L)) == ((7L, false)))  // zero variance never flags
      assert(hist.forall(e => !out((e.userId, e.eventId))._2)) // history clean
      // batch parity: TWS on a batch frame folds the same (eventId order)
      val batchOut = EventStream.anomalyGate((hist ++ probes).toDS()).collect()
        .map(v => (v.userId, v.eventId) -> ((v.nSeen, v.anomalous))).toMap
      assert(batchOut == out, s"batch=$batchOut stream=$out")
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
