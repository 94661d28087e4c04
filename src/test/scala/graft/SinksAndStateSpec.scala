package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Sinks
import graft.streaming.EventStream
import graft.streaming.EventStream.{JobEvent, JobProgress}

/** Write-path semantics (append / dynamic partition overwrite / compaction /
  * partition pruning) and the stateful job tracker. */
class SinksAndStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("writePartitioned + append, then partition pruning on read") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/events"
    val b1 = Seq((1L, "click", 1.0), (2L, "view", 2.0)).toDF("id", "etype", "v")
    val b2 = Seq((3L, "click", 3.0)).toDF("id", "etype", "v")
    Sinks.writePartitioned(b1, dir, Seq("etype"))
    Sinks.writePartitioned(b2, dir, Seq("etype"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val clicks = back.filter(col("etype") === "click")
    assert(clicks.count() == 2)
    // partition pruning: the scan's partition filters mention etype
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("etype"), scan)
  }

  test("overwritePartitions: replay one partition, siblings intact") {
    val dir = Files.createTempDirectory("graft_sink2").toString + "/staging"
    Sinks.writePartitioned(
      Seq((1L, "jobA", "x"), (2L, "jobA", "y"), (3L, "jobB", "z")).toDF("id", "job", "payload"),
      dir, Seq("job"))
    // re-process jobA with corrected data (fewer rows) — jobB must survive
    Sinks.overwritePartitions(
      Seq((10L, "jobA", "x2")).toDF("id", "job", "payload"), dir, Seq("job"))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("job") === "jobA").count() == 1)
    assert(back.filter(col("job") === "jobB").count() == 1)
    assert(back.count() == 2)
  }

  test("writeBucketed: same-bucketed tables join with no shuffle exchange") {
    val staging = (0L until 5000L).map(i => (i % 700, s"payload$i")).toDF("key", "payload")
    val contacts = (0L until 700L).map(i => (i, s"contact$i")).toDF("key", "name")
    Sinks.writeBucketed(staging, "b_staging", "key", 8)
    Sinks.writeBucketed(contacts, "b_contacts", "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the too-big-to-broadcast scenario this layout exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_staging").join(spark.table("b_contacts"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_staging")
      spark.sql("DROP TABLE IF EXISTS b_contacts")
    }
  }

  test("compact: same rows, fewer files") {
    val dir = Files.createTempDirectory("graft_sink3").toString + "/small"
    val df = spark.range(100).toDF("id").repartition(8)
      .withColumn("p", (col("id") % 2).cast("string"))
    Sinks.writePartitioned(df, dir, Seq("p"), SaveMode.Overwrite)
    def nFiles = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.isDirectory).map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val before = nFiles
    Sinks.compact(spark, dir, Seq("p"))
    assert(spark.read.parquet(dir).count() == 100)
    assert(nFiles < before && nFiles <= 2, s"files: before=$before after=$nFiles")
  }

  test("runIdempotentSink: multi-batch accumulation + replay does not lose or duplicate rows") {
    val base = Files.createTempDirectory("graft_idem").toString
    val src = base + "/src"; val out = base + "/out"
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // 12 events over 6 files → multiple micro-batches at maxFilesPerTrigger=4;
    // 'click' appears in EVERY file so per-type overwrite across batches
    // would lose rows (the regression this test pins)
    (0 until 3).foreach { b =>
      (0 until 2).map { f =>
        val id = (b * 2 + f) * 2L
        Seq((id, ts(s"2024-01-01 10:0$b:00"), 7L, "click", 1.0, "{}"),
            (id + 1, ts(s"2024-01-01 10:0$b:30"), 8L, "view", 2.0, "{}"))
      }.reduce(_ ++ _).toDF(cols: _*).repartition(2).write.mode("append").parquet(src)
    }
    val nSrc = spark.read.parquet(src).count()

    val q1 = EventStream.runIdempotentSink(spark, src, base + "/ckpt1", out)
    q1.awaitTermination(60000)
    val after1 = spark.read.parquet(out)
    assert(after1.count() == nSrc, s"lost rows: ${after1.count()} of $nSrc")

    // crash-replay analog: fresh checkpoint reprocesses EVERYTHING with the
    // same deterministic batch split; table must end identical, not doubled
    val q2 = EventStream.runIdempotentSink(spark, src, base + "/ckpt2", out)
    q2.awaitTermination(60000)
    val back = spark.read.parquet(out)
    assert(back.count() == nSrc)
    assert(back.select("event_id").distinct().count() == nSrc)
  }

  test("trackJobs (batch semantics of the state machine): transitions and sticky terminals") {
    // batch Dataset exercises the same transition function via a single group pass
    val events = Seq(
      JobEvent(1L, "progress", ts("2024-01-01 10:00:00"), 100),
      JobEvent(1L, "progress", ts("2024-01-01 10:01:00"), 200),
      JobEvent(1L, "complete", ts("2024-01-01 10:02:00"), 0),
      JobEvent(1L, "progress", ts("2024-01-01 10:03:00"), 999), // after terminal → ignored
      JobEvent(2L, "error", ts("2024-01-01 11:00:00"), 0),
      JobEvent(3L, "progress", ts("2024-01-01 12:00:00"), 50)
    ).toDS()

    val src = Files.createTempDirectory("graft_state_src").toString + "/in"
    val ckpt = Files.createTempDirectory("graft_state_ckpt").toString
    events.toDF().write.parquet(src)

    val stream = spark.readStream
      .schema(events.toDF().schema)
      .parquet(src).as[JobEvent]
    val q = EventStream.trackJobs(stream).writeStream
      .format("memory").queryName("job_states")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val finals = spark.table("job_states").as[JobProgress].collect()
      .groupBy(_.jobId).map { case (id, xs) => id -> xs.maxBy(_.lastUpdate.getTime) }

    assert(finals(1L).status == "COMPLETED")
    assert(finals(1L).rowsProcessed == 300) // the post-terminal 999 ignored
    assert(finals(1L).nEvents == 3)
    assert(finals(2L).status == "FAILED")
    assert(finals(3L).status == "PROCESSING")
  }

  test("writeAudited: Observation metrics ride the write pass and match the data") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_audit_out").toString + "/t"
    val df = Seq(
      (1L, Option("a@x.com"), Option(10.50)),
      (2L, Option.empty[String], Option(2.25)),
      (3L, Option("c@x.com"), Option.empty[Double]),
      (4L, Option.empty[String], Option(7.25))
    ).toDF("id", "email", "amount")
    val m = Sinks.writeAudited(df, out, Seq("email", "amount"), Some("amount"))
    assert(m("n_rows") == 4L, m.toString)
    assert(m("null_email") == 2L && m("null_amount") == 1L, m.toString)
    assert(m("sum_amount") == "20.00", m.toString) // exact decimal, not float
    // and the write itself landed everything
    assert(spark.read.parquet(out).count() == 4L)
  }

  test("compactionPlan: streaming split bins by bytes-before, overshoot and lone-big-file cases") {
    import spark.implicits._
    val manifest = Seq(
      ("P", "f1", 900L), ("P", "f2", 900L), ("P", "f3", 900L), ("P", "f4", 500L),
      ("Q", "g1", 2500L)
    ).toDF("part", "file", "sz")
    val out = graft.sources.Sinks
      .compactionPlan(manifest, "part", "file", col("sz"), targetBytes = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5), r.getBoolean(6))).toMap
    // bytes-before: 0,900,1800,2700 → bins 0,0,1,2; bin 0 overshoots by
    // at most one file (1800), later bins can run small — that's the
    // deterministic one-pass split contract
    assert(out(("P", 0L)) == ((2L, 1800L, "f1", "f2", false)), out.toString)
    assert(out(("P", 1L)) == ((1L, 900L, "f3", "f3", true)), out.toString)
    assert(out(("P", 2L)) == ((1L, 500L, "f4", "f4", true)), out.toString)
    // a single over-target file is its own bin, not undersized
    assert(out(("Q", 0L)) == ((1L, 2500L, "g1", "g1", false)), out.toString)
  }
}
