package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Ordered-set aggregates, running windows, sessionization, salted joins,
  * sketch-vs-exact bounds, and SQL registration of the native function. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hodgesLehmannShift: exact median of the pairwise-difference multiset") {
    val a = Seq(10L, 20L).toDF("cents")
    val b = Seq(1L, 2L).toDF("cents")
    val r = graft.operators.Analytics.hodgesLehmannShift(a, b, "cents").collect()(0)
    // diffs {9,8,19,18} sorted (8,9,18,19) → median (9+18)/2 = 13.5
    assert(r.getLong(0) == 4L && r.getDouble(1) == 13.5, r.toString)
    // one-sided constant shift recovers exactly
    val c = Seq(11L, 21L).toDF("cents")
    val s = graft.operators.Analytics.hodgesLehmannShift(c, a, "cents").collect()(0)
    assert(s.getDouble(1) == 1.0, s.toString)
  }

  test("maxDrawdown: hand curve peak/trough/recovery, monotone series has zero drawdown") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val df = Seq(
      ("G", d("2024-01-01"), 10L), ("G", d("2024-01-02"), -4L),
      ("G", d("2024-01-03"), 2L), ("G", d("2024-01-04"), -8L),
      ("G", d("2024-01-05"), 15L),
      ("M", d("2024-01-01"), 5L), ("M", d("2024-01-02"), 5L)
    ).toDF("g", "day", "v")
    val out = graft.operators.Analytics.maxDrawdown(df, "g", col("day"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getString(3),
          r.getDouble(4), r.getInt(5))).toMap
    // cum 10,6,8,0,15; peak 10,10,10,10,15; dd 0,4,2,10,0 → max 10 at day 4,
    // peak then 10, later cum 15 ≥ 10 → recovered
    assert(out("G") == ((5L, 10.0, "2024-01-04", 10.0, 1)), out.toString)
    // monotone: dd always 0, trough = first day, trivially recovered
    assert(out("M") == ((2L, 0.0, "2024-01-01", 5.0, 1)), out.toString)
  }

  test("interarrivalDiagnostics: per-user gaps, exponentiality readouts on a hand stream") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click"),
      (2L, ts("2024-01-01 00:00:01"), 7L, "click"),
      (3L, ts("2024-01-01 00:00:02"), 7L, "click"),
      (4L, ts("2024-01-01 00:00:04"), 7L, "click"),
      (5L, ts("2024-01-01 09:00:00"), 8L, "click"), // single event: no gap
      (6L, ts("2024-01-01 00:00:00"), 7L, "view")   // other type untouched
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.Analytics
      .interarrivalDiagnostics(df, "event_type", "user_id", "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5))).toMap
    // gaps (µs): 1e6, 1e6, 2e6 → mean 4e6/3, median 1e6, cv of (1,1,2)
    val (n, mean) = (3L, 4e6 / 3)
    assert(out("click")._1 == n)
    assert(out("click")._2 == math.round(mean * 1e4).toDouble / 1e4)
    assert(out("click")._3 == 1e6)
    val sd = math.sqrt((6e12 - 16e12 / 3) / 2)
    assert(math.abs(out("click")._4 - sd / mean) < 1e-6, s"cv: ${out("click")}")
    assert(out.size == 1, "single-event streams (user 8, the view row) yield no gaps")
  }

  test("curveLocality: full 4x4 grid — Hilbert walks unit steps, Morton pays teleports") {
    val cells = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = graft.operators.Analytics.curveLocality(cells, col("x"), col("y"), bits = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("hilbert") == ((16L, 15L, 1L, 1.0)), s"unit steps: ${out("hilbert")}")
    // Morton jumps: eight 1s, six 2s, one 4 (the z=7→8 quadrant teleport)
    assert(out("zorder") == ((16L, 24L, 4L, 1.6)),
      s"bit-boundary teleports: ${out("zorder")}")
  }

  test("scd2History: unchanged re-offers collapse, versions interval-chain, current flagged") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view"),
      (2L, ts("2024-01-02 00:00:00"), 7L, "view"),  // unchanged → collapses
      (3L, ts("2024-01-03 00:00:00"), 7L, "click"),
      (4L, ts("2024-01-04 00:00:00"), 7L, "view"),  // back again = NEW version
      (5L, ts("2024-01-01 00:00:00"), 8L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.Analytics
      .scd2History(rows, "user_id", "ts", "event_id", col("event_type"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getString(1), r.getLong(3), if (r.isNullAt(4)) null else r.getLong(4),
          r.getInt(5))).toMap
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(out((7L, 1)) == (("view", us("2024-01-01 00:00:00"),
      us("2024-01-03 00:00:00"), 0)), out.toString)
    assert(out((7L, 2)) == (("click", us("2024-01-03 00:00:00"),
      us("2024-01-04 00:00:00"), 0)), out.toString)
    assert(out((7L, 3)) == (("view", us("2024-01-04 00:00:00"), null, 1)),
      "reverting opens a NEW version, never reopens the old one")
    assert(out((8L, 1))._4 == 1 && out.size == 4, out.toString)
  }

  test("demingRegression: exact line recovered; noisy-x slope steeper than OLS") {
    val line = Seq((1L, 5L), (2L, 7L), (3L, 9L)).toDF("x", "y") // y = 2x + 3
    val r = graft.operators.Analytics.demingRegression(line, col("x"), col("y"))
      .collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0, r.toString)
    // mxx=2, myy=8, mxy=2 → β = (6+√52)/4 ≈ 3.3028 — ABOVE the OLS 1.0
    // (orthogonal fits don't attenuate when x carries noise too)
    val noisy = Seq((0L, 0L), (1L, 4L), (2L, 2L)).toDF("x", "y")
    val n = graft.operators.Analytics.demingRegression(noisy, col("x"), col("y"))
      .collect()(0)
    val beta = (6d + math.sqrt(52d)) / 4d
    assert(n.getDouble(1) == math.round(beta * 1e9).toDouble / 1e9, n.toString)
    // zero covariance → undefined orientation → NULL
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(graft.operators.Analytics.demingRegression(flat, col("x"), col("y"))
      .collect()(0).isNullAt(1))
  }

  test("abcClasses: exact integer 80/95 boundaries split the classic head/middle/tail") {
    val rows = Seq(("p1", 80L), ("p2", 10L), ("p2", 5L), ("p3", 5L)).toDF("k", "v")
    val out = graft.operators.Analytics.abcClasses(rows, "k", col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") == ((1L, 80L, 0.8)), out.toString)
    assert(out("B") == ((1L, 15L, 0.15)), out.toString)
    assert(out("C") == ((1L, 5L, 0.05)), out.toString)
  }

  test("seasonalStrength: pure weekly pattern → F_S = 1 (flat trend NULL); pure ramp → F_T = 1") {
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    def rowsFor(f: java.time.LocalDate => Int, g: String) =
      (0 until 28).flatMap { i =>
        val day = d0.plusDays(i)
        Seq.fill(f(day))((g, java.sql.Timestamp.valueOf(day.atStartOfDay)))
      }
    val weekly = rowsFor(day => 10 + (if (day.toEpochDay % 7 == 0) 5 else 0), "w")
      .toDF("g", "ts")
    val w = graft.operators.Analytics.seasonalStrength(weekly, "ts").collect()(0)
    assert(w.getDouble(2) == 1.0, s"pure weekly: F_S = 1 exactly: $w")
    assert(w.isNullAt(1), s"flat 7-day-MA trend has zero variance: $w")
    val ramp = (0 until 21).flatMap { i =>
      Seq.fill(i + 1)(("r", java.sql.Timestamp.valueOf(d0.plusDays(i).atStartOfDay)))
    }.toDF("g", "ts")
    val r = graft.operators.Analytics.seasonalStrength(ramp, "ts").collect()(0)
    assert(r.getDouble(1) == 1.0, s"pure ramp: F_T = 1 exactly: $r")
    assert(r.isNullAt(2), s"zero seasonal variance: $r")
  }

  test("activityHalfLife: exact halving series fits half-life 1 day; flat/growing/single NULL") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val rows =
      Seq.fill(8)(("h", d("2024-01-01"))) ++ Seq.fill(4)(("h", d("2024-01-02"))) ++
      Seq.fill(2)(("h", d("2024-01-03"))) ++ Seq.fill(1)(("h", d("2024-01-04"))) ++
      Seq.fill(3)(("f", d("2024-01-01"))) ++ Seq.fill(3)(("f", d("2024-01-02"))) ++
      Seq.fill(1)(("g", d("2024-01-01"))) ++ Seq.fill(2)(("g", d("2024-01-02"))) ++
      Seq.fill(5)(("s", d("2024-01-01")))
    val out = graft.operators.Analytics
      .activityHalfLife(rows.toDF("g", "day"), "g", col("day"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("h")._2 == -0.693147181 && out("h")._3 == 1.0, s"halving: ${out("h")}")
    assert(out("f")._3 == null, s"flat series has no half-life: ${out("f")}")
    assert(out("g")._3 == null, s"growing series: ${out("g")}")
    assert(out("s")._2 == null && out("s")._3 == null, s"single day: ${out("s")}")
  }

  test("dowEnvelope: per-weekday band, latest value position; epoch-anchored weekday") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    // five Mondays with rising volume 10..50 (latest breaks p90), one Tuesday
    val mondays = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")
    val rows = mondays.zipWithIndex.flatMap { case (day, i) =>
      Seq.fill((i + 1) * 10)(("a", d(day))) } ++ Seq.fill(7)(("a", d("2024-01-02")))
    val out = graft.operators.Analytics
      .dowEnvelope(rows.toDF("g", "day"), "g", col("day"))
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getInt(7))).toMap
    // 2024-01-01 is a Monday = dow 0 under the 1970-01-05 anchor
    assert(out(0) == ((5L, 14.0, 30.0, 46.0, 50L, 1)), s"mondays: ${out(0)}")
    assert(out(1) == ((1L, 7.0, 7.0, 7.0, 7L, 0)), s"tuesday: ${out(1)}")
  }

  test("xmrChart: Shewhart limits from moving ranges; a spike beyond 2.66·mR̄ is counted") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    // series 'a': seven 5-count days then a 50-burst
    val rows = (1 to 7).flatMap(i => Seq.fill(5)(("a", d(f"2024-01-0$i")))) ++
      Seq.fill(50)(("a", d("2024-01-08")))
    val out = graft.operators.Analytics.xmrChart(rows.toDF("g", "day"), "g", col("day"))
      .collect()(0)
    def fx(x: Double) = math.round(x * 1e4).toDouble / 1e4
    val center = fx(85d / 8); val mrbar = fx(45d / 7)
    assert(out.getLong(1) == 8L && out.getDouble(2) == center
      && out.getDouble(3) == mrbar, out.toString)
    assert(out.getDouble(4) == fx(center + 2.66 * mrbar)
      && out.getDouble(5) == fx(center - 2.66 * mrbar), out.toString)
    assert(out.getLong(6) == 1L, s"only the 50-burst runs beyond: $out")
  }

  test("xmrChart: a single-day series keeps its row — NULL limits, zero exceedances") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val rows = Seq.fill(3)(("solo", d("2024-02-01"))) ++
      Seq(("ab", d("2024-02-01")), ("ab", d("2024-02-02")))
    val out = graft.operators.Analytics.xmrChart(rows.toDF("g", "day"), "g", col("day"))
      .collect().map(r => r.getString(0) -> r).toMap
    val solo = out("solo")
    assert(solo.getLong(1) == 1L && solo.getDouble(2) == 3.0, solo.toString)
    assert(solo.isNullAt(3) && solo.isNullAt(4) && solo.isNullAt(5),
      s"no moving range exists, limits are NULL not fabricated: $solo")
    assert(solo.getLong(6) == 0L, "nothing can run beyond NULL limits")
    assert(out.contains("ab"), "multi-day series unaffected")
  }

  test("quantileTreatmentEffect: constant shift recovered at every decile") {
    val rows = (1 to 100).map(v => (1, v.toLong)) ++ (1 to 100).map(v => (0, v.toLong + 10))
    val df = rows.toDF("t", "v")
    val out = graft.operators.Analytics
      .quantileTreatmentEffect(df, col("t") === 1, col("v"))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))
    assert(out.length == 9)
    assert(out.forall(_._2._1 == 100L) && out.forall(_._2._2 == 100L))
    assert(out.forall(_._2._4 == -10.0), s"uniform shift at every decile: ${out.mkString(",")}")
    val p50 = out.find(_._1 == 0.5).get._2._3
    assert(p50 == 50.5, s"median of 1..100 interpolates to 50.5: $p50")
  }

  test("maxDrawdown: unrecovered trough and earliest-tie trough date") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val df = Seq(
      ("U", d("2024-01-01"), 10L), ("U", d("2024-01-02"), -6L),
      ("U", d("2024-01-03"), 0L), // dd 6 repeats: trough must be Jan 2
      ("U", d("2024-01-04"), 2L)  // cum 6 < peak 10 → never recovered
    ).toDF("g", "day", "v")
    val r = graft.operators.Analytics.maxDrawdown(df, "g", col("day"), col("v")).collect()(0)
    assert(r.getDouble(2) == 6.0 && r.getString(3) == "2024-01-02"
      && r.getInt(5) == 0, r.toString)
  }

  test("percentiles: interpolated median on a known group") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0),
                 ("B", 5.0)).toDF("l_returnflag", "l_quantity")
    val out = Analytics.percentiles(df).collect().map(r =>
      r.getString(0) -> (r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue())).toMap
    assert(out("A")._1 == 2.5)  // (2+3)/2
    assert(out("B")._1 == 5.0)
    assert(out("A")._2 == 7.9)  // index 2.7 → 3 + 0.7*(10-3)
  }

  test("runningTotals: cumulative per user in event order") {
    val df = Seq(
      (7L, 1L, ts("2024-01-01 10:00:00"), 1.5),
      (7L, 2L, ts("2024-01-01 10:05:00"), 2.5),
      (8L, 3L, ts("2024-01-01 10:06:00"), 10.0),
      (7L, 4L, ts("2024-01-01 10:07:00"), 3.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.runningTotals(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue(), r.getInt(3)))
    assert(out.toSeq == Seq((7L, 1L, 1.5, 1), (7L, 2L, 4.0, 2), (7L, 4L, 7.0, 3), (8L, 3L, 10.0, 1)))
  }

  test("sessionize: gap > threshold starts a new session; first event is session 1") {
    val df = Seq(
      (7L, 1L, ts("2024-01-01 10:00:00"), 0.0),
      (7L, 2L, ts("2024-01-01 10:10:00"), 0.0), // 10 min gap → same session
      (7L, 3L, ts("2024-01-01 11:00:00"), 0.0), // 50 min gap → new session
      (7L, 4L, ts("2024-01-01 11:29:00"), 0.0), // 29 min → same
      (9L, 5L, ts("2024-01-01 10:00:00"), 0.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.sessionize(df, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((7L, 1L)) == 1 && out((7L, 2L)) == 1)
    assert(out((7L, 3L)) == 2 && out((7L, 4L)) == 2)
    assert(out((9L, 5L)) == 1)
  }

  test("saltedJoin: same result as a plain join, spread across salts") {
    val big = (0L until 1000L).map(i => (i % 3, i)).toDF("k", "payload")
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "payload", "tag")
      .collect().map(_.toString).sorted
    val salted = Analytics.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "tag").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin: big side with a map column still plans (maps excluded from the salt hash)") {
    val big = (0L until 100L).map(i => (i % 3, i)).toDF("k", "payload")
      .withColumn("props", map(lit("a"), col("payload")))
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "tag")
    assert(Analytics.saltedJoin(big, small, "k", 4).count() == 100)
  }

  test("approxStats: sketch answers within tolerance of exact") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 20000).map { i =>
      (i.toLong, ts("2024-01-01 10:00:00"), (rnd.nextInt(500)).toLong, "t" + (i % 2), rnd.nextDouble() * 100, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val approx = Analytics.approxStats(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Analytics.distinctUsers(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k)._1 - n).toDouble / n < 0.05, s"$k: ${approx(k)._1} vs $n")
      assert(math.abs(approx(k)._2 - 50.0) < 5.0) // uniform [0,100) median ≈ 50
    }
  }

  test("sampleByGroup: exactly k per group, deterministic, partitioning-invariant") {
    val df = spark.range(300).selectExpr("id", "CAST(id % 3 AS STRING) AS grp")
    val a = Analytics.sampleByGroup(df, "grp", "id", 7).collect().map(_.toString).toSeq
    val b = Analytics.sampleByGroup(df.repartition(13), "grp", "id", 7)
      .collect().map(_.toString).sorted.toSeq
    assert(a.sorted == b) // same sample regardless of physical layout
    val sizes = Analytics.sampleByGroup(df, "grp", "id", 7)
      .groupBy("grp").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 7))
  }

  test("heavyHitters: CMS estimates never undercount; exact when width >> cardinality") {
    val df = spark.range(1000).selectExpr("CAST(id % 10 AS STRING) AS v")
    val est = Analytics.heavyHitters(df, "v", Seq("0", "5", "9"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("0" -> 100L, "5" -> 100L, "9" -> 100L)) // 10 distinct vs width 2000
  }

  test("HLL sketches: incrementally merged half-batches track the one-pass sketch and the truth") {
    val df = spark.range(5000)
      .selectExpr("CAST(id % 3 AS STRING) AS k", "CAST(id % 700 AS LONG) AS v", "id")
    val full = Analytics.hllMergeEstimate(Analytics.hllSketchByGroup(df, "k", "v"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val halves = Seq(0, 1).map(h => Analytics.hllSketchByGroup(df.where(col("id") % 2 === h), "k", "v"))
    val merged = Analytics.hllMergeEstimate(halves.reduce(_.unionAll(_)), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the union merge path packs registers differently than one pass, so
    // estimates are close but NOT bit-equal — both must sit inside the
    // lgK=12 error envelope around the true 700 distinct per key
    (full.values ++ merged.values).foreach(e =>
      assert(math.abs(e - 700.0) / 700.0 < 0.05, s"full=$full merged=$merged"))
    merged.keys.foreach(k =>
      assert(math.abs(merged(k) - full(k)).toDouble / full(k) < 0.02, s"full=$full merged=$merged"))
  }

  test("aggState/mergeAggStates: merged batch states are BIT-equal to one full scan") {
    val df = spark.range(3000)
      .selectExpr("CAST(id % 4 AS STRING) AS k", "CAST(id AS DOUBLE) * 1.37 AS v", "id")
    val full = Analytics.mergeAggStates(Analytics.aggState(df, "k", "v"), "k").collect()
    for (parts <- Seq(2, 5)) {
      val states = (0 until parts).map(b => Analytics.aggState(df.where(col("id") % parts === b), "k", "v"))
      val merged = Analytics.mergeAggStates(states.reduce(_.unionAll(_)), "k").collect()
      assert(merged.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq, s"at $parts batches")
    }
  }

  test("stream-static enrichment: batch parity and left-preserving") {
    val ev = Seq((1L, 7L), (2L, 8L), (3L, 99L)).toDF("event_id", "user_id")
    val dim = Seq((7L, "pro"), (8L, "free")).toDF("u_id", "tier")
    val out = graft.streaming.EventStream.enrich(ev, dim, "user_id", "u_id")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out == Map(1L -> Some("pro"), 2L -> Some("free"), 3L -> None), out.toString)
  }

  test("madByGroup: robust to one wild outlier that would dominate a stddev") {
    val df = (Seq.fill(5)(1.0) ++ Seq.fill(5)(3.0) :+ 1e9)
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }.toDF("k", "id", "v")
    val r = Analytics.madByGroup(df, "k", "v").head()
    // 11 values sorted (1×5, 3×5, 1e9): median = 6th = 3; |x-3| = {2×5, 0×5,
    // ~1e9} → MAD = 2. A stddev here is ~3e8 — the outlier owns it entirely.
    assert(r.getDouble(1) == 3.0, r.toString)
    assert(r.getDouble(2) == 2.0, r.toString)
  }

  test("equiDepthHistogram: balanced bins on skew; duplicate edges merge bins") {
    // 1..100 with quartile edges: every bin gets exactly 25 rows, and the
    // lower bound of bin i is the (i/4)-quantile
    val uniform = (1 to 100).map(v => v.toDouble).toDF("v")
    val q = Analytics.equiDepthHistogram(uniform, "v", 4).collect()
    assert(q.map(_.getLong(2)).toSeq == Seq(25L, 25L, 25L, 25L), q.mkString(","))
    assert(q.head.isNullAt(1) && q(1).getDouble(1) == 25.75, q(1).toString)
    // 97 copies of one value + 3 outliers: a fixed-width histogram puts 97%
    // in one bin; equi-depth merges the duplicate edges instead of hiding them
    val skew = (Seq.fill(97)(5.0) ++ Seq(100.0, 200.0, 300.0)).toDF("v")
    val s = Analytics.equiDepthHistogram(skew, "v", 4).collect()
    assert(s.map(_.getInt(0)).toSeq == Seq(0, 3), s.mkString(","))
    assert(s.map(_.getLong(2)).toSeq == Seq(97L, 3L), s.mkString(","))
  }

  test("chiSquare: zero under independence, N for a perfectly associated 2x2") {
    val indep = (Seq.fill(10)(("x", "0")) ++ Seq.fill(10)(("x", "1")) ++
      Seq.fill(10)(("y", "0")) ++ Seq.fill(10)(("y", "1"))).toDF("a", "b")
    val r1 = Analytics.chiSquare(indep, "a", "b").head()
    assert(r1.getLong(0) == 40 && r1.getLong(1) == 1 && r1.getDouble(2) == 0.0)
    val assoc = (Seq.fill(20)(("x", "0")) ++ Seq.fill(20)(("y", "1"))).toDF("a", "b")
    val r2 = Analytics.chiSquare(assoc, "a", "b").head()
    assert(r2.getLong(1) == 1 && math.abs(r2.getDouble(2) - 40.0) < 1e-9, r2.toString)
  }

  test("rollingTimeWindow: value-defined frame — peers share it, old rows age out") {
    val df = Seq(
      (7L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (7L, 2L, ts("2024-01-05 10:00:00"), 2.0),  // within 7d of event 1
      (7L, 3L, ts("2024-01-05 10:00:00"), 4.0),  // PEER of event 2 (same ts)
      (7L, 4L, ts("2024-01-20 10:00:00"), 8.0),  // events 1-3 aged out
      (8L, 5L, ts("2024-01-01 10:00:00"), 16.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.rollingTimeWindow(df, "user_id", "ts", "event_id", "value", 7)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // peers (2,3) both see 1+2+4; event 4's trailing week is empty but itself
    assert(out == Map(1L -> 1.0, 2L -> 7.0, 3L -> 7.0, 4L -> 8.0, 5L -> 16.0), out.toString)
  }

  test("globalRowNumber: dense 1..N in sort order, invariant to input partitioning") {
    val df = Seq((3L, "b"), (1L, "a"), (2L, "b"), (4L, "a")).toDF("id", "src")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.globalRowNumber(d, Seq("src", "id")).orderBy("seq")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val expected = Seq((1L, 1L), (4L, 2L), (2L, 3L), (3L, 4L)) // a:1,4 then b:2,3
    assert(run(df) == expected)
    assert(run(df.repartition(7)) == expected) // numbering ignores input layout
  }

  test("retentionCohorts: offsets from first-activity day, multi-event days count once") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")), // u1 cohort 01-01
      (1L, ts("2024-01-01 23:00:00")), // same day — deduped
      (1L, ts("2024-01-02 01:00:00")), // offset 1
      (1L, ts("2024-01-04 01:00:00")), // offset 3
      (1L, ts("2024-01-06 01:00:00")), // offset 5 — NOT in requested offsets
      (2L, ts("2024-01-01 12:00:00")), // u2 cohort 01-01, day-0 only
      (3L, ts("2024-01-02 12:00:00")), // u3 cohort 01-02
      (3L, ts("2024-01-09 12:00:00"))  // offset 7
    ).toDF("user_id", "ts")
    val out = Analytics.retentionCohorts(df, "user_id", "ts", Seq(0, 1, 3, 7))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L, ("2024-01-01", 3L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 7L) -> 1L), out.toString)
  }

  test("slidingDistinct: trailing 7-day window, users counted once, keys isolated") {
    val df = Seq(
      ("click", 1L, ts("2024-01-01 10:00:00")),
      ("click", 1L, ts("2024-01-03 10:00:00")), // same user again → still 1 distinct
      ("click", 2L, ts("2024-01-03 11:00:00")),
      ("click", 3L, ts("2024-01-12 09:00:00")), // >7d after the others
      ("view", 9L, ts("2024-01-03 08:00:00"))   // other key, same day
    ).toDF("event_type", "user_id", "ts")
    val out = Analytics.slidingDistinct(df, "event_type", "user_id", "ts", 7)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("click", "2024-01-01") -> 1L, // only u1 so far
      ("click", "2024-01-03") -> 2L, // u1 (both events) + u2
      ("click", "2024-01-12") -> 1L, // u1/u2 aged out (last seen 01-03, gap 9d)
      ("view", "2024-01-03") -> 1L), out.toString)
  }

  test("markovTransitions: per-user ordering, row-normalized probabilities") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "view"),
      (2L, 4L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 5L, ts("2024-01-01 10:01:00"), "buy"),
      (3L, 6L, ts("2024-01-01 10:00:00"), "click") // singleton → no transition
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.markovTransitions(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // from view: click (u1) and buy (u2) → 0.5 each; from click: view (u1) → 1.0
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)), ("view", "buy") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))), out.toString)
  }

  test("lastTouchAttribution: credits prior touch within window, else direct") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, 2L, ts("2024-01-01 10:10:00"), "purchase"),  // 10 min after click → click
      (2L, 3L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 4L, ts("2024-01-01 10:00:00"), "purchase"),  // 60 min gap > 30 → direct
      (3L, 5L, ts("2024-01-01 08:00:00"), "purchase")   // first event → direct
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.lastTouchAttribution(df, "user_id", "ts", "event_id",
        "event_type", "purchase", 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("click" -> 1L, "direct" -> 2L), out.toString)
  }

  test("regressionByGroup: recovers exact slope, partitioning-invariant") {
    // y = 3x + 7 exactly → slope 3 regardless of noise-free layout
    val rows = (1 to 100).map(i => ("g", i.toDouble, 3.0 * i + 7.0)) ++
      (1 to 50).map(i => ("h", i.toDouble, -2.0 * i + 1.0))
    val df = rows.toDF("k", "x", "y")
    def slopes(d: org.apache.spark.sql.DataFrame) =
      Analytics.regressionByGroup(d, "k", col("x"), col("y"))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val s = slopes(df)
    assert(s("g") == 3.0 && s("h") == -2.0, s.toString)
    assert(slopes(df.repartition(13)) == s) // decimal sums: layout-independent
    // magnitude case (the sf1 overflow fix): x,y ~ 1e7 over 10 rows pushes
    // sum(x·y) to ~1e15·10^4 in centi-units — past the 14 integer digits
    // the previous decimal(18,4) sums allowed; the scale-0 fold must stay
    // exact (y = 2x ⇒ slope exactly 2)
    val big = (1 to 10).map(i => ("b", i * 1.0e7, 2.0e7 * i)).toDF("k", "x", "y")
    assert(slopes(big) == Map("b" -> 2.0), slopes(big).toString)
  }

  test("associationRules: exact support/confidence/lift on a known basket set") {
    // 4 baskets: {a,b} ×3, {a} ×1 → a:4, b:3, pair(a,b):3
    val df = (1L to 3L).flatMap(u => Seq(
        (u, ts("2024-01-01 10:00:00"), "a"), (u, ts("2024-01-01 11:00:00"), "b"))) :+
      ((4L, ts("2024-01-01 10:00:00"), "a"))
    val out = Analytics.associationRules(df.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // support 3/4, conf(a→b) 3/4, lift 3·4/(4·3)=1
    assert(out(("a", "b")) == ((3L, 0.75, 0.75, 1.0)), out.toString)
    // conf(b→a) 3/3 = 1
    assert(out(("b", "a")) == ((3L, 0.75, 1.0, 1.0)), out.toString)
  }

  test("winsorizedMean: tail outlier clipped to the hi bound, not dropped") {
    // 20 values 1..20 plus an outlier 10000 in group g; p95 bound clips it
    val df = ((1 to 20).map(i => ("g", i.toDouble)) :+ (("g", 10000.0))).toDF("k", "value")
    val out = Analytics.winsorizedMean(df, "k", "value").head()
    assert(out.getLong(1) == 21L)
    // winsorized mean must sit near the bulk (≈10), nowhere near 10000/21≈486
    assert(out.getDouble(2) > 5 && out.getDouble(2) < 15, out.toString)
    // plain mean for contrast — the outlier would dominate it
    assert(df.agg(avg("value")).head().getDouble(0) > 480)
  }

  test("calibrateByGroup: percent_rank per group, 0..1 inclusive, group-local") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 5L), ("b", 5L, 50L)).toDF("src", "id", "score")
    val out = Analytics.calibrateByGroup(df, "src", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0, 4L -> 0.0, 5L -> 1.0), out.toString)
  }

  test("growthAccounting: new / retained / resurrected classified per week") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // wk1: new
      (1L, ts("2024-01-08 10:00:00")), // wk2: retained (consecutive)
      (1L, ts("2024-01-22 10:00:00")), // wk4: resurrected (skipped wk3)
      (2L, ts("2024-01-08 12:00:00"))  // wk2: new
    ).toDF("user_id", "ts")
    val out = Analytics.growthAccounting(df, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", "new") -> 1L,
      ("2024-01-08", "new") -> 1L, ("2024-01-08", "retained") -> 1L,
      ("2024-01-22", "resurrected") -> 1L), out.toString)
  }

  test("cdcCompact: latest row per key wins, tombstoned keys drop, ties broken by id") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "upsert", 2.0),  // latest for key 1
      (2L, ts("2024-01-01 10:00:00"), 3L, "upsert", 3.0),
      (2L, ts("2024-01-01 12:00:00"), 4L, "error", 0.0),   // tombstone last → key gone
      (3L, ts("2024-01-01 10:00:00"), 5L, "upsert", 5.0),
      (3L, ts("2024-01-01 10:00:00"), 6L, "upsert", 6.0)   // same ts: higher id wins
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Analytics.cdcCompact(df, "user_id", "ts", "event_id", "event_type", "error")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    assert(out == Map(1L -> ((2L, 2.0)), 3L -> ((6L, 6.0))), out.toString)
  }

  test("diffSnapshots: added/removed/changed classified; unchanged and null-equal rows silent") {
    val v1 = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, None, 3.0), (4L, Some("d"), 4.0))
      .toDF("id", "s", "v")
    val v2 = Seq((1L, Some("a"), 1.0),  // unchanged → absent
      (2L, Some("B"), 2.0),             // changed
      (3L, None, 3.0),                  // null == null → unchanged, absent
      (5L, Some("e"), 5.0))             // added; 4 removed
      .toDF("id", "s", "v")
    val out = Analytics.diffSnapshots(v1, v2, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 4L -> "removed", 5L -> "added"), out.toString)
  }

  test("decayedScore: half-life halves a term's weight; newest event weighs 1") {
    val df = Seq(
      (1L, ts("2024-01-08 00:00:00"), 8.0),  // ref point (max ts), age 0
      (1L, ts("2024-01-01 00:00:00"), 8.0),  // exactly one half-life old
      (2L, ts("2024-01-08 00:00:00"), 4.0)   // age 0 in same dataset
    ).toDF("user_id", "ts", "value")
    val out = Analytics.decayedScore(df, "user_id", "ts", "value", 7.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // u1: 8·1 + 8·2^(-1) = 12; u2: 4·1 = 4
    assert(out(1L) == ((2L, 12.0)), out.toString)
    assert(out(2L) == ((1L, 4.0)), out.toString)
  }

  test("eventPattern: ordered-sequence regex; arrival order and partitioning irrelevant") {
    val df = Seq(
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"), // arrives "first" but is LAST by ts
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "purchase"), // purchase BEFORE signup → no match
      (2L, ts("2024-01-01 10:01:00"), 5L, "signup")
    ).toDF("user_id", "ts", "event_id", "event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.eventPattern(d, "user_id", "ts", "event_id", "event_type",
          "signup(>[a-z]+)*>purchase")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(df) == Seq((1L, "signup>view>purchase")), run(df).toString)
    assert(run(df.repartition(7)) == run(df)) // sort_array, not arrival order
  }

  test("giniByGroup: 0 for perfect equality, →1 for total concentration") {
    val eq = (1L to 100L).map(i => ("eq", i, 5.0))
    val conc = (1L to 99L).map(i => ("conc", i, 0.001)) :+ (("conc", 100L, 1000000.0))
    val out = Analytics.giniByGroup((eq ++ conc).toDF("k", "event_id", "value"),
        "k", "event_id", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("eq") == 0.0, out.toString)
    assert(out("conc") > 0.98, out.toString) // one holder owns ~everything
  }

  test("ohlc: deterministic open/close by (ts,id); arrival order and partitioning irrelevant") {
    // deliberately shuffled arrival order within one user-hour bucket
    val rows = Seq(
      (3L, ts("2024-01-01 10:30:00"), 7L, 5.0),  // middle
      (1L, ts("2024-01-01 10:05:00"), 7L, 2.0),  // open (earliest ts)
      (4L, ts("2024-01-01 10:59:00"), 7L, 1.0),  // close (latest ts) + low
      (2L, ts("2024-01-01 10:05:00"), 7L, 9.0),  // same ts as open → id 1 wins open; high
      (5L, ts("2024-01-01 11:10:00"), 7L, 4.0))  // next hour
    val df = rows.toDF("event_id", "ts", "user_id", "value").repartition(7)
    val out = Analytics.ohlc(df, "user_id", "ts", "event_id", "value").collect()
    assert(out.length == 2)
    val bar = out.head
    assert(bar.getDouble(2) == 2.0, s"open: $bar")   // id 1 at 10:05 beats id 2
    assert(bar.getDouble(3) == 9.0, s"high: $bar")
    assert(bar.getDouble(4) == 1.0, s"low: $bar")
    assert(bar.getDouble(5) == 1.0, s"close: $bar")
    assert(bar.getLong(6) == 4L)
    assert(out(1).getDouble(2) == 4.0 && out(1).getLong(6) == 1L)
  }

  test("rollingMedian: interpolated middle on even frames, exact middle on odd") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:01"), 7L, 1.0),
      (2L, ts("2024-01-01 10:00:02"), 7L, 4.0),
      (3L, ts("2024-01-01 10:00:03"), 7L, 2.0),
      (4L, ts("2024-01-01 10:00:04"), 7L, 8.0))
    val df = rows.toDF("event_id", "ts", "user_id", "value").repartition(5)
    val out = Analytics.rollingMedian(df, "user_id", "ts", "event_id", "value", frame = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 2.5, 3L -> 2.0, 4L -> 3.0), out.toString)
  }

  test("imputeByGroup: group mean fills nulls; all-null group falls back to global mean") {
    val df = Seq(
      ("a", 1L, Some(2.0)), ("a", 2L, None), ("a", 3L, Some(4.0)),
      ("b", 4L, None), ("b", 5L, None)).toDF("k", "id", "v")
    val out = Analytics.imputeByGroup(df, "k", "id", "v")
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(2L) == ((3.0, true)))   // mean of group a
    assert(out(4L) == ((3.0, true)))   // global mean (only a has values)
    assert(out(1L) == ((2.0, false)))  // non-null untouched, flag false
  }

  test("cosine_f32 callable from SQL after registration") {
    graft.functions.Native.registerSql(spark)
    val out = spark.sql(
      "SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").as[Double].head()
    assert(math.abs(out - 1.0) < 1e-12)
  }

  test("zorderKey: exact Morton codes on a 4x4 grid; ordered by z") {
    import spark.implicits._
    val df = (for (x <- 0L to 3L; y <- 0L to 3L) yield (x * 10 + y, x, y))
      .toDF("id", "x", "y")
    val rows = graft.operators.Analytics.zorderKey(df, "x", "y", Seq("id"), bits = 2)
      .collect()
    val z = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // classic 2-bit Morton: z = x0 + 2*y0 + 4*x1 + 8*y1
    assert(z(0L) == 0 && z(10L) == 1 && z(1L) == 2 && z(11L) == 3, z.toString)
    assert(z(20L) == 4 && z(33L) == 15, z.toString)
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq.sorted)
  }

  test("exactGlobalMedian: odd/even/duplicates/refinement match Spark's percentile") {
    import spark.implicits._
    def median(xs: Seq[Double], thresh: Long = 100000L): (Long, Double) = {
      val r = graft.operators.Analytics
        .exactGlobalMedian(xs.toDF("value"), "value", thresh).head()
      (r.getLong(0), r.getDouble(1))
    }
    assert(median(Seq(3.0, 1.0, 2.0)) == ((3L, 2.0)))
    assert(median(Seq(4.0, 1.0, 2.0, 3.0)) == ((4L, 2.5)))
    assert(median(Seq(5.0, 5.0, 5.0, 5.0)) == ((4L, 5.0)))   // all equal
    assert(median(Seq(-3.0, -1.0, -2.0, 10.0)) == ((4L, -1.5)))
    // force the histogram refinement path (threshold 10 << n=1001) and
    // compare against Spark's own exact ordered-set aggregate
    val rnd = new scala.util.Random(11)
    val big = Seq.fill(1001)(rnd.nextGaussian() * 100)
    val expect = big.toDF("value")
      .agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
    assert(median(big, thresh = 10L)._2 == expect)
    val bigEven = big.take(1000)
    val expectEven = bigEven.toDF("value")
      .agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
    val gotEven = median(bigEven, thresh = 10L)._2
    assert(math.abs(gotEven - expectEven) < 1e-9, s"$gotEven vs $expectEven")
    // empty input yields an empty frame, not a crash
    assert(graft.operators.Analytics.exactGlobalMedian(
      Seq.empty[Double].toDF("value"), "value").count() == 0)
  }

  test("spearmanByGroup: monotone data hits ±1 exactly; ties average") {
    // strictly increasing (rho=1) and strictly decreasing (rho=-1) groups
    val mono = (1 to 50).map(i => ("up", i.toDouble, math.exp(i / 10.0))) ++
      (1 to 50).map(i => ("dn", i.toDouble, -i * 3.0))
    val out = Analytics.spearmanByGroup(mono.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("up") == 1.0 && out("dn") == -1.0)
    // hand case with a tie block: x=(1,2,2,3), y=(1,3,2,4) → ranks
    // rx=(1,2.5,2.5,4), ry=(1,3,2,4); rho = 0.9486832980505138 (computed
    // by hand via the Pearson-on-ranks formula)
    val tied = Seq(("t", 1.0, 1.0), ("t", 2.0, 3.0), ("t", 2.0, 2.0), ("t", 3.0, 4.0))
    val rho = Analytics.spearmanByGroup(tied.toDF("g", "x", "y"), "g", "x", "y")
      .head().getDouble(2)
    assert(math.abs(rho - 0.9486832980505138) < 1e-9, rho.toString)
    // constant axis: zero variance -> null, not NaN
    val const = Seq(("c", 1.0, 5.0), ("c", 2.0, 5.0), ("c", 3.0, 5.0))
    assert(Analytics.spearmanByGroup(const.toDF("g", "x", "y"), "g", "x", "y")
      .head().isNullAt(2))
    // partitioning invariance
    val p8 = Analytics.spearmanByGroup(mono.toDF("g", "x", "y").repartition(8),
      "g", "x", "y").collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p8 == out)
  }

  test("acf: a period-2 alternating series has acf(1)=-1, acf(2)=+1") {
    val alt = (0 until 40).map(t => (t.toLong, if (t % 2 == 0) 10L else 20L))
    val out = Analytics.acf(alt.toDF("t", "x"), "t", "x", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // finite-sample ACF of a perfect alternation is slightly inside ±1
    // (the lag-h sum has n-h terms over the full-series denominator)
    assert(out(1L) < -0.9 && out(2L) > 0.9, out.toString)
    // gap in the series: pairs at the hole drop, no crash
    val gappy = alt.filterNot(_._1 == 20L)
    val g = Analytics.acf(gappy.toDF("t", "x"), "t", "x", maxLag = 2).collect()
    assert(g.map(_.getLong(1)).toSeq == Seq(37L, 36L)) // n_pairs lose the hole
    // constant series: zero variance -> null acf
    val const = (0 until 10).map(t => (t.toLong, 7L))
    assert(Analytics.acf(const.toDF("t", "x"), "t", "x", maxLag = 1)
      .head().isNullAt(2))
  }

  test("weightedPercentilesByGroup: hand case; degenerates to plain percentile at weight 1") {
    // values 10,20,30 with weights 1,1,8: W=10; p50 -> cumw 10 at v=30?
    // cum: 10->1, 20->2, 30->10; p500 needs cumw*1000 >= 500*10=5000 -> v=30
    val df = Seq(("g", 10.0, 1L), ("g", 20.0, 1L), ("g", 30.0, 8L))
      .toDF("grp", "v", "wt")
    val out = Analytics.weightedPercentilesByGroup(df, "grp", "v", "wt", Seq(200, 500))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out(500) == 30.0)
    assert(out(200) == 20.0) // needs cumw >= 2: value 20 reaches it
    // all weights 1 ≡ the lower percentile of the plain value list
    val flat = (1 to 100).map(i => ("u", i.toDouble, 1L)).toDF("grp", "v", "wt")
    val p = Analytics.weightedPercentilesByGroup(flat, "grp", "v", "wt", Seq(500, 900))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(p(500) == 50.0 && p(900) == 90.0)
    // duplicate values merge their weights (margin collapse)
    val dup = Seq(("d", 5.0, 3L), ("d", 5.0, 3L), ("d", 9.0, 4L)).toDF("grp", "v", "wt")
    val q = Analytics.weightedPercentilesByGroup(dup, "grp", "v", "wt", Seq(600))
      .head()
    assert(q.getDouble(2) == 5.0 && q.getLong(3) == 10L)
  }

  test("automationSignature: metronome flags on CV; two-beat bot flags on modal share") {
    def ev(user: String, secs: Seq[Long]) =
      secs.zipWithIndex.map { case (s, i) =>
        (user, new java.sql.Timestamp(s * 1000L), s"$user-$i")
      }
    // metronome: exact 60s gaps (cv=0); human: irregular; two-beat bot:
    // alternating 30/300 (cv high but modal share 50% > threshold? = 0.5
    // exactly -> NOT flagged by strict >; use 6/11 > 0.5)
    val metro = ev("bot", (0 until 12).map(_ * 60L))
    val human = ev("hum", Seq(0L, 7L, 200L, 260L, 1000L, 1030L, 2000L,
      2300L, 5000L, 5600L, 9000L))
    val twoBeat = ev("tb", Seq(0L, 30L, 330L, 360L, 660L, 690L, 990L,
      1020L, 1320L, 1350L, 1650L, 1680L))
    val df = (metro ++ human ++ twoBeat).toDF("user_id", "ts", "event_id")
    val out = Analytics.automationSignature(df, "user_id", "ts", "event_id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("bot").getDouble(3) == 0.0 && out("bot").getBoolean(5))
    assert(out("bot").getDouble(2) == 60.0)
    assert(!out("hum").getBoolean(5), out("hum").toString)
    // two-beat: 11 gaps, 6 of them 30s -> modal 6/11 > 0.5 flags
    assert(out("tb").getLong(1) == 11L)
    assert(out("tb").getDouble(4) > 0.5 && out("tb").getBoolean(5))
    // below min-events actors are absent
    val tiny = ev("t2", Seq(0L, 60L, 120L)).toDF("user_id", "ts", "event_id")
    assert(Analytics.automationSignature(tiny, "user_id", "ts", "event_id").count() == 0)
  }

  test("ccf: y = x shifted by 2 peaks at lag 2; lag 0 is the plain correlation") {
    // x alternates 10/20; y is x delayed by 2 steps (same phase): ccf(2)≈1
    val xs = (0 until 40).map(t => (t.toLong, if (t % 2 == 0) 10L else 20L))
    val ys = (0 until 40).map(t => (t.toLong, if (t % 2 == 0) 10L else 20L))
      .map { case (t, v) => (t + 2, v) } // y_{t+2} = x_t
    val out = Analytics.ccf(xs.toDF("t", "v"), ys.toDF("t", "v"), "t", "v", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > 0.99, out.toString)  // aligned phase
    assert(out(1L) < -0.99)               // opposite phase one step off
    // degenerate y (constant): null, not NaN
    val cy = (0 until 10).map(t => (t.toLong, 5L))
    val c = Analytics.ccf(xs.toDF("t", "v"), cy.toDF("t", "v"), "t", "v", 1)
      .collect()
    assert(c.forall(_.isNullAt(2)))
  }

  test("theilSenTrend: one outlier day cannot bend the slope; OLS would chase it") {
    // x = 2t exactly, except a 100-unit incident spike at t=5
    val series = (0L to 9L).map(t => (t, if (t == 5L) 100.0 else 2.0 * t))
    val out = Analytics.theilSenTrend(series.toDF("t", "x"), "t", "x").head()
    assert(out.getLong(0) == 10L && out.getLong(1) == 45L)
    assert(out.getDouble(2) == 2.0, out.toString)   // median slope untouched
    assert(out.getDouble(3) == 0.0)                 // median residual 0
    // short series: 1 point -> empty frame, not a crash
    assert(Analytics.theilSenTrend(Seq((1L, 5.0)).toDF("t", "x"), "t", "x").count() == 0)
  }

  test("benfordAudit: digits come from the decimal string; chi2 is additive") {
    // 100 values starting with 1, 20 with 9 → p_obs 5/6 and 1/6
    val vals = (1 to 100).map(_ => 1234.56) ++ (1 to 20).map(_ => 0.09)
    val out = Analytics.benfordAudit(vals.toDF("v"), col("v")).collect()
    assert(out.length == 9) // all digits present even with 0 observations
    val byDigit = out.map(r => r.getString(0) -> r).toMap
    assert(byDigit("1").getLong(1) == 100L)
    assert(byDigit("9").getLong(1) == 20L)  // 0.09 → first significant digit 9
    assert(byDigit("2").getLong(1) == 0L)
    // chi2 column equals the sum of the chi terms, and is the same on every row
    val chiSum = out.map(_.getDouble(4)).sum
    assert(out.map(_.getDouble(5)).distinct.length == 1)
    assert(math.abs(out.head.getDouble(5) - chiSum) < 1e-6)
    // a perfectly Benford-weighted sample scores chi2 ~ 0: use expected
    // counts rounded from n=10000
    val benford = (1 to 9).flatMap { d =>
      val n = math.round(math.log10(1.0 + 1.0 / d) * 10000).toInt
      Seq.fill(n)(d * 1.11)
    }
    val chi2 = Analytics.benfordAudit(benford.toDF("v"), col("v"))
      .head().getDouble(5)
    assert(chi2 < 0.01, chi2.toString)
  }

  test("paretoFrontier: equals brute-force dominance; duplicates and x-ties survive; partition-invariant") {
    // deterministic scatter with planted structure: equal points (ids 100/101),
    // an x-tie where only the max-y row is on the frontier, dominated interior
    val pts = (1 to 60).map { i =>
      (i.toLong, (i * 37 % 50).toLong, ((i * 61) % 80).toLong)
    } ++ Seq((100L, 50L, 10L), (101L, 50L, 10L), (102L, 50L, 9L))
    val df = pts.toDF("id", "x", "y")
    val out = Analytics.paretoFrontier(df, "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) => bx >= x && by >= y && (bx > x || by > y) }
    }.sortBy(p => (-p._2, p._1))
    assert(out.toSeq == brute, s"got ${out.toSeq}\nwant $brute")
    assert(out.count(p => p._1 == 100L || p._1 == 101L) == 2) // equal pair kept
    assert(!out.exists(_._1 == 102L))                          // x-tie loser out
    val p8 = Analytics.paretoFrontier(df.repartition(8), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p8.toSeq == brute)
  }

  test("zoneMapManifest + pruneByZoneMap: pruned scan ≡ full filter; disjoint zones actually skip") {
    // three clustered buckets: values 0-99, 100-199, 200-299
    val df = (0L until 300L).map(v => (v / 100, v)).toDF("b", "v")
    val manifest = Analytics.zoneMapManifest(df, col("b"), Seq("v")).collect()
    assert(manifest.length == 3)
    assert(manifest.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 100L, 0L, 99L), (1L, 100L, 100L, 199L), (2L, 100L, 200L, 299L)))
    val m = Analytics.zoneMapManifest(df, col("b"), Seq("v"))
    val pruned = Analytics.pruneByZoneMap(df, m, col("b"), "v", 150L, 250L)
    val full = df.where(col("v") >= 150 && col("v") <= 250)
    assert(pruned.collect().map(_.getLong(1)).sorted.toSeq ==
      full.collect().map(_.getLong(1)).sorted.toSeq)
    // bucket 0's zone [0,99] misses [150,250]: its rows are filtered by the
    // IN list itself (the layout-pruning surrogate in this in-memory test)
    assert(pruned.queryExecution.optimizedPlan.toString.contains("b#"))
    val none = Analytics.pruneByZoneMap(df, m, col("b"), "v", 500L, 600L)
    assert(none.count() == 0)
  }

  test("timeWeightedAvg: holding-time weights, last event carries none, single-event actor NULL") {
    val t0 = 1700000000L
    def ts(off: Long) = new java.sql.Timestamp((t0 + off) * 1000L)
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(10), 20.0), (1L, 3L, ts(30), 999.0),
      (2L, 4L, ts(0), 5.0) // single event: no observed holding time
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.timeWeightedAvg(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    // user 1: 10·10 + 20·20 = 500 over span 30 → 16.666…; 999 never weighs
    assert(out(1L)._1 == 3L && out(1L)._2 == 30L)
    assert(math.abs(out(1L)._3.asInstanceOf[Double] - 500.0 / 30.0) < 1e-9, out.toString)
    assert(out(2L)._3 == null, out.toString)
    // the plain average would be 343 — the whole point of the weighting
    assert(out(1L)._3.asInstanceOf[Double] < 30.0)
  }

  test("correlationMatrix: ±1 on linear pairs, upper triangle only, one row per pair") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3, -1.0 * i, (i % 7).toDouble))
      .toDF("a", "b", "c", "d")
    val cols = Seq("a", "b", "c", "d").map(n => n -> col(n).cast("decimal(18,6)"))
    val out = Analytics.correlationMatrix(df, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 6)
    assert(out(("a", "b")) == 1.0 && out(("a", "c")) == -1.0, out.toString)
    assert(out(("b", "c")) == -1.0)
    assert(math.abs(out(("a", "d"))) < 0.3) // mod-7 sawtooth ≈ uncorrelated
  }

  test("freshnessReport: lag vs freshest source, trailing windows counted from the global max") {
    val t0 = 1700000000L
    def ts(off: Long) = new java.sql.Timestamp((t0 + off) * 1000L)
    val df = Seq(("a", ts(0)), ("a", ts(604800L)), ("b", ts(0)), ("b", ts(500000L)))
      .toDF("src", "ts")
    val out = Analytics.freshnessReport(df, "src", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((2L, 0L, 1L, 2L)), out.toString)   // fresh; day window catches 1
    assert(out("b") == ((2L, 104800L, 0L, 2L)), out.toString) // stale by 104800 s
  }

  test("seasonalNaiveEval: exact weekly pattern → seasonal MAPE 0 while naive pays the swings") {
    val days = (1 to 28).map(i => (f"d$i%03d", (if (i % 7 == 0) 100L else 10L)))
      .toDF("day", "n")
    val out = Analytics.seasonalNaiveEval(days, "day", "n")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("seasonal_lag7")._1 == 21L)
    assert(out("seasonal_lag7")._2 == 0.0 && out("seasonal_lag7")._3 == 0.0)
    assert(out("naive_lag1")._2 > 0.0, out.toString)
  }

  test("captureRecapture: recovers a known population; zero overlap degrades gracefully") {
    // population 1..100; sample A = multiples of 2 (50), B = multiples of 3 (33),
    // overlap = multiples of 6 (16) → Chapman (51·34/17)−1 = 101
    val pop = (1L to 100L)
    val a = pop.filter(_ % 2 == 0).toDF("k")
    val b = pop.filter(_ % 3 == 0).toDF("k")
    val r = Analytics.captureRecapture(a, "k", b, "k").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((50L, 33L, 16L)))
    assert(r.getDouble(3) == 101.0, r.toString) // Chapman lands on the truth
    assert(math.abs(r.getDouble(4) - 50.0 * 33 / 16) < 1e-9)
    val disjoint = Analytics.captureRecapture(a, "k",
      Seq(1001L, 1002L).toDF("k"), "k").head()
    assert(disjoint.getLong(2) == 0L && disjoint.isNullAt(4)) // LP undefined
  }

  test("flattenJson: typed fields out; malformed/null flagged not dropped; valid-but-missing field stays valid") {
    val df = Seq(
      (1L, """{"k": 7, "s": "x"}"""),
      (2L, """{"s": "y"}"""),      // valid, k absent
      (3L, "{definitely not json"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val out = Analytics.flattenJson(df, "props", "k BIGINT, s STRING")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) null else r.getLong(2): Any),
          r.getString(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((7L, "x", true)), out.toString)
    assert(out(2L) == ((null, "y", true)), out.toString)
    assert(out(3L)._3 == false && out(4L)._3 == false, out.toString)
    assert(out.size == 4) // nothing dropped
  }

  test("ewmaSeries: constant is a fixed point; hand-weighted 3-point value; step converges toward new level") {
    val const = (1 to 40).map(i => (f"d$i%03d", 7.0)).toDF("day", "n")
    val c = Analytics.ewmaSeries(const, "day", "n", alpha = 0.1, window = 30)
      .collect().map(_.getDouble(2))
    // Σ(7·wⱼ)/Σwⱼ ≈ 7 to ulps (the two sums round independently)
    assert(c.forall(v => math.abs(v - 7.0) < 1e-12), c.mkString(","))
    val three = Seq(("d1", 1.0), ("d2", 2.0), ("d3", 6.0)).toDF("day", "n")
    val e3 = Analytics.ewmaSeries(three, "day", "n", 0.1, 30).collect().map(_.getDouble(2))
    // rev at d3 = [6, 2, 1], weights [1, .9, .81]
    assert(math.abs(e3(2) - (6.0 + 0.9 * 2.0 + 0.81 * 1.0) / (1.0 + 0.9 + 0.81)) < 1e-12)
    assert(e3(0) == 1.0)
    // level shift 0→10 at step 20: smoothed value climbs toward 10
    val step = (1 to 40).map(i => (f"d$i%03d", if (i <= 20) 0.0 else 10.0)).toDF("day", "n")
    val s = Analytics.ewmaSeries(step, "day", "n", 0.1, 30).collect().map(_.getDouble(2))
    assert(s(19) == 0.0 && s(39) > 8.0 && s(39) < 10.0, s"${s(19)} ${s(39)}")
  }

  test("joinKeyOverlapEstimate: within 5% of exact on planted overlap") {
    val a = (1L to 1000L).toDF("k")
    val b = (500L to 1500L).toDF("k")
    val r = Analytics.joinKeyOverlapEstimate(a, "k", b, "k").head()
    assert(math.abs(r.getLong(0) - 1000L) <= 50, r.toString)
    assert(math.abs(r.getLong(1) - 1001L) <= 50, r.toString)
    assert(math.abs(r.getLong(3) - 501L) <= 75, r.toString) // intersection
    // disjoint sets: estimated intersection collapses to ~0 (clamped ≥ 0)
    val d = Analytics.joinKeyOverlapEstimate(a, "k", (5000L to 6000L).toDF("k"), "k").head()
    assert(d.getLong(3) <= 60, d.toString)
  }

  test("topPaths: ordered opening paths, truncation at firstN, count-then-path tie order") {
    val t0 = 1700000000L
    def ts(off: Long) = new java.sql.Timestamp((t0 + off) * 1000L)
    val df = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "c"),
      (2L, 4L, ts(0), "a"), (2L, 5L, ts(1), "b"), (2L, 6L, ts(2), "c"),
      (3L, 7L, ts(0), "a"), (3L, 8L, ts(1), "z"),
      (4L, 9L, ts(0), "q")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.topPaths(df, "user_id", "ts", "event_id", "event_type",
      firstN = 2, k = 10).collect().map(r => (r.getString(0), r.getLong(1)))
    // truncation at 2 → users 1,2 share "a>b"; ties (1) order by path
    assert(out.toSeq == Seq(("a>b", 2L), ("a>z", 1L), ("q", 1L)), out.mkString(","))
    val deep = Analytics.topPaths(df.repartition(7), "user_id", "ts", "event_id",
      "event_type", firstN = 5, k = 10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(deep.toSeq == Seq(("a>b>c", 2L), ("a>z", 1L), ("q", 1L)))
  }

  test("debounce: burst leaders only, gap measured to previous event, key-isolated") {
    val t0 = 1700000000L
    def ts(off: Long) = new java.sql.Timestamp((t0 + off) * 1000L)
    val df = Seq(
      // user 1 click: burst at 0,10,20 (one leader), lull, burst at 100
      (1L, "click", 1L, ts(0)), (1L, "click", 2L, ts(10)), (1L, "click", 3L, ts(20)),
      (1L, "click", 4L, ts(100)),
      // chained drips 25s apart never exceed the gap: ONE leader total
      (2L, "view", 10L, ts(0)), (2L, "view", 11L, ts(25)), (2L, "view", 12L, ts(50)),
      // same user, different type: independent
      (1L, "view", 20L, ts(5))
    ).toDF("user_id", "event_type", "event_id", "ts")
    val kept = Analytics.debounce(df, "user_id", "event_type", "ts", "event_id", 30)
      .collect().map(_.getLong(2)).toSet
    assert(kept == Set(1L, 4L, 10L, 20L), kept.toString)
  }

  test("poissonBootstrapCI: degenerate distribution collapses, invariant to partitioning") {
    // constant column: every replicate mean IS the constant → CI width 0
    val const = (1L to 200L).map(i => (i, 3.25)).toDF("id", "v")
    val row = Analytics.poissonBootstrapCI(const, "id", "v").collect()(0)
    assert(row.getDouble(0) == 3.25 && row.getDouble(1) == 3.25 &&
      row.getDouble(2) == 3.25 && row.getLong(3) == 40L, row.toString)

    // varied data: CI ordered, replicate count honored, bit-equal under
    // any partitioning (the exactness contract of the integer-sum design)
    val varied = (1L to 500L).map(i => (i, (i % 13).toDouble / 7.0)).toDF("id", "v")
    val a = Analytics.poissonBootstrapCI(varied, "id", "v", b = 10).collect()(0)
    val b = Analytics.poissonBootstrapCI(varied.repartition(7), "id", "v", b = 10).collect()(0)
    assert(a.toSeq == b.toSeq, s"$a vs $b")
    assert(a.getDouble(1) <= a.getDouble(2) && a.getLong(3) == 10L)
  }

  test("seasonalDecompose: pure weekly signal recovered exactly, edges null") {
    // 28 days, count = 100 + (epoch-day mod 7): every full 7-window sums to
    // 721 -> trend exactly 103, seasonal exactly dow-3, residual exactly 0
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 28).flatMap { d =>
      val day = base.plusDays(d)
      val n = 100 + (day.toEpochDay % 7).toInt
      (1 to n).map(i =>
        (java.sql.Timestamp.valueOf(day.atTime(i % 24, 30)), d.toLong * 1000 + i))
    }
    val ev = rows.toDF("ts", "event_id")
    val out = Analytics.seasonalDecompose(ev, "ts").collect()
    assert(out.length == 28)
    out.foreach { r =>
      val (day, n, dow) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(n == 100 + dow, s"$day: n=$n dow=$dow")
      val d = java.time.LocalDate.parse(day).toEpochDay - base.toEpochDay
      if (d >= 3 && d <= 24) {
        assert(r.getDouble(3) == 103.0, s"$day trend ${r.getDouble(3)}")
        assert(r.getDouble(4) == (dow - 3).toDouble, s"$day seasonal")
        assert(r.getDouble(5) == 0.0, s"$day residual ${r.getDouble(5)}")
      } else {
        assert(r.isNullAt(3) && r.isNullAt(5), s"$day edge should be null")
        assert(r.getDouble(4) == (dow - 3).toDouble) // seasonal still joins
      }
    }
    // layout-independence
    val p = Analytics.seasonalDecompose(ev.repartition(11), "ts").collect().map(_.toSeq).toSeq
    assert(p == out.map(_.toSeq).toSeq)
  }

  test("hillTailIndex: exact dyadic case, tie-at-pivot drops the tied value") {
    // top-5 of {16,8,4,2,1,...}: pivot 1, terms ln16..ln2 = (4+3+2+1)ln2
    val vals = Seq(16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = Analytics.hillTailIndex(df, "id", "v", k = 4).collect()(0)
    val expH = (4 to 1 by -1).map(e =>
      math.round(math.log(math.pow(2.0, e)) * 1e6)).sum / 1e6 / 4.0
    assert(r.getLong(0) == 4L && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == expH, s"${r.getDouble(2)} vs $expH")
    // ties at the pivot: {8,4,2,2,2,2}: top-4 = {8,4,2,2}, pivot 2 ties ->
    // every 2 is dropped, k_eff collapses to the strictly-above count
    val tied = Seq(8.0, 4.0, 2.0, 2.0, 2.0, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val t = Analytics.hillTailIndex(tied, "id", "v", k = 3).collect()(0)
    assert(t.getLong(0) == 2L && t.getDouble(1) == 2.0, t.toString)
    // layout-independent
    val big = (1L to 2000L).map(i => (i, 1000.0 / i)).toDF("id", "v")
    val a = Analytics.hillTailIndex(big, "id", "v").collect()(0)
    val b = Analytics.hillTailIndex(big.repartition(13), "id", "v").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("cohortLtv: triangle cells, cumulative against full cohort size") {
    def ts(day: Int, h: Int = 1) =
      java.sql.Timestamp.valueOf(java.time.LocalDate.parse("2024-01-01") // a Monday
        .plusDays(day).atTime(h, 0))
    // cohort W0: users 1,2 (user 2 returns in W1); cohort W1: user 3
    val ev = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 20.0),
      (2L, ts(8), 5.0),                      // W1 revenue for cohort W0
      (3L, ts(9), 7.0)                       // new cohort W1
    ).toDF("user_id", "ts", "value")
    val out = Analytics.cohortLtv(ev, "user_id", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 30.0, 30.0, 15.0)), out.toString)
    assert(out(("2024-01-01", 1L)) == ((2L, 5.0, 35.0, 17.5)), out.toString)
    assert(out(("2024-01-08", 0L)) == ((1L, 7.0, 7.0, 7.0)), out.toString)
    assert(out.size == 3)
  }

  test("changepoint: clean level shift found exactly, degenerate flat series") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse("2024-01-01").plusDays(day).atTime(6, 0))
    // 10 days at 10/day then 10 days at 30/day: split at day 10, both
    // segments constant -> sse_split 0, reduction exactly 1
    val ev = (0 until 20).flatMap { d =>
      (1 to (if (d < 10) 10 else 30)).map(i => (ts(d), d.toLong * 1000 + i))
    }.toDF("ts", "event_id")
    val r = Analytics.changepoint(ev, "ts").collect()(0)
    assert(r.getString(0) == "2024-01-11" && r.getLong(1) == 10L, r.toString)
    assert(r.getDouble(2) == 2000.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
    // layout-independence on a sawtooth (no clean split): the (cost, day)
    // total order makes the argmin deterministic
    val saw = (0 until 14).flatMap { d => (1 to (4 + 3 * (d % 3))).map(i =>
      (ts(d), d.toLong * 100 + i)) }.toDF("ts", "event_id")
    val a = Analytics.changepoint(saw, "ts").collect()(0)
    val b = Analytics.changepoint(saw.repartition(9), "ts").collect()(0)
    assert(a.toSeq == b.toSeq, s"$a vs $b")
  }

  test("windowFunnel: greedy earliest-match, window deadline, max depth per user") {
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse("2024-05-01").plusDays(day).atTime(h, 0))
    val ev = Seq(
      // u1: full chain inside the 7-day window
      (1L, "signup", ts(0, 9)), (1L, "click", ts(1, 9)), (1L, "purchase", ts(2, 9)),
      // u2: purchase lands after the deadline -> stops at depth 2
      (2L, "signup", ts(0, 9)), (2L, "click", ts(1, 9)), (2L, "purchase", ts(9, 9)),
      // u3: signup only
      (3L, "signup", ts(0, 9)),
      // u4: no signup -> not in the funnel at all
      (4L, "click", ts(0, 9)), (4L, "purchase", ts(1, 9)),
      // u5: purchase BEFORE the click must not count (greedy order)
      (5L, "signup", ts(0, 9)), (5L, "purchase", ts(1, 9)), (5L, "click", ts(2, 9))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.windowFunnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L, 2 -> 2L, 3 -> 1L), out.toString)
  }

  test("saxSymbolize: square wave maps to alternating a/d, exact PAA and z") {
    // 4 weeks alternating 10/20 events per day: mean 15, sigma 5, z = ∓1
    val base = java.time.LocalDate.parse("2024-03-04")
    val rows = (0 until 28).flatMap { d =>
      val n = if ((d / 7) % 2 == 0) 10 else 20
      (1 to n).map(i => (java.sql.Timestamp.valueOf(base.plusDays(d).atTime(i % 24, 0)),
        d.toLong * 100 + i))
    }
    val out = Analytics.saxSymbolize(rows.toDF("ts", "event_id"), "ts").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getString(4)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    out.foreach { case (f, (nd, paa, z, sym)) =>
      assert(nd == 7L)
      if (f % 2 == 0) assert(paa == 10.0 && z == -1.0 && sym == "a", s"$f $paa $z $sym")
      else assert(paa == 20.0 && z == 1.0 && sym == "d", s"$f $paa $z $sym")
    }
  }

  test("targetEncode: LOO means exclude the own row; singleton keys fall back to the global LOO mean") {
    import spark.implicits._
    val df = Seq(
      (1L, "k1", 10.0), (2L, "k1", 20.0), (3L, "k1", 30.0),
      (4L, "k2", 100.0)
    ).toDF("id", "key", "y")
    val out = Analytics.targetEncode(df, "id", "key", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 25.0 && out(2L) == 20.0 && out(3L) == 15.0, out.toString)
    // k2 is a singleton: (Σ_all − own)/(n−1) = (160−100)/3
    assert(out(4L) == 20.0, out.toString)
  }

  test("holtForecast: a perfectly linear daily series recovers level c+mT, trend m, forecast c+m(T+7) exactly") {
    import spark.implicits._
    // day t (t=1..5) carries 2+t events ⇒ x_t = 2+t: c=2, m=1
    val rows = for {
      t <- 1 to 5
      i <- 1 to (2 + t)
    } yield ("a", java.sql.Timestamp.valueOf(f"2024-01-${t}%02d 12:00:00"), i)
    val ev = rows.toDF("event_type", "ts", "i")
    val out = Analytics.holtForecast(ev, "event_type", "ts").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 7.0, s"level ${r.getDouble(2)}")   // 2 + 5
    assert(r.getDouble(3) == 1.0, s"trend ${r.getDouble(3)}")
    assert(r.getDouble(4) == 14.0, s"forecast ${r.getDouble(4)}") // 2 + 12
    // single-day key: level = the day's count, zero trend
    val one = Analytics.holtForecast(
      Seq(("b", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1),
          ("b", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2))
        .toDF("event_type", "ts", "i"), "event_type", "ts").collect()(0)
    assert(one.getLong(1) == 1L && one.getDouble(2) == 2.0 && one.getDouble(3) == 0.0)
  }

  test("kendallWithinGroups: hand pair counts, perfect concordance and ties") {
    import spark.implicits._
    // one group, x strictly up, y strictly up → all 3 pairs concordant
    val up = Seq((1L, 1, 1.0, 10.0), (1L, 2, 2.0, 20.0), (1L, 3, 3.0, 30.0))
      .toDF("g", "seq", "x", "y")
    val r = Analytics.kendallWithinGroups(up, "g", "seq", "x", "y").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getDouble(6) == 1.0, r.toString)
    // y reversed → all discordant, tau = −1
    val down = Seq((1L, 1, 1.0, 30.0), (1L, 2, 2.0, 20.0), (1L, 3, 3.0, 10.0))
      .toDF("g", "seq", "x", "y")
    assert(Analytics.kendallWithinGroups(down, "g", "seq", "x", "y")
      .collect()(0).getDouble(6) == -1.0)
    // tie classes: (x tie, y moves) → ties_x; both tie → ties_xy; pairs
    // NEVER cross groups (two groups of 2 → 2 pairs, not 6)
    val mixed = Seq((1L, 1, 1.0, 1.0), (1L, 2, 1.0, 2.0),
                    (2L, 1, 5.0, 5.0), (2L, 2, 5.0, 5.0))
      .toDF("g", "seq", "x", "y")
    val m = Analytics.kendallWithinGroups(mixed, "g", "seq", "x", "y").collect()(0)
    assert(m.getLong(0) == 2 && m.getLong(3) == 1 && m.getLong(5) == 1, m.toString)
    assert(m.isNullAt(6), m.toString) // all pairs tied on x → denom 0
  }

  test("kdeGrid: mass integrates to ~1, peaks at the data, engine-stable quantization") {
    import spark.implicits._
    val df = (Seq.fill(50)(100.0) ++ Seq.fill(50)(300.0)).toDF("v")
    val out = Analytics.kdeGrid(df, col("v"), 0.0, 400.0, 41, 20.0)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // trapezoid integral over the grid ≈ 1 (two Gaussians fully inside)
    val step = 10.0
    val integral = out.values.sum * step
    assert(math.abs(integral - 1.0) < 0.02, integral.toString)
    // bimodal: density at the two modes far above the valley
    assert(out(100.0) > 4 * out(200.0) && out(300.0) > 4 * out(200.0), out.toString)
    // symmetric data → symmetric density
    assert(out(100.0) == out(300.0), out.toString)
    val p = Analytics.kdeGrid(df.repartition(7), col("v"), 0.0, 400.0, 41, 20.0)
      .collect().map(_.toSeq)
    assert(p.toSeq == Analytics.kdeGrid(df, col("v"), 0.0, 400.0, 41, 20.0)
      .collect().map(_.toSeq).toSeq)
  }

  test("incrementalJoinDelta: the three-way delta equals full-join minus old-join") {
    import spark.implicits._
    val lOld = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val lNew = Seq((1L, 30.0), (3L, 40.0)).toDF("k", "v")
    val rOld = Seq((1L, "a"), (3L, "b")).toDF("k", "g")
    val rNew = Seq((2L, "a"), (1L, "c")).toDF("k", "g")
    val delta = Analytics.incrementalJoinDelta(lOld, lNew, rOld, rNew,
        "k", "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // full join minus old join, by hand:
    // old = {1⋈a(10)}            full adds: 1⋈a(30), 1⋈c(10), 1⋈c(30),
    //                            2⋈a(20), 3⋈b(40)
    assert(delta == Map("a" -> ((2L, 50.0)), "b" -> ((1L, 40.0)),
      "c" -> ((2L, 40.0))), delta.toString)
  }

  test("kneePoint: finds the bend of a piecewise-linear curve; direction flag") {
    import spark.implicits._
    // concave: steep rise to (3, 90) then flat to (10, 97) → knee at 3
    val concave = Seq((0L, 0L), (1L, 30L), (2L, 60L), (3L, 90L), (4L, 91L),
      (5L, 92L), (6L, 93L), (7L, 94L), (8L, 95L), (9L, 96L), (10L, 97L))
      .toDF("x", "y")
    val k = Analytics.kneePoint(concave, "x", "y", concave = true).collect()(0)
    assert(k.getLong(0) == 3L && k.getLong(1) == 90L, k.toString)
    // convex mirror (slow then steep) with the convex flag → bend at 7
    val convex = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
      (5L, 5L), (6L, 6L), (7L, 7L), (8L, 37L), (9L, 67L), (10L, 97L))
      .toDF("x", "y")
    val kc = Analytics.kneePoint(convex, "x", "y", concave = false).collect()(0)
    assert(kc.getLong(0) == 7L, kc.toString)
  }

  test("markovEntropyRate: deterministic chains score 0 bits; a fair branch scores 0.5") {
    import spark.implicits._
    def ev(u: Long, i: Int, t: String) =
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"), u, t)
    // user 1 strictly alternates a→b→a→b: every transition deterministic
    val cycle = (0 until 20).map(i => ev(1L, i, if (i % 2 == 0) "a" else "b"))
    val h0 = Analytics.markovEntropyRate(cycle.toDF("event_id", "ts", "user_id", "event_type"),
      "user_id", "ts", "event_id", "event_type").collect()(0)
    assert(h0.getLong(0) == 2 && math.abs(h0.getDouble(2)) < 1e-9, h0.toString)
    // a → (b|c) evenly, b→a, c→a: H = π(a)·1 bit = (20/39 of the 39
    // transitions start at a) ≈ 0.5128
    val branch = (0 until 40).map { i =>
      val t = (i % 4) match { case 0 => "a"; case 1 => "b"; case 2 => "a"; case _ => "c" }
      ev(1L, i, t)
    }
    val h1 = Analytics.markovEntropyRate(branch.toDF("event_id", "ts", "user_id", "event_type"),
      "user_id", "ts", "event_id", "event_type").collect()(0)
    assert(math.abs(h1.getDouble(2) - 20.0 / 39.0) < 1e-6, h1.toString)
  }

  test("kFoldCv: constant-within-group values give MSE 0; spread shows up in every fold") {
    import spark.implicits._
    val const = (1 to 200).map(i => (i.toLong, s"g${i % 4}", 100.0 + (i % 4)))
    val c = Analytics.kFoldCv(const.toDF("id", "g", "v"), "id", "g", "v")
      .collect()
    assert(c.length == 5 && c.forall(_.getDouble(2) == 0.0), c.mkString(";"))
    assert(c.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    assert(c.map(_.getLong(1)).sum == 200)
    val spread = (1 to 200).map(i => (i.toLong, s"g${i % 4}", (i % 10) * 1000.0))
    val s = Analytics.kFoldCv(spread.toDF("id", "g", "v"), "id", "g", "v").collect()
    assert(s.forall(_.getDouble(2) > 1e5), s.mkString(";"))
    // repartitioning cannot move a number (exact integer pipeline)
    val p = Analytics.kFoldCv(spread.toDF("id", "g", "v").repartition(7), "id", "g", "v")
      .collect().map(_.toSeq).toSeq
    assert(p == s.map(_.toSeq).toSeq)
  }

  test("sloBurn: a lone spike trips only the short window; a sustained burn alerts") {
    import spark.implicits._
    def h(i: Int, err: Boolean, k: Int) = (1 to k).map(_ =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"), err))
    // hours 0-9 at 10% errors (budget 25% → burn 0.4); hour 5 spikes to
    // 50% for one hour (short burn 2, long stays < 1 → NO alert);
    // hours 10-15 sustain 50% (both windows > 1 → alert)
    val rows = (0 to 9).flatMap { i =>
      val errs = if (i == 5) 10 else 2
      h(i, err = true, errs) ++ h(i, err = false, 20 - errs)
    } ++ (10 to 15).flatMap(i => h(i, err = true, 10) ++ h(i, err = false, 10))
    val out = Analytics.sloBurn(rows.toDF("ts", "e"), "ts", col("e"), budget = 0.25)
      .collect().map(r => r.getString(0).takeRight(2) ->
        ((r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(out("05") == ((2.0, 0.666667, 0)), out.toString) // spike, no alert
    assert(out("04")._3 == 0 && out("09")._3 == 0)
    // the sustained burn needs the long window to catch up: alert from 12
    assert(out("11")._3 == 0 && out("12")._3 == 1, out.toString)
    assert(out("15") == ((2.0, 2.0, 1)), out.toString)
  }

  test("durbinWatson: alternating residuals read ≈ 4; an exact linear series is degenerate") {
    import spark.implicits._
    def day(i: Int) = f"2024-01-$i%02d"
    // counts 10, 11, 10, 11… over 20 days: zero slope, residuals ±0.5
    // alternating → DW = Σ(2·0.5)²·(n−1) / Σ0.25·n ≈ 4·19/20
    val alt = (1 to 20).flatMap(i => (1 to (10 + i % 2)).map(_ =>
      java.sql.Timestamp.valueOf(s"${day(i)} 10:00:00"))).toDF("ts")
    val r = Analytics.durbinWatson(alt, "ts").collect()(0)
    assert(r.getLong(0) == 20)
    assert(r.getDouble(1) > 3.5 && r.getDouble(1) <= 4.0, r.toString)
    // exactly linear counts (t+1 per day): residuals identically 0 → null
    val lin = (1 to 10).flatMap(i => (1 to (i + 1)).map(_ =>
      java.sql.Timestamp.valueOf(s"${day(i)} 10:00:00"))).toDF("ts")
    assert(Analytics.durbinWatson(lin, "ts").collect()(0).isNullAt(1))
  }

  test("copulaGrid: monotone dependence fills the diagonal; ties land in one bucket") {
    import spark.implicits._
    // y = x over 100 distinct values → every decile maps to itself: 10
    // cells of 10 on the diagonal
    val mono = (1 to 100).map(i => (i.toDouble, i * 2.0)).toDF("x", "y")
    val g = Analytics.copulaGrid(mono, "x", "y", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(g.size == 10 && (0 until 10).forall(i => g((i.toLong, i.toLong)) == 10L), g.toString)
    // y = −x → anti-diagonal
    val anti = (1 to 100).map(i => (i.toDouble, -i * 1.0)).toDF("x", "y")
    val ga = Analytics.copulaGrid(anti, "x", "y", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert((0 until 10).forall(i => ga((i.toLong, (9 - i).toLong)) == 10L), ga.toString)
    // all-tied y: the single y value's average rank (n+1)/2 puts ALL
    // mass in one y-bucket (⌊(2·avgRank−2)·k/2n⌋ = ⌊100·10/200⌋ = 5),
    // never split
    val tied = (1 to 100).map(i => (i.toDouble, 7.0)).toDF("x", "y")
    val gt = Analytics.copulaGrid(tied, "x", "y", 10).collect()
    assert(gt.forall(_.getLong(1) == 5L), gt.mkString(";"))
  }

  test("dispersionCheck: bursty arrivals read VMR >> 1; regular flow reads < 1") {
    import spark.implicits._
    def ts(day: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:${i % 60}%02d")
    // regular: exactly 5/day over 6 days → variance 0 → VMR 0
    val regular = (1 to 6).flatMap(d => (1 to 5).map(i => ("steady", ts(d, i))))
    // bursty: 20 on one day, 1 on each of five days → VMR ≈ 12
    val bursty = (1 to 20).map(i => ("bursty", ts(1, i))) ++
      (2 to 6).map(d => ("bursty", ts(d, 0)))
    val out = Analytics.dispersionCheck((regular ++ bursty).toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3), r.getInt(4)))).toMap
    assert(out("steady") == ((6L, 0.0, 0)), out.toString)
    // mean = 25/6; var = (Σx²−(Σx)²/n)/(n−1) = (425−625/6)/5 = 64.166…;
    // VMR = 15.4 → overdispersed
    assert(out("bursty")._1 == 6L && out("bursty")._2 > 10 && out("bursty")._3 == 1, out.toString)
  }

  test("joinSizeEstimate: uniform keys estimate exactly; planted skew underestimates") {
    import spark.implicits._
    // uniform: 4 keys × 1 on each side → actual 4, est = 4·4/4 = 4
    val u = (1 to 4).map(i => (i.toLong, s"x$i")).toDF("k", "v")
    val r = Analytics.joinSizeEstimate(u, u, "k", "k").collect()(0)
    assert(r.getLong(5) == 4L && r.getDouble(4) == 4.0 && r.getDouble(6) == 0.0, r.toString)
    // skew: one hot key with 10 rows per side among 11 keys →
    // actual = 100 + 10 = 110; est = 20·20/11 ≈ 36.4 → ~3× under
    val s = ((1 to 10).map(_ => (0L, "hot")) ++ (1 to 10).map(i => (i.toLong, "cold")))
      .toDF("k", "v")
    val rs = Analytics.joinSizeEstimate(s, s, "k", "k").collect()(0)
    assert(rs.getLong(5) == 110L, rs.toString)
    assert(rs.getDouble(6) < -0.6, rs.toString) // est ≪ actual on skew
    // disjoint keys: actual 0, rel_err undefined
    val d = Analytics.joinSizeEstimate(u, u.select((col("k") + 100).as("k"), col("v")),
      "k", "k").collect()(0)
    assert(d.getLong(5) == 0L && d.isNullAt(6))
  }

  test("functionalDependencies: planted FD holds; violations counted per lhs value") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "p"), (2L, "a", "p"), (3L, "b", "q"),
      (4L, "b", "r"),               // b maps to q AND r → c1→c2 fails via...
      (5L, "c", "p")
    ).toDF("id", "c1", "c2")
    val out = Analytics.functionalDependencies(df,
        Seq(("id", "c1"), ("c1", "c2"), ("c2", "c1")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(out(("id", "c1")) == ((5L, 0L, 1L, 1)), out.toString)   // PK → holds
    assert(out(("c1", "c2")) == ((3L, 1L, 2L, 0)), out.toString)   // b has 2 images
    // c2→c1: p maps to {a, c}, q→{b}, r→{b} → 1 violating of 3
    assert(out(("c2", "c1")) == ((3L, 1L, 2L, 0)), out.toString)
  }

  test("streakHistogram: islands split on gaps, histogram counts keys and streaks") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val df = Seq(
      ("u1", d("2024-01-01")), ("u1", d("2024-01-02")), ("u1", d("2024-01-03")),
      ("u1", d("2024-01-10")),                       // u1: streak 3 + streak 1
      ("u2", d("2024-01-01")), ("u2", d("2024-01-02")),
      ("u2", d("2024-01-02")),                       // duplicate day collapses
      ("u2", d("2024-02-01")), ("u2", d("2024-02-02"))  // u2: two streaks of 2
    ).toDF("k", "day")
    val out = Analytics.streakHistogram(df, "k", col("day"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L)), 3L -> ((1L, 1L))), out.toString)
  }

  test("theilDecomposition: equal within ⇒ T_within 0 and total = between; full equality ⇒ all 0") {
    val df = Seq(("g1", 10L), ("g1", 10L), ("g2", 30L), ("g2", 30L)).toDF("g", "v")
    val out = Analytics.theilDecomposition(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getDouble(4) == 0.0 && out("g2").getDouble(4) == 0.0, "within")
    val tb = 0.25 * math.log(0.25 / 0.5) + 0.75 * math.log(0.75 / 0.5)
    assert(math.abs(out("g1").getDouble(5) - tb) < 1e-8, "between")
    assert(out("g1").getDouble(6) == out("g1").getDouble(5), "total = between")
    val eq = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val r = Analytics.theilDecomposition(eq, "g", col("v")).collect()(0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("theilDecomposition: zero values contribute zero, not a crash") {
    val df = Seq(("g", 0L), ("g", 10L), ("g", 10L)).toDF("g", "v")
    val r = Analytics.theilDecomposition(df, "g", col("v")).collect()(0)
    // within: two equal positive values + a zero: Σ (10/20)·ln(10·3/20) =
    // ln(1.5) exactly (the zero row adds nothing)
    assert(math.abs(r.getDouble(4) - math.log(1.5)) < 1e-8, r.toString)
  }

  test("moransI: constant-per-cell ⇒ I = 1 exactly; within-cell alternation ⇒ I = −1") {
    // cellSize 10: two cells on the x axis
    val clustered = Seq((1L, 0L, 0L, 5L), (2L, 1L, 0L, 5L),
      (3L, 10L, 0L, 9L), (4L, 11L, 0L, 9L)).toDF("id", "x", "y", "v")
    val r = Analytics.moransI(clustered, "id", "x", "y", "v", 10L).collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 4, "two cells, 4 ordered pairs")
    assert(r.getDouble(3) == 1.0, r.toString)
    assert(math.abs(r.getDouble(4) - (-1.0 / 3)) < 1e-8, "E[I] = −1/(n−1)")
    val dispersed = Seq((1L, 0L, 0L, 0L), (2L, 1L, 0L, 2L),
      (3L, 10L, 0L, 0L), (4L, 11L, 0L, 2L)).toDF("id", "x", "y", "v")
    val r2 = Analytics.moransI(dispersed, "id", "x", "y", "v", 10L).collect()(0)
    assert(r2.getDouble(3) == -1.0, r2.toString)
    // constant field → zero variance → NULL, not a crash
    val flat = Seq((1L, 0L, 0L, 7L), (2L, 1L, 0L, 7L)).toDF("id", "x", "y", "v")
    assert(Analytics.moransI(flat, "id", "x", "y", "v", 10L).collect()(0).isNullAt(3))
  }

  test("getisOrdG: high-value cell concentration lifts G above E[G]") {
    // cell A holds the high values, cell B the low: within-cell products
    // over-represent high×high → G > W/(n(n−1))
    val hot = Seq((1L, 0L, 0L, 10L), (2L, 1L, 0L, 10L),
      (3L, 10L, 0L, 1L), (4L, 11L, 0L, 1L)).toDF("id", "x", "y", "v")
    val r = Analytics.getisOrdG(hot, "id", "x", "y", "v", 10L).collect()(0)
    // num = (20²−200)+(2²−2) = 202; den = 22²−202 = 282; E = 4/12
    assert(math.abs(r.getDouble(3) - 202.0 / 282.0) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-9)
    assert(r.getDouble(3) > r.getDouble(4), "high values cluster ⇒ G > E[G]")
    // mixed cells (one high + one low each) push G BELOW expectation
    val mixed = Seq((1L, 0L, 0L, 10L), (2L, 1L, 0L, 1L),
      (3L, 10L, 0L, 10L), (4L, 11L, 0L, 1L)).toDF("id", "x", "y", "v")
    val m = Analytics.getisOrdG(mixed, "id", "x", "y", "v", 10L).collect()(0)
    assert(m.getDouble(3) < m.getDouble(4), m.toString)
  }

  test("lastDigitUniformity: all-.00 endings max the χ²; uniform endings zero it") {
    val fab = (1 to 10).map(i => Tuple1(BigDecimal(i * 100))).toDF("amt")
    val r = Analytics.lastDigitUniformity(fab, col("amt"), topK = 1).collect()(0)
    // χ² = (100·n² − n²)/n = 99n = 990; the one ending is .00
    assert(r.getLong(0) == 0 && r.getLong(1) == 10 && r.getDouble(4) == 990.0, r.toString)
    val u = Analytics.lastDigitUniformity(
      (0 until 100).map(c => Tuple1(BigDecimal(700 + c, 2))).toDF("amt"),
      col("amt"), topK = 3).collect()
    assert(u.forall(_.getDouble(4) == 0.0), "uniform endings ⇒ χ² 0")
  }

  test("interruptedSeries: exact slopes, level change at the knot, slope change") {
    // pre (t = −3..−1): y = 10, 12, 14 → slope 2, fit at t=0 is 16
    // post (t = 0..2): y = 30, 31, 32 → slope 1, intercept 30
    // level change = 30 − 16 = 14; slope change = 1 − 2 = −1
    val days = Seq(("2024-01-13", 10), ("2024-01-14", 12), ("2024-01-15", 14),
      ("2024-01-16", 30), ("2024-01-17", 31), ("2024-01-18", 32))
    val rows = days.flatMap { case (d, n) =>
      Seq.fill(n)(java.sql.Timestamp.valueOf(s"$d 12:00:00")) }
    val r = Analytics.interruptedSeries(rows.map(Tuple1(_)).toDF("ts"),
      "ts", "2024-01-16").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3, r.toString)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0, r.toString)
    assert(r.getDouble(4) == -1.0 && r.getDouble(5) == 14.0, r.toString)
  }

  test("positionAttribution: 40/20/40 U-shape, 50/50 at k=2, full credit at k=1") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      // user 1: view, click, view → purchase (k=3: 0.4 + 0.2 + 0.4)
      (1L, ts(1), 101L, "view"), (1L, ts(2), 102L, "click"),
      (1L, ts(3), 103L, "view"), (1L, ts(4), 104L, "purchase"),
      // user 2: click, view → purchase (k=2: 0.5 each)
      (2L, ts(1), 201L, "click"), (2L, ts(2), 202L, "view"),
      (2L, ts(3), 203L, "purchase"),
      // user 3: single click → purchase (k=1: 1.0)
      (3L, ts(1), 301L, "click"), (3L, ts(2), 302L, "purchase"),
      // user 4: touch AFTER the purchase — no credit
      (4L, ts(5), 401L, "view"), (4L, ts(4), 402L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.positionAttribution(rows, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view", "click"), windowDays = 7)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // view: 0.4+0.4 (u1) + 0.5 (u2) = 1.3; click: 0.2 (u1) + 0.5 (u2) + 1.0 (u3)
    assert(out("view") == ((1.3, 3L, 2L)), out.toString)
    assert(out("click") == ((1.7, 3L, 3L)), out.toString)
  }

  test("medianOfMeans: one whale drags the mean, not the median of means") {
    val uniform = (1L to 45L).map(i => (i, 5.0)).toDF("id", "v")
    val u = Analytics.medianOfMeans(uniform, "id", col("v")).collect()(0)
    assert(u.getLong(0) == 9 && u.getLong(1) == 45)
    assert(u.getDouble(2) == 5.0 && u.getDouble(3) == 5.0, u.toString)
    val whale = ((1L to 40L).map(i => (i, 1.0)) :+ (999L, 10000.0)).toDF("id", "v")
    val w = Analytics.medianOfMeans(whale, "id", col("v")).collect()(0)
    assert(w.getDouble(2) > 200.0, s"global mean poisoned: $w")
    assert(w.getDouble(3) < 5.0, s"median of means robust: $w")
  }

  test("concentrationProfile: monopoly ⇒ HHI 1 / H 0; uniform ⇒ HHI 1/k, evenness 1") {
    val df = (Seq.fill(4)(("mono", "only")) ++
      Seq(("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d"))).toDF("g", "c")
    val out = Analytics.concentrationProfile(df, "g", "c")
      .collect().map(r => r.getString(0) -> r).toMap
    val m = out("mono")
    assert(m.getDouble(3) == 1.0 && m.getDouble(4) == 0.0 && m.isNullAt(5))
    val u = out("uni")
    assert(u.getDouble(3) == 0.25, "hhi")
    assert(math.abs(u.getDouble(4) - math.log(4.0)) < 1e-9, "shannon")
    assert(u.getDouble(5) == 1.0, "evenness")
  }

  test("shapleyAttribution: 2-channel hand lattice is exact; efficiency holds") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      // journey 1 touches {view}; journey 2 touches {view, click}
      (1L, ts(1), 101L, "view"), (1L, ts(2), 102L, "purchase"),
      (2L, ts(1), 201L, "view"), (2L, ts(2), 202L, "click"),
      (2L, ts(3), 203L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.shapleyAttribution(rows, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view", "click"), windowDays = 7)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // v(∅)=0 v({v})=1 v({c})=0 v({v,c})=2 -> φ_view = 1.5, φ_click = 0.5
    assert(out("view") == ((1.5, 2L)), out.toString)
    assert(out("click") == ((0.5, 1L)), out.toString)
  }

  test("shapleyAttribution: a never-touched channel is a null player (0 credit, others unchanged)") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      (1L, ts(1), 101L, "view"), (1L, ts(2), 102L, "purchase"),
      (2L, ts(1), 201L, "view"), (2L, ts(2), 202L, "click"),
      (2L, ts(3), 203L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.shapleyAttribution(rows, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view", "click", "signup"), windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("signup") == 0.0, out.toString)
    assert(out("view") == 1.5 && out("click") == 0.5, out.toString)
    assert(out.values.sum == 2.0, "efficiency: credit sums to converted journeys")
  }

  test("sequentialPatterns: ordered subsequences only; repeats via distinct times") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "b"), (2L, 2L, "a"),
      (3L, 1L, "a"), (3L, 2L, "a"), (3L, 3L, "a"))
      .toDF("u", "t", "s")
    val out = Analytics.sequentialPatterns(rows, "u", "t", "s", minSupport = 0.3)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("a") == 3 && out("b") == 2 && out("c") == 1, out.toString)
    assert(out("a>b") == 1, "only u1 has a before b")
    assert(out("b>a") == 1, "only u2 has b before a")
    assert(out("a>b>c") == 1, "u1's full journey")
    assert(out("a>a") == 1 && out("a>a>a") == 1, "u3's repeats need distinct times")
    assert(!out.contains("c>a"), "no user ever has c before a")
    assert(!out.contains("b>c>a"), out.toString)
  }

  test("sequentialPatterns: support fraction and the min-support cut are exact") {
    val rows = Seq((1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "b"), (4L, 1L, "b"))
      .toDF("u", "t", "s")
    val out = Analytics.sequentialPatterns(rows, "u", "t", "s", minSupport = 0.5)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == Set(("a", 2L, 0.5), ("b", 2L, 0.5)), out.toSeq.toString)
    val strict = Analytics.sequentialPatterns(rows, "u", "t", "s", minSupport = 0.6)
    assert(strict.count() == 0, "0.5 < 0.6 — everything cut")
  }

  test("sequentialPatterns: a bot-grade actor above the activity cap leaves the mine entirely") {
    val organic = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "a"), (2L, 2L, "b"))
    val bot = (1 to 50).map(i => (9L, i.toLong, if (i % 2 == 0) "a" else "z"))
    val out = Analytics.sequentialPatterns((organic ++ bot).toDF("u", "t", "s"),
        "u", "t", "s", minSupport = 0.3, maxUserEvents = 10)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // denominator = 2 capped actors, not 3; no z-pattern survives at all
    assert(out("a") == ((2L, 1.0)) && out("a>b") == ((2L, 1.0)), out.toString)
    assert(!out.keys.exists(_.contains("z")), s"the bot's alphabet is gone: $out")
  }

  test("sourceInfluence: exact leave-one-out deltas; lone source -> NULL") {
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g2", 10L)).toDF("src", "v")
    val out = Analytics.sourceInfluence(df, "src", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getDouble(2) == 2.0 && out("g2").getDouble(2) == 10.0)
    assert(out("g2").getDouble(3) == 2.0, "4 - 2: g2 pulls the mean up by 2")
    assert(out("g1").getDouble(3) == -6.0, "4 - 10: g1 pulls it down by 6")
    val lone = Analytics.sourceInfluence(df.filter(col("src") === "g1"), "src", col("v"))
      .collect()(0)
    assert(lone.isNullAt(3), "nothing left when the only source is excluded")
  }

  test("periodogram: a planted cosine peaks at k=1; a constant series is silent") {
    def day(i: Int, n: Int) = Seq.fill(n)(java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"))
    // counts 6,5,4,3,2,3,4,5 = 4 + 2cos(2πt/8): all power at k=1
    val counts = Seq(6, 5, 4, 3, 2, 3, 4, 5)
    val wave = counts.zipWithIndex.flatMap { case (c, i) => day(i, c) }
      .map(Tuple1(_)).toDF("ts")
    val pw = Analytics.periodogram(wave, "ts", maxK = 3)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(pw(1)._1 == 8.0, "period n/k")
    // integer counts leak a little into k=3; the fundamental still dominates:
    // C₁ = 4 + 2√2 ≈ 6.828 ⇒ P(1) ≈ 5.828, P(2) = 0 exactly, P(3) ≈ 0.172
    assert(pw(1)._2 > 5.0 && pw(1)._2 < 6.5, s"P(1): ${pw(1)}")
    assert(pw(2)._2 == 0.0, pw.toString)
    assert(pw(1)._2 > 10.0 * pw(3)._2, s"fundamental dominates: $pw")
    val flat = (0 until 8).flatMap(day(_, 5)).map(Tuple1(_)).toDF("ts")
    val fp = Analytics.periodogram(flat, "ts", maxK = 3).collect().map(_.getDouble(2))
    assert(fp.forall(_ == 0.0), s"constant series has no spectral power: ${fp.toSeq}")
  }

  test("periodogram: frequencies at or above the day span are aliased and emit no row") {
    def day(i: Int, n: Int) = Seq.fill(n)(java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"))
    // 3-day span: only k = 1, 2 sit below n; k >= 3 wraps to multiples of 2π
    // (power would collapse to the spurious (Σx)²/n peak)
    val df = Seq(day(0, 4), day(1, 2), day(2, 3)).flatten.map(Tuple1(_)).toDF("ts")
    val ks = Analytics.periodogram(df, "ts", maxK = 5).collect().map(_.getInt(0)).toSeq
    assert(ks == Seq(1, 2), s"aliased k >= n must be dropped: $ks")
  }

  test("rakeWeights: hand 2x2 IPF converges in one pass; weighted margins hit targets") {
    val pop = (Seq.fill(6)(("a1", "b1")) ++ Seq.fill(4)(("a1", "b2")) ++
      Seq.fill(6)(("a2", "b1")) ++ Seq.fill(4)(("a2", "b2"))).toDF("sa", "sb")
    val sample = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("sa", "sb")
    val out = Analytics.rakeWeights(sample, pop, "sa", "sb", iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // row pass: w=5 each; col pass: b1 x 12/10, b2 x 8/10 -> 6/4/6/4; then fixed
    assert(out(("a1", "b1")) == 6.0 && out(("a2", "b1")) == 6.0, out.toString)
    assert(out(("a1", "b2")) == 4.0 && out(("a2", "b2")) == 4.0, out.toString)
    assert(out.values.sum == 20.0, "weights total the population")
  }

  test("rakeWeights: sample category outside the population frame surfaces with NULL weight") {
    val pop = (Seq.fill(6)(("a1", "b1")) ++ Seq.fill(4)(("a1", "b2"))).toDF("sa", "sb")
    val sample = Seq(("a1", "b1"), ("a1", "b2"), ("zz", "b1")).toDF("sa", "sb")
    val out = Analytics.rakeWeights(sample, pop, "sa", "sb", iters = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ghost = out(("zz", "b1"))
    assert(ghost.isNullAt(3) && ghost.isNullAt(4),
      s"unrakeable cell reported with NULL weights, not dropped: $ghost")
    // and the fit runs over matched cells only: both margins recovered exactly
    assert(out(("a1", "b1")).getDouble(3) == 6.0
      && out(("a1", "b2")).getDouble(3) == 4.0, out.toString)
  }

  test("mahalanobisOutliers: off-ridge point tops the ranking; collinear data is degenerate") {
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0), (4L, 4.0, 4.0),
      (5L, 5.0, 5.0), (6L, 6.0, 6.0), (7L, 4.0, 1.0)).toDF("id", "x", "y")
    val out = Analytics.mahalanobisOutliers(pts, "id", col("x"), col("y"), topK = 7)
      .collect()
    assert(out.head.getLong(0) == 7L, s"the off-ridge point ranks first: ${out.head}")
    assert(out.head.getDouble(3) > out(1).getDouble(3), "strictly larger d2")
    val line = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0)).toDF("id", "x", "y")
    assert(Analytics.mahalanobisOutliers(line, "id", col("x"), col("y"), 5).count() == 0,
      "singular covariance (perfectly collinear) yields no scores")
  }

  test("countMinEstimates: never underestimates; wide sketch is exact, narrow collides") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ (1 to 40).map(i => s"k$i"))
      .map(Tuple1(_)).toDF("key")
    val wide = Analytics.countMinEstimates(df, "key", Seq("a", "b", "zzz"),
      width = 4096, depth = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(wide("a") == ((5L, 5L)) && wide("b") == ((3L, 3L)), wide.toString)
    assert(wide("zzz") == ((0L, 0L)), "absent key, no collisions at width 4096")
    val narrow = Analytics.countMinEstimates(df, "key", Seq("a", "b", "zzz"),
      width = 8, depth = 2).collect()
    narrow.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS never underestimates: $r"))
  }

  test("percentileCI: ranks 40/50/61 on 1..100 at the median, hand-exact") {
    val df = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val r = Analytics.percentileCI(df, col("v"), p = 0.5).collect()(0)
    // pn = 50, sd = 1.96·√25 ≈ 9.7998: lo = ⌊40.2⌋ = 40, pt = 50, hi = ⌈59.8⌉+1 = 61
    assert(r.getLong(0) == 100)
    assert(r.getDouble(2) == 40.0 && r.getDouble(3) == 50.0 && r.getDouble(4) == 61.0,
      r.toString)
  }

  test("ridgeRegression2: exact plane at lambda 0; positive lambda shrinks") {
    val df = Seq((0.0, 0.0, 5.0), (1.0, 0.0, 7.0), (0.0, 1.0, 8.0), (1.0, 1.0, 10.0))
      .toDF("x1", "x2", "y")
    val r0 = Analytics.ridgeRegression2(df, col("x1"), col("x2"), col("y"), 0.0)
      .collect()(0)
    assert(r0.getDouble(2) == 2.0 && r0.getDouble(3) == 3.0 && r0.getDouble(4) == 5.0,
      r0.toString)
    val r1 = Analytics.ridgeRegression2(df, col("x1"), col("x2"), col("y"), 1.0)
      .collect()(0)
    assert(r1.getDouble(2) == 1.0 && r1.getDouble(3) == 1.5, s"a11 doubles: $r1")
    assert(r1.getDouble(2) < r0.getDouble(2), "shrinkage")
  }

  test("funnelStepTiming: greedy chain latencies, window cutoff, exact percentiles") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      // u1 converts a>b in 60s, b>c in 120s
      (1L, ts(0), "a"), (1L, ts(1), "b"), (1L, ts(3), "c"),
      // u2 converts a>b in 180s, never c
      (2L, ts(0), "a"), (2L, ts(3), "b"),
      // u3: b BEFORE a — not a conversion
      (3L, ts(1), "b"), (3L, ts(2), "a"),
      // u4: b far outside the window
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (4L, java.sql.Timestamp.valueOf("2024-02-01 10:00:00"), "b"))
      .toDF("user_id", "ts", "event_type")
    val out = Analytics.funnelStepTiming(rows, "user_id", "ts", "event_type",
      Seq("a", "b", "c"), windowDays = 7)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a>b") == ((2L, 120.0, 168.0)), s"median of 60/180, p90 interpolated: ${out("a>b")}")
    assert(out("b>c") == ((1L, 120.0, 120.0)), out("b>c").toString)
  }
}
