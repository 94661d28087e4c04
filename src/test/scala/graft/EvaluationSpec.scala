package graft

import org.apache.spark.sql.functions._
import graft.operators.Evaluation

/** Model-evaluation / drift metrics: the distributed prefix scan, exact
  * grouped AUC (ties, degenerate groups), PSI (zero on identity, large on
  * shift), two-sample KS, and per-class precision/recall/F1. */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("globalCumSum: equals a single-partition window cumsum, at any partitioning") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("k", "n")
    val expected = df.orderBy("k").collect()
      .scanLeft((0L, 0L)) { case ((_, cum), r) => (r.getLong(0), cum + r.getLong(1)) }
      .drop(1).toMap
    for (parts <- Seq(1, 3, 8)) {
      val out = Evaluation.globalCumSum(df.repartition(parts), Seq("k"), Seq("n"))
        .select("k", "cum_n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"at $parts partitions")
    }
  }

  test("groupedAuc: perfect separation is 1, anti-separation is 0, all-ties is 0.5") {
    val df = Seq(
      // g1: every positive scores above every negative
      ("g1", 10.0, true), ("g1", 9.0, true), ("g1", 2.0, false), ("g1", 1.0, false),
      // g2: reversed
      ("g2", 1.0, true), ("g2", 2.0, true), ("g2", 9.0, false), ("g2", 10.0, false),
      // g3: one shared score
      ("g3", 5.0, true), ("g3", 5.0, true), ("g3", 5.0, false), ("g3", 5.0, false)
    ).toDF("grp", "score", "y")
    val out = Evaluation.groupedAuc(df, "grp", col("y"), "score")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g1") == 1.0)
    assert(out("g2") == 0.0)
    assert(out("g3") == 0.5)
  }

  test("groupedAuc: average-rank tie handling matches the hand-computed U") {
    // scores: pos {3, 2}, neg {3, 1} → pairs: (3,3)=0.5 (3,1)=1 (2,3)=0 (2,1)=1
    // U = 2.5, P·N = 4 → AUC = 0.625
    val df = Seq(("g", 3.0, true), ("g", 2.0, true), ("g", 3.0, false), ("g", 1.0, false))
      .toDF("grp", "score", "y")
    val r = Evaluation.groupedAuc(df, "grp", col("y"), "score").head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.625)
  }

  test("groupedAuc: a group missing one class yields NULL, not a crash") {
    val df = Seq(("only_pos", 1.0, true), ("only_pos", 2.0, true)).toDF("grp", "score", "y")
    val r = Evaluation.groupedAuc(df, "grp", col("y"), "score").head()
    assert(r.isNullAt(3))
  }

  test("psi: identical samples score exactly 0; a shifted sample clears the 0.25 alarm") {
    val base = (1 to 1000).map(i => i.toDouble % 100).toDF("v")
    val same = Evaluation.psi(base, base, "v", 10).head().getDouble(2)
    assert(same == 0.0) // equal counts → p == q in every bin → every term 0
    val shifted = (1 to 1000).map(i => (i.toDouble % 100) + 80.0).toDF("v")
    val drift = Evaluation.psi(base, shifted, "v", 10).head().getDouble(2)
    assert(drift > 0.25, s"psi=$drift")
  }

  test("psi: actual values outside the expected range clamp into edge bins") {
    val e = (1 to 100).map(_.toDouble).toDF("v")
    val a = Seq(-1000.0, 2000.0).toDF("v")
    val detail = Evaluation.psiDetail(e, a, "v", 10)
      .select("bin", "actual_n").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(detail(0) == 1L && detail(9) == 1L)
  }

  test("ksTest: identical samples give D=0; disjoint ranges give D=1; hand case checks") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(Evaluation.ksTest(a, a, "v").head().getDouble(2) == 0.0)
    val b = Seq(10.0, 11.0).toDF("v")
    assert(Evaluation.ksTest(a, b, "v").head().getDouble(2) == 1.0)
    // a = {1,2,3,4}, c = {2,3,5}: max gap at v=4: F_a=1, F_c=2/3 → 1/3
    val c = Seq(2.0, 3.0, 5.0).toDF("v")
    val r = Evaluation.ksTest(a, c, "v").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-15)
  }

  test("classificationMetrics: hand-computed confusion matrix, absent class scores 0") {
    // actual:    A A A B B C
    // predicted: A A B B A A  (C never predicted; no actual matches pred-only class)
    val df = Seq(("A", "A"), ("A", "A"), ("A", "B"), ("B", "B"), ("B", "A"), ("C", "A"))
      .toDF("actual", "predicted")
    val out = Evaluation.classificationMetrics(df, "actual", "predicted")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), (r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val ((sa, pa, ta), (precA, recA, f1A)) = out("A")
    assert((sa, pa, ta) == ((3L, 4L, 2L)))
    assert(precA == 0.5 && recA == 2.0 / 3.0)
    assert(math.abs(f1A - 2 * 0.5 * (2.0 / 3.0) / (0.5 + 2.0 / 3.0)) < 1e-15)
    val ((sb, pb, tb), (precB, recB, _)) = out("B")
    assert((sb, pb, tb) == ((2L, 2L, 1L)))
    assert(precB == 0.5 && recB == 0.5)
    val ((sc, pc, tc), (precC, recC, f1C)) = out("C")
    assert((sc, pc, tc) == ((1L, 0L, 0L)))
    assert(precC == 0.0 && recC == 0.0 && f1C == 0.0)
  }

  test("calibration: perfectly calibrated bins have zero ECE terms; miscalibration shows") {
    // bin b: 200 rows at score (b+0.5)/10 with exactly (b+0.5)·20 positives
    // → accuracy equals confidence in every bin
    val rows = for {
      b <- 0 until 10
      i <- 0 until 200
    } yield ((b + 0.5) / 10.0, i < ((b + 0.5) * 20).toInt)
    val df = rows.toDF("score", "label")
    val out = Evaluation.calibration(df, col("score"), col("label"), 10).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(1) == 200L)
      assert(r.getDouble(3) == r.getDouble(4), s"bin ${r.getLong(0)}") // conf == acc
      assert(r.getDouble(5) == 0.0)
    }
    // flip bin 0's labels: acc 0.95 vs conf 0.05 → term (200/2000)·0.9 = 0.09
    val bad = rows.map { case (s, y) => (s, if (s < 0.1) !y else y) }.toDF("score", "label")
    val badOut = Evaluation.calibration(bad, col("score"), col("label"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(math.abs(badOut(0L) - 0.09) < 1e-9, badOut(0L).toString)
  }

  test("abTest: hand-computed z and lift; control row carries nulls") {
    // control (arm 0): 100 exposures, 20 successes; arm 1: 100/30; arm 2: 50/10
    val rows = (1 to 100).map(i => ("0", i <= 20)) ++
      (1 to 100).map(i => ("1", i <= 30)) ++ (1 to 50).map(i => ("2", i <= 10))
    val out = Evaluation.abTest(rows.toDF("arm", "ok"), "arm", col("ok"), "0")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("0").isNullAt(4) && out("0").isNullAt(5)) // control: no z, no lift
    val se = math.sqrt(0.25 * 0.75 * (1.0 / 100 + 1.0 / 100))
    assert(out("1").getDouble(4) == (0.3 - 0.2) / se)
    assert(out("1").getDouble(5) == (0.3 - 0.2) / 0.2)
    assert(out("2").getDouble(3) == 0.2) // same rate as control
    assert(out("2").getDouble(4) == 0.0) // z exactly 0 at equal rates
  }

  test("mutualInfo: identity dependence hits ln2/1/1; independence hits 0") {
    val dep = ((1 to 50).map(_ => ("a", "a")) ++ (1 to 50).map(_ => ("b", "b")))
      .toDF("x", "y")
    val d = Evaluation.mutualInfo(dep, "x", "y").head()
    assert(math.abs(d.getDouble(1) - math.log(2)) < 1e-9, s"mi=${d.getDouble(1)}")
    assert(math.abs(d.getDouble(2) - 1.0) < 1e-9)  // nmi
    assert(math.abs(d.getDouble(3) - 1.0) < 1e-9)  // cramers_v
    // 2x2 uniform product distribution: exact independence
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .flatMap(p => Seq.fill(25)(p)).toDF("x", "y")
    val i = Evaluation.mutualInfo(ind, "x", "y").head()
    assert(math.abs(i.getDouble(1)) < 1e-9 && math.abs(i.getDouble(3)) < 1e-9)
    // constant y: entropies degenerate -> nmi/v fall back to 0, not NaN
    val const = (1 to 40).map(i => (if (i % 2 == 0) "a" else "b", "only")).toDF("x", "y")
    val c = Evaluation.mutualInfo(const, "x", "y").head()
    assert(c.getDouble(1) == 0.0 && c.getDouble(2) == 0.0 && c.getDouble(3) == 0.0)
  }

  test("kaplanMeier: hand case with censoring; full-death step is exactly 0") {
    // durations: 1(event) 2(censored) 3(event) 3(event) 4(censored)
    val obs = Seq((1L, true), (2L, false), (3L, true), (3L, true), (4L, false))
      .toDF("t", "ev")
    val out = Evaluation.kaplanMeier(obs, "t", col("ev")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // curve steps only at event times
    assert(out(0).getLong(1) == 5L && out(0).getLong(2) == 1L)
    assert(math.abs(out(0).getDouble(3) - 0.8) < 1e-8)
    assert(out(1).getLong(1) == 3L && out(1).getLong(2) == 2L)
    assert(math.abs(out(1).getDouble(3) - 0.8 / 3.0) < 1e-8) // 0.8 * (1 - 2/3)
    // everyone dies at the last time: survival 0 exactly, no ln(0)
    val all = Seq((1L, true), (2L, true), (2L, true)).toDF("t", "ev")
    val a = Evaluation.kaplanMeier(all, "t", col("ev")).collect()
    assert(a(1).getDouble(3) == 0.0)
    // repartition invariance of the two-pass scans
    val p8 = Evaluation.kaplanMeier(obs.repartition(8), "t", col("ev")).collect()
    assert(p8.map(_.getDouble(3)).toSeq == out.map(_.getDouble(3)).toSeq)
  }

  test("srmCheck: balanced arms score ~0; a dropped arm screams; missing arm counted 0") {
    val ok = ((1 to 500).map(_ => "a") ++ (1 to 500).map(_ => "b")).toDF("arm")
    val okOut = Evaluation.srmCheck(ok, "arm", Map("a" -> 500, "b" -> 500)).collect()
    assert(okOut.forall(_.getDouble(5) == 0.0)) // exact 50/50: chi2 identically 0
    // crash path dropped 40% of b: chi2 explodes past any alpha bar
    val broken = ((1 to 500).map(_ => "a") ++ (1 to 300).map(_ => "b")).toDF("arm")
    val bOut = Evaluation.srmCheck(broken, "arm", Map("a" -> 500, "b" -> 500)).head()
    assert(bOut.getDouble(5) > 3.84, bOut.toString)
    // an arm absent from the data still gets its expected-count row
    val gone = (1 to 100).map(_ => "a").toDF("arm")
    val gOut = Evaluation.srmCheck(gone, "arm", Map("a" -> 500, "b" -> 500))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gOut("b").getLong(1) == 0L && gOut("b").getDouble(3) == 50.0)
  }

  test("globalCumMin: matches a sequential prefix-min at any partitioning") {
    val xs = Seq(5L, 3L, 7L, 3L, 1L, 9L, 0L, 4L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val expect = xs.map(_._2).scanLeft(Long.MaxValue)(math.min).tail
    for (p <- Seq(1, 4, 8)) {
      val got = Evaluation.globalCumMin(
          xs.toDF("t", "v").repartition(p), Seq("t"), Seq("v"))
        .orderBy("t").collect().map(_.getLong(2)).toSeq
      assert(got == expect, s"p=$p: $got")
    }
  }

  test("cusum: flat series stays at 0; a step change raises exactly one side") {
    // 20 steps at 100, then 20 at 130: mean 115, sigma 15 -> after the step
    // the up-side accumulates (130-115-7.5)=7.5 per step, alarm at 4sigma=60
    val series = ((0 until 20).map(t => (t.toLong, 100L)) ++
      (20 until 40).map(t => (t.toLong, 130L)))
    val out = Evaluation.cusum(series.toDF("t", "x"), "t", "x").collect()
    val byT = out.map(r => r.getLong(0) -> r).toMap
    // before the step: up-side pinned at 0 (deviations negative), while the
    // DOWN side accumulates 7.5 per step (the low regime sits below the
    // global mean — both regimes of a stepped series deviate from it)
    assert(byT(10L).getDouble(2) == 0.0)
    assert(math.abs(byT(10L).getDouble(3) - 11 * 7.5) < 1e-6)
    assert(!byT(5L).getBoolean(5)) // 45 < 60: down not alarming yet
    assert(byT(10L).getBoolean(5)) // 82.5 > 60: down alarm in the low regime
    // after the step: s_plus grows 7.5 per step from t=20
    assert(math.abs(byT(25L).getDouble(2) - 6 * 7.5) < 1e-6)
    assert(!byT(25L).getBoolean(4)) // 45 < 60: no up alarm yet
    assert(byT(28L).getBoolean(4))  // 67.5 > 60: up alarm
    // the down side drains 22.5 per step in the high regime and floors at 0
    assert(byT(39L).getDouble(3) == 0.0 && !byT(39L).getBoolean(5))
    // flat series: both sides identically 0, no alarms, no NaN
    val flat = (0 until 10).map(t => (t.toLong, 50L))
    val f = Evaluation.cusum(flat.toDF("t", "x"), "t", "x").collect()
    assert(f.forall(r => r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0
      && !r.getBoolean(4) && !r.getBoolean(5)))
    // partitioning invariance of the two scans
    val p8 = Evaluation.cusum(series.toDF("t", "x").repartition(8), "t", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
    assert(p8 == out.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq)
  }

  test("liftTable: perfect ranking lifts the top decile 10x; tie blocks land whole") {
    // 1000 unique scores descending, positives = top 100 → gains are maximal
    val df = (1 to 1000).map(i => (1001.0 - i, i <= 100)).toDF("score", "label")
    val out = Evaluation.liftTable(df, col("score"), col("label")).collect()
    assert(out.length == 10)
    val d0 = out.head
    assert(d0.getLong(1) == 100L && d0.getLong(2) == 100L) // all positives in decile 0
    assert(d0.getDouble(5) == 1.0)                         // capture rate 1 immediately
    assert(d0.getDouble(6) == 10.0)                        // lift = (100/100)/(100/1000)
    assert(out.last.getDouble(6) == 1.0)                   // full population = base rate

    // one score shared by 600 rows: the block lands WHOLE in one decile —
    // the decile of its LAST row
    val tied = ((1 to 100).map(i => (2.0, i <= 50)) ++ (1 to 600).map(_ => (1.0, false)) ++
      (1 to 300).map(i => (0.5, false))).toDF("score", "label")
    val tiedOut = Evaluation.liftTable(tied, col("score"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // blocks: 100 @2.0 → decile (100-1)*10 div 1000 = 0; 600 @1.0 → (700-1)*10 div 1000 = 6;
    // 300 @0.5 → (1000-1)*10 div 1000 = 9
    assert(tiedOut == Map(0L -> 100L, 6L -> 600L, 9L -> 300L), tiedOut.toString)
  }

  test("jsDivergence: identical sources score exactly 0; drift grows, bounded by ln 2") {
    val same = Seq(("a", "x y z x"), ("b", "x y z x")).toDF("source", "text")
    val out0 = Evaluation.jsDivergence(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out0("a") == 0.0 && out0("b") == 0.0)

    val drifted = Seq(("a", "x x x x"), ("b", "y y y y")).toDF("source", "text")
    val out1 = Evaluation.jsDivergence(drifted, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // disjoint-vocab source vs pooled corpus: p=(1,0), q=(.5,.5)
    val expected = 0.5 * (1.0 * math.log(1.0 / 0.75) +
      (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)))
    // 1e-8: the engine rounds each ln term to DECIMAL(28,9)
    assert(math.abs(out1("a") - expected) < 1e-8, s"${out1("a")} vs $expected")
    assert(out1("a") > 0.0 && out1("a") < math.log(2.0))
    assert(out1("a") == out1("b")) // symmetric construction
  }

  test("groupedAuc: repartitioning does not change the value") {
    val df = (1 to 500).map { i =>
      ("g", (i % 37).toDouble, i % 3 == 0)
    }.toDF("grp", "score", "y")
    val a = Evaluation.groupedAuc(df.repartition(1), "grp", col("y"), "score").head().getDouble(3)
    val b = Evaluation.groupedAuc(df.repartition(8), "grp", col("y"), "score").head().getDouble(3)
    assert(a == b)
  }

  test("cohenKappa: perfect agreement 1, hand-computed mixed case, independence near 0") {
    // perfect: both raters identical
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")).toDF("r1", "r2")
    val p = Evaluation.cohenKappa(perfect, col("r1"), col("r2")).head()
    assert(p.getDouble(4) == 1.0 && p.getDouble(2) == 1.0)

    // the textbook 2×2: o = [[20,5],[10,15]], n=50, po=0.7,
    // pe = (30·25 + 20·25)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val h = Evaluation.cohenKappa(rows.toDF("r1", "r2"), col("r1"), col("r2")).head()
    assert(h.getLong(0) == 50L && h.getLong(1) == 35L)
    assert(h.getDouble(2) == 0.7 && h.getDouble(3) == 0.5)
    assert(math.abs(h.getDouble(4) - 0.4) < 1e-9, h.toString)

    // single-label degenerate: pe = 1 ⇒ kappa NULL, not 0/0
    val deg = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    assert(Evaluation.cohenKappa(deg, col("r1"), col("r2")).head().isNullAt(4))

    // disjoint label sets: agreement 0, pe 0 (no shared label), kappa 0
    val disj = Seq(("a", "b"), ("a", "b")).toDF("r1", "r2")
    val dj = Evaluation.cohenKappa(disj, col("r1"), col("r2")).head()
    assert(dj.getLong(1) == 0L && dj.getDouble(3) == 0.0 && dj.getDouble(4) == 0.0)

    // partitioning invariance
    val big = (1 to 997).map(i => (s"l${i % 3}", s"l${(i * 7) % 3}")).toDF("r1", "r2")
    val one = Evaluation.cohenKappa(big.repartition(1), col("r1"), col("r2")).head()
    val eight = Evaluation.cohenKappa(big.repartition(8), col("r1"), col("r2")).head()
    assert(one.toSeq == eight.toSeq)
  }

  test("rankingMetrics: perfect ranking 1.0, inverted known value, no-relevant 0, ties total") {
    // q1: relevant items ranked 1,2 of 4 → ndcg 1, rr 1
    // q2: the ONLY relevant item ranked last of 3 → rr 1/3
    // q3: nothing relevant → ndcg 0, rr 0
    val df = Seq(
      ("q1", 1L, 9.0, 1), ("q1", 2L, 8.0, 1), ("q1", 3L, 7.0, 0), ("q1", 4L, 6.0, 0),
      ("q2", 1L, 9.0, 0), ("q2", 2L, 8.0, 0), ("q2", 3L, 7.0, 1),
      ("q3", 1L, 5.0, 0), ("q3", 2L, 4.0, 0)
    ).toDF("q", "item", "s", "rel")
    val out = Evaluation.rankingMetrics(df, "q", "item", "s", col("rel") > 0, k = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("q1") == ((4L, 1.0, 1.0)), out.toString)
    // q2: dcg = 1/log2(4) = 0.5; idcg = 1/log2(2) = 1 → ndcg 0.5, rr 1/3
    assert(out("q2")._1 == 3L && math.abs(out("q2")._2 - 0.5) < 1e-8)
    assert(math.abs(out("q2")._3 - 1.0 / 3) < 1e-9)
    assert(out("q3") == ((2L, 0.0, 0.0)), out.toString)

    // k cuts off relevance found below rank k: rr still sees it, ndcg@1 does not
    val cut = Seq(("q", 1L, 9.0, 0), ("q", 2L, 8.0, 1)).toDF("q", "item", "s", "rel")
    val c = Evaluation.rankingMetrics(cut, "q", "item", "s", col("rel") > 0, k = 1).head()
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 0.5)

    // score ties broken by item id → deterministic at any partitioning
    val tied = (1 to 200).map(i => ("q", i.toLong, 1.0, i % 7 == 0)).toDF("q", "item", "s", "rel")
    val t1 = Evaluation.rankingMetrics(tied.repartition(1), "q", "item", "s", col("rel"), 10).head()
    val t8 = Evaluation.rankingMetrics(tied.repartition(8), "q", "item", "s", col("rel"), 10).head()
    assert(t1.toSeq == t8.toSeq)
    assert(t1.getDouble(3) == 0.142857143) // first relevant is item 7 (1/7 @ 9 dp)
  }

  test("reciprocalRankFusion: agreement wins, hand values exact, single-leg degenerates to that leg") {
    // item 1: rank 1 + rank 2; item 2: rank 2 + rank 1 (symmetric — tie on
    // fused, broken by item id); item 3: rank 3 + rank 3 (strictly worse)
    val df = Seq(
      ("q", 1L, 9.0, 5.0), ("q", 2L, 8.0, 6.0), ("q", 3L, 7.0, 4.0)
    ).toDF("q", "item", "s1", "s2")
    val out = Evaluation.reciprocalRankFusion(df, "q", "item", Seq("s1", "s2"), 60)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
    val m = out.toMap
    assert(m(1L)._1 == 1L && m(1L)._2 == 2L)
    assert(m(2L)._1 == 2L && m(2L)._2 == 1L)
    val f12 = BigDecimal(1.0 / 61 + 1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L)._3 == f12 && m(2L)._3 == f12, s"${m(1L)._3} vs $f12")
    assert(m(1L)._4 == 1L && m(2L)._4 == 2L) // fused tie → item id order
    assert(m(3L)._4 == 3L)
    // single leg: fused rank == that leg's rank (columns: q, item, rank_s2,
    // fused, fused_rank)
    val one = Evaluation.reciprocalRankFusion(df, "q", "item", Seq("s2"), 60)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4))).toMap
    assert(one == Map(2L -> ((1L, 1L)), 1L -> ((2L, 2L)), 3L -> ((3L, 3L))))
    // repartition-invariant
    val p = Evaluation.reciprocalRankFusion(df.repartition(7), "q", "item", Seq("s1", "s2"), 60)
      .collect().map(_.toSeq).toSeq
    assert(p == out.map(r => Seq[Any]("q", r._1, r._2._1, r._2._2, r._2._3, r._2._4)).toSeq)
  }

  test("anovaF: matches the textbook F on a hand dataset; equal means → F 0; partition-invariant") {
    // classic 3-group example: means 2, 4, 6 with within-group variance 1
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 3), ("b", 4), ("b", 5),
      ("c", 5), ("c", 6), ("c", 7)).toDF("g", "x")
    val r = Evaluation.anovaF(df, "g", col("x").cast("decimal(18,2)")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L)
    // SSB = 3·((2−4)² + 0 + (6−4)²) = 24; SSW = 3·2 = 6; F = (24/2)/(6/6)
    assert(math.abs(r.getDouble(2) - 24.0) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(4) - 12.0) < 1e-9, r.toString)
    // identical group means: SSB = 0 exactly → F = 0
    val flat = Seq(("a", 1), ("a", 3), ("b", 1), ("b", 3)).toDF("g", "x")
    val f0 = Evaluation.anovaF(flat, "g", col("x").cast("decimal(18,2)")).head()
    assert(f0.getDouble(2) == 0.0 && f0.getDouble(4) == 0.0, f0.toString)
    val p = Evaluation.anovaF(df.repartition(8), "g", col("x").cast("decimal(18,2)")).head()
    assert(p.toSeq == r.toSeq)
  }

  test("thresholdSweep: perfect separator found at the class boundary; metrics exact on a hand case") {
    // scores 0.9/0.8 positive, 0.3/0.2/0.1 negative: threshold 0.8 is
    // perfect (F1 = 1, J = 1); both criteria land on it
    val df = Seq((0.9, true), (0.8, true), (0.3, false), (0.2, false), (0.1, false))
      .toDF("s", "y")
    val out = Evaluation.thresholdSweep(df, col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(8), r.getDouble(9)))).toMap
    assert(out("f1") == ((0.8, 2L, 0L, 1.0, 1.0)), out.toString)
    assert(out("youden") == ((0.8, 2L, 0L, 1.0, 1.0)), out.toString)
    // overlap: best F1 trades differently than J but both are deterministic
    val noisy = Seq((0.9, true), (0.7, false), (0.6, true), (0.5, true),
      (0.4, false), (0.2, false)).toDF("s", "y")
    val n = Evaluation.thresholdSweep(noisy, col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(n("f1") == 0.5, n.toString) // thr .5: tp3 fp1 → F1 6/7, the max
  }

  test("brierDecomposition: exact direct brier; calibrated forecasts → reliability exactly 0") {
    // forecasts EQUAL the per-bin outcome frequency: reliability term 0
    val cal = (Seq.fill(8)((0.2, false)) ++ Seq.fill(2)((0.2, true)) ++
      Seq.fill(2)((0.8, false)) ++ Seq.fill(8)((0.8, true))).toDF("s", "y")
    val r = Evaluation.brierDecomposition(cal, col("s"), col("y"), 10).head()
    assert(r.getLong(0) == 20L)
    assert(math.abs(r.getDouble(1) - 0.16) < 1e-9, r.toString)   // direct brier
    assert(r.getDouble(2) == 0.0, r.toString)                    // reliability
    assert(math.abs(r.getDouble(3) - 0.09) < 1e-9, r.toString)   // resolution
    assert(r.getDouble(4) == 0.25, r.toString)                   // ō(1−ō)
    // Murphy identity with binned forecasts: brier = rel − res + unc
    assert(math.abs(r.getDouble(1) - (r.getDouble(2) - r.getDouble(3) + r.getDouble(4))) < 1e-9)
  }

  test("jackknifeRatioSE: homogeneous groups → tiny SE; one deviant group widens it; ratio exact") {
    // 4 groups, each ratio 0.5 → leave-one-out ratios all 0.5 → SE 0
    val flat = (1 to 4).flatMap(g => Seq((g, 1.0, 2.0), (g, 2.0, 4.0)))
      .toDF("g", "num", "den")
    val r = Evaluation.jackknifeRatioSE(flat, col("g"),
      col("num").cast("decimal(18,2)"), col("den").cast("decimal(18,2)")).head()
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2)) < 1e-9, r.toString)
    // one group with ratio 1.0 among 0.5s: SE strictly positive, CI brackets
    val mixed = flat.unionAll(Seq((9, 6.0, 6.0)).toDF("g", "num", "den"))
    val m = Evaluation.jackknifeRatioSE(mixed, col("g"),
      col("num").cast("decimal(18,2)"), col("den").cast("decimal(18,2)")).head()
    assert(m.getDouble(2) > 0.01, m.toString)
    assert(m.getDouble(3) < m.getDouble(0) && m.getDouble(0) < m.getDouble(4))
  }

  test("driftReport: stable column ≈ 0, shifted column flagged, one row per column") {
    val ref = (1 to 200).map(i => (i % 50 / 5.0, i % 20 / 2.0)).toDF("f_stable", "f_shift")
    val cur = (1 to 200).map(i => (i % 50 / 5.0, i % 20 / 2.0 + 8.0)).toDF("f_stable", "f_shift")
    val out = Evaluation.driftReport(ref, cur, Seq("f_stable", "f_shift"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out.size == 2)
    assert(out("f_stable") < 0.01, out.toString)   // identical distribution
    assert(out("f_shift") > 0.5, out.toString)     // gross shift
  }

  test("woeIv: separating feature scores high IV, identical distributions score 0; iv = Σ terms") {
    // goods clustered low, bads clustered high: near-perfect separation
    val sep = ((1 to 50).map(i => (true, i / 50.0)) ++
      (1 to 50).map(i => (false, 9.0 + i / 50.0))).toDF("good", "v")
    val rows = Evaluation.woeIv(sep, col("good"), "v", 10).collect()
    assert(rows.length == 10)
    val iv = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == iv)) // total repeated per row
    assert(iv > 3.0, iv.toString)             // "suspiciously strong" range
    assert(math.abs(rows.map(_.getDouble(4)).sum - iv) < 1e-6)
    // bads all clamp into the top bin (they sit past the goods' range);
    // a goods-only bin scores strongly positive woe, the bads bin negative
    assert(rows(9).getLong(2) == 50L)
    assert(rows.head.getLong(2) == 0L && rows.head.getDouble(3) > 0d)
    assert(rows(9).getDouble(3) < 0d)
    // same distribution both classes → every term 0 exactly (p == q)
    val flat = ((1 to 40) ++ (1 to 40)).zipWithIndex
      .map { case (v, i) => (i < 40, v.toDouble) }.toDF("good", "v")
    val ivFlat = Evaluation.woeIv(flat, col("good"), "v", 8).head().getDouble(5)
    assert(ivFlat == 0.0, ivFlat.toString)
  }

  test("cuped: hand-computed theta, adjusted means, and variance reduction") {
    // u0: daily Y = 10,20,30 (X = 0,10,20); u1: Y = 20,40,60 (X = 0,20,40)
    // pooled: n=6 Sx=90 Sy=180 Sxy=4000 Sxx=2500 Syy=7000
    // -> cov=1300 varx=1150 vary=1600 theta=1300/1150 mux=15
    val ev = Seq(
      (0L, "2024-01-01 10:00:00", 10.0), (0L, "2024-01-02 10:00:00", 20.0),
      (0L, "2024-01-03 10:00:00", 30.0),
      (1L, "2024-01-01 10:00:00", 20.0), (1L, "2024-01-02 10:00:00", 40.0),
      (1L, "2024-01-03 10:00:00", 60.0)
    ).toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Evaluation.cuped(ev, "user_id", "ts", "value").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val theta = 1300.0 / 1150.0
    assert(out("0")._1 == 3L && out("0")._2 == 20.0)
    assert(out("0")._3 == 20.0 - theta * (10.0 - 15.0), out.toString)
    assert(out("1")._3 == 40.0 - theta * (20.0 - 15.0), out.toString)
    assert(out("0")._4 == theta)
    assert(out("0")._5 == theta * theta * 1150.0 / 1600.0)
    // adjustment shrinks the between-arm gap (the covariate explains part of it)
    assert(math.abs(out("1")._3 - out("0")._3) < math.abs(40.0 - 20.0))
  }

  test("naiveBayes: separable classes classify correctly; score matches the hand-built model") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana", "fruit"),
      (2L, "banana apple apple", "fruit"),
      (3L, "dog cat", "animal"),
      (4L, "cat dog dog", "animal")
    ).toDF("doc_id", "text", "lang")
    val out = Evaluation.naiveBayes(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getInt(4)))).toMap
    assert(out.values.forall(_._3 == 1), out.toString) // all self-classified
    assert(out(1L)._1 == "fruit" && out(3L)._1 == "animal")
    // hand-computed score for doc 1 under class fruit, with the engine's
    // quantization: per-token ln → scale 9 HALF_UP, exact sum, prior the
    // same, final render at scale 6. V=4, tokens_fruit=5, apple=3, banana=2.
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = (q9(math.log(4.0 / 9.0)) + q9(math.log(3.0 / 9.0)) +
      q9(math.log(2.0 / 4.0))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(out(1L)._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      == expected, s"${out(1L)._2} vs $expected")
    // order-independence: repartitioning cannot move a score or a label
    val p = Evaluation.naiveBayes(docs.repartition(5), "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSeq
    assert(p == Evaluation.naiveBayes(docs, "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSeq)
  }

  test("isotonicFit: minimax solution equals hand-run PAV; violations pool, monotone output") {
    import spark.implicits._
    // 3 bins with mean y [1, 3, 2]·(1/4): bins 1,2 violate → pool to 2.5/4
    // each; 4 points per bin, y encoded as k-of-4 positives
    val rows =
      (1 to 4).map(i => (5.0, i <= 1)) ++   // bin 0: mean 1/4
      (1 to 4).map(i => (15.0, i <= 3)) ++  // bin 1: mean 3/4
      (1 to 4).map(i => (25.0, i <= 2))     // bin 2: mean 2/4
    val df = rows.toDF("s", "y")
    val out = Evaluation.isotonicFit(df, "s", col("y"), 0.0, 30.0, 3)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0) == ((0.25, 0.25)), out.toString)
    assert(out(1) == ((0.75, 0.625)), out.toString)  // pooled (3+2)/8
    assert(out(2) == ((0.5, 0.625)), out.toString)
    // fitted sequence is monotone non-decreasing by construction
    val fits = Evaluation.isotonicFit(df, "s", col("y"), 0.0, 30.0, 3)
      .collect().map(_.getDouble(3)).toSeq
    assert(fits == fits.sorted, fits.toString)
    // weighted pooling: unbalance the violating bins (8 points vs 2)
    val wrows =
      (1 to 8).map(i => (15.0, i <= 6)) ++  // bin 1: mean 6/8, weight 8
      (1 to 2).map(i => (25.0, i <= 0))     // bin 2: mean 0, weight 2
    val wout = Evaluation.isotonicFit(wrows.toDF("s", "y"), "s", col("y"), 0.0, 30.0, 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(wout(1) == 0.6 && wout(2) == 0.6, wout.toString) // (6+0)/10
  }

  test("conformalIntervals: interval geometry, radius from calibration, deterministic") {
    import spark.implicits._
    val df = (1L to 2000L).map { i =>
      (i, s"g${i % 4}", (i % 4) * 100.0 + (i % 7).toDouble)
    }.toDF("id", "grp", "y")
    val out = Evaluation.conformalIntervals(df, "id", "grp", "y", alpha = 0.1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // geometry: lo ≤ yhat ≤ hi, symmetric radius, one radius for all rows
    val radii = rows.map(r => BigDecimal(r.getDouble(4) - r.getDouble(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).distinct
    assert(radii.length == 1, radii.toString)
    assert(rows.forall(r => r.getDouble(3) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(4)))
    // the conformal guarantee: empirical coverage ≥ 1−α−small-sample slack
    val cov = rows.map(_.getInt(5)).sum.toDouble / rows.length
    assert(cov >= 0.85, s"coverage $cov")
    // md5 split + exact decimals ⇒ bit-identical under repartitioning
    val p = Evaluation.conformalIntervals(df.repartition(7), "id", "grp", "y")
      .collect().map(_.toSeq).toSeq
    assert(p == rows.map(_.toSeq).toSeq)
  }

  test("mannWhitney: textbook U on a hand sample, tie handling, shift direction") {
    import spark.implicits._
    // A = {1,2,3}, B = {4,5,6}: every B beats every A → U1 (for A) = 0
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
                 (4.0, "b"), (5.0, "b"), (6.0, "b")).toDF("v", "g")
    val r = Evaluation.mannWhitney(df, col("v"), col("g") === "a").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 0.0, r.toString) // U1 = 0
    assert(r.getDouble(3) < 0, r.toString)    // A stochastically below B
    // all-tied sample: U1 = n1·n2/2, variance 0 → z null
    val tied = Seq.fill(4)((7.0, "a")) ++ Seq.fill(4)((7.0, "b"))
    val rt = Evaluation.mannWhitney(tied.toDF("v", "g"), col("v"), col("g") === "a")
      .collect()(0)
    assert(rt.getDouble(2) == 8.0 && rt.isNullAt(3), rt.toString)
    // near-balanced interleave: R1 = 1+3+6 = 10 → U1 = 4, |z| small
    val sym = Seq((1.0, "a"), (2.0, "b"), (3.0, "a"), (4.0, "b"),
                  (5.0, "b"), (6.0, "a"))
    val rs = Evaluation.mannWhitney(sym.toDF("v", "g"), col("v"), col("g") === "a")
      .collect()(0)
    assert(rs.getDouble(2) == 4.0 && math.abs(rs.getDouble(3)) < 0.3, rs.toString)
    // partitioning invariance
    val rp = Evaluation.mannWhitney(df.repartition(5), col("v"), col("g") === "a")
      .collect()(0)
    assert(rp.toSeq == r.toSeq)
  }

  test("benjaminiHochberg: step-up q-values match the hand lattice") {
    import spark.implicits._
    // classic example: p = .01, .02, .03, .04 with m=4:
    // raw p·m/j = .04, .04, .04, .04 → all q = .04, all rejected at .05
    val pv = Seq(("h1", BigDecimal("0.010000000")), ("h2", BigDecimal("0.020000000")),
                 ("h3", BigDecimal("0.030000000")), ("h4", BigDecimal("0.040000000")))
      .toDF("key", "p")
    val out = Evaluation.benjaminiHochberg(pv, "key", "p", 0.05)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getInt(4)))).toMap
    assert(out.values.forall(v => v._1 == 0.04 && v._2 == 1), out.toString)
    // the step-up min: p = .01, .04, .042 → q3 = .042, q2 = min(.042, .06)
    // = .042, q1 = min(.042, .03) = .03
    val pv2 = Seq(("a", BigDecimal("0.010000000")), ("b", BigDecimal("0.040000000")),
                  ("c", BigDecimal("0.042000000"))).toDF("key", "p")
    val out2 = Evaluation.benjaminiHochberg(pv2, "key", "p", 0.05)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out2("a") == 0.03 && out2("b") == 0.042 && out2("c") == 0.042, out2.toString)
    // q clamps at 1
    val pv3 = Seq(("x", BigDecimal("0.900000000")), ("y", BigDecimal("0.950000000")))
      .toDF("key", "p")
    assert(Evaluation.benjaminiHochberg(pv3, "key", "p")
      .collect().forall(_.getDouble(3) <= 1.0))
    // monotone: q non-decreasing in rank order
    val qs = Evaluation.benjaminiHochberg(pv2, "key", "p").collect().map(_.getDouble(3))
    assert(qs.toSeq == qs.sorted.toSeq)
  }

  test("shareTestPValues: uniform counts → p = 1; the farthest key has the smallest p") {
    import spark.implicits._
    val uniform = (1 to 30).map(i => (s"k${i % 3}", i)).toDF("key", "x")
    val pu = Evaluation.shareTestPValues(uniform, "key").collect()
    assert(pu.forall(r => r.getDecimal(2).doubleValue() == 1.0), pu.mkString)
    val skewed = (Seq.fill(70)("hot") ++ Seq.fill(20)("warm") ++ Seq.fill(10)("cold"))
      .zipWithIndex.toDF("key", "i")
    val ps = Evaluation.shareTestPValues(skewed, "key")
      .collect().map(r => r.getString(0) -> r.getDecimal(2).doubleValue()).toMap
    // deviations from the uniform 33.3: hot +36.7, cold −23.3, warm −13.3
    assert(ps("hot") < ps("cold") && ps("cold") < ps("warm"), ps.toString)
  }

  test("mannKendall: monotone series maximal S, constant series S=0, reversal flips z") {
    import spark.implicits._
    val up = (1 to 10).map(t => ("u", t, t * 2))
    val down = (1 to 10).map(t => ("d", t, 100 - t))
    val flat = (1 to 10).map(t => ("f", t, 7))
    val out = Evaluation.mannKendall((up ++ down ++ flat).toDF("g", "t", "x"),
        "g", "t", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(out("u")._2 == 45 && out("u")._3 > 0)   // all 45 pairs ascending
    assert(out("d")._2 == -45 && out("d")._3 < 0)
    assert(out("f")._2 == 0)
    // all-tied series: Var(S) = 0 → z null (tie term cancels exactly)
    assert(out("f")._3.isNaN, out.toString)
    // partitioning invariance
    val a = Evaluation.mannKendall(up.toDF("g", "t", "x"), "g", "t", "x").collect().map(_.toSeq)
    val b = Evaluation.mannKendall(up.toDF("g", "t", "x").repartition(7), "g", "t", "x").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("mcnemar: discordant cells drive the corrected chi2; no discordance → null") {
    import spark.implicits._
    // units: 2 both, 3 before-only, 1 after-only, 1 neither →
    // chi2 = (|3−1|−1)²/(3+1) = 0.25
    val rows =
      Seq(("u1", "b"), ("u1", "a"), ("u2", "b"), ("u2", "a"),
          ("u3", "b"), ("u4", "b"), ("u5", "b"),
          ("u6", "a"), ("u7", "x"))
    val df = rows.toDF("u", "tag")
    val r = Evaluation.mcnemar(df, "u", col("tag") === "b", col("tag") === "a")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 3L, 1L, 1L)), r.toString)
    assert(r.getDouble(4) == 0.25, r.toString)
    // concordant-only sample: b + c = 0 → chi2 undefined
    val conc = Seq(("v1", "b"), ("v1", "a"), ("v2", "x")).toDF("u", "tag")
    assert(Evaluation.mcnemar(conc, "u", col("tag") === "b", col("tag") === "a")
      .collect()(0).isNullAt(4))
  }

  test("cochranArmitage: monotone proportions give signed z; flat proportions give 0") {
    import spark.implicits._
    // doses 1,2,3 with 4 units each; successes 0, 2, 4 → rising trend
    def mk(spec: Seq[(Int, Int)]) = spec.flatMap { case (w, r) =>
      (1 to 4).map(i => (w, i <= r)) }.toDF("w", "s")
    val up = Evaluation.cochranArmitage(mk(Seq(1 -> 0, 2 -> 2, 3 -> 4)),
      col("w"), col("s")).collect()(0)
    assert(up.getLong(0) == 12 && up.getLong(1) == 6 && up.getDouble(2) > 2, up.toString)
    val down = Evaluation.cochranArmitage(mk(Seq(1 -> 4, 2 -> 2, 3 -> 0)),
      col("w"), col("s")).collect()(0)
    assert(down.getDouble(2) == -up.getDouble(2), s"$down vs $up")
    // identical proportions at every dose → T = 0 exactly → z = 0
    val flat = Evaluation.cochranArmitage(mk(Seq(1 -> 1, 2 -> 1, 3 -> 1)),
      col("w"), col("s")).collect()(0)
    assert(flat.getDouble(2) == 0.0, flat.toString)
    // all-success: variance 0 → null
    assert(Evaluation.cochranArmitage(mk(Seq(1 -> 4, 2 -> 4, 3 -> 4)),
      col("w"), col("s")).collect()(0).isNullAt(2))
  }

  test("bradleyTerry: dominance orders strengths; never-winning item goes to 0") {
    import spark.implicits._
    // A sweeps B: closed form — p_A = W_A/den = 2, p_B = 0, stable at iter 2
    val sweep = Seq(("A", "B"), ("A", "B")).toDF("w", "l")
    val s = Evaluation.bradleyTerry(sweep, "w", "l", iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(s("A") == ((2L, 2L, 2.0)) && s("B") == ((0L, 2L, 0.0)), s.toString)
    // transitive dominance A > B > C (3-1 head-to-heads) orders strengths
    val h2h = (Seq.fill(3)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
               Seq.fill(3)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
               Seq.fill(3)(("A", "C")) ++ Seq.fill(1)(("C", "A"))).toDF("w", "l")
    val t = Evaluation.bradleyTerry(h2h, "w", "l", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(t("A") > t("B") && t("B") > t("C"), t.toString)
    // partitioning invariance: quantized terms make iterations bit-stable
    val p = Evaluation.bradleyTerry(h2h.repartition(7), "w", "l", iters = 2)
      .collect().map(_.toSeq).toSeq
    assert(p == Evaluation.bradleyTerry(h2h, "w", "l", iters = 2).collect().map(_.toSeq).toSeq)
  }

  test("ebShrink: 95/100 outranks 3/3 after shrinkage; degenerate variance returns raw") {
    import spark.implicits._
    // population: 30 items around rate ~0.5 with spread, one perfect 3/3
    // midget, one 95/100 heavyweight
    val rows =
      (1 to 30).flatMap(i => (1 to 20).map(j => (i.toLong, j <= 8 + (i % 7)))) ++
      (1 to 3).map(j => (100L, true)) ++
      (1 to 100).map(j => (200L, j <= 95))
    val out = Evaluation.ebShrink(rows.toDF("item", "ok"), "item", col("ok"), topK = 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(100L)._1 == 1.0 && out(200L)._1 == 0.95)
    assert(out(200L)._2 > out(100L)._2,
      s"shrunk 95/100=${out(200L)._2} must beat 3/3=${out(100L)._2}")
    // zero-variance rates: no shrinkage basis → raw rates pass through
    val flat = (1 to 5).flatMap(i => Seq((i.toLong, true), (i.toLong, false)))
    val f = Evaluation.ebShrink(flat.toDF("item", "ok"), "item", col("ok"))
      .collect()
    assert(f.forall(r => r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5))
  }

  test("tukeyPairs: equal-mean pair scores q=0; shifted pair hits the hand value") {
    import spark.implicits._
    // A and B share mean 10, C sits at 20; every group has variance 4
    // → MSW = 4, se = √(4/2·(1/3+1/3)) = √(4/3), q(A,C) = −10/1.1547
    val df = Seq(("A", 8.0), ("A", 10.0), ("A", 12.0),
                 ("B", 8.0), ("B", 10.0), ("B", 12.0),
                 ("C", 18.0), ("C", 20.0), ("C", 22.0)).toDF("g", "v")
    val out = Evaluation.tukeyPairs(df, "g", col("v").cast("decimal(18,2)"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(("A", "B")) == ((0.0, 0.0)), out.toString)
    assert(out(("A", "C"))._1 == -10.0, out.toString)
    assert(math.abs(out(("A", "C"))._2 - (-10.0 / math.sqrt(4.0 / 3.0))) < 1e-6, out.toString)
    assert(out.size == 3)
  }

  test("sprt: a strong lift crosses the H1 bound on day 2; dead flow accepts H0") {
    import spark.implicits._
    def day(i: Int, tpe: String, k: Int) = (1 to k).map(_ =>
      (java.sql.Timestamp.valueOf(f"2024-01-$i%02d 10:00:00"), tpe))
    // 10 purchases + 10 views per day: per-day LLR ≈ +1.507 → crosses
    // ln(0.8/0.05) = 2.77 on day 2
    val hot = (1 to 5).flatMap(i => day(i, "purchase", 10) ++ day(i, "view", 10))
      .toDF("ts", "event_type")
    val h = Evaluation.sprt(hot, "ts", col("event_type") === "purchase", 0.18, 0.22)
      .collect()(0)
    assert(h.getString(0) == "2024-01-02" && h.getString(3) == "accept_h1", h.toString)
    // zero conversions: −1.0/day → crosses the lower bound on day 2
    val cold = (1 to 5).flatMap(i => day(i, "view", 20)).toDF("ts", "event_type")
    val c = Evaluation.sprt(cold, "ts", col("event_type") === "purchase", 0.18, 0.22)
      .collect()(0)
    assert(c.getString(0) == "2024-01-02" && c.getString(3) == "accept_h0", c.toString)
  }

  test("leveneTest: identical spreads score W exactly 0; unequal spreads flag") {
    import spark.implicits._
    // A and B identical shape (spread 10), C doubled (spread 20)
    val same = Seq(("A", 10.0), ("A", 20.0), ("A", 30.0),
                   ("B", 110.0), ("B", 120.0), ("B", 130.0)).toDF("g", "v")
    val w0 = Evaluation.leveneTest(same, "g", col("v")).collect()(0)
    assert(w0.getLong(0) == 2 && w0.getLong(1) == 6)
    // adev multisets identical → SSB is pure floating cancellation noise
    assert(math.abs(w0.getDouble(4)) < 1e-9, w0.toString)
    val diff = Seq(("A", 10.0), ("A", 20.0), ("A", 30.0),
                   ("C", 0.0), ("C", 20.0), ("C", 40.0),
                   ("C", 0.0), ("C", 20.0), ("C", 40.0)).toDF("g", "v")
    val w1 = Evaluation.leveneTest(diff, "g", col("v")).collect()(0)
    assert(w1.getDouble(4) > 1.0, w1.toString)
    // location shift alone (B vs A) does NOT flag — Levene sees spread only
  }

  test("hellingerDrift: identical samples ≈ 0 distance; disjoint masses ≈ 1") {
    import spark.implicits._
    val ref = (1 to 200).map(i => (i % 50) * 1.0).toDF("v")
    val h0 = Evaluation.hellingerDrift(ref, ref, "v").collect()(0)
    assert(h0.getDouble(0) > 0.999999 && h0.getDouble(1) < 0.01, h0.toString)
    // actual mass clamps into the far top bin → near-disjoint (Laplace
    // smoothing floors BC ≈ 0.45 at 10 bins, so H tops out ≈ 0.74)
    val far = (1 to 200).map(_ => 1e6).toDF("v")
    val h1 = Evaluation.hellingerDrift(ref, far, "v").collect()(0)
    assert(h1.getDouble(1) > 0.7, h1.toString)
  }

  test("categoricalAssociation: identical columns read V=U=1; independent read 0") {
    import spark.implicits._
    // balanced independent grid: every (a,b) combination equally often
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 5 }
      yield (a, b, a)).toDF("a", "b", "copy_a")
    val out = Evaluation.categoricalAssociation(indep,
        Seq(("a", "b"), ("a", "copy_a"), ("b", "a")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) == ((0.0, 0.0)), out.toString)     // independent
    assert(out(("a", "copy_a")) == ((1.0, 1.0)), out.toString) // identical
    assert(out(("b", "a")) == ((0.0, 0.0)), out.toString)
  }

  test("bestSplit: finds the planted threshold; degenerate right side excluded") {
    import spark.implicits._
    // label flips exactly at v > 20: a stump must split at v = 20 with
    // pure children (split gini 0); root is 50/50
    val df = ((1 to 10).map(i => (i * 2.0, false)) ++
              (11 to 20).map(i => (i * 2.0, true))).toDF("v", "y")
    val r = Evaluation.bestSplit(df, col("v"), col("y")).collect()(0)
    assert(r.getDouble(0) == 20.0, r.toString)
    assert(r.getLong(1) == 10 && r.getLong(2) == 10)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.5, r.toString)
    // constant label: every split scores the root gini 0; argmin tie →
    // smallest threshold
    val const = (1 to 8).map(i => (i.toDouble, true)).toDF("v", "y")
    val rc = Evaluation.bestSplit(const, col("v"), col("y")).collect()(0)
    assert(rc.getDouble(0) == 1.0 && rc.getDouble(3) == 0.0)
  }

  test("ipwEffect: recovers the stratum-adjusted effect a raw diff gets wrong") {
    import spark.implicits._
    // stratum A: treated 30, control 10 (effect +5 within); stratum B:
    // treated 10, control 30... plant: within-stratum effect +2 always,
    // but treatment is 80% in the high-outcome stratum → naive diff ≫ 2
    val rows =
      Seq.fill(80)(("hi", true, 102.0)) ++ Seq.fill(20)(("hi", false, 100.0)) ++
      Seq.fill(20)(("lo", true, 12.0)) ++ Seq.fill(80)(("lo", false, 10.0))
    val df = rows.toDF("s", "t", "y")
    val r = Evaluation.ipwEffect(df, "s", col("t"), col("y")).collect()(0)
    // IPW reweights each arm to the stratum sizes: μ1 = (102+12)/2 = 57,
    // μ0 = (100+10)/2 = 55 → ATE exactly +2
    assert(r.getLong(0) == 200 && r.getLong(1) == 0, r.toString)
    assert(r.getDouble(2) == 57.0 && r.getDouble(3) == 55.0, r.toString)
    assert(r.getDouble(4) == 2.0, r.toString)
    // a stratum with only one arm is excluded and counted
    val degen = rows ++ Seq.fill(10)(("only_treated", true, 999.0))
    val rd = Evaluation.ipwEffect(degen.toDF("s", "t", "y"), "s", col("t"), col("y"))
      .collect()(0)
    assert(rd.getLong(1) == 1 && rd.getDouble(4) == 2.0, rd.toString)
  }

  test("simpsonFlips: the planted reversal is flagged; aligned pairs are not") {
    import spark.implicits._
    // classic: group A beats B inside EVERY stratum, but B's mass sits in
    // the high-value stratum → aggregated B beats A
    val rows =
      Seq.fill(80)(("A", "low", 10.0)) ++ Seq.fill(20)(("A", "high", 90.0)) ++
      Seq.fill(20)(("B", "low", 5.0)) ++ Seq.fill(80)(("B", "high", 85.0)) ++
      Seq.fill(50)(("C", "low", 1.0)) ++ Seq.fill(50)(("C", "high", 2.0))
    val df = rows.toDF("g", "st", "v")
    val out = Evaluation.simpsonFlips(df, "g", "st", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(4), r.getInt(5)))).toMap
    // A vs B: agg mean A = (800+1800)/100 = 26, B = (100+6800)/100 = 69
    // → agg favors B; within low A wins (10>5), within high A wins (90>85)
    assert(out(("A", "B")) == ((-1, 2L, 1)), out.toString)
    // A vs C and B vs C: aggregate and strata all favor the non-C side
    assert(out(("A", "C"))._3 == 0 && out(("B", "C"))._3 == 0, out.toString)
  }

  test("kruskalWallis: tie-free hand case H = 2.4; rank sums exact") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val out = Evaluation.kruskalWallis(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    // ranks 1..4: R_A = 3, R_B = 7; H = 0.6·(9/2 + 49/2) − 15 = 2.4
    assert(out("A").getDouble(2) == 3.0 && out("B").getDouble(2) == 7.0)
    assert(math.abs(out("A").getDouble(4) - 2.4) < 1e-9)
    // no ties → corrected H equals H
    assert(out("A").getDouble(5) == out("A").getDouble(4))
  }

  test("jarqueBera: symmetric data → zero skew, platykurtic K = 1.5, JB hand value") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("k", "x")
    val r = Evaluation.jarqueBera(df, "k", col("x")).collect()(0)
    assert(r.getDouble(3) == 0.0, "skewness")
    assert(math.abs(r.getDouble(4) - 1.5) < 1e-9, "kurtosis")
    // JB = 3/6·(0 + (1.5−3)²/4) = 0.28125
    assert(math.abs(r.getDouble(5) - 0.28125) < 1e-9, "jb")
  }

  test("bartlett: identical group distributions → T ≈ 0; k and n exact") {
    val vals = Seq(1L, 2L, 3L, 4L)
    val df = (for (g <- Seq("a", "b", "c"); v <- vals) yield (g, v)).toDF("g", "v")
    val r = Evaluation.bartlett(df, "g", col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 12)
    assert(math.abs(r.getDouble(3)) < 1e-6, s"t_stat ${r.getDouble(3)}")
  }

  test("ljungBox: trending series piles Q up over lags; row per lag") {
    val df = (1L to 40L).map(t => (t, t)).toDF("t", "x")
    val out = Evaluation.ljungBox(df, "t", "x", maxLag = 3)
      .collect().sortBy(_.getLong(0))
    assert(out.length == 3)
    val qs = out.map(_.getDouble(3))
    assert(qs(0) > 0 && qs(1) > qs(0) && qs(2) > qs(1), qs.mkString(","))
  }

  test("contingency2x2: Haldane odds ratio hand case; CI straddles consistently") {
    val rows = Seq.fill(10)(("e", "o")) ++ Seq.fill(5)(("e", "n")) ++
      Seq.fill(3)(("c", "o")) ++ Seq.fill(12)(("c", "n"))
    val df = rows.toDF("arm", "out")
    val r = Evaluation.contingency2x2(df, col("arm") === "e", col("out") === "o").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((10L, 5L, 3L, 12L)))
    // (10.5·12.5)/(5.5·3.5) = 6.818182 at scale 6
    assert(math.abs(r.getDouble(4) - 6.818182) < 1e-6)
    assert(r.getDouble(6) < r.getDouble(4) && r.getDouble(4) < r.getDouble(7))
  }

  test("wasserstein1: two point masses 10 apart → W1 = 10; symmetric") {
    val df = Seq(("a", 0.0), ("a", 0.0), ("b", 10.0), ("b", 10.0)).toDF("s", "v")
    val r = Evaluation.wasserstein1(df, col("v"), col("s") === "a").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 10.0)
    val r2 = Evaluation.wasserstein1(df, col("v"), col("s") === "b").collect()(0)
    assert(r2.getDouble(2) == 10.0, "direction-symmetric")
  }

  test("grubbs: planted outlier is the extreme; G matches the hand chain") {
    val df = (Seq.fill(4)(10L) :+ 100L).map(("g", _)).toDF("k", "v")
    val r = Evaluation.grubbs(df, "k", col("v")).collect()(0)
    assert(r.getDouble(4) == 100.0, "extreme")
    // mean 28, sd = √1620; G = 72/√1620 = 1.788854382
    assert(math.abs(r.getDouble(5) - 72.0 / math.sqrt(1620.0)) < 1e-8)
  }

  test("effectSize: hand case d = √2, Hedges shrinks by 4/7") {
    val df = Seq(("a", 2L), ("a", 4L), ("b", 0L), ("b", 2L)).toDF("s", "v")
    val r = Evaluation.effectSize(df, col("v"), col("s") === "a").collect()(0)
    assert(math.abs(r.getDouble(4) - math.sqrt(2.0)) < 1e-8, "cohen_d")
    assert(math.abs(r.getDouble(5) - math.sqrt(2.0) * 4.0 / 7.0) < 1e-8, "hedges_g")
  }

  test("forecastAccuracy: linear trend vs naive-1 → MAE=RMSE=MASE=1, SMAPE hand sum") {
    val df = (1L to 5L).map(t => ("g", t, t)).toDF("g", "t", "x")
    val r = Evaluation.forecastAccuracy(df, "g", "t", "x", season = 1).collect()(0)
    assert(r.getLong(1) == 4 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    val smapeHand = (2.0 / 3 + 2.0 / 5 + 2.0 / 7 + 2.0 / 9) / 4
    assert(math.abs(r.getDouble(4) - smapeHand) < 1e-8)
    assert(r.getDouble(5) == 1.0, "mase")
  }

  test("forecastAccuracy: perfect seasonal repetition → zero error, MASE 0") {
    val xs = Seq(3L, 7L, 3L, 7L, 3L, 7L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }.toDF("g", "t", "x")
    val r = Evaluation.forecastAccuracy(df, "g", "t", "x", season = 2).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("pinballLoss: train median forecast scored on eval rows, hand value") {
    val train = (1L to 10L).map(v => ("g", v, true))
    val eval = Seq(("g", 5L, false), ("g", 7L, false))
    val df = (train ++ eval).toDF("g", "v", "trn")
    val out = Evaluation.pinballLoss(df, "g", col("v"), col("trn"), Seq(500))
      .collect()(0)
    assert(out.getLong(2) == 5L, "q_forecast = lower median")
    // y=5: 0; y=7: 500·2/1000 = 1.0; mean over 2 rows = 0.5
    assert(out.getDouble(4) == 0.5)
  }

  test("cramerVonMises: identical samples ⇒ 0; disjoint hand case 0.375") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("s", "v")
    assert(Evaluation.cramerVonMises(same, col("v"), col("s") === "a")
      .collect()(0).getDouble(2) == 0.0)
    val apart = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("s", "v")
    val r = Evaluation.cramerVonMises(apart, col("v"), col("s") === "a").collect()(0)
    // Σ cntv·(cuma·n2−cumb·n1)² = 4+16+4+0 = 24; 24/(4²·2·2) = 0.375
    assert(r.getDouble(2) == 0.375, r.toString)
  }

  test("cliffsDelta: total separation ⇒ ±1 with exact pair counts; overlap ⇒ 0") {
    val df = Seq(("a", 3L), ("a", 4L), ("b", 1L), ("b", 2L)).toDF("s", "v")
    val r = Evaluation.cliffsDelta(df, col("v"), col("s") === "a").collect()(0)
    assert(r.getLong(2) == 4 && r.getLong(3) == 0 && r.getDouble(4) == 1.0)
    val rev = Evaluation.cliffsDelta(df, col("v"), col("s") === "b").collect()(0)
    assert(rev.getDouble(4) == -1.0)
    val tie = Seq(("a", 5L), ("b", 5L)).toDF("s", "v")
    assert(Evaluation.cliffsDelta(tie, col("v"), col("s") === "a")
      .collect()(0).getDouble(4) == 0.0)
  }

  test("runsTest: perfect alternation ⇒ max runs, positive z; blocks ⇒ few runs, negative z") {
    val alt = (0L until 10L).map(i => (i, if (i % 2 == 0) 1L else 9L)).toDF("t", "x")
    val r = Evaluation.runsTest(alt, "t", "x").collect()(0)
    assert(r.getLong(0) == 10 && r.getLong(1) == 5 && r.getLong(2) == 5)
    assert(r.getDouble(3) == 6.0, "E[R] = 2·25/10 + 1")
    val zHand = 4.0 / math.sqrt(2000.0 / 900.0)
    assert(math.abs(r.getDouble(4) - zHand) < 1e-8)
    val blocks = (0L until 10L).map(i => (i, if (i < 5) 1L else 9L)).toDF("t", "x")
    val b = Evaluation.runsTest(blocks, "t", "x").collect()(0)
    assert(b.getLong(0) == 2 && b.getDouble(4) < 0, b.toString)
  }

  test("powerAnalysis: hand chain at 50% baseline; degenerate rates → NULL") {
    val rows = (1 to 50).map(i => ("seg", true, java.sql.Date.valueOf("2024-01-01"))) ++
      (1 to 50).map(i => ("seg", false, java.sql.Date.valueOf("2024-01-02"))) ++
      (1 to 10).map(i => ("dead", false, java.sql.Date.valueOf("2024-01-01")))
    val df = rows.toDF("segment", "won", "d")
    val out = Evaluation.powerAnalysis(df, "segment", col("won"), "d", mdePct = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val p0 = 0.5; val p1 = 0.55; val pb = 0.525
    val num = 1.959964 * math.sqrt(2 * pb * (1 - pb)) +
      0.841621 * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
    val nArm = math.ceil(num * num / (0.05 * 0.05)).toLong
    val seg = out("seg")
    assert(seg.getDouble(2) == 0.5 && seg.getLong(3) == nArm, seg.toString)
    // 100 units over 2 observed days = 50/day; both arms ⇒ 2n/50 days
    assert(seg.getLong(4) == math.ceil(nArm * 2 / 50.0).toLong, seg.toString)
    assert(out("dead").isNullAt(3) && out("dead").isNullAt(4), "0% baseline → null")
  }

  test("nelsonAalen: hand hazard increments accumulate; FH survival = exp(−H)") {
    val df = Seq((1L, true), (1L, false), (2L, true), (2L, false)).toDF("t", "ev")
    val out = Evaluation.nelsonAalen(df, "t", col("ev"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // t=1: 1 death / 4 at risk → H = 0.25; t=2: 1 death / 2 → H = 0.75
    assert(out(1L).getLong(1) == 4 && out(2L).getLong(1) == 2)
    assert(out(1L).getDouble(3) == 0.25 && out(2L).getDouble(3) == 0.75)
    assert(math.abs(out(2L).getDouble(4) - math.exp(-0.75)) < 1e-9, "FH survival")
  }

  test("anovaTwoWay: pure-interaction design → zero main effects, interaction carries all") {
    val rows = Seq(("a1", "b1", 0L), ("a1", "b1", 2L), ("a1", "b2", 2L), ("a1", "b2", 4L),
      ("a2", "b1", 2L), ("a2", "b1", 4L), ("a2", "b2", 0L), ("a2", "b2", 2L))
    val r = Evaluation.anovaTwoWay(rows.toDF("a", "b", "v"), "a", "b", col("v")).collect()(0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0, "main effects zero")
    assert(r.getDouble(5) == 8.0, "interaction SS")
    assert(r.getDouble(6) == 8.0, "within SS")
    // F_ab = (8/1)/(8/4) = 4; zero-SS main effects give F = 0, not null
    assert(r.getDouble(9) == 4.0 && r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0)
  }

  test("friedman: consistent within-block order → classic χ² = 6; incomplete blocks drop") {
    val rows = for (b <- 1 to 3; (t, v) <- Seq(("t1", 1L), ("t2", 5L), ("t3", 9L)))
      yield (b, t, v + b * 100) // block level shifts don't matter — ranks do
    val df = (rows ++ Seq((99, "t1", 0L), (99, "t2", 1L))) // incomplete block 99
      .toDF("blk", "trt", "v")
    val out = Evaluation.friedman(df, col("blk"), "trt", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("t1").getDouble(2) == 3.0 && out("t3").getDouble(2) == 9.0, "rank sums b·j")
    assert(out("t1").getLong(1) == 3, "block 99 dropped")
    // 12/(b·k(k+1))·ΣR² − 3b(k+1) = 42 − 36 = 6; tie-general form agrees
    assert(out("t1").getDouble(4) == 6.0, out("t1").toString)
  }

  test("mantelHaenszel: homogeneous strata pool to the common OR") {
    val stratum = Seq.fill(10)(("e", "o")) ++ Seq.fill(5)(("e", "n")) ++
      Seq.fill(3)(("c", "o")) ++ Seq.fill(12)(("c", "n"))
    val rows = stratum.map { case (a, o) => ("s1", a, o) } ++
      stratum.map { case (a, o) => ("s2", a, o) }
    val out = Evaluation.mantelHaenszel(rows.toDF("st", "arm", "out"),
      "st", col("arm") === "e", col("out") === "o")
      .collect()
    // each stratum: r = 10·12/30 = 4, s = 5·3/30 = 0.5 → MH = 8/1 = 8
    assert(out.forall(_.getDouble(6) == 8.0), out.mkString(","))
    // per-stratum Haldane OR rides along
    assert(math.abs(out(0).getDouble(5) - 6.818182) < 1e-6)
  }

  test("dunnTest: tie-free hand z per pair; BH q monotone over the pair lattice") {
    val df = (Seq(1L, 2L, 3L).map(("A", _)) ++ Seq(10L, 11L, 12L).map(("B", _)) ++
      Seq(20L, 21L, 22L).map(("C", _))).toDF("g", "v")
    val out = Evaluation.dunnTest(df, "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // mean ranks 2/5/8, varBase = 9·10/12, se = √5
    val se = math.sqrt(5.0)
    assert(math.abs(out(("A", "B")).getDouble(2) - (-3.0 / se)) < 1e-8)
    assert(math.abs(out(("A", "C")).getDouble(2) - (-6.0 / se)) < 1e-8)
    // the extreme pair has the smallest p and q; q respects the step-up order
    val rows = out.values.toSeq
    val pAC = out(("A", "C")).getDouble(3)
    assert(rows.forall(_.getDouble(3) >= pAC))
    assert(rows.forall(r => r.getDouble(4) >= r.getDouble(3)), "q >= p")
  }

  test("cochranQ: hand incidence matrix → Q = 3 exactly; unobserved cells count 0") {
    val rows = Seq((1, "A"), (1, "B"), (2, "A"), (3, "A"), (3, "B"), (3, "C"))
    val out = Evaluation.cochranQ(rows.toDF("blk", "trt"), "blk", "trt", lit(true))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(1) == 3 && out("B").getLong(1) == 2 && out("C").getLong(1) == 1)
    // Q = (k−1)(kΣC²−(ΣC)²)/(kΣR−ΣR²) = 2·(42−36)/(18−14) = 3
    assert(out("A").getDouble(4) == 3.0, out("A").toString)
  }

  test("pageTrend: declared order holds perfectly → L = 42, z = 6/√6") {
    val rows = for (b <- 1 to 3; (t, v) <- Seq(("t1", 1L), ("t2", 5L), ("t3", 9L)))
      yield (b, t, v)
    val r = Evaluation.pageTrend(rows.toDF("blk", "trt", "v"),
      col("blk"), "trt", col("v")).collect()(0)
    assert(r.getDouble(2) == 42.0 && r.getDouble(3) == 36.0)
    assert(math.abs(r.getDouble(4) - 6.0 / math.sqrt(6.0)) < 1e-8, r.toString)
    // reversed order scores the minimum L → negative z
    val rev = for (b <- 1 to 3; (t, v) <- Seq(("t1", 9L), ("t2", 5L), ("t3", 1L)))
      yield (b, t, v)
    val r2 = Evaluation.pageTrend(rev.toDF("blk", "trt", "v"),
      col("blk"), "trt", col("v")).collect()(0)
    assert(r2.getDouble(2) == 30.0 && r2.getDouble(4) < 0, r2.toString)
  }

  test("seasonalMannKendall: trend in one season, flat ties in the other — exact S and variance") {
    val rows = Seq((1, 2020L, 1L), (1, 2021L, 2L), (1, 2022L, 3L), (1, 2023L, 4L),
      (2, 2020L, 5L), (2, 2021L, 5L), (2, 2022L, 5L), (2, 2023L, 5L))
    val out = Evaluation.seasonalMannKendall(rows.toDF("season", "t", "x"),
      col("season"), "t", "x").collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(2) == 6 && out(2).getLong(2) == 0, "per-season S")
    assert(out(1).getLong(3) == 6, "combined S")
    // season 1: 18·Var = 4·3·13 = 156; season 2 all-tied contributes 0
    val z = 5.0 / math.sqrt(156.0 / 18.0)
    assert(math.abs(out(1).getDouble(5) - z) < 1e-8, out(1).toString)
  }

  test("jonckheereTerpstra: fully ordered groups hit max J; ties take half credit") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L), ("C", 5L), ("C", 6L))
      .toDF("g", "v")
    val r = Evaluation.jonckheereTerpstra(df, "g", col("v")).collect()(0)
    assert(r.getDouble(2) == 12.0 && r.getDouble(3) == 6.0)
    // Var = (36·15 − 3·4·7)/72 = 19/3
    assert(math.abs(r.getDouble(4) - 6.0 / math.sqrt(19.0 / 3.0)) < 1e-8, r.toString)
    val tied = Seq(("A", 1L), ("B", 1L)).toDF("g", "v")
    val t = Evaluation.jonckheereTerpstra(tied, "g", col("v")).collect()(0)
    assert(t.getDouble(2) == 0.5, "equal pair scores half")
  }

  test("partialCorrelation: y = x + z with x ⊥ z → r_xy·z = 1 exactly") {
    val rows = Seq((0L, 0L, 0L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 2L))
    val r = Evaluation.partialCorrelation(rows.toDF("x", "z", "y"),
      col("x"), col("y"), col("z")).collect()(0)
    assert(r.getDouble(1) == 0.707106781, "r_xy = 1/√2 at scale 9")
    assert(r.getDouble(2) == 0.0, "x ⊥ z")
    assert(r.getDouble(4) == 1.0, "controlling z leaves the deterministic x-link")
  }

  test("clusteringAgreement: perfect recovery ⇒ purity 1 / ARI 1; one blob ⇒ ARI exactly 0") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val labels = ids.map(i => (i, if (i <= 3) "x" else "y")).toDF("id", "lab")
    val perfect = ids.map(i => (i, if (i <= 3) 10 else 20)).toDF("id", "cl")
    val p = Evaluation.clusteringAgreement(perfect, "id", "cl", labels, "lab").collect()(0)
    assert(p.getLong(0) == 6 && p.getLong(1) == 2 && p.getLong(2) == 2)
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0, p.toString)
    // everything in ONE cluster: purity = majority share, ARI = 0 exactly
    // (the chance-corrected score sees no information, not "half right")
    val blob = ids.map(i => (i, 1)).toDF("id", "cl")
    val b = Evaluation.clusteringAgreement(blob, "id", "cl", labels, "lab").collect()(0)
    assert(b.getDouble(3) == 0.5 && b.getDouble(4) == 0.0, b.toString)
    // anti-correlated 2×2 grid is WORSE than chance → negative ARI
    val anti = Seq((1L, 1), (2L, 2), (3L, 1), (4L, 2), (5L, 1), (6L, 2)).toDF("id", "cl")
    val a = Evaluation.clusteringAgreement(anti, "id", "cl", labels, "lab").collect()(0)
    assert(a.getDouble(4) < 0.0, a.toString)
  }

  test("diffInDiff: planted effect 3 on top of a common trend 2 is recovered exactly") {
    // control: 10 → 12 (trend +2); treated: 20 → 25 (trend +2, effect +3)
    val rows =
      Seq.fill(4)((false, false, 10.0)) ++ Seq.fill(4)((false, true, 12.0)) ++
      Seq.fill(3)((true, false, 20.0)) ++ Seq.fill(3)((true, true, 25.0))
    val r = Evaluation.diffInDiff(rows.toDF("t", "p", "v"),
      col("t"), col("p"), col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(3) == 4, r.toString)
    assert(r.getDouble(4) == 25.0 && r.getDouble(7) == 10.0, r.toString)
    assert(r.getDouble(8) == 3.0, s"DiD effect: $r")
    // an empty cell makes the design insufficient → NULL effect
    val noCell = rows.filterNot { case (t, p, _) => t && p }
    assert(Evaluation.diffInDiff(noCell.toDF("t", "p", "v"),
      col("t"), col("p"), col("v")).collect()(0).isNullAt(8))
  }

  test("signFlipTest: one unit can never reject (p = 1); strong one-sided signal rejects") {
    val one = Seq((7L, 5.0)).toDF("id", "v")
    val r1 = Evaluation.signFlipTest(one, "id", col("v")).collect()(0)
    // |±x| = |x| for every vector → all 64 extreme → p = 65/65
    assert(r1.getLong(0) == 1 && r1.getDouble(3) == 1.0, r1.toString)
    // 30 units all +1.00: a flip vector ties only if its 30 hash bits agree
    val strong = (1L to 30L).map(i => (i, 1.0)).toDF("id", "v")
    val r2 = Evaluation.signFlipTest(strong, "id", col("v")).collect()(0)
    assert(r2.getDouble(1) == 30.0, r2.toString)
    assert(r2.getDouble(3) <= 0.1, s"strong signal must reject: $r2")
    // deterministic and layout-independent (md5 of the id, not of layout)
    val re = Evaluation.signFlipTest(strong.repartition(7), "id", col("v")).collect()(0)
    assert(re == r2)
  }

  test("cochranQ: a treatment observed but never successful keeps C_j = 0 (k counts it)") {
    // A succeeds in every block, B is observed everywhere but never flags:
    // k must be 2 (not 1), C_B = 0, and Q = 1·(2·9 − 9)/(2·3 − 3) = 3
    val rows = Seq((1, "A", 1), (1, "B", 0), (2, "A", 1), (2, "B", 0),
      (3, "A", 1), (3, "B", 0))
    val out = Evaluation.cochranQ(rows.toDF("blk", "trt", "ok"), "blk", "trt",
      col("ok") === 1).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("A", "B"), "zero-success treatment must appear")
    assert(out("B").getLong(1) == 0 && out("A").getLong(1) == 3)
    assert(out("A").getLong(2) == 2, "k from the raw treatment listing")
    assert(out("A").getDouble(4) == 3.0, out("A").toString)
  }

  test("seasonalMannKendall: a single-period season survives with s = 0 and counts in n_total") {
    val rows = Seq((1, 2020L, 1L), (1, 2021L, 2L), (1, 2022L, 3L),
      (2, 2020L, 7L)) // season 2 has ONE period → no pairs
    val out = Evaluation.seasonalMannKendall(rows.toDF("season", "t", "x"),
      col("season"), "t", "x").collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(1, 2), "single-period season must not vanish")
    assert(out(2).getLong(2) == 0 && out(2).getLong(1) == 1)
    assert(out(1).getLong(4) == 4, "n_total counts the lone observation")
  }

  test("benjaminiHochberg: rejection is the exact rational step-up, not the floored q") {
    // p₍₂₎·m = 99,999,999 nano; α = 0.049999999 ⇒ floor(p·m/2) = 49,999,999 ≤ α_nano
    // but the exact BH test 99,999,999 ≤ 2·49,999,999 = 99,999,998 FAILS —
    // only rank 1 may reject
    val pv = Seq(("a", BigDecimal("0.000000001")), ("b", BigDecimal("0.033333333")),
      ("c", BigDecimal("0.900000000"))).toDF("key", "p")
    val out = Evaluation.benjaminiHochberg(pv, "key", "p", 0.049999999)
      .collect().map(r => r.getString(0) -> r.getInt(4)).toMap
    assert(out == Map("a" -> 1, "b" -> 0, "c" -> 0), out.toString)
  }

  test("logRankTest: mirrored cohorts (with censoring) give chi2 = 0 exactly") {
    // both arms: deaths at t=1,2 plus a censored unit at t=1 → O = E at
    // every event time by symmetry, V > 0 at t=1, so z and chi2 are 0.0.
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 1L, false),
      ("b", 1L, true), ("b", 2L, true), ("b", 1L, false)
    ).toDF("cohort", "t", "died")
    val r = Evaluation.logRankTest(df, "t", col("died"), "cohort", "a").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3, r.toString)
    assert(r.getLong(3) == 2, "observed_a")
    assert(r.getDouble(4) == 2.0, "expected_a = 2*3/6 + 2*1/2")
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0, r.toString)
  }

  test("logRankTest: early deaths in arm A push O above E (hand risk table)") {
    // A dies at t=1,2; B dies at t=3,4. E = 1*2/4 + 1*1/3 = 5/6 (nano-exact).
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true),
      ("b", 3L, true), ("b", 4L, true)
    ).toDF("cohort", "t", "died")
    val r = Evaluation.logRankTest(df, "t", col("died"), "cohort", "a").collect()(0)
    assert(r.getLong(2) == 4, "n_event_times")
    assert(r.getLong(3) == 2, "observed_a")
    assert(r.getDouble(4) == 0.833333333, "expected_a quantized at 9 dp")
    assert(r.getDouble(5) > 0 && r.getDouble(6) > 0, r.toString)
  }

  test("logRankTest: all data in one arm has V = 0 and NULL z/chi2") {
    val df = Seq(("a", 1L, true), ("a", 2L, true)).toDF("cohort", "t", "died")
    val r = Evaluation.logRankTest(df, "t", col("died"), "cohort", "a").collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6), r.toString)
  }

  test("meanAveragePrecision: hand AP terms, k cutoff, no-relevant query dropped") {
    // qA: both relevant items lead the ranking -> AP = 1; P@5 = 2/5.
    // qB: only relevant item at rank 6 > k -> AP = 0 but the query counts.
    // qC: no relevant item -> excluded from both means.
    val df = (Seq(
      ("qA", "i1", 9.0, true), ("qA", "i2", 8.0, true),
      ("qA", "i3", 7.0, false), ("qA", "i4", 6.0, false)) ++
      (1 to 6).map(i => ("qB", s"j$i", 10.0 - i, i == 6)) ++
      Seq(("qC", "k1", 1.0, false), ("qC", "k2", 2.0, false)))
      .toDF("q", "item", "score", "rel")
    val r = Evaluation.meanAveragePrecision(df, "q", "item", "score",
      col("rel"), k = 5).collect()(0)
    assert(r.getLong(0) == 2, "n_queries excludes qC")
    assert(r.getDouble(1) == 0.5, "map = (1 + 0)/2")
    assert(r.getDouble(2) == 0.2, "p@k = (2/5 + 0)/2")
  }

  test("weibullFit: wear-out data fits shape > 1, infant-mortality < 1; degenerate -> NULL") {
    val wearOut = Seq.tabulate(20)(i => ("w", 90.0 + i)).toDF("g", "t")
    val w = Evaluation.weibullFit(wearOut, "g", col("t")).collect()(0)
    assert(w.getLong(1) == 20)
    assert(w.getDouble(2) > 1.0, s"tight cluster near a max = wear-out: $w")
    val infant = Seq(1.0, 1.5, 2.0, 3.0, 50.0, 500.0, 5000.0).map(("i", _)).toDF("g", "t")
    val inf = Evaluation.weibullFit(infant, "g", col("t")).collect()(0)
    assert(inf.getDouble(2) < 1.0, s"heavy right tail = infant mortality: $inf")
    val const = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "t")
    val c = Evaluation.weibullFit(const, "g", col("t")).collect()(0)
    assert(c.isNullAt(2) && c.isNullAt(3), "zero x-variance has no fit")
    val single = Seq(("s", 7.0)).toDF("g", "t")
    val sg = Evaluation.weibullFit(single, "g", col("t")).collect()(0)
    assert(sg.isNullAt(2), "n = 1 has no fit")
  }

  test("weibullFit: scale is equivariant and shape invariant under t -> 10t") {
    val base = Seq(2.0, 3.0, 5.0, 8.0, 13.0, 21.0).map(("g", _)).toDF("g", "t")
    val f1 = Evaluation.weibullFit(base, "g", col("t")).collect()(0)
    val f10 = Evaluation.weibullFit(base.withColumn("t", col("t") * 10), "g", col("t"))
      .collect()(0)
    assert(math.abs(f1.getDouble(2) - f10.getDouble(2)) < 1e-6,
      s"shape: ${f1.getDouble(2)} vs ${f10.getDouble(2)}")
    assert(math.abs(f10.getDouble(3) / f1.getDouble(3) - 10.0) < 1e-4,
      s"scale x10: ${f1.getDouble(3)} vs ${f10.getDouble(3)}")
    assert(f1.getDouble(3) > 2.0 && f1.getDouble(3) < 21.0, "scale lands inside the data range")
  }

  test("rateRatioTest: exposure-adjusted rates, exact ratio and conditional z") {
    val units = Seq((true, 10L, 5L), (true, 10L, 5L), (false, 20L, 5L))
      .toDF("ga", "days", "purch")
    val r = Evaluation.rateRatioTest(units, col("ga"), col("days"), col("purch"))
      .collect()(0)
    assert(r.getLong(0) == 10 && r.getLong(1) == 5)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.25, r.toString)
    assert(r.getDouble(6) == 2.0, "rate ratio")
    // K=15, p0=.5: z = 2.5/sqrt(3.75), quantized at 9 dp
    assert(r.getDouble(7) == 1.290994449, r.toString)
    val oneArm = Evaluation.rateRatioTest(units.filter(col("ga")), col("ga"),
      col("days"), col("purch")).collect()(0)
    assert(oneArm.isNullAt(6) && oneArm.isNullAt(7), "empty cohort -> NULLs")
  }

  test("regressionDiscontinuity: planted jump of 7 over slope 2 recovered exactly") {
    val rows = (Seq((-3.0, -6.0), (-2.0, -4.0), (-1.0, -2.0)) ++       // y = 2x
      Seq((0.0, 7.0), (1.0, 9.0), (2.0, 11.0), (3.0, 13.0)) ++         // y = 2x + 7
      Seq((100.0, 1000.0)))                                            // outside bandwidth
      .toDF("run", "out")
    val r = Evaluation.regressionDiscontinuity(rows, col("run"), col("out"),
      cutoff = 0.0, bandwidth = 10.0).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4, r.toString)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0, "slopes")
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 7.0, "intercepts")
    assert(r.getDouble(6) == 7.0, "jump")
    val lone = Seq((-1.0, 5.0), (1.0, 6.0), (2.0, 7.0)).toDF("run", "out")
    val lr = Evaluation.regressionDiscontinuity(lone, col("run"), col("out"), 0.0, 10.0)
      .collect()(0)
    assert(lr.isNullAt(2) && lr.isNullAt(6), "single left point has no fit, no jump")
  }

  test("waldIvEstimate: LATE = ITT / first stage exactly; weak instrument -> NULL") {
    val units = Seq((true, 2.0, 10.0), (true, 2.0, 10.0),
      (false, 1.0, 6.0), (false, 1.0, 6.0)).toDF("z", "x", "y")
    val r = Evaluation.waldIvEstimate(units, col("z"), col("x"), col("y")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 4.0, r.toString)
    assert(r.getDouble(4) == 4.0, "late")
    val weak = Seq((true, 1.0, 10.0), (false, 1.0, 6.0)).toDF("z", "x", "y")
    val w = Evaluation.waldIvEstimate(weak, col("z"), col("x"), col("y")).collect()(0)
    assert(w.isNullAt(4), "zero first stage cannot identify the effect")
  }

  test("holmBonferroni: step-down adjusted p (running max of (m−i+1)p), exact rejection front") {
    val pv = Seq(("A", 0.010), ("B", 0.011), ("C", 0.020), ("D", 0.500))
      .toDF("key", "p")
    val out = Evaluation.holmBonferroni(pv, "key", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // raw: .04, .033, .04, .5 → cummax: .04, .04, .04, .5
    assert(out("A") == ((1L, 0.04, 1)), out.toString)
    assert(out("B") == ((2L, 0.04, 1)), "monotonized UP past the raw .033")
    assert(out("C") == ((3L, 0.04, 1)), out.toString)
    // D: p=.5 > α/1 → first failure at rank 4, ranks 1-3 reject, 4 doesn't
    assert(out("D") == ((4L, 0.5, 0)), out.toString)
  }

  test("holmBonferroni: last-rank multiplier is 1 (Bonferroni dominance), clamp, all-pass") {
    // Holm beats Bonferroni exactly here: rank 2 of 2 multiplies by
    // (m−i+1)=1, so p=0.9 stays 0.9 where Bonferroni would say 1.8→1
    val pv = Seq(("A", 0.001), ("B", 0.9)).toDF("key", "p")
    val out = Evaluation.holmBonferroni(pv, "key", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getInt(4))).toMap
    assert(out("A") == ((0.002, 1)) && out("B") == ((0.9, 0)), out.toString)
    // clamp: three near-1 p-values → (m−1+1)·0.9 = 2.7 clamps to 1
    val cl = Seq(("A", 0.9), ("B", 0.91), ("C", 0.92)).toDF("key", "p")
    val co = Evaluation.holmBonferroni(cl, "key", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(co.values.forall(_ == 1.0), s"all clamp at 1: $co")
    val all = Seq(("A", 0.001), ("B", 0.002)).toDF("key", "p")
    val ao = Evaluation.holmBonferroni(all, "key", "p", alpha = 0.05)
      .collect().map(_.getInt(4))
    assert(ao.forall(_ == 1), "no failure rank → every hypothesis rejected")
  }

  test("yuenTrimmedTest: hand 1..10 vs 11..20 — trim/winsorize lattice and Welch df exact") {
    // n=10, g=2, h=6 per side: trimmed ranks 3..8 → tm 5.5 / 15.5;
    // winsorized values clamp to [3,8] / [13,18] → swvar 42.5/9 each
    val rows = (1 to 10).map(v => (1, v.toLong)) ++ (11 to 20).map(v => (0, v.toLong))
    val df = rows.toDF("t", "v")
    val r = Evaluation.yuenTrimmedTest(df, col("t") === 1, col("v"), trim = 0.2).collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(2) == 6L, r.toString)
    assert(r.getDouble(4) == 5.5 && r.getDouble(5) == 15.5, r.toString)
    val d = (42.5 / 9) * 9 / (6 * 5d)
    assert(math.abs(r.getDouble(6) - (-10d / math.sqrt(2 * d))) < 1e-6, s"t: $r")
    assert(math.abs(r.getDouble(7) - 10.0) < 1e-6, s"symmetric d's → df = 10: $r")
  }

  test("yuenTrimmedTest: degenerate side (h < 2) yields NULL statistic, not a crash") {
    val rows = Seq((1, 5L)) ++ (1 to 10).map(v => (0, v.toLong))
    val r = Evaluation.yuenTrimmedTest(rows.toDF("t", "v"), col("t") === 1, col("v"))
      .collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7), s"single-point side: $r")
  }

  test("restrictedMeanSurvival: rectangle lattice exact on a hand KM curve; horizon clamps") {
    // deaths at t=2 (S→2/3) and t=5 (S→1/3), censored at t=10; τ=8:
    // 2·1 + 3·0.666666667 + 3·0.333333333 = 5.000000000 exactly
    val df = Seq((2L, true), (5L, true), (10L, false)).toDF("t_days", "died")
    val r = Evaluation.restrictedMeanSurvival(df, "t_days", col("died"), tau = 8L)
      .collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L && r.getDouble(2) == 5.0, r.toString)
    // horizon before the first event: everyone survives it → RMST = τ
    val early = Evaluation.restrictedMeanSurvival(df, "t_days", col("died"), tau = 1L)
      .collect()(0)
    assert(early.getDouble(2) == 1.0, early.toString)
    // fully censored cohort: S ≡ 1 → RMST = τ
    val cens = Seq((3L, false), (9L, false)).toDF("t_days", "died")
    val c = Evaluation.restrictedMeanSurvival(cens, "t_days", col("died"), tau = 50L)
      .collect()(0)
    assert(c.getLong(1) == 0L && c.getDouble(2) == 50.0, c.toString)
  }

  test("spiegelhalterZ: calibrated scores land at 0, systematic under-forecast blows up, flat-p NULL") {
    // p=.25 with exactly 1-in-4 hits: numerator terms cancel to 0
    val cal = Seq((0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)).toDF("p", "y")
    val c = Evaluation.spiegelhalterZ(cal, col("p"), col("y")).collect()(0)
    assert(c.getLong(0) == 4L && c.getDouble(2) == 0.0, c.toString)
    assert(c.getDouble(1) == 0.1875, s"brier (.5625+3·.0625)/4: $c")
    // p=.1 but everything happens: z = 3.6/√0.288 via the same chain
    val bad = Seq.fill(5)((0.1, 1)).toDF("p", "y")
    val b = Evaluation.spiegelhalterZ(bad, col("p"), col("y")).collect()(0)
    val expZ = math.round(3.6 / math.sqrt(0.288) * 1e9).toDouble / 1e9
    assert(b.getDouble(2) == expZ, s"$b vs $expZ")
    // p ∈ {0,1} everywhere: zero-variance forecaster → NULL z
    val det = Seq((1.0, 1), (0.0, 0)).toDF("p", "y")
    assert(Evaluation.spiegelhalterZ(det, col("p"), col("y")).collect()(0).isNullAt(2))
  }

  test("groupSequential: cumulative Welch z per look, densified grid, boundary crossing") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    // look 1 (early ts): treated 20,21,20 vs control 10,10,10;
    // look 2 (late ts): +21 treated, +10 control
    val rows = Seq(
      (ts(0), 1, 20L), (ts(1), 1, 21L), (ts(2), 1, 20L),
      (ts(0), 0, 10L), (ts(1), 0, 10L), (ts(2), 0, 10L),
      (ts(80), 1, 21L), (ts(90), 0, 10L)
    ).toDF("ts", "t", "v")
    val out = Evaluation.groupSequential(rows, col("t") === 1, col("v"), "ts",
      bounds = Seq(100.0, 1.0)).collect()
    assert(out.length == 2)
    val l1 = out(0); val l2 = out(1)
    assert(l1.getLong(1) == 3L && l1.getLong(2) == 3L)
    // control variance is 0 at both looks; z = (mt − 10)/√(vt/nt)
    def z(vals: Seq[Long]): Double = {
      val n = vals.length.toDouble; val sv = vals.sum.toDouble
      val svv = vals.map(v => v.toDouble * v).sum
      val m = sv / n; val vr = (svv - sv * sv / n) / (n - 1)
      math.round((m - 10d) / math.sqrt(vr / n) * 1e9).toDouble / 1e9
    }
    assert(l1.getDouble(3) == z(Seq(20L, 21L, 20L)), s"look1: $l1")
    assert(l1.getInt(5) == 0, "bound 100 not crossed")
    assert(l2.getDouble(3) == z(Seq(20L, 21L, 20L, 21L)), s"look2: $l2")
    assert(l2.getInt(5) == 1, "bound 1 crossed on the cumulative read")
  }

  test("groupSequential: degenerate looks (zero-variance or missing arm) yield NULL z, crossed 0") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val rows = Seq( // look 1: both arms constant → se = 0 → NULL
      (ts(0), 1, 5L), (ts(1), 1, 5L), (ts(2), 0, 5L), (ts(3), 0, 5L),
      (ts(80), 1, 7L), (ts(81), 1, 9L)) // look 2: control never arrives again
      .toDF("ts", "t", "v")
    val out = Evaluation.groupSequential(rows, col("t") === 1, col("v"), "ts",
      bounds = Seq(2.0, 2.0)).collect()
    assert(out(0).isNullAt(3) && out(0).getInt(5) == 0, s"zero variance: ${out(0)}")
    // look 2 still reads: cumulative control carries forward through the
    // densified grid even though no new control rows arrived
    assert(!out(1).isNullAt(3) && out(1).getLong(2) == 2L, s"carry-forward: ${out(1)}")
  }

  test("blandAltman: bias/limits from the diff moments; exceedance counted against rounded limits") {
    // 20 zero-diffs + one 50: mean 50/21, sd = √(2500/21) → the 50 breaks loa_hi
    val rows = (Seq.fill(20)((100L, 100L)) :+ ((150L, 100L))).toDF("x", "y")
    val r = Evaluation.blandAltman(rows, col("x"), col("y")).collect()(0)
    def fx(v: Double) = math.round(v * 1e4).toDouble / 1e4
    val n = 21d; val mean = 50d / n
    val sd = math.sqrt((2500d - 50d * 50d / n) / (n - 1))
    assert(r.getLong(0) == 21L && r.getDouble(1) == fx(mean), r.toString)
    assert(r.getDouble(2) == fx(sd) && r.getDouble(4) == fx(mean + 1.959963985 * sd))
    assert(r.getLong(5) == 1L, s"exactly the 50-diff runs outside: $r")
    // perfect agreement: zero bias, zero sd, nothing outside
    val same = Seq((5L, 5L), (7L, 7L), (9L, 9L)).toDF("x", "y")
    val s = Evaluation.blandAltman(same, col("x"), col("y")).collect()(0)
    assert(s.getDouble(1) == 0.0 && s.getDouble(2) == 0.0 && s.getLong(5) == 0L, s.toString)
  }

  test("wilsonIntervals: known chain at p=.5, clamps at the extremes where Wald collapses") {
    val rows = (Seq.fill(50)(("m", true)) ++ Seq.fill(50)(("m", false)) ++
      Seq.fill(10)(("z", false)) ++ Seq.fill(10)(("o", true))).toDF("g", "s")
    val out = Evaluation.wilsonIntervals(rows, "g", col("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    def fx(v: Double) = math.round(v * 1e9).toDouble / 1e9
    val z = 1.959963985; val z2 = z * z; val n = 100d; val p = 0.5
    val den = 1d + z2 / n
    val c = (p + z2 / (2 * n)) / den
    val h = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / den
    assert(out("m") == ((100L, 0.5, fx(c - h), fx(c + h))), out.toString)
    // k=0: Wald gives width 0 at p̂=0; Wilson stays informative and ≥ 0
    assert(out("z")._2 == 0.0 && out("z")._3 == 0.0 && out("z")._4 > 0.1, out.toString)
    assert(out("o")._4 == 1.0 && out("o")._3 < 0.9, "k=n clamps at 1, lower bound < 1")
  }

  test("ratioMetricDelta: hand arms — ratios, delta-method variance, z exact; degenerate NULL") {
    val units = Seq((1, 10L, 2L), (1, 20L, 2L), (0, 10L, 2L), (0, 10L, 2L))
      .toDF("t", "x", "y")
    val r = Evaluation.ratioMetricDelta(units, col("t") === 1, col("x"), col("y"))
      .collect()(0)
    // R_t = 30/4, R_c = 5; vr_t = vx/(n·ȳ²) = 50/8 = 6.25, vr_c = 0 →
    // z = 2.5/2.5 = 1
    assert(r.getDouble(2) == 7.5 && r.getDouble(3) == 5.0, r.toString)
    assert(r.getDouble(4) == 2.5 && r.getDouble(5) == 1.0, r.toString)
    val tiny = Seq((1, 10L, 2L), (0, 10L, 2L), (0, 12L, 2L)).toDF("t", "x", "y")
    val t = Evaluation.ratioMetricDelta(tiny, col("t") === 1, col("x"), col("y"))
      .collect()(0)
    assert(t.isNullAt(5), s"single-unit arm cannot estimate variance: $t")
  }

  test("ratioMetricDelta / yuenTrimmedTest: a MISSING arm still yields one row of NULL statistics") {
    val only = Seq((1, 10L, 2L), (1, 12L, 3L)).toDF("t", "x", "y")
    val r = Evaluation.ratioMetricDelta(only, col("t") === 1, col("x"), col("y")).collect()
    assert(r.length == 1, "one output row, never an empty frame")
    assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 0L, r(0).toString)
    assert(!r(0).isNullAt(2) && r(0).isNullAt(3) && r(0).isNullAt(4)
      && r(0).isNullAt(5), r(0).toString)
    val y = Evaluation.yuenTrimmedTest(Seq((1, 5L), (1, 6L), (1, 7L)).toDF("t", "v"),
      col("t") === 1, col("v")).collect()
    assert(y.length == 1 && y(0).getLong(1) == 0L && y(0).isNullAt(5)
      && y(0).isNullAt(6), y(0).toString)
  }

  test("benjaminiYekutieli: harmonic-penalized q monotone, exact integer rejection front") {
    val pv = Seq(("A", 0.002), ("B", 0.010), ("C", 0.020), ("D", 0.500))
      .toDF("key", "p")
    val out = Evaluation.benjaminiYekutieli(pv, "key", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getInt(4))).toMap
    // c(4) = Σ(1e9 div i) = 2083333333 nano; q_i = p·m·c/i then reverse cummin
    val cn = (1 to 4).map(1000000000L / _).sum
    def q(p: Double, rnk: Int): Long = math.min(1000000000L,
      math.round(math.round(p * 1e9).toDouble / 1e9 * 4 * (cn.toDouble / 1e9) / rnk * 1e9))
    assert(out("A")._1 == q(0.002, 1).toDouble / 1e9, out.toString)
    assert(out("B")._1 == q(0.010, 2).toDouble / 1e9, out.toString)
    assert(out("D")._1 == 1.0, "clamp at 1")
    // exact front: pn·m·cn ≤ αn·i·1e9 holds for ranks 1,2 only
    assert(out("A")._2 == 1 && out("B")._2 == 1 && out("C")._2 == 0 && out("D")._2 == 0,
      s"BY is stricter than BH exactly here: $out")
  }

  test("stratifiedAte: within-stratum diffs, renormalized weights, one-armed stratum excluded") {
    val rows = Seq(
      ("A", 1, 10L), ("A", 1, 20L), ("A", 0, 10L),          // diff 5
      ("B", 1, 100L), ("B", 0, 50L), ("B", 0, 50L),         // diff 50
      ("C", 1, 7L)                                          // control-less
    ).toDF("s", "t", "v")
    val out = Evaluation.stratifiedAte(rows, "s", col("t") === 1, col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(5) == 5.0 && out("A").getDouble(6) == 0.5, out("A").toString)
    assert(out("B").getDouble(5) == 50.0 && out("B").getDouble(6) == 0.5, out("B").toString)
    assert(out("C").isNullAt(5) && out("C").isNullAt(6), "one-armed stratum reports NULL")
    val all = out("__ALL__")
    assert(all.getLong(1) == 4L && all.getLong(2) == 3L)
    assert(all.getDouble(5) == 27.5 && all.getDouble(6) == 1.0,
      s"ATE = .5·5 + .5·50 over estimable strata only: $all")
  }

  test("qiniCurve: cumulative targeting value by decile; empty-arm prefix NULL") {
    // 10 users, score = 11−id (so rank k = id); treated evens convert
    // at ids 2,4,6; only control 9 converts
    val users = (1L to 10L).map(id =>
      (id, id % 2 == 0, Set(2L, 4L, 6L).contains(id) || id == 9L, 11L - id))
      .toDF("id", "tr", "conv", "score")
    val out = Evaluation.qiniCurve(users, "id", col("tr"), col("conv"), col("score"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).isNullAt(5), "no treated exposure yet → undefined")
    assert(out(1).getDouble(5) == 1.0 && out(1).getDouble(6) == 1.0, out(1).toString)
    assert(out(3).getDouble(5) == 2.0, s"two uplift conversions banked: ${out(3)}")
    val last = out(9)
    assert(last.getLong(1) == 5L && last.getLong(2) == 5L)
    assert(last.getDouble(5) == 2.0 && last.getDouble(6) == 0.4, last.toString)
  }

  test("rankBiasedOverlap: identical lists hit 1−p^D, disjoint lists 0, swap discounts top-heavily") {
    val a = Seq(("x", 3.0), ("y", 2.0), ("z", 1.0)).toDF("item", "score")
    val idem = Evaluation.rankBiasedOverlap(a, a, "item", "score",
      BigDecimal("0.5"), depth = 3).collect()(0)
    // A_d = 1 at every depth → Σ(1−p)p^(d−1) = 1 − p³ = 0.875
    assert(idem.getInt(0) == 3 && idem.getLong(1) == 3L && idem.getDouble(2) == 0.875
      && idem.getDouble(3) == 0.125, idem.toString)
    val b = Seq(("u", 3.0), ("v", 2.0), ("w", 1.0)).toDF("item", "score")
    val disj = Evaluation.rankBiasedOverlap(a, b, "item", "score",
      BigDecimal("0.5"), depth = 3).collect()(0)
    assert(disj.getLong(1) == 0L && disj.getDouble(2) == 0.0, disj.toString)
    // [x,y] vs [y,x] at D=2: overlap only completes at depth 2 → rbo = w₂·1 = 0.25
    val p = Seq(("x", 2.0), ("y", 1.0)).toDF("item", "score")
    val q = Seq(("y", 2.0), ("x", 1.0)).toDF("item", "score")
    val swap = Evaluation.rankBiasedOverlap(p, q, "item", "score",
      BigDecimal("0.5"), depth = 2).collect()(0)
    assert(swap.getLong(1) == 2L && swap.getDouble(2) == 0.25, swap.toString)
  }

  test("rankBiasedOverlap: items outside the top-D prefix never enter the overlap") {
    // shared item 'z' sits at rank 3 on side a but D=2 truncates it out
    val a = Seq(("x", 3.0), ("y", 2.0), ("z", 1.0)).toDF("item", "score")
    val b = Seq(("z", 3.0), ("q", 2.0)).toDF("item", "score")
    val r = Evaluation.rankBiasedOverlap(a, b, "item", "score",
      BigDecimal("0.5"), depth = 2).collect()(0)
    assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0, r.toString)
  }
}
