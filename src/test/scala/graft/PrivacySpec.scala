package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** Release-gate privacy audits: k-anonymity class sizes and l-diversity
  * sensitive-value counts, violations-only output. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: small class flagged k, homogeneous class flagged l, healthy class absent") {
    // at k=4, l=2:
    // class (US,A): 3 rows, 2 sensitive values  -> k-violation only
    // class (US,B): 4 rows, 1 sensitive value   -> l-violation only
    // class (DE,A): 2 rows, 2 sensitive values  -> k-violation
    // class (DE,B): 4 rows, 2 sensitive values  -> healthy, must be absent
    val df = Seq(
      ("US", "A", "s1"), ("US", "A", "s2"), ("US", "A", "s1"),
      ("US", "B", "s1"), ("US", "B", "s1"), ("US", "B", "s1"), ("US", "B", "s1"),
      ("DE", "A", "s1"), ("DE", "A", "s2"),
      ("DE", "B", "s1"), ("DE", "B", "s2"), ("DE", "B", "s1"), ("DE", "B", "s2")
    ).toDF("country", "segment", "secret")

    val out = Privacy.kAnonymityAudit(df, Seq("country", "segment"), "secret", k = 4, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out == Map(
      ("US", "A") -> ((3L, 2L, true, false)),
      ("US", "B") -> ((4L, 1L, false, true)),
      ("DE", "A") -> ((2L, 2L, true, false))), out.toString)

    // k=1, l=1 can never flag anything (every class has >=1 row, >=1 value)
    assert(Privacy.kAnonymityAudit(df, Seq("country", "segment"), "secret", 1, 1).count() == 0)

    // single quasi-column path + partitioning invariance
    val a = Privacy.kAnonymityAudit(df, Seq("country"), "secret", 10, 3).collect().map(_.toSeq).toSeq
    val b = Privacy.kAnonymityAudit(df.repartition(7), Seq("country"), "secret", 10, 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kAnonymityRepair: first level clearing k is chosen; finer levels flagged violating; none passes → no chosen") {
    // city level: classes of 1 (violates k=2); country level: classes 3+3
    val df = Seq(
      ("paris", "fr"), ("lyon", "fr"), ("nice", "fr"),
      ("bonn", "de"), ("koeln", "de"), ("mainz", "de")
    ).toDF("city", "country")
    val ladder = Seq("city" -> Seq(col("city")), "country" -> Seq(col("country")))
    val out = Privacy.kAnonymityRepair(df, ladder, k = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(out(0) == ((6L, 6L, false, false)), out.toString) // 6 singleton classes
    assert(out(1) == ((2L, 0L, true, true)), out.toString)   // chosen
    // k too large for every level: nothing passes, nothing chosen
    val none = Privacy.kAnonymityRepair(df, ladder, k = 10)
      .collect().map(r => (r.getBoolean(5), r.getBoolean(6)))
    assert(none.forall(t => !t._1 && !t._2))
  }

  test("dpNoisyCounts: bounded integer noise, reproducible, partition-invariant") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"g${i % 10}")).toDF("id", "grp")
    val truth = df.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = Privacy.dpNoisyCounts(df, "grp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rel.keySet == truth.keySet)
    // clamped discrete-Laplace noise: |noisy - true| <= 7, ε reported
    rel.foreach { case (g, (noisy, eps)) =>
      assert(math.abs(noisy - truth(g)) <= 7, s"$g: $noisy vs ${truth(g)}")
      assert(eps == 1.0)
    }
    // the release is a pure function of (seed, key): rerun + repartition equal
    val again = Privacy.dpNoisyCounts(df.repartition(13), "grp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == rel)
    // a different seed is a DIFFERENT release (new draws for these 10 keys)
    val other = Privacy.dpNoisyCounts(df, "grp", seed = "dp2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(other.exists { case (g, n) => n != rel(g)._1 })
  }

  test("dpNoisySum: clipping bounds the release, noise on the clip-unit scale") {
    import spark.implicits._
    // group a: 100 rows of 5.0 (sum 500); group b: 10 rows of 1000.0 that
    // CLIP to 10.0 (sum 100); group c: negatives clip to 0
    val df = ((1 to 100).map(i => ("a", 5.0)) ++ (1 to 10).map(_ => ("b", 1000.0)) ++
      (1 to 5).map(_ => ("c", -3.0))).toDF("grp", "v")
    val out = Privacy.dpNoisySum(df, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    // noise z in [-7,7] on the 10-unit scale: release within ±70 of the
    // clipped truth, and always a multiple of 10
    assert(math.abs(out("a")._1 - 500.0) <= 70.0, out.toString)
    assert(math.abs(out("b")._1 - 100.0) <= 70.0, out.toString)
    assert(math.abs(out("c")._1 - 0.0) <= 70.0, out.toString)
    out.values.foreach { case (s, c) => assert(s % 10.0 == 0.0 && c == 10.0) }
    // deterministic under layout
    val again = Privacy.dpNoisySum(df.repartition(9), "grp", "v").collect().map(_.toSeq).toSeq
    assert(again == Privacy.dpNoisySum(df, "grp", "v").collect().map(_.toSeq).toSeq)
  }

  test("tCloseness: hand TV distance with zero cells; threshold flags") {
    // global sensitive mix 4:4; class A is 3:1, class B 1:3 → t = 0.25 each
    val df = (Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq(("B", "x")) ++ Seq.fill(3)(("B", "y"))).toDF("quasi", "s")
    val out = Privacy.tCloseness(df, Seq("quasi"), "s", threshold = 0.2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(out("A") == ((4L, 0.25, 1)) && out("B") == ((4L, 0.25, 1)), out.toString)
    // a class missing a sensitive value entirely (zero cell) still scores:
    // C all-x vs global — |1−p_x| contributes, y's zero cell contributes p_y
    val df2 = df.unionAll(Seq.fill(4)(("C", "x")).toDF("quasi", "s"))
    val t = Privacy.tCloseness(df2, Seq("quasi"), "s", 0.2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // global now 8:4 → C: ½(|1−2/3| + |0−1/3|) = 1/3
    assert(math.abs(t("C") - 1.0 / 3) < 1e-9, t.toString)
    // matching mix → distance 0, no flag
    val bal = (Seq.fill(2)(("D", "x")) ++ Seq.fill(1)(("D", "y"))).toDF("quasi", "s")
    val t2 = Privacy.tCloseness(df2.unionAll(bal).unionAll(bal), Seq("quasi"), "s", 0.2)
    // D's 4:2 equals the new global 12:6
    val d = t2.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d("D") == 0.0, d.toString)
  }

  test("recursiveLDiversity: dominated class flagged, balanced passes, m<l fails by definition") {
    // X: counts (a=5,b=1,c=1) — distinct-l=3 PASSES l=3 but r1=5 ≥ 2·(tail r3=1) → (c,l) violation
    // Y: counts (2,2,2) balanced — r1=2 < 2·(tail=2) → passes
    // Z: only 2 distinct values — tail from rank 3 is empty (0), r1 ≥ 0 → violation
    val rows =
      Seq.fill(5)(("X", "a")) ++ Seq(("X", "b"), ("X", "c")) ++
      Seq(("Y", "a"), ("Y", "a"), ("Y", "b"), ("Y", "b"), ("Y", "c"), ("Y", "c")) ++
      Seq(("Z", "a"), ("Z", "a"), ("Z", "a"), ("Z", "b"), ("Z", "b"), ("Z", "b"))
    val df = rows.toDF("q", "s")
    val out = Privacy.recursiveLDiversity(df, Seq("q"), "s", l = 3, c = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out("X") == ((7L, 3L, 5L, 1L, 1)), out.toString)
    assert(out("Y") == ((6L, 3L, 2L, 2L, 0)), out.toString)
    assert(out("Z") == ((6L, 2L, 3L, 0L, 1)), out.toString)
  }

  test("recursiveLDiversity: strictness grows as c shrinks; frequency ties rank by value") {
    // counts (3,3): r1 is the tie ranked first (value asc) = 3; tail(l=2) = 3
    // c=2 → 3 < 6 passes; c=0.5 → 3 ≥ 1.5 violates
    val df = (Seq.fill(3)(("G", "b")) ++ Seq.fill(3)(("G", "a"))).toDF("q", "s")
    val loose = Privacy.recursiveLDiversity(df, Seq("q"), "s", l = 2, c = 2.0).collect()(0)
    val tight = Privacy.recursiveLDiversity(df, Seq("q"), "s", l = 2, c = 0.5).collect()(0)
    assert(loose.getInt(5) == 0 && tight.getInt(5) == 1)
    assert(loose.getLong(3) == 3L && loose.getLong(4) == 3L)
  }
}
