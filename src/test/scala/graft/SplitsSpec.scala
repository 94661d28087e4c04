package graft

import org.apache.spark.sql.functions._
import graft.operators.Splits

/** Deterministic splitting/mixing: exhaustive assignment, stable across
  * invocations, ratios near nominal, weighted mixing honors 0/partial/full. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(10000).toDF("doc_id")

  test("assignSplit: exhaustive, deterministic, ratios near 80/10/10") {
    val a = Splits.assignSplit(ids, "doc_id")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 10000 * 205.0 / 256) < 300, counts.toString)
    assert(math.abs(counts("val") - 10000 * 25.0 / 256) < 200, counts.toString)
    val b = Splits.assignSplit(ids, "doc_id").collect().map(_.toString).sorted
    assert(a.collect().map(_.toString).sorted.sameElements(b)) // run-to-run stable
  }

  test("mixBySource: full/half/zero weights") {
    val df = spark.range(6000)
      .select(col("id").as("doc_id"),
        element_at(array(lit("keep"), lit("half"), lit("drop")), (col("id") % 3 + 1).cast("int")).as("source"))
    val out = Splits.mixBySource(df, "doc_id", "source",
      Map("keep" -> 256, "half" -> 128, "drop" -> 0), default256 = 64)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("keep") == 2000)                         // weight 256 keeps all
    assert(math.abs(counts("half") - 1000) < 150, counts.toString) // ~50%
    assert(!counts.contains("drop"))                       // weight 0 keeps none
  }

  test("weightedSample: weight-proportional inclusion, deterministic, k per group") {
    // two weight classes in one group: weight 90 vs weight 10 (9:1) — the
    // heavy class should dominate the sample
    val df = spark.range(2000).select(col("id").as("doc_id"), lit("g").as("grp"),
      when(col("id") % 2 === 0, 90L).otherwise(10L).as("w"))
    val out = Splits.weightedSample(df, "grp", "doc_id", "w", 200)
    val picked = out.collect()
    assert(picked.length == 200)
    assert(picked.map(_.getLong(3)).sorted.toSeq == (1L to 200L).toSeq) // dense ranks
    val heavy = picked.count(_.getLong(2) == 90L)
    assert(heavy > 150, s"heavy=$heavy of 200") // ~9:1 odds ⇒ heavy class dominates
    // deterministic: identical sample on re-run and re-partition
    val again = Splits.weightedSample(df.repartition(11), "grp", "doc_id", "w", 200)
      .collect().map(_.toString).sorted.toSeq
    assert(picked.map(_.toString).sorted.toSeq == again)
    // zero/negative weights never selected
    val withZero = df.withColumn("w", when(col("doc_id") < 1000, 0L).otherwise(col("w")))
    assert(Splits.weightedSample(withZero, "grp", "doc_id", "w", 5000)
      .filter(col("doc_id") < 1000).isEmpty)
  }

  test("temperatureSample: quotas follow count^alpha, capped by budget, kept ≤ target") {
    // 3 groups with counts 8100, 900, 100 → sqrt weights 90, 30, 10 →
    // alpha=0.5 quotas of a 1300 budget are exactly 900, 300, 100
    val df = spark.range(9100)
      .select(col("id").as("doc_id"),
        when(col("id") < 8100, "big").when(col("id") < 9000, "mid").otherwise("small").as("lang"))
    val out = Splits.temperatureSample(df, "lang", "doc_id", 1300L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("big") == ((8100L, 900L, 900L)), out.toString)
    assert(out("mid") == ((900L, 300L, 300L)), out.toString)
    assert(out("small") == ((100L, 100L, 100L)), out.toString)
    // a group smaller than its quota keeps everything it has
    val tiny = df.filter(col("lang") =!= "big")
    val t = Splits.temperatureSample(tiny, "lang", "doc_id", 5000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(t("mid") == 900L && t("small") == 100L, t.toString)
  }

  test("negativeSample: k per anchor, no self, no same-text partner, deterministic") {
    // 100 docs; stride 7919 ≡ 19 (mod 100), so anchor 0's partners are
    // ranks 19/38/57 — doc 19 gets doc 0's text to plant a positive that
    // the fingerprint filter MUST drop
    val docs = (0L until 100L).map(i => (i, if (i == 19) "text0" else s"text$i"))
      .toDF("doc_id", "text")
    val neg = Splits.negativeSample(docs, "doc_id", "text", k = 3)
    val rows = neg.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall { case (a, _, b) => a != b })
    val perAnchor = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perAnchor(0L) == 2, perAnchor.toString) // positive partner dropped
    assert(perAnchor.values.max <= 3)
    assert(!rows.exists { case (a, _, b) => Set(a, b) == Set(0L, 19L) })
    val again = Splits.negativeSample(docs.repartition(7), "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("classBalance: every class lands exactly on the max class size") {
    // classes: a=6 rows, b=3, c=1 → target 6; copies per class sum to 6
    val df = ((1L to 6L).map((_, "a")) ++ (7L to 9L).map((_, "b")) ++ Seq((10L, "c")))
      .toDF("id", "cls")
    val out = Splits.classBalance(df, "id", "cls")
    val sizes = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 6L, "b" -> 6L, "c" -> 6L), sizes.toString)
    // majority rows appear exactly once; the single c row 6 times
    val copies = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(copies.count(_._1 == "a") == 6 && copies.filter(_._1 == "a").forall(_._3 == 1L))
    assert(copies.count(t => t._1 == "c" && t._2 == 10L) == 6)
  }

  test("stratifiedSplit: EXACT floor counts per stratum; tiny strata keep a test row") {
    // stratum a: 100 rows -> 80/10/10 exactly; stratum b: 7 rows ->
    // floor(5.6)=5 train, floor(0.7)=0 val, 2 test — never starved
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 107).map(i => (i.toLong, "b"))
    val out = Splits.stratifiedSplit(rows.toDF("doc_id", "source"), "doc_id", "source")
      .collect().map(r => (r.getString(1), r.getString(2)))
    val counts = out.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts(("a", "train")) == 80 && counts(("a", "val")) == 10
      && counts(("a", "test")) == 10)
    assert(counts(("b", "train")) == 5 && counts(("b", "test")) == 2
      && !counts.contains(("b", "val")))
    // deterministic under repartitioning: identical assignment set
    val again = Splits.stratifiedSplit(rows.toDF("doc_id", "source").repartition(8),
      "doc_id", "source").collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val first = Splits.stratifiedSplit(rows.toDF("doc_id", "source"),
      "doc_id", "source").collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(again == first)
  }

  test("topPByGroup: boundary row kept, p=0 keeps the single heaviest, exact head block") {
    // group a: weights 50,30,15,5 (total 100); p=700‰ keeps 50,30 (cum-before
    // 0,50 < 70) and the boundary row 15 (cum-before 80 >= 70? 80*10=800 >= 700 → cut)
    val df = Seq(("a", 1L, 50L), ("a", 2L, 30L), ("a", 3L, 15L), ("a", 4L, 5L),
      ("b", 5L, 1L)).toDF("source", "doc_id", "n_chars")
    val out = Splits.topPByGroup(df, "source", "doc_id", "n_chars", 700)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 5L)), out.mkString(","))

    // the row CROSSING the boundary is kept: weights 60,40 at p=700 — row 2's
    // cum-before is 60 < 70 → kept even though it overshoots to 100
    val cross = Seq(("a", 1L, 60L), ("a", 2L, 40L)).toDF("source", "doc_id", "n_chars")
    assert(Splits.topPByGroup(cross, "source", "doc_id", "n_chars", 700).count() == 2)

    // p=0 still keeps exactly the heaviest row per group (cum-before 0 < 0 is
    // false — but 0*1000 < 0 fails… the ≥1 guarantee comes from cum-before=0)
    val p0 = Splits.topPByGroup(df, "source", "doc_id", "n_chars", 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(p0 == Seq(("a", 1L), ("b", 5L)), p0.toString)

    // weight ties break on id; repartition-invariant
    val tied = (1L to 100L).map(i => ("g", i, 10L)).toDF("source", "doc_id", "n_chars")
    val t1 = Splits.topPByGroup(tied, "source", "doc_id", "n_chars", 500)
      .collect().map(_.getLong(1)).toSeq
    assert(t1 == (1L to 50L), s"${t1.take(5)}…${t1.length}")
    val t8 = Splits.topPByGroup(tied.repartition(8), "source", "doc_id", "n_chars", 500)
      .collect().map(_.getLong(1)).toSeq
    assert(t8 == t1)
  }

  test("crossSplitLeakage: planted cross-boundary copy caught, same-split copy and unique docs are not") {
    // choose ids so the md5 bucket puts 1 in train and 101 in test (checked
    // below), then give them identical text — that's a leak; 2/102 with
    // identical text in the SAME split is not; unique texts never appear
    val base = (1L to 200L).map(i => (i, s"text body $i"))
    val assigned = Splits.assignSplit(base.toDF("doc_id", "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val crossPair = base.map(_._1).combinations(2)
      .find { case Seq(a, b) => assigned(a) == "train" && assigned(b) == "test" }.get
    val samePair = base.map(_._1).combinations(2)
      .find { case Seq(a, b) => !crossPair.contains(a) && !crossPair.contains(b) &&
        assigned(a) == "train" && assigned(b) == "train" }.get
    val docs = base.map { case (i, t) =>
      val text = if (crossPair.contains(i)) "LEAKED CONTENT"
        else if (samePair.contains(i)) "SAFE DUP" else t
      (i, text)
    }.toDF("doc_id", "text")
    val out = Splits.crossSplitLeakage(docs, "doc_id", "text").collect()
    assert(out.length == 1, out.mkString(","))
    assert(out(0).getLong(1) == 1L && out(0).getLong(3) == 1L) // 1 train + 1 test
    // clean corpus: no leakage rows at all
    assert(Splits.crossSplitLeakage(base.toDF("doc_id", "text"), "doc_id", "text")
      .count() == 0)
  }

  test("walkForwardFolds: hand-checked fold membership, embargo excluded, last row tested") {
    // epochs 0..100 → cuts at 20/40/60/80; embargo 5 s
    val es = Seq(0L, 10L, 20L, 25L, 30L, 50L, 99L, 100L)
    val df = es.zipWithIndex.map { case (e, i) => (e, (i % 3).toLong) }.toDF("ts", "uid")
    val out = Splits.walkForwardFolds(df, "ts", "uid", nFolds = 4, embargoSeconds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1, "train") -> 2L, (1, "purged") -> 1L, (1, "test") -> 2L,
      (2, "train") -> 5L, (2, "test") -> 1L,
      (3, "train") -> 6L,
      (4, "train") -> 6L, (4, "test") -> 2L), out.toString)
    // the boundary row es=20 is PURGED in fold 1 (not train, not test), and
    // the corpus max es=100 lands in fold 4's test (hi = max+1)
    val f4 = Splits.walkForwardFolds(df, "ts", "uid", 4, 5)
      .where(col("fold") === 4 && col("split") === "test").head()
    assert(f4.getLong(5) == 100L, f4.toString)
  }

  test("clusterAwareSplit: whole cluster lands in ONE split; transitive chains; leakage audit reads zero") {
    // chain 1-2, 2-3 (transitive cluster {1,2,3}); pair {10,11}; 20 alone
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (11L, "e"),
      (20L, "f")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_id_a", "doc_id_b")
    val out = Splits.clusterAwareSplit(docs, "doc_id", pairs, "doc_id_a", "doc_id_b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L) // rep = min id
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)        // one split
    assert(out(10L)._2 == out(11L)._2)
    assert(out(20L)._1 == 20L)
    // closing the loop: exact copies split cluster-aware → NO leakage rows
    val base = (1L to 200L).map(i => (i, s"text body $i"))
    val dup = base.take(40).map { case (i, t) => (i + 2000000L, t) }
    val corpus = (base ++ dup).toDF("doc_id", "text")
    val h = corpus.select(col("doc_id").as("doc_id_a"), md5(col("text")).as("h"))
    val p2 = h.join(corpus.select(col("doc_id").as("doc_id_b"), md5(col("text")).as("h")), "h")
      .where(col("doc_id_a") < col("doc_id_b")).select("doc_id_a", "doc_id_b")
    val assigned = Splits.clusterAwareSplit(corpus, "doc_id", p2, "doc_id_a", "doc_id_b")
      .join(corpus, "doc_id")
    val leaks = assigned
      .groupBy(md5(col("text")).as("th"))
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1)
    assert(leaks.count() == 0)
  }

  test("proportionalAllocation: sums exactly to total; remainders to largest fractions; ties to name") {
    // sizes 5/3/2 over total 10 → exact 5/3/2; over total 7 → quotas
    // 3.5/2.1/1.4 → floors 3/2/1 + 1 leftover → largest remainder (a: .5)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("src")
    def alloc(total: Long) = Splits.proportionalAllocation(df, "src", total)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(alloc(10) == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    assert(alloc(7) == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(alloc(7).values.sum == 7L)
    // equal remainders: sizes 1/1 over total 3 → .5/.5, tie → 'x' first
    val tie = Seq("x", "y").toDF("src")
    assert(Splits.proportionalAllocation(tie, "src", 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap ==
      Map("x" -> 2L, "y" -> 1L))
  }

  test("rendezvousShards: total, deterministic, balanced-ish; resize moves ONLY keys the new shard wins") {
    val ids = (1L to 2000L).toDF("id")
    val at8 = Splits.rendezvousShards(ids, "id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(at8.size == 2000 && at8.values.forall(s => s >= 0 && s < 8))
    // every shard gets a sane share (expected 250; md5 is near-uniform)
    val byShard = at8.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.size == 8 && byShard.values.forall(n => n > 150 && n < 350),
      byShard.toMap.toString)
    // THE consistent-hashing property: at N=9, a key either keeps its N=8
    // shard or moves to the NEW shard 8 — never between old shards
    val at9 = Splits.rendezvousShards(ids, "id", 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = at8.keys.filter(k => at9(k) != at8(k))
    assert(moved.forall(k => at9(k) == 8), "a key moved between OLD shards")
    // moved fraction ≈ 1/9 of keys
    assert(moved.size > 120 && moved.size < 330, moved.size.toString)
    assert(Splits.rendezvousShards(ids, "id", 1).collect().forall(_.getInt(1) == 0))
  }
}
