package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** The approximate sketch tier: KLL quantiles carry their own rank-error
  * guarantee (coin-flip compaction means bounds, not replay determinism);
  * theta set ops are deterministic and exact below sketch capacity. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kll: merged partition sketches respect the normalized rank-error bound") {
    val df = scala.util.Random.shuffle((1 to 10000).toList)
      .toDF("v").repartition(8)
    val sk = Sketches.kllPartitionSketches(df, "v")
    assert(sk.count() >= 2, "one sketch per partition")
    val out = Sketches.kllMergeQuantiles(sk, Seq(0.1, 0.5, 0.9)).collect()
    assert(out.forall(_.getLong(2) == 10000), "merged n sees every row")
    val err = out.head.getDouble(3)
    assert(err > 0 && err < 0.05, s"k=200 rank error ~1.6%: $err")
    out.foreach { r =>
      val p = r.getDouble(0); val est = r.getDouble(1)
      // values are 1..n so value distance IS rank distance
      assert(math.abs(est - p * 10000) <= 2 * err * 10000 + 1,
        s"q($p) = $est outside the bound")
    }
  }

  test("kll: empty input yields NULL estimates, n = 0") {
    val sk = Sketches.kllPartitionSketches(Seq.empty[Double].toDF("v"), "v")
    val out = Sketches.kllMergeQuantiles(sk, Seq(0.5)).collect()(0)
    assert(out.isNullAt(1) && out.getLong(2) == 0, out.toString)
  }

  test("kll exact regime (the q356 oracle argument): n <= k retains every " +
    "item and each inclusive quantile is the ceil(p*n)-th order statistic") {
    // adversarial values (duplicates, negatives, non-uniform spacing) so the
    // order-statistic identity is tested, not just value==rank luck
    val vals = ((1 to 500).map(i => (i % 37).toDouble - 5.0) ++
      Seq.fill(100)(0.25) ++ (1 to 400).map(i => i * 1.75)).toList
    val df = scala.util.Random.shuffle(vals).toDF("v").repartition(8)
    val n = vals.length
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val out = Sketches.kllMergeQuantiles(
      Sketches.kllPartitionSketches(df, "v", k = 65535), probs, k = 65535)
      .orderBy("p").collect()
    val sorted = vals.sorted
    probs.zip(out).foreach { case (p, r) =>
      val want = sorted(math.ceil(p * n).toInt - 1) // 1-indexed order stat
      assert(r.getDouble(1) == want,
        s"q($p): sketch ${r.getDouble(1)} != exact order statistic $want")
      assert(r.getLong(2) == n)
    }
  }

  test("kll approximate regime: n >> k stays inside the rank-error envelope") {
    val n = 300000
    val df = spark.range(1, n + 1).select(col("id").cast("double").as("v"))
      .repartition(16)
    val out = Sketches.kllMergeQuantiles(
      Sketches.kllPartitionSketches(df, "v", k = 200), Seq(0.5), k = 200)
      .collect()(0)
    val err = out.getDouble(3)
    // values are 1..n so value distance IS rank distance; 3x the bound
    // gives headroom over the 99% confidence the bound is stated at
    assert(math.abs(out.getDouble(1) - 0.5 * n) <= 3 * err * n,
      s"median ${out.getDouble(1)} vs ${0.5 * n} (err $err)")
  }

  test("theta estimation regime: 60k distincts within the k=4096 RSE envelope") {
    val a = spark.range(1, 60001).select(col("id")).repartition(8)
    val b = spark.range(30001, 90001).select(col("id")).repartition(8)
    val r = Sketches.thetaSetOps(a, "id", b, "id").collect()(0)
    // RSE ~ 1/sqrt(k) = 1.56% at k=4096; 5 sigma = ~8%
    def close(est: Double, truth: Double): Boolean =
      math.abs(est - truth) <= 0.08 * truth
    assert(close(r.getDouble(0), 60000) && close(r.getDouble(1), 60000), r.toString)
    assert(close(r.getDouble(2), 30000), s"intersection ${r.getDouble(2)}")
    assert(close(r.getDouble(3), 90000), s"union ${r.getDouble(3)}")
    assert(close(r.getDouble(4), 30000), s"a-not-b ${r.getDouble(4)}")
  }

  test("theta: set algebra is exact below sketch capacity") {
    val a = (1 to 1000).toDF("id").repartition(4)
    val b = (500 to 1500).toDF("id").repartition(4)
    val r = Sketches.thetaSetOps(a, "id", b, "id").collect()(0)
    assert(r.getDouble(0) == 1000.0 && r.getDouble(1) == 1001.0, r.toString)
    assert(r.getDouble(2) == 501.0, "intersection 500..1000")
    assert(r.getDouble(3) == 1500.0, "union 1..1500")
    assert(r.getDouble(4) == 499.0, "a minus b = 1..499")
  }
}
