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
