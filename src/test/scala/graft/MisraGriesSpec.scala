package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Misra–Gries guarantees: every item with true count > N/k is present,
  * estimates undercount by ≤ N/k, works as a grouped agg and from SQL. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: 'a' 500, 'b' 300, tail 'x0..x199' once each → N = 1000
  private def skewed = {
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ (0 until 200).map(i => s"x$i")
    // deterministic interleave so no partition is all-tail
    rows.zipWithIndex.sortBy(_._2 % 7).map(_._1).toDF("v").repartition(8)
  }

  test("heavy items guaranteed present; undercount bounded by N/k") {
    val mg = udaf(new MisraGries(k = 10))
    val summary = skewed.agg(mg(col("v")).as("mg")).head().getMap[String, Long](0)
    val n = 1000L
    assert(summary.contains("a") && summary.contains("b"), summary.toString) // > N/k = 100
    assert(summary("a") <= 500 && summary("a") >= 500 - n / 10, summary.toString)
    assert(summary("b") <= 300 && summary("b") >= 300 - n / 10, summary.toString)
  }

  test("grouped usage + SQL registration") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c")).toDF("g", "v")
    spark.udf.register("misra_gries_4", udaf(new MisraGries(4)))
    df.createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT g, misra_gries_4(v) AS mg FROM mg_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(out("g1") == Map("a" -> 2L, "b" -> 1L))
    assert(out("g2") == Map("c" -> 1L))
  }
}
