package graft

import graft.operators.AsOf

/** As-of join semantics: latest-at-or-before match, equal-time inclusion,
  * tie-break determinism, inner vs left behavior, plan shape. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, 100L, ts("2024-01-01 10:00:05")),
    (2L, 100L, ts("2024-01-01 10:00:10")),
    (3L, 100L, ts("2024-01-01 09:59:00")), // before any quote → no match
    (4L, 200L, ts("2024-01-01 10:00:10"))
  ).toDF("trade_id", "inst", "t")

  private val quotes = Seq(
    (100L, ts("2024-01-01 10:00:00"), 10L, 1.0),
    (100L, ts("2024-01-01 10:00:10"), 20L, 2.0), // equal time as trade 2 → matches
    (100L, ts("2024-01-01 10:00:10"), 21L, 2.5), // same time, higher tieBreak wins
    (200L, ts("2024-01-01 10:00:00"), 30L, 3.0)
  ).toDF("inst", "qt", "quote_id", "px")

  test("inner: latest at-or-before, equal time included, deterministic tie") {
    val out = AsOf.join(trades, quotes, "inst", "t", "qt",
        Seq("quote_id", "px"), "quote_id")
      .orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, 1.0),  // only the 10:00:00 quote precedes
      (2L, 21L, 2.5),  // equal-time quotes match; quote_id 21 wins the tie
      (4L, 30L, 3.0)))
    // trade 3 dropped (inner, no quote before it)
  }

  test("left: unmatched rows kept with null payload") {
    val out = AsOf.join(trades, quotes, "inst", "t", "qt",
        Seq("quote_id", "px"), "quote_id", inner = false)
      .orderBy("trade_id").collect()
    assert(out.length == 4)
    val t3 = out.find(_.getLong(0) == 3L).get
    assert(t3.isNullAt(3) && t3.isNullAt(4))
  }

  test("inner: a match whose payload field is NULL is still a match") {
    val q = Seq((100L, ts("2024-01-01 10:00:00"), 10L, Option.empty[Double]))
      .toDF("inst", "qt", "quote_id", "px")
    val t = Seq((1L, 100L, ts("2024-01-01 10:00:05"))).toDF("trade_id", "inst", "t")
    // px (a payload column) is NULL on the matched quote — the row must survive
    val out = AsOf.join(t, q, "inst", "t", "qt", Seq("px", "quote_id"), "quote_id")
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(3) && out.head.getLong(4) == 10L)
  }

  test("plan: single shuffle on the key, no join node, no cartesian") {
    val df = AsOf.join(trades, quotes, "inst", "t", "qt", Seq("quote_id"), "quote_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)              // union+window, not a join
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }
}
