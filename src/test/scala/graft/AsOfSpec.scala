package graft

import org.apache.spark.sql.functions._
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

  // ---- native whole-operator path (AsOfJoinPlan/Strategy/Exec) ----

  private def native(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame, inner: Boolean = true) =
    org.apache.spark.sql.graftnative.NativeAsOf.join(
      l, r, "inst", "inst", "t", "qt", "quote_id", inner)

  test("native exec: same semantics as the union+window form on the hand case") {
    val quotesR = quotes.select(col("inst"), col("qt"), col("quote_id"), col("px"))
    val out = native(trades, quotesR)
      .select("trade_id", "quote_id", "px").orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10L, 1.0), (2L, 21L, 2.5), (4L, 30L, 3.0)), out.mkString)
    // left-outer keeps trade 3 with null right side
    val lo = native(trades, quotesR, inner = false)
      .orderBy("trade_id").collect()
    assert(lo.length == 4)
    val t3 = lo.find(_.getLong(0) == 3L).get
    assert(t3.isNullAt(5) && t3.isNullAt(6), t3.toString) // quote_id, px
  }

  test("native exec: parity with AsOf.join on a randomized corpus; repartition-stable") {
    val left = (1 to 500).map { i =>
      (i.toLong, (i % 13).toLong, ts(f"2024-01-01 10:${(i * 7) % 60}%02d:${(i * 3) % 60}%02d"))
    }.toDF("trade_id", "inst", "t")
    val right = (1 to 200).map { i =>
      ((i % 13).toLong, ts(f"2024-01-01 10:${(i * 11) % 60}%02d:${(i * 5) % 60}%02d"),
        i.toLong, i / 10.0)
    }.toDF("inst", "qt", "quote_id", "px")
      // dedupe per (inst, qt): highest quote_id wins, both forms agree
      .groupBy("inst", "qt").agg(max("quote_id").as("quote_id"), max("px").as("px"))
    val ref = AsOf.join(left, right, "inst", "t", "qt", Seq("quote_id"), "quote_id")
      .select("trade_id", "quote_id").orderBy("trade_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nat = native(left, right)
      .select("trade_id", "quote_id").orderBy("trade_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nat == ref, s"native=${nat.take(5)} ref=${ref.take(5)}")
    val natRep = native(left.repartition(7), right.repartition(3))
      .select("trade_id", "quote_id").orderBy("trade_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(natRep == ref)
  }

  test("native exec: plan contains AsOfJoinExec with Catalyst-inserted exchanges and sorts") {
    val plan = native(trades, quotes).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("native exec: null keys and null times never match") {
    val l = Seq((1L, Option(100L), Option(ts("2024-01-01 10:00:05"))),
                (2L, Option.empty[Long], Option(ts("2024-01-01 10:00:05"))),
                (3L, Option(100L), Option.empty[java.sql.Timestamp]))
      .toDF("trade_id", "inst", "t")
    val r = Seq((Option(100L), ts("2024-01-01 10:00:00"), 10L, 1.0),
                (Option.empty[Long], ts("2024-01-01 09:00:00"), 99L, 9.0))
      .toDF("inst", "qt", "quote_id", "px")
    val out = org.apache.spark.sql.graftnative.NativeAsOf.join(
        l, r, "inst", "inst", "t", "qt", "quote_id", inner = false)
      .orderBy("trade_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(5) == 10L)              // normal match
    assert(out(1).isNullAt(5) && out(2).isNullAt(5), out.mkString) // null key / null time
  }
}
