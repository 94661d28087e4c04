package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized range join: equals the naive inequality join, each pair
  * produced exactly once, and the plan is a hash equi-join (never a
  * nested-loop). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-02 11:00:00")),
    (3L, ts("2024-01-05 23:59:59")), (4L, ts("2024-01-06 00:00:00")),
    (5L, ts("2024-03-01 12:00:00"))
  ).toDF("pid", "ts")

  // overlapping intervals; end exclusive
  private def intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00")),
    (11L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")),
    (12L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))
  ).toDF("iid", "w_start", "w_end")

  test("matches the naive inequality join exactly, once per pair") {
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "w_start", "w_end", 86400L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = points.join(intervals,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got == got.distinct, "pair emitted more than once")
    assert(got.contains((1L, 10L)) && got.contains((3L, 10L)) && !got.contains((4L, 10L)))
  }

  test("granularity coarser than intervals still correct") {
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "w_start", "w_end", 7 * 86400L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = points.join(intervals,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
  }

  test("intervalOverlap: equals naive overlap join, exactly once per pair") {
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00")),
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))
    ).toDF("aid", "s", "e")
    val b = Seq(
      (10L, ts("2024-01-09 23:00:00"), ts("2024-01-12 00:00:00")), // overlaps 1 only
      (11L, ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")), // overlaps all
      (12L, ts("2024-01-10 00:00:00"), ts("2024-01-11 00:00:00"))  // abuts 1 (end-exclusive): no
    ).toDF("bid", "s", "e")
    val got = RangeJoin.intervalOverlap(a, "s", "e", b, "s", "e", 86400L)
      .select("aid_a", "bid_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = a.join(b.withColumnRenamed("s", "s2").withColumnRenamed("e", "e2"),
        col("s") < col("e2") && col("s2") < col("e"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got == got.distinct)
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 11L), (3L, 11L)))
  }

  test("plan is a hash equi-join on the bucket, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "ts", intervals, "w_start", "w_end", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("scd2Lookup: version valid at ts; open tail matches; pre-history and foreign keys null; no fact dup") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Option(ts("2024-02-01 00:00:00"))),
      (1L, "B", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp]),
      (2L, "Z", ts("2024-03-01 00:00:00"), Option(ts("2024-03-01 00:00:00"))), // zero-length
      (2L, "Y", ts("2024-03-01 00:00:00"), None: Option[java.sql.Timestamp])
    ).toDF("k", "v", "valid_from", "valid_to")
    val fact = Seq(
      (100L, 1L, ts("2024-01-15 00:00:00")), // inside A
      (101L, 1L, ts("2024-02-01 00:00:00")), // boundary: A closed, B opens
      (102L, 1L, ts("2023-12-01 00:00:00")), // before history
      (103L, 2L, ts("2024-03-01 00:00:00")), // zero-length Z invisible → Y
      (104L, 9L, ts("2024-01-01 00:00:00"))  // unknown key
    ).toDF("fid", "k", "ts")
    val out = RangeJoin.scd2Lookup(fact, "k", "ts", dim, "k", "valid_from", "valid_to")
      .select(col("fid"), col("__d_v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out == Map(100L -> "A", 101L -> "B", 102L -> null,
      103L -> "Y", 104L -> null), out.toString)
    assert(RangeJoin.scd2Lookup(fact, "k", "ts", dim, "k", "valid_from", "valid_to")
      .count() == 5) // left join never duplicates facts
  }

  test("gridProximityJoin: in-radius pairs found across cell boundaries, exactly once, far pairs never") {
    import spark.implicits._
    val pts = Seq(
      (1L, 0L, 0L), (2L, 30L, 40L),      // dist² = 2500, same cell
      (3L, 10000L, 10000L),              // far from everything
      (4L, 199L, 0L), (5L, 201L, 0L)     // dist² = 4, straddles cells 1|2
    ).toDF("id", "x", "y")
    val out = RangeJoin.gridProximityJoin(pts, "id", "x", "y", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 2500L, (4L, 5L) -> 4L), out.toString)
    // count() == distinct pair count: the 3×3 probe meets each pair once
    assert(RangeJoin.gridProximityJoin(pts, "id", "x", "y", 100L).count() == 2)
  }

  test("haversineNearestHub: points at a hub route to it; known distance checks out") {
    import spark.implicits._
    val hubs = Seq(("east", 0.0, 90.0), ("west", 0.0, -90.0), ("north", 89.0, 0.0))
    val pts = Seq(
      (1L, 0.0, 90.0),    // exactly on east → dist 0
      (2L, 0.0, 89.0),    // 1° of longitude on the equator ≈ 111.2 km, east
      (3L, 0.0, -80.0),   // west side
      (4L, 88.0, 10.0)    // near the pole → north
    ).toDF("id", "lat", "lon")
    val out = RangeJoin.haversineNearestHub(pts, "id", "lat", "lon", hubs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("east")._1 == 2 && out("west")._1 == 1 && out("north")._1 == 1, out.toString)
    // equatorial degree: 6371·π/180 ≈ 111.2 km; the max over east's two
    // points is that arc (the other is 0)
    assert(math.abs(out("east")._2 - 111.2) <= 0.1, out.toString)
    // per-point argmin ties break deterministically: a point equidistant
    // from east and west (lon 0, south of north's reach) picks 'east' by name
    val tie = RangeJoin.haversineNearestHub(
      Seq((9L, -45.0, 0.0)).toDF("id", "lat", "lon"), "id", "lat", "lon", hubs)
      .collect().map(_.getString(0)).toSet
    assert(tie == Set("east"), tie.toString)
  }
}
