package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Relational operators not already pinned by the TPC-H oracles.
  * erasureAudit: the cascade arithmetic is the contract — a wrong count
  * here means a wrong GDPR deletion plan. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("erasureAudit: cascade counts through orders to lineitem, empty forget set") {
    val cust = Seq(1L, 2L, 3L, 4L).map(k => (k, s"c$k")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (100L, 1L), (101L, 1L), (102L, 2L), (103L, 3L)
    ).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 1), (100L, 2), (101L, 1), (102L, 1), (103L, 1), (999L, 1)
    ).toDF("l_orderkey", "l_linenumber")

    // forget customers 1 and 2: 2 customers, 3 orders, 4 lineitems (the
    // orphan 999 row and customer 3's order stay)
    val forget = Seq(1L, 2L).toDF("c_custkey")
    val out = Relational.erasureAudit(forget, cust, orders, li)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "customer" -> ((2L, 2L)),
      "orders"   -> ((3L, 1L)),
      "lineitem" -> ((4L, 2L))), out.toString)

    // duplicate keys in the request batch must not double-count
    val dup = Seq(1L, 1L, 2L).toDF("c_custkey")
    val d = Relational.erasureAudit(dup, cust, orders, li)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d == out)

    // empty forget set: zero deletions everywhere, full retention
    val none = Relational.erasureAudit(cust.filter(lit(false)).select("c_custkey"),
      cust, orders, li)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(none == Map(
      "customer" -> ((0L, 4L)), "orders" -> ((0L, 4L)), "lineitem" -> ((0L, 6L))))
  }

  test("erasureExecute: cascade deletes exactly the audit's counts; replay on the post-state deletes zero") {
    val cust = Seq(1L, 2L, 3L, 4L).map(k => (k, s"c$k")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (100L, 1L), (101L, 1L), (102L, 2L), (103L, 3L)
    ).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 1), (100L, 2), (101L, 1), (102L, 1), (103L, 1), (999L, 1)
    ).toDF("l_orderkey", "l_linenumber")
    val forget = Seq(1L, 2L).toDF("c_custkey")

    val out = Relational.erasureExecute(forget, cust, orders, li)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // survivors: customers {3,4} Σ=7; orders {103} Σ=103; lineitems
    // {(103,1),(999,1)} Σ = 103·8+1 + 999·8+1 = 825+7993
    assert(out == Map(
      "customer" -> ((4L, 2L, 2L, 7L)),
      "orders"   -> ((4L, 3L, 1L, 103L)),
      "lineitem" -> ((6L, 4L, 2L, 8818L))), out.toString)

    // EXECUTE the cascade, then replay it on the post-state: anti-joins
    // are idempotent, so the second pass must delete 0 rows per table —
    // the crash-recovery contract (child-first order means a partial run
    // resumes the same way)
    val states = Relational.erasureCascadeStates(forget, cust, orders, li).toMap
    val replay = Relational.erasureExecute(forget,
      states("customer"), states("orders"), states("lineitem"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(replay == Map("customer" -> 0L, "orders" -> 0L, "lineitem" -> 0L), replay.toString)

    // child-first ordering: the states list names lineitem before orders
    // before customer — writing in list order can never orphan children
    assert(Relational.erasureCascadeStates(forget, cust, orders, li).map(_._1) ==
      Seq("lineitem", "orders", "customer"))
  }
}
