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
}
