package graft

import org.apache.spark.sql.functions._
import graft.operators.Reports

/** Report-shape operators that aren't already pinned by the TPC-H oracle
  * queries. RFM: ntile bucket boundaries and the score orientation (5 =
  * best) are the contract. */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("rfmSegments: quintile boundaries, score orientation, per-segment isolation") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"1998-01-$day%02d 00:00:00")
    // segment S: 10 customers; customer k places k orders of 10.0 each,
    // latest on day k → frequency k, monetary 10k, recency 30-k days.
    // All three metrics rank identically (customer 10 best on all).
    val orders = (1 to 10).flatMap { k =>
      (1 to k).map(j => (k * 100L + j, k.toLong, "O", 10.0, ts(k), "1-URGENT"))
    } ++ Seq((9999L, 42L, "O", 5.0, ts(15), "1-URGENT")) // lone T-segment customer
    val odf = orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val cdf = ((1 to 10).map(k => (k.toLong, s"c$k", 0, 0.0, "S")) :+
      ((42L, "c42", 0, 0.0, "T"))).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

    val out = Reports.rfmSegments(odf, cdf, "1998-01-31").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap

    // 10 rows in segment S → ntile(5) buckets of exactly 2; customer k's
    // f/m scores are ⌈k/2⌉, and r aligns because recency ranks the same way
    (1 to 10).foreach { k =>
      val (rec, freq, mon, r, f, m, rfm) = out(k.toLong)
      val expected = ((k + 1) / 2).toLong
      assert(freq == k.toLong && mon == 10.0 * k && rec == (31 - k).toLong)
      assert(r == expected && f == expected && m == expected, s"cust $k: $r/$f/$m")
      assert(rfm == expected * 111)
    }
    // the lone T customer is scored against its own segment only: all 5s
    // under the "6 - ntile" orientation r=5, and f=m=1×ntile=1... a single
    // row lands in bucket 1 → r_score = 5, f_score = m_score = 1
    val (_, _, _, r42, f42, m42, _) = out(42L)
    assert(r42 == 5L && f42 == 1L && m42 == 1L)
  }
}
