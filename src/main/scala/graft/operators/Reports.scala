package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic warehouse report shapes (TPC-H Q1/Q3/Q5 patterns) over the star
  * schema — the "analytics engine completeness" tier above the reference's
  * own query surface.
  *
  * Scale notes: these are THE canonical 100 TB shapes. Q1 is a pure
  * scan+hash-agg (partial agg map-side, 6 aggregates in one pass); Q3/Q5 are
  * star joins where every dimension side broadcasts and the fact table never
  * shuffles before aggregation. All money math in DECIMAL: results are exact
  * and independent of partial-aggregation order. Averages are derived from
  * exact decimal sums (cast to double at the end) so they're deterministic
  * at any parallelism — never avg() over raw doubles.
  */
object Reports {

  private val disc = lit(1) - col("l_discount").cast("decimal(18,2)")
  private val price = col("l_extendedprice").cast("decimal(18,2)")

  /** Q1 pricing summary: one scan, grouped conditional aggregates. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem.filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
        sum(price).cast("decimal(18,2)").as("sum_base_price"),
        sum(price * disc).cast("decimal(18,4)").as("sum_disc_price"),
        sum(price * disc * (lit(1) + col("l_tax").cast("decimal(18,2)"))).cast("decimal(18,6)").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .cast("decimal(18,4)").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3 shipping priority: segment-filtered star join, top-10 by revenue. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String, date: String): DataFrame =
    lineitem.filter(col("l_shipdate") > lit(date).cast("timestamp"))
      .join(orders.filter(col("o_orderdate") < lit(date).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment).select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(price * disc).cast("decimal(18,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** Q5 local supplier volume: 5-way star join (supplier nation must equal
    * customer nation), region-filtered, revenue per nation. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                          regionName: String, from: String, until: String): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(price * disc).cast("decimal(18,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Ratio-to-report: each nation's share of total revenue. The total is a
    * 1-row aggregate CROSS-broadcast back — never `sum() OVER ()`, whose
    * empty partitioning collapses every row onto a single task. Decimal
    * sums exact; the share is one double division quantized (18,6). */
  def revenueShare(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame): DataFrame = {
    val byNation = orders
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("rev"))
      .localCheckpoint() // nation-count rows; total derives from it, one scan
    val total = byNation.agg(sum(col("rev")).cast("decimal(18,2)").as("tot"))
    byNation.crossJoin(broadcast(total))
      .select(col("n_name"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") / col("tot").cast("double"))
          .cast("decimal(18,6)").cast("double").as("share"))
      .orderBy("n_name")
  }

  /** Explicit GROUPING SETS — the general form behind [[statusYearCube]]'s
    * CUBE and [[orderRollup]]'s ROLLUP: exactly the requested grains, one
    * pass, no unwanted cross combinations. grouping_id() disambiguates a
    * real NULL key from a superaggregate row — the output contract every
    * BI layer expects. */
  def statusPriorityGroupingSets(orders: DataFrame): DataFrame =
    orders.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("double").as("revenue"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Pivot report: order counts per nation with one column per year.
    * Values are enumerated explicitly — an unenumerated pivot runs an extra
    * distinct-scan job to discover them, and unbounded output columns are a
    * schema hazard at scale. Empty cells coalesce to 0. */
  def nationYearPivot(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                      years: Seq[Int]): DataFrame =
    orders.select("o_custkey", "o_orderdate")
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("n_name").pivot("yr", years.map(_.asInstanceOf[Any])).agg(count(lit(1)))
      .select(col("n_name") +: years.map(y =>
        coalesce(col(y.toString), lit(0L)).as(s"y$y")): _*)
      .orderBy("n_name")

  /** UNPIVOT (melt): the wide pivot report back to tall (nation, year,
    * n_orders) rows — the import-side mirror of nationYearPivot for
    * consumers that want tidy data. Pure projection (Expand node): no
    * shuffle at all. */
  def unpivotYears(pivoted: DataFrame, years: Seq[Int]): DataFrame =
    pivoted.unpivot(
      Array(col("n_name")),
      years.map(y => col(s"y$y")).toArray,
      "o_year", "n_orders")
      .orderBy("n_name", "o_year")

  /** Month-over-month revenue per nation: windowed lag over the MONTHLY
    * AGGREGATE (cardinality = nations × months, tiny next to the fact
    * table), partitioned by nation so the window never needs a global
    * sort. DECIMAL money math end to end. */
  def monthlyRevenueDelta(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_name").orderBy("month")
    orders.select("o_custkey", "o_orderdate", "o_totalprice")
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("revenue"))
      .withColumn("prev_revenue", lag("revenue", 1).over(w))
      .withColumn("delta", (col("revenue") - col("prev_revenue")).cast("decimal(18,2)"))
      .orderBy("n_name", "month")
  }

  /** CUBE report: order counts at every grain of (orderstatus, year) —
    * (s,y), (s), (y), () — one Expand + one hash aggregate, same SQL-path
    * rationale as orderRollup. */
  def statusYearCube(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    orders.createOrReplaceTempView("graft_cb_orders")
    s.sql("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(CAST(year(o_orderdate) AS STRING), 'ALL') AS o_year,
             COUNT(*) AS n_orders
      FROM graft_cb_orders
      GROUP BY CUBE(o_orderstatus, year(o_orderdate))
      ORDER BY status, o_year""")
  }

  /** Decile bucketing: ntile(10) over order totals per year — the "which
    * decile is this order in" enrichment. Window per year, so parallelism =
    * #years × AQE splits, never a single global sort. */
  def orderDeciles(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_year").orderBy(col("total"), col("o_orderkey"))
    orders.select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
        col("o_totalprice").cast("decimal(18,2)").as("total"))
      .withColumn("decile", ntile(10).over(w))
      .orderBy("o_year", "decile", "o_orderkey")
  }

  /** Orders above their customer's average total — the correlated-subquery
    * shape, expressed as ONE window pass instead of a per-row subquery or a
    * groupBy+self-join (each would rescan orders). The comparison is
    * total × n > sum (exact decimal): dividing first would force a rounded
    * average whose last digit differs between decimal and double engines
    * exactly at the .00005 boundaries the data is full of. */
  def aboveCustomerAverage(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("total"))
      .withColumn("cust_sum", sum(col("total")).over(w).cast("decimal(18,2)"))
      .withColumn("n_cust_orders", count(lit(1)).over(w))
      .where(col("total") * col("n_cust_orders") > col("cust_sum"))
      .orderBy("o_orderkey")
  }

  /** ROLLUP report: order counts at (nation, year), (nation), and grand-total
    * grain in ONE pass — Catalyst expands the grouping sets inside a single
    * hash aggregate, so it costs one shuffle, not three scans. NULL grouping
    * slots are surfaced as 'ALL' so the output is self-describing.
    *
    * Expressed in SQL: `DataFrame.rollup` over a multi-join lineage trips
    * Spark's ambiguous-self-join detector (the Expand duplicates plan-level
    * dataset tags — reproduced on 4.1.2); `GROUP BY ROLLUP` through the SQL
    * path produces the identical plan without the Dataset-API tagging. */
  def orderRollup(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val s = orders.sparkSession
    orders.createOrReplaceTempView("graft_ru_orders")
    customer.createOrReplaceTempView("graft_ru_customer")
    nation.createOrReplaceTempView("graft_ru_nation")
    s.sql("""
      SELECT /*+ BROADCAST(c, n) */
             coalesce(n_name, 'ALL') AS nation,
             coalesce(CAST(year(o_orderdate) AS STRING), 'ALL') AS o_year,
             COUNT(*) AS n_orders
      FROM graft_ru_orders o
      JOIN graft_ru_customer c ON o_custkey = c_custkey
      JOIN graft_ru_nation n ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, year(o_orderdate))
      ORDER BY nation, o_year""")
  }

  /** RFM segmentation (Hughes' recency/frequency/monetary scoring): one
    * hash aggregate to per-customer metrics, then ntile windows
    * PARTITIONED BY market segment — scoring within segment keeps every
    * window a parallel partition (the global-ntile version is a
    * single-sort scale bug; per-cohort scoring is also the methodology:
    * a builder-segment customer competes with builder-segment peers).
    * Monetary sums in DECIMAL (order-independent), cast double only in
    * the final projection. Every window orders with a custkey tiebreak so
    * bucket boundaries are deterministic and engine-portable.
    *
    * Scale: aggregate ≪ orders; windows parallel by segment × AQE splits.
    * Reference analog: per-user listing + count surface
    * (job_repository.py:19-43) generalized to the classic CRM score. */
  def rfmSegments(orders: DataFrame, customer: DataFrame, asOf: String,
                  buckets: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = orders
      .join(broadcast(customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(
        datediff(lit(asOf).cast("date"), max(col("o_orderdate")).cast("date"))
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("mon_dec"))
    def tile(order: Seq[org.apache.spark.sql.Column]) = ntile(buckets).over(
      Window.partitionBy("c_mktsegment").orderBy(order: _*))
    // score 5 = best: most recent / most orders / highest spend
    per.select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      col("recency_days").cast("long").as("recency_days"), col("frequency"),
      col("mon_dec").cast("double").as("monetary"),
      (lit(buckets + 1) - tile(Seq(col("recency_days").asc, col("c_custkey").asc)))
        .cast("long").as("r_score"),
      tile(Seq(col("frequency").asc, col("c_custkey").asc)).cast("long").as("f_score"),
      tile(Seq(col("mon_dec").asc, col("c_custkey").asc)).cast("long").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy("c_custkey")
  }
}
