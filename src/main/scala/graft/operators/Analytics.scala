package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wider analytics surface: ordered-set aggregates, distinct counts, running
  * windows, sessionization, and a salting helper for skewed joins.
  *
  * Scale notes:
  *  - percentile/countDistinct are single hash-aggregate shuffles; Spark's
  *    partial aggregation combines map-side.
  *  - running totals / sessionization shuffle ONCE on the partition key and
  *    sort within partitions — the window frames are running
  *    (UNBOUNDED PRECEDING → CURRENT ROW), so state per group is O(1).
  *  - `approxStats` shows the sketch path (HLL / approx quantiles) used when
  *    exactness is not required at 100 TB — constant memory per group.
  */
object Analytics {

  /** Exact interpolated percentiles per group (ordered-set aggregate). */
  def percentiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).cast("decimal(18,2)").as("p50_qty"),
        percentile(col("l_quantity"), lit(0.9)).cast("decimal(18,2)").as("p90_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Exact distinct counts per group (expand+two-phase agg under the hood). */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Sketch-based variant for 100 TB scale: DataSketches HLL distinct +
    * GK approximate median — constant/bounded memory, one pass, mergeable
    * partials. BOTH are oracle-checkable in their exact regimes (which
    * hold through the driver SFs): the HLL stays in coupon mode below
    * ~512 distinct so its estimate EQUALS count(distinct) (the q89
    * argument), and the GK summary's rank error eps·n < 1/2 at
    * n ≤ accuracy/2 pins the returned element to the true lower median.
    * The approximate regimes are asserted within error bounds in
    * AnalyticsSpec. (approx_count_distinct — Spark's HLL++ — is dense
    * from the start and misestimates even tiny groups; the DataSketches
    * sketch is the one with an exact small-cardinality mode.) */
  def approxStats(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"),
           approx_percentile(col("value"), lit(0.5), lit(100000)).as("approx_p50_value"))
      .orderBy("event_type")

  /** Semi-structured extraction: pull a typed field out of a JSON string
    * column and aggregate it. get_json_object is a codegen'd path expression —
    * no UDF, no full from_json schema materialization for a single field. */
  def jsonFieldSum(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy("event_type")

  /** Running (cumulative) total of value per user over event time. */
  def runningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ts drives the ordering but is not projected: the driver-side oracle
    // compares raw values, and parquet ns→µs truncation would differ
    events.select(col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("decimal(18,2)").as("running_value"),
        row_number().over(w).as("event_seq"))
      .orderBy("user_id", "event_id")
  }

  /** Sessionization: a new session starts when the gap to the previous event
    * of the same user exceeds `gapMinutes`. Classic lag → flag → cumulative
    * sum; one shuffle on user_id, two running windows over the same sort. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(byUser)
    // floor-of-epoch seconds on both engines (timestamp→long is a floor);
    // count(when…) keeps the running counter BIGINT in Spark AND DuckDB
    // (a windowed SUM(int) would be HUGEINT in the oracle)
    val newSession = when(prevTs.isNull ||
      col("ts").cast("long") - prevTs.cast("long") > gapMinutes * 60L, 1L)
    events.select(col("user_id"), col("event_id"),
        count(newSession).over(run).as("session_id"))
      .orderBy("user_id", "event_id")
  }

  /** Deterministic fixed-size sample per group: the k rows with the smallest
    * md5(id) in each group — a consistent hash-sample (same rows on every
    * run, every engine, any partitioning; adding rows only perturbs the
    * sample by what hashed below the old cut). Plans as WindowGroupLimit:
    * each partition keeps ≤k rows per group BEFORE the shuffle. */
  def sampleByGroup(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .orderBy(keyCol, "sample_rank")
  }

  /** Sketch-based heavy hitters: estimate the frequency of `candidates` from
    * a count-min sketch built in ONE mergeable aggregation pass (Spark's
    * built-in `count_min_sketch`, eps/confidence-sized). Constant memory per
    * partition at 100 TB; estimates overcount by at most eps·N with
    * probability `confidence` (never undercount). */
  def heavyHitters(df: DataFrame, column: String, candidates: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df.select(
        count_min_sketch(col(column), lit(eps), lit(confidence), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    candidates.map(c => (c, sketch.estimateCount(c)))
      .toDF(column, "est_count").orderBy(column)
  }

  /** Key-skew profile: the pre-flight check before any big join/groupBy on
    * `keyCol` — per-key counts reduced to distribution stats plus the hottest
    * key. max_rows / avg_rows ≫ 1 says "salt this key or let AQE split it"
    * BEFORE the job ships. One hash agg (map-side partials) + a tiny stats
    * pass over #distinct-keys rows. */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    // materialized once: stats and hottest both derive from it, and without
    // this the source scan + agg would run twice (no automatic subtree reuse)
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n_rows")).localCheckpoint()
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      min("n_rows").as("min_rows"),
      max("n_rows").as("max_rows"),
      (sum("n_rows").cast("double") / count(lit(1))).cast("decimal(18,4)").as("avg_rows"))
    val hottest = counts.orderBy(desc("n_rows"), desc(keyCol)).limit(1)
      .select(col(keyCol).as("hottest_key"))
    stats.crossJoin(hottest) // 1×1
  }

  /** Gap-filled monthly series: every (nation, month) slot between the
    * global min and max month exists, zero-filled where no orders landed —
    * resampling for time-series consumers that can't tolerate missing
    * buckets. The calendar spine is sequence+explode over the GLOBAL month
    * range (a 1-row aggregate crossed with the distinct keys — never a
    * driver-side loop); the fact side left-joins onto it. */
  def monthlySeriesFilled(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame): DataFrame = {
    val joined = orders.select("o_custkey", "o_orderdate")
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), date_trunc("month", col("o_orderdate")).as("month"))
    val monthly = joined.groupBy("n_name", "month").agg(count(lit(1)).as("n_orders"))
      .localCheckpoint() // spine bounds + fact side both derive from it
    val bounds = monthly.agg(min("month").as("lo"), max("month").as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MONTH"))).as("month"))
      .crossJoin(monthly.select("n_name").distinct())
    spine.join(monthly, Seq("n_name", "month"), "left")
      .select(col("n_name"), col("month"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("n_name", "month")
  }

  /** Funnel conversion: users whose first `stepB` follows their first
    * `stepA` within `windowHours`. Two filtered aggregates + one join on
    * user — never a self-join of raw events against raw events. Returns one
    * row: entrants, conversions, rate. */
  def funnel(events: DataFrame, stepA: String, stepB: String,
             windowHours: Int): DataFrame = {
    val a = events.where(col("event_type") === stepA)
      .groupBy("user_id").agg(min("ts").as("t_a"))
      .localCheckpoint() // both the entrant count and the join reuse it
    val b = events.where(col("event_type") === stepB)
      .join(a, "user_id")
      .where(col("ts") > col("t_a") &&
        col("ts") <= col("t_a") + expr(s"INTERVAL $windowHours HOURS"))
      .select("user_id").distinct()
    a.agg(count(lit(1)).as("n_entered"))
      .crossJoin(b.agg(count(lit(1)).as("n_converted")))
      .withColumn("conv_rate",
        (col("n_converted").cast("double") / col("n_entered")).cast("decimal(18,4)"))
  }

  /** Data-profiling report: per-column null count, distinct count, min and
    * max (as strings for a uniform tall schema) — the pre-ingest sanity
    * check. ONE scan: all per-column aggregates ride in a single Aggregate
    * (count-distincts expand inside it); the wide 1-row result is melted
    * driver-side (4×N scalar values — trivially small). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +: columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")
    val spark = df.sparkSession
    import spark.implicits._
    columns.map { c =>
      (c, total - row.getAs[Long](s"__nn_$c"), row.getAs[Long](s"__nd_$c"),
        row.getAs[String](s"__mn_$c"), row.getAs[String](s"__mx_$c"))
    }.toDF("col_name", "n_null", "n_distinct", "min_value", "max_value")
      .orderBy("col_name")
  }

  /** SCD2 history from a changelog: per key, each observed value gets a
    * [valid_from, valid_to) interval; consecutive repeats collapse first so
    * intervals describe CHANGES, and the latest interval stays open
    * (valid_to null). Two windows over the same (key, ts) shuffle —
    * Spark reuses the sort.
    *
    * [[scd2History]] is the SAME operator's Kimball-shaped readout
    * (integer-micros bounds, explicit seq tiebreak, version + is_current
    * columns) — both ride [[scd2Collapse]]; SURVEY §2 counts the pair as
    * one capability. */
  def scd2(changes: DataFrame, keyCol: String, valueCol: String,
           tsCol: String): DataFrame =
    scd2Collapse(changes.select(col(keyCol), col(valueCol), col(tsCol)),
        keyCol, valueCol, Seq(tsCol, valueCol))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("__to").as("valid_to"))
      .orderBy(keyCol, "valid_from")

  /** Shared run-collapse core behind [[scd2]] and [[scd2History]]: per
    * `key` under the total order `ord`, drop rows whose `value` repeats
    * the previous row's, then attach the next SURVIVING row's leading
    * order column as the closing bound (`__to`, NULL on the open run)
    * and the run index (`__version`). One key-partitioned window pass —
    * shuffles once on the key, O(1) frame state, sort reused across the
    * lag/lead/row_number. */
  private def scd2Collapse(rows: DataFrame, key: String, value: String,
                           ord: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.map(col): _*)
    rows.withColumn("__pv", lag(col(value), 1).over(w))
      .filter(col("__pv").isNull || col("__pv") =!= col(value))
      .drop("__pv")
      .withColumn("__to", lead(col(ord.head), 1).over(w))
      .withColumn("__version", row_number().over(w))
  }

  /** Fixed-width histogram: bin = floor((v - lo) / width), counts per bin.
    * One hash agg; bin math is a single correctly-rounded double op so the
    * cut points are engine-identical. Out-of-range rows clamp into the edge
    * bins (a histogram must account for every row). */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double,
                nBins: Int): DataFrame = {
    val raw = floor((col(valueCol).cast("double") - lo) / width)
    val bin = least(greatest(raw, lit(0.0)), lit((nBins - 1).toDouble)).cast("long")
    df.groupBy(bin.as("bin")).agg(count(lit(1)).as("n_rows"))
      .withColumn("bin_lo", (lit(lo) + col("bin") * width).cast("decimal(18,2)"))
      .select("bin", "bin_lo", "n_rows")
      .orderBy("bin")
  }

  /** Pearson correlation per group — computed from EXACT decimal sums
    * (order-independent at any parallelism), with the one double-precision
    * step LAST on five scalars per group:
    * corr = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ᵗ)(n·Σy² − Σy²ᵗ)).
    * A running double corr() would be partial-aggregation-order dependent —
    * the same class of last-ulp flake the q64 oracle fix documents. */
  def corrByGroup(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    df.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(18,2)").as("sx"),
        sum(y).cast("decimal(18,2)").as("sy"),
        sum(x * y).cast("decimal(18,4)").as("sxy"),
        sum(x * x).cast("decimal(18,4)").as("sxx"),
        sum(y * y).cast("decimal(18,4)").as("syy"))
      .select(col(groupCol), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
               * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .cast("decimal(18,4)").as("corr"))
      .orderBy(groupCol)
  }

  /** Z-score anomaly flagging per group: rows more than `zThresh` standard
    * deviations from their group mean. Group mean/std derive from EXACT
    * decimal Σx/Σx² (order-independent — same design as corrByGroup); the
    * rowwise z uses those two scalars, so the flag set is deterministic at
    * any parallelism. Stats broadcast back onto the stream — the fact side
    * never shuffles. */
  def zScoreAnomalies(df: DataFrame, groupCol: String, valueCol: String,
                      zThresh: Double): DataFrame = {
    val x = col(valueCol).cast("decimal(18,2)")
    val stats = df.groupBy(groupCol).agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(18,2)").as("sx"),
        sum(x * x).cast("decimal(18,4)").as("sxx"))
      .select(col(groupCol),
        (col("sx").cast("double") / col("n")).as("mean"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          / (col("n").cast("double") * col("n"))).as("std"))
    df.join(broadcast(stats), groupCol)
      .withColumn("z", ((x.cast("double") - col("mean")) / col("std")).cast("decimal(18,4)"))
      .where(abs(col("z")) > zThresh)
      .select(col(groupCol), col(valueCol), col("z"))
  }

  /** Sequence-model feature extraction: each event carries its k previous
    * values in the same key's timeline as typed columns (null-padded at the
    * start). ONE shuffle on the key; all k lags ride the same window sort.
    * Columns (not arrays) so downstream schemas stay flat and engine
    * formatting never leaks into the values. */
  def lagFeatures(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val v = col(valueCol).cast("decimal(18,2)")
    val lags = (1 to k).map(i => lag(v, i).over(w).as(s"lag$i"))
    events.select((col(keyCol) +: col(idCol) +: v.as("value") +: lags): _*)
      .orderBy(keyCol, idCol)
  }

  /** Equi-depth histogram: bin edges at exact quantiles, so every bin holds
    * ~rows/k rows — the adaptive complement to [[histogram]]'s fixed-width
    * bins, which collapse on skewed data (one bin takes 99% of rows). The k-1
    * interior edges come from ONE exact-percentile aggregate (array form),
    * broadcast back; binning is a map-side array search. Duplicate edges
    * (heavy single values) merge bins — reported, not hidden. */
  def equiDepthHistogram(df: DataFrame, valCol: String, k: Int): DataFrame = {
    require(k >= 2, "need at least 2 bins")
    val fracs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val edges = df.agg(percentile(col(valCol), fracs).as("edges"))
    df.crossJoin(broadcast(edges))
      // edge i is the UPPER bound of bin i; values above the last edge fall
      // into bin k-1. aggregate() counts edges <= x — codegen'd, no UDF.
      .select(aggregate(col("edges"), lit(0),
        (acc, e) => when(col(valCol) > e, acc + 1).otherwise(acc)).as("bin"),
        col("edges"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        first("edges").as("__e"))
      .select(col("bin"),
        when(col("bin") === 0, lit(null).cast("double"))
          .otherwise(element_at(col("__e"), col("bin")))
          .cast("decimal(18,4)").cast("double").as("bin_lo"),
        col("n_rows"))
      .orderBy("bin")
  }

  /** Median absolute deviation per group — the robust outlier scale
    * (insensitive to the extreme values that inflate a stddev, so a single
    * corrupt row can't mask every other anomaly, unlike [[zScoreAnomalies]]'
    * z denominator). Two exact-percentile passes: group medians (broadcast
    * back — group-count-sized), then the median of |x − m|. Exact
    * `percentile`, not approx: the oracle twin is quantile_cont. */
  def madByGroup(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val med = df.groupBy(keyCol)
      .agg(percentile(col(valCol), lit(0.5)).as("med"))
    df.join(broadcast(med), keyCol)
      .groupBy(keyCol)
      .agg(
        first(col("med")).as("median"),
        percentile(abs(col(valCol) - col("med")), lit(0.5)).as("mad"),
        count(lit(1)).as("n_rows"))
      .select(col(keyCol),
        col("median").cast("decimal(18,4)").cast("double").as("median"),
        col("mad").cast("decimal(18,4)").cast("double").as("mad"),
        col("n_rows"))
      .orderBy(keyCol)
  }

  /** Pearson chi-square association between two categorical columns — the
    * contingency-table independence test (is label distribution different
    * across sources? is status independent of priority?). Aggregates to
    * |A|×|B| cells first, so everything after the one groupBy is
    * dimension-table-sized regardless of input rows. Per-cell terms are
    * deterministic double chains (bit-equal across engines); the ORDER-
    * dependent step — summing terms — happens in decimal, exact. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = df.groupBy(aCol, bCol).agg(count(lit(1)).as("o")).localCheckpoint()
    val ra = o.groupBy(aCol).agg(sum("o").as("ra"))
    val cb = o.groupBy(bCol).agg(sum("o").as("cb"))
    val n = o.agg(sum("o").as("n"),
      countDistinct(aCol).as("ka"), countDistinct(bCol).as("kb"))
    // the FULL |A|×|B| grid, not just observed cells: a structurally-zero
    // cell still contributes (0-E)²/E — dropping it understates association
    // (a perfectly-associated 2×2 would read χ²=N/2 instead of N)
    val cells = ra.crossJoin(cb)
      .join(o, Seq(aCol, bCol), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = (col("ra") * col("cb")).cast("double") / col("n")
    val term = ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
      .cast("decimal(28,10)")
    cells.crossJoin(broadcast(n))
      .select(term.as("t"), col("n"), col("ka"), col("kb"))
      .groupBy("n", "ka", "kb")
      .agg(sum("t").as("chi2_sum"))
      .select(col("n").as("n_rows"),
        ((col("ka") - 1) * (col("kb") - 1)).as("dof"),
        col("chi2_sum").cast("double").as("chi2"))
  }

  /** Trailing time-RANGE window aggregate (e.g. 7-day rolling revenue):
    * unlike the ROWS frames of [[runningTotals]]/[[lagFeatures]], the frame
    * is defined by the TIME VALUE — rows with equal timestamps are peers and
    * always share a frame, and gaps shrink the window. One shuffle on the
    * key, one sort; the range frame is evaluated with a sliding pointer, not
    * per-row rescans. Sum stays decimal (exact) until the boundary. */
  def rollingTimeWindow(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, valCol: String, days: Int): DataFrame = {
    val secs = days.toLong * 86400L
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__sec"))
      .rangeBetween(-(secs - 1), 0) // trailing `days` worth of seconds, inclusive
    events
      .select(col(keyCol), col(idCol), col(tsCol).cast("long").as("__sec"),
        col(valCol).cast("decimal(18,2)").as("__v"))
      .withColumn("rolling_value",
        sum(col("__v")).over(w).cast("decimal(18,2)").cast("double"))
      .select(col(keyCol), col(idCol), col("rolling_value"))
      .orderBy(keyCol, idCol)
  }

  /** Global sequence numbers in a total order WITHOUT the single-partition
    * window. `row_number() OVER (ORDER BY …)` collapses 100 TB onto one
    * task; this is the classic two-pass shape instead: range-partitioned
    * sort (stays distributed), per-partition counts to the driver (one Long
    * per partition), exclusive-prefix offsets broadcast back, map-side
    * offset + local index. The driver traffic is O(partitions), never
    * O(rows). Sequence ids are the backbone of training-data sharding
    * (example ids, deterministic shuffles of fixed corpora). Ties in
    * `sortCols` must be broken by the caller (include a unique id) for a
    * deterministic numbering — same contract as SQL row_number. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[String],
                      outCol: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(sortCols.map(col): _*)
      .localCheckpoint() // pin the range partitioning: pass 2 must see pass 1's exact partitions
    val counts = sorted.rdd.mapPartitionsWithIndex { (p, it) =>
      Iterator((p, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val schema = sorted.schema.add(outCol, "long", nullable = false)
    val out = sorted.rdd.mapPartitionsWithIndex { (p, it) =>
      var i = offsets.value(p)
      it.map { r => i += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    }
    spark.createDataFrame(out, schema)
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL through
    * Spark's codegen'd `hll_sketch_agg`). The point vs `countDistinct`:
    * sketches computed per batch/partition/day UNION in O(sketch size) —
    * so incremental loads never re-scan history, and a 100 TB backfill
    * reduces to merging per-partition sketches. Estimate error ~1.6% at
    * the default lgConfigK=12. */
  def hllSketchByGroup(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(keyCol).agg(hll_sketch_agg(col(valCol)).as("sketch"))

  /** Merge per-batch sketches (same group key) into one estimate. */
  def hllMergeEstimate(sketches: DataFrame, keyCol: String): DataFrame =
    sketches.groupBy(keyCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))
      .orderBy(keyCol)

  /** Exact mergeable aggregate state per key (count / decimal sum / min /
    * max) — the EXACT counterpart of the HLL pipeline above: compute a
    * state per incremental batch, store states, and a 100 TB backfill's
    * running totals update by merging key-count-sized states instead of
    * re-scanning history. Decimal sums are associative, so merge order and
    * partitioning can never change the answer. */
  def aggState(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(keyCol).agg(
      count(lit(1)).as("n"),
      sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"))

  /** Merge [[aggState]] rows (same key, any number of batches) into final
    * figures — bit-identical to a single full-scan aggregate, proven by the
    * q151 oracle. Derived average: one double division, quantized. */
  def mergeAggStates(states: DataFrame, keyCol: String): DataFrame =
    states.groupBy(keyCol).agg(
        sum("n").as("n"),
        sum("sum_v").cast("decimal(18,2)").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))
      .select(col(keyCol), col("n"),
        col("sum_v").cast("double").as("sum_v"),
        col("min_v"), col("max_v"),
        (col("sum_v").cast("double") / col("n").cast("double"))
          .cast("decimal(18,6)").cast("double").as("avg_v"))
      .orderBy(keyCol)

  /** Skew-safe join: salt the big side's hot keys into `saltFactor` subkeys
    * and explode the small side across all salts — turns one hot reducer
    * into `saltFactor` even ones. Use when AQE's skew handling isn't enough
    * (e.g. a single pathological key in a 100 TB fact table). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    // salt from the ROW CONTENT, not monotonically_increasing_id(): the id
    // depends on partition/task numbering, so a task retry (or AQE re-plan)
    // would re-salt rows differently mid-job; a content hash is identical on
    // every attempt, keeping the operator deterministic under failure.
    // Caveat by construction: rows that are FULLY identical share a salt (no
    // deterministic function can separate them) — exact-duplicate hot-key
    // skew should be collapsed with a count aggregate BEFORE joining, which
    // is cheaper than any salting. Map columns are excluded from the hash
    // (Spark cannot hash MapType); every other column participates.
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val saltedBig = big.withColumn("_salt",
      pmod(hash(hashable: _*), lit(saltFactor)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Cohort retention: users grouped by their first-activity day, then for
    * each requested day-offset, how many of the cohort were active again
    * exactly that many days later. The classic product-analytics triangle
    * (day-0 size, day-1/3/7 return counts) — all integer arithmetic, so the
    * oracle comparison is exact.
    *
    * Shape for scale: one shuffle on user (min-date cohort agg), the
    * (user, day) activity set is deduped BEFORE the cohort join (events per
    * user-day can be huge; distinct first makes the join input bounded by
    * users×days), and the cohort side joins back on user — the natural key
    * both sides already shuffle on. Offsets filter BEFORE the final count
    * agg so the last shuffle carries only cohort_day×|offsets| partials. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       offsets: Seq[Int]): DataFrame = {
    val day = to_date(col(tsCol))
    val activity = events.select(col(userCol), day.as("__day")).distinct()
    val cohorts = activity.groupBy(userCol)
      .agg(min(col("__day")).as("cohort_day"))
    activity.join(cohorts, userCol)
      // long, matching the oracle's BIGINT datediff
      .withColumn("day_offset", datediff(col("__day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset").isin(offsets: _*))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Distinct users per trailing `days`-day window, per key, for every
    * observed day — the sliding-window DAU/WAU family. COUNT(DISTINCT) over
    * a RANGE frame isn't expressible as a window function in either engine;
    * the distributed shape is: dedup to (key, user, day) FIRST (bounding
    * everything after at users×days, independent of event volume), then
    * map-side explode each user-day to the ≤`days` window anchors it feeds,
    * semi-join to observed anchors, and one distinct-count shuffle on
    * (key, anchor day). No self-join of the raw event stream, no per-day
    * rescan. */
  def slidingDistinct(events: DataFrame, keyCol: String, userCol: String,
                      tsCol: String, days: Int): DataFrame = {
    val day = to_date(col(tsCol))
    val ud = events.select(col(keyCol), col(userCol), day.as("__day")).distinct()
    val anchors = ud.select(col(keyCol), col("__day").as("day")).distinct()
    val contrib = ud.select(col(keyCol), col(userCol),
      explode(sequence(col("__day"), date_add(col("__day"), days - 1))).as("day"))
    contrib.join(anchors, Seq(keyCol, "day"), "left_semi")
      .groupBy(col(keyCol), date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy(keyCol, "day")
  }

  /** First-order Markov transition matrix over each user's event sequence:
    * count + probability of next_type given prev_type. The base table of
    * sequence mining (next-action prediction, anomalous-flow detection).
    * One window shuffle on user (all lag work rides it), pair counts shuffle
    * on the (prev, next) pair; row totals are a #types-sized broadcast. The
    * probability is ONE double division — bit-equal across engines. */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("next_type"))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(count(lit(1)).as("n_from"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("prev_type", "next_type")
  }

  /** Entropy rate of the behavior Markov chain — ONE number for "how
    * predictable are these users": H = Σ_i π(i)·H(row i) over
    * [[markovTransitions]]' matrix with the empirical prev-state
    * distribution as π. H ≈ 0 means the next action is foretold (bots,
    * replayed traffic); H near log₂|types| means uniform wandering. The
    * summary the per-cell transition report doesn't give you.
    *
    * Counts are exact; each cell's π(i)·p·log₂p term is a fixed double
    * chain over exact integers quantized DECIMAL(28,12) before the
    * order-independent sum; the |types|-sized tables broadcast. */
  def markovEntropyRate(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("next_type"))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .localCheckpoint() // row totals + grand total + the term scan
    val totals = counts.groupBy("prev_type").agg(sum("n").as("n_from"))
    val grand = totals.agg(sum("n_from").as("n_all"))
    val p = col("n").cast("double") / col("n_from").cast("double")
    val pi = col("n_from").cast("double") / col("n_all").cast("double")
    val term = (pi * p * (log(p) / math.log(2.0))).cast("decimal(28,12)")
    counts.join(broadcast(totals), Seq("prev_type"))
      .crossJoin(broadcast(grand))
      .agg(count(lit(1)).as("n_cells"),
        sum(term).as("hNeg"), countDistinct("prev_type").as("n_states"))
      .select(col("n_states").cast("long").as("n_states"),
        col("n_cells").cast("long").as("n_cells"),
        (col("hNeg").cast("double") * -1d)
          .cast("decimal(18,9)").cast("double").as("entropy_rate_bits"))
  }

  /** Deterministic k-fold cross-validation of the per-group mean model
    * (conformal's base predictor, CV'd): folds assign by md5, each fold's
    * prediction for a row is the LEAVE-FOLD-OUT group mean
    * (Σ_g − Σ_{g,fold})/(n_g − n_{g,fold}) — computed from ONE
    * (group × fold) aggregate, never k re-trainings — and the report is
    * per-fold MSE plus the mean/sd across folds: the variance a single
    * holdout hides, which is the whole point of CV.
    *
    * Rows whose group sits ENTIRELY inside the scored fold have no
    * trained model and are excluded from that fold's MSE (reported via
    * the fold row counts). */
  def kFoldCv(df: DataFrame, idCol: String, groupCol: String,
              valueCol: String, k: Int = 5): DataFrame = {
    // EXACT integer micro-units throughout (the leveneTest rule, CV
    // form): quantizing a ~1e10-magnitude double to a fine decimal is
    // NOT engine-portable — the other engine rounds v·10^s in double
    // domain with ulp(v·10^s)/2 slack, several quantization units at
    // these magnitudes. Predictions are half-up integer-division means
    // in micro-dollars; squared errors are exact integers; only the
    // final per-fold/cross-fold chains run in double, and the one
    // decimal re-quantization (mse at scale 0) sits 16 orders of
    // magnitude above the double noise.
    val fold = pmod(conv(substring(md5(concat(lit("cv:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long"), lit(k))
    val cents = (col(valueCol).cast("decimal(18,2)") * 100)
      .cast("decimal(28,0)").cast("long")
    val base = df.select(col(groupCol).as("grp"), cents.as("yc"), fold.as("f"))
      .localCheckpoint() // cell aggregate + the scoring pass
    val cells = base.groupBy("grp", "f")
      .agg(count(lit(1)).as("nc"), sum("yc").as("sc"))
    val gTot = cells.groupBy("grp").agg(sum("nc").as("ng"), sum("sc").as("sg"))
    // leave-fold-out micro-dollar means, half-up integer division
    val lfo = cells.join(gTot, Seq("grp"))
      .select(col("grp"), col("f"),
        (col("ng") - col("nc")).as("nTrain"),
        (col("sg") - col("sc")).cast("long").as("sTrain"))
      .withColumn("yhatMicro",
        expr("(sTrain * 20000 + nTrain) div (2 * nTrain)"))
    val scored = base
      .join(lfo.select(col("grp"), col("f"), col("nTrain"), col("yhatMicro")),
        Seq("grp", "f"))
      .filter(col("nTrain") > 0) // a group fully inside one fold has no model
      .select(col("f"),
        ((col("yc") * 10000L - col("yhatMicro")).cast("decimal(28,0)") *
          (col("yc") * 10000L - col("yhatMicro"))).as("se")) // micro² exact
    val folds = scored.groupBy("f")
      .agg(count(lit(1)).as("n"), sum("se").as("sse"))
      // mse in whole dollar² (scale 0): Σse/(n·10¹²) is one double chain
      // over exact ints; unit-rounding it is 16 orders above double noise
      .select(col("f"), col("n"),
        (col("sse").cast("double") /
          (col("n").cast("double") * 1e12)).cast("decimal(18,0)").as("mse"))
      .localCheckpoint() // rows + the cross-fold summary read it twice
    val summary = folds.agg(
      (sum("mse").cast("double") / count(lit(1)).cast("double")).as("mean_mse"),
      count(lit(1)).as("kk"),
      sum(col("mse") * col("mse")).as("mse2"))
    folds.crossJoin(broadcast(summary))
      .select(col("f").cast("long").as("fold"), col("n").cast("long").as("n_rows"),
        col("mse").cast("double").as("mse"),
        col("mean_mse").as("mean_mse"),
        when(col("kk") > 1,
          sqrt(greatest(lit(0d), (col("mse2").cast("double") - col("kk").cast("double") *
            col("mean_mse") * col("mean_mse")) / (col("kk") - 1).cast("double"))))
          .otherwise(lit(null).cast("double")).as("sd_mse"))
      .orderBy("fold")
  }

  /** Last-touch attribution: each conversion event credits the event-type
    * that immediately preceded it in the same user's timeline within
    * `windowMinutes` — or "direct" when the conversion opens cold. One
    * window shuffle; the credit report is a tiny count aggregate. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           idCol: String, typeCol: String, conversion: String,
                           windowMinutes: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevType = lag(col(typeCol), 1).over(w)
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
    events
      .withColumn("touch",
        when(prevType.isNotNull && gap <= windowMinutes * 60L, prevType)
          .otherwise(lit("direct")))
      .filter(col(typeCol) === conversion)
      .groupBy("touch").agg(count(lit(1)).as("n_conversions"))
      .orderBy("touch")
  }

  /** Position-based (U-shaped) multi-touch attribution — the MULTI-touch
    * upgrade of [[lastTouchAttribution]]: each conversion's credit splits
    * 40% to the FIRST touch, 40% to the LAST, and 20% evenly across the
    * middles (the standard 40/20/40 U; k = 2 → 50/50, k = 1 → 100%) over
    * the touches inside the lookback window. Last-touch over-credits the
    * bottom of the funnel; the U-shape pays discovery AND closing.
    *
    * Shape: conversions × in-window touches is a per-user interval join
    * (the [[funnelConversion]] family — bounded by the lookback, never a
    * cross of all history); ranks come from one window over each
    * conversion's touch set; every credit quantizes to DECIMAL(18,9)
    * before the per-channel sum, so totals are exact and order-free.
    * Ties on touch time break by event id (total order, engine-stable). */
  def positionAttribution(events: DataFrame, userCol: String, tsCol: String,
                          idCol: String, typeCol: String, conversion: String,
                          touchTypes: Seq[String], windowDays: Int): DataFrame = {
    val conv = events.filter(col(typeCol) === conversion)
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("cts"),
        col(idCol).as("cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("tts"),
        col(idCol).as("tid"), col(typeCol).as("channel"))
    val joined = conv.join(touch, Seq("u"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - lit(windowDays.toLong * 86400L))
    val w = Window.partitionBy("u", "cid").orderBy(col("tts"), col("tid"))
    val ranked = joined
      .withColumn("r", row_number().over(w))
      .withColumn("k", count(lit(1)).over(Window.partitionBy("u", "cid")))
    val credit = when(col("k") === 1, lit(1.0d))
      .when(col("r") === 1 || col("r") === col("k"),
        when(col("k") === 2, lit(0.5d)).otherwise(lit(0.4d)))
      .otherwise(lit(0.2d) / (col("k").cast("double") - 2d))
    ranked
      .withColumn("credit", credit.cast("decimal(18,9)"))
      .groupBy("channel")
      .agg(sum("credit").as("c"), count(lit(1)).as("n_touches"),
        countDistinct(col("cid")).as("n_conversions"))
      .select(col("channel"), col("c").cast("double").as("total_credit"),
        col("n_touches"), col("n_conversions"))
      .orderBy("channel")
  }

  /** Exact Shapley-value channel attribution (Shapley 1953 as applied to
    * marketing journeys) — the axiomatic end of the attribution ladder
    * after [[lastTouchAttribution]] (position-blind) and
    * [[positionAttribution]] (heuristic U): with coalition value
    * v(S) = number of conversions whose touched-channel set ⊆ S, channel
    * c's credit is φ_c = Σ_{S ∌ c} |S|!(n−1−|S|)!/n! · (v(S∪{c}) − v(S)).
    * Efficiency holds by construction: Σφ = v(all) = every converted
    * journey's single unit of credit, split by marginal contribution
    * over every arrival order instead of by position.
    *
    * FULLY EXACT and scale-shaped: the only row-scaled work is the same
    * bounded per-user interval join as the U-model plus ONE journey-grain
    * aggregate to channel-set bitmasks (sum(DISTINCT bit) ≡ OR for
    * distinct powers of two — portable to SQL verbatim); everything after
    * lives on ≤ 2^n rows (n ≤ 6 enforced). Subset sums ride an explode
    * of each mask's literal superset list (projection, no nested-loop
    * join); marginal terms are integer products k!(n−1−k)!·Δv summed
    * exactly, with n! divided out ONCE at the end. */
  def shapleyAttribution(events: DataFrame, userCol: String, tsCol: String,
                         idCol: String, typeCol: String, conversion: String,
                         touchTypes: Seq[String], windowDays: Int): DataFrame = {
    require(touchTypes.nonEmpty && touchTypes.size <= 6,
      "coalition lattice is 2^n — keep the channel list small")
    val n = touchTypes.size
    val full = (1L << n) - 1L
    val fact = Array(1L, 1L, 2L, 6L, 24L, 120L, 720L)
    val conv = events.filter(col(typeCol) === conversion)
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("cts"),
        col(idCol).as("cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("tts"),
        col(typeCol).as("channel"))
    val bitOf = touchTypes.zipWithIndex.tail.foldLeft(
      when(col("channel") === touchTypes.head, lit(1L))) {
      case (acc, (t, j)) => acc.when(col("channel") === t, lit(1L << j))
    }
    val journeys = conv.join(touch, Seq("u"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - lit(windowDays.toLong * 86400L))
      .select(col("u"), col("cid"), bitOf.as("b"))
      .groupBy("u", "cid").agg(sum_distinct(col("b")).as("m"))
    val cnt = journeys.groupBy("m").agg(count(lit(1)).as("cm")) // ≤ 2^n rows
    // v(s) = Σ_{m ⊆ s} cnt(m): explode each mask's literal superset list
    val v = cnt
      .select(explode(filter(array((0L to full).map(lit): _*),
        s => s.bitwiseAND(col("m")) === col("m"))).as("s"), col("cm"))
      .groupBy("s").agg(sum("cm").as("v"))
    val coal = events.sparkSession.range(0, full + 1).toDF("s")
    val vAll = coal.join(broadcast(v), Seq("s"), "left")
      .withColumn("v", coalesce(col("v"), lit(0L)))
    val bitJ = (0 until n).tail.foldLeft(when(col("j") === 0, lit(1L))) {
      (acc, j) => acc.when(col("j") === j, lit(1L << j))
    }
    val wgt = (0 until n).tail.foldLeft(
      when(expr("bit_count(s)") === 0, lit(fact(0) * fact(n - 1)))) {
      (acc, p) => acc.when(expr("bit_count(s)") === p, lit(fact(p) * fact(n - 1 - p)))
    }
    val pairs = vAll
      .select(col("s"), col("v"),
        explode(array((0 until n).map(j => lit(j)): _*)).as("j"))
      .withColumn("bj", bitJ)
      .filter(col("s").bitwiseAND(col("bj")) === 0)
      .withColumn("sw", col("s") + col("bj"))
      .join(broadcast(vAll.select(col("s").as("sw"), col("v").as("vw"))), Seq("sw"))
    val name = (0 until n).tail.foldLeft(
      when(col("j") === 0, lit(touchTypes.head))) {
      (acc, j) => acc.when(col("j") === j, lit(touchTypes(j)))
    }
    pairs
      .groupBy("j")
      .agg(sum(wgt * (col("vw") - col("v"))).as("num"),
        sum(when(col("sw") === full, col("vw") - col("v"))
          .otherwise(lit(0L))).as("n_journeys"))
      .select(name.as("channel"),
        (col("num").cast("double") / lit(fact(n).toDouble))
          .cast("decimal(18,9)").cast("double").as("shapley_credit"),
        col("n_journeys"))
      .orderBy("channel")
  }

  /** Per-group OLS regression (slope of y on x) from EXACT integer power
    * sums — the same order-independence design as [[zScoreAnomalies]], in
    * SCALE-0 centi-units (the round-8 fix: the previous (18,4) decimal sums
    * overflowed their 14 integer digits on the sf1 full pass — day×price
    * products summed past 7.8e14). x̂ = round(100x), ŷ = round(100y) are
    * exact integers; Σx̂, Σŷ, Σx̂ŷ, Σx̂² accumulate in scale-0 decimals
    * (associative, partitioning-invariant), and the 10⁴ quantization factor
    * cancels between numerator and denominator, so the slope is unchanged.
    * Declared precisions keep every product at ≤ 38 total digits (Spark
    * silently reduces SCALE past 38 — at scale 0 that is harmless while
    * values fit): safe to ~1e9 rows/group at price-scale magnitudes; beyond
    * that, pre-aggregate or accept a double fold. One shuffle on the group
    * key, nothing else. */
  def regressionByGroup(df: DataFrame, groupCol: String, xCol: Column,
                        yCol: Column): DataFrame = {
    val xi = round(xCol.cast("double") * lit(100d)).cast("decimal(19,0)")
    val yi = round(yCol.cast("double") * lit(100d)).cast("decimal(19,0)")
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(xi).cast("decimal(19,0)").as("sx"),
        sum(yi).cast("decimal(19,0)").as("sy"),
        sum(xi * yi).cast("decimal(28,0)").as("sxy"),
        sum(xi * xi).cast("decimal(28,0)").as("sxx"))
      .select(col(groupCol), col("n"), {
        // zero denominator (single point / zero x-variance) → NULL slope:
        // ANSI mode makes a bare division throw DIVIDE_BY_ZERO
        val nD = col("n").cast("decimal(10,0)")
        val den = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
        val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
        when(den =!= 0.0, num / den).as("slope")
      })
      .withColumn("slope", col("slope").cast("decimal(18,6)").cast("double"))
      .orderBy(groupCol)
  }

  /** Winsorized mean per group: clip values at the p_lo/p_hi percentiles
    * before averaging — the robust mean that tolerates fat tails without
    * discarding rows (trimming) or needing two passes over raw values twice
    * (the bounds aggregate is group-count-sized and broadcast back).
    * Cross-engine exactness: interpolated percentile bounds are quantized
    * to DECIMAL(18,4) BEFORE clipping (both engines clip against identical
    * bounds — a sub-ulp bound difference can never re-clip a value), the
    * clipped sum is decimal, and the mean is one double division. */
  def winsorizedMean(df: DataFrame, keyCol: String, valCol: String,
                     pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(keyCol).agg(
      percentile(col(valCol), lit(pLo)).cast("decimal(18,4)").as("lo"),
      percentile(col(valCol), lit(pHi)).cast("decimal(18,4)").as("hi"))
    val x = col(valCol).cast("decimal(18,4)")
    df.join(broadcast(bounds), keyCol)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(least(greatest(x, col("lo")), col("hi"))).cast("decimal(18,4)").as("s"))
      .select(col(keyCol), col("n_rows"),
        (col("s").cast("double") / col("n_rows"))
          .cast("decimal(18,6)").cast("double").as("wins_mean"))
      .orderBy(keyCol)
  }

  /** Cross-source score calibration: map each row's score to its
    * percent-rank WITHIN its group, so heterogeneous sources become
    * comparable before a global quality cut (a length cutoff that keeps 60%
    * of Wikipedia should not keep 5% of CommonCrawl). percent_rank =
    * (rank−1)/(n−1) — integer rank arithmetic and ONE double division,
    * bit-equal across engines. One window shuffle on the group; at 100 TB
    * shard giant groups by a secondary hash and merge ranks (documented,
    * not needed at test scale). */
  def calibrateByGroup(df: DataFrame, keyCol: String, idCol: String,
                       scoreCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(scoreCol), col(idCol))
    df.select(col(keyCol), col(idCol), col(scoreCol),
        percent_rank().over(w).as("calibrated"))
      .orderBy(keyCol, idCol)
  }

  /** Weekly growth accounting: per week, how many active users are NEW
    * (first-ever activity), RETAINED (also active the previous week), or
    * RESURRECTED (returning after a gap). The standard product-growth
    * decomposition — and the corpus-freshness decomposition when "user" is
    * a crawl domain. One user-week dedup shuffle; first-week and
    * previous-week both ride a single user-partitioned window; the final
    * count agg is week-cardinality-sized. All integers — exact. */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    val w = Window.partitionBy("u").orderBy("wk")
    uw.select(col("u"), col("wk"),
        min(col("wk")).over(w).as("first_wk"),
        lag(col("wk"), 1).over(w).as("prev_wk"))
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        when(col("wk") === col("first_wk"), "new")
          .when(col("prev_wk") === col("wk") - expr("INTERVAL 7 DAYS"), "retained")
          .otherwise("resurrected").as("status"))
      .groupBy("week", "status").agg(count(lit(1)).as("n_users"))
      .orderBy("week", "status")
  }

  /** Exponentially time-decayed engagement score per key:
    * Σ value·e^(−λ·age_days), ages measured from the dataset's max
    * timestamp (deterministic — no wall clock). The standard recency
    * weighting for user/item features. One shuffle on the key; the
    * reference time is a 1-row broadcast. Exactness: each e^x is one IEEE
    * libm call on a bit-equal input (integer seconds → one division, one
    * multiply), each term is value·eˣ cast to DECIMAL(28,9) before the
    * order-dependent sum; quantized (18,6) at the boundary. */
  def decayedScore(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, halfLifeDays: Double): DataFrame = {
    val lambda = math.log(2.0) / halfLifeDays
    val ref = events.agg(max(col(tsCol).cast("long")).as("__ref"))
    events.crossJoin(broadcast(ref))
      .select(col(keyCol),
        (col(valCol) *
          exp(lit(-lambda) * ((col("__ref") - col(tsCol).cast("long")).cast("double") / lit(86400.0))))
          .cast("decimal(28,9)").as("term"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"),
        sum(col("term")).cast("double").cast("decimal(18,6)").cast("double")
          .as("decayed_score"))
      .orderBy(keyCol)
  }

  /** Event-sequence pattern match (CEP-lite): serialize each user's
    * time-ordered event types into one delimited string and match a regex
    * against it — "signup then (anything) then purchase" without a
    * state-machine operator. sort_array on (ts, id, type) structs makes the
    * serialization deterministic under any partitioning (collect_list alone
    * is arrival-ordered); the regex runs codegen'd per user row. One
    * shuffle on the user; per-user state is the event-type string, which is
    * why the per-key sequence must be bounded (cap horizon/session first at
    * 100 TB — same contract as any collect_list). */
  def eventPattern(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String, pattern: String): DataFrame = {
    val seq = array_join(
      transform(
        sort_array(collect_list(struct(col(tsCol), col(idCol), col(typeCol).as("t")))),
        x => x.getField("t")),
      ">")
    events.groupBy(col(userCol))
      .agg(seq.as("event_seq"))
      .filter(col("event_seq").rlike(pattern))
      .orderBy(userCol)
  }

  /** CDC snapshot compaction: reduce a changelog to the LATEST row per key,
    * dropping keys whose final operation is a tombstone — the Delta/Hudi
    * "materialize current state" primitive that turns an append-only event
    * log into an upsert table. One shuffle on the key; the latest-row pick
    * is a WindowGroupLimit-shaped rank (per-partition heaps keep one row
    * per key BEFORE the exchange), so a 100 TB changelog compacts without
    * ever grouping full histories. Deterministic under equal timestamps via
    * the id tiebreak — the same total order a real log-sequence-number
    * provides. */
  /** OHLC time-bucket downsampling (candlestick bars / metric rollups to a
    * coarser grain): per (key, bucket) the first/max/min/last of `valCol`,
    * where first/last are made deterministic by the total (ts, id) order —
    * NOT arrival order, so the result is partitioning- and retry-invariant.
    * ONE hash aggregate using min_by/max_by over a struct key (single pass,
    * map-side combinable) — no per-bucket window sort, no shuffle of
    * anything but the aggregation itself. The struct comparison matches
    * row_number() OVER (ORDER BY ts, id) semantics exactly. */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valCol: String, grain: String = "hour"): DataFrame = {
    val key = struct(col(tsCol), col(idCol))
    events
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("bucket"))
      .agg(
        min_by(col(valCol), key).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), key).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(keyCol, "bucket")
  }

  /** Rolling exact median over the trailing `frame` rows per key (robust
    * smoothing for metric streams — the sliding complement of [[mad]]'s
    * global robustness). The frame is ROWS-bounded, so the per-row state is
    * O(frame) regardless of key cardinality or history length: collect the
    * frame into an array, sort it, take the interpolated middle ((a+b)/2 on
    * even counts — quantile_cont semantics). One window sort per key; no
    * whole-history collect_list, no per-key quadratic work. For frames big
    * enough that O(frame log frame) per row hurts, drop to the two-heap
    * streaming-median mapPartitions shape — at frame ≤ a few hundred the
    * array sort is faster than the bookkeeping. */
  def rollingMedian(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valCol: String, frame: Int = 7): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(frame - 1), Window.currentRow)
    val sorted = sort_array(collect_list(col(valCol)).over(w))
    val n = size(sorted)
    val half = (n / 2).cast("int") // exact: n ≤ frame, double div then trunc
    val mid = when(n % 2 === 1, element_at(sorted, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(sorted, half) + element_at(sorted, half + 1)) / 2.0)
    events.select(col(keyCol), col(idCol), col(valCol), mid.as("roll_median"))
      .orderBy(idCol)
  }

  /** Per-group mean imputation (feature-table repair before training):
    * null `valCol` cells are filled with their group's non-null mean,
    * falling back to the global mean for all-null groups. Means are exact
    * decimal sums with ONE double division (so every engine lands on the
    * same fill value), computed in a single aggregate pass and joined back
    * group-keyed; the global fallback is a 1-row broadcast, not a second
    * scan dependency. Emits an `imputed` flag so downstream can weight or
    * audit filled cells. */
  def imputeByGroup(df: DataFrame, keyCol: String, idCol: String,
                    valCol: String): DataFrame = {
    val x = col(valCol).cast("decimal(18,2)")
    val groupMeans = df.groupBy(keyCol).agg(
      (sum(x).cast("double") / count(col(valCol))).as("grp_mean"))
    val globalMean = df.agg(
      (sum(x).cast("double") / count(col(valCol))).as("glob_mean"))
    df.join(groupMeans, Seq(keyCol), "left")
      .crossJoin(broadcast(globalMean))
      .select(col(keyCol), col(idCol),
        coalesce(col(valCol), col("grp_mean"), col("glob_mean")).as(valCol),
        col(valCol).isNull.as("imputed"))
      .orderBy(idCol)
  }

  def cdcCompact(changelog: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, opCol: String, tombstone: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(idCol).desc)
    changelog
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col(opCol) =!= tombstone)
      .drop("__rk")
      .orderBy(keyCol)
  }

  /** Per-group Gini coefficient over positive values — the inequality /
    * concentration metric (revenue concentration per segment, token-budget
    * concentration per source): G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n on the
    * ascending-sorted values. One window sort per group assigns ranks; both
    * weighted and plain sums are exact decimals; the two divisions are a
    * fixed double chain quantized (18,6). Ties in value are rank-permutable
    * without changing Σ i·x (equal x), so the id tiebreak is only for
    * determinism of the intermediate, not the result. */
  def giniByGroup(df: DataFrame, keyCol: String, idCol: String,
                  valCol: String): DataFrame = {
    val x = col(valCol).cast("decimal(18,2)")
    val w = Window.partitionBy(keyCol).orderBy(col(valCol), col(idCol))
    df.filter(col(valCol) > 0)
      .select(col(keyCol), x.as("x"), row_number().over(w).cast("long").as("i"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(col("i") * col("x")).cast("decimal(18,2)").as("s1"),
        sum(col("x")).cast("decimal(18,2)").as("sx"))
      .select(col(keyCol), col("n"),
        ((lit(2.0) * col("s1").cast("double"))
          / (col("n").cast("double") * col("sx").cast("double"))
          - (col("n").cast("double") + lit(1.0)) / col("n").cast("double"))
          .cast("decimal(18,6)").cast("double").as("gini"))
      .orderBy(keyCol)
  }

  /** Snapshot diff — table reconciliation between two versions of the same
    * dataset: which keys were ADDED, REMOVED, or CHANGED. The audit before
    * promoting an incremental load, and the drift check between a backfill
    * and its incremental twin. ONE full-outer join on the key (both sides
    * shuffle-partition on it); change detection is per-column null-safe
    * equality (`<=>`) — no casting values to strings, whose engine-specific
    * rendering (doubles, timestamps) would poison a hash-based compare.
    * Unchanged keys — the overwhelming majority in practice — are filtered
    * out BEFORE the result materializes. */
  def diffSnapshots(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val cols = a.columns.filter(_ != keyCol).toSeq
    require(cols.toSet == b.columns.filterNot(_ == keyCol).toSet,
      "snapshots must share a schema")
    val aa = a.select(Seq(col(keyCol).as("__k"), lit(1).as("__ina")) ++
      cols.map(c => col(c).as(s"a_$c")): _*)
    val bb = b.select(Seq(col(keyCol).as("__k"), lit(1).as("__inb")) ++
      cols.map(c => col(c).as(s"b_$c")): _*)
    val sameRow = cols.map(c => col(s"a_$c") <=> col(s"b_$c")).reduce(_ && _)
    aa.join(bb, Seq("__k"), "full_outer")
      .withColumn("change_type",
        when(col("__ina").isNull, "added")
          .when(col("__inb").isNull, "removed")
          .when(!sameRow, "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("__k").as(keyCol), col("change_type"))
      .orderBy(keyCol)
  }

  /** Association rules over per-(user, day) baskets of event types:
    * support / confidence / lift for every ordered item pair. The item
    * domain is the event-type vocabulary, so the within-basket self-join is
    * bounded at |types|² pairs per basket — at web scale, restrict the
    * domain to the top-k items first (one WindowGroupLimit) and the bound
    * holds. Counts are exact integers; each metric is a fixed chain of
    * double ops quantized to DECIMAL(18,6) on both engines. */
  def associationRules(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, minPair: Long = 2): DataFrame = {
    val items = events.select(col(userCol), to_date(col(tsCol)).as("__day"),
      col(typeCol).as("item")).distinct()
    val nBaskets = items.select(col(userCol), col("__day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairCounts = items.as("a")
      .join(items.as("b"), Seq(userCol, "__day"))
      .filter(col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("antecedent"), col("b.item").as("consequent"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    def q6(c: Column): Column = c.cast("decimal(18,6)").cast("double")
    pairCounts
      .join(broadcast(itemCounts.withColumnRenamed("n_item", "n_ante")),
        col("antecedent") === col("item")).drop("item")
      .join(broadcast(itemCounts.withColumnRenamed("n_item", "n_cons")),
        col("consequent") === col("item")).drop("item")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        q6(col("n_pair").cast("double") / col("n_baskets").cast("double")).as("support"),
        q6(col("n_pair").cast("double") / col("n_ante").cast("double")).as("confidence"),
        q6(col("n_pair").cast("double") * col("n_baskets").cast("double")
          / (col("n_ante").cast("double") * col("n_cons").cast("double"))).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  /** EXACT global median with NO global sort and NO single-reducer value
    * collection — the scale path Spark's own `percentile` aggregate lacks:
    * that ordered-set aggregate buffers every value of the group in one
    * reducer's memory, which for a GLOBAL median of a 100 TB column is an
    * OOM by construction. Here each pass is one hash aggregate of 65536
    * bin COUNTS (map-side combined, constant-size shuffle); the bin
    * holding the target rank is refined recursively until few enough rows
    * remain to rank exactly with a window over that filtered sliver.
    * log_65536(range) ≈ 2-3 scans total for doubles.
    *
    * Even-row-count medians interpolate as lo + (hi - lo) * 0.5 — the same
    * expression shape DuckDB's quantile_cont computes, so the double is
    * oracle-exact. Null values are excluded (SQL aggregate semantics). */
  def exactGlobalMedian(df: DataFrame, valCol: String,
                        exactThreshold: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valCol).cast("double").as("v")).filter(col("v").isNotNull)
    val statsRow = vals.agg(count(lit(1)), min("v"), max("v")).head()
    val n = statsRow.getLong(0)
    if (n == 0L) return Seq.empty[(Long, Double)].toDF("n", "median")
    // target ranks (1-based): middle for odd n, the two middles for even
    val kLo = (n + 1) / 2
    val kHi = n / 2 + 1
    def kth(k: Long): Double = {
      var lo = statsRow.getDouble(1)
      var hi = statsRow.getDouble(2)
      var rankOffset = 0L // rows strictly below the current [lo, hi] bracket
      var subset = vals
      var remaining = n
      while (remaining > exactThreshold && hi > lo &&
             (hi - lo) / 65536.0 > 0.0) { // width-0 ⇒ sub-ulp bracket: go exact
        val width = (hi - lo) / 65536.0
        val binOf = least(lit(65535), floor((col("v") - lit(lo)) / lit(width)))
        val counts = subset.groupBy(binOf.as("b")).agg(count(lit(1)).as("c"))
          .orderBy("b").collect() // ≤ 65536 rows — constant-size action
        var cum = rankOffset
        var i = 0
        var found = false
        while (i < counts.length && !found) {
          val b = counts(i).getLong(0); val c = counts(i).getLong(1)
          if (cum + c >= k) {
            val bLo = lo + b * width
            val bHi = if (b == 65535L) hi else lo + (b + 1) * width
            subset = subset.filter(col("v") >= lit(bLo) && col("v") <= lit(bHi))
              .localCheckpoint(true) // pin: next pass re-filters a small set
            rankOffset = cum
            remaining = c
            lo = bLo; hi = bHi
            found = true
          } else { cum += c; i += 1 }
        }
        if (!found) return hi // numeric edge: rank beyond last bin ⇒ max
        if (lo == hi) return lo // bracket collapsed: every value equals lo
      }
      // exact rank within the refined sliver (≤ exactThreshold rows)
      import org.apache.spark.sql.expressions.Window
      subset.withColumn("rk", row_number().over(Window.orderBy("v")))
        .filter(col("rk") === (k - rankOffset))
        .select("v").as[Double].head()
    }
    val median =
      if (n % 2 == 1) kth(kLo)
      else { val a = kth(kLo); val b = kth(kHi); a + (b - a) * 0.5 }
    Seq((n, median)).toDF("n", "median")
  }

  /** Z-order (Morton) layout key over two numeric columns — the
    * multi-dimensional clustering that makes min/max data skipping work on
    * BOTH filter columns at once (a plain sort serves only its leading
    * column; files written in z order carry tight zone maps for x AND y).
    * On a real deployment the output feeds `repartitionByRange(z) .write`;
    * here we emit the key itself so layout quality is verifiable.
    *
    * Both columns are range-quantized to `bits`-bit cells against the
    * global min/max (one stats-row action), then bit-interleaved with an
    * unrolled integer sum — every step is exact integer/IEEE math an
    * oracle reproduces term-for-term. Quantization is pure map-side; the
    * only data movement is the final range sort, which is exactly the
    * shuffle the layout exists to pay. A null coordinate lands in the top
    * cell (LEAST skips nulls — identically in Spark and DuckDB). */
  def zorderKey(df: DataFrame, xCol: String, yCol: String,
                idCols: Seq[String], bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 20, "bits in [1,20]")
    val stats = df.agg(
      min(col(xCol).cast("long")).as("xmin"), max(col(xCol).cast("long")).as("xmax"),
      min(col(yCol).cast("long")).as("ymin"), max(col(yCol).cast("long")).as("ymax"))
      .head()
    if (stats.isNullAt(0) || stats.isNullAt(2)) // empty input / all-null axis
      return df.select(idCols.map(col) :+ lit(0L).as("z"): _*).limit(0)
    val (xmin, xmax) = (stats.getLong(0), stats.getLong(1))
    val (ymin, ymax) = (stats.getLong(2), stats.getLong(3))
    val cells = 1L << bits
    def quant(c: Column, lo: Long, hi: Long): Column =
      least(lit(cells - 1),
        floor((c.cast("long") - lit(lo)).cast("double") / lit((hi - lo + 1).toDouble)
          * lit(cells.toDouble)))
    def interleave(qx: Column, qy: Column): Column =
      (0 until bits).map { b =>
        (shiftright(qx, b) % 2) * lit(1L << (2 * b)) +
          (shiftright(qy, b) % 2) * lit(1L << (2 * b + 1))
      }.reduce(_ + _)
    df.select(idCols.map(col) :+ quant(col(xCol), xmin, xmax).as("__qx")
        :+ quant(col(yCol), ymin, ymax).as("__qy"): _*)
      .withColumn("z", interleave(col("__qx"), col("__qy")))
      .drop("__qx", "__qy")
      .orderBy(col("z") +: idCols.map(col): _*)
  }

  /** Spearman rank correlation per group — the monotone-association
    * companion of [[corrByGroup]] (Pearson answers "linear", Spearman
    * answers "monotone", which is what you want for skewed pipeline
    * metrics like doc length vs quality score).
    *
    * Pearson over average-ties ranks, kept EXACT end-to-end: the average
    * rank of a tie block is rank + (ties−1)/2, which is half-integral, so
    * both axes use the DOUBLED rank 2·rank + ties − 1 — an integer —
    * (scaling both axes by 2 leaves the correlation unchanged). All five
    * sums are exact decimal integers; each is cast to double SEPARATELY
    * and the textbook formula runs in fixed-order double arithmetic LAST,
    * so any engine at any partitioning produces the same bits.
    *
    * NEVER ranks raw rows (same design as [[Evaluation.groupedAuc]]): one
    * hash aggregate collapses to distinct (group, x, y) cells, each axis
    * ranks its per-distinct-VALUE margin (the window sees |distinct|, not
    * |rows|: 2·rank+ties−1 = 2·cum_before + n_value + 1), and the doubled
    * ranks hash-join back onto the cells, count-weighted. The margin
    * window's parallelism is #groups (the q141 grouped-AUC note applies);
    * for a near-continuous axis the margin is row-sized — quantize such an
    * axis first (Spearman is rank-based: any strictly monotone binning of
    * ties-free data is rho-preserving only if it stays injective, so
    * prefer DECIMAL rounding that keeps business precision). */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // 3 consumers — uncheckpointed, the row-sized
                         // scan+aggregate re-runs per margin (measured 1.8×)
    def margin(valCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(groupCol).orderBy(valCol)
      cells.groupBy(col(groupCol), col(valCol)).agg(sum("cnt").as("nv"))
        .withColumn(out,
          (lit(2) * (sum("nv").over(w) - col("nv")) + col("nv") + 1)
            .cast("long"))
        .drop("nv")
    }
    // cast to decimal BEFORE the products: a long·long rank product wraps
    // past 2^63 once a group exceeds ~1.5e9 rows
    val c19 = col("cnt").cast("decimal(19,0)")
    val rx = col("rx2").cast("decimal(19,0)")
    val ry = col("ry2").cast("decimal(19,0)")
    val agg = cells
      .join(margin("x", "rx2"), Seq(groupCol, "x"))
      .join(margin("y", "ry2"), Seq(groupCol, "y"))
      .groupBy(groupCol).agg(
        sum("cnt").as("n"),
        sum(c19 * rx).as("sx"),
        sum(c19 * ry).as("sy"),
        sum(c19 * rx * ry).as("sxy"),
        sum(c19 * rx * rx).as("sxx"),
        sum(c19 * ry * ry).as("syy"))
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    agg.select(col(groupCol), col("n").cast("long").as("n_rows"),
        when(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0d,
          ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("rho"))
      .orderBy(groupCol)
  }

  /** Autocorrelation function of an evenly spaced series at lags 1..k —
    * "does yesterday predict today", the seasonality/trend probe behind
    * ingest-volume monitoring. Input is ONE ROW PER TIME STEP (aggregate
    * first — e.g. events → daily counts; gap-fill in the style of
    * [[monthlySeriesFilled]] if the series has holes; lag pairs at missing
    * steps silently drop).
    *
    * r_h = Σ(x_t−μ)(x_{t+h}−μ) / Σ(x_t−μ)². Never a one-partition window:
    * each row explodes to its k lag probes (t+h, h) and pairs rejoin on an
    * EQUI join on t — broadcast-able, shuffle-free on the corpus side when
    * the series is dim-sized, and a plain hash join at worst. μ is one
    * double division of exact integer sums; every centered product is
    * quantized DECIMAL(28,9) before the order-independent decimal sum. */
  def acf(series: DataFrame, tCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, "maxLag in [1,64]")
    val base = series.select(col(tCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x")).localCheckpoint() // 3 consumers
    // decimal sums: Σx² in long wraps silently past 2^63 (x ~ 3e9 is enough)
    val x19 = col("x").cast("decimal(19,0)")
    val stats = base.agg(count(lit(1)).as("n"), sum(x19).as("sx"),
        sum(x19 * x19).as("sxx"))
      .select(col("n"),
        (col("sx").cast("double") / col("n").cast("double")).as("mu"),
        // Σ(x−μ)² = Σx² − n·μ² needs μ first; keep the whole chain double
        (col("sxx").cast("double") -
          col("n").cast("double") * (col("sx").cast("double") / col("n").cast("double"))
            * (col("sx").cast("double") / col("n").cast("double"))).as("den"))
    val probes = base.select(col("t"), col("x").as("x0"),
        explode(array((1 to maxLag).map(i => lit(i.toLong)): _*)).as("lag"))
      .withColumn("t2", col("t") + col("lag"))
    val pairs = probes.join(base.select(col("t").as("t2"), col("x").as("xh")), "t2")
    pairs.crossJoin(broadcast(stats))
      .select(col("lag"), col("den"),
        ((col("x0").cast("double") - col("mu")) * (col("xh").cast("double") - col("mu")))
          .cast("decimal(28,9)").as("term"))
      .groupBy("lag", "den")
      .agg(count(lit(1)).as("n_pairs"), sum("term").cast("double").as("num"))
      .select(col("lag"), col("n_pairs"),
        when(col("den") > 0d, (col("num") / col("den")).cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** Exact weighted percentiles per group — "the token-weighted median doc
    * length", where every row counts `weightCol` times ([[percentiles]]
    * weights every row 1; reweighting by tokens/bytes is how corpus
    * questions are actually posed). Returns, per group and probe p, the
    * lower weighted percentile: the smallest value whose cumulative weight
    * reaches p·W.
    *
    * Rows collapse to per-distinct-value weight sums first (the only
    * row-sized shuffle); the cumulative weight rides a window over that
    * shrunken margin (parallelism #groups — grouped-AUC note applies).
    * The threshold test is PURE INTEGER: cumw·1000 ≥ pm·W with per-mille
    * probes — no float quantile boundary to ulp-flip. Weights must be
    * non-negative integers (token counts, byte sizes); zero-weight values
    * never win a probe (their cum equals the previous row's). */
  def weightedPercentilesByGroup(df: DataFrame, groupCol: String,
                                 valueCol: String, weightCol: String,
                                 probesPm: Seq[Int]): DataFrame = {
    require(probesPm.nonEmpty && probesPm.forall(p => p >= 1 && p <= 1000),
      "per-mille probes in [1,1000]")
    val margin = df
      .select(col(groupCol), col(valueCol).as("v"),
        col(weightCol).cast("long").as("wt"))
      .groupBy(col(groupCol), col("v")).agg(sum("wt").as("nv"))
    val w = Window.partitionBy(groupCol).orderBy("v")
    val tot = Window.partitionBy(groupCol)
    val cum = margin
      .withColumn("cumw", sum("nv").over(w))
      .withColumn("tw", sum("nv").over(tot))
      .withColumn("pm", explode(array(probesPm.distinct.sorted.map(p => lit(p)): _*)))
      // first margin row whose cumulative weight reaches pm·W/1000:
      // integer cross-multiplication, exact at any scale
      .filter(col("cumw") * 1000 >= col("pm") * col("tw"))
    cum.groupBy(col(groupCol), col("pm"))
      .agg(min("v").as("value"), max("tw").as("total_weight"))
      .orderBy(col(groupCol), col("pm"))
  }

  /** Automation / bot signature per actor: humans arrive with irregular
    * gaps, schedulers arrive metronomically. Per actor with ≥`minEvents`
    * events: gap count, mean gap, the coefficient of variation of gaps
    * (CV = σ/μ — near 0 ⇒ metronome), and the modal-gap share (the
    * fraction of gaps equal to the single most common gap — catches bots
    * that jitter between two intervals, which CV alone can miss). Flag
    * when CV < `cvThresh` or modal share > `modalThresh`.
    *
    * One shuffle on the actor for the lag window (timeline order is the
    * actor's own — parallelism #actors, which is the natural sharding for
    * behavioral features); gap sums are exact decimal integers with the
    * double formula last: CV = √(n·Σg² − (Σg)²)/Σg — one chain, engine
    * bit-equal. The modal count re-aggregates the (actor, gap) pairs —
    * margin-sized, not row-sized. */
  def automationSignature(events: DataFrame, actorCol: String, tsCol: String,
                          idCol: String, minEvents: Int = 10,
                          cvThresh: Double = 0.1,
                          modalThresh: Double = 0.5): DataFrame = {
    val w = Window.partitionBy(actorCol).orderBy(col(tsCol), col(idCol))
    val gaps = events
      .select(col(actorCol), col(tsCol), col(idCol))
      .withColumn("gap",
        unix_timestamp(col(tsCol)) - lag(unix_timestamp(col(tsCol)), 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col(actorCol), col("gap"))
      .localCheckpoint() // stats + modal both read it
    val g19 = col("gap").cast("decimal(19,0)")
    val stats = gaps.groupBy(actorCol).agg(
      count(lit(1)).as("n_gaps"),
      sum(g19).as("sg"),
      sum(g19 * g19).as("sgg"))
    val modal = gaps.groupBy(col(actorCol), col("gap"))
      .agg(count(lit(1)).as("ng"))
      .groupBy(actorCol).agg(max("ng").as("modal_n"))
    val cv = when(col("sg").cast("double") > 0d,
      sqrt(col("n_gaps").cast("double") * col("sgg").cast("double")
        - col("sg").cast("double") * col("sg").cast("double"))
        / col("sg").cast("double")).otherwise(lit(0d))
    val modalShare = col("modal_n").cast("double") / col("n_gaps").cast("double")
    stats.join(modal, Seq(actorCol))
      .filter(col("n_gaps") >= minEvents - 1) // n events ⇒ n−1 gaps
      .select(col(actorCol), col("n_gaps"),
        (col("sg").cast("double") / col("n_gaps").cast("double"))
          .cast("decimal(18,6)").cast("double").as("mean_gap_sec"),
        cv.cast("decimal(18,9)").cast("double").as("cv"),
        modalShare.cast("decimal(18,9)").cast("double").as("modal_share"),
        (cv < cvThresh || modalShare > modalThresh).as("flagged"))
      .orderBy(actorCol)
  }

  /** Cross-correlation of two evenly spaced series at lags 0..k — "do
    * purchases follow clicks, and by how many days": r_h correlates
    * x_t against y_{t+h}, so a peak at h=2 reads "y lags x by 2 steps".
    * [[acf]]'s two-series sibling with the same scale shape: aggregate
    * first, EQUI-join lag pairs via an exploded lag spine (never a
    * 1-partition window), per-series μ/σ from exact decimal sums, each
    * centered product quantized DECIMAL(28,9) before the sum.
    * r_h = Σ(x_t−μx)(y_{t+h}−μy) / (n_pairs·σx·σy) — the denominator uses
    * the FULL-series population σs (standard CCF normalization). */
  def ccf(xSeries: DataFrame, ySeries: DataFrame, tCol: String,
          valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 64, "maxLag in [0,64]")
    def prep(df: DataFrame, vOut: String): DataFrame =
      df.select(col(tCol).cast("long").as("t"), col(valueCol).cast("long").as(vOut))
        .localCheckpoint() // stats + pair join
    def stats(df: DataFrame, vIn: String, muOut: String, sdOut: String): DataFrame = {
      val v19 = col(vIn).cast("decimal(19,0)")
      df.agg(count(lit(1)).as("n"), sum(v19).as("s"), sum(v19 * v19).as("ss"))
        .select((col("s").cast("double") / col("n").cast("double")).as(muOut),
          sqrt((col("n").cast("double") * col("ss").cast("double")
              - col("s").cast("double") * col("s").cast("double"))
            / (col("n").cast("double") * col("n").cast("double"))).as(sdOut))
    }
    val xs = prep(xSeries, "x"); val ys = prep(ySeries, "y")
    val st = stats(xs, "x", "mux", "sdx").crossJoin(broadcast(stats(ys, "y", "muy", "sdy")))
    val probes = xs.select(col("t"), col("x"),
        explode(array((0 to maxLag).map(i => lit(i.toLong)): _*)).as("lag"))
      .withColumn("t2", col("t") + col("lag"))
    probes.join(ys.select(col("t").as("t2"), col("y")), "t2")
      .crossJoin(broadcast(st))
      .select(col("lag"), col("sdx"), col("sdy"),
        ((col("x").cast("double") - col("mux")) * (col("y").cast("double") - col("muy")))
          .cast("decimal(28,9)").as("term"))
      .groupBy("lag", "sdx", "sdy")
      .agg(count(lit(1)).as("n_pairs"), sum("term").cast("double").as("num"))
      .select(col("lag"), col("n_pairs"),
        when(col("sdx") > 0d && col("sdy") > 0d,
          (col("num") / (col("n_pairs").cast("double") * col("sdx") * col("sdy")))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("ccf"))
      .orderBy("lag")
  }

  /** Theil–Sen robust trend over an evenly spaced (aggregated) series:
    * slope = median of all pairwise slopes, intercept = median of
    * (x − slope·t) — a single outlier day (an incident spike) barely moves
    * it, where OLS ([[regressionByGroup]]) chases the spike. The
    * monitoring-grade "is ingest volume actually growing" readout.
    *
    * The pair join is series², bounded by the AGGREGATED series length
    * (days, not rows — 10 years ≈ 3.7k points ⇒ ≤7M pairs); both medians
    * go through [[exactGlobalMedian]]'s distributed refinement, whose
    * even-n interpolation matches quantile_cont(0.5) bit-for-bit. Slope is
    * quantized to 9 dp BEFORE the residual pass so the intercept chain
    * starts from an engine-stable scalar. */
  def theilSenTrend(series: DataFrame, tCol: String, valueCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val base = series
      .select(col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("x"))
      .localCheckpoint() // pair join sides + residual pass
    val nPoints = base.count()
    if (nPoints < 2)
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("n_points", "n_pairs", "slope", "intercept")
    val slopes = base.select(col("t").as("ta"), col("x").as("xa"))
      .crossJoin(base.select(col("t").as("tb"), col("x").as("xb")))
      .filter(col("tb") > col("ta"))
      .select(((col("xb") - col("xa")) / (col("tb") - col("ta")).cast("double"))
        .as("slope"))
    val sRow = exactGlobalMedian(slopes, "slope").head()
    val (nPairs, slopeRaw) = (sRow.getLong(0), sRow.getDouble(1))
    // quantize through Spark's OWN decimal cast (not JVM BigDecimal(double),
    // whose exact-binary-expansion rounding can differ at the 9-dp boundary)
    val slope = spark.range(1)
      .select(lit(slopeRaw).cast("decimal(18,9)").cast("double")).head().getDouble(0)
    val intercept = exactGlobalMedian(
      base.select((col("x") - lit(slope) * col("t").cast("double")).as("r")), "r")
      .head().getDouble(1)
    Seq((nPoints, nPairs)).toDF("n_points", "n_pairs")
      .select(col("n_points"), col("n_pairs"), lit(slope).as("slope"),
        lit(intercept).cast("decimal(18,9)").cast("double").as("intercept"))
  }

  /** Benford first-significant-digit audit — the classic fabricated-data /
    * unit-mixup screen for any naturally multiplicative positive measure
    * (amounts, populations, file sizes). Per digit 1–9: observed count and
    * share, the Benford-law expected share, and the χ² contribution; the
    * full-audit χ² statistic is repeated on every row so the output stays
    * flat (8 df ⇒ reject uniform-conformance at χ² > 15.5 for α=0.05).
    *
    * The digit comes from the value's canonical DECIMAL STRING (first
    * char in [1-9]) — never floor(log10): both engines format decimals
    * identically, while a log10-of-double digit boundary can disagree by
    * one ulp exactly at powers of ten. One hash aggregate to 9 rows;
    * expected shares are log10 literals quantized to nano-units the same
    * way on both engines, so every downstream double chain is bit-equal. */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val digit = regexp_extract(valueCol.cast("decimal(18,2)").cast("string"),
      "[1-9]", 0)
    val obs = df.select(digit.as("digit")).filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    // quantized expected shares: round(log10(1+1/d)·1e9)/1e9, precomputed so
    // the JVM's and the oracle engine's libm never meet the comparison
    val pExp = (1 to 9).map { d =>
      (d.toString, math.round(math.log10(1.0 + 1.0 / d) * 1e9) / 1e9)
    }
    val expDf = df.sparkSession.createDataFrame(pExp).toDF("digit", "p_exp")
    val tot = obs.agg(sum("n_obs").as("__n"))
    val chi = ((col("n_obs").cast("double") - col("p_exp") * col("__n").cast("double"))
      * (col("n_obs").cast("double") - col("p_exp") * col("__n").cast("double"))
      / (col("p_exp") * col("__n").cast("double"))).cast("decimal(28,9)")
    // obs (≤9 rows) is the build side: the left of a LEFT OUTER can't be
    // broadcast, the preserved stream must stay streamed
    val perDigit = expDf.join(broadcast(obs), Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("__n").cast("double"))
          .cast("decimal(18,9)").cast("double").as("p_obs"),
        col("p_exp"), chi.as("chi_term"))
    val chiTot = perDigit.agg(sum("chi_term").cast("double").as("chi2"))
    perDigit.crossJoin(broadcast(chiTot))
      .select(col("digit"), col("n_obs"), col("p_obs"), col("p_exp"),
        col("chi_term").cast("double").as("chi_term"), col("chi2"))
      .orderBy("digit")
  }

  /** Zone-map manifest: per-bucket row count and min/max of the stat
    * columns — the data-skipping index a lake layout (partition dirs,
    * [[zorderKey]] ranges, Delta/Iceberg file stats) exists to serve,
    * materialized as a queryable table. Pair with [[pruneByZoneMap]] to
    * actually skip. ONE hash aggregate; the shuffle carries only
    * per-bucket partials. Buckets must CLUSTER the stat columns for the
    * zones to be tight (that is the layout's job, not this op's). */
  def zoneMapManifest(df: DataFrame, bucket: Column,
                      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stat column")
    val stats = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"), stats: _*)
      .orderBy("bucket")
  }

  /** Zone-map pruning: scan only the buckets whose [min,max] envelope
    * intersects [lo,hi], then apply the exact predicate to settle false
    * positives — semantically identical to the full filter, but when
    * `bucketOf` matches the storage layout (partition column, z-range)
    * the skipped buckets never leave the manifest. The manifest is
    * contract-small (one row per bucket): the surviving bucket list
    * collects to an IN filter the scan can prune on. */
  def pruneByZoneMap(df: DataFrame, manifest: DataFrame, bucketOf: Column,
                     statCol: String, lo: Any, hi: Any): DataFrame = {
    val live = manifest
      .where(col(s"min_$statCol") <= lit(hi) && col(s"max_$statCol") >= lit(lo))
      .select("bucket").collect().map(_.get(0))
    df.where(bucketOf.isin(live.toIndexedSeq: _*) &&
      col(statCol) >= lit(lo) && col(statCol) <= lit(hi))
  }

  /** Event de-bounce (burst-leader election): keep only the FIRST event of
    * each burst per (actor, type), where a burst is a run of events each
    * within `cooldownSeconds` of its predecessor — duplicate-click /
    * retry-storm suppression with [[sessionize]]'s gap semantics (the gap
    * measures to the previous EVENT, not the previous kept one, so the
    * predicate is a single windowed lag — no iterative state). One
    * shuffle on (actor, type); everything else is map-side. */
  def debounce(events: DataFrame, actorCol: String, typeCol: String,
               tsCol: String, idCol: String, cooldownSeconds: Long): DataFrame = {
    val es = col(tsCol).cast("long")
    val w = Window.partitionBy(col(actorCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__es", es)
      .withColumn("__prev", lag(col("__es"), 1).over(w))
      .where(col("__prev").isNull || col("__es") - col("__prev") > cooldownSeconds)
      .drop("__prev")
  }

  /** Time-weighted average per actor (TWAP shape): Σ vᵢ·(tᵢ₊₁−tᵢ) over the
    * actor's observed span — the exposure-correct mean for irregularly
    * sampled state (price, queue depth, feature value), where the plain
    * AVG over-weights chatty periods. The last observation carries no
    * duration (its value had no observed holding time); single-event
    * actors have no span → null.
    *
    * One (actor) shuffle for the lead window; each v·Δt term is rounded
    * to integer MICRO-units (round(x·1e6): one IEEE multiply + round,
    * identical in any engine — the q132/cusum recipe; a DECIMAL(_,9)
    * quantization would NOT work here: terms reach ~1e8, so scale 9
    * demands more significant digits than a double carries and the
    * engines extend the phantom digits differently), summed exactly as
    * DECIMAL(28,0), finished by a fixed double chain. */
  def timeWeightedAvg(events: DataFrame, actorCol: String, tsCol: String,
                      valueCol: String, idCol: String): DataFrame = {
    val es = col(tsCol).cast("long")
    events
      .select(col(actorCol).as("actor"), col(valueCol).cast("double").as("v"),
        es.as("es"), col(idCol).as("__id"), col(tsCol).as("__ts"))
      .withColumn("__nxt", lead(col("es"), 1)
        .over(Window.partitionBy("actor").orderBy(col("__ts"), col("__id"))))
      .groupBy("actor")
      .agg(count(lit(1)).as("n_events"),
        (max("es") - min("es")).as("span_seconds"),
        sum(round((col("v") * (col("__nxt") - col("es")).cast("double"))
            * lit(1e6d)).cast("decimal(28,0)")).cast("double").as("wsum_u"))
      .select(col("actor"), col("n_events"), col("span_seconds"),
        when(col("span_seconds") > 0,
          col("wsum_u") / lit(1e6d) / col("span_seconds").cast("double"))
          .as("twap"))
      .orderBy("actor")
  }

  /** Exponentially-weighted moving average over an evenly spaced series
    * (pandas `ewm(adjust=True)` semantics, truncated at `window`
    * observations): the standard smoothing baseline for rate monitoring
    * and the "expected level" input to anomaly rules — recency-weighted
    * where [[rollingMedian]] is robustness-weighted.
    *
    * AGGREGATE FIRST (one row per step — same series contract as
    * [[cusum]]/[[Analytics.acf]]); the window then runs over that
    * contract-small table. The decay weights (1−α)^j are computed ONCE on
    * the driver and embedded as literals — the oracle embeds the
    * identical doubles, so no cross-engine pow() drift — and each step is
    * a fixed-order fold over ≤ `window` terms. */
  def ewmaSeries(series: DataFrame, tCol: String, valueCol: String,
                 alpha: Double = 0.1, window: Int = 30): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(window >= 1 && window <= 64, "window in [1,64]")
    val weights = Array.iterate(1.0, window)(_ * (1.0 - alpha))
    val warr = array(weights.map(lit(_)): _*)
    val w = Window.orderBy(tCol).rowsBetween(-(window - 1), 0)
    val rev = reverse(collect_list(col(valueCol).cast("double")).over(w))
    series
      .withColumn("__rev", rev)
      .select(col(tCol), col(valueCol),
        (aggregate(transform(col("__rev"), (x, i) => x * element_at(warr, i + 1)),
          lit(0.0), (acc, x) => acc + x) /
         aggregate(transform(col("__rev"), (_, i) => element_at(warr, i + 1)),
           lit(0.0), (acc, x) => acc + x)).as("ewma"))
      .orderBy(tCol)
  }

  /** HLL-sketch estimate of join-key overlap: |keys(A) ∩ keys(B)| by
    * inclusion–exclusion over mergeable sketches — the "how big is this
    * join, roughly" question answered in two sketch scans BEFORE paying
    * for the join itself (at 100 TB the estimate is minutes; the join is
    * hours if the answer is wrong). ☆ approximate by nature (HLL standard
    * error ≈ 1.6% at the default lgK); the spec pins it within 5% of
    * exact on the test tables. */
  def joinKeyOverlapEstimate(a: DataFrame, aKey: String,
                             b: DataFrame, bKey: String): DataFrame = {
    val tagged = a.select(lit("a").as("side"), col(aKey).cast("long").as("k"))
      .unionAll(b.select(lit("b").as("side"), col(bKey).cast("long").as("k")))
    val sk = tagged.groupBy("side").agg(hll_sketch_agg(col("k")).as("s"))
      .select(col("side"), hll_sketch_estimate(col("s")).as("est"), col("s"))
    sk.agg(
        max(when(col("side") === "a", col("est"))).as("est_a"),
        max(when(col("side") === "b", col("est"))).as("est_b"),
        hll_sketch_estimate(hll_union_agg(col("s"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        // inclusion–exclusion on noisy estimates can dip below 0 or top
        // the smaller side — clamp to the feasible range
        greatest(lit(0L), least(col("est_a"), col("est_b"),
          col("est_a") + col("est_b") - col("est_union")))
          .as("est_intersection"))
  }

  /** Exact Pearson correlation MATRIX over k pre-cast decimal columns in
    * ONE aggregate pass (k·(k+3)/2 power sums: every Σx, Σx², and pairwise
    * Σxy ride the same scan — profiling k columns costs one shuffle, not
    * k² of them). Each r is the q77 fixed double chain over exact decimal
    * sums; emits the upper triangle (col_a < col_b in declaration order). */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val names = cols.map(_._1)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.flatMap { case (nm, c) =>
        Seq(sum(c).as(s"s_$nm"), sum(c * c).as(s"ss_$nm")) } ++
      names.indices.flatMap(i => (i + 1 until names.size).map { j =>
        sum(cols(i)._2 * cols(j)._2).as(s"sp_${names(i)}__${names(j)}")
      })
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n").toDouble
    def d(f: String) = row.getAs[java.math.BigDecimal](f).doubleValue
    val spark = df.sparkSession
    import spark.implicits._
    names.indices.flatMap(i => (i + 1 until names.size).map { j =>
      val (a, b) = (names(i), names(j))
      val den = math.sqrt(n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")) *
        math.sqrt(n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b"))
      // quantize to 4 dp (q77's recipe): the huge-decimal→double conversion
      // paths differ across engines at ~1e-12 relative; 1e-4 absorbs it
      val r = if (den == 0d) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(BigDecimal(
          (n * d(s"sp_${a}__${b}") - d(s"s_$a") * d(s"s_$b")) / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (a, b, r)
    }).toDF("col_a", "col_b", "corr").orderBy("col_a", "col_b")
  }

  /** Per-source freshness report — the "is anything stale" ops readout:
    * row count, latest timestamp, lag behind the freshest source, and
    * trailing 1-day/7-day volumes (relative to the global max — the
    * as-of point a monitoring run cares about). One 1-row action for the
    * global max, then ONE conditional-count aggregate per source. */
  def freshnessReport(df: DataFrame, sourceCol: String,
                      tsCol: String): DataFrame = {
    val es = col(tsCol).cast("long")
    val gmax = df.agg(max(es)).head().getLong(0)
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_rows"), max(es).as("max_epoch"),
        count(when(es >= gmax - 86400L, lit(1))).as("n_last_day"),
        count(when(es >= gmax - 604800L, lit(1))).as("n_last_week"))
      .select(col("source"), col("n_rows"), col("max_epoch"),
        (lit(gmax) - col("max_epoch")).as("lag_seconds"),
        col("n_last_day"), col("n_last_week"))
      .orderBy("source")
  }

  /** Seasonal-naive forecast baseline eval: score "tomorrow = same weekday
    * last week" (lag 7) against plain naive "tomorrow = today" (lag 1) on
    * a daily series — MAE + MAPE per model, the sanity floor every real
    * forecast must beat before it ships. Aggregate-first series contract
    * ([[cusum]]'s); counts are integers so |error| sums are EXACT; each
    * MAPE term is one double division quantized DECIMAL(18,9) pre-sum. */
  def seasonalNaiveEval(series: DataFrame, tCol: String,
                        valueCol: String): DataFrame = {
    val w = Window.orderBy(tCol)
    val base = series.select(col(tCol), col(valueCol).cast("long").as("v"))
      .withColumn("lag1", lag(col("v"), 1).over(w))
      .withColumn("lag7", lag(col("v"), 7).over(w))
    def score(model: String, pred: Column): DataFrame = base
      .where(pred.isNotNull && col("v") > 0)
      .select(abs(col("v") - pred).as("ae"),
        (abs(col("v") - pred).cast("double") / col("v").cast("double"))
          .cast("decimal(18,9)").as("ape"))
      .agg(count(lit(1)).as("n_evaluated"),
        (sum("ae").cast("double") / count(lit(1)).cast("double")).as("mae"),
        (sum("ape").cast("double") / count(lit(1)).cast("double")).as("mape"))
      .select(lit(model).as("model"), col("n_evaluated"), col("mae"), col("mape"))
    score("naive_lag1", col("lag1"))
      .unionAll(score("seasonal_lag7", col("lag7")))
      .orderBy("model")
  }

  /** Chapman capture–recapture population estimate from two overlapping
    * key samples: N̂ = (nₐ+1)(n_b+1)/(m+1) − 1 (and the classic
    * Lincoln–Petersen nₐ·n_b/m) — "how many distinct items exist in
    * total" from two independent partial crawls/snapshots, the ecology
    * estimator that transfers directly to corpus-size estimation. Three
    * distinct-count aggregates (two sides + the key-join overlap); all
    * integer until one double chain each. */
  def captureRecapture(a: DataFrame, aKey: String,
                       b: DataFrame, bKey: String): DataFrame = {
    val ka = a.select(col(aKey).as("k")).distinct()
    val kb = b.select(col(bKey).as("k")).distinct()
    val na = ka.count(); val nb = kb.count()
    val m = ka.join(kb, "k").count()
    val spark = a.sparkSession
    import spark.implicits._
    Seq((na, nb, m,
      (na + 1).toDouble * (nb + 1).toDouble / (m + 1).toDouble - 1.0,
      if (m == 0) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(na.toDouble * nb.toDouble / m.toDouble)))
      .toDF("n_a", "n_b", "n_overlap", "chapman_est", "lincoln_petersen_est")
  }

  /** Schema-declared JSON flattening with validity accounting: parse the
    * JSON column against a caller schema, surface each field as a typed
    * column, and FLAG (never drop) rows whose payload is malformed or
    * missing — the q51 single-field extraction generalized to the "land
    * semi-structured props as real columns, quarantine the garbage"
    * ingest step. Pure map-side codegen'd `from_json`; malformed payloads
    * land in the corrupt-record column (PERMISSIVE mode parses them to a
    * struct of nulls, NOT a null struct — the flag must come from the
    * corrupt column, not struct nullness), never a task failure. */
  def flattenJson(df: DataFrame, jsonCol: String,
                  schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(jsonCol), schema,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    df.withColumn("__p", parsed)
      .withColumn("is_valid",
        col("__p").isNotNull && col("__p._corrupt_record").isNull)
      .select(df.columns.map(col) ++ Seq(col("__p.*"), col("is_valid")): _*)
      .drop("__p", "_corrupt_record")
  }

  /** Top-k navigation paths: each actor's first `firstN` event types in
    * time order, joined into one path string, counted across actors —
    * "how do users actually move through the product", the path-analysis
    * readout behind funnels ([[funnel]] checks ONE hypothesized path;
    * this DISCOVERS the paths worth hypothesizing).
    *
    * One (actor) shuffle: row_number prunes to the first N events
    * (WindowGroupLimit pushes the limit below the sort), the path
    * assembles from a sort_array of (rank, type) structs — deterministic
    * regardless of aggregation order — and the path count is a second,
    * path-keyed hash aggregate. Top-k is a global TakeOrdered, never a
    * full sort. */
  def topPaths(events: DataFrame, actorCol: String, tsCol: String,
               idCol: String, typeCol: String, firstN: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col(actorCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= firstN)
      .groupBy(col(actorCol))
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
          s => s.getField("t"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_actors"))
      .orderBy(col("n_actors").desc, col("path"))
      .limit(k)
  }

  /** 2-D Pareto frontier (skyline): rows no other row dominates, where p
    * dominates q iff p.x ≥ q.x ∧ p.y ≥ q.y with at least one strict —
    * "best tradeoffs" selection (quality×length doc picks, price×size
    * catalog frontiers) without scoring-function guesswork. Both
    * dimensions MAXIMIZED; equal-point duplicates all survive (neither
    * dominates).
    *
    * Never the O(n²) self-join dominance test: collapse to max(y) per
    * distinct x (hash aggregate — the only row-sized shuffle), take the
    * strictly-preceding prefix max over x DESC via
    * [[Evaluation.globalCumMin]]'s two-pass range-partitioned scan on
    * negated values (exclusive form) — a frontier x is exactly one whose
    * max-y beats every max-y at larger x — then broadcast the frontier
    * (anti-correlated dims keep it tiny; O(log n) expected for
    * independent dims) back over one map-side pass to recover qualifying
    * rows. `xCol`/`yCol` must cast exactly to long (pre-scale decimals). */
  def paretoFrontier(df: DataFrame, idCol: String, xCol: String,
                     yCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("id"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val perX = pts.groupBy("x").agg(max("y").as("my"))
      .select(col("x"), col("my"), (-col("x")).as("negx"), (-col("my")).as("negy"))
    val frontierX = Evaluation
      .globalCumMin(perX, Seq("negx"), Seq("negy"), inclusive = false)
      .filter(col("negy") < col("cummin_negy")) // strictly beats all larger x
      .select(col("x"), col("my"))
    pts.join(broadcast(frontierX), "x")
      .where(col("y") === col("my"))
      .select(col("id"), col("x"), col("y"))
      .orderBy(col("x").desc, col("id"))
  }

  /** Poisson(1) CDF thresholds for the bootstrap weight ladder (clamped at
    * 9; P(W>9) ≈ 1.1e-7). Literal doubles so Spark and any SQL oracle
    * evaluate the identical CASE ladder. */
  private val poissonCdf: Seq[(Double, Int)] = Seq(
    0.36787944117144233 -> 0, 0.7357588823428847 -> 1, 0.9196986029286058 -> 2,
    0.9810118431238463 -> 3, 0.9963401531726563 -> 4, 0.9994058151824183 -> 5,
    0.999916758850712 -> 6, 0.9999897508033253 -> 7, 0.999998874797402 -> 8)

  /** Poisson-bootstrap confidence interval for mean(valueCol) — the
    * distributed bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): a true resample would need n
    * draws WITH replacement per replicate (a global shuffle each), but the
    * multinomial weight vector converges to iid Poisson(1) per row, so one
    * pass computes all B replicates with per-row deterministic weights.
    *
    * Exactness/portability: the weight is a CASE ladder over a md5-derived
    * uniform (same literal thresholds in any engine); per-replicate sums
    * are exact integers (micro-unit value quantization × integer weight),
    * divided once at the end — replicate means are bit-equal at any
    * parallelism. CI bounds are order statistics of the B means (drop one
    * per tail → central 95% for B=40).
    *
    * Scale: B-way row explode feeds ONE hash aggregate with map-side
    * partials — shuffle volume is partitions × B rows, not n × B; the
    * final order-statistics step touches B rows. */
  def poissonBootstrapCI(df: DataFrame, idCol: String, valueCol: String,
                         b: Int = 40, seed: String = "bs1"): DataFrame = {
    require(b >= 4, "need at least 4 replicates for the drop-one-per-tail CI")
    // one md5 yields EIGHT 16-bit uniforms (4 hex chars each): the hash is
    // the dominant per-row cost, so replicates come in blocks of 8 — the
    // digest binds to a real column BEFORE the chunk explode so it is
    // computed once per block, not once per replicate (measured 7 s → ~2 s
    // at sf0.1). 16-bit granularity perturbs the ladder thresholds by
    // ≤ 2⁻¹⁶ — immaterial for bootstrap weights.
    val w = poissonCdf.reverse.foldLeft(lit(9): Column) { case (acc, (t, k)) =>
      when(col("u") < lit(t), lit(k)).otherwise(acc)
    }
    val repMeans = df
      .select(col(idCol).cast("string").as("id"),
        round(col(valueCol) * lit(1e6)).cast("long").as("v_micro"))
      .withColumn("blk", explode(sequence(lit(0), lit((b - 1) / 8))))
      .withColumn("h", md5(concat(lit(seed + ":"), col("id"), lit(":"),
        col("blk").cast("string"))))
      .withColumn("c", explode(sequence(lit(0), lit(7))))
      .withColumn("r", col("blk") * 8 + col("c"))
      .filter(col("r") < b)
      .withColumn("u", conv(col("h").substr(col("c") * lit(4) + lit(1), lit(4)),
        16, 10).cast("double") / lit(65536.0))
      .withColumn("w", w)
      .groupBy("r")
      .agg(sum("w").as("n_w"), sum(col("w") * col("v_micro")).as("s_micro"))
      .select(col("r"), (col("s_micro").cast("double") / lit(1e6) /
        col("n_w").cast("double")).as("mean_r"))
    val point = df.agg(
      (sum(round(col(valueCol) * lit(1e6)).cast("long")).cast("double") /
        lit(1e6) / count(lit(1)).cast("double")).as("est_mean"))
    val sorted = repMeans.agg(
      sort_array(collect_list(struct(col("mean_r"), col("r")))).as("ms"))
      .select(
        element_at(col("ms"), 2)("mean_r").as("ci_lo"),
        element_at(col("ms"), b - 1)("mean_r").as("ci_hi"))
    point.crossJoin(sorted)
      .select(col("est_mean"), col("ci_lo"), col("ci_hi"),
        lit(b.toLong).as("n_replicates"))
  }

  /** Classical seasonal decomposition of the daily event count series
    * (moving-average flavor of Cleveland's STL): trend = centered
    * (2·half+1)-day moving average (full windows only), weekly seasonal =
    * per-day-of-week mean of the detrended series re-centered to sum ≈ 0,
    * residual = observed − trend − seasonal. The monitoring companion to
    * [[Analytics.seasonalNaiveEval]]: the residual is what anomaly alerts
    * should fire on, not the raw count (which always "spikes" on weekends).
    *
    * Exactness: the raw series is integer counts; trend and seasonal are
    * quantized to micro-units (round(x·1e6) → BIGINT) immediately after
    * their single double division, so every downstream subtraction is
    * integer arithmetic — bit-equal in any engine at any parallelism.
    * Day-of-week is (days since epoch) mod 7: both engines share the exact
    * datediff, where native dow functions disagree on Sunday=0 vs 1.
    *
    * Scale: one count aggregate collapses events to the day grain
    * (map-side partials); everything after runs on the day-sized series —
    * the [[seasonalNaiveEval]]/[[cusum]] pattern. */
  def seasonalDecompose(events: DataFrame, tsCol: String,
                        halfWindow: Int = 3): DataFrame = {
    val span = 2 * halfWindow + 1
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(-halfWindow, halfWindow)
    val t = daily
      .withColumn("trend_micro",
        when(count(lit(1)).over(w) === span,
          round(sum("n").over(w) * lit(1e6) / lit(span.toDouble)).cast("long")))
      .withColumn("detr_micro", col("n") * lit(1000000L) - col("trend_micro"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long"))
    val dowMeans = t.filter(col("detr_micro").isNotNull)
      .groupBy("dow")
      .agg(round(sum("detr_micro").cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("raw_micro"))
    val center = dowMeans.agg(
      round(sum("raw_micro").cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("c_micro"))
    val seas = dowMeans.crossJoin(broadcast(center))
      .select(col("dow"), (col("raw_micro") - col("c_micro")).as("seas_micro"))
    t.join(broadcast(seas), "dow")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("dow"),
        (col("trend_micro").cast("double") / lit(1e6)).as("trend"),
        (col("seas_micro").cast("double") / lit(1e6)).as("seasonal"),
        ((col("n") * lit(1000000L) - col("trend_micro") - col("seas_micro"))
          .cast("double") / lit(1e6)).as("residual"))
      .orderBy("day")
  }

  /** Cohort LTV triangle: users cohort by FIRST-seen week, revenue
    * accumulates per (cohort, weeks-since) cell — the monetary twin of
    * [[growthAccounting]]'s retention triangle, and the table every
    * payback-period model reads. Cumulative LTV divides by the FULL
    * cohort size (not just that week's actives) — the convention that
    * makes cells comparable across cohorts.
    *
    * One (user, week) aggregate, one user-keyed join against the
    * user-sized cohort table (AQE broadcasts it when it fits), one grid
    * aggregate (cohorts × weeks — tiny), then a cumulative window
    * PARTITIONED by cohort. DECIMAL revenue end to end, doubles only in
    * the final projection. */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("wk"),
      col(valueCol).cast("decimal(18,6)").as("v"))
      .groupBy("u", "wk").agg(sum("v").as("rev"))
    val cohorts = uw.groupBy("u").agg(min("wk").as("c0"))
    val sizes = cohorts.groupBy("c0").agg(count(lit(1)).as("cohort_users"))
    val grid = uw.join(cohorts, "u")
      .groupBy(col("c0"),
        (datediff(col("wk"), col("c0")) / lit(7)).cast("long").as("weeks_since"))
      .agg(sum("rev").cast("decimal(18,6)").as("rev"))
    val w = Window.partitionBy("c0").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(sizes, "c0")
      .withColumn("cum", sum("rev").over(w).cast("decimal(18,6)"))
      .select(
        date_format(col("c0"), "yyyy-MM-dd").as("cohort_week"),
        col("weeks_since"), col("cohort_users"),
        col("rev").cast("double").as("revenue"),
        col("cum").cast("double").as("cum_revenue"),
        (col("cum").cast("double") / col("cohort_users").cast("double"))
          .cast("decimal(18,6)").cast("double").as("ltv_per_user"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** Single changepoint by binary segmentation (the first split of the
    * classic CUSUM-of-squares/segmentation family): the day k that
    * minimizes SSE_left + SSE_right over the daily count series — WHERE
    * the level shifted, complementing [[Evaluation.cusum]]'s "did it
    * shift" alarm. One candidate row per day from prefix sums (integer
    * Σ/Σ² — exact), one fixed double chain per candidate, argmin by
    * (cost, day) total order. Day-sized series after the first aggregate;
    * the window prefix scan runs on it, not on events. */
  def changepoint(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    val tot = daily.agg(count(lit(1)).as("nd"), sum("n").as("s"),
      sum(col("n") * col("n")).as("ss"))
    def sse(s: Column, ss: Column, n: Column): Column =
      ss.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")
    val cand = daily
      .withColumn("k", count(lit(1)).over(w))     // rows BEFORE this day
      .withColumn("sL", sum("n").over(w))
      .withColumn("ssL", sum(col("n") * col("n")).over(w))
      .filter(col("k") >= 1)
      .crossJoin(broadcast(tot))
      .filter(col("k") < col("nd"))
      .select(col("day"), col("k"),
        (sse(col("sL"), col("ssL"), col("k")) +
          sse(col("s") - col("sL"), col("ss") - col("ssL"), col("nd") - col("k")))
          .as("cost"),
        sse(col("s"), col("ss"), col("nd")).as("cost0"))
    cand.orderBy(col("cost").asc, col("day").asc).limit(1)
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("split_day"),
        col("k").as("n_days_before"),
        col("cost0").cast("decimal(18,6)").cast("double").as("sse_unsplit"),
        col("cost").cast("decimal(18,6)").cast("double").as("sse_split"),
        ((col("cost0") - col("cost")) / col("cost0"))
          .cast("decimal(18,6)").cast("double").as("reduction"))
  }

  /** Time-constrained funnel (the ClickHouse `windowFunnel` shape): how
    * deep each user gets through an ORDERED event chain when every later
    * step must land within `windowDays` of the FIRST step. Greedy
    * earliest-match semantics — first step-1 event, then the first step-2
    * event after it, then the first step-3 after THAT — which is exactly
    * expressible as a chain of min-aggregates and therefore oracle-exact
    * (q68's funnel counts unordered lifetime reach; this one answers "did
    * they convert within the week").
    *
    * Per step: one filtered (user, min ts) aggregate + one user-keyed
    * join — step tables shrink monotonically, everything partitions by
    * user. Output: depth → user count. */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowDays: Int = 7): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    val u = col(userCol).as("u")
    var cur = events.filter(col(typeCol) === steps.head)
      .select(u, col(tsCol).as("ts"))
      .groupBy("u").agg(min("ts").as("t_last"))
      .withColumn("deadline", col("t_last") + expr(s"INTERVAL $windowDays DAYS"))
    var tiers = List(cur.select("u") -> 1)
    for (step <- steps.tail) {
      cur = events.filter(col(typeCol) === step)
        .select(u, col(tsCol).as("ts"))
        .join(cur, "u")
        .filter(col("ts") > col("t_last") && col("ts") <= col("deadline"))
        .groupBy("u").agg(min("ts").as("t_last"), min("deadline").as("deadline"))
      tiers ::= cur.select("u") -> (tiers.head._2 + 1)
    }
    tiers.map { case (df, depth) => df.select(lit(depth).as("depth"), col("u")) }
      .reduce(_ unionAll _)
      .groupBy("u").agg(max("depth").as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  /** Hill estimator of the power-law tail index (Hill 1975): over the top
    * k order statistics, H = (1/k)·Σ ln(x_(i)/x_(k+1)) and α̂ = 1/H — the
    * "how heavy is this distribution's tail" gate that decides whether
    * mean-based SLAs/capacity plans are even meaningful for a column.
    *
    * Scale: the ONLY full-data step is orderBy+limit(k+1), which Spark
    * plans as TakeOrderedAndProject — per-partition bounded heaps, no
    * global sort, no collect. Everything after runs on k+1 rows. The
    * (value desc, id) tiebreak makes the selected set — and therefore the
    * estimate — deterministic under ties at the boundary.
    *
    * Exactness: each ln term is quantized to micro-units BEFORE the sum
    * (doubles summed in arbitrary order would drift); the mean divides
    * exact integers and α̂ is quantized once at the end. */
  /** SAX symbolization (Lin/Keogh 2003) of the daily event-count series:
    * PAA frame means → z-normalize against the global series moments →
    * quartile breakpoints of N(0,1) → a 4-letter word per frame. The
    * standard "make a time series greppable" transform: motif discovery,
    * novelty detection, and series indexing all run on the symbols.
    *
    * Exactness: counts are integers, so Σ and Σ² are exact; mean/var/std
    * and each z follow ONE fixed double chain mirrored in the oracle
    * (sqrt is IEEE-correctly-rounded everywhere), and displayed values
    * quantize once at the end. Letters compare the UN-quantized z against
    * literal breakpoints — same chain ⇒ same double ⇒ same letter.
    *
    * Scale: one count aggregate collapses to the day grain; the 1-row
    * moment frame broadcasts over the day-sized series. */
  def saxSymbolize(events: DataFrame, tsCol: String,
                   frameDays: Int = 7): DataFrame = {
    val bp = 0.6744897501960817 // N(0,1) quartiles
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.agg(
      min("day").as("d0"), count(lit(1)).as("nd"),
      sum("n").as("s"), sum(col("n") * col("n")).as("ss"))
    val mean = col("s").cast("double") / col("nd").cast("double")
    val variance = (col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("nd").cast("double")) /
      col("nd").cast("double")
    val frames = daily.crossJoin(broadcast(stats))
      .select(col("day"), col("n"),
        floor(datediff(col("day"), col("d0")).cast("double") / lit(frameDays.toDouble))
          .cast("long").as("frame"),
        mean.as("mu"), sqrt(variance).as("sigma"))
      .groupBy("frame")
      .agg(count(lit(1)).as("n_days"), sum("n").as("fs"),
        first("mu").as("mu"), first("sigma").as("sigma"))
    val paa = col("fs").cast("double") / col("n_days").cast("double")
    val z = (paa - col("mu")) / col("sigma")
    frames.select(
      col("frame"), col("n_days"),
      paa.cast("decimal(18,6)").cast("double").as("paa"),
      z.cast("decimal(18,6)").cast("double").as("z"),
      when(z < -bp, "a").when(z < 0.0, "b").when(z < bp, "c").otherwise("d")
        .as("symbol"))
      .orderBy("frame")
  }

  def hillTailIndex(df: DataFrame, idCol: String, valueCol: String,
                    k: Int = 500): DataFrame = {
    val top = df
      .select(col(idCol).as("id"), col(valueCol).cast("double").as("x"))
      .filter(col("x") > 0)
      .orderBy(col("x").desc, col("id"))
      .limit(k + 1)
    val xk1 = top.agg(min("x").as("x_k1"))
    // keep rows strictly above the pivot: if ties straddle the k/k+1
    // boundary this drops the whole tied value, so the estimate depends
    // only on VALUES, never on which tied ids the heap happened to keep
    top.crossJoin(broadcast(xk1))
      .filter(col("x") > col("x_k1"))
      .select(round(log(col("x") / col("x_k1")) * lit(1e6)).cast("long").as("t"),
        col("x_k1"))
      .groupBy(col("x_k1"))
      .agg(count(lit(1)).as("k_eff"), sum("t").as("s_micro"))
      .select(
        col("k_eff"),
        col("x_k1"),
        (col("s_micro").cast("double") / lit(1e6) / col("k_eff").cast("double"))
          .as("hill_h"),
        (lit(1e6) * col("k_eff").cast("double") / col("s_micro").cast("double"))
          .cast("decimal(18,6)").cast("double").as("alpha"))
  }

  /** Leave-one-out target encoding: replace a high-cardinality categorical
    * key with the mean of the target over OTHER rows sharing the key —
    * (Σ_key target − own) / (n_key − 1) — the standard leakage-free way to
    * feed a 10⁷-cardinality key to a model (encoding WITH the own row leaks
    * the label; k-fold schemes approximate what LOO computes exactly).
    * Singleton keys have no "others" and fall back to the global mean over
    * the other n−1 rows ((Σ − own)/(n−1): the same formula at the corpus
    * grain, still leakage-free).
    *
    * Exactness: targets sum as DECIMAL (order-independent); each encoding
    * is ONE double division of exact decimals, quantized to (18,6).
    * Scale shape: one key-grain hash aggregate (map-side partials) joined
    * back on the key — no window over raw rows, no per-key state. AQE
    * broadcasts the aggregate when keys are few and skew-splits hot keys
    * when they are not. */
  def targetEncode(df: DataFrame, idCol: String, keyCol: String,
                   targetCol: String): DataFrame = {
    val t = col(targetCol).cast("decimal(28,6)")
    val perKey = df.groupBy(keyCol)
      .agg(sum(t).cast("decimal(28,6)").as("key_sum"),
        count(lit(1)).as("key_n"))
    val global = df.agg(sum(t).cast("decimal(28,6)").as("all_sum"),
      count(lit(1)).as("all_n"))
    df.select(col(idCol), col(keyCol), t.as("own"))
      .join(perKey, Seq(keyCol))
      .crossJoin(broadcast(global))
      .select(col(idCol), col(keyCol), col("key_n"),
        when(col("key_n") > 1,
          (col("key_sum") - col("own")).cast("double") /
            (col("key_n") - 1).cast("double"))
          .otherwise((col("all_sum") - col("own")).cast("double") /
            (col("all_n") - 1).cast("double"))
          .cast("decimal(18,6)").cast("double").as("loo_mean"))
      .orderBy(idCol)
  }

  /** Holt linear-trend (double exponential) smoothing over per-key daily
    * counts, with an h-step forecast — the trend-aware upgrade of the EWMA
    * decay score: level sₜ = α·xₜ + (1−α)(sₜ₋₁+bₜ₋₁), trend
    * bₜ = β(sₜ−sₜ₋₁) + (1−β)bₜ₋₁, initialized s₁=x₁, b₁=x₂−x₁; forecast
    * x̂_{T+h} = s_T + h·b_T.
    *
    * Exactness: α and β are EXACT binary fractions (0.5, 0.25) and the
    * recurrence is written with the identical association in the SQL twin,
    * so every IEEE intermediate matches bit-for-bit on any engine; the
    * final quantize is presentation only. The recurrence is inherently
    * sequential IN TIME, so it folds over the key's own day series —
    * aggregate() over a sorted collect_list — which is fine precisely
    * because the series length is DAYS (bounded, thousands), not rows:
    * the corpus-sized work (daily bucketing) is a plain hash aggregate,
    * and the fold is per-key, day-sized, and never touches the driver. */
  def holtForecast(events: DataFrame, keyCol: String, tsCol: String,
                   horizon: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val stateT = "struct<s:double,b:double>"
    daily
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(struct(col("day"), col("n").cast("double")
          .as("x")))).as("xs"))
      .withColumn("fin", when(col("n_days") === 1,
          struct(col("xs")(0)("x").as("s"), lit(0.0).as("b")).cast(stateT))
        .otherwise(aggregate(
          slice(col("xs"), lit(3), greatest(col("n_days") - 2, lit(0))),
          struct(
            (lit(0.5) * col("xs")(1)("x") +
              lit(0.5) * (col("xs")(0)("x") + (col("xs")(1)("x") - col("xs")(0)("x")))).as("s"),
            (lit(0.25) * ((lit(0.5) * col("xs")(1)("x") +
                lit(0.5) * (col("xs")(0)("x") + (col("xs")(1)("x") - col("xs")(0)("x"))))
              - col("xs")(0)("x")) +
              lit(0.75) * (col("xs")(1)("x") - col("xs")(0)("x"))).as("b"))
            .cast(stateT),
          (acc, e) => {
            val sNew = lit(0.5) * e("x") + lit(0.5) * (acc("s") + acc("b"))
            struct(sNew.as("s"),
              (lit(0.25) * (sNew - acc("s")) + lit(0.75) * acc("b")).as("b"))
              .cast(stateT)
          })))
      .select(col(keyCol), col("n_days"),
        col("fin.s").cast("decimal(18,6)").cast("double").as("level"),
        col("fin.b").cast("decimal(18,6)").cast("double").as("trend"),
        (col("fin.s") + lit(horizon.toDouble) * col("fin.b"))
          .cast("decimal(18,6)").cast("double").as("forecast"))
      .orderBy(keyCol)
  }

  /** Kendall tau-b concordance WITHIN small groups, pooled — "across all
    * orders, do quantity and price move together line-by-line". Spearman
    * ([[spearmanByGroup]]) ranks whole columns; Kendall counts concordant
    * vs discordant PAIRS, which generalizes to a stratified form: pairs
    * are taken only within a group (a Kendall partial concordance), so the
    * self-join is keyed on the group column and costs Σ n_g² — bounded
    * when groups are (like order line counts) naturally small. Never an
    * unkeyed cross join.
    *
    * All six pair counts (concordant, discordant, x-only ties, y-only
    * ties, both-tied, total) are exact integers; tau-b =
    * (nc − nd)/√((n0 − tx_all)(n0 − ty_all)) — with tx_all/ty_all the
    * pairs tied on that axis regardless of the other — is ONE double
    * chain over them, quantized scale 9. `seqCol` must order rows totally
    * within a group so each unordered pair is generated exactly once. */
  def kendallWithinGroups(df: DataFrame, groupCol: String, seqCol: String,
                          xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(seqCol).as("seq"),
      col(xCol).as("x"), col(yCol).as("y"))
    val a = base.select(col("grp"), col("seq").as("sa"), col("x").as("xa"), col("y").as("ya"))
    val b = base.select(col("grp"), col("seq").as("sb"), col("x").as("xb"), col("y").as("yb"))
    val dx = signum(col("xb") - col("xa")).cast("int")
    val dy = signum(col("yb") - col("ya")).cast("int")
    val pairs = a.join(b, Seq("grp")).filter(col("sa") < col("sb"))
      .select(dx.as("dx"), dy.as("dy"))
      .agg(count(lit(1)).as("n0"),
        sum((col("dx") * col("dy") === 1).cast("long")).as("nc"),
        sum((col("dx") * col("dy") === -1).cast("long")).as("nd"),
        sum((col("dx") === 0 && col("dy") =!= 0).cast("long")).as("tx"),
        sum((col("dy") === 0 && col("dx") =!= 0).cast("long")).as("ty"),
        sum((col("dx") === 0 && col("dy") === 0).cast("long")).as("txy"))
    val n0 = col("n0").cast("double")
    val denom = sqrt((n0 - (col("tx") + col("txy")).cast("double")) *
      (n0 - (col("ty") + col("txy")).cast("double")))
    pairs.select(col("n0").cast("long").as("n_pairs"),
      col("nc").cast("long").as("concordant"),
      col("nd").cast("long").as("discordant"),
      col("tx").cast("long").as("ties_x"), col("ty").cast("long").as("ties_y"),
      col("txy").cast("long").as("ties_xy"),
      when(denom > 0d,
        ((col("nc") - col("nd")).cast("double") / denom)
          .cast("decimal(18,9)").cast("double"))
        .otherwise(lit(null).cast("double")).as("tau_b"))
  }

  /** Gaussian kernel density estimate evaluated at a FIXED grid — the
    * smooth histogram behind distribution dashboards and drift plots
    * (Parzen 1962). f(g) = Σ K((g−x)/h) / (n·h·√2π) with the standard
    * normal kernel.
    *
    * Scale shape: the grid is a CONSTANT-sized broadcast; each row fans
    * out to gridN kernel terms map-side and partial aggregation collapses
    * them before the shuffle, so the exchange carries gridN × partitions
    * rows no matter how big the input. Exactness: each exp term is
    * quantized DECIMAL(18,9) BEFORE the order-independent decimal sum
    * (the [[Evaluation.naiveBayes]] ln recipe, for exp), and the final
    * normalization is one double chain with √2π as a shared literal —
    * `pi()`/`sqrt` provenance never enters the comparison. */
  def kdeGrid(df: DataFrame, value: Column, vMin: Double, vMax: Double,
              gridN: Int, bandwidth: Double): DataFrame = {
    require(gridN >= 2 && gridN <= 512, "gridN in [2,512]")
    val spark = df.sparkSession
    val step = (vMax - vMin) / (gridN - 1).toDouble
    val grid = spark.range(gridN.toLong)
      .select(col("id").cast("int").as("gi"),
        (lit(vMin) + col("id").cast("double") * step).as("g"))
    val u = (col("g") - value.cast("double")) / bandwidth
    val sqrt2pi = 2.5066282746310002d // shared literal: sqrt(2*pi)
    df.crossJoin(broadcast(grid))
      .select(col("gi"), col("g"),
        exp(u * u * -0.5d).cast("decimal(18,9)").as("term"))
      .groupBy("gi", "g")
      .agg(count(lit(1)).as("n"), sum("term").as("ksum"))
      .select(col("gi"), col("g").cast("double").as("x"),
        (col("ksum").cast("double") /
          (col("n").cast("double") * bandwidth * sqrt2pi))
          .cast("decimal(18,12)").cast("double").as("density"))
      .orderBy("gi")
  }

  /** Incremental join maintenance (the delta-join identity of incremental
    * view maintenance): given a materialized inner join J = L ⋈ R and
    * append-only deltas ΔL, ΔR, the NEW join rows are exactly
    * ΔJ = (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR) — three joins whose left/right
    * inputs are delta-sized on at least one side, never a re-join of the
    * full bases. The exact-join companion of [[hllMergePipeline]] /
    * [[incrementalAgg]]: those maintain aggregates without re-scans, this
    * maintains a JOIN without re-joining history (at 100 TB the delta is
    * the only thing that should touch the shuffle).
    *
    * Returns ΔJ aggregated per `groupCol` (count + exact decimal sum of
    * `valueCol`) so the identity is oracle-checkable as
    * "full-join aggregate − old-join aggregate". */
  def incrementalJoinDelta(leftOld: DataFrame, leftDelta: DataFrame,
                           rightOld: DataFrame, rightDelta: DataFrame,
                           key: String, groupCol: String,
                           valueCol: String): DataFrame = {
    def j(l: DataFrame, r: DataFrame) = l.join(r, key)
    val delta = j(leftDelta, rightOld)
      .unionByName(j(leftOld, rightDelta))
      .unionByName(j(leftDelta, rightDelta))
    delta.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_delta"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_delta"))
      .orderBy("grp")
  }

  /** Multi-window SLO error-budget burn rate (the SRE alerting recipe):
    * per hour, the error share over the SHORT window and over a rolling
    * LONG window, each divided by the budget — an alert fires only when
    * BOTH exceed 1 (short window: you're burning now; long window: it's
    * not a blip). Burn rate 1 = exactly consuming budget; 14.4 = the
    * classic "1h window eats 2% of a 30-day budget" page.
    *
    * Hour-grain hash aggregate (the only row-sized work); the rolling
    * window runs over the calendar-bounded hour series; shares are exact
    * integer divisions, burn chains scale 6. */
  def sloBurn(events: DataFrame, tsCol: String, isError: Column,
              budget: Double, longWindowHours: Int = 6): DataFrame = {
    val hourly = events
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("t"), sum(when(isError, 1L).otherwise(0L)).as("e"))
    val w = Window.orderBy("hour")
      .rowsBetween(-(longWindowHours - 1), Window.currentRow)
    val shortBurn = (col("e").cast("double") / col("t").cast("double")) / budget
    val longBurn = (col("le").cast("double") / col("lt").cast("double")) / budget
    hourly
      .withColumn("lt", sum("t").over(w))
      .withColumn("le", sum("e").over(w))
      .select(col("hour"), col("t").cast("long").as("n_requests"),
        col("e").cast("long").as("n_errors"),
        shortBurn.cast("decimal(18,6)").cast("double").as("burn_1h"),
        longBurn.cast("decimal(18,6)").cast("double").as("burn_long"),
        (shortBurn > 1d && longBurn > 1d).cast("int").as("alert"))
      .orderBy("hour")
  }

  /** Durbin–Watson statistic on the daily-volume series after removing a
    * linear trend — "are the residuals autocorrelated", i.e. does the
    * series still carry structure a trend line doesn't explain (DW ≈ 2
    * none, → 0 positive autocorrelation, → 4 negative). The residual
    * companion of [[acf]]: ACF describes the raw series, DW scores what's
    * LEFT after the model — the classic "your forecast errors aren't
    * noise" alarm.
    *
    * Day-grain aggregate (calendar-bounded series); OLS a,b from exact
    * integer moments in one double chain; each residual term (e_t²,
    * (e_t−e_{t−1})²) quantizes DECIMAL(28,9) before its exact sum; DW is
    * one division, scale 9. */
  def durbinWatson(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("day")
    val ts = daily.withColumn("t", row_number().over(w).cast("long"))
      .localCheckpoint() // moments + residual scan
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val mom = ts.agg(count(lit(1)).as("n"), sum("t").as("st"), sum("x").as("sx"),
      sum(c19(col("t")) * col("x")).as("stx"),
      sum(c19(col("t")) * col("t")).as("stt"))
    val nd = col("n").cast("double"); val st = col("st").cast("double")
    val sx = col("sx").cast("double"); val stx = col("stx").cast("double")
    val stt = col("stt").cast("double")
    val b = (nd * stx - st * sx) / (nd * stt - st * st)
    val a = (sx - b * st) / nd
    val resid = ts.crossJoin(broadcast(mom))
      .select(col("t"),
        (col("x").cast("double") - (a + b * col("t").cast("double"))).as("e"))
    val wl = Window.orderBy("t")
    resid
      .withColumn("ePrev", lag("e", 1).over(wl))
      .select(
        (col("e") * col("e")).cast("decimal(28,9)").as("e2"),
        when(col("ePrev").isNotNull,
          ((col("e") - col("ePrev")) * (col("e") - col("ePrev")))
            .cast("decimal(28,9)"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(28,9)")).as("d2"))
      .agg(count(lit(1)).as("n_days"), sum("e2").as("se2"), sum("d2").as("sd2"))
      .select(col("n_days").cast("long").as("n_days"),
        when(col("se2") > 0,
          (col("sd2").cast("double") / col("se2").cast("double"))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("dw"))
  }

  /** Empirical copula grid — the scale-free dependence picture: both axes
    * transform to average-rank deciles and the k×k cell counts show
    * WHERE the dependence lives (corners = tail dependence, diagonal =
    * monotone association; a flat grid ≈ n/k² everywhere means
    * independence). Spearman/Kendall compress this to one number; the
    * grid is what you plot before trusting them.
    *
    * Never ranks raw rows (the [[spearmanByGroup]] margin collapse): each
    * axis ranks its per-distinct-value margin, the DOUBLED average rank
    * 2·cumBefore+cnt+1 stays integral, and the decile is the exact
    * integer ((avgRank2 − 1)·k) / (2n) taken in floor arithmetic —
    * engine-identical bucketing, no percent_rank doubles anywhere. Cells
    * join back value-keyed and aggregate; ties land in ONE bucket on
    * both engines by construction. */
  def copulaGrid(df: DataFrame, xCol: String, yCol: String,
                 k: Int = 10): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    def margin(valCol: String, out: String): DataFrame = {
      val w = Window.orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cells.groupBy(col(valCol)).agg(sum("cnt").as("nv"))
        .withColumn("avgRank2",
          lit(2) * (sum("nv").over(w) - col("nv")) + col("nv") + 1)
        .withColumn("n", sum("nv").over(wAll))
        .select(col(valCol),
          least(lit(k - 1), floor((col("avgRank2") - 1) * k /
            (lit(2) * col("n")))).cast("long").as(out))
    }
    cells
      .join(margin("x", "bx"), Seq("x"))
      .join(margin("y", "by"), Seq("y"))
      .groupBy("bx", "by").agg(sum("cnt").as("n"))
      .orderBy("bx", "by")
  }

  /** Overdispersion check on grouped count data (variance-to-mean ratio):
    * a Poisson arrival stream has VMR ≈ 1, so a per-key daily-count VMR
    * far above 1 means bursty/clumped arrivals (bot traffic, replays,
    * batch dumps) and far below means throttled/regularized flow — the
    * cheap distributional sanity gate on event volume BEFORE modeling
    * assumes Poisson anything.
    *
    * Day-grain counts via one hash aggregate; per key the moment sums
    * (n, Σx, Σx²) are exact integers and VMR = s²/x̄ is one double chain
    * (sample variance), quantized scale 9. */
  def dispersionCheck(events: DataFrame, keyCol: String, tsCol: String,
                      threshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("key"), date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val g = daily.groupBy("key").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum(c19(col("x")) * col("x")).as("sxx"))
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val mean = sx / n
    val varS = (sxx - sx * sx / n) / (n - 1d)
    g.filter(col("n") > 1)
      .select(col("key"), col("n").cast("long").as("n_days"),
        mean.cast("decimal(18,6)").cast("double").as("mean_daily"),
        (varS / mean).cast("decimal(18,9)").cast("double").as("vmr"),
        (varS / mean > threshold).cast("int").as("overdispersed"))
      .orderBy("key")
  }

  /** Join cardinality: the optimizer's uniform estimate vs ground truth.
    * |A ⋈ B| on an equi-key is EXACTLY Σ_v n_a(v)·n_b(v); a cost-based
    * planner with only (rowCount, distinctCount) per side estimates it as
    * N_a·N_b / max(d_a, d_b) (the Selinger/System-R uniformity+containment
    * assumption every CBO still ships). This operator computes both — the
    * truth from the two per-key count tables joined (key-sized, never the
    * join itself materialized) — and reports the error: the audit to run
    * before trusting a planner's join ordering on skewed keys, and the
    * statistic a stats-collection pipeline should alarm on.
    *
    * Everything is exact integers (per-key products in DECIMAL(38,0))
    * except the estimate and relative error, one double chain each,
    * quantized scale 6. */
  def joinSizeEstimate(a: DataFrame, b: DataFrame,
                       keyA: String, keyB: String): DataFrame = {
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("na"))
      .localCheckpoint() // totals + the truth join both read it
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("nb"))
      .localCheckpoint()
    val sa = ca.agg(sum("na").as("n_a"), count(lit(1)).as("d_a"))
    val sb = cb.agg(sum("nb").as("n_b"), count(lit(1)).as("d_b"))
    val truth = ca.join(cb, "k")
      .agg(coalesce(sum(col("na").cast("decimal(19,0)") * col("nb")), lit(0))
        .cast("decimal(38,0)").as("actual"))
    val est = (col("n_a").cast("double") * col("n_b").cast("double") /
      greatest(col("d_a"), col("d_b")).cast("double"))
    sa.crossJoin(broadcast(sb)).crossJoin(broadcast(truth))
      .select(col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        col("d_a").cast("long").as("d_a"), col("d_b").cast("long").as("d_b"),
        est.cast("decimal(18,6)").cast("double").as("estimate"),
        col("actual").cast("long").as("actual"),
        when(col("actual") > 0,
          ((est - col("actual").cast("double")) / col("actual").cast("double"))
            .cast("decimal(18,6)").cast("double"))
          .otherwise(lit(null).cast("double")).as("rel_err"))
  }

  /** Functional-dependency discovery over candidate column pairs — the
    * schema-profiling primitive ("is A a key for B") behind FK inference,
    * normalization advice, and silent-denormalization drift alarms:
    * A → B holds iff every A value maps to exactly one B value, i.e. no
    * A-group has two distinct B's.
    *
    * Per pair: one (A, B)-distinct collapse, then an A-grain aggregate of
    * the per-A distinct-B count — exact integers; violations are A values
    * with ≥2 images. Pairs are enumerated by the CALLER (p² column pairs
    * is a choice, not a default); each pair is an independent aggregate
    * unioned into one report. */
  def functionalDependencies(df: DataFrame,
                             pairs: Seq[(String, String)]): DataFrame = {
    pairs.map { case (a, b) =>
      df.select(col(a).as("av"), col(b).as("bv")).distinct()
        .groupBy("av").agg(countDistinct("bv").as("nb"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nb").as("max_images"))
        .select(lit(a).as("lhs"), lit(b).as("rhs"),
          col("n_keys").cast("long").as("n_keys"),
          col("n_violating").cast("long").as("n_violating"),
          col("max_images").cast("long").as("max_images"),
          (col("n_violating") === 0).cast("int").as("fd_holds"))
    }.reduce(_.unionByName(_)).orderBy("lhs", "rhs")
  }

  /** Knee/elbow point of a monotone curve (Kneedle, Satopää et al. 2011,
    * simplified): min-max normalize both axes and take the point of
    * maximum vertical distance from the chord — ŷ − x̂ for a concave
    * curve (diminishing returns: scree plots, recall@k), x̂ − ŷ for a
    * convex one (Lorenz/Pareto concentration). The "where to stop"
    * reader for every cumulative curve this engine produces.
    *
    * The curve is aggregate-sized by contract (points = ranks/deciles/k
    * values, not raw rows) so the min-max scan and the argmax are cheap;
    * the normalized distance is ONE double chain per point, quantized
    * scale 9, and the argmax is a max(struct) with an x tiebreak —
    * engine-stable. */
  def kneePoint(curve: DataFrame, xCol: String, yCol: String,
                concave: Boolean): DataFrame = {
    val ext = curve.agg(min(col(xCol)).cast("double").as("xmin"),
      max(col(xCol)).cast("double").as("xmax"),
      min(col(yCol)).cast("double").as("ymin"),
      max(col(yCol)).cast("double").as("ymax"))
    val xn = (col(xCol).cast("double") - col("xmin")) / (col("xmax") - col("xmin"))
    val yn = (col(yCol).cast("double") - col("ymin")) / (col("ymax") - col("ymin"))
    val dRaw = if (concave) yn - xn else xn - yn
    curve.crossJoin(broadcast(ext))
      .select(col(xCol).as("x"), col(yCol).as("y"),
        dRaw.cast("decimal(18,9)").as("d"))
      .agg(max(struct(col("d"), (col("x").cast("double") * -1d).as("negx"),
        col("x"), col("y"))).as("k"))
      .select(col("k.x").as("knee_x"), col("k.y").as("knee_y"),
        col("k.d").cast("double").as("distance"))
  }

  /** Consecutive-day streak histogram (gaps-and-islands): for every key,
    * split its distinct activity dates into maximal runs of consecutive
    * days and count streaks by length — the engagement/retention shape
    * behind "n-day streak" metrics, and the date-typed twin of
    * [[sessionize]] (sessions gap on SECONDS, streaks on whole days).
    *
    * The classic island key is date − row_number·day: constant within a
    * consecutive run, strictly decreasing across gaps. One distinct
    * shuffle + one per-key window (parallel across keys, never global) +
    * two hash aggregates; everything is exact integers. */
  def streakHistogram(df: DataFrame, keyCol: String, dateCol: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy("d")
    df.select(col(keyCol).as("key"), dateCol.cast("date").as("d"))
      .distinct()
      .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy("key", "anchor").agg(count(lit(1)).as("len"))
      .groupBy(col("len").as("streak_len"))
      .agg(count(lit(1)).as("n_streaks"),
        countDistinct("key").as("n_keys"))
      .orderBy("streak_len")
  }

  /** Theil-T inequality index with its exact between/within-group
    * decomposition (Theil 1967) — the inequality measure [[giniByGroup]]
    * can't decompose: T_total = T_between + Σ share_g·T_within(g)
    * ADDITIVELY, so "is token concentration driven by a few sources or
    * by skew inside each source" gets a precise answer. T = 0 equal,
    * ln(n) max-concentrated.
    *
    * Works on the per-group distinct-value margin (`value` must be a
    * non-negative integer measure — cents, tokens, bytes): each margin
    * row's cnt·(v/X_g)·ln(v/μ_g) term quantizes its single ln to
    * DECIMAL(28,12) BEFORE the sum (the PMI recipe), with v/X_g and
    * v/μ_g as exact-integer cross-ratios inside the double chain.
    * Between-group terms run over the k-row group table the same way.
    * Zero values contribute zero (lim x→0 x·ln x = 0), zero-total
    * groups are dropped. Returns one row per group (n, total, share,
    * theil_within) with theil_between/theil_total replicated. */
  def theilDecomposition(df: DataFrame, groupCol: String,
                         value: Column): DataFrame = {
    val margin = df.select(col(groupCol).as("grp"), value.cast("long").as("v"))
      .filter(col("v") >= 0)
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // group totals + within terms
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val groups = margin.groupBy("grp")
      .agg(sum("cnt").as("ng"), sum(c19(col("v")) * col("cnt")).as("xg"))
      .filter(col("xg") > 0).localCheckpoint() // within join + between scan
    val tot = groups.agg(sum("ng").as("n"), sum("xg").as("x"))
    // within(g): Σ cnt·(v/X_g)·ln(v·n_g/X_g); ln arg = exact ratio of
    // exact integers, quantized pre-sum
    val within = margin.join(groups, "grp")
      .filter(col("v") > 0)
      .select(col("grp"),
        (col("cnt").cast("double") * col("v").cast("double") /
          col("xg").cast("double") *
          log(col("v").cast("double") * col("ng").cast("double") /
            col("xg").cast("double"))).cast("decimal(28,12)").as("term"))
      .groupBy("grp").agg(sum("term").as("tw"))
    // between: Σ (X_g/X)·ln((X_g/X)/(n_g/n)) over the k-row group table
    val between = groups.crossJoin(broadcast(tot))
      .select(((col("xg").cast("double") / col("x").cast("double")) *
        log(col("xg").cast("double") * col("n").cast("double") /
          (col("x").cast("double") * col("ng").cast("double"))))
        .cast("decimal(28,12)").as("bterm"))
      .agg(sum("bterm").as("tb"))
    val shareD = col("xg").cast("double") / col("x").cast("double")
    val withTotals = groups.join(within, Seq("grp"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(between))
      .localCheckpoint() // total needs Σ share·tw over these same rows
    val tTotal = withTotals.agg(
      (max(col("tb")).cast("double") +
        sum((shareD * coalesce(col("tw").cast("double"), lit(0d)))
          .cast("decimal(28,12)")).cast("double")).as("tt"))
    withTotals.crossJoin(broadcast(tTotal))
      .select(col("grp"), col("ng").cast("long").as("n"),
        col("xg").cast("decimal(19,0)").cast("double").as("total"),
        shareD.cast("decimal(18,9)").cast("double").as("share"),
        coalesce(col("tw").cast("double"), lit(0d))
          .cast("decimal(18,9)").cast("double").as("theil_within"),
        col("tb").cast("double").cast("decimal(18,9)").cast("double").as("theil_between"),
        col("tt").cast("decimal(18,9)").cast("double").as("theil_total"))
      .orderBy("grp")
  }

  /** Global Moran's I spatial autocorrelation with block-contiguity
    * weights (w_ij = 1 inside a grid cell) — "is this metric CLUSTERED in
    * space or salt-and-pepper", the first spatial statistic any
    * geo-bucketed metric needs (I > E[I] = −1/(n−1) ⇒ clustered, < ⇒
    * dispersed). Block contiguity is the standard scalable weight choice
    * (the [[RangeJoin.gridProximityJoin]] family's statistic).
    *
    * NO PAIR EXPLOSION AND EXACT BY CONSTRUCTION: same-cell pair products
    * collapse to per-cell sums — Σ_{i≠j∈c}(x_i−μ)(x_j−μ) scaled by n²
    * equals (n·s_c − n_c·T)² − n²·q_c + 2·n·T·s_c − n_c·T², all exact
    * integers from one (cell)-grain aggregate — and the n² scaling
    * cancels against the denominator, leaving I = NUM/(W·(n·SS − T²)):
    * ONE double division of exact integer sums. `value` must be
    * integer-typed. */
  def moransI(df: DataFrame, idCol: String, xCol: String, yCol: String,
              valueCol: String, cellSize: Long): DataFrame = {
    require(cellSize >= 1, "cellSize >= 1")
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val v = col(valueCol).cast("long")
    val cells = df.select(
        expr(s"CAST($xCol AS BIGINT) div $cellSize").as("cx"),
        expr(s"CAST($yCol AS BIGINT) div $cellSize").as("cy"), v.as("v"))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("nc"), sum(c19(col("v"))).as("sc"),
        sum((c19(col("v")) * col("v")).cast("decimal(38,0)")).as("qc"))
      .localCheckpoint() // global totals + the per-cell term scan
    val glob = cells.agg(sum("nc").as("n"), sum("sc").as("t"),
      sum("qc").as("ss"), count(lit(1)).as("nCells"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val inner = d38(c19(col("n")) * col("sc")) - d38(c19(col("nc")) * col("t"))
    val terms = cells.crossJoin(broadcast(glob))
      .select(
        ((inner * inner).cast("decimal(38,0)") -
          d38(c19(col("n")) * col("n") * col("qc")) +
          d38(lit(2) * c19(col("n")) * col("t") * col("sc")) -
          d38(c19(col("nc")) * col("t") * col("t"))).cast("decimal(38,0)").as("num"),
        (c19(col("nc")) * (col("nc") - 1)).cast("decimal(38,0)").as("w"))
      .agg(sum("num").as("num"), sum("w").as("w"))
    val den = (d38(c19(col("n")) * col("ss")) - d38(c19(col("t")) * col("t")))
      .cast("decimal(38,0)")
    terms.crossJoin(glob)
      .select(col("n").cast("long").as("n"),
        col("nCells").cast("long").as("n_cells"),
        col("w").cast("long").as("w_pairs"),
        when(col("w") > 0 && den > 0,
          (col("num").cast("double") / (col("w").cast("double") * den.cast("double")))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("morans_i"),
        (lit(-1d) / (col("n").cast("double") - 1d))
          .cast("decimal(18,9)").cast("double").as("expected_i"))
  }

  /** Getis–Ord General G with the same block-contiguity weights as
    * [[moransI]] — the HOT-vs-COLD disambiguator: Moran's I says
    * "clustered", G says WHICH KIND (G above its expectation W/(n(n−1))
    * ⇒ HIGH values cluster together; below ⇒ low values do). Standard
    * companion pair in spatial screening. Requires non-negative values.
    *
    * Same no-pair-explosion collapse: Σ_{i≠j∈c} x_i x_j = Σ_c (s_c² −
    * q_c) exactly, the denominator is T² − SS, and G is ONE double
    * division of exact integer sums; E[G] is one more. */
  def getisOrdG(df: DataFrame, idCol: String, xCol: String, yCol: String,
                valueCol: String, cellSize: Long): DataFrame = {
    require(cellSize >= 1, "cellSize >= 1")
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val v = col(valueCol).cast("long")
    val cells = df.select(
        expr(s"CAST($xCol AS BIGINT) div $cellSize").as("cx"),
        expr(s"CAST($yCol AS BIGINT) div $cellSize").as("cy"), v.as("v"))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("nc"), sum(c19(col("v"))).as("sc"),
        sum((c19(col("v")) * col("v")).cast("decimal(38,0)")).as("qc"))
    val agg = cells.agg(sum("nc").as("n"), sum("sc").as("t"),
      sum("qc").as("ss"), count(lit(1)).as("nCells"),
      sum(((c19(col("sc")) * col("sc")).cast("decimal(38,0)") - col("qc"))
        .cast("decimal(38,0)")).as("num"),
      sum((c19(col("nc")) * (col("nc") - 1)).cast("decimal(38,0)")).as("w"))
    val den = ((c19(col("t")) * col("t")).cast("decimal(38,0)") - col("ss"))
      .cast("decimal(38,0)")
    val nD = col("n").cast("double")
    agg.select(col("n").cast("long").as("n"),
      col("nCells").cast("long").as("n_cells"),
      col("w").cast("long").as("w_pairs"),
      when(den > 0,
        (col("num").cast("double") / den.cast("double"))
          .cast("decimal(18,9)").cast("double"))
        .otherwise(lit(null).cast("double")).as("general_g"),
      (col("w").cast("double") / (nD * (nD - 1d)))
        .cast("decimal(18,9)").cast("double").as("expected_g"))
  }

  /** Last-two-digit uniformity audit — [[benfordAudit]]'s tail-end
    * sibling: first digits obey Benford, but the CENTS of organic amounts
    * should be near-UNIFORM; humans inventing numbers overuse .00/.99/.50,
    * so a fat χ²₉₉ here is the classic fabricated-amounts flag. Reports
    * the exact χ² against uniform plus the most over-represented endings.
    *
    * EXACT: with o_d the ending counts and n = Σo, χ² = (100·Σo_d² − n²)/n
    * — the algebraic collapse keeps the numerator an exact integer
    * (DECIMAL(38,0)) with ONE final division. One 100-row margin. */
  def lastDigitUniformity(df: DataFrame, amount: Column,
                          topK: Int = 5): DataFrame = {
    val ending = pmod((amount.cast("decimal(18,2)") * 100).cast("long"), lit(100L))
    val cells = df.select(ending.as("ending"))
      .groupBy("ending").agg(count(lit(1)).as("o"))
      .localCheckpoint() // chi2 + the top-endings listing
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val chi = cells.agg(sum("o").as("n"), count(lit(1)).as("k"),
        sum((c19(col("o")) * col("o")).cast("decimal(38,0)")).as("sumSq"))
      .select(col("n"), col("k"),
        ((lit(100) * col("sumSq") - (c19(col("n")) * col("n")).cast("decimal(38,0)"))
          .cast("double") / col("n").cast("double"))
          .cast("decimal(18,6)").cast("double").as("chi2"))
    cells.crossJoin(broadcast(chi))
      .select(col("ending"), col("o").cast("long").as("n_ending"),
        col("n").cast("long").as("n"),
        (col("o").cast("double") * 100d / col("n").cast("double"))
          .cast("decimal(18,9)").cast("double").as("rel_freq_pct"),
        col("chi2"))
      .orderBy(col("n_ending").desc, col("ending"))
      .limit(topK)
  }

  /** Market-concentration scorecard per group: Herfindahl–Hirschman index
    * (Σ share² — the antitrust screen: <0.15 unconcentrated, >0.25
    * concentrated), Shannon diversity H = −Σ s·ln s, and Pielou evenness
    * H/ln(k) — the three standard readings of "is this group dominated
    * by a few categories", for source-mix / vendor-dependence audits.
    *
    * HHI is EXACT: Σ n_i² / n² is one double division of exact integers
    * (DECIMAL(38,0) numerator). Shannon quantizes each −s·ln s term to
    * DECIMAL(28,12) pre-sum (PMI recipe). One (group, category) hash
    * aggregate; everything after is category-margin-sized. */
  def concentrationProfile(df: DataFrame, groupCol: String,
                           categoryCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("grp"),
        col(categoryCol).as("cat"))
      .agg(count(lit(1)).as("c"))
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val g = cells.groupBy("grp").agg(
      count(lit(1)).as("k"), sum("c").as("n"),
      sum((c19(col("c")) * col("c")).cast("decimal(38,0)")).as("sumSq"))
    val sh = cells.join(g.select(col("grp"), col("n").as("nTot")), "grp")
      .select(col("grp"),
        (col("c").cast("double") / col("nTot").cast("double") *
          log(col("c").cast("double") / col("nTot").cast("double")) * -1d)
          .cast("decimal(28,12)").as("term"))
      .groupBy("grp").agg(sum("term").as("h"))
    g.join(sh, "grp")
      .select(col("grp"), col("k").cast("long").as("n_categories"),
        col("n").cast("long").as("n"),
        (col("sumSq").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
          .cast("decimal(18,9)").cast("double").as("hhi"),
        col("h").cast("double").cast("decimal(18,9)").cast("double").as("shannon_h"),
        when(col("k") >= 2, (col("h").cast("double") /
          log(col("k").cast("double"))).cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("evenness"))
      .orderBy("grp")
  }

  /** Interrupted time-series readout (segmented regression, the
    * changepoint-AWARE sibling of [[changepointDetect]]: that one FINDS
    * the break, this one QUANTIFIES a break you know about — a deploy, a
    * policy change, an incident): two independent exact OLS fits on the
    * daily series before/after the knot date, reporting both slopes, the
    * slope change, and the LEVEL change at the knot (post-fit minus
    * pre-fit, both evaluated at t_knot).
    *
    * FULLY EXACT: t is the day offset from the knot (so t_knot = 0 and
    * the level change is just a_post − a_pre), y is the exact daily count;
    * each segment's slope = (nΣty − ΣtΣy)/(nΣt² − (Σt)²) and intercept
    * = (ΣyΣt² − ΣtΣty)/(nΣt² − (Σt)²) are ONE division of exact integer
    * sums each (the q104 recipe). One day-grain aggregate (the only
    * row-sized shuffle) + one 2-row segment aggregate. Segments with < 2
    * days → NULL fits. */
  def interruptedSeries(events: DataFrame, tsCol: String,
                        knotDate: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(datediff(col("day"), lit(knotDate).cast("date")).cast("long").as("t"),
        col("y"))
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val seg = daily.groupBy((col("t") >= 0).as("post")).agg(
      count(lit(1)).as("n"), sum("t").as("st"), sum("y").as("sy"),
      sum((c19(col("t")) * col("t")).cast("decimal(38,0)")).as("stt"),
      sum((c19(col("t")) * col("y")).cast("decimal(38,0)")).as("sty"))
    val nD = col("n").cast("double")
    val den = nD * col("stt").cast("double") -
      col("st").cast("double") * col("st").cast("double")
    val slope = (nD * col("sty").cast("double") -
      col("st").cast("double") * col("sy").cast("double")) / den
    val icept = (col("sy").cast("double") * col("stt").cast("double") -
      col("st").cast("double") * col("sty").cast("double")) / den
    val fits = seg.select(col("post"), col("n"),
      when(col("n") >= 2 && den =!= 0d, slope).as("b"),
      when(col("n") >= 2 && den =!= 0d, icept).as("a"))
    val g = fits.agg(
      max(when(!col("post"), col("n"))).as("n_pre"),
      max(when(col("post"), col("n"))).as("n_post"),
      max(when(!col("post"), col("b"))).as("b_pre"),
      max(when(col("post"), col("b"))).as("b_post"),
      max(when(!col("post"), col("a"))).as("a_pre"),
      max(when(col("post"), col("a"))).as("a_post"))
    g.select(
      col("n_pre").cast("long").as("n_pre"), col("n_post").cast("long").as("n_post"),
      col("b_pre").cast("decimal(18,9)").cast("double").as("slope_pre"),
      col("b_post").cast("decimal(18,9)").cast("double").as("slope_post"),
      (col("b_post") - col("b_pre")).cast("decimal(18,9)").cast("double").as("slope_change"),
      // t_knot = 0 by construction, so the level change is a_post − a_pre
      (col("a_post") - col("a_pre")).cast("decimal(18,9)").cast("double").as("level_change"))
  }

  /** Median-of-means (the robust-mean estimator with actual guarantees:
    * split units into k deterministic buckets, average each, take the
    * bucket-median — one adversarial heavy tail can poison at most 1/k of
    * the buckets, so the estimate concentrates where the plain mean gets
    * dragged; Lugosi–Mendelson is the modern analysis). Buckets come from
    * the unit id's md5 hash (the q25 portable convention, low 32 bits mod
    * k) — deterministic, layout-independent, and expressible in the
    * oracle. Exact integer cent sums per bucket, ONE division per bucket
    * mean, exact middle element at odd k (no interpolation). One
    * unit-grain aggregate + a k-row fold. */
  def medianOfMeans(df: DataFrame, idCol: String, value: Column,
                    k: Int = 9): DataFrame = {
    require(k >= 3 && k % 2 == 1, "k must be odd and >= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val units = df.select(col(idCol).cast("string").as("id"),
        value.cast("decimal(18,2)").as("v"))
      .groupBy("id").agg((sum(col("v")) * 100).cast("long").as("x"))
      .as[(String, Long)]
    val bucketed = units.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, x) =>
        val m = md.digest(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L; var i = 0
        while (i < 8) { h |= (m(i) & 0xffL) << (8 * i); i += 1 }
        ((h & 0xFFFFFFFFL) % k, x)
      }
    }.toDF("bucket", "x")
    val perBucket = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
      .select(col("n"), col("s"),
        (col("s").cast("double") / col("n").cast("double") / 100d).as("m"))
    perBucket.agg(
        count(lit(1)).as("k_filled"), sum("n").as("n_units"),
        (sum("s").cast("double") / sum("n").cast("double") / 100d).as("gm"),
        percentile(col("m"), lit(0.5)).as("mom"))
      .select(col("k_filled").cast("long").as("k_buckets"),
        col("n_units").cast("long").as("n_units"),
        col("gm").cast("decimal(18,9)").cast("double").as("global_mean"),
        col("mom").cast("decimal(18,9)").cast("double").as("median_of_means"))
  }

  /** Frequent sequential patterns up to length 3 (GSP/PrefixSpan-style
    * "customers who A then B then C" mining over an event log) — the
    * ordered upgrade of [[associationRules]]' unordered co-occurrence and
    * the exhaustive complement of [[topPaths]]' literal path strings:
    * pattern support counts EVERY user with SOME occurrence order a<b<c,
    * regardless of interleaved noise events.
    *
    * Bounded-state shape, no per-user sequence materialization: a length-2
    * pattern a→b holds for a user iff min_ts(a) < max_ts(b), and a
    * length-3 pattern a→b→c holds iff SOME b-occurrence lies strictly
    * between min_ts(a) and max_ts(c) — so support needs only the per
    * (user, type) min/max frame (one aggregate over events) plus, for
    * length 3, one pass of the raw events bounded by |types|² fan-out
    * (the funnel-family contract: alphabet small, never all-history
    * pairing). Support fraction is ONE double division quantized to 9 dp;
    * the min-support cut compares quantized decimals so both engines keep
    * identical rows. The 1-row user-count frame rides a broadcast
    * (plan-contract allowlisted). Repeat patterns (a→a, a→a→a) fall out
    * of the same predicates via distinct occurrence times. */
  def sequentialPatterns(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, minSupport: Double,
                         maxUserEvents: Int = 1000): DataFrame = {
    // the timestamp rides raw (µs precision) — truncating to seconds would
    // merge distinct occurrence times and change strict-order predicates
    val ev0 = events.select(col(userCol).as("u"),
      col(tsCol).as("t"), col(typeCol).as("s"))
    // hot-actor cap (the associationRules activity-cap contract): the
    // length-3 stage fans each user's raw history out by up to |types|²,
    // so one bot-grade actor with millions of events would dominate the
    // join. Actors above the cap are excluded from the mine ENTIRELY —
    // numerator and denominator — so support still reads "share of capped
    // actors"; at the default the cap is inert on organic users and the
    // oracle applies the identical cut.
    val keep = ev0.groupBy("u").agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= maxUserEvents).select("u")
    val ev = ev0.join(keep, "u")
    val utype = ev.groupBy("u", "s").agg(min("t").as("tmin"), max("t").as("tmax"))
    val nu = ev.select("u").distinct().agg(count(lit(1)).as("__nu"))
    val p1 = utype.groupBy("s").agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("len"), col("s").as("pattern"), col("n_users"))
    val a = utype.select(col("u"), col("s").as("sa"), col("tmin").as("ta"))
    val b2 = utype.select(col("u"), col("s").as("sb"), col("tmax").as("tb"))
    val p2 = a.join(b2, "u").filter(col("ta") < col("tb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_users"))
      .select(lit(2).as("len"),
        concat_ws(">", col("sa"), col("sb")).as("pattern"), col("n_users"))
    val mid = ev.select(col("u"), col("s").as("sb"), col("t").as("tm"))
    val c3 = utype.select(col("u"), col("s").as("sc"), col("tmax").as("tc"))
    val p3 = a.join(mid, "u").filter(col("ta") < col("tm"))
      .join(c3, "u").filter(col("tm") < col("tc"))
      .select("u", "sa", "sb", "sc").distinct()
      .groupBy("sa", "sb", "sc").agg(count(lit(1)).as("n_users"))
      .select(lit(3).as("len"),
        concat_ws(">", col("sa"), col("sb"), col("sc")).as("pattern"),
        col("n_users"))
    p1.unionByName(p2).unionByName(p3)
      .crossJoin(broadcast(nu))
      .withColumn("support",
        (col("n_users").cast("double") / col("__nu").cast("double"))
          .cast("decimal(18,9)"))
      .filter(col("support") >= lit(minSupport).cast("decimal(18,9)"))
      .select(col("len"), col("pattern"), col("n_users"),
        col("support").cast("double").as("support"))
      .orderBy("len", "pattern")
  }

  /** Leave-one-out source influence on the corpus mean — training-data
    * valuation at the source grain: for each source g, how much does
    * INCLUDING g move the global mean of a metric (quality score, doc
    * length, toxicity)? Δ_g = mean(all) − mean(all ∖ g), computed exactly
    * from the same (Σ, n) pair per source — no second pass, no resampling;
    * the exact end of the ladder whose stochastic ends are [[cuped]] /
    * [[poissonBootstrapCI]]. A positive Δ means the source pulls the
    * corpus average up; rank by |Δ| to find the sources worth re-weighting
    * in [[mixBySource]].
    *
    * ONE group-grain aggregate (map-side combinable) + a 1-row broadcast
    * total (plan-contract allowlisted); exact decimal sums, one double
    * division per mean, mirrored subtraction chain, 9 dp quantization.
    * A lone source (nothing left when excluded) → NULL delta. */
  def sourceInfluence(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val v = valueCol.cast("decimal(18,6)")
    val per = df.select(col(groupCol).as("g"), v.as("v"))
      .groupBy("g").agg(sum("v").as("sg"), count(lit(1)).as("ng"))
    val tot = per.agg(sum("sg").cast("decimal(38,6)").as("__s"),
      sum("ng").as("__n"))
    per.crossJoin(broadcast(tot))
      .select(col("g").as(groupCol),
        col("ng").cast("long").as("n_rows"),
        (col("sg").cast("double") / col("ng").cast("double"))
          .cast("decimal(18,9)").cast("double").as("group_mean"),
        when(col("__n") > col("ng"),
          ((col("__s").cast("double") / col("__n").cast("double")) -
            ((col("__s") - col("sg")).cast("double") /
              (col("__n") - col("ng")).cast("double")))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("loo_delta"))
      .orderBy(groupCol)
  }

  /** Discrete-Fourier periodogram over a daily count series — "does this
    * metric have a weekly/monthly cycle, and which dominates": spectral
    * power P(k) = (C_k² + S_k²)/n at integer frequencies k = 1..maxK,
    * C/S the cos/sin projections of the series over its calendar span.
    * The frequency-domain companion of [[acf]]'s lag domain and
    * [[seasonalDecompose]]'s fixed known period — this one FINDS the
    * period.
    *
    * Scale shape: the series collapses to day grain first (one
    * aggregate), so the k-expansion (explode of a literal k-list —
    * projection, not a join) touches days × maxK rows, never raw events.
    * n is the calendar SPAN; absent days are zero counts, and because
    * Σ_{t=0}^{n−1} cos(2πkt/n) = 0 for 1 ≤ k < n, mean-centering changes
    * nothing at non-zero frequencies — C_k is simply Σ_present x_t·cosθ_t
    * with missing days contributing 0, exactly the full-grid centered
    * projection. Day indexes and the angle chain 2π·k·t/n are exact
    * integer-derived doubles (identical in both engines); cos/sin are
    * libm calls with no cross-engine bit guarantee, so each term
    * quantizes to MICRO units before its exact long sum — a sub-ulp trig
    * difference cannot survive the rounding. The 1-row bounds frame rides
    * a broadcast (plan-contract allowlisted). */
  def periodogram(df: DataFrame, tsCol: String, maxK: Int): DataFrame = {
    require(maxK >= 1 && maxK <= 64, "keep the frequency list literal-sized")
    val day = df.select(to_date(col(tsCol)).as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val bounds = day.agg(min("d").as("__d0"),
      (datediff(max("d"), min("d")) + 1).cast("long").as("__n"))
    val ks = explode(array((1 to maxK).map(lit): _*)).as("k")
    val withK = day.crossJoin(broadcast(bounds))
      .withColumn("t", datediff(col("d"), col("__d0")).cast("long"))
      .select(col("x"), col("t"), col("__n"), ks)
      // alias guard: the angle grid (and the centering-free identity
      // Σcos(2πkt/n)=0) only holds for 1 ≤ k < n — at k ≥ n the angles
      // wrap to multiples of 2π and the "power" collapses to the spurious
      // (Σx)²/n peak. Aliased frequencies emit NO row rather than a lie.
      .filter(col("k") < col("__n"))
    val ang = lit(2d * math.Pi) * col("k").cast("double") *
      col("t").cast("double") / col("__n").cast("double")
    val cTerm = round(col("x").cast("double") * cos(ang) * lit(1e6d)).cast("long")
    val sTerm = round(col("x").cast("double") * sin(ang) * lit(1e6d)).cast("long")
    withK
      .groupBy("k")
      .agg(sum(cTerm).as("cN"), sum(sTerm).as("sN"), max("__n").as("n"))
      .select(col("k"),
        (col("n").cast("double") / col("k").cast("double"))
          .cast("decimal(18,6)").cast("double").as("period_days"),
        (((col("cN").cast("double") / 1e6d) * (col("cN").cast("double") / 1e6d) +
          (col("sN").cast("double") / 1e6d) * (col("sN").cast("double") / 1e6d)) /
          col("n").cast("double"))
          .cast("decimal(18,6)").cast("double").as("power"))
      .orderBy("k")
  }

  /** Survey raking / iterative proportional fitting (Deming & Stephan
    * 1940): re-weight a biased sample so its weighted marginals match the
    * population's on TWO categorical dimensions at once — the
    * post-stratification that per-dimension weighting can't do (fixing
    * dimension A's margins un-fixes B's; IPF alternates until both
    * settle). The distributed-data version of every survey shop's
    * `rake()`, and the mix-correction step upstream of [[mixBySource]].
    *
    * Scale shape: the ONLY row-scaled work is one cell aggregate per
    * input (sample cells, population A-margin, population B-margin);
    * the fixed `iters` alternating scalings then live entirely on the
    * |A|×|B| cell table (tiny, margin joins map-side). Exactness: every
    * scaling factor is one double division quantized to DECIMAL(18,9),
    * every updated cell weight one double product quantized to
    * DECIMAL(18,6) — both engines walk identical fixed-point states, so
    * the unrolled-iteration oracle matches bit-for-bit. Cells the sample
    * never saw get no weight (the standard IPF blind spot — check
    * `weight_per_row` for explosions, the classic sign the sample
    * missed a stratum); conversely, sample cells whose category is
    * ABSENT from a population margin surface with NULL cell_weight
    * (left-joined margins) and are excluded from the fit, so callers
    * can detect out-of-frame sample categories instead of losing them. */
  def rakeWeights(sample: DataFrame, population: DataFrame,
                  aCol: String, bCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, "IPF settles in a few passes; keep the plan bounded")
    val cells = sample.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n_sample"))
    val ta = population.groupBy(col(aCol).as("a")).agg(count(lit(1)).as("ta"))
    val tb = population.groupBy(col(bCol).as("b")).agg(count(lit(1)).as("tb"))
    // LEFT joins: a sample cell whose category is ABSENT from a population
    // margin has no rakeable target — it must surface in the output with a
    // NULL cell_weight (NULL margin ⇒ NULL factor ⇒ NULL weight, and the
    // margin sums skip NULLs so it never pollutes the fit), not silently
    // vanish while the remaining weights renormalize over it
    var w = cells.join(ta, Seq("a"), "left").join(tb, Seq("b"), "left")
      .select(col("a"), col("b"), col("n_sample"), col("ta"), col("tb"),
        when(col("ta").isNotNull && col("tb").isNotNull,
          col("n_sample").cast("decimal(18,6)")).as("w"))
    for (_ <- 1 to iters) {
      val ra = w.groupBy(col("a").as("__a")).agg(sum("w").as("rs"))
      w = w.join(ra, col("a") === col("__a")).drop("__a")
        .withColumn("fa",
          (col("ta").cast("double") / col("rs").cast("double")).cast("decimal(18,9)"))
        .select(col("a"), col("b"), col("n_sample"), col("ta"), col("tb"),
          (col("w").cast("double") * col("fa").cast("double"))
            .cast("decimal(18,6)").as("w"))
      val rb = w.groupBy(col("b").as("__b")).agg(sum("w").as("cs"))
      w = w.join(rb, col("b") === col("__b")).drop("__b")
        .withColumn("fb",
          (col("tb").cast("double") / col("cs").cast("double")).cast("decimal(18,9)"))
        .select(col("a"), col("b"), col("n_sample"), col("ta"), col("tb"),
          (col("w").cast("double") * col("fb").cast("double"))
            .cast("decimal(18,6)").as("w"))
        // each pass references w TWICE (margin agg + scale join) — without
        // truncation the base scans re-execute 2^iters times; the frame is
        // cell-sized, so an eager localCheckpoint per pass is ~free
        .localCheckpoint(true)
    }
    w.select(col("a").as(aCol), col("b").as(bCol), col("n_sample"),
        col("w").cast("double").as("cell_weight"),
        (col("w").cast("double") / col("n_sample").cast("double"))
          .cast("decimal(18,6)").cast("double").as("weight_per_row"))
      .orderBy(aCol, bCol)
  }

  /** Mahalanobis outlier scoring on a 2-D metric pair — the MULTIVARIATE
    * step after [[zScoreAnomalies]]/[[madByGroup]]'s per-column views: a
    * point can be unremarkable on every axis yet far off the correlation
    * ridge (high spend with too-few orders); d² = Δᵀ Σ⁻¹ Δ measures that,
    * and d² > 5.991 is the χ²₂ 95% fence. Closed-form 2×2 inverse — no
    * iteration, no linear-algebra library.
    *
    * Two passes, both single aggregates: exact decimal power sums →
    * mean/covariance (each ONE double division, quantized 9 dp — the
    * [[regressionByGroup]] recipe), then a map-side d² per row from the
    * mirrored inverse chain quantized to 6 dp. The 1-row stats frame
    * rides a broadcast (plan-contract allowlisted); output is the top-K
    * by (d² desc, id) total order — bounded, never row-scaled.
    * Degenerate covariance (det ≤ 0 after quantization) → empty. */
  def mahalanobisOutliers(df: DataFrame, idCol: String, xCol: Column,
                          yCol: Column, topK: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      xCol.cast("decimal(18,2)").as("x"), yCol.cast("decimal(18,2)").as("y"))
    val stats = base.agg(count(lit(1)).as("__n"),
      sum("x").cast("decimal(28,2)").as("sx"), sum("y").cast("decimal(28,2)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,4)")).cast("decimal(38,4)").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,4)")).cast("decimal(38,4)").as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,4)")).cast("decimal(38,4)").as("sxy"))
    val nD = col("__n").cast("double")
    def cov(sab: Column, sa: Column, sb: Column): Column =
      ((sab.cast("double") - sa.cast("double") * sb.cast("double") / nD) /
        (nD - 1d)).cast("decimal(38,4)")
    val scored = base.crossJoin(broadcast(stats))
      .filter(col("__n") >= 3)
      .withColumn("mx", (col("sx").cast("double") / nD).cast("decimal(18,9)"))
      .withColumn("my", (col("sy").cast("double") / nD).cast("decimal(18,9)"))
      .withColumn("cxx", cov(col("sxx"), col("sx"), col("sx")))
      .withColumn("cyy", cov(col("syy"), col("sy"), col("sy")))
      .withColumn("cxy", cov(col("sxy"), col("sx"), col("sy")))
      .withColumn("det", (col("cxx").cast("double") * col("cyy").cast("double") -
        col("cxy").cast("double") * col("cxy").cast("double")).cast("decimal(38,4)"))
      .filter(col("det").cast("double") > 0d)
      .withColumn("dx", col("x").cast("double") - col("mx").cast("double"))
      .withColumn("dy", col("y").cast("double") - col("my").cast("double"))
      .withColumn("md2",
        ((col("dx") * (col("cyy").cast("double") * col("dx") -
            col("cxy").cast("double") * col("dy")) +
          col("dy") * (col("cxx").cast("double") * col("dy") -
            col("cxy").cast("double") * col("dx"))) / col("det").cast("double"))
          .cast("decimal(18,6)"))
    scored
      .orderBy(col("md2").desc, col("id"))
      .limit(topK)
      .select(col("id").as(idCol), col("x").cast("double").as("x"),
        col("y").cast("double").as("y"), col("md2").cast("double").as("md2"),
        when(col("md2").cast("double") > 5.991d, lit(1)).otherwise(lit(0))
          .as("beyond_chi2_95"))
  }

  /** Count-Min sketch build + probe estimates (Cormode & Muthukrishnan
    * 2005) — the POINT-QUERY sketch beside [[heavyHitters]]' Misra–Gries
    * top-k and [[hllSketchByGroup]]'s distinct counts: d hash rows × w
    * counters, each key incrementing one counter per row; a probe's
    * estimate is the MIN over its d counters — never an underestimate,
    * over by at most the collision mass (≈ N/w per row, amortized down
    * by the min). Constant memory at any cardinality; counters merge by
    * cell-wise addition across batches/partitions (the aggregate below
    * IS that merge).
    *
    * ONE depth-×-fan aggregate over the keys (map-side combinable; the
    * cell table is ≤ d·w rows), probes join the cell table broadcast-
    * small. Hashing is the portable md5-hex convention (q287's fold
    * recipe) so the oracle places every key in the same counter; the
    * output pairs each probe's exact count with its estimate. */
  def countMinEstimates(df: DataFrame, keyCol: String, probes: Seq[String],
                        width: Int = 64, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 8, "literal-sized sketch only")
    val spark = df.sparkSession
    import spark.implicits._
    def cellOf(key: Column, r: Column): Column =
      pmod(conv(substring(md5(concat(lit("cms"), r.cast("string"), lit(":"), key)),
        1, 8), 16, 10).cast("long"), lit(width.toLong))
    val rs = explode(array((0 until depth).map(lit): _*)).as("r")
    val cells = df.select(col(keyCol).cast("string").as("k"))
      .select(col("k"), rs)
      .select(col("r"), cellOf(col("k"), col("r")).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("n"))
    val pr = probes.toDF("probe")
      .select(col("probe"), rs)
      .select(col("probe"), col("r"), cellOf(col("probe"), col("r")).as("c"))
    val est = pr.join(cells, Seq("r", "c"), "left")
      .groupBy("probe").agg(min(coalesce(col("n"), lit(0L))).as("cms_estimate"))
    val exact = df.select(col(keyCol).cast("string").as("probe"))
      .filter(col("probe").isin(probes: _*))
      .groupBy("probe").agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("probe"), "left")
      .select(col("probe"), coalesce(col("exact"), lit(0L)).as("exact"),
        col("cms_estimate"))
      .orderBy("probe")
  }

  /** Distribution-free percentile confidence interval (order-statistic
    * bounds, normal-approximate ranks — Conover's nonparametric recipe):
    * the p-quantile's point estimate plus a CI that needs NO
    * distributional assumption, just the values at ranks
    * ⌊np − z√(np(1−p))⌋ and ⌈np + z√(np(1−p))⌉ + 1 — the error bar every
    * median dashboard should carry and almost none does.
    *
    * Ranks come from [[globalRowNumber]] (two distributed passes, no
    * single-partition window); the three target ranks derive from the
    * 1-row count frame (broadcast, plan-contract allowlisted) with the
    * rank arithmetic on exact integer-derived doubles mirrored verbatim
    * (floor/ceil agree bit-for-bit). Tied values make the rank→value map
    * ambiguous per row but the VALUE at a rank is the sorted multiset's
    * — deterministic on any engine. n < 2 → the point estimate with NULL
    * bounds clamps to the data range. */
  def percentileCI(df: DataFrame, valueCol: Column, p: Double,
                   z: Double = 1.959963985): DataFrame = {
    require(p > 0d && p < 1d, "interior percentile only")
    val ranked = globalRowNumber(
      df.select(valueCol.cast("decimal(18,2)").as("v")), Seq("v"), "rk")
    val nFrame = ranked.agg(count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    val pn = nD * lit(p)
    val sd = lit(z) * sqrt(nD * lit(p) * (lit(1d) - lit(p)))
    val withRanks = ranked.crossJoin(broadcast(nFrame))
      .withColumn("rk_lo", greatest(lit(1L), floor(pn - sd).cast("long")))
      .withColumn("rk_pt", least(col("__n"), greatest(lit(1L), ceil(pn).cast("long"))))
      .withColumn("rk_hi", least(col("__n"), (ceil(pn + sd) + 1d).cast("long")))
    withRanks
      .filter(col("rk") === col("rk_lo") || col("rk") === col("rk_pt") ||
        col("rk") === col("rk_hi"))
      .agg(max("__n").as("n"),
        min(when(col("rk") === col("rk_lo"), col("v"))).cast("double").as("ci_lo"),
        min(when(col("rk") === col("rk_pt"), col("v"))).cast("double").as("point"),
        min(when(col("rk") === col("rk_hi"), col("v"))).cast("double").as("ci_hi"))
      .select(col("n").cast("long").as("n"), lit(p).as("p"),
        col("ci_lo"), col("point"), col("ci_hi"))
  }

  /** Closed-form ridge regression on two features (Hoerl–Kennard 1970,
    * the 2-feature exact case): β = (XᵀX_c + λI)⁻¹ Xᵀ_c y over CENTERED
    * features (intercept recovered from the means), via the same 2×2
    * inverse as [[mahalanobisOutliers]]. λ > 0 keeps collinear feature
    * pairs estimable where plain OLS's determinant dies — the regularized
    * rung above [[regressionByGroup]].
    *
    * ONE aggregate of exact decimal power sums; centered scatter terms,
    * the inverse, and the β/intercept chains are mirrored double-for-
    * double and quantized 9 dp. det ≤ 0 after λ (impossible for λ > 0
    * unless degenerate input) → NULL. */
  def ridgeRegression2(df: DataFrame, x1Col: Column, x2Col: Column,
                       yCol: Column, lambda: Double): DataFrame = {
    require(lambda >= 0d, "negative ridge penalty")
    val x1 = x1Col.cast("decimal(18,4)"); val x2 = x2Col.cast("decimal(18,4)")
    val y = yCol.cast("decimal(18,2)")
    val agg = df.select(x1.as("x1"), x2.as("x2"), y.as("y")).agg(
      count(lit(1)).as("n"),
      sum("x1").cast("decimal(38,4)").as("s1"), sum("x2").cast("decimal(38,4)").as("s2"),
      sum("y").cast("decimal(38,2)").as("sy"),
      sum((col("x1") * col("x1")).cast("decimal(38,8)")).cast("decimal(38,8)").as("s11"),
      sum((col("x2") * col("x2")).cast("decimal(38,8)")).cast("decimal(38,8)").as("s22"),
      sum((col("x1") * col("x2")).cast("decimal(38,8)")).cast("decimal(38,8)").as("s12"),
      sum((col("x1") * col("y")).cast("decimal(38,6)")).cast("decimal(38,6)").as("s1y"),
      sum((col("x2") * col("y")).cast("decimal(38,6)")).cast("decimal(38,6)").as("s2y"))
    val nD = col("n").cast("double")
    def c(sab: Column, sa: Column, sb: Column): Column =
      sab.cast("double") - sa.cast("double") * sb.cast("double") / nD
    val a11 = c(col("s11"), col("s1"), col("s1")) + lit(lambda)
    val a22 = c(col("s22"), col("s2"), col("s2")) + lit(lambda)
    val a12 = c(col("s12"), col("s1"), col("s2"))
    val c1y = c(col("s1y"), col("s1"), col("sy"))
    val c2y = c(col("s2y"), col("s2"), col("sy"))
    val det = a11 * a22 - a12 * a12
    val b1 = (a22 * c1y - a12 * c2y) / det
    val b2 = (a11 * c2y - a12 * c1y) / det
    val icept = col("sy").cast("double") / nD - b1 * (col("s1").cast("double") / nD) -
      b2 * (col("s2").cast("double") / nD)
    agg.select(col("n").cast("long").as("n"), lit(lambda).as("lambda"),
      when(col("n") >= 3 && det =!= 0d, b1.cast("decimal(18,9)").cast("double")).as("beta1"),
      when(col("n") >= 3 && det =!= 0d, b2.cast("decimal(18,9)").cast("double")).as("beta2"),
      when(col("n") >= 3 && det =!= 0d, icept.cast("decimal(18,9)").cast("double")).as("intercept"))
  }

  /** Per-step funnel latency profile — the TIMING companion of
    * [[windowFunnel]]'s depth counts: for each adjacent step pair in the
    * greedy first-occurrence chain (same semantics — min ts per tier,
    * deadline fixed at step-1's window), how many users converted and the
    * exact median / p90 seconds between the steps. "Checkout is fine but
    * signup→first-view takes a day" is this table's one-glance read.
    *
    * Each tier is one filtered aggregate + an equi-join on the user (the
    * windowFunnel shape — bounded by the step list, never all-history);
    * latencies are exact integer seconds, and the percentiles quantize
    * to DECIMAL(18,4) (the q35/q43 interpolated-percentile portability
    * recipe). Steps with no converters drop out (no row). */
  def funnelStepTiming(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, steps: Seq[String],
                       windowDays: Int = 7): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    val u = col(userCol).as("u")
    var cur = events.filter(col(typeCol) === steps.head)
      .select(u, col(tsCol).as("ts"))
      .groupBy("u").agg(min("ts").as("t_cur"))
      .withColumn("deadline", col("t_cur") + expr(s"INTERVAL $windowDays DAYS"))
    val pairs = Seq.newBuilder[DataFrame]
    for ((step, i) <- steps.tail.zipWithIndex) {
      val next = events.filter(col(typeCol) === step)
        .select(u, col(tsCol).as("ts"))
        .join(cur, "u")
        .filter(col("ts") > col("t_cur") && col("ts") <= col("deadline"))
        .groupBy("u").agg(min("ts").as("t_next"), min("t_cur").as("t_prev"),
          min("deadline").as("deadline"))
      pairs += next.select(
        lit(i + 1).as("step_idx"),
        lit(s"${steps(i)}>$step").as("step"),
        (col("t_next").cast("long") - col("t_prev").cast("long")).as("lat"))
      cur = next.select(col("u"), col("t_next").as("t_cur"), col("deadline"))
    }
    pairs.result().reduce(_ unionAll _)
      .groupBy("step_idx", "step")
      .agg(count(lit(1)).as("n_converted"),
        percentile(col("lat"), lit(0.5)).cast("decimal(18,4)").cast("double")
          .as("p50_sec"),
        percentile(col("lat"), lit(0.9)).cast("decimal(18,4)").cast("double")
          .as("p90_sec"))
      .orderBy("step_idx")
  }

  /** Hodges–Lehmann shift estimator (the LOCATION companion of
    * [[Evaluation]]'s Mann–Whitney significance test): the median of all
    * n_a·n_b pairwise differences aᵢ − bⱼ — the robust, outlier-immune
    * answer to "HOW MUCH did the distribution move", where mean-difference
    * is wrecked by one whale and the test alone only says "it moved".
    * 30%-efficiency-loss-free at normality, 50% breakdown-free unlike
    * the mean (Hodges & Lehmann 1963).
    *
    * SCALE CONTRACT: the inputs must be PRE-AGGREGATED series (daily /
    * per-bucket summaries), not raw rows — the pairwise frame is
    * n_a·n_b. The operator is for the dashboard regime (two series of
    * 10²–10⁴ points → ≤10⁸ pairs, one shuffle-free broadcast cross +
    * one exact sort-based percentile); callers with raw-row inputs
    * aggregate first (the [[maxDrawdown]] daily-rollup shape).
    * Exactness: differences in exact fixed-point (caller supplies
    * integer-unit columns, e.g. cents); the median averages the two
    * middle order statistics — .0 or exactly .5 between integer units,
    * always representable, quantized DECIMAL(18,4).
    *
    * The smaller side is broadcast (the cross product never shuffles)
    * and the median comes from the two-pass distributed
    * [[globalRowNumber]] + the 1-row count frame (the [[percentileCI]]
    * shape, plan-contract allowlisted) — NOT a one-group `percentile`
    * aggregate, which funnels every pair through a single sort buffer
    * (measured 23 s → 3 s at sf0.1 for the 6.2M-pair daily example). */
  def hodgesLehmannShift(a: DataFrame, b: DataFrame, unitCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val av = a.select(col(unitCol).cast("long").as("va")).filter(col("va").isNotNull)
    val bv = b.select(col(unitCol).cast("long").as("vb")).filter(col("vb").isNotNull)
    // median of the pairwise-difference frame via the multi-pass histogram
    // refinement ([[exactGlobalMedian]], q140's no-global-sort operator):
    // the former [[globalRowNumber]] path range-sorted all n_a·n_b diffs,
    // checkpointed them, and rebuilt every row through a Row-object RDD
    // pass — ~4 s at sf0.1 for q361's 6.2M pairs vs ~2 s for the bracketed
    // passes here. Differences are exact integral doubles (cents, ≪ 2^53),
    // so the refined-order-statistic values and the two-middle average are
    // the identical .0/.5 rationals the rank filter produced.
    val diffs = av.crossJoin(broadcast(bv))
      .select((col("va") - col("vb")).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val medRow = exactGlobalMedian(diffs, "d").collect().headOption
    diffs.unpersist(false)
    // mirror the former agg-over-empty shape: one all-NULL row when there
    // are no pairs (max/sum over an empty ungrouped aggregate), and a
    // nullable schema either way (the when() keeps columns nullable)
    val raw = medRow match {
      case Some(r) => Seq((r.getLong(0), Option(r.getDouble(1)))).toDF("n", "m")
      case None => Seq((Option.empty[Long], Option.empty[Double])).toDF("n", "m")
    }
    raw.select(
      when(lit(true), col("n")).cast("long").as("n_pairs"),
      when(lit(true), col("m").cast("decimal(18,4)").cast("double")).as("hl_shift"))
  }

  /** Inter-arrival exponentiality diagnostics per event type — "is this
    * arrival process memoryless (Poisson)": if gaps are exponential the
    * median/mean ratio is ln 2 ≈ 0.693 and the coefficient of variation
    * is 1; ratio ≪ ln 2 or CV ≫ 1 means BURSTY traffic (retry storms,
    * batch jobs behind a 'user' stream) — the capacity-planning readout
    * that decides whether P99 queueing math may assume M/M/1. No exp()
    * anywhere: the test works through the ratio against the ln 2
    * LITERAL, so nothing libm-unportable crosses engines.
    *
    * Gaps are computed WITHIN each (type, user) stream — one lag window
    * per user-stream partition (scales like sessionize; a global
    * per-type lag would funnel the type into one partition), then one
    * hash aggregate per type. Gaps in exact integer micros; mean/CV
    * from scale-0 decimal power sums (squares ≤ 10²⁷ ≪ 10³⁸); median
    * interpolates .0/.5 on integers; each readout is one mirrored
    * double chain quantized 9 dp. */
  def interarrivalDiagnostics(events: DataFrame, typeCol: String,
                              userCol: String, tsCol: String,
                              idCol: String): DataFrame = {
    // idCol tie-breaks equal timestamps — a REAL column, engine-stable
    // (monotonically_increasing_id would order differently per run)
    val w = Window.partitionBy("et", "u").orderBy(col("ts_us"), col("__tb"))
    val gaps = events
      .select(col(typeCol).as("et"), col(userCol).as("u"),
        (unix_micros(col(tsCol))).as("ts_us"), col(idCol).as("__tb"))
      .withColumn("prev", lag("ts_us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("et"), (col("ts_us") - col("prev")).as("g"))
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    gaps.groupBy("et")
      .agg(count(lit(1)).as("n_gaps"),
        sum(d0(col("g"))).cast("decimal(38,0)").as("sg"),
        sum((d0(col("g")) * d0(col("g"))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sgg"),
        percentile(col("g"), lit(0.5)).as("med"))
      .select(col("et").as(typeCol),
        col("n_gaps").cast("long").as("n_gaps"),
        // NOT a decimal(18,4) cast: micros means are ~1e11, and 4 dp at
        // that magnitude is 16 significant digits — past the double→
        // decimal exactness boundary (the twap rule). round(x·1e4)/1e4
        // in integer fixed-point is the correctly-rounded rational in
        // both engines. The median stays a decimal cast: its value is
        // an exact X.0/X.5 (short mantissa), which casts exactly.
        (round(col("sg").cast("double") / col("n_gaps").cast("double") * lit(1e4d))
          .cast("long").cast("double") / lit(1e4d)).as("mean_us"),
        col("med").cast("decimal(18,4)").cast("double").as("median_us"),
        // median/mean − ln2: 0 under a memoryless exponential process
        (col("med") / (col("sg").cast("double") / col("n_gaps").cast("double"))
          - lit(0.6931471805599453d))
          .cast("decimal(18,9)").cast("double").as("memoryless_gap"),
        // CV = sample sd / mean: 1 under exponential, ≫1 bursty
        when(col("n_gaps") > 1 && col("sg") > 0,
          (sqrt((col("sgg").cast("double")
              - col("sg").cast("double") * col("sg").cast("double")
                / col("n_gaps").cast("double"))
            / (col("n_gaps").cast("double") - 1d))
            / (col("sg").cast("double") / col("n_gaps").cast("double")))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("cv"))
      .orderBy(typeCol)
  }

  /** Space-filling-curve locality audit: index every occupied grid cell
    * under BOTH the Hilbert curve (Hilbert 1891; the standard xy2d bit
    * walk) and the [[zorderKey]] Morton interleave, then measure the
    * average spatial jump |Δx|+|Δy| between CONSECUTIVE cells in each
    * curve order — the number that decides a table's layout clustering:
    * smaller jumps ⇒ adjacent files cover adjacent key ranges ⇒ range
    * predicates prune contiguous file runs. Hilbert's jump is provably
    * 1 on a full grid; Morton pays the bit-boundary teleports.
    *
    * The curve walk is LEVEL-MATERIALIZED: one projection per bit level
    * carrying (x', y', d) — expression size stays linear (an inline
    * fold quintuples the tree per level: 5⁸ nodes by bits=8), and the
    * oracle mirrors the same levels as chained CTEs. All arithmetic is
    * exact integer bit math. The jump windows are single-partition over
    * the DISTINCT CELL table — bounded by 4^bits, a layout-metadata
    * size, not data. */
  def curveLocality(points: DataFrame, xCol: Column, yCol: Column,
                    bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 12, "cell grid must stay metadata-sized")
    val n = 1L << bits
    val cells0 = points
      .select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x") >= 0 && col("x") < n && col("y") >= 0 && col("y") < n)
      .distinct()
    // Morton/z: interleave bits (x even positions, y odd)
    val z = (0 until bits).map { i =>
      (shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
    var df = cells0.withColumn("zi", z)
      .withColumn("hx", col("x")).withColumn("hy", col("y"))
      .withColumn("hd", lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      df = df
        .withColumn("rx", when(col("hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("ry", when(col("hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("hd", col("hd") + lit(s * s) * (lit(3L) * col("rx")).bitwiseXOR(col("ry")))
        .withColumn("nx",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(n - 1) - col("hy")).otherwise(col("hy")))
            .otherwise(col("hx")))
        .withColumn("ny",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(n - 1) - col("hx")).otherwise(col("hx")))
            .otherwise(col("hy")))
        .withColumn("hx", col("nx")).withColumn("hy", col("ny"))
    }
    val idx = df.select(col("x"), col("y"), col("zi"), col("hd")).localCheckpoint()
    def jumps(ord: String, curve: String): DataFrame = {
      val w = Window.orderBy(ord)
      idx.withColumn("px", lag("x", 1).over(w)).withColumn("py", lag("y", 1).over(w))
        .filter(col("px").isNotNull)
        .agg((count(lit(1)) + 1).as("n_cells"),
          sum(abs(col("x") - col("px")) + abs(col("y") - col("py"))).as("total_jump"),
          max(abs(col("x") - col("px")) + abs(col("y") - col("py"))).as("max_jump"))
        .select(lit(curve).as("curve"), col("n_cells").cast("long").as("n_cells"),
          col("total_jump").cast("long").as("total_jump"),
          col("max_jump").cast("long").as("max_jump"),
          (col("total_jump").cast("double") / (col("n_cells").cast("double") - 1d))
            .cast("decimal(18,9)").cast("double").as("avg_jump"))
    }
    jumps("hd", "hilbert").unionAll(jumps("zi", "zorder")).orderBy("curve")
  }

  /** The Kimball-shaped readout of [[scd2]]'s operator — NOT a separate
    * capability (same [[scd2Collapse]] core, SURVEY §2 counts the pair
    * as one row): versioned validity intervals with integer-micros
    * bounds (the dtype boundary), an explicit unique `seqCol` tiebreak
    * on timestamp ties (engine-stable), a version counter, and the
    * is_current flag — where [[cdcCompact]] keeps only the latest row.
    * Consecutive duplicates collapse (an unchanged re-offer is not a
    * new version: the idempotent-replay property a CDC feed needs). */
  def scd2History(changelog: DataFrame, keyCol: String, tsCol: String,
                  seqCol: String, valueCol: Column): DataFrame = {
    val rows = changelog.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("ts_us"), col(seqCol).as("sq"),
      valueCol.cast("string").as("v"))
    scd2Collapse(rows, "k", "v", Seq("ts_us", "sq"))
      .select(col("k").as(keyCol), col("v").as("value"),
        col("__version").cast("int").as("version"),
        col("ts_us").as("eff_from_us"),
        col("__to").as("eff_to_us"),
        col("__to").isNull.cast("int").as("is_current"))
      .orderBy(col(keyCol), col("version"))
  }

  /** Deming / orthogonal regression (Deming 1943; Adcock 1878 — the
    * errors-in-BOTH-variables line): OLS attenuates the slope when x is
    * noisy too (two instruments measuring the same thing, price vs
    * cost); with equal error variances the orthogonal fit
    * β = (m_yy − m_xx + √((m_yy−m_xx)² + 4m_xy²)) / (2m_xy) is the
    * closed form — the method-comparison regression.
    *
    * ONE aggregate of exact scale-0 integer power sums (caller supplies
    * integer units); centered moments, β and the intercept are one
    * mirrored double chain each (the only libm is sqrt), in nano / 1e4
    * fixed-point. m_xy = 0 (no covariance) → NULL. */
  def demingRegression(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    val agg = base.agg(count(lit(1)).as("n"),
      sum(d0(col("x"))).cast("decimal(38,0)").as("sx"),
      sum(d0(col("y"))).cast("decimal(38,0)").as("sy"),
      sum((d0(col("x")) * d0(col("x"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("sxx"),
      sum((d0(col("y")) * d0(col("y"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("syy"),
      sum((d0(col("x")) * d0(col("y"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("sxy"))
    val nD = col("n").cast("double")
    val mxx = col("sxx").cast("double") - col("sx").cast("double") *
      col("sx").cast("double") / nD
    val myy = col("syy").cast("double") - col("sy").cast("double") *
      col("sy").cast("double") / nD
    val mxy = col("sxy").cast("double") - col("sx").cast("double") *
      col("sy").cast("double") / nD
    val beta = (myy - mxx + sqrt((myy - mxx) * (myy - mxx)
      + lit(4d) * mxy * mxy)) / (lit(2d) * mxy)
    val alpha = col("sy").cast("double") / nD - beta *
      (col("sx").cast("double") / nD)
    agg.select(col("n").cast("long").as("n"),
      when(col("n") >= 2 && mxy =!= 0d,
        round(beta * lit(1e9d)).cast("long").cast("double") / lit(1e9d))
        .as("slope"),
      when(col("n") >= 2 && mxy =!= 0d,
        round(alpha * lit(1e4d)).cast("long").cast("double") / lit(1e4d))
        .as("intercept"))
  }

  /** ABC / Pareto-class analysis (the inventory-management 80/15/5
    * split): rank keys by descending value, class A = the head covering
    * the first 80% of cumulative value, B to 95%, C the tail — "which
    * 20% of parts are 80% of revenue", the allocation table beside
    * [[paretoFrontier]]'s multi-objective skyline and
    * [[concentrationProfile]]'s indices. Class boundaries are tested as EXACT
    * integer cross-products (cum·5 ≤ grand·4, cum·20 ≤ grand·19) — no
    * share division ever decides a class.
    *
    * One key aggregate, the two-pass distributed [[Evaluation.globalCumSum]] over
    * (value desc, key) — no single-partition window over the key table
    * — and one 3-row class rollup against the 1-row grand-total frame
    * (allowlisted). Ties on value order by key (total order). */
  def abcClasses(df: DataFrame, keyCol: String, unitCol: Column): DataFrame = {
    val perKey = df.select(col(keyCol).as("k"), unitCol.cast("long").as("v"))
      .groupBy("k").agg(sum("v").as("units"))
      .select(col("k"), col("units"), (-col("units")).as("neg"))
    val cum = Evaluation.globalCumSum(perKey, Seq("neg", "k"), Seq("units"))
    val grand = cum.agg(max("cum_units").as("g"), count(lit(1)).as("n_keys"))
    cum.crossJoin(broadcast(grand))
      .withColumn("cls",
        when(col("cum_units") * 5 <= col("g") * 4, lit("A"))
          .when(col("cum_units") * 20 <= col("g") * 19, lit("B"))
          .otherwise(lit("C")))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_keys"), sum("units").as("units"),
        max("g").as("g"))
      .select(col("cls").as("abc_class"),
        col("n_keys").cast("long").as("n_keys"),
        col("units").cast("long").as("units_total"),
        (round(col("units").cast("double") / col("g").cast("double") * lit(1e9d))
          .cast("long").cast("double") / lit(1e9d)).as("value_share"))
      .orderBy("abc_class")
  }

  /** Strength of trend / seasonality (Wang, Smith & Hyndman 2006; the
    * feature the forecasting literature calls F_T, F_S): from
    * [[seasonalDecompose]]'s components, F = max(0, 1 − Var(R)/Var(C+R))
    * for C = trend or seasonal — "how much of this series is structure
    * vs noise", the one-number screen that says whether a seasonal
    * model is worth fitting at all.
    *
    * Consumes the decomposition's EXACT micro-unit components (the
    * doubles recover integers via round(x·1e6) losslessly), folds
    * scale-0 integer power sums, and each strength is one mirrored
    * double chain in nano fixed-point, clamped at 0. */
  def seasonalStrength(events: DataFrame, tsCol: String): DataFrame = {
    val dec = seasonalDecompose(events, tsCol)
      .filter(col("trend").isNotNull)
      .select(round(col("residual") * lit(1e6d)).cast("long").as("r"),
        (round(col("seasonal") * lit(1e6d)).cast("long")
          + round(col("residual") * lit(1e6d)).cast("long")).as("sr"),
        (round(col("trend") * lit(1e6d)).cast("long")
          + round(col("residual") * lit(1e6d)).cast("long")).as("tr"))
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    def sums(c: String) = Seq(
      sum(d0(col(c))).cast("decimal(38,0)").as(s"s_$c"),
      sum((d0(col(c)) * d0(col(c))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as(s"ss_$c"))
    val agg = dec.agg(count(lit(1)).as("n"),
      (sums("r") ++ sums("sr") ++ sums("tr")): _*)
    val nD = col("n").cast("double")
    def varOf(c: String): Column =
      col(s"ss_$c").cast("double") - col(s"s_$c").cast("double") *
        col(s"s_$c").cast("double") / nD
    def strength(c: String): Column =
      when(col("n") >= 2 && varOf(c) > 0d,
        round(greatest(lit(0d), lit(1d) - varOf("r") / varOf(c)) * lit(1e9d))
          .cast("long").cast("double") / lit(1e9d))
        .otherwise(lit(null).cast("double"))
    agg.select(col("n").cast("long").as("n_days"),
      strength("tr").as("strength_trend"),
      strength("sr").as("strength_seasonal"))
  }

  /** Activity decay half-life per series (the log-linear survival-of-
    * engagement fit): regress ln(daily volume) on the day index and
    * report the half-life −ln2/slope — "this cohort's usage halves
    * every N days", the single number retention dashboards chase, and
    * the parametric summary beside [[Evaluation]]'s EWMA/Holt smoothers
    * (those FORECAST; this one characterizes the decay).
    *
    * One date-grain aggregate then ONE scalar fold per series: ln is
    * libm (no cross-engine bit contract) so y quantizes to integer
    * NANO units first (the weibullFit recipe); every OLS sum folds at
    * decimal scale 0 — rounding impossible — and the slope is ONE
    * integer-rounded division (nano ln-units per day). Day index =
    * days since epoch: slope is shift-invariant, so no min-date frame
    * is needed at all. Growing or flat series (slope ≥ 0) and
    * single-day series → NULL half-life. */
  def activityHalfLife(df: DataFrame, groupCol: String,
                       dateCol: Column): DataFrame = {
    val daily = df.select(col(groupCol).as("g"), dateCol.as("d"))
      .groupBy("g", "d").agg(count(lit(1)).as("x"))
      .select(col("g"),
        datediff(col("d"), lit("1970-01-01").cast("date"))
          .cast("long").as("t"),
        round(log(col("x").cast("double")) * lit(1e9d)).cast("long").as("y"))
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    val folded = daily.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(d0(col("t"))).cast("decimal(38,0)").as("sx"),
      sum(d0(col("y"))).cast("decimal(38,0)").as("sy"),
      sum((d0(col("t")) * d0(col("y"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("sxy"),
      sum((d0(col("t")) * d0(col("t"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("sxx"))
    val n38 = col("n").cast("decimal(38,0)")
    val num = (n38 * col("sxy") - (col("sx") * col("sy")).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    val den = (n38 * col("sxx") - (col("sx") * col("sx")).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    val slopeNano = round(num.cast("double") / den.cast("double")).cast("long")
    folded
      .withColumn("slope_nano",
        when(col("n") >= 2 && den > 0, slopeNano))
      .select(col("g").as(groupCol),
        col("n").cast("long").as("n_days"),
        (col("slope_nano").cast("double") / lit(1e9d)).as("slope_ln_per_day"),
        when(col("slope_nano") < 0L,
          round(lit(-0.6931471805599453d)
              / (col("slope_nano").cast("double") / lit(1e9d)) * lit(1e4d))
            .cast("long").cast("double") / lit(1e4d))
          .otherwise(lit(null).cast("double")).as("half_life_days"))
      .orderBy(groupCol)
  }

  /** Day-of-week percentile envelope + freshest-value position ("is
    * today's volume normal FOR A TUESDAY"): per (series, weekday), the
    * p10/p50/p90 band of daily volumes and whether the latest observed
    * day of that weekday runs outside the band — the calendar-aware
    * upgrade of [[xmrChart]]'s flat limits (weekly seasonality would
    * light XmR up every weekend).
    *
    * Weekday from pure integer date math ((days since a known Monday)
    * mod 7 — Spark's dayofweek and DuckDB's disagree on anchoring, the
    * epoch arithmetic cannot). One date-grain aggregate + one
    * (series, dow) percentile aggregate; latest value via max_by on
    * the unique date key (deterministic); exact integer counts, the
    * funnel-timing interpolated-percentile recipe at 4 dp. */
  def dowEnvelope(df: DataFrame, groupCol: String, dateCol: Column): DataFrame = {
    val daily = df.select(col(groupCol).as("g"), dateCol.as("d"))
      .groupBy("g", "d").agg(count(lit(1)).as("x"))
      .withColumn("dow",
        pmod(datediff(col("d"), lit("1970-01-05").cast("date")), lit(7))
          .cast("int"))
    daily.groupBy("g", "dow")
      .agg(count(lit(1)).as("n_days"),
        percentile(col("x"), lit(0.1)).cast("decimal(18,4)").cast("double").as("p10"),
        percentile(col("x"), lit(0.5)).cast("decimal(18,4)").cast("double").as("p50"),
        percentile(col("x"), lit(0.9)).cast("decimal(18,4)").cast("double").as("p90"),
        max_by(col("x"), col("d")).cast("long").as("last_value"))
      .select(col("g").as(groupCol), col("dow"),
        col("n_days").cast("long").as("n_days"),
        col("p10"), col("p50"), col("p90"), col("last_value"),
        (col("last_value").cast("double") > col("p90")
          || col("last_value").cast("double") < col("p10")).cast("int").as("beyond"))
      .orderBy(col(groupCol), col("dow"))
  }

  /** XmR individuals control chart (Shewhart 1931; Wheeler's
    * "Understanding Variation" recipe): natural process limits
    * mean ± 2.66·mean(moving range) per series, plus how many days run
    * beyond them — the SPC lens that separates routine variation from
    * signal without assuming any distribution, where [[Evaluation]]'s
    * CUSUM detects sustained shifts and Grubbs single spikes. 2.66 is
    * the d₂-derived constant for n=2 subgroups (3/1.128).
    *
    * One date-grain pre-aggregate, one lag window per series (O(1)
    * state), one limits aggregate, then ONE series-keyed join back to
    * count exceedances — day-grain tables throughout. Counts exact;
    * center/mr_bar/limits in round(x·1e4)/1e4 fixed-point (counts at
    * 100 TB reach 1e10/day — decimal casts of such doubles ulp-flip;
    * ·1e4 keeps everything < 2^53). A series observed on a SINGLE day
    * has no moving ranges: it still gets its row (center = the one
    * value, NULL mr_bar/unpl/lnpl, n_beyond 0). */
  def xmrChart(df: DataFrame, groupCol: String, dateCol: Column): DataFrame = {
    val daily = df.select(col(groupCol).as("g"), dateCol.as("d"))
      .groupBy("g", "d").agg(count(lit(1)).as("x"))
      .localCheckpoint() // limits pass + exceedance pass
    val wl = Window.partitionBy("g").orderBy("d")
    val mr = daily.withColumn("pv", lag("x", 1).over(wl))
      .filter(col("pv").isNotNull)
      .select(col("g"), abs(col("x") - col("pv")).as("mr"))
    val fx = (c: Column) =>
      round(c * lit(1e4d)).cast("long").cast("double") / lit(1e4d)
    // LEFT join: a series observed on a single day has no moving-range
    // rows — it must still appear in the output (NULL mr_bar/limits,
    // n_beyond 0), not silently vanish from the per-series report
    val limits = daily.groupBy("g")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"))
      .join(mr.groupBy("g").agg(count(lit(1)).as("nmr"), sum("mr").as("smr")),
        Seq("g"), "left")
      .select(col("g"), col("n_days"),
        fx(col("sx").cast("double") / col("n_days").cast("double")).as("center"),
        fx(col("smr").cast("double") / col("nmr").cast("double")).as("mr_bar"))
      .withColumn("unpl", fx(col("center") + lit(2.66d) * col("mr_bar")))
      .withColumn("lnpl", fx(col("center") - lit(2.66d) * col("mr_bar")))
    daily.join(limits, "g")
      .groupBy("g")
      .agg(max("n_days").as("n_days"), max("center").as("center"),
        max("mr_bar").as("mr_bar"), max("unpl").as("unpl"), max("lnpl").as("lnpl"),
        count(when(col("x").cast("double") > col("unpl")
          || col("x").cast("double") < col("lnpl"), lit(1))).as("n_beyond"))
      .select(col("g").as(groupCol), col("n_days").cast("long").as("n_days"),
        col("center"), col("mr_bar"), col("unpl"), col("lnpl"),
        col("n_beyond").cast("long").as("n_beyond"))
      .orderBy(groupCol)
  }

  /** Quantile treatment effects (Koenker–Bassett framing, the decile
    * ladder): at p = .1 … .9, the difference between the two groups'
    * exact interpolated quantiles — the DISTRIBUTIONAL readout the
    * [[Evaluation]] abTest mean hides ("the median user moved +2%, the
    * p90 whale −15%"). One ordered-set aggregate per group (both in a
    * single conditional-agg pass), quantiles over exact integer units;
    * every interpolation is the funnel-timing percentile recipe
    * (mirrored lo + g·(hi−lo)), quantized 4 dp before the subtraction
    * so the effect column is a difference of exact decimals. */
  def quantileTreatmentEffect(df: DataFrame, treatedCond: Column,
                              unitCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(treatedCond.cast("int").as("t"),
      unitCol.cast("long").as("v")).filter(col("v").isNotNull)
      .localCheckpoint() // nine percentile probes ride one cached frame
    val ps = (1 to 9).map(_ / 10.0)
    val agg = base.agg(
      count(when(col("t") === 1, lit(1))).as("n_treated"),
      count(when(col("t") === 0, lit(1))).as("n_control"),
      array(ps.map(p => percentile(when(col("t") === 1, col("v")), lit(p))
        .cast("decimal(18,4)")): _*).as("qt"),
      array(ps.map(p => percentile(when(col("t") === 0, col("v")), lit(p))
        .cast("decimal(18,4)")): _*).as("qc"))
    val pdf = ps.zipWithIndex.map { case (p, i) => (p, i + 1) }.toDF("p", "__i")
    agg.crossJoin(broadcast(pdf))
      .select(col("p"),
        col("n_treated").cast("long").as("n_treated"),
        col("n_control").cast("long").as("n_control"),
        element_at(col("qt"), col("__i")).cast("double").as("q_treated"),
        element_at(col("qc"), col("__i")).cast("double").as("q_control"),
        (element_at(col("qt"), col("__i")) - element_at(col("qc"), col("__i")))
          .cast("double").as("qte"))
      .orderBy("p")
  }

  /** Maximum drawdown per series — the risk lens on any cumulative
    * metric (equity curve, cumulative net revenue, SLO error budget):
    * the deepest peak-to-trough fall of the running total, plus when it
    * bottomed and whether the series ever recovered to the old peak.
    * The time-domain sibling of [[Evaluation]]'s CUSUM: CUSUM asks "did
    * the level shift", drawdown asks "what was the worst sustained
    * loss an observer living through the series experienced".
    *
    * One date-grain pre-aggregate (map-side combinable), then ONE
    * window pass per series (running sum + running max — O(1) frame
    * state), then one hash aggregate. All money math is exact
    * DECIMAL(38,2); no doubles anywhere. Drawdown at the first row is
    * 0 by construction (peak = cum). Trough ties resolve to the
    * EARLIEST date (min over the max-drawdown rows). `recovered` is
    * whether the running total ever re-touched the pre-trough peak
    * after the trough — computed order-free as: the global max cum at
    * or after the trough date ≥ the peak at the trough. */
  def maxDrawdown(df: DataFrame, groupCol: String, dateCol: Column,
                  valueCol: Column): DataFrame = {
    val daily = df.select(col(groupCol).as("g"), dateCol.as("d"),
        valueCol.cast("decimal(18,2)").as("v"))
      .groupBy("g", "d").agg(sum("v").cast("decimal(38,2)").as("dv"))
    val wRun = Window.partitionBy("g").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cum first, then peak = running max OF the materialized cum column
    // (two frames, ONE shuffle+sort — same partitioning, Spark stacks them)
    val curve = daily
      .withColumn("cum", sum("dv").over(wRun).cast("decimal(38,2)"))
      .withColumn("peak", max(col("cum")).over(wRun).cast("decimal(38,2)"))
      .withColumn("dd", (col("peak") - col("cum")).cast("decimal(38,2)"))
      .localCheckpoint() // referenced twice (trough lookup + final fold)
    val trough = curve.groupBy(col("g").as("gg")).agg(max("dd").as("max_dd"))
      .join(curve, col("gg") === col("g") && col("dd") === col("max_dd"))
      .groupBy("gg").agg(min("d").as("trough_d"))
    curve.join(trough, col("g") === col("gg")).drop("gg")
      .groupBy("g")
      .agg(count(lit(1)).as("n_points"),
        max("dd").as("max_drawdown"),
        max("trough_d").as("trough_date"),
        max(when(col("d") === col("trough_d"), col("peak"))).as("peak_at_trough"),
        max(when(col("d") >= col("trough_d"), col("cum"))).as("max_after"))
      .select(col("g").as(groupCol),
        col("n_points").cast("long").as("n_points"),
        // engine boundary: decimals leave as double (exact ≤ 2 dp money
        // magnitudes), dates as ISO strings (the harness dtype contract)
        col("max_drawdown").cast("decimal(18,2)").cast("double").as("max_drawdown"),
        col("trough_date").cast("string").as("trough_date"),
        col("peak_at_trough").cast("decimal(18,2)").cast("double").as("peak_at_trough"),
        (col("max_after") >= col("peak_at_trough")).cast("int").as("recovered"))
      .orderBy(groupCol)
  }
}
