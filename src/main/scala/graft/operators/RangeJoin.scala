package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows whose point column falls inside
  * [start, end) of an intervals table.
  *
  * Spark has no native inequality-join operator — a naive
  * `f.join(i, f("ts") >= i("start") && f("ts") < i("end"))` plans as a
  * BroadcastNestedLoopJoin (all-pairs per partition): quadratic, and the
  * classic 100 TB cliff. This implementation buckets time at a caller-chosen
  * granularity: intervals explode to the buckets they cover, points map to
  * exactly ONE bucket, and the match becomes a hash EQUI-join on the bucket
  * key followed by the exact containment filter. Each (point, interval) pair
  * meets in exactly one bucket, so no dedup pass is needed.
  *
  * Cost: the interval side grows by ×(avg interval length / granularity) —
  * pick granularity near the typical interval length so the blowup is a
  * small constant; the fact side never duplicates and never shuffles more
  * than a plain equi-join would.
  */
object RangeJoin {

  /** Join `points` (with `tsCol`, seconds-precision timestamp) to
    * `intervals` (with `startCol`/`endCol`, end exclusive) on containment.
    * `bucketSeconds` is the bucketing granularity. Output: all point columns
    * + all interval columns. */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    // cast-to-long = epoch seconds; works for timestamp and timestamp_ntz
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    val b = lit(bucketSeconds)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(secs(col(startCol)) / b),
                       floor((secs(col(endCol)) - 1) / b))))
    val pt = points.withColumn("__bucket", floor(secs(col(tsCol)) / b))
    pt.join(iv, "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join ([start,end) semantics): both sides
    * explode to their covered buckets and hash-join on the bucket — but an
    * overlapping pair shares MANY buckets, so emitting every collision would
    * need a dedup shuffle afterwards. Instead each pair is emitted only in
    * its canonical bucket — the first bucket both intervals cover,
    * max(bucket(aStart), bucket(bStart)) — which every overlapping pair
    * shares exactly once. Zero dedup, exactly-once, still a pure equi-join.
    * Left columns are suffixed `_a`, right `_b`. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketSeconds: Long): DataFrame = {
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    val b = lit(bucketSeconds)
    def withBuckets(df: DataFrame, s: String, e: String, suffix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix))
      renamed
        .withColumn("__first" + suffix, floor(secs(col(s + suffix)) / b))
        .withColumn("__bucket",
          explode(sequence(floor(secs(col(s + suffix)) / b),
                           floor((secs(col(e + suffix)) - 1) / b))))
    }
    withBuckets(left, lStart, lEnd, "_a")
      .join(withBuckets(right, rStart, rEnd, "_b"), "__bucket")
      .where(col(lStart + "_a") < col(rEnd + "_b") &&
             col(rStart + "_b") < col(lEnd + "_a") &&
             col("__bucket") === greatest(col("__first_a"), col("__first_b")))
      .drop("__bucket", "__first_a", "__first_b")
  }

  /** Keyed temporal (SCD2) lookup: enrich each fact row with the dimension
    * version valid at its timestamp — key equality plus
    * `from ≤ ts < to` (open current version: `to` null) — the standard
    * warehouse "as the customer WAS when the order happened" join, and the
    * keyed sibling of [[pointInInterval]] (which buckets because it has no
    * key).
    *
    * No bucketing needed here: the key carries the join (one hash-join
    * shuffle, broadcastable dim), the validity predicate is a residual
    * condition over the handful of versions per key. [[Analytics.scd2]]'s
    * histories make at most one version match (intervals per key are
    * disjoint; zero-length versions match nothing), so the left join
    * never duplicates facts. */
  def scd2Lookup(fact: DataFrame, factKey: String, tsCol: String,
                 dim: DataFrame, dimKey: String, fromCol: String,
                 toCol: String): DataFrame = {
    val d = dim.columns.foldLeft(dim)((x, c) => x.withColumnRenamed(c, s"__d_$c"))
    fact.join(d,
      col(factKey) === col(s"__d_$dimKey") &&
        col(tsCol) >= col(s"__d_$fromCol") &&
        (col(s"__d_$toCol").isNull || col(tsCol) < col(s"__d_$toCol")),
      "left")
      .drop(s"__d_$dimKey")
  }

  /** Grid-blocked proximity (distance) self-join: all point pairs within
    * Euclidean `radius` of each other, integer coordinates. The spatial
    * analog of [[pointInInterval]]'s bucketing: an all-pairs distance join
    * is the textbook 100 TB cliff (BroadcastNestedLoopJoin), so points map
    * to a square grid cell of side = `radius`; a pair within `radius` can
    * then only meet when one point's 3×3 cell neighborhood covers the
    * other's home cell. One side replicates ×9 with neighbor offsets, the
    * other keeps its single home cell, and the match is a hash EQUI-join on
    * the cell key + the exact integer distance filter. Each unordered pair
    * meets exactly once (the right side's home cell is unique), so no dedup
    * pass. Coordinates and radius share one integer unit (micro-degrees,
    * metres — caller's choice); distances compare as dx²+dy² ≤ r² in
    * BIGINT, so membership is exact on any engine — no trig, no epsilon.
    *
    * Scale shape: ×9 replication is a constant; the shuffle is cell-keyed
    * (spatially uniform data ⇒ uniform partitions; a hot cell is a data
    * hotspot AQE's skew split handles); per-cell work is |cell|·|cell|
    * bounded by density × radius², the caller's physical knob. */
  def gridProximityJoin(points: DataFrame, idCol: String,
                        xCol: String, yCol: String, radius: Long): DataFrame = {
    val r = lit(radius)
    val home = points.select(col(idCol).as("id_b"), col(xCol).as("xb"),
      col(yCol).as("yb"),
      floor(col(xCol) / r).as("cx"), floor(col(yCol) / r).as("cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val probe = points.select(col(idCol).as("id_a"), col(xCol).as("xa"),
        col(yCol).as("ya"), explode(offsets).as("o"))
      .select(col("id_a"), col("xa"), col("ya"),
        (floor(col("xa") / r) + col("o.dx")).as("cx"),
        (floor(col("ya") / r) + col("o.dy")).as("cy"))
    probe.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2").cast("long").as("dist2"))
      .orderBy("id_a", "id_b")
  }

  /** Nearest-hub assignment by great-circle (haversine) distance — route
    * every point to the closest of a SMALL fixed hub set (regions,
    * datacenters, depots) and report per-hub load. The geo companion of
    * [[gridProximityJoin]]: that op finds point–point pairs; this one is
    * the point–dimension k=1 classification, and because the hub side is
    * constant-sized it broadcasts — the point side fans out ×|hubs|
    * map-side, the argmin is a `min(struct(...))` hash aggregate (never a
    * window), and per-hub stats partial-aggregate before the only shuffle.
    *
    * Exactness: the haversine chain (radians → sin/cos → asin → ×2R) runs
    * in double and is mirrored verbatim in the oracle, but sin/cos/asin
    * are libm calls with no cross-engine bit guarantee — so the distance
    * is quantized to DECIMAL(18,1) km (0.1 km — 12 orders of magnitude
    * above the ~1e-10 km double noise) BEFORE both the argmin comparison
    * and the stats, and the argmin tie-breaks on hub name through the
    * struct ordering, making assignment engine-stable. */
  def haversineNearestHub(points: DataFrame, idCol: String,
                          latCol: String, lonCol: String,
                          hubs: Seq[(String, Double, Double)]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val hubDf = hubs.toDF("hub", "h_lat", "h_lon")
    val earthR2 = 2d * 6371d
    def rad(c: Column) = radians(c)
    val sdLat = sin((rad(col("h_lat")) - rad(col("lat"))) / 2d)
    val sdLon = sin((rad(col("h_lon")) - rad(col("lon"))) / 2d)
    val h = sdLat * sdLat + cos(rad(col("lat"))) * cos(rad(col("h_lat"))) * sdLon * sdLon
    val distKm = (lit(earthR2) * asin(sqrt(h))).cast("decimal(18,1)")
    points.select(col(idCol).as("id"),
        col(latCol).cast("double").as("lat"), col(lonCol).cast("double").as("lon"))
      .crossJoin(broadcast(hubDf))
      .select(col("id"), struct(distKm.as("d"), col("hub")).as("cand"))
      .groupBy("id").agg(min("cand").as("best"))
      .groupBy(col("best.hub").as("hub"))
      .agg(count(lit(1)).as("n_points"),
        max(col("best.d")).cast("double").as("max_km"),
        (sum(col("best.d")).cast("double") / count(lit(1)).cast("double"))
          .cast("decimal(18,6)").cast("double").as("avg_km"))
      .orderBy("hub")
  }
}
