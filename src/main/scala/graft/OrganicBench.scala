package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Organic-growth datapoint for the iterative graph family (the round-8
  * ordered follow-up to BENCH_sf1.md): the sf1 decade-up ratios for
  * q240/q231/q139 were measured on a key-offset REPLICATION of sf0.1 where
  * dimensions stay 1× — every copy repeats the same part baskets, so
  * co-occurrence pair WEIGHTS multiply ×copies and the w≥2 support floor
  * admits pairs it would organically reject (q240 read 4.2×, the worst in
  * the table, with exactly this annotation attached).
  *
  * This main grows the workload ORGANICALLY instead. Baskets come from the
  * `synthdocs` DataSourceV2 (every row a pure function of row id — no
  * files, no replication artifact): each doc is a basket of `itemsPerBasket`
  * deterministic xxhash64 draws from an item universe that scales WITH the
  * corpus (TPC-H's own organic shape: sf10 has 10× parts as well as 10×
  * orders — mirrored here as U = baskets/7.5, the sf0.1 orders:parts
  * ratio). The q240/q231/q139 operator chain is reproduced verbatim from
  * SparkEntry (sorted distinct items → a<b pair explode → pair counts →
  * w≥2 floor → symmetrize where the query does) and timed at 1× and 10×,
  * twice each, min taken; kept-edge counts at both scales quantify the
  * densification directly.
  *
  * Usage: runMain graft.OrganicBench [baskets1x]  (default 150000 — the
  * sf0.1 orders count).
  */
object OrganicBench {
  private val ItemsPerBasket = 7

  /** The SparkEntry co-occurrence recipe over synthdocs baskets: one
    * map-side-combined shuffle to the basket's sorted distinct item set,
    * pair explode map-side, then the support floor. */
  private def supportedEdges(ss: SparkSession, baskets: Long): DataFrame = {
    val universe = math.max(100L, baskets * 2 / 15) // baskets / 7.5
    val docs = ss.read.format("synthdocs")
      .option("rows", baskets).option("partitions", 32).load()
    val items = docs.select(col("doc_id"),
      explode(sequence(lit(1), lit(ItemsPerBasket))).as("j"))
      .select(col("doc_id").as("k"),
        pmod(xxhash64(col("doc_id"), col("j")), lit(universe)).as("item"))
    items.groupBy("k")
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "pa")), col("ps"))
      .select(col("pa"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select("pa", "pb")
  }

  def main(args: Array[String]): Unit = {
    val baskets1x = args.headOption.map(_.toLong).getOrElse(150000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "5000")
      .config("spark.sql.ui.retainedExecutions", "30")
      .config("spark.cleaner.periodicGC.interval", "120s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // the three iterative consumers, operator chains verbatim from SparkEntry
    val ops: Seq[(String, (SparkSession, Long) => DataFrame)] = Seq(
      "ppr" -> ((ss, n) => {
        val e = supportedEdges(ss, n)
        Graph.personalizedPageRank(
          e.unionAll(e.select(col("pb").as("pa"), col("pa").as("pb"))),
          "pa", "pb", Seq(1L, 2L))
      }),
      "eigencentrality" -> ((ss, n) =>
        Graph.eigenCentrality(supportedEdges(ss, n), "pa", "pb")),
      "label_prop" -> ((ss, n) =>
        Graph.labelPropagation(supportedEdges(ss, n), "pa", "pb")),
      // the one-shot link-prediction consumers of the same w>=2 graph
      // (q238 / q299): their sf1-replication ratios read 30x / 24x because
      // the floor admits ALL 1.2M raw pairs there (every weight x10) —
      // organic growth holds the kept-edge set ~constant instead
      "neighbor_jaccard" -> ((ss, n) =>
        Graph.neighborJaccard(supportedEdges(ss, n), "pa", "pb", minCommon = 1)),
      "adamic_adar" -> ((ss, n) =>
        Graph.adamicAdar(supportedEdges(ss, n), "pa", "pb")))

    def timeOnce(fn: (SparkSession, Long) => DataFrame, n: Long): Double = {
      val ss = spark.newSession()
      val t0 = System.nanoTime()
      fn(ss, n).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
      System.gc()
      s
    }

    val kept1 = supportedEdges(spark.newSession(), baskets1x).count()
    val kept10 = supportedEdges(spark.newSession(), baskets1x * 10).count()
    println(s"[organic] baskets ${baskets1x} -> ${baskets1x * 10} (10x), " +
      s"universe ${baskets1x * 2 / 15} -> ${baskets1x * 10 * 2 / 15}, " +
      s"kept w>=2 edges: $kept1 -> $kept10 " +
      f"(${kept10.toDouble / math.max(1, kept1)}%.2fx)")
    println("| operator | 1x s | 10x s | ratio |")
    println("|---|---|---|---|")
    ops.foreach { case (name, fn) =>
      val s1 = math.min(timeOnce(fn, baskets1x), timeOnce(fn, baskets1x))
      val s10 = math.min(timeOnce(fn, baskets1x * 10), timeOnce(fn, baskets1x * 10))
      println(f"| $name | $s1%.2f | $s10%.2f | ${s10 / s1}%.1f |")
    }
    spark.stop()
  }
}
