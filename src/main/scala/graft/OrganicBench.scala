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

/** Organic-growth datapoint for the RAW-graph one-shot family (the
  * round-10 verdict's item 4): q133 triangles (and q300 harmonic) consume
  * [[SparkEntry]]'s UNFLOORED part co-occurrence graph, so OrganicBench's
  * w≥2 evidence doesn't cover them — their sf1 story rested on key-offset
  * replication plus the degree-orientation bound. This main grows the raw
  * basket graph ORGANICALLY (the OrganicBench corpus shape verbatim:
  * synthdocs baskets of 7 xxhash64 items from a universe that scales with
  * the corpus, U = baskets/7.5 — TPC-H's own sf-growth shape) and records
  * the quantities the orientation bound is ABOUT:
  *   - edges m (distinct undirected), nodes n;
  *   - wedges W = Σ_u C(outdeg(u), 2) under the operator's own (deg, id)
  *     low→high orientation — the exact pre-Bloom closing-join input size
  *     (Suri–Vassilvitskii / Schank's bound: Σ min-deg, NOT Σ deg² — under
  *     organic growth per-item degree is ~constant, so W should scale ~m,
  *     not quadratically);
  *   - total triangles (closed wedges) and wall for the verbatim q133
  *     chain (Graph.triangleCounts), 1× and 10×, min of 2.
  *
  * Usage: runMain graft.OrganicTriangleBench [baskets1x]  (default 150000
  * — the sf0.1 orders count, so 1× matches q133's real workload scale).
  */
object OrganicTriangleBench {
  private val ItemsPerBasket = 7

  /** OrganicBench's basket recipe WITHOUT the support floor — the raw
    * pair-explode shape partCooccurrenceEdges feeds q133 (dup pairs kept;
    * triangleCounts distincts internally, exactly as in production). */
  private[graft] def rawEdges(ss: SparkSession, baskets: Long): DataFrame = {
    val universe = math.max(100L, baskets * 2 / 15) // baskets / 7.5
    val docs = ss.read.format("synthdocs")
      .option("rows", baskets).option("partitions", 32).load()
    docs.select(col("doc_id"),
        explode(sequence(lit(1), lit(ItemsPerBasket))).as("j"))
      .select(col("doc_id").as("k"),
        pmod(xxhash64(col("doc_id"), col("j")), lit(universe)).as("item"))
      .groupBy("k")
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "pa")), col("ps"))
      .select(col("pa"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("pb"))
  }

  /** (nodes, edges, wedges) under the operator's own orientation. */
  private def graphShape(ss: SparkSession, baskets: Long): (Long, Long, Long) = {
    val und = rawEdges(ss, baskets).select(
        least(col("pa"), col("pb")).as("a"), greatest(col("pa"), col("pb")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = und.count()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val nNodes = deg.count()
    val ranked = und
      .join(deg.select(col("n").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("deg_b")), "b")
    val aIsLo = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val wedges = ranked
      .select(when(aIsLo, col("a")).otherwise(col("b")).as("lo"))
      .groupBy("lo").agg(count(lit(1)).as("od"))
      // integer arithmetic throughout: `/ 2` would promote to double and
      // lose exactness on large wedge counts — od·(od−1) is always even
      .select(sum(col("od") * (col("od") - 1)).as("w2"))
      .collect()(0).getLong(0) / 2
    und.unpersist(false)
    (nNodes, m, wedges)
  }

  def main(args: Array[String]): Unit = {
    val baskets1x = args.headOption.map(_.toLong).getOrElse(150000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "120s")
      // same single-JVM-pause insurance as OrganicDedupBench's 1000× leg:
      // a full GC on a tens-of-GB heap can outlast the default heartbeat
      // window, and the HeartbeatReceiver then kills the local "executor"
      // mid-measurement; ride the pause out and charge it to the wall
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "30s")
      // triangleCounts sizes its wedge-pruning Bloom sketch at ~10
      // bits/edge, clamped by this conf (default 2^26 ≈ 6.7M edges); its
      // scaladoc says to raise the clamp past that — the 10× leg's raw
      // graph carries ~31M edges, where the default clamp's degraded fpp
      // floods the closing join. 2^30 bits = 128 MB, covering ~107M
      // edges; the 1× leg requests ~31M bits either way (no change).
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (1L << 30).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def timeOnce(n: Long): Double = {
      val ss = spark.newSession()
      val t0 = System.nanoTime()
      Graph.triangleCounts(rawEdges(ss, n), "pa", "pb")
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
      System.gc()
      s
    }
    def triangleTotal(n: Long): Long = {
      val ss = spark.newSession()
      val t = Graph.triangleCounts(rawEdges(ss, n), "pa", "pb")
        .select(sum(col("triangles")).as("t")).collect()(0).getLong(0)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
      System.gc()
      t / 3 // each triangle counted once per corner
    }

    Seq(baskets1x, baskets1x * 10).foreach { n =>
      val (nodes, m, w) = graphShape(spark.newSession(), n)
      val tri = triangleTotal(n)
      // same floor as rawEdges' universe — the bare n*2/15 would misreport
      // the corpus shape for tiny basket counts (<750)
      println(s"[organic-tri] baskets $n universe ${math.max(100L, n * 2 / 15)}: " +
        s"nodes $nodes, edges $m, oriented_wedges $w, triangles $tri " +
        f"(wedges/edge ${w.toDouble / math.max(1, m)}%.1f)")
    }
    println("| chain | 1x s | 10x s | ratio |")
    println("|---|---|---|---|")
    val s1 = math.min(timeOnce(baskets1x), timeOnce(baskets1x))
    val s10 = math.min(timeOnce(baskets1x * 10), timeOnce(baskets1x * 10))
    println(f"| q133_triangles | $s1%.2f | $s10%.2f | ${s10 / s1}%.1f |")
    spark.stop()
  }
}

/** Organic-growth datapoint for the MS-BFS family (q300 harmonic
  * centrality; q224 bounded BFS shares the hop shape): the last raw-graph
  * consumer whose scale story rested on sf1 key-offset replication.
  * [[Graph.harmonicCentrality]]'s cost model is per hop ONE join of the
  * symmetrized adjacency (2m rows) against the bit-mask frontier plus a
  * bit_or aggregate — Σ_hop |adjacency rows incident to the frontier|
  * ≤ 2m·maxHops, i.e. LINEAR in edges regardless of how the frontier
  * saturates (on a small-world graph it is node-sized by hop 2). Under
  * organic growth (the [[OrganicTriangleBench]] basket recipe verbatim:
  * 7-item baskets, universe = baskets/7.5) edges grow ~10× for 10×
  * baskets, so wall should read ~linear-in-m — the 100 TB feasibility
  * claim this bench measures. Reach accounting (Σ n_reached over the
  * 6-source / 3-hop run) is reported alongside so the two scales'
  * workloads are comparable as WORK, not just wall.
  *
  * Usage: runMain graft.OrganicHarmonicBench [baskets1x] (default 150000
  * — the sf0.1 orders count, so 1× matches q300's real workload scale).
  */
object OrganicHarmonicBench {
  def main(args: Array[String]): Unit = {
    val baskets1x = args.headOption.map(_.toLong).getOrElse(150000L)
    // optional 2nd arg: comma-separated growth multipliers (default the
    // recorded 1,10 ladder). "150000 1,100" runs the second-decade leg
    // with its 1× anchor; ≥100× legs time ONCE, not min-of-2 (a
    // minutes-long pass's second run measures page-cache luck, not the
    // operator — the OrganicDedupBench rule).
    val mults: Seq[Long] = args.drop(1).headOption
      .map(_.split(',').toSeq.map(_.trim.toLong)).getOrElse(Seq(1L, 10L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "120s")
      // same single-JVM-pause insurance as the other organic rigs
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val sources = Seq(1L, 2L, 3L, 4L, 5L, 6L) // q300's pinned sample
    def harmonic(ss: SparkSession, n: Long) =
      Graph.harmonicCentrality(
        OrganicTriangleBench.rawEdges(ss, n), "pa", "pb", sources, maxHops = 3)

    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def timeOnce(n: Long): Double = {
      val ss = spark.newSession()
      val t0 = System.nanoTime()
      harmonic(ss, n).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      hygiene(); s
    }

    mults.foreach { m =>
      val n = baskets1x * m
      val ss = spark.newSession()
      val und = OrganicTriangleBench.rawEdges(ss, n).select(
          least(col("pa"), col("pb")).as("a"), greatest(col("pa"), col("pb")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = und.count()
      val nodes = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
        .distinct().count()
      und.unpersist(false)
      val reach = harmonic(ss, n)
        .agg(sum(col("n_reached")).as("r"), count(lit(1)).as("k"))
        .collect()(0)
      hygiene()
      println(s"[organic-bfs] baskets $n: nodes $nodes, edges $edges, " +
        s"reached_nodes ${reach.getLong(1)}, src_node_pairs ${reach.getLong(0)} " +
        s"(sources ${sources.size}, hops 3)")
    }
    val header = mults.tail.flatMap(m => Seq(s"${m}x s", s"${m}x/1x"))
    println(("| chain | 1x s" +: header).mkString("", " | ", " |"))
    println("|---" * (2 + header.size) + "|")
    val s1 = math.min(timeOnce(baskets1x), timeOnce(baskets1x))
    val cells = mults.tail.flatMap { m =>
      val t = if (m >= 100) timeOnce(baskets1x * m)
              else math.min(timeOnce(baskets1x * m), timeOnce(baskets1x * m))
      Seq(f"$t%.2f", f"${t / s1}%.1f")
    }
    println((f"| q300_harmonic | $s1%.2f" +: cells).mkString("", " | ", " |"))
    spark.stop()
  }
}
