package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics beyond the connected components in [[Dedup]]: PageRank
  * over an edge list. In a data-curation pipeline this ranks entities by
  * link centrality (site authority for crawl prioritization, canonical-
  * record election inside duplicate clusters).
  *
  * Scale shape: the classic iterative join-aggregate — per iteration, ONE
  * join of the (src, dst, deg) edge index against the current rank vector
  * (both shuffle on the node key and AQE reuses the co-partitioning) and
  * ONE aggregate on dst. The edge index is deduped + degree-annotated once
  * and persisted; ranks are node-sized, never edge-sized. localCheckpoint
  * per iteration truncates the growing lineage (the classic iterative-Spark
  * OOM). Iterations are FIXED, so the whole thing is deterministic and —
  * with contributions cast to DECIMAL(28,9) before the order-dependent
  * sum (the [[Curation.unigramLogLikelihood]] recipe) — reproducible
  * bit-exactly in the DuckDB oracle with unrolled CTEs.
  */
object Graph {

  /** Simplified PageRank (no dangling-mass redistribution: callers pass a
    * symmetrized edge list, where every node has out-degree ≥ 1), rank₀=1,
    * fixed iterations, top-k by final rank. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 2, damping: Double = 0.85,
               topK: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val index = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = index.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0))
    for (i <- 1 to iters) {
      ranks = index.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,9)").as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(1.0 - damping) + lit(damping) * sum(col("c")).cast("double"))
          .as("rank"))
      // checkpoint every 3rd round: each checkpoint is a blocking node-sized
      // materialization, so doing it EVERY round costs more than the
      // shallow lineage it trims — the cadence only needs to outpace
      // Catalyst's analysis blowup on deep iterative plans
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    index.unpersist(false)
    ranks
      .select(col("node"), col("rank").cast("decimal(18,6)").cast("double").as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(topK)
  }
}
