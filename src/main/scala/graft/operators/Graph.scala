package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * and EAGERLY localCheckpointed (it is referenced once per iteration with
  * no intervening action, so a lazy persist would never serve a job); ranks
  * are node-sized, never edge-sized. Iterations are FIXED, so the whole thing is deterministic and —
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
    // EAGER checkpoint, not persist: the final plan references the edge
    // index once per iteration (and callers may union/mirror the result,
    // doubling references again) — a lazy persist would need an action to
    // fire before the references, and there is none inside this builder.
    // The eager materialization runs the groupBy-collect_set edge-build
    // exactly ONCE; every reference afterwards reads node-local blocks.
    val index = e.join(deg, "src").localCheckpoint(true)
    var ranks = index.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0))
    for (i <- 1 to iters) {
      ranks = index.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,9)").as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(1.0 - damping) + lit(damping) * sum(col("c")).cast("double"))
          .as("rank"))
      // lineage valve for DEEP runs only: every 3rd round eagerly
      // materialize the node-sized rank vector so Catalyst never analyzes
      // an unboundedly nested plan. At the default 2-3 rounds the plan is
      // shallow, the valve never fires, and the whole rank chain stays ONE
      // lazy job over the checkpointed index.
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
      .select(col("node"), col("rank").cast("decimal(18,6)").cast("double").as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(topK)
  }

  /** PageRank for NATURALLY DIRECTED graphs — [[pageRank]] requires a
    * symmetrized edge list (every node has out-degree ≥ 1); real crawl
    * frontiers (url → url), citation graphs, and customer → order graphs
    * have DANGLING nodes (out-degree 0) that leak rank mass every
    * iteration without the standard fix: their pooled mass m = Σ_dangling
    * r(u) redistributes uniformly, r'(v) = (1−d) + d·(Σ_{u→v} r(u)/deg(u)
    * + m/n). Under the unnormalized rank₀ = 1 convention this conserves
    * TOTAL MASS exactly: Σr' = n(1−d) + d·((Σr − m) + m) = n when Σr = n
    * (GraphSpec pins the invariant; ranks stay comparable across graphs).
    *
    * Exactness: contributions and the dangling pool quantize to
    * DECIMAL(28,9) before their order-dependent sums; m/n is ONE double
    * division mirrored in the oracle's unrolled CTEs. m and n ride 1-row
    * broadcast frames — the plan stays fully lazy (no constructor
    * actions), and each iteration is still one node-keyed join + one dst
    * aggregate; the dangling pool is a node-sized semi-join. */
  def pageRankDirected(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 2, damping: Double = 0.85): DataFrame =
    pageRankDirectedFrames(edges, srcCol, dstCol, iters, damping).last

  /** Every iteration's full rank vector (frame 0 = uniform init) — the
    * building block behind [[pageRankDirected]] and the convergence
    * report. Frames after the first are localCheckpointed: each is read
    * twice (next iteration + delta report), and the checkpoint also
    * truncates the iterative lineage. */
  private[graft] def pageRankDirectedFrames(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double): Seq[DataFrame] = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val index = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dangling = nodes.join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
    val nFrame = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    val frames = Seq.newBuilder[DataFrame]
    frames += ranks
    for (_ <- 1 to iters) {
      val contrib = index.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,9)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      val mFrame = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank").cast("decimal(28,9)")),
          lit(0).cast("decimal(28,9)")).as("m"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(mFrame)).crossJoin(broadcast(nFrame))
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) *
            (coalesce(col("s").cast("double"), lit(0.0)) +
              col("m").cast("double") / col("n").cast("double"))).as("rank"))
        .localCheckpoint(true)
      frames += ranks
    }
    index.unpersist(false)
    // frames past 0 are localCheckpointed; frame 0 stays recomputable, so
    // releasing the node cache here leaks nothing across long sessions.
    nodes.unpersist(false)
    frames.result()
  }

  /** Per-iteration convergence report for [[pageRankDirected]]: L1 delta
    * Σ|r_i − r_{i−1}| (micro-quantized exact sum) and total mass Σr_i —
    * the "has it converged / is mass conserved" dashboard row that decides
    * whether the fixed iteration budget was enough. */
  def pageRankConvergence(edges: DataFrame, srcCol: String, dstCol: String,
                          iters: Int = 2, damping: Double = 0.85): DataFrame = {
    val frames = pageRankDirectedFrames(edges, srcCol, dstCol, iters, damping)
    frames.sliding(2).zipWithIndex.map { case (Seq(prev, cur), i) =>
      cur.join(prev.withColumnRenamed("rank", "prev"), "node")
        .agg(
          sum(abs(col("rank") - col("prev")).cast("decimal(28,6)")).as("l1"),
          sum(col("rank").cast("decimal(28,6)")).as("mass"))
        .select(lit(i + 1).as("iter"),
          col("l1").cast("double").as("l1_delta"),
          col("mass").cast("double").as("mass"))
    }.reduce(_.unionAll(_)).orderBy("iter")
  }

  /** Synchronous label propagation (fixed iterations, min-label tie-break):
    * parameter-free community detection — labels start as node ids and each
    * round every node adopts the most frequent label among its neighbors
    * (ties to the smallest label). SYNCHRONOUS + deterministic tie-break is
    * what makes the result layout-independent AND expressible as unrolled
    * SQL for the oracle; classic async LP is run-order-dependent by design
    * and would be unverifiable. Per round: one join of the symmetrized
    * neighbor list against the node-sized label table (both shuffle on the
    * node key), one count aggregate, one WindowGroupLimit-shaped rank —
    * edges never duplicate beyond the 2|E| adjacency. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iters: Int = 2): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val nbrs = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = nbrs.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      // modal label as a partial-aggregatable argmin — min_by over
      // (-count, label) is (count desc, label asc) without the window SORT
      // a row_number rank would pay per round, and without negating the
      // label itself (which would corrupt non-numeric node ids)
      labels = nbrs.join(labels, col("b") === col("node"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("a"))
        .agg(min_by(col("lbl"),
          struct((-col("cnt")).as("nc"), col("lbl"))).as("lbl"))
        .select(col("a").as("node"), col("lbl"))
    }
    val out = labels.orderBy("node").localCheckpoint(true)
    nbrs.unpersist(false)
    out
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected edge list — the community-structure / link-spam signal.
    *
    * Degree-ordered enumeration (the standard distributed algorithm, cf.
    * Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11): every edge is oriented from its lower-(deg, id)
    * endpoint to the higher, so each node's out-degree is O(√m) and wedge
    * enumeration generates Σ C(outdeg, 2) = O(m^1.5) candidates worst-case
    * instead of the Σ deg² a naive adjacency join pays (the "last reducer"
    * hot node). Wedges come from a sorted-adjacency slice-explode (one
    * node-keyed aggregate; per-apex state is the O(√m) out-list — the same
    * bound the former self-join's per-key group buffering had, for half the
    * enumerated pairs and one less edge-list shuffle). Each triangle is
    * found exactly once, at its lowest-rank apex. Three shuffles total
    * (degree agg, wedge aggregate, closing join); nothing driver-side. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE scan of the cached edge list (explode both endpoints) instead of
    // the former two-branch unionAll — same aggregate, half the cache reads
    // (A/B'd warm 1.13 → 0.64 s at sf0.1, round 13)
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // orient low→high rank, rank = (deg, id); carry the head's degree so
    // wedge canonicalization below needs no further join
    val ranked = und
      .join(deg.select(col("n").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("deg_b")), "b")
    val aIsLo = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val oriented = ranked.select(
        when(aIsLo, col("a")).otherwise(col("b")).as("lo"),
        when(aIsLo, col("b")).otherwise(col("a")).as("hi"),
        when(aIsLo, col("deg_b")).otherwise(col("deg_a")).as("deg_hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at apex u, tips canonicalized by the same (deg, id) rank, so
    // the closing edge — if present — is oriented exactly v→w. Enumeration
    // is the sorted-adjacency explode (the co-occurrence-builder recipe):
    // ONE node-keyed aggregate collects each apex's out-neighbors sorted by
    // (deg, id), and the i<j slice-explode emits each wedge exactly once —
    // where the former x⋈y self-join shuffled the out-edge list twice and
    // enumerated all ordered pairs (2× the wedges) only to filter half away.
    val wedges = oriented
      .groupBy(col("lo").as("u"))
      .agg(sort_array(collect_list(struct(col("deg_hi").as("d"), col("hi").as("t")))).as("ns"))
      .select(col("u"), posexplode(col("ns")).as(Seq("i", "vs")), col("ns"))
      .select(col("u"), col("vs.t").as("v"),
        explode(slice(col("ns"), col("i") + lit(2), size(col("ns")))).as("ws"))
      .select(col("u"), col("v"), col("ws.t").as("w"))
    // wedges outnumber edges ~deg-fold and most never close; Bloom-prune
    // them against an edge sketch BEFORE they shuffle into the closing join
    // (the engine's runtime-filter expressions, sized ~10 bits/edge ≈ 1%
    // fpp). BloomFilterAggregate silently clamps to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 2^26 =
    // 8 MB ≈ 6.7M edges at 10 bits each) — we request up to that conf so
    // the clamp is explicit; beyond it the prune degrades gracefully to a
    // higher fpp and the exact closing join still settles correctness.
    // Raise the conf for graphs past ~6M edges.
    val m = und.count() // persisted — one cheap action, sizes the sketch
    val maxBits = edges.sparkSession.conf
      .getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(1L << 26)
    val sketch = oriented
      .select(graft.functions.Native.bloomFilterAgg(
        xxhash64(col("lo"), col("hi")), math.max(m, 1L),
        math.min(10L * m + 64L, maxBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val tri = wedges
      .filter(graft.functions.Native.bloomMightContain(
        lit(sketch), xxhash64(col("v"), col("w"))))
      .join(oriented.select(col("lo").as("v"), col("hi").as("w")), Seq("v", "w"))
    val triPerNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("triangles"))
    val out = deg.join(triPerNode, Seq("n"), "left")
      .select(col("n").as("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        // one double division on exact integers — oracle-identical
        when(col("deg") >= 2,
          (coalesce(col("triangles"), lit(0L)) * 2).cast("double") /
            (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy("node")
      .localCheckpoint(true)
    oriented.unpersist(false); deg.unpersist(false); und.unpersist(false)
    out
  }

  /** k-core decomposition membership: peel nodes of degree < k until
    * fixpoint; survivors form the k-core — the "dense center" filter that
    * separates organic near-dup clusters (sparse chains/stars, gone by
    * round 1 for k ≥ 3 since every node there has degree ≤ 2) from
    * machine-generated duplication farms (dense cores that survive). The
    * standard spam/community primitive alongside [[pageRank]] and
    * [[triangleCounts]]. Returns (node, deg) — each survivor's degree
    * WITHIN the core.
    *
    * Peeling is synchronous (whole-round removal), so the result is
    * layout-independent and expressible as unrolled SQL for the oracle.
    * Per round: one degree aggregate + two semi-joins, edges shrink
    * monotonically; the round count is bounded by the peel DEPTH (how many
    * onion layers of weak nodes shield the core — a handful on near-dup
    * graphs, NOT the graph diameter), with a hard `maxIters` stop. One
    * edge-count action per round (localCheckpoint'ed — each round's plan
    * starts from materialized edges, never replays history). */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxIters: Int = 32): DataFrame = {
    require(k >= 1, "k >= 1")
    var und = edges.select(
        least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var m = und.count()
    var it = 0
    var converged = m == 0L
    while (!converged && it < maxIters) {
      val keep = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("n")
      val pruned = und
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      val m2 = pruned.count()
      converged = m2 == m
      und = pruned; m = m2; it += 1
    }
    und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .select(col("n").as("node"), col("deg"))
      .orderBy("node")
  }

  /** Multi-source BFS hop distances over an undirected edge list, bounded at
    * `maxHops` — "how far is every node from the seed set": blast-radius of
    * a bad ingest batch through the near-dup graph, reach of a spam cluster,
    * neighborhood tiers for graph features. Synchronous frontier expansion
    * (Pregel's BFS shape): per round, frontier ⋈ adjacency → candidate next
    * tier, anti-join the visited set, checkpoint. Rounds = maxHops, so the
    * plan depth is bounded a priori (unlike connectedComponents' diameter-
    * driven loop); each round shuffles only the FRONTIER against the
    * node-partitioned adjacency, never re-walks settled tiers. The visited
    * set is localCheckpoint'ed per round — round N's plan starts from
    * materialized state, not N stacked joins. Returns (node, dist) for
    * reached nodes only; min-dist semantics make the result layout-
    * independent and expressible as a recursive CTE for the oracle. */
  def bfsDistances(edges: DataFrame, aCol: String, bCol: String,
                   sources: Seq[Long], maxHops: Int): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val nbrs = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = edges.sparkSession
    import spark.implicits._
    // ONE state frame (node, dist, fresh) and ONE eager checkpoint per hop
    // (was: checkpoint the new tier, then checkpoint the union — two
    // materialized frames per hop): the anti-join of candidates against the
    // visited set is folded into the same full-outer join that appends the
    // new tier, and the next frontier is a lazy filter over the
    // checkpointed state blocks.
    var state = sources.distinct.sorted.toDF("node")
      .withColumn("dist", lit(0)).withColumn("fresh", lit(true))
      .localCheckpoint(true)
    var hop = 0
    var live = true
    while (live && hop < maxHops) {
      hop += 1
      val frontier = state.filter(col("fresh")).select("node")
      val cand = nbrs.join(frontier, nbrs("a") === frontier("node"))
        .select(col("b").as("node")).distinct()
        .withColumn("c", lit(true))
      state = state.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          coalesce(col("dist"), lit(hop)).as("dist"),
          (col("dist").isNull && col("c").isNotNull).as("fresh"))
        .localCheckpoint(true)
      // early exit at the graph diameter: an empty frontier can never add
      // a node, so every remaining hop would pay a full join + checkpoint
      // to reproduce the same state. The emptiness probe is a limit-1 scan
      // over the checkpointed node-sized blocks (the CC-star short-circuit
      // recipe) — result-identical because hop h's state is a fixpoint of
      // hop h+1's fold when fresh is all-false. Skipped on the final hop:
      // with no hops left there is nothing to save.
      if (hop < maxHops) live = !state.filter(col("fresh")).isEmpty
    }
    nbrs.unpersist(false)
    state.select(col("node"), col("dist")).orderBy("node")
  }

  /** Eigenvector centrality (Bonacich) by fixed-iteration power iteration
    * on the symmetrized adjacency — the undamped cousin of [[pageRank]]:
    * a node is central in proportion to its neighbors' centrality, so
    * well-connected cliques concentrate mass where PageRank's damping
    * flattens it. (On an undirected graph HITS hubs = authorities = this
    * vector, so this one operator covers that family.)
    *
    * Determinism/portability: neighbor contributions pass through
    * DECIMAL(28,9) before the order-dependent sum (the q110 recipe), and
    * each round renormalizes by the MAX score — a deterministic 1-row
    * broadcast, no sqrt, no order-dependent L2 — so three unrolled CTE
    * rounds reproduce it bit-exactly in any engine.
    *
    * Scale: per round one shuffle of the 2|E| adjacency joined against the
    * node-sized score table + one 1-row max broadcast; the graph itself
    * never re-materializes (cached symmetrized edge list). */
  def eigenCentrality(edges: DataFrame, aCol: String, bCol: String,
                      iters: Int = 3, topK: Int = 20): DataFrame = {
    val e0 = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val e = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var s: DataFrame = null
    for (i <- 1 to iters) {
      // round 1 is score≡1, so the edge⨝score join collapses to a degree
      // count — one aggregate instead of a join (saves a third of the
      // rounds at the default 3)
      val raw =
        if (i == 1)
          e.groupBy(col("b").as("node"))
            .agg(sum(lit(1.0).cast("decimal(28,9)")).cast("double").as("raw"))
        else
          e.join(s, col("a") === col("node"))
            .select(col("b"), col("score").cast("decimal(28,9)").as("c"))
            .groupBy(col("b").as("node"))
            .agg(sum("c").cast("double").as("raw"))
      // node-sized eager checkpoint per round: `raw` feeds BOTH the max
      // and the normalized scores, and round k's plan embeds round k-1's —
      // uncheckpointed, the edge join re-executes 2^rounds times
      // (measured 13.4 s → ~5 s at sf0.1 on the dense co-purchase graph)
      val rawC = raw.localCheckpoint(true)
      val mx = rawC.agg(max("raw").as("mx"))
      s = rawC.crossJoin(broadcast(mx))
        .select(col("node"), (col("raw") / col("mx")).as("score"))
    }
    e.unpersist(false)
    s.select(col("node"),
      col("score").cast("decimal(18,6)").cast("double").as("score"))
      .orderBy(col("score").desc, col("node"))
      .limit(topK)
  }

  /** Neighbor-set Jaccard similarity — the classic link-prediction feature
    * (Liben-Nowell & Kleinberg 2003): sim(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)|,
    * scored for EVERY pair sharing ≥ minCommon neighbors, adjacent or not
    * (non-adjacent high scorers are the predicted links).
    *
    * Common-neighbor counts come from the sorted-set wedge explode: each
    * center x emits its neighbor pairs once (i<j), one count aggregate —
    * the same one-shuffle shape as the co-occurrence builders, never an
    * all-pairs node join. Wedge work is Σ deg(x)², so centers above
    * maxDegree are dropped (the standard hub cap: a 10⁶-degree hub would
    * emit 10¹² wedges for near-zero Jaccard — at the default the cap is
    * inert on anything but adversarial hubs, and the oracle applies the
    * identical cap). Union sizes come from exact degrees joined in at the
    * pair level; one quantized division at the end. */
  def neighborJaccard(edges: DataFrame, aCol: String, bCol: String,
                      minCommon: Int = 2, maxDegree: Int = 10000,
                      topK: Int = 50): DataFrame = {
    val e0 = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val e = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deg is node-sized: joins stay UN-hinted so AQE broadcasts it when it
    // fits (dimension-entity graphs) and shuffles it when it doesn't
    // (billion-node graphs) — the cap join and the two lookup joins are
    // all node-keyed either way
    val deg = e.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    val common = e.join(deg.filter(col("deg") <= maxDegree),
        col("a") === col("n"))
      .groupBy(col("a")).agg(sort_array(collect_set(col("b"))).as("ns"))
      .select(posexplode(col("ns")).as(Seq("i", "x")), col("ns"))
      .select(col("x"), explode(slice(col("ns"), col("i") + lit(2),
        size(col("ns")))).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    common
      .join(deg.select(col("n").as("x"), col("deg").as("deg_x")), "x")
      .join(deg.select(col("n").as("y"), col("deg").as("deg_y")), "y")
      .select(col("x"), col("y"), col("n_common"), col("deg_x"), col("deg_y"),
        (col("n_common").cast("double") /
          (col("deg_x") + col("deg_y") - col("n_common")).cast("double"))
          .cast("decimal(18,6)").cast("double").as("jaccard"))
      .orderBy(col("jaccard").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Personalized PageRank (random walk with restart to a SEED set): the
    * "similar to these nodes" primitive behind who-to-follow and related-
    * item surfaces — global PageRank measures importance, PPR measures
    * importance RELATIVE to the seeds. Same decimal-contribution recipe as
    * [[pageRank]]; the restart mass (1−d)/|S| lands only on seeds, ranks
    * start as the restart vector, fixed unrollable iterations. Non-seed
    * sinks leak walk mass (no dangling redistribution) exactly as in
    * [[pageRank]] — callers pass symmetrized edges. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iters: Int = 2,
                           damping: Double = 0.85, topK: Int = 20): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // eager checkpoint for the same reason as [[pageRank]]: the plan
    // references the index once per iteration with no action in between,
    // so a lazy persist would never serve — this runs the edge-build once
    val index = e.join(deg, "src").localCheckpoint(true)
    val restart = 1.0 - damping
    val p0 = restart / seeds.size
    def resetOf(node: Column): Column =
      when(node.isin(seeds: _*), lit(p0)).otherwise(lit(0.0))
    var ranks = index.select(col("src").as("node")).distinct()
      .withColumn("rank", resetOf(col("node")) / lit(restart)) // walk starts AT the seeds
    for (i <- 1 to iters) {
      ranks = index.join(ranks, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,9)").as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(damping) * sum(col("c")).cast("double")).as("walked"))
        .select(col("node"),
          (resetOf(col("node")) + col("walked")).as("rank"))
      // deep-run lineage valve, inert at the default 2 rounds (see pageRank)
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
      .select(col("node"), col("rank").cast("decimal(18,6)").cast("double").as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(topK)
  }

  /** Modularity of a labeled partition (Newman & Girvan 2004) — "is this
    * community assignment better than chance": Q = Σ_c (e_c/m − (d_c/2m)²)
    * with e_c = intra-community edges, d_c = total degree of community c,
    * m = |edges|. The audit to run over [[labelPropagation]] / connected-
    * components output (or ANY candidate grouping) before anyone trusts
    * the clusters; Q ≈ 0 means the partition explains nothing.
    *
    * Edges canonicalize to one undirected row (least/greatest + distinct);
    * labels join node-keyed onto endpoints and the degree margin. Every
    * count is exact; each community's contribution is ONE double chain
    * quantized DECIMAL(28,12), so the total Q (an exact decimal sum of the
    * quantized terms — order-independent) matches any engine bit-for-bit.
    * Output: per-community rows + the same q_total on each row. */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    val lab = labels.select(col(nodeCol).as("n"), col(labelCol).as("c"))
    val e = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // m + labeled-edge + degree consumers
    val m = e.agg(count(lit(1)).as("m"))
    val labeled = e
      .join(lab.select(col("n").as("a"), col("c").as("ca")), Seq("a"))
      .join(lab.select(col("n").as("b"), col("c").as("cb")), Seq("b"))
    val eIn = labeled.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_in"))
    val dTot = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .join(lab, Seq("n"))
      .groupBy("c").agg(count(lit(1)).as("d_tot"))
    val md = col("m").cast("double")
    val contrib = (col("e_in").cast("double") / md -
      (col("d_tot").cast("double") / (lit(2d) * md)) *
        (col("d_tot").cast("double") / (lit(2d) * md)))
      .cast("decimal(28,12)")
    val perC = dTot.join(eIn, Seq("c"), "left")
      .select(col("c"), coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"))
      .crossJoin(broadcast(m))
      .select(col("c"), col("e_in").cast("long").as("e_in"),
        col("d_tot").cast("long").as("d_tot"), contrib.as("contrib"))
      .localCheckpoint() // rows + the Q total read it twice
    perC.crossJoin(broadcast(perC.agg(sum("contrib").as("q_total"))))
      .select(col("c"), col("e_in"), col("d_tot"),
        col("contrib").cast("double").as("contrib"),
        col("q_total").cast("double").as("q_total"))
      .orderBy("c")
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): score a candidate
    * pair by Σ_z 1/ln(deg z) over common neighbors z — [[neighborJaccard]]
    * weighted so that a RARE shared neighbor (two customers sharing a
    * niche part) counts more than a ubiquitous one (everyone touches the
    * popular part). The standard second opinion next to raw-Jaccard in
    * who-to-link / related-item candidate ranking.
    *
    * Same wedge recipe as [[neighborJaccard]] — pairs are generated from
    * each apex's sorted neighbor list (never all-pairs), apex degree
    * capped by `maxDegree` so hub wedge fan-out is bounded. The apex
    * weight 1/ln(deg) is computed ONCE per apex and quantized
    * DECIMAL(18,12) BEFORE the per-pair sum (ln is the only
    * transcendental; summing pre-quantized decimals keeps the score
    * engine- and order-exact). Existing edges are anti-joined out —
    * this predicts NEW links. Returns top-K by (score desc, pair). */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String,
                 minCommon: Int = 2, maxDegree: Int = 10000,
                 topK: Int = 50): DataFrame = {
    val e0 = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val und = e0.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
    val deg = e.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    // deg ≥ 2 (ln 1 = 0 has no weight — a degree-1 apex makes no wedge
    // anyway); weight quantized once per apex, then summed exactly
    val apex = deg.filter(col("deg") >= 2 && col("deg") <= maxDegree)
      .select(col("n"),
        (lit(1d) / log(col("deg").cast("double")))
          .cast("decimal(18,12)").as("wz"))
    val pairs = e.join(apex, e("a") === apex("n"))
      .groupBy(col("a")).agg(max("wz").as("wz"),
        sort_array(collect_set(col("b"))).as("ns"))
      .select(col("wz"), posexplode(col("ns")).as(Seq("i", "x")), col("ns"))
      .select(col("wz"), col("x"),
        explode(slice(col("ns"), col("i") + lit(2), size(col("ns")))).as("y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_common"), sum("wz").as("aa"))
      .filter(col("n_common") >= minCommon)
    val out = pairs
      .join(und.select(col("a").as("x"), col("b").as("y")),
        Seq("x", "y"), "left_anti")
      .select(col("x"), col("y"), col("n_common").cast("long").as("n_common"),
        col("aa").cast("double").as("aa_score"))
      .orderBy(col("aa_score").desc, col("x"), col("y"))
      .limit(topK)
      .localCheckpoint(true)
    und.unpersist(false)
    out
  }

  /** Harmonic centrality from a sampled source set: C_H(v) = Σ_s 1/d(s,v)
    * over sources s that reach v within `maxHops` — the closeness-family
    * centrality that stays DEFINED on disconnected graphs (unreachable
    * pairs contribute 0, not ∞), estimated the way it's actually run at
    * scale: exact BFS from a small pinned sample (Eppstein–Wang style),
    * not all-pairs.
    *
    * BIT-PARALLEL multi-source BFS (the MS-BFS recipe, Then et al. VLDB
    * 2015): each source is one bit of a 64-bit mask, state is ONE row per
    * node (node, visited-mask), and a hop is ONE join of the symmetrized
    * adjacency against the fresh frontier + a `bit_or` hash aggregate —
    * the frontier is NEVER duplicated per source (the naive source-labeled
    * frontier measured 35 s vs ~2 s on the sf0.1 co-occurrence graph: on
    * a small-world graph hop 2–3 explodes |S|-fold). Newly-set bits at
    * hop h contribute popcount·quantize(1/h) — a DECIMAL(18,12) multiple
    * of the per-source term, so the result is bit-identical to summing
    * per-source 1/d terms (what the recursive-CTE oracle does). ≤64
    * sources per call (one mask word); larger samples run in words of 64.
    * Sources score each other; self-distance contributes nothing. */
  def harmonicCentrality(edges: DataFrame, aCol: String, bCol: String,
                         sources: Seq[Long], maxHops: Int): DataFrame = {
    val srcs = sources.distinct.sorted
    require(srcs.nonEmpty && srcs.size <= 64 && maxHops >= 1,
      "need 1..64 sources and maxHops >= 1")
    val und = edges.select(
        least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val nbrs = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = edges.sparkSession
    import spark.implicits._
    // ONE state frame (node, fresh-bits-this-hop, all-bits-seen) and ONE
    // eager checkpoint per hop: the former fresh/state split materialized
    // two frames per hop (fresh for the record + frontier, then the state
    // full-outer) — folding the vis-merge and the fresh-mask into the same
    // full-outer join halves the per-hop job count; the hop record and the
    // next frontier are lazy filters over the checkpointed state blocks.
    var state = srcs.zipWithIndex.map { case (s, i) => (s, 1L << i) }
      .toDF("node", "fresh").withColumn("vis", col("fresh"))
      .localCheckpoint(true)
    val hopRecords = Seq.newBuilder[DataFrame] // (node, fresh, hop)
    var hop = 0
    var live = true
    while (live && hop < maxHops) {
      hop += 1
      val frontier = state.filter(col("fresh") =!= 0)
        .select(col("node"), col("fresh"))
      val cand = nbrs.join(frontier, nbrs("a") === frontier("node"))
        .groupBy(col("b").as("node")).agg(expr("bit_or(fresh)").as("cand"))
      state = state.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          expr("coalesce(cand, 0L) & ~coalesce(vis, 0L)").as("fresh"),
          (coalesce(col("vis"), lit(0L)).bitwiseOR(coalesce(col("cand"), lit(0L)))).as("vis"))
        .localCheckpoint(true)
      hopRecords += state.filter(col("fresh") =!= 0)
        .select(col("node"), col("fresh"), lit(hop).as("hop"))
      // early exit once every source's BFS has saturated (all-zero fresh
      // masks): the remaining hops would each pay a full-outer join +
      // checkpoint to compute this same state and an all-empty hop record.
      // Limit-1 probe over checkpointed node-sized blocks — the same
      // short-circuit as bfsDistances; dropped hops contribute no rows to
      // the union below, so the result is identical. Skipped on the final
      // hop: with no hops left there is nothing to save.
      if (hop < maxHops) live = !state.filter(col("fresh") =!= 0).isEmpty
    }
    nbrs.unpersist(false)
    val recs = hopRecords.result()
    val all = recs.tail.foldLeft(recs.head)(_ unionAll _)
    all
      .select(col("node"), bit_count(col("fresh")).cast("long").as("nbits"),
        (lit(1d) / col("hop").cast("double")).cast("decimal(18,12)").as("term"))
      .groupBy("node")
      .agg(sum("nbits").as("n_reached"),
        sum(col("nbits").cast("decimal(19,0)") * col("term")).as("h"))
      .select(col("node"), col("n_reached").cast("long").as("n_reached"),
        col("h").cast("double").as("harmonic"))
      .orderBy("node")
  }

  /** Degree assortativity coefficient (Newman 2002, "Assortative mixing
    * in networks"): the Pearson correlation of the degrees at the two
    * ends of each undirected edge — r > 0 means hubs link to hubs
    * (social-network shape), r < 0 means hubs link to leaves
    * (hub-and-spoke / dependency shape). One number that says which
    * partitioning strategy a graph workload needs: disassortative
    * graphs are the ones whose hub edges skew a node-hash shuffle.
    *
    * Each undirected edge contributes BOTH orientations (the standard
    * symmetric estimator, making Σx = Σy by construction). One degree
    * aggregate + one node-keyed join per endpoint + one scalar fold.
    * Exactness: degrees are exact integers; all five power sums fold at
    * decimal scale 0 (products ≤ deg²·|E| ≪ 10³⁸ — rounding impossible);
    * the n·Σxy − ΣxΣy numerator and the two variance terms stay exact
    * DECIMAL(38,0), and r is ONE mirrored double chain
    * num / (sqrt(vx)·sqrt(vy)) (sqrt is IEEE correctly-rounded — the
    * only portable libm function), quantized to 9 dp. Degenerate
    * variance (regular graph) → NULL. Self-loops dropped; parallel
    * edges collapse (distinct canonical pairs). */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges.select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val e = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint() // referenced three times (degrees + both endpoint joins)
    val deg = e.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    val dpairs = e
      .join(deg.select(col("n"), col("deg").as("da")), e("a") === col("n")).drop("n")
      .join(deg.select(col("n"), col("deg").as("db")), e("b") === col("n")).drop("n")
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    val folded = dpairs.agg(
      count(lit(1)).as("ne"),
      sum(d0(col("da"))).as("sx"), sum(d0(col("db"))).as("sy"),
      sum((d0(col("da")) * d0(col("da"))).cast("decimal(38,0)")).as("sxx"),
      sum((d0(col("db")) * d0(col("db"))).cast("decimal(38,0)")).as("syy"),
      sum((d0(col("da")) * d0(col("db"))).cast("decimal(38,0)")).as("sxy"))
    val n38 = col("ne").cast("decimal(38,0)")
    val num = (n38 * col("sxy") - (col("sx") * col("sy")).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    val vx = (n38 * col("sxx") - (col("sx") * col("sx")).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    val vy = (n38 * col("syy") - (col("sy") * col("sy")).cast("decimal(38,0)"))
      .cast("decimal(38,0)")
    folded.select(
      (col("ne") / 2).cast("long").as("n_edges"),
      // the degree of an average EDGE END (the "your friends have more
      // friends" mean Σdeg²/Σdeg, not the node-average degree)
      (col("sx").cast("double") / col("ne").cast("double"))
        .cast("decimal(18,9)").cast("double").as("mean_end_degree"),
      when(vx > 0 && vy > 0,
        (num.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .cast("decimal(18,9)").cast("double"))
        .otherwise(lit(null).cast("double")).as("assortativity"))
  }

  /** Rich-club coefficient curve (Zhou & Mondragón 2004; Colizza 2006
    * framing): φ(k) = 2·E_{>k} / (N_{>k}(N_{>k}−1)) — how densely the
    * nodes with degree > k link to EACH OTHER, per threshold. φ rising
    * with k means the hubs form a club (one hot shuffle partition knows
    * about the others — co-partitioning the club pays); the per-k curve
    * is the distribution view of [[degreeAssortativity]]'s single r.
    *
    * One degree aggregate + the same two endpoint joins (edge-sized),
    * then ONE pass each over the annotated edge/node tables fanned by
    * the |ks|-row literal threshold frame (broadcast; bounded fan-out).
    * All counts exact integers, φ one double division, 9 dp. N ≤ 1 →
    * NULL φ (no possible pairs). */
  def richClub(edges: DataFrame, aCol: String, bCol: String,
               ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "need at least one degree threshold")
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // degree source + annotated-edge source
    val e = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
    val deg = e.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // node fan + two edge joins
    val ann = und
      .join(deg.select(col("n"), col("deg").as("da")), und("a") === col("n")).drop("n")
      .join(deg.select(col("n"), col("deg").as("db")), und("b") === col("n")).drop("n")
      .select(least(col("da"), col("db")).as("mindeg"))
    val kdf = ks.sorted.map(_.toLong).toDF("k")
    val ek = ann.crossJoin(broadcast(kdf)).groupBy("k")
      .agg(count(when(col("mindeg") > col("k"), lit(1))).as("e_k"))
    val nk = deg.crossJoin(broadcast(kdf)).groupBy("k")
      .agg(count(when(col("deg") > col("k"), lit(1))).as("n_k"))
    nk.join(ek, Seq("k"))
      .select(col("k").cast("long").as("k"),
        col("n_k").cast("long").as("n_nodes"),
        col("e_k").cast("long").as("n_edges"),
        when(col("n_k") >= 2,
          ((lit(2d) * col("e_k").cast("double")) /
            (col("n_k").cast("double") * (col("n_k").cast("double") - 1d)))
            .cast("decimal(18,9)").cast("double"))
          .otherwise(lit(null).cast("double")).as("phi"))
      .orderBy("k")
  }
}
