package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting & mixing for training pipelines.
  *
  * Both operators key off the first two hex chars of md5(id) — 256 uniform
  * buckets whose LEXICOGRAPHIC order equals their numeric order, so the
  * split is: stable across runs/engines (no RNG), uniform, and expressible
  * identically in the DuckDB oracle. Pure column expressions: a single
  * map-side pass, no shuffle, no sampling state — the only split/mix design
  * that stays exactly reproducible on a 1000-executor re-run at 100 TB.
  */
object Splits {

  private def bucket(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2) // '00'..'ff', uniform

  private def boundary(n: Int): String = f"$n%02x"

  /** Assign train/val/test by hash bucket. `trainPct`/`valPct` are in
    * 1/256ths (e.g. 205 ≈ 80%, 25 ≈ 10%); the rest is test. */
  def assignSplit(df: DataFrame, idCol: String,
                  train256: Int = 205, val256: Int = 25): DataFrame = {
    require(train256 + val256 < 256, "train + val must leave room for test")
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < boundary(train256), "train")
        .when(b < boundary(train256 + val256), "val")
        .otherwise("test"))
  }

  /** Per-source weighted inclusion (dataset mixing): keep a row when its
    * hash bucket falls under its source's sampling weight (in 1/256ths).
    * A weight of 256 keeps everything; 64 keeps ~25% of that source.
    * Boundary strings are precomputed driver-side (sorted map iteration so
    * the CASE chain is deterministic). */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
                  weights256: Map[String, Int], default256: Int): DataFrame = {
    val b = bucket(col(idCol))
    def keep(wt: Int): Column =
      if (wt >= 256) lit(true) else if (wt <= 0) lit(false) else b < boundary(wt)
    val cond = weights256.toSeq.sortBy(_._1).foldLeft(keep(default256)) {
      case (acc, (src, wt)) => when(col(sourceCol) === src, keep(wt)).otherwise(acc)
    }
    df.filter(cond)
  }

  /** Temperature-scaled group balancing (the multilingual sampling rule of
    * XLM-R/mC4: sample group g with probability ∝ p_g^alpha, alpha<1 boosts
    * low-resource groups). Returns one row per group with its document
    * count, its alpha-scaled quota out of `budget`, and how many documents
    * the quota actually keeps. The kept rows themselves are the first
    * `target` per group in md5-bucket order — the same engine-independent
    * hash order [[assignSplit]] uses, so selection is uniform, deterministic,
    * and oracle-reproducible (no RNG).
    *
    * Exactness: pow(count, alpha) is one libm call on a long — bit-equal
    * across engines; the weight SUM goes through DECIMAL(28,9) so it is
    * order-independent; the final quota is floor(budget * w / Σw) with the
    * division done once, in double, last.
    *
    * Scale: counts are a tiny per-group aggregate; quotas are a broadcast
    * of #groups rows. Selecting exactly-target-per-group uses a per-group
    * row_number, whose parallelism is #groups — at 100 TB replace the exact
    * selection with the [[mixBySource]] bucket-threshold form (keep when
    * bucket < 256·target/n): one map-side pass, no per-group sort, quota hit
    * to within ±0.4% per group. */
  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each row draws a reproducible uniform u from md5(id)
    * (first 8 hex chars → integer, +1, /2³² ∈ (0,1]) and the k rows with
    * the SMALLEST −ln(u)/weight win — exactly weighted-without-replacement,
    * with zero RNG state. Higher weight (longer doc, higher quality score)
    * ⇒ proportionally higher selection odds. Plans as WindowGroupLimit
    * (per-partition heaps of k before the group shuffle); the exponential
    * keys are bit-equal across engines (one ln, one division), so even the
    * RANKING is oracle-reproducible — the key itself never leaves the
    * engine. Non-positive weights are excluded by contract. */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")
    val u = (h + lit(1.0)) / lit(4294967296.0)
    val key = -log(u) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(key, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col(groupCol), col(idCol), col(weightCol), col("sample_rank"))
      .orderBy(col(groupCol), col("sample_rank"))
  }

  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        budget: Long, alpha: Double = 0.5): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
    // α=0.5 goes through sqrt, which IEEE-754 requires to be correctly
    // rounded (bit-equal across engines); pow carries no such guarantee
    val weighted = counts.withColumn("w",
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha)))
    val totalW = weighted.agg(
      sum(col("w").cast("decimal(28,9)")).cast("double").as("sum_w"))
    // quotas is #groups rows but referenced twice (selection filter + final
    // report); localCheckpoint stops Catalyst re-running its two corpus
    // aggregates once per reference
    val quotas = weighted.crossJoin(broadcast(totalW))
      .withColumn("target",
        floor(lit(budget.toDouble) * col("w") / col("sum_w")).cast("long"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(bucket(col(idCol)), col(idCol))
    val kept = df
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(quotas.select(col(groupCol), col("target"))), Seq(groupCol))
      .filter(col("__rk") <= col("target"))
      .groupBy(groupCol).agg(count(lit(1)).as("n_kept"))
    quotas
      .join(kept, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("target"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(groupCol)
  }

  /** Deterministic negative-pair sampling for contrastive training: each
    * anchor gets k partners at fixed modular strides through the dense
    * global rank space ((r + j·stride) mod n, j = 1..k) — uniform spread,
    * RNG-free, and reproducible on any cluster layout because the rank
    * comes from [[Analytics.globalRowNumber]]'s two-pass numbering, not a
    * 1-partition window. Accidental positives (identical text fingerprint —
    * a near-dup partner would train the model to push a duplicate away)
    * and self-pairs are filtered after the partner join. The join shuffles
    * k·n id-sized rows, never text. */
  def negativeSample(df: DataFrame, idCol: String, textCol: String,
                     k: Int, stride: Long = 7919L): DataFrame = {
    val ranked = Analytics.globalRowNumber(
        // coalesce: a null text must still fingerprint, else the ≠ filter
        // below (null-propagating) silently drops every pair touching it
        df.select(col(idCol), coalesce(md5(col(textCol)), lit("__null__")).as("__fp")),
        Seq(idCol))
      .localCheckpoint(true)
    // corpus size for the modulus — one count-sized action on the pinned
    // rank table (same contract as the kmeans centroid collects); an empty
    // corpus degenerates to n=1 and the joins below yield nothing
    val nRow = ranked.agg(max(col("seq"))).head()
    val n = if (nRow.isNullAt(0)) 1L else nRow.getLong(0)
    val anchors = ranked.select((col("seq") - 1).as("ra"),
        col(idCol).as("anchor_id"), col("__fp").as("fa"))
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("rb", (col("ra") + col("j") * lit(stride)) % lit(n))
    val partners = ranked.select((col("seq") - 1).as("rb"),
      col(idCol).as("neg_id"), col("__fp").as("fb"))
    anchors.join(partners, "rb")
      .filter(col("fa") =!= col("fb") && col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), col("j"), col("neg_id"))
      .orderBy("anchor_id", "j")
  }

  /** Class-balanced resampling: every class is upsampled by row replication
    * to the size of the largest class — the classic imbalance fix when
    * downsampling the majority would waste data. Row r (0-based, in the
    * house md5-bucket order) of a class of size m gets ⌊T/m⌋ copies plus
    * one more if r < T mod m, so each class lands on EXACTLY the target T
    * and which rows get the extra copy is deterministic. Pure window +
    * explode — one shuffle on the class key, no RNG, no driver loop over
    * classes. */
  /** Stratified EXACT-count split: every stratum contributes
    * floor(n·train‰)/floor(n·val‰) rows to train/val (per-mille, exact
    * integer arithmetic — no float boundary), remainder to test — unlike
    * [[assignSplit]], whose global hash buckets only hit the proportions
    * in expectation and can starve a small stratum entirely (fatal when
    * the stratum is a rare language or label that eval must cover).
    *
    * Rows rank within their stratum by (md5 bucket, id) — deterministic,
    * engine-reproducible, no RNG — so membership is stable across runs
    * and layouts. ONE shuffle on the stratum key; the rank window's
    * parallelism is #strata (fine for label/language/source strata; the
    * giant-group note applies if a stratum dominates). */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
                      trainPm: Int = 800, valPm: Int = 100): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000,
      "per-mille shares must fit in 1000")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(bucket(col(idCol)), col(idCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(strataCol)
    df.select(col(idCol), col(strataCol))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      // floor(n·pm/1000) in pure integer arithmetic (SQL div): exact at any n
      .withColumn("split",
        when(col("__r") <= expr(s"__n * $trainPm div 1000"), "train")
          .when(col("__r") <= expr(s"__n * $trainPm div 1000")
            + expr(s"__n * $valPm div 1000"), "val")
          .otherwise("test"))
      .select(col(idCol), col(strataCol), col("split"))
      .orderBy(col(strataCol), col(idCol))
  }

  def classBalance(df: DataFrame, idCol: String, classCol: String): DataFrame = {
    val byClass = org.apache.spark.sql.expressions.Window
      .partitionBy(classCol).orderBy(bucket(col(idCol)), col(idCol))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(classCol)
    val sized = df
      .withColumn("__r", row_number().over(byClass).cast("long") - 1)
      .withColumn("__m", count(lit(1)).over(whole))
    // target = largest class size: one tiny agg action (class-count-sized);
    // empty input → target 0 → sequence(1, 0) explodes to nothing
    val tRow = df.groupBy(classCol).agg(count(lit(1)).as("m"))
      .agg(max("m")).head()
    val target = if (tRow.isNullAt(0)) 0L else tRow.getLong(0)
    sized
      .withColumn("__copies",
        floor(lit(target) / col("__m")) +
          when(col("__r") < lit(target) % col("__m"), 1L).otherwise(0L))
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .select(col(classCol), col(idCol), col("copy"))
      .orderBy(col(classCol), col(idCol), col("copy"))
  }

  /** Top-p mass cap per group: keep each group's heaviest rows until they
    * cover `pPerMille`/1000 of the group's total weight — the
    * nucleus-sampling shape applied to corpus curation (cap every domain at
    * p of its token mass, truncate a vocabulary at p of occurrences). The
    * head block is decided on CUMULATIVE-BEFORE mass, so the row that
    * crosses the boundary is still kept and every group keeps ≥ 1 row for
    * any p ≥ 1‰ (the heaviest row's cumulative-before is always 0; p = 0
    * keeps nothing, by construction).
    *
    * One shuffle on the group key; ranking + cumsum + total are per-GROUP
    * windows over that one partitioning (Catalyst folds all three into one
    * sort). Selection is pure integer cross-multiplication
    * cum_before·1000 < pm·total — no float quantile boundary to ulp-flip.
    * Weights must be integral (token/char counts); heavier-first order
    * tie-breaks on the id so the kept set is total and engine-independent. */
  def topPByGroup(df: DataFrame, groupCol: String, idCol: String,
                  weightCol: String, pPerMille: Int): DataFrame = {
    require(pPerMille >= 0 && pPerMille <= 1000, "p must be 0..1000 per-mille")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("weight").desc, col(idCol))
    val g = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.select(col(groupCol), col(idCol), col(weightCol).cast("long").as("weight"))
      .withColumn("__cum", sum("weight").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum("weight").over(g))
      .filter((col("__cum") - col("weight")) * 1000 < lit(pPerMille) * col("__tot"))
      .select(col(groupCol), col(idCol), col("weight"),
        col("__cum").as("cum_weight"), col("__tot").as("group_weight"))
      .orderBy(col(groupCol), col("cum_weight"))
  }

  /** Cluster-aware split: assign every document of a duplicate CLUSTER to
    * the same train/val/test bucket by hashing the cluster representative
    * instead of the doc id — the FIX for the leakage
    * [[crossSplitLeakage]] detects (a content-blind id-hash split places
    * copies independently; this one cannot, by construction). `pairs` is
    * any near-dup pair list (exact, MinHash, simhash, perceptual);
    * singleton docs are their own representative.
    *
    * Reuses [[Dedup.connectedComponents]] for the transitive closure
    * (pairs-sized, not corpus-sized), one left join back to docs, then
    * [[assignSplit]]'s pure map-side hash on the representative. */
  def clusterAwareSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                        aCol: String, bCol: String,
                        train256: Int = 205, val256: Int = 25): DataFrame = {
    val cc = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("cluster_id").as("__rep"))
    val withRep = docs.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__rep"), col(idCol)).as("rep"))
    assignSplit(withRep, "rep", train256, val256)
      .select(col(idCol), col("rep"), col("split"))
      .orderBy(idCol)
  }

  /** Largest-remainder proportional allocation: split a fixed budget of
    * `total` slots across sources exactly in proportion to their sizes —
    * floor(total·nₛ/N) each, the `total − Σfloor` leftover going to the
    * largest fractional remainders (ties to source name) — so the
    * allocations sum to EXACTLY `total`, which naive rounding does not
    * (the curation question "budget 10M docs across these sources fairly"
    * answered without a post-hoc fudge row; same method as seat
    * apportionment). ALL integer arithmetic — engine-exact. One count
    * aggregate; the ranking window runs over the sources table
    * (contract-small). */
  def proportionalAllocation(df: DataFrame, sourceCol: String,
                             total: Long): DataFrame = {
    require(total >= 0, "total must be non-negative")
    val c = df.groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as("n_docs"))
    val t = c.agg(sum("n_docs").as("__n"))
    val f = c.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"),
        expr(s"(${total}L * n_docs) div __n").as("__fl"),
        ((lit(total) * col("n_docs")) % col("__n")).as("__rem"))
    val lo = f.agg((lit(total) - sum("__fl")).as("__leftover"))
    val w = Window.orderBy(col("__rem").desc, col("source"))
    f.crossJoin(broadcast(lo))
      .withColumn("__rk", row_number().over(w))
      .select(col("source"), col("n_docs"),
        (col("__fl") + when(col("__rk") <= col("__leftover"), 1L).otherwise(0L))
          .as("allocation"))
      .orderBy("source")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-hashing answer to "which of N shards owns this doc" for
    * incrementally maintained datasets: when a shard is ADDED, only the
    * keys the new shard now wins move (≈ 1/(N+1) of them); every other
    * assignment is untouched. A `pmod(hash, N)` layout reshuffles nearly
    * everything on every resize — the difference between rewriting 100 TB
    * and appending one shard's worth.
    *
    * Weight of shard s for key k = md5(k || '#' || s); the winner is one
    * `greatest` over N (weight, shard) structs — pure map-side codegen'd
    * expressions, no shuffle, no RNG, engine-portable (md5 hex compares
    * lexicographically the same everywhere). N is a literal expression
    * fan-out: fine to ~64 shards; past that, generate a (key, shard)
    * explode + max aggregate instead. */
  def rendezvousShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 64, "nShards in [1,64]")
    val scored = (0 until nShards).map { s =>
      struct(md5(concat(col(idCol).cast("string"), lit("#"), lit(s.toString)))
        .as("w"), lit(s).as("shard"))
    }
    val winner = if (nShards == 1) lit(0) // greatest() needs ≥ 2 args
      else greatest(scored: _*).getField("shard")
    df.select(col(idCol), winner.as("shard"))
  }

  /** Cross-split contamination audit: identical texts that straddle
    * train/val/test after [[assignSplit]] — the train/test-leakage check
    * every eval pipeline needs, because a dup pair split across the
    * boundary silently inflates eval scores (the id-hash split is
    * content-blind BY DESIGN, so textual copies with different ids land
    * independently). Emits one row per leaking content hash with its
    * per-split counts.
    *
    * One md5(text) hash aggregate (map-side combined) over the split
    * assignment's pure map-side columns — exact-dup's shuffle shape.
    * Near-dup leakage composes [[Dedup.minhashLsh]] pairs with the split
    * column instead of the md5 key. */
  /** Walk-forward (rolling-origin) temporal folds with an embargo gap —
    * the time-series counterpart of [[assignSplit]]: fold i trains on
    * everything before cut_i, skips an embargo window (rows whose effects
    * leak across the boundary — label lookahead, session spillover), and
    * tests on the next segment. The id-hash split is exactly what
    * backtesting must NOT use: it would train on the future. Emits the
    * per-(fold, split) audit — row count, distinct actors, time bounds —
    * the readout that catches an empty or skewed test window before a
    * backtest burns a cluster-day.
    *
    * Epoch-second fold cuts derive from global min/max (one 1-row action,
    * then pure Scala long arithmetic — floor division matches the oracle's
    * `//`). Each row is map-side replicated to its ≤ nFolds (fold, split)
    * memberships via an `explode` over a literal fold array — a small
    * constant blowup feeding ONE hash aggregate; nothing shuffles more
    * than (folds × 3) groups, and the distinct-actor count rides Spark's
    * partial aggregation. */
  def walkForwardFolds(df: DataFrame, tsCol: String, actorCol: String,
                       nFolds: Int = 4, embargoSeconds: Long = 3600): DataFrame = {
    require(nFolds >= 1 && nFolds <= 64, "nFolds in [1,64]")
    val e = col(tsCol).cast("long")
    val b = df.agg(min(e), max(e)).head()
    val (minE, maxE) = (b.getLong(0), b.getLong(1))
    val span = maxE - minE
    val nSeg = nFolds + 1L
    def cut(i: Int): Long = minE + span * i / nSeg
    val folds = array((1 to nFolds).map { i =>
      struct(lit(i).as("fold"), lit(cut(i)).as("lo"),
        lit(if (i == nFolds) maxE + 1 else cut(i + 1)).as("hi"))
    }: _*)
    df.select(e.as("es"), col(actorCol).as("actor"), explode(folds).as("f"))
      .select(col("es"), col("actor"), col("f.fold").as("fold"),
        when(col("es") < col("f.lo"), "train")
          .when(col("es") < col("f.lo") + embargoSeconds, "purged")
          .when(col("es") < col("f.hi"), "test").as("split"))
      .where(col("split").isNotNull)
      .groupBy("fold", "split")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("actor")).as("n_actors"),
        min("es").as("min_epoch"), max("es").as("max_epoch"))
      .orderBy("fold", "split")
  }

  def crossSplitLeakage(df: DataFrame, idCol: String, textCol: String,
                        train256: Int = 205, val256: Int = 25): DataFrame = {
    assignSplit(df, idCol, train256, val256)
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(when(col("split") === "train", lit(1))).as("n_train"),
        count(when(col("split") === "val", lit(1))).as("n_val"),
        count(when(col("split") === "test", lit(1))).as("n_test"))
      .filter((col("n_train") > 0 && (col("n_val") > 0 || col("n_test") > 0)) ||
        (col("n_val") > 0 && col("n_test") > 0))
      .orderBy("text_hash")
  }
}
