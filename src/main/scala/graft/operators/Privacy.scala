package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy gates run before a curated dataset leaves the pipeline — the
  * release-side counterpart of [[Curation.redactPii]] (which scrubs values
  * in place, while these AUDIT whether the released shape still leaks).
  * Reference analog: the contact tables carry exactly the quasi-identifier +
  * sensitive-attribute mix (models/contact.py) these checks exist for.
  *
  * Sweeney's k-anonymity and Machanavajjhala's l-diversity are the standard
  * published gates: an equivalence class (all rows sharing one
  * quasi-identifier tuple) smaller than k re-identifies its members by
  * linkage; a class whose sensitive attribute takes fewer than l distinct
  * values discloses that attribute even WITHOUT re-identification (the
  * homogeneity attack — "everyone in this class is in debt").
  */
object Privacy {

  /** k-anonymity + l-diversity audit over `quasiCols`: one hash aggregate
    * to equivalence classes (map-side partials; the only row-sized
    * shuffle), then pure per-class flag arithmetic. Emits ONLY the
    * violating classes — at 100 TB the class table can approach the
    * distinct-tuple count, but the violation listing is the actionable
    * artifact and is bounded by it.
    *
    * `l_distinct` is an exact distinct count per class (Spark expands
    * count_distinct inside the same aggregate — no second shuffle). All
    * outputs are exact integers/booleans: nothing here is
    * representation-sensitive. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .select(quasiCols.map(col) ++ Seq(col("class_size"), col("l_distinct"),
        (col("class_size") < k).as("k_violation"),
        (col("l_distinct") < l).as("l_violation")): _*)
      .filter(col("class_size") < k || col("l_distinct") < l)
      .orderBy(quasiCols.map(col): _*)
  }

  /** k-anonymity REPAIR by generalization ladder — the constructive
    * counterpart of [[kAnonymityAudit]] (detect → fix, like the
    * leakage-audit → cluster-aware-split pairing): evaluate each
    * caller-supplied generalization level (e.g. day → month → year for a
    * date quasi-identifier) in order and report, per level, the class
    * landscape and whether it clears k — the caller releases at the
    * FIRST passing level (Samarati's minimal-generalization search over
    * a single ladder). One hash aggregate per level over the pre-coarsened
    * key; levels are a small declared list, so the sweep is a handful of
    * scans, each partial-aggregated. */
  def kAnonymityRepair(df: DataFrame, ladder: Seq[(String, Seq[Column])],
                       k: Int): DataFrame = {
    require(ladder.nonEmpty && k >= 1, "need levels and k >= 1")
    val levels = ladder.zipWithIndex.map { case ((name, cols), i) =>
      df.groupBy(cols: _*)
        .agg(count(lit(1)).as("class_size"))
        .agg(count(lit(1)).as("n_classes"),
          min("class_size").as("min_class_size"),
          count(when(col("class_size") < k, lit(1))).as("n_violating"))
        .select(lit(i).as("level"), lit(name).as("level_name"),
          col("n_classes"), col("min_class_size"), col("n_violating"),
          (col("n_violating") === 0).as("passes"))
    }
    val all = levels.reduce(_ unionAll _)
    // chosen = the first passing level (if any): flag it without a window
    val firstPass = all.where(col("passes")).agg(min("level").as("__fp"))
    all.crossJoin(broadcast(firstPass))
      .select(col("level"), col("level_name"), col("n_classes"),
        col("min_class_size"), col("n_violating"), col("passes"),
        (col("__fp").isNotNull && col("level") === col("__fp")).as("chosen"))
      .orderBy("level")
  }

  /** Two-sided-geometric CDF at ε=1 (α=e⁻¹): P(Z=z) ∝ α^|z|, the discrete
    * Laplace mechanism of Ghosh–Roughgarden–Sundararajan ("Universally
    * Utility-Maximizing Privacy Mechanisms"). Cumulative literals for
    * z=-7..6; below the first threshold clamps to -7, above the last to +7
    * (each tail ≈ 7e-4 — the clamp is symmetric). Literal doubles so the
    * ladder evaluates identically in any engine. */
  private val dLaplaceCdf: Seq[(Double, Int)] = Seq(
    0.0006666391336166198 -> -7, 0.001812113043049739 -> -6,
    0.004925833956035729 -> -5, 0.013389804932698453 -> -4,
    0.03639726343516549 -> -3, 0.0989380198014472 -> -2,
    0.2689414213699951 -> -1, 0.7310585786300048 -> 0,
    0.9010619801985527 -> 1, 0.9636027365648344 -> 2,
    0.9866101950673014 -> 3, 0.9950741660439641 -> 4,
    0.9981878869569502 -> 5, 0.9993333608663832 -> 6)

  /** ε-differentially-private group counts: one hash aggregate to true
    * counts (the only row-sized shuffle; count has sensitivity 1 under
    * add/remove-one-row adjacency), then integer discrete-Laplace noise
    * per group via the CASE ladder over a seeded md5 uniform. The noise
    * draw is a pure function of (seed, key): the release is reproducible
    * (audit-friendly) and engine-portable — a DETERMINISTIC seed means
    * re-running does NOT spend extra privacy budget, but publishing a new
    * release with a fresh seed composes ε's additively.
    *
    * Output carries only the noisy count + ε — the true count never leaves
    * the operator, matching a real DP release boundary. */
  def dpNoisyCounts(df: DataFrame, keyCol: String,
                    seed: String = "dp1"): DataFrame = {
    val u = conv(substring(md5(concat(lit(seed + ":"),
      col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val z = dLaplaceCdf.foldRight(lit(7): Column) { case ((t, k), acc) =>
      when(u < lit(t), lit(k)).otherwise(acc)
    }
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("__true"))
      .select(col(keyCol), (col("__true") + z).as("noisy_count"),
        lit(1.0).as("epsilon"))
      .orderBy(keyCol)
  }

  /** ε-DP group SUMS via clip + quantize + discrete Laplace: values clip
    * to [0, clipHi] (bounding one row's contribution — the sensitivity),
    * the exact micro-unit sum quantizes to clipHi-sized units (so one
    * row moves the released integer by at most 1), and the same ε=1
    * geometric ladder as [[dpNoisyCounts]] adds integer noise on that
    * unit scale. Release = (q + Z)·clipHi. The quantize-then-noise shape
    * is the granularity trick that keeps the mechanism integer-exact —
    * and therefore engine-portable — instead of needing continuous
    * Laplace draws. One hash aggregate; noise is a pure function of
    * (seed, key). */
  def dpNoisySum(df: DataFrame, keyCol: String, valueCol: String,
                 clipHi: Double = 10.0, seed: String = "dps1"): DataFrame = {
    require(clipHi > 0, "clip bound must be positive")
    val u = conv(substring(md5(concat(lit(seed + ":"),
      col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val z = dLaplaceCdf.foldRight(lit(7): Column) { case ((t, k), acc) =>
      when(u < lit(t), lit(k)).otherwise(acc)
    }
    val unitMicro = math.round(clipHi * 1e6).toDouble
    df.select(col(keyCol),
      round(least(greatest(col(valueCol), lit(0.0)), lit(clipHi)) * lit(1e6))
        .cast("long").as("__vm"))
      .groupBy(keyCol)
      .agg(sum("__vm").as("__sm"))
      .select(col(keyCol),
        ((round(col("__sm").cast("double") / lit(unitMicro)).cast("long") + z)
          .cast("double") * lit(clipHi)).as("noisy_sum"),
        lit(1.0).as("epsilon"), lit(clipHi).as("clip_hi"))
      .orderBy(keyCol)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung after [[kAnonymityAudit]]'s k and l: a class can be large (k ok)
    * and diverse (l ok) and STILL leak by skew — "90% of this class is in
    * collections vs 20% globally". Requires every equivalence class's
    * sensitive-attribute distribution to sit within `threshold` of the
    * global one, measured here by total-variation distance (the standard
    * choice for categorical sensitive attributes; EMD reduces to TV when
    * the ground metric is 0/1).
    *
    * EXACT: t_g = ½·Σ_s |p_gs − p_s| = Σ_s |n_gs·N − n_s·n_g| / (2·n_g·N)
    * — the numerator is a sum of exact integer cross-products (including
    * the ZERO cells, materialized by the class × sensitive-margin grid),
    * and ONE double division happens at the end. One row-sized hash
    * aggregate to (class, s) cells; classes, margins, and totals derive
    * from the cells (cell-sized scans); the grid is classes ×
    * |sensitive categories| — bounded by a categorical's cardinality. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, threshold: Double): DataFrame = {
    require(quasiCols.nonEmpty && threshold > 0, "need quasiCols, threshold > 0")
    val cells = df.groupBy(
        quasiCols.map(col) :+ col(sensitiveCol).cast("string").as("s"): _*)
      .agg(count(lit(1)).as("n_gs")).localCheckpoint() // classes+margins+grid
    val classes = cells.groupBy(quasiCols.map(col): _*).agg(sum("n_gs").as("n_g"))
    val margins = cells.groupBy("s").agg(sum("n_gs").as("n_s")).localCheckpoint()
    val total = margins.agg(sum("n_s").as("nTot"))
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val grid = classes.crossJoin(broadcast(margins)).crossJoin(broadcast(total))
      .join(cells, quasiCols :+ "s", "left")
      .na.fill(0L, Seq("n_gs"))
    grid
      .select(quasiCols.map(col) ++ Seq(col("n_g"), col("nTot"),
        abs((c19(col("n_gs")) * col("nTot")).cast("decimal(38,0)") -
          (c19(col("n_s")) * col("n_g")).cast("decimal(38,0)")).as("dev")): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(max("n_g").as("n_g"), max("nTot").as("nTot"), sum("dev").as("devSum"))
      .select(quasiCols.map(col) ++ Seq(col("n_g").cast("long").as("class_size"),
        (col("devSum").cast("double") /
          (lit(2d) * col("n_g").cast("double") * col("nTot").cast("double")))
          .cast("decimal(18,9)").cast("double").as("t_distance")): _*)
      .withColumn("t_violation", (col("t_distance") > threshold).cast("int"))
      .orderBy(quasiCols.map(col): _*)
  }

  /** Recursive (c,l)-diversity audit (Machanavajjhala et al. 2007, §4.2) —
    * the skew-aware member of the diversity family: [[kAnonymityAudit]]'s
    * distinct-l passes a class where one sensitive value covers 99% of
    * rows and the other l−1 appear once each (the probabilistic
    * homogeneity attack survives); recursive (c,l) additionally requires
    * the MOST COMMON value to not dominate — with per-class sensitive
    * frequencies sorted r₁ ≥ r₂ ≥ … ≥ r_m, the class passes iff
    * r₁ < c·(r_l + r_{l+1} + … + r_m). Distinct-l is the c→∞ limit;
    * small c is the strong gate.
    *
    * Two hash aggregates (rows → (class, value) cells → classes) plus one
    * cell-sized window for the frequency ranks; the cell table is bounded
    * by classes × sensitive cardinality, so at 100 TB everything after
    * the first partial-aggregated shuffle is metadata-sized. All counts
    * are exact integers; the c·tail product is an exact DECIMAL(18,6)
    * literal multiply — nothing representation-sensitive. Classes with
    * m < l fail by definition (the tail sum from rank l is empty ⇒ 0).
    * Frequency ties rank by sensitive value asc — r₁ and the tail-from-l
    * sum are both tie-order invariant (equal counts commute). */
  def recursiveLDiversity(df: DataFrame, quasiCols: Seq[String],
                          sensitiveCol: String, l: Int, c: Double): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2 && c > 0, "need quasiCols, l >= 2, c > 0")
    val cells = df.groupBy(
        quasiCols.map(col) :+ col(sensitiveCol).cast("string").as("s"): _*)
      .agg(count(lit(1)).as("r"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("r").desc, col("s"))
    cells.withColumn("rk", row_number().over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("r").as("class_size"),
        count(lit(1)).as("m_distinct"),
        max(when(col("rk") === 1, col("r"))).as("r1"),
        coalesce(sum(when(col("rk") >= l, col("r"))), lit(0L)).as("tail_from_l"))
      .select(quasiCols.map(col) ++ Seq(
        col("class_size").cast("long").as("class_size"),
        col("m_distinct").cast("long").as("m_distinct"),
        col("r1").cast("long").as("r1"),
        col("tail_from_l").cast("long").as("tail_from_l"),
        (col("r1").cast("decimal(18,6)") >=
          lit(c).cast("decimal(18,6)") * col("tail_from_l").cast("decimal(18,6)"))
          .cast("int").as("cl_violation")): _*)
      .orderBy(quasiCols.map(col): _*)
  }
}
