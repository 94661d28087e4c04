package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
