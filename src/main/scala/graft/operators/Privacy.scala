package graft.operators

import org.apache.spark.sql.DataFrame
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
}
