package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
