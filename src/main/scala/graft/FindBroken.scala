package graft

import org.apache.spark.sql.SparkSession

/** Analysis sweep: tries to BUILD (not run) the physical plan of every
  * registered query against a given sf dir and reports the ones that fail
  * analysis. Cheap (< 1 min) first check after the driver regenerates
  * testdata — schema drift (e.g. TIMESTAMP(NANOS) → TIMESTAMP_NTZ between
  * generations) surfaces here before any expensive verify run.
  * Usage: runMain graft.FindBroken [sfDir]
  */
object FindBroken {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      try SparkEntry.queries(n)(spark, d).queryExecution.executedPlan
      catch { case e: Throwable =>
        println(s"BROKEN $n: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    println("DONE")
    spark.stop()
  }
}
