package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan (and optionally times
  * execution) for the named queries. Usage:
  *   runMain graft.Explain <sfDir> [time] <query...|all>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val doTime = args.contains("time")
    val names = args.drop(1).filterNot(_ == "time") match {
      case Array() | Array("all") => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      if (doTime) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
