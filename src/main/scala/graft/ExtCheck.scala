package graft

import org.apache.spark.sql.SparkSession

/** End-to-end check of the extension entry point: builds a session WITH
  * `spark.sql.extensions=graft.GraftExtensions` (fresh JVM via sbt fork) and
  * calls the injected function from plain SQL. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.sql(
      "SELECT cosine_f32(array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    println(s"[extcheck] cosine_f32 via spark.sql.extensions = $c " +
      (if (math.abs(c - 1.0) < 1e-12) "OK" else "FAIL"))
    spark.stop()
    if (math.abs(c - 1.0) >= 1e-12) sys.exit(1)
  }
}
