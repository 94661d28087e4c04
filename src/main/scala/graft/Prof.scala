package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
// throwaway profiling main (not committed)
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = { val t0=System.nanoTime; val n=f; println(f"[prof] $name n=$n ${(System.nanoTime-t0)/1e9}%.2f s") }
    val k=24; val w=8
    val len = length(col("text"))
    val grams = docs.select(col("doc_id"), col("text"), explode(when(len >= k, sequence(lit(1), len - (k-1))).otherwise(array().cast("array<int>"))).as("p"))
      .select(col("doc_id"), col("p"), concat(substring(md5(substring(col("text"), col("p"), lit(k))), 1, 16), lit("@"), lpad(col("p").cast("string"), 7, "0")).as("comb"))
    t("grams"){ grams.count() }
    t("grams2"){ grams.count() }
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val win = grams.withColumn("rn", row_number().over(byDoc)).withColumn("sel", min(col("comb")).over(byDoc.rowsBetween(-(w-1), 0)))
    t("win"){ win.count() }
    val sel0 = win.filter(col("rn") >= w).select(col("doc_id"), substring(col("sel"),1,16).as("h")).distinct()
    t("sel"){ sel0.count() }
    t("sel2"){ sel0.count() }
    spark.stop()
  }
}
