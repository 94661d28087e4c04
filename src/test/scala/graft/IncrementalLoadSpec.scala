package graft

import java.nio.file.Files
import graft.sources.IncrementalLoad

/** Incremental ingest: first load takes everything, second load only new
  * files, empty increment yields zero rows, checkpoint survives. */
class IncrementalLoadSpec extends SparkSpec {
  import spark.implicits._

  test("loads only files newer than the checkpoint") {
    val dir = Files.createTempDirectory("incr").toString
    val ckpt = dir + "/_checkpoint"
    val data = dir + "/data"

    Seq(1L, 2L, 3L).toDF("id").write.mode("append").parquet(data)
    val first = IncrementalLoad.loadNew(spark, data, ckpt)
    assert(first.count() == 3)

    // same content again → nothing new
    val nothing = IncrementalLoad.loadNew(spark, data, ckpt)
    assert(nothing.count() == 0)

    Thread.sleep(1100) // ensure a strictly newer mtime (fs second granularity)
    Seq(4L, 5L).toDF("id").write.mode("append").parquet(data)
    val second = IncrementalLoad.loadNew(spark, data, ckpt)
    assert(second.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))

    val third = IncrementalLoad.loadNew(spark, data, ckpt)
    assert(third.count() == 0)
  }
}
