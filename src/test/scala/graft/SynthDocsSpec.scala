package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.{SynthDocs, SynthScan}

/** The synthdocs DataSourceV2: deterministic content, REAL filter pushdown
  * (range predicates narrow the generated interval before partition
  * planning), column pruning, residual-filter correctness. */
class SynthDocsSpec extends SparkSpec {

  private def read(rows: Long, parts: Int = 8): DataFrame =
    spark.read.format("synthdocs")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  private def scanOf(df: DataFrame): SynthScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[SynthScan]
    }.get

  test("content is a pure function of doc_id and matches the JVM reference") {
    val rows = read(50).orderBy("doc_id").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == SynthDocs.text(i))
      assert(r.getString(2) == SynthDocs.lang(i))
      assert(r.getString(3) == SynthDocs.source(i))
      assert(r.getLong(4) == SynthDocs.text(i).length.toLong)
    }
    // spot-check the formula itself (guards against JVM-side drift too)
    assert(SynthDocs.text(0L).startsWith("w515 w860 w205"))
    assert(SynthDocs.nWords(3L) == 5 + (3 * 37) % 46)
  }

  test("doc_id range predicates are pushed: the scan interval narrows") {
    val df = read(1000).filter(col("doc_id") >= 900 && col("doc_id") < 950)
    val scan = scanOf(df)
    assert(scan.lo == 900L && scan.hi == 950L, scan.description())
    assert(df.count() == 50)
    // point lookup plans exactly one non-empty partition
    val point = read(1000).filter(col("doc_id") === 123)
    val ps = scanOf(point)
    assert(ps.lo == 123L && ps.hi == 124L)
    assert(ps.planInputPartitions().length == 1)
    assert(point.collect().map(_.getLong(0)).toSeq == Seq(123L))
  }

  test("contradictory predicates collapse to an empty scan, not a crash") {
    val df = read(1000).filter(col("doc_id") > 800 && col("doc_id") < 100)
    val scan = scanOf(df)
    assert(scan.lo == scan.hi, scan.description())
    assert(df.count() == 0)
  }

  test("column pruning reaches the generator: unrequested columns are not in the scan schema") {
    val df = read(100).select("doc_id", "lang")
    assert(scanOf(df).required.fieldNames.toSeq == Seq("doc_id", "lang"))
    assert(df.count() == 100)
  }

  test("non-pushable filters stay residual and are still applied") {
    val df = read(100).filter(col("lang") === "en")
    val scan = scanOf(df)
    assert(scan.lo == 0L && scan.hi == 100L) // lang predicate NOT consumed
    // 6 of every 10 ids are en
    assert(df.count() == 60)
    assert(df.collect().forall(_.getString(2) == "en"))
  }

  test("partitions split the pruned interval evenly and cover it exactly") {
    val scan = scanOf(read(1000, parts = 7).filter(col("doc_id") >= 300))
    val ranges = scan.planInputPartitions().map {
      case graft.sources.SynthRange(a, b) => (a, b)
    }
    assert(ranges.head._1 == 300L && ranges.last._2 == 1000L)
    assert(ranges.sliding(2).forall { case Array((_, b), (c, _)) => b == c; case _ => true })
    val sizes = ranges.map { case (a, b) => b - a }
    assert(sizes.max - sizes.min <= 1) // even split
  }

  test("aggregate pushdown: count/min/max answered O(1) from the interval — 1e9 rows instantly") {
    def aggScanOf(df: DataFrame) = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.SynthAggScan] =>
        b.scan.asInstanceOf[graft.sources.SynthAggScan]
    }
    val t0 = System.nanoTime()
    val df = read(1000000000L).agg(count(lit(1)).as("n"),
      min("doc_id").as("mn"), max("doc_id").as("mx"))
    val r = df.collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1000000000L, 0L, 999999999L)))
    assert(aggScanOf(df).isDefined, "aggregate was not pushed into the scan")
    assert(secs < 30, s"O(1) count took $secs s — rows were generated") // generating 1e9 texts would take minutes

    // filter + aggregate compose: the consumed range narrows the answer
    val f = read(1000000000L).filter(col("doc_id") >= 100 && col("doc_id") < 5000)
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
    val fr = f.collect()(0)
    assert((fr.getLong(0), fr.getLong(1), fr.getLong(2)) == ((4900L, 100L, 4999L)))
    assert(aggScanOf(f).isDefined)

    // empty interval: count 0, min/max null
    val e = read(100).filter(col("doc_id") > 1000)
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"))
    val er = e.collect()(0)
    assert(er.getLong(0) == 0L && er.isNullAt(1))

    // a grouped aggregate DECLINES pushdown and still computes correctly
    val g = read(100).groupBy("lang").agg(count(lit(1)).as("n"))
    assert(g.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.SynthAggScan] => b
    }.isEmpty)
    val byLang = g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 60L)
  }
}
