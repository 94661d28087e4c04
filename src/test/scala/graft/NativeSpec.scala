package graft

import org.apache.spark.sql.functions._
import graft.functions.Native

/** The codegen'd cosine_f32 expression: value correctness (vs the library
  * math), null/zero/mismatch edges, and codegen/interpreted agreement. */
class NativeSpec extends SparkSpec {
  import spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a.toArray, b.toArray)).toDF("a", "b")

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    df2(a, b).select(Native.cosineF32(col("a"), col("b"))).as[Double].head()

  test("cosine_f32: known geometries") {
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1f, 0f), Seq(-1f, 0f)) + 1.0) < 1e-12)
  }

  test("cosine_f32: zero vector yields 0.0, not NaN") {
    assert(cos(Seq(0f, 0f), Seq(1f, 1f)) == 0.0)
  }

  test("cosine_f32: mismatched lengths compare the common prefix") {
    assert(math.abs(cos(Seq(1f, 0f, 5f), Seq(1f, 0f)) -
      operators.Similarity.cosine(Array(1f, 0f), Array(1f, 0f))) < 1e-9)
  }

  test("cosine_f32: null input propagates null") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val out = df.select(Native.cosineF32(col("a"), col("b")).as("c")).collect()
    assert(out.head.isNullAt(0))
  }

  test("cosine_f32: matches JVM math on random vectors (codegen path)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), Native.cosineF32(col("a"), col("b")).as("c"))
      .orderBy("id").as[(Long, Double)].collect()
    rows.zip(got).foreach { case ((_, a, b), (_, c)) =>
      assert(math.abs(c - operators.Similarity.cosine(a, b)) < 1e-6) // summation-order tolerance
    }
  }

  test("cosine_f32: stays inside WholeStageCodegen") {
    // literal data constant-folds to LocalTableScan; range() forces a real plan
    val df = spark.range(100)
      .select(array(col("id").cast("float"), lit(1f)).as("a"),
        array(lit(2f), col("id").cast("float")).as("b"))
      .select(Native.cosineF32(col("a"), col("b")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_f32"), plan) // * marks WholeStageCodegen
    assert(df.agg(sum("c")).as[Double].head() > 0.0) // and it executes
  }

  test("levenshtein_bounded: exact below bound, k+1 above, callable from SQL, codegen'd") {
    Native.registerSql(spark)
    val r = spark.sql(
      """SELECT levenshtein_bounded('kitten', 'sitting', 3) AS a,
        |       levenshtein_bounded('kitten', 'sitting', 2) AS b,
        |       levenshtein_bounded('same', 'same', 0) AS c""".stripMargin).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3 && r.getInt(2) == 0) // d=3; bound 2 → 3 (=k+1)
    val df = spark.range(50).selectExpr("CAST(id AS STRING) AS s")
      .select(Native.levenshteinBounded(col("s"), lit("25"), lit(2)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [levenshtein_bounded"), plan)
    assert(df.where(col("d") === 0).count() == 1) // only "25" itself
  }

  test("jaro_winkler: textbook values, empty/null edges, SQL-callable, codegen'd") {
    Native.registerSql(spark)
    val r = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS a,
        |       jaro_winkler('DWAYNE', 'DUANE') AS b,
        |       jaro_winkler('same', 'same') AS c,
        |       jaro_winkler('', 'x') AS d,
        |       jaro_winkler('', '') AS e,
        |       jaro_winkler('abc', NULL) AS f""".stripMargin).head()
    // BIT-equal to DuckDB's jaro_winkler_similarity on the classics
    assert(r.getDouble(0) == 0.9611111111111111, r.toString)  // MARTHA/MARHTA
    assert(r.getDouble(1) == 0.8400000000000001, r.toString)  // DWAYNE/DUANE
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)        // DuckDB empty convention
    assert(r.isNullAt(5))
    val df = spark.range(50).selectExpr("CAST(id AS STRING) AS s")
      .select(Native.jaroWinkler(col("s"), lit("25")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [jaro_winkler"), plan)
    assert(df.where(col("j") === 1.0).count() == 1)
  }

  test("bounded_collect_set: ≡ collect_set below cap; NULL past cap; merge-safe") {
    // 3 keys: k=1 has 3 distinct values (under cap 4), k=2 has exactly 4
    // (at cap — still collected), k=3 has 6 (over cap → NULL). Duplicates
    // and nulls must not count toward the cap. 7 partitions force
    // cross-partition buffer merges through serialize/deserialize.
    val rows = Seq.tabulate(40)(i => (1L, (i % 3).toLong)) ++
      Seq.tabulate(40)(i => (2L, (i % 4).toLong)) ++
      Seq.tabulate(40)(i => (3L, (i % 6).toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val got = df.groupBy("k")
      .agg(Native.boundedCollectSet(col("v"), 4).as("s"),
        collect_set(col("v")).as("ref"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getSeq[Long](1).sorted),
          r.getSeq[Long](2).sorted))
      .toMap
    assert(got(1L)._1 == got(1L)._2, got(1L).toString)
    assert(got(2L)._1 == got(2L)._2, got(2L).toString)
    assert(got(3L)._1 == null, got(3L).toString)
    // null inputs are skipped exactly like collect_set
    val withNulls = Seq((9L, Some(1L)), (9L, None), (9L, Some(2L)), (9L, None))
      .toDF("k", "v").repartition(3)
    val g2 = withNulls.groupBy("k")
      .agg(Native.boundedCollectSet(col("v"), 4).as("s")).collect().head
    assert(g2.getSeq[Long](1).sorted == Seq(1L, 2L))
    // string element type round-trips serialization too
    val strs = Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "x"), (2L, "y"), (2L, "z"))
      .toDF("k", "v").repartition(5)
    val g3 = strs.groupBy("k")
      .agg(Native.boundedCollectSet(col("v"), 2).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1).sorted))
      .toMap
    assert(g3(1L) == Seq("a", "b"))
    assert(g3(2L) == null) // 3 distinct > cap 2
  }
}
