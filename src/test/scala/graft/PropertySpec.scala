package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.sources.CsvIngest

/** Property-based tests for the pure algorithmic cores (no SparkSession —
  * these exercise the JVM functions the distributed operators are built on). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("minhash signature: deterministic, full, and equal for equal shingle sets") {
    check(Prop.forAll(text) { t =>
      val sh = Dedup.shingles(t, 3)
      val a = Dedup.minhashSignature(sh, 128, 42L)
      val b = Dedup.minhashSignature(sh.reverse, 128, 42L) // order-insensitive
      a.length == 128 && a.sameElements(b) && !a.contains(Long.MaxValue)
    })
  }

  test("minhash estimate is bounded and exact for identical/disjoint inputs") {
    check(Prop.forAll(text, text) { (t1, t2) =>
      val s1 = Dedup.minhashSignature(Dedup.shingles(t1, 3), 128, 42L)
      val s2 = Dedup.minhashSignature(Dedup.shingles(t2, 3), 128, 42L)
      val eq = s1.zip(s2).count { case (x, y) => x == y } / 128.0
      val same = Dedup.shingles(t1, 3).toSet == Dedup.shingles(t2, 3).toSet
      (eq >= 0.0 && eq <= 1.0) && (!same || eq == 1.0)
    })
  }

  test("simhash: identical text → distance 0; hamming is symmetric and bounded") {
    check(Prop.forAll(text, text) { (t1, t2) =>
      val h1 = Dedup.simhash64(t1); val h2 = Dedup.simhash64(t2)
      val d = java.lang.Long.bitCount(h1 ^ h2)
      d >= 0 && d <= 64 && (t1 != t2 || d == 0) &&
        java.lang.Long.bitCount(h2 ^ h1) == d
    })
  }

  test("cosine: symmetric, bounded, 1.0 on self for nonzero vectors") {
    val vecGen = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))).map(_.toArray)
    check(Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val c = Similarity.cosine(a, b)
      val eps = 1e-9
      c >= -1.0 - eps && c <= 1.0 + eps &&
        math.abs(Similarity.cosine(b, a) - c) < eps &&
        (Similarity.norm(a) == 0.0 || math.abs(Similarity.cosine(a, a) - 1.0) < eps)
    })
  }

  test("normalizeHeader: idempotent, never empty for inputs with alphanumerics") {
    val header = Gen.choose(1, 20).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '-', '_', '!', '.'))))
    check(Prop.forAll(header) { h =>
      val once = CsvIngest.normalizeHeader(h)
      CsvIngest.normalizeHeader(once) == once &&
        (!h.exists(_.isLetterOrDigit) || once.nonEmpty)
    })
  }

  test("delimiter detection: recovers the delimiter for any well-formed table") {
    val cell = Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val gen = for {
      delim <- Gen.oneOf(',', ';', '\t', '|')
      nCols <- Gen.choose(2, 6)
      nRows <- Gen.choose(2, 8)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cell))
    } yield (delim, rows.map(_.mkString(delim.toString)))
    check(Prop.forAll(gen) { case (delim, lines) =>
      CsvIngest.detectDelimiter(lines) == delim
    })
  }

  test("bounded levenshtein: agrees with the full DP below the bound, k+1 above") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graftnative.EditDistance
    val sGen = Gen.choose(0, 14).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val gen = for { a <- sGen; b <- sGen; k <- Gen.choose(0, 6) } yield (a, b, k)
    check(Prop.forAll(gen) { case (a, b, k) =>
      val ua = UTF8String.fromString(a); val ub = UTF8String.fromString(b)
      val full = ua.levenshteinDistance(ub) // Spark's own reference implementation
      val got = EditDistance.bounded(ua, ub, k)
      if (full <= k) got == full else got == k + 1
    })
  }

  test("Misra-Gries: guarantees hold under ARBITRARY partitioning + merge order") {
    val mg = new graft.functions.MisraGries(8)
    val streamGen = for {
      n <- Gen.choose(1, 400)
      items <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.const("hot1")), (4, Gen.const("hot2")),
        (3, Gen.oneOf("w1", "w2", "w3")),
        (2, Gen.choose(0, 50).map(i => s"tail$i"))))
      nChunks <- Gen.choose(1, 7)
    } yield (items, nChunks)
    check(Prop.forAll(streamGen) { case (items, nChunks) =>
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      // simulate Spark: partition arbitrarily, reduce per partition, merge
      val chunks = items.grouped(math.max(1, items.size / nChunks)).toSeq
      val summary = chunks.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
      val bound = n / 8
      val neverOver = summary.forall { case (s, c) => c <= truth(s) }
      val boundedUnder = summary.forall { case (s, c) => truth(s) - c <= bound }
      val heavyPresent = truth.collect { case (s, c) if c > bound => s }
        .forall(summary.contains)
      val atMostK = summary.size <= 7
      neverOver && boundedUnder && heavyPresent && atMostK
    })
  }

  test("BMP round-trip: arbitrary dims and colors decode exactly") {
    val gen = for {
      w <- Gen.choose(1, 16); h <- Gen.choose(1, 16)
      r <- Gen.choose(0, 255); g <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    } yield (w, h, r, g, b)
    check(Prop.forAll(gen) { case (w, h, r, g, b) =>
      val f = Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, (_, _) => (r, g, b))).get
      f.width == w && f.height == h &&
        f.meanR == r.toDouble && f.meanG == g.toDouble && f.meanB == b.toDouble
    })
  }
}
