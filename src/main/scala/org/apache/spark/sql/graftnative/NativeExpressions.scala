package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Banded edit distance: exact Levenshtein when it is ≤ k, else k+1.
  * O(k·min(n,m)) time and O(m) space vs the full DP's O(n·m) — for the
  * record-linkage case (k of 1-3, strings of tens of chars) that's an
  * order of magnitude less work per candidate pair, and the early row-min
  * exit abandons hopeless pairs after a few rows.
  *
  * TOP-LEVEL object on purpose: generated Java (janino) calls
  * `EditDistance.bounded(...)` through the static forwarders the Scala
  * compiler only emits for top-level objects. As a nested object the call
  * site `NativeExpressions.EditDistance.bounded` does not exist in Java —
  * janino failed to compile and every call silently fell back to
  * interpreted (non-codegen) evaluation. */
object EditDistance {
  def bounded(sa: org.apache.spark.unsafe.types.UTF8String,
              sb: org.apache.spark.unsafe.types.UTF8String, k: Int): Int = {
    val a = sa.toString; val b = sb.toString
    if (a == b) return 0
    val n = a.length; val m = b.length
    if (math.abs(n - m) > k) return k + 1
    val INF = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else INF; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      java.util.Arrays.fill(cur, INF)
      if (lo == 1 && i <= k) cur(0) = i
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > INF) v = INF
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= INF) return INF
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), INF)
  }
}

/** Jaro-Winkler similarity — standard Winkler variant (prefix ≤ 4,
  * p = 0.1, boost threshold 0.7), with the empty-string convention of the
  * common C++ implementations (either side empty → 0.0, even both). The
  * float expression tree (division and accumulation order) is fixed to the
  * textbook form `(m/|a| + m/|b| + (m−t)/m)/3`, then `j + ℓ·0.1·(1−j)` —
  * verified bit-identical to DuckDB's `jaro_winkler_similarity` on 30k
  * random pairs, so oracle checks compare EXACT doubles. Comparison is by
  * UTF-16 code unit (exact for ASCII/BMP content).
  *
  * Top-level object: janino resolves only the static forwarders of
  * top-level objects (see [[EditDistance]]). */
object JaroWinkler {
  def similarity(sa: org.apache.spark.unsafe.types.UTF8String,
                 sb: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = sa.toString; val b = sb.toString
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md); val hi = math.min(i + md + 1, l2)
      var j = lo
      var unmatched = true
      while (j < hi && unmatched) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md1 = m.toDouble
    val j = (md1 / l1 + md1 / l2 + (m - t) / md1) / 3.0
    if (j > 0.7) {
      val lim = math.min(4, math.min(l1, l2))
      var pl = 0
      var stop = false
      while (pl < lim && !stop) {
        if (a.charAt(pl) == b.charAt(pl)) pl += 1 else stop = true
      }
      j + pl * 0.1 * (1.0 - j)
    } else j
  }
}

/** Native Catalyst expressions for graft's vector hot paths.
  *
  * Lives under `org.apache.spark.sql` (the standard Spark-extension-library
  * placement, cf. Delta/Sedona) because `AbstractDataType` and
  * `ExpressionUtils` are `private[sql]`. The public graft-facing wrapper is
  * `graft.functions.Native`.
  */
object NativeExpressions {

  /** Cosine similarity over two `array<float>` columns, evaluated inside
    * whole-stage codegen: a tight primitive loop over the Tungsten array
    * format — no Encoder deserialization, no boxing, no interpreted
    * higher-order-function overhead. Mismatched lengths compare the common
    * prefix; zero-norm inputs yield 0.0. */
  case class CosineSimilarityF32(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_f32"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i); val yi = y.getFloat(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  float $xi = $a.getFloat($i);
           |  float $yi = $b.getFloat($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def cosineF32(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityF32(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** `levenshtein_bounded(s, t, k)`: exact distance if ≤ k, else k+1. The
    * DP runs in a static helper; codegen emits the call directly so the
    * expression stays inside WholeStageCodegen (same pattern as Spark's own
    * levenshtein → UTF8String intrinsic). */
  case class LevenshteinBounded(first: Expression, second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType)
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "levenshtein_bounded"

    override def nullSafeEval(a: Any, b: Any, k: Any): Any =
      EditDistance.bounded(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        k.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, k) =>
        s"org.apache.spark.sql.graftnative.EditDistance.bounded($a, $b, $k)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  def levenshteinBounded(a: Column, b: Column, k: Column): Column =
    ExpressionUtils.column(LevenshteinBounded(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(k)))

  /** `jaro_winkler(a, b)`: similarity in [0,1], codegen'd via the static
    * [[JaroWinkler]] helper (same pattern as [[LevenshteinBounded]]). */
  case class JaroWinklerSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      JaroWinkler.similarity(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graftnative.JaroWinkler.similarity($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distributed Bloom-filter build over a column, using the engine's own
    * runtime-filter aggregate (`BloomFilterAggregate`, the machinery behind
    * `spark.sql.optimizer.runtime.bloomFilter.enabled`): partial sketches
    * are built map-side per partition and OR-merged, so no executor ever
    * sees more than its partition's keys and the driver receives one binary
    * blob. Child must be integral/string; we feed it `xxhash64(key)` longs
    * from the caller for type-uniform build/probe. */
  def bloomFilterAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Codegen'd Bloom probe (`BloomFilterMightContain`) against a constant
    * (lit) serialized filter — evaluates inside whole-stage codegen right
    * on top of the scan, unlike a broadcast-variable lambda which forces
    * row deserialization and kills column pruning. */
  def bloomMightContain(bloomBinary: Column, key: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloomBinary), ExpressionUtils.expression(key)))

  /** Aggregation buffer for [[BoundedCollectSet]]: a distinct-value set
    * with a hard size cap. Once a key's distinct count would exceed the
    * cap, the set is DISCARDED and the buffer carries only the overflow
    * flag — per-key memory is ≤ cap elements at every moment, on the
    * update side, the merge side, and across serialization. */
  final class BoundedSetBuffer {
    var overflowed: Boolean = false
    val set: scala.collection.mutable.HashSet[Any] =
      scala.collection.mutable.HashSet.empty[Any]
  }

  /** `collect_set` with a HARD per-key buffer bound: collects up to `cap`
    * distinct non-null values; a key that exceeds the cap evaluates to
    * NULL instead of an array (and its buffer is dropped immediately).
    * Callers route NULL-set keys through a streaming join fallback — the
    * hub-safety valve for star-contraction connected components, where a
    * component root's neighborhood grows toward |component| and an
    * unbounded collect_set is a single-task OOM at 100 TB (round-12
    * advisory). Below the cap the result is exactly collect_set's
    * (distinct, unordered, nulls skipped). */
  case class BoundedCollectSet(
      child: Expression,
      cap: Int,
      overflowCounter: Option[org.apache.spark.util.LongAccumulator] = None,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[BoundedSetBuffer]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeProjection, UnsafeRow}
    import org.apache.spark.sql.catalyst.util.GenericArrayData

    require(cap >= 1, "bounded_collect_set cap must be >= 1")

    override def createAggregationBuffer(): BoundedSetBuffer = new BoundedSetBuffer()

    override def update(b: BoundedSetBuffer, input: InternalRow): BoundedSetBuffer = {
      if (!b.overflowed) {
        val v = child.eval(input)
        if (v != null && !b.set.contains(v)) {
          if (b.set.size >= cap) { b.overflowed = true; b.set.clear() }
          else b.set += InternalRow.copyValue(v)
        }
      }
      b
    }

    override def merge(b: BoundedSetBuffer, o: BoundedSetBuffer): BoundedSetBuffer = {
      if (o.overflowed) { b.overflowed = true; b.set.clear() }
      else if (!b.overflowed) {
        val it = o.set.iterator
        while (it.hasNext && !b.overflowed) {
          val v = it.next()
          if (!b.set.contains(v)) {
            if (b.set.size >= cap) { b.overflowed = true; b.set.clear() }
            else b.set += v
          }
        }
      }
      b
    }

    override def eval(b: BoundedSetBuffer): Any =
      if (b.overflowed) {
        // eval runs once per key in the FINAL aggregation, so the counter
        // reads "number of overflowed keys this job" on the driver after
        // the action (stage retries can inflate it; callers test > 0 only)
        overflowCounter.foreach(_.add(1L))
        null
      } else new GenericArrayData(b.set.toArray)

    @transient private lazy val projection = UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false)))

    override def serialize(b: BoundedSetBuffer): Array[Byte] = {
      val arr: Array[Any] = if (b.overflowed) Array.empty[Any] else b.set.toArray
      val rowBytes = projection.apply(
        InternalRow.apply(new GenericArrayData(arr))).getBytes
      val out = new Array[Byte](rowBytes.length + 1)
      out(0) = if (b.overflowed) 1.toByte else 0.toByte
      System.arraycopy(rowBytes, 0, out, 1, rowBytes.length)
      out
    }

    override def deserialize(bytes: Array[Byte]): BoundedSetBuffer = {
      val b = new BoundedSetBuffer()
      b.overflowed = bytes(0) == 1.toByte
      if (!b.overflowed) {
        val row = new UnsafeRow(1)
        row.pointTo(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 1, bytes.length - 1)
        row.getArray(0).foreach(child.dataType, (_, x: Any) => b.set += x)
      }
      b
    }

    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "bounded_collect_set"
    override def defaultResult: Option[Literal] =
      Option(Literal.create(Array.empty[Any], dataType))

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
      copy(child = newChild)
  }

  def boundedCollectSet(e: Column, cap: Int,
      overflowCounter: Option[org.apache.spark.util.LongAccumulator] = None): Column =
    ExpressionUtils.column(
      BoundedCollectSet(ExpressionUtils.expression(e), cap, overflowCounter)
        .toAggregateExpression())
}
