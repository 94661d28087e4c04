package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native AS-OF join: a whole-operator Catalyst extension — custom
  * LogicalPlan node + SparkStrategy + SparkPlan — for the point-in-time
  * lookup Spark has no built-in operator for (reference analog: the same
  * "latest record at-or-before this event" semantics graft.operators.AsOf
  * expresses with the union + running-window trick).
  *
  * This is the engine's demonstration of extension path (c): when an
  * operator's SEMANTICS (not just a scalar function) are missing, declare a
  * logical node, plan it with an injected strategy, and let Catalyst's
  * EnsureRequirements place the exchanges and sorts from the operator's
  * declared requirements — the operator itself never schedules a shuffle.
  *
  * Physical algorithm: both sides hash-cluster on the key and sort within
  * partitions by (key, time) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so Catalyst inserts (and AQE tunes) the
  * exchanges. Each partition then runs a single O(|L|+|R|) merge scan: the
  * right cursor advances while its (key, time) is at-or-before the current
  * left row, retaining the latest candidate per key; every left row joins
  * against the retained candidate without rescanning. Versus the union +
  * window form, neither side's rows are struct-wrapped and no window state
  * machine runs — at the cost of leaving whole-stage codegen (measured
  * same-ballpark at bench scale; the union form remains the default in
  * [[graft.operators.AsOf]], this operator is parity-checked against it).
  *
  * Contract: `rightTie` must give same-(key,time) right rows a total order
  * (the LAST in (time, tie) order wins — the highest tie value, matching
  * AsOf.join); NULL keys and NULL times never match (SQL join semantics).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression,
                        isInner: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. Injected per-session (see
  * [[NativeAsOf.ensureStrategy]]) or via graft.GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, inner) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression, isInner: Boolean,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // EnsureRequirements reads these and inserts the exchanges + sorts; the
  // operator never constructs a shuffle itself
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val inner = isInner
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkP = UnsafeProjection.create(Seq(lk), lOut)
      val rkP = UnsafeProjection.create(Seq(rk), rOut)
      val ltP = UnsafeProjection.create(Seq(lt), lOut)
      val rtP = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joiner = new JoinedRow
      // downstream exchanges serialize UnsafeRow — project the JoinedRow.
      // Bind against `output` (right side nullable), not the raw child
      // attributes: non-nullable bound refs would read the outer-join
      // null row as zeros.
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        // held right cursor — copies, because upstream sort reuses row buffers
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // latest at-or-before candidate for the current left key
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _
        private var nextOut: InternalRow = _
        private var nextReady = false

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rkP(rRow).copy()
            rTime = rtP(rRow).copy()
          } else rRow = null
        }
        advanceRight()

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lkP(l).copy()
            val lTime = ltP(l).copy()
            if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
              lastMatch = null; lastMatchKey = null
            }
            var scanning = true
            while (scanning && rRow != null) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight() // right key already passed: discard
              else if (c == 0 && !rKey.isNullAt(0) && !rTime.isNullAt(0) &&
                  !lTime.isNullAt(0) && timeOrd.compare(rTime, lTime) <= 0) {
                lastMatch = rRow; lastMatchKey = rKey // latest-so-far wins
                advanceRight()
              } else scanning = false // right is ahead: keep for later lefts
            }
            val matched = lastMatch != null && !lKey.isNullAt(0) &&
              keyOrd.compare(lastMatchKey, lKey) == 0
            if (matched) { nextOut = outProj(joiner(l, lastMatch)); numOut += 1 }
            else if (!inner) { nextOut = outProj(joiner(l, nullRight)); numOut += 1 }
          }
          nextReady = true
        }

        override def hasNext: Boolean = {
          if (!nextReady) computeNext()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!nextReady) computeNext()
          nextReady = false
          nextOut
        }
      }
    }
  }
}

/** DataFrame-level entry for the native operator. */
object NativeAsOf {

  /** Idempotently add the planner strategy to this session (the
    * config-free runtime twin of `spark.sql.extensions`). */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** AS-OF join `left` to the latest `right` row with
    * rightTime <= leftTime on equal keys. Output = all left columns ++ all
    * right columns (nullable). `tieBreak` orders same-(key,time) right rows
    * (highest wins). Left and right must not share attribute lineage
    * (alias one side for a self-join). */
  def join(left: DataFrame, right: DataFrame,
           leftKeyCol: String, rightKeyCol: String,
           leftTimeCol: String, rightTimeCol: String,
           tieBreak: String, inner: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side column '$n' not found"))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKeyCol, "left"), attr(rPlan, rightKeyCol, "right"),
        attr(lPlan, leftTimeCol, "left"), attr(rPlan, rightTimeCol, "right"),
        attr(rPlan, tieBreak, "right"), inner))
  }
}
