package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed `Aggregator` — the
  * deterministic counterpart to the count-min sketch: k-1 counters total
  * (constant memory per partition at any scale), any item with true
  * frequency > N/k is GUARANTEED present, and every reported count
  * undercounts by at most N/k (count-min overcounts; Misra–Gries
  * undercounts — the two bracket the truth).
  *
  * Mergeability (what makes it a valid distributed aggregate): merging sums
  * counters, then subtracts the k-th largest value from all and drops
  * non-positive ones — the classic Agarwal et al. mergeable-summaries
  * result, so partial aggregation on the map side composes exactly like any
  * built-in agg. Register with `functions.udaf(new MisraGries(k))` for SQL.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "k must be at least 2")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (buf.contains(item)) buf.updated(item, buf(item) + 1L)
    else if (buf.size < k - 1) buf.updated(item, 1L)
    else buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (s, c)) =>
      m.updated(s, m.getOrElse(s, 0L) + c)
    }
    if (summed.size <= k - 1) summed
    else {
      // subtract the k-th largest count from everything, drop <= 0
      val cut = summed.values.toSeq.sortBy(-_)(Ordering.Long).apply(k - 1)
      summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
