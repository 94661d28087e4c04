package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Transform, aggregate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-documents DataSourceV2 — the scale-test corpus
  * generator. `spark.read.format("synthdocs").option("rows", N)` yields a
  * `documents`-shaped table whose every cell is a PURE FUNCTION of the row
  * id: no files, no state, no RNG — so a 100 TB corpus materializes only as
  * it streams through the operators under test, identical on every run, at
  * any partitioning, on any engine that can evaluate the integer formulas
  * (the DuckDB oracle reproduces it from `range()`).
  *
  * Spark-native depth, not a toy: the ScanBuilder implements REAL
  * `SupportsPushDownFilters` (doc_id range predicates narrow the generated
  * [lo, hi) interval — the generator-side analog of parquet row-group
  * pruning; fully-consumed predicates are NOT re-evaluated post-scan) and
  * `SupportsPushDownRequiredColumns` (unrequested columns are never
  * synthesized — `select count(*)` generates zero strings). Partition
  * planning splits the pruned interval evenly, so a pushed point-lookup
  * plans exactly one non-empty input partition.
  *
  * Row formulas (mirrored verbatim in the q147 oracle SQL):
  *   n_words(i) = 5 + (i·37 mod 46)
  *   word(i,k)  = "w" + ((i+1)·1103515 + k·12345 mod 1000)
  *   text(i)    = words joined with one space;  n_chars = length(text)
  *   lang(i)    = en/es/fr/de at 6/2/1/1 in 10 by i mod 10
  *   source(i)  = "synth" + (i mod 5)
  */
class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "synthdocs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthDocs.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
}

object SynthDocs {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  def nWords(i: Long): Int = (5 + (i * 37) % 46).toInt

  def text(i: Long): String = {
    val sb = new java.lang.StringBuilder
    var k = 0L
    val n = nWords(i)
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append('w').append(((i + 1) * 1103515 + k * 12345) % 1000)
      k += 1
    }
    sb.toString
  }

  def lang(i: Long): String = (i % 10) match {
    case m if m < 6 => "en"
    case m if m < 8 => "es"
    case m if m < 9 => "fr"
    case _          => "de"
  }

  def source(i: Long): String = "synth" + (i % 5)
}

class SynthDocsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthdocs($rows)"
  override def schema(): StructType = SynthDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

class SynthScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = SynthDocs.Schema
  private var aggFuncs: Option[Seq[aggregate.AggregateFunc]] = None

  private def asLong(v: Any): Option[Long] = v match {
    case n: Long => Some(n)
    case n: Int  => Some(n.toLong)
    case _       => None
  }

  /** Consume doc_id range predicates into the generated interval; everything
    * else is residual (returned for Spark's post-scan Filter). A consumed
    * predicate is applied EXACTLY by construction, so it is safe to drop
    * from the post-scan filter chain. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition {
      case EqualTo("doc_id", v)            => asLong(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, n + 1); true }
      case GreaterThan("doc_id", v)        => asLong(v).exists { n => lo = math.max(lo, n + 1); true }
      case GreaterThanOrEqual("doc_id", v) => asLong(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("doc_id", v)           => asLong(v).exists { n => hi = math.min(hi, n); true }
      case LessThanOrEqual("doc_id", v)    => asLong(v).exists { n => hi = math.min(hi, n + 1); true }
      case _ => false
    }
    pushed = consumed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Aggregate pushdown — the generator-side analog of parquet footer
    * statistics, one better: COUNT(*), MIN(doc_id), MAX(doc_id) over a
    * deterministic [lo, hi) interval are CLOSED FORMS, so the scan answers
    * them in O(1) without synthesizing a single row (a count over 10⁹
    * generated docs returns instantly). Complete pushdown (no grouping,
    * only interval-answerable functions); anything else declines and runs
    * as a normal aggregate over the generated rows. Filters have already
    * been consumed into [lo, hi) by the time Spark offers the aggregate,
    * so filter+aggregate compose exactly. */
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    aggAnswerable(agg)
  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    if (!aggAnswerable(agg)) return false
    aggFuncs = Some(agg.aggregateExpressions().toSeq)
    true
  }
  private def aggAnswerable(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case _: aggregate.CountStar => true
      case m: aggregate.Min => m.column().describe() == "doc_id"
      case m: aggregate.Max => m.column().describe() == "doc_id"
      case _ => false
    }

  // contradictory predicates (lo > hi) collapse to the empty interval
  override def build(): Scan = aggFuncs match {
    case Some(fs) => SynthAggScan(lo, math.max(lo, hi), fs)
    case None     => SynthScan(lo, math.max(lo, hi), partitions, required)
  }
}

/** O(1) aggregate answer for a pushed count/min/max over the generated
  * interval: one partition, one row, computed from the bounds alone. */
case class SynthAggScan(lo: Long, hi: Long,
                        funcs: Seq[aggregate.AggregateFunc])
  extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.map {
    case _: aggregate.CountStar => StructField("count(*)", LongType, nullable = false)
    case m: aggregate.Min => StructField(m.describe(), LongType)
    case m: aggregate.Max => StructField(m.describe(), LongType)
  })
  override def toBatch: Batch = this
  override def description(): String = s"SynthAggScan[$lo, $hi) ${funcs.map(_.describe).mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = funcs
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val SynthRange(from, until) = partition
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = until <= from
        val values: Array[Any] = fs.map {
          case _: aggregate.CountStar => math.max(0L, until - from)
          case _: aggregate.Min => if (empty) null else from
          case _: aggregate.Max => if (empty) null else until - 1
        }.toArray
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}

/** Case class on purpose: specs (and humans) can fish it out of the
  * `BatchScanExec` and read exactly what interval/schema survived pushdown. */
case class SynthScan(lo: Long, hi: Long, partitions: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan[$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val len = math.max(0L, hi - lo)
    val parts = math.max(1, math.min(partitions, if (len == 0) 1 else len).toInt)
    Array.tabulate(parts) { p =>
      SynthRange(lo + p * len / parts, lo + (p + 1) * len / parts)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

case class SynthRange(from: Long, until: Long) extends InputPartition

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(from, until) = partition
    new PartitionReader[InternalRow] {
      private var i = from - 1
      override def next(): Boolean = { i += 1; i < until }
      override def get(): InternalRow = {
        // synthesize ONLY the requested columns; text is shared by
        // text/n_chars and built at most once per row
        lazy val t = SynthDocs.text(i)
        val values: Array[Any] = required.fieldNames.map {
          case "doc_id"  => i
          case "text"    => UTF8String.fromString(t)
          case "lang"    => UTF8String.fromString(SynthDocs.lang(i))
          case "source"  => UTF8String.fromString(SynthDocs.source(i))
          case "n_chars" => t.length.toLong
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
