package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import graft.streaming.ServingStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path for the KV serving store (SURVEY.md §2 A7
  * — the reference's "HTTP GET over Redis counters" re-expressed as a
  * first-class Spark source):
  *
  * {{{
  * KvSourceProvider.register("counters", store.snapshot())
  * spark.read.format("graft.sources.KvSourceProvider")
  *   .option("store", "counters").load()
  *   .filter($"key".startsWith("click/hour/"))   // pushed to the source
  * }}}
  *
  * Pushdown is the point: `StringStartsWith`/`EqualTo` on `key` are
  * consumed by the ScanBuilder (the same contract a Redis SCAN-by-
  * prefix or range-partitioned KV store honors server-side), and
  * column pruning drops unreferenced counter columns before a row is
  * ever materialized.
  *
  * Scale note (100 TB): this in-memory table backs the unit tests; a
  * production deployment implements the identical four classes over a
  * remote KV (one InputPartition per key range / Redis hash slot so
  * every executor scans only its slice, with the same filter
  * pushdown). The planner-facing surface — schema, capabilities,
  * pushdown, partitioning — is what this module proves out.
  */
class KvSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvSourceProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are contractually case-insensitive, and a missing
    // store name should fail HERE with a clear message, not at scan
    // time as "no registered kv store 'null'" (round-15 review)
    val store = new CaseInsensitiveStringMap(properties).get("store")
    require(store != null && store.nonEmpty,
      "kv source requires .option(\"store\", <registered name>)")
    new KvTable(store)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object KvSourceProvider {

  /** THE ONE pushed-filter evaluator (round-15 review): the accept
    * list in `pushFilters`, the planning-time key matcher, and the
    * executor-side re-filter previously each pattern-matched the
    * filter types independently with a silently-accepting `case _ =>
    * true` fallback — extending one site without the others would
    * return UNFILTERED rows with no error, because Spark never
    * re-evaluates a filter the source accepted. Now `pushFilters`
    * accepts exactly the filters this function understands, and both
    * evaluation sites call it; an unknown filter reaching it is a
    * loud bug, not a silent no-op.
    */
  private[sources] def evalKeyFilter(key: String, f: Filter): Boolean = f match {
    case StringStartsWith("key", p) => key.startsWith(p)
    case EqualTo("key", v: String) => key == v
    case other => throw new IllegalStateException(
      s"KvSource: filter $other was pushed but has no evaluator — " +
        "pushFilters and evalKeyFilter must stay in lockstep")
  }

  private[sources] def understands(f: Filter): Boolean = f match {
    case StringStartsWith("key", _) => true
    case EqualTo("key", _: String) => true
    case _ => false
  }

  val schema: StructType = new StructType()
    .add("key", StringType, nullable = false)
    .add("n_events", LongType, nullable = false)
    .add("sum_value", DoubleType, nullable = false)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[ServingStore.CounterRow]]()

  /** Publish an immutable snapshot under a name readable via
    * `.option("store", name)`.
    */
  def register(name: String, rows: Seq[ServingStore.CounterRow]): Unit =
    registry.put(name, rows)

  private[sources] def lookup(name: String): Seq[ServingStore.CounterRow] =
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no registered kv store '$name'"))

  /** Write-path merge: one atomic read-modify-write on the registry
    * entry (ConcurrentHashMap.compute holds the bin lock), so two
    * jobs appending to the same store cannot lose each other's
    * increments. An unregistered name is an empty store — the first
    * append creates it (unlike the read path, which fails fast).
    */
  private[sources] def mergeInto(name: String,
      incoming: Seq[ServingStore.CounterRow], truncate: Boolean): Unit =
    registry.compute(name, (_, old) => {
      val base = if (truncate || old == null) Nil else old
      (base ++ incoming).groupBy(_.key).map { case (k, rs) =>
        ServingStore.CounterRow(k, rs.map(_.nEvents).sum, rs.map(_.sumValue).sum)
      }.toSeq
    })
}

final class KvTable(storeName: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft_kv($storeName)"
  override def schema(): StructType = KvSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(storeName)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(storeName)
}

final class KvScanBuilder(storeName: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = KvSourceProvider.schema
  private var pushedAgg: Option[Aggregation] = None

  /** Global COUNT(*) / SUM(counter) aggregates are answered entirely
    * source-side (complete pushdown — no Spark-side aggregate at
    * all): the serving layer's cheapest query shape, a Redis
    * GET/MGET-and-add. Grouped or exotic aggregates stay with Spark.
    */
  private def handled(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case s: Sum => !s.isDistinct && (s.column match {
        case nr: NamedReference =>
          nr.fieldNames.sameElements(Array("n_events")) ||
            nr.fieldNames.sameElements(Array("sum_value"))
        case _ => false
      })
      case _ => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean = handled(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    handled(agg) && { pushedAgg = Some(agg); true }

  /** Accept key-prefix and key-equality predicates; everything else
    * stays with Spark as a post-scan filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) =
      filters.partition(KvSourceProvider.understands)
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KvScan(storeName, pushed, required, pushedAgg)
}

final class KvScan(storeName: String, filters: Array[Filter],
    required: StructType, agg: Option[Aggregation]) extends Scan with Batch {

  /** With a pushed aggregation the scan's output IS the aggregate
    * row: one column per aggregate function, long for counts and
    * counter sums, double for value sums — the types Spark's own
    * aggregate would produce, so no Spark-side re-aggregation runs.
    * SUM columns are nullable: SQL defines SUM over zero rows as
    * NULL (COUNT stays 0), and with complete pushdown there is no
    * Spark-side aggregate left to supply that semantics for us.
    */
  override def readSchema(): StructType = agg match {
    case None => required
    case Some(a) =>
      a.aggregateExpressions.zipWithIndex.foldLeft(new StructType()) {
        case (st, (_: CountStar, i)) => st.add(s"agg_$i", LongType, nullable = false)
        case (st, (s: Sum, i)) =>
          val isDouble = s.column match {
            case nr: NamedReference => nr.fieldNames.sameElements(Array("sum_value"))
            case _ => false
          }
          st.add(s"agg_$i", if (isDouble) DoubleType else LongType, nullable = true)
        case (st, _) => st
      }
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_kv store=$storeName PushedFilters=${filters.mkString("[", ", ", "]")}" +
      agg.map(a => s" PushedAggregates=[${a.aggregateExpressions.mkString(", ")}]")
        .getOrElse("")

  /** Planning touches METADATA only: the matching key set (what a
    * remote KV exposes as SCAN keys / hash-slot topology) is consulted
    * to choose contiguous range boundaries, and each partition carries
    * just `[lo, hi)` key bounds + the pushed filters. Row payloads are
    * fetched by the PartitionReaders at execution time, executor-side —
    * the shape a remote-KV implementation must have (a partition that
    * serialized rows at planning time would funnel the whole store
    * through the driver).
    *
    * The pushed-aggregate path stays planning-side by design: with
    * complete pushdown the "server" answers the aggregate (here the
    * registry is the server stand-in) and the scan emits one row.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    def matches(key: String): Boolean =
      filters.forall(KvSourceProvider.evalKeyFilter(key, _))
    agg match {
      case Some(a) =>
        val rows = KvSourceProvider.lookup(storeName).filter(r => matches(r.key))
        // the "server side" answers the aggregate: one partition, one row
        val values: Seq[Any] = a.aggregateExpressions.toSeq.map {
          case _: CountStar => rows.size.toLong
          case s: Sum =>
            // SQL: SUM over the empty set is NULL, not 0
            if (rows.isEmpty) null
            else s.column match {
              case nr: NamedReference if nr.fieldNames.sameElements(Array("sum_value")) =>
                rows.map(_.sumValue).sum
              case _ => rows.map(_.nEvents).sum
            }
          case _ => throw new IllegalStateException("unhandled pushed aggregate")
        }
        return Array(KvAggPartition(values))
      case None => ()
    }
    val keys = KvSourceProvider.lookup(storeName).iterator
      .map(_.key).filter(matches).toIndexedSeq.sorted
    // zero matching keys at PLANNING time still yields one unbounded
    // partition (round-15 review): the live-store contract says rows
    // merged between planning and execution land in exactly one
    // partition, and an empty partition ARRAY would silently change
    // the read's snapshot semantics depending on planning-time state
    if (keys.isEmpty) Array(KvInputPartition(storeName, None, None))
    else {
      // index-balanced contiguous ranges over the sorted key space;
      // the FIRST range is unbounded below and the LAST unbounded
      // above, so a key merged into a live store between planning and
      // execution lands in exactly one partition wherever it sorts
      val slices = math.min(4, keys.size)
      (0 until slices).map { i =>
        val lo = if (i == 0) None else Some(keys(i * keys.size / slices))
        val hi =
          if (i == slices - 1) None else Some(keys((i + 1) * keys.size / slices))
        KvInputPartition(storeName, lo, hi)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required, filters)
}

/** A contiguous key range `[lo, hi)` of one store — no row payloads;
  * the reader fetches them executor-side. `None` = unbounded on that
  * side.
  */
final case class KvInputPartition(
    storeName: String, lo: Option[String], hi: Option[String])
    extends InputPartition

/** A fully-aggregated result: one row of pre-computed values. */
final case class KvAggPartition(values: Seq[Any]) extends InputPartition

final class KvReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case KvAggPartition(values) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
    case p: KvInputPartition => createRowReader(p)
  }

  /** Executor-side fetch of one key range (the remote-KV analogue is a
    * server-side SCAN over `[lo, hi)` with the filter pushed along).
    * Filters are re-applied here: range bounds were chosen from the
    * matching key set, but the range may interleave non-matching keys
    * that live between two matching ones.
    */
  private def createRowReader(partition: KvInputPartition): PartitionReader[InternalRow] = {
    val rows = KvSourceProvider.lookup(partition.storeName).iterator
      .filter { r =>
        partition.lo.forall(r.key >= _) && partition.hi.forall(r.key < _) &&
          filters.forall(KvSourceProvider.evalKeyFilter(r.key, _))
      }
      .toIndexedSeq.sortBy(_.key).iterator
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var current: ServingStore.CounterRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        current = rows.next(); true
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "key" => UTF8String.fromString(current.key)
          case "n_events" => current.nEvents
          case "sum_value" => current.sumValue
        })
      override def close(): Unit = ()
    }
  }
}

/** DSv2 WRITE path: executors serialize their partition's counter
  * rows into WriterCommitMessages; the driver-side commit merges all
  * of them into the registry atomically (per Spark's BatchWrite
  * contract, commit runs once after every task succeeded — task
  * retries discard their uncommitted messages, so the write is
  * effectively exactly-once). Overwrite mode truncates first
  * (SupportsTruncate). At scale the same four classes write straight
  * to a remote KV from the executors and commit only offsets — the
  * planner-facing contract is what this proves.
  */
final class KvWriteBuilder(storeName: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KvBatchWrite(storeName, doTruncate)
  }
}

final case class KvCommit(rows: Seq[ServingStore.CounterRow])
    extends WriterCommitMessage

final class KvBatchWrite(storeName: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // merge semantics match ServingStore: counters sum per key; the
    // registry-side compute makes concurrent appends lossless
    val incoming = messages.flatMap { case KvCommit(rows) => rows }.toSeq
    KvSourceProvider.mergeInto(storeName, incoming, truncate)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class KvWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[ServingStore.CounterRow]
      override def write(row: InternalRow): Unit =
        buf += ServingStore.CounterRow(
          row.getUTF8String(0).toString, row.getLong(1), row.getDouble(2))
      override def commit(): WriterCommitMessage = KvCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
