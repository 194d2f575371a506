package graft.sources.v2

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.UUID

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the reference's HTTP generator endpoint
  * (EtlProcess.cs:212-243; SURVEY.md §2.1 S1/S8 names "a tiny DataSource
  * V2 `TableProvider`" as the production mapping for a remote source).
  *
  * `spark.read.format("sample-items").option("count", N).load()`
  *
  * This is the engine's template for wrapping ANY external feed as a
  * first-class Spark table, with the three properties that matter at
  * 100 TB:
  *   - **planInputPartitions** splits the keyspace into `slices`
  *     contiguous ranges, so the fetch parallelizes across executors
  *     (the reference generates on one thread);
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *     projection reaches the source, which then never materializes
  *     unused columns;
  *   - **filter pushdown** (`SupportsPushDownFilters`): equality/IN on
  *     the partition column becomes a residue test and range predicates
  *     on `i` narrow the generated span — the source emits exactly the
  *     surviving rows instead of generating-then-filtering. Plus
  *     partial limit pushdown (`SupportsPushDownLimit`) capping each
  *     slice.
  *
  * Row content is IDENTICAL to `graft.sources.Generator.sampleItems`
  * (same quirky `yyyyMMhhmm` Name stamp, same `Partition_{A,B,C}` by
  * `i % 3`) — asserted row-for-row in Dsv2SourceSpec.
  *
  * Options: `count` (required), `slices` (default 8), `frozenNow`
  * ("yyyy-MM-dd HH:mm:ss"; wall clock when absent — mirrors the
  * per-query-constant `current_timestamp()`), `deterministicIds`
  * (id = i as string instead of a fresh UUID — EtlProcess.cs:230).
  */
class SampleItemsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sample-items"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SampleItemsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SampleItemsTable(new CaseInsensitiveStringMap(properties))
}

object SampleItemsSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("Date", StringType, nullable = false),
    StructField("Desc", StringType, nullable = false),
    StructField("Done", StringType, nullable = false),
    StructField("Name", StringType, nullable = false),
    StructField("Pr", StringType, nullable = false),
    StructField("LogicalPartition", StringType, nullable = false),
    StructField("i", LongType, nullable = false)))

  private[v2] val residueOf: Map[String, Int] =
    Map("Partition_A" -> 0, "Partition_B" -> 1, "Partition_C" -> 2)
}

private[v2] class SampleItemsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"sample_items(count=${options.get("count")})"
  override def schema(): StructType = SampleItemsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SampleItemsScanBuilder(opts)
}

private[v2] class SampleItemsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private val count: Long = {
    val c = options.get("count")
    require(c != null, "sample-items source requires option 'count'")
    c.toLong
  }
  private val slices: Int = options.getInt("slices", 8)
  private var required: StructType = SampleItemsSource.schema
  private var residues: Set[Int] = Set(0, 1, 2)
  private var lo: Long = 1L
  private var hi: Long = count
  private var limit: Int = -1
  private var accepted: Array[Filter] = Array.empty

  private def isCol(attr: String, name: String): Boolean =
    attr.equalsIgnoreCase(name)

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Returns true (and narrows state) iff the source fully enforces f. */
  private def tryAbsorb(f: Filter): Boolean = f match {
    case IsNotNull(_) => true // no column is ever null
    case EqualTo(a, v: String) if isCol(a, "LogicalPartition") =>
      residues = residues.intersect(
        SampleItemsSource.residueOf.get(v).toSet); true
    case In(a, vs) if isCol(a, "LogicalPartition") =>
      residues = residues.intersect(
        vs.collect { case s: String => SampleItemsSource.residueOf.get(s) }
          .flatten.toSet); true
    case EqualTo(a, v) if isCol(a, "i") =>
      asLong(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, n); true }
    case GreaterThan(a, v) if isCol(a, "i") =>
      asLong(v).exists { n => lo = math.max(lo, n + 1); true }
    case GreaterThanOrEqual(a, v) if isCol(a, "i") =>
      asLong(v).exists { n => lo = math.max(lo, n); true }
    case LessThan(a, v) if isCol(a, "i") =>
      asLong(v).exists { n => hi = math.min(hi, n - 1); true }
    case LessThanOrEqual(a, v) if isCol(a, "i") =>
      asLong(v).exists { n => hi = math.min(hi, n); true }
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (in, out) = filters.partition(tryAbsorb)
    accepted = in
    out
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // each slice is capped at `limit`, the global limit still applies above
  override def isPartiallyPushed(): Boolean = true

  // ---- COMPLETE aggregate pushdown: COUNT(*) / COUNT(i) / MIN(i) /
  // MAX(i) over the (already filter-narrowed) keyspace have CLOSED FORMS
  // — the generator answers them in O(1) on the driver without ever
  // producing a row. The template every range-addressable external feed
  // (object-store manifest, keyed REST API) should follow: an aggregate
  // a source can answer from metadata must not scan.
  private var pushedAggs: Option[Array[aggregate.AggregateFunc]] = None

  private def isI(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.length == 1 && nr.fieldNames()(0).equalsIgnoreCase("i")
      case _ => false
    }

  private def canHandle(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && limit < 0 &&
      agg.aggregateExpressions.forall {
        case _: aggregate.CountStar => true
        case c: aggregate.Count => !c.isDistinct && isI(c.column)
        case m: aggregate.Min => isI(m.column)
        case m: aggregate.Max => isI(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    canHandle(agg)

  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    canHandle(agg) && { pushedAggs = Some(agg.aggregateExpressions); true }

  override def build(): Scan = pushedAggs match {
    case Some(funcs) =>
      new SampleItemsAggScan(funcs, residues, lo, hi)
    case None =>
      val now = Option(options.get("frozenNow"))
        .map(s => LocalDateTime.parse(
          s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
        .getOrElse(LocalDateTime.now())
      new SampleItemsScan(
        count, slices, required, residues, lo, hi, limit,
        now.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")),
        "Item_" + now.format(DateTimeFormatter.ofPattern("yyyyMMhhmm")),
        options.getBoolean("deterministicIds", false),
        // minted ONCE per scan on the driver: production ids are random
        // across queries but a pure function of (seed, i) within one, so a
        // recomputed partition (executor loss, cache eviction, second
        // action) reproduces identical ids — java.util.UUID.randomUUID in
        // the reader would silently break that, which is why Spark's own
        // uuid() expression is seeded per query
        idSeed = new java.security.SecureRandom().nextLong())
  }
}

private[v2] class SampleItemsScan(
    count: Long, slices: Int, required: StructType, residues: Set[Int],
    lo: Long, hi: Long, limit: Int, dateStr: String, namePrefix: String,
    deterministicIds: Boolean, idSeed: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftSampleItems(count=$count, slices=$slices, range=[$lo,$hi], " +
      s"residues=${residues.toSeq.sorted.mkString("{", ",", "}")}, " +
      s"limit=$limit, columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo + 1
    if (span <= 0 || residues.isEmpty) return Array.empty
    val nSlices = math.max(1, math.min(slices, span).toInt)
    val per = span / nSlices
    val extra = span % nSlices
    var start = lo
    (0 until nSlices).map { s =>
      val len = per + (if (s < extra) 1 else 0)
      val p = SampleItemsSlice(start, start + len - 1, residues.toArray.sorted,
        dateStr, namePrefix, count, deterministicIds, limit,
        required.fieldNames, idSeed)
      start += len
      p: InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new SampleItemsReader(p.asInstanceOf[SampleItemsSlice])
    }
}

/** Closed-form answers for a pushed COUNT/MIN/MAX aggregation: one
  * partition emitting ONE pre-computed row, no generation at all. The
  * keyspace is {i ∈ [lo, hi] : i mod 3 ∈ residues} after filter
  * pushdown, so each statistic is modular arithmetic on the bounds. */
private[v2] class SampleItemsAggScan(
    funcs: Array[aggregate.AggregateFunc], residues: Set[Int],
    lo: Long, hi: Long) extends Scan with Batch {

  // first/last key of residue r inside [lo, hi], if any
  private def first(r: Int): Option[Long] = {
    val f = lo + ((r - lo % 3 + 3) % 3)
    if (f <= hi) Some(f) else None
  }
  private def last(r: Int): Option[Long] = {
    val l = hi - ((hi % 3 - r + 3) % 3)
    if (l >= lo) Some(l) else None
  }
  private def residCount(r: Int): Long =
    first(r).map(f => (hi - f) / 3 + 1).getOrElse(0L)

  private val totalCount: Long =
    if (hi < lo) 0L else residues.toSeq.map(residCount).sum
  private val minI: Option[Long] =
    if (hi < lo) None else residues.toSeq.flatMap(first).minOption
  private val maxI: Option[Long] =
    if (hi < lo) None else residues.toSeq.flatMap(last).maxOption

  private val values: Array[Any] = funcs.map {
    case _: aggregate.CountStar => totalCount
    case _: aggregate.Count => totalCount // i is never null
    case _: aggregate.Min => minI.orNull
    case _: aggregate.Max => maxI.orNull
    case f => throw new IllegalStateException(s"unpushable aggregate $f")
  }

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: aggregate.CountStar, k) =>
      StructField(s"agg$k", LongType, nullable = false)
    case (_: aggregate.Count, k) =>
      StructField(s"agg$k", LongType, nullable = false)
    case (_, k) => StructField(s"agg$k", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSampleItemsAgg(pushed=[${funcs.map(_.toString).mkString(", ")}], " +
      s"range=[$lo,$hi], residues=${residues.toSeq.sorted.mkString("{", ",", "}")})"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SampleItemsAggRow(values))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          private val row = p.asInstanceOf[SampleItemsAggRow].values
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow =
            InternalRow.fromSeq(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(row))
          override def close(): Unit = ()
        }
    }
}

private[v2] case class SampleItemsAggRow(values: Array[Any]) extends InputPartition

private[v2] case class SampleItemsSlice(
    lo: Long, hi: Long, residues: Array[Int], dateStr: String,
    namePrefix: String, count: Long, deterministicIds: Boolean, limit: Int,
    fields: Array[String], idSeed: Long) extends InputPartition

private[v2] object SampleItemsReader {
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Retry-stable pseudo-random v4-shaped UUID: pure in (seed, i). */
  private[v2] def rowUuid(seed: Long, i: Long): UUID = {
    val m = splitmix64(seed ^ i)
    val l = splitmix64(m)
    new UUID(
      (m & 0xFFFFFFFFFFFF0FFFL) | 0x0000000000004000L, // version 4
      (l & 0x3FFFFFFFFFFFFFFFL) | 0x8000000000000000L) // IETF variant
  }
}

private[v2] class SampleItemsReader(slice: SampleItemsSlice)
    extends PartitionReader[InternalRow] {
  private val resid: Array[Boolean] = {
    val a = new Array[Boolean](3)
    slice.residues.foreach(r => a(r) = true)
    a
  }
  private val dateU = UTF8String.fromString(slice.dateStr)
  private val doneU = UTF8String.fromString("true")
  private val prU = UTF8String.fromString("Additional field info")
  private val partU = Array("Partition_A", "Partition_B", "Partition_C")
    .map(UTF8String.fromString)

  // per-field generators compiled ONCE per reader — no string dispatch in
  // the per-row hot path
  private val fieldGen: Array[Long => Any] = slice.fields.map {
    case "id" if slice.deterministicIds =>
      (i: Long) => UTF8String.fromString(i.toString)
    case "id" =>
      (i: Long) => UTF8String.fromString(
        SampleItemsReader.rowUuid(slice.idSeed, i).toString)
    case "Date" => (_: Long) => dateU
    case "Desc" => (i: Long) => UTF8String.fromString(
      s"Sample item #$i of ${slice.count} generated")
    case "Done" => (_: Long) => doneU
    case "Name" => (i: Long) => UTF8String.fromString(s"${slice.namePrefix}_$i")
    case "Pr" => (_: Long) => prU
    case "LogicalPartition" => (i: Long) => partU((i % 3).toInt)
    case "i" => (i: Long) => i
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  private var i: Long = slice.lo - 1
  private var emitted: Int = 0

  override def next(): Boolean = {
    if (slice.limit >= 0 && emitted >= slice.limit) return false
    i += 1
    while (i <= slice.hi && !resid((i % 3).toInt)) i += 1
    val ok = i <= slice.hi
    if (ok) emitted += 1
    ok
  }

  override def get(): InternalRow = {
    val row = i
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      fieldGen.map(_(row))))
  }

  override def close(): Unit = ()
}
