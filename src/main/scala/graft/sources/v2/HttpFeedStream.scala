package graft.sources.v2

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STORE-NATIVE CHANGE-FEED CONNECTOR pattern, executable in this
  * sandbox: the reference's transform leg rides the Cosmos change feed
  * with a lease container tracking the consumer's position
  * (EtlProcess.cs:183-187, host.json lease config). This source maps
  * that to Structured Streaming's own offset machinery — a DSv2
  * `MicroBatchStream` polling an HTTP feed with a monotonically
  * advancing PAGE CURSOR:
  *
  * `spark.readStream.format("http-feed").option("url", ...).load()`
  *
  *   - **offsets = the lease.** The cursor lives in the checkpoint's
  *     offset log (exactly the role of the Cosmos lease document);
  *     restart resumes from the last committed page, no external lease
  *     container needed.
  *   - **backpressure**: `maxPagesPerTrigger` bounds each micro-batch
  *     via `SupportsAdmissionControl` — the analogue of the change
  *     feed's `maxItemsPerInvocation` (and of the file stand-in's
  *     `maxFilesPerTrigger`).
  *   - **at-least-once page fetch, exactly-once rows downstream**: a
  *     re-executed partition re-GETs its page; the change-feed contract
  *     (a cursor's page is immutable once published — Cosmos change
  *     feed, Kafka segments, and WAL shippers all guarantee this) makes
  *     the replay value-identical, and the engine's idempotent sinks
  *     (TransformStream's run-keyed upsert) de-duplicate re-delivery.
  *   - **parallel within a batch**: pages [start, end) fan out one
  *     InputPartition each — a wide backlog catches up across the
  *     cluster, not through the driver.
  *
  * Feed protocol (what a real endpoint maps to): `GET {url}/head` →
  * `{"head": N}` (number of published pages; the Cosmos continuation
  * token / Kafka end-offset analogue) and `GET {url}?page=k` → JSON
  * array of items for 0 ≤ k < N. Failed page fetches THROW — for a
  * stream, dropping a page silently would violate the feed's total
  * order; Spark retries the task, then the query fails loudly for the
  * restart-with-backoff loop to handle (same policy as the soak
  * harness). Schema: reference SampleItem or user schema, as in
  * [[HttpJsonSource]].
  */
class HttpFeedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-feed"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonSource.defaultSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new HttpFeedTable(schema, new CaseInsensitiveStringMap(properties))
}

private[v2] class HttpFeedTable(schema0: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"http_feed(${options.get("url")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def description(): String =
          s"GraftHttpFeed(url=${options.get("url")})"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpFeedMicroBatch(schema0, options)
      }
    }
}

/** Page-cursor offset: `json()` is just the cursor value, so offset
  * logs stay human-readable (`3` = pages 0,1,2 committed). */
private[v2] case class PageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

private[v2] class HttpFeedMicroBatch(schema0: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val url: String = {
    val u = options.get("url")
    require(u != null, "http-feed source requires option 'url'")
    u
  }
  private val headUrl: String =
    Option(options.get("headUrl")).getOrElse(s"$url/head")
  private val pageParam: String =
    Option(options.get("pageParam")).getOrElse("page")
  private val accept: String =
    Option(options.get("accept")).getOrElse("application/json")
  private val connectTimeoutMs = options.getInt("connectTimeoutMs", 10000)
  private val readTimeoutMs = options.getInt("readTimeoutMs", 30000)
  private val maxPagesPerTrigger = options.getLong("maxPagesPerTrigger", 10L)
  private val startPage = options.getLong("startPage", 0L)

  /** DRIVER-side head poll — one tiny GET per trigger, the analogue of
    * the change-feed processor's lease renewal heartbeat. Non-2xx or a
    * dead socket means "nothing new observable"; the stream idles at
    * the current offset instead of failing on a transient blip (the
    * next trigger re-polls). */
  private def fetchHead(): Long =
    try {
      HttpJsonSource.fetch(headUrl, accept, connectTimeoutMs, readTimeoutMs) match {
        case Right(node) if node.has("head") && node.get("head").canConvertToLong =>
          node.get("head").asLong()
        case Right(_) => 0L
        case Left(status) =>
          System.err.println(s"[http-feed] head poll $headUrl -> $status (idling)")
          -1L
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[http-feed] head poll failed: ${e.getMessage} (idling)")
        -1L
    }

  override def initialOffset(): Offset = PageOffset(startPage)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPagesPerTrigger) // unit here = pages

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PageOffset].page
    val head = fetchHead()
    if (head < 0) PageOffset(from) // transient head failure: idle
    else PageOffset(math.max(from, math.min(head, from + maxPagesPerTrigger)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "http-feed implements SupportsAdmissionControl.latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset =
    PageOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[PageOffset].page
    val hi = end.asInstanceOf[PageOffset].page
    (lo until hi).map { k =>
      val sep = if (url.contains("?")) "&" else "?"
      HttpJsonPage(s"$url$sep$pageParam=$k", accept,
        connectTimeoutMs, readTimeoutMs, errorAsEmpty = false,
        schema0.fields.map(f => (f.name, f.dataType.typeName))): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new HttpJsonReader(p.asInstanceOf[HttpJsonPage])
    }

  override def commit(end: Offset): Unit = () // feed retains pages; no ack

  override def stop(): Unit = ()
}
