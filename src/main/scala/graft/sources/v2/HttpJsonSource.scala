package graft.sources.v2

import java.io.{InputStream, IOException}
import java.net.{HttpURLConnection, URI}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.JacksonException
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** LIVE HTTP transport for the reference's extract leg (S1,
  * EtlProcess.cs:139-160): a DataSource V2 `TableProvider` whose
  * readers perform an actual `GET` with `Accept: application/json` and
  * deserialize the JSON array payload into rows — the code path the
  * reference runs against its `ExternalEndpoint`, expressed as a
  * first-class Spark table:
  *
  * `spark.read.format("http-json").option("url", "http://...").load()`
  *
  * Auth + resilience (the reference's endpoint config arrives via env,
  * EtlProcess.cs:139-143 `ExternalEndpointParams`; real feeds
  * universally need a bearer/api-key header and transient-retry
  * policy):
  *   - `header.<Name>` options become request headers verbatim, e.g.
  *     `.option("header.Authorization", "Bearer ...")` or
  *     `.option("header.x-api-key", ...)`. Header names keep the
  *     option's original casing (HTTP treats them case-insensitively
  *     anyway).
  *   - transient failures RETRY with exponential backoff + full
  *     jitter: HTTP 429 and 5xx, and transport `IOException`s
  *     (connect/read timeout, reset). `maxRetries` (default 3) bounds
  *     attempts; `retryBackoffMs` (default 200) seeds the schedule
  *     (200, 400, 800, ... capped at 10s); a `Retry-After: <seconds>`
  *     response header overrides the computed delay for that attempt.
  *     Other 4xx (401/403/404...) never retry — a missing page or bad
  *     credential does not heal by waiting.
  *
  * Error contract (EtlProcess.cs:144-159): the reference treats a
  * non-2xx status or any exception as `null` items, which the
  * orchestrator lands as the EMPTY-SUCCESSFUL run branch
  * (EtlProcess.cs:61-69). Two modes map that to Spark execution:
  *   - default (strict): a failed fetch raises at execution time, and
  *     [[graft.sources.JsonSource.tryReadUrl]] converts it to `None`
  *     exactly like the file-backed `tryRead` — preserving the
  *     reference's null-vs-empty distinction (a 200 with `[]` is a
  *     successful run that saved 0 items; a 500 is "no items
  *     retrieved");
  *   - `errorAsEmpty=true`: a TRANSPORT-dead page (non-2xx after
  *     retries, connect/read IOException) yields zero rows and the
  *     scan carries on — the forgiving mode for wide fan-outs where
  *     one dead page of thousands must not kill the job. PAYLOAD
  *     CORRUPTION is never forgiven: a live endpoint returning a 200
  *     whose body fails to parse, or parses to something other than a
  *     JSON array, throws in BOTH modes — silently counting a
  *     malformed-but-live endpoint as an empty page would conflate
  *     "nothing there" with "producing garbage".
  *
  * Mid-stream safety: the reader parses the ENTIRE page body up front
  * (`readTree` buffers before the first row is emitted), so every
  * fetch/parse failure happens before any row reaches the scan —
  * `errorAsEmpty` can never drop a page's tail after emitting its
  * head, and a retried attempt re-reads a fully-unconsumed page.
  *
  * The 100 TB shape: `pages` > 1 plans ONE InputPartition PER PAGE
  * (`url?page=k` via `pageParam`), so the fetch parallelizes across
  * executors and no payload ever routes through the driver; column
  * pruning (`SupportsPushDownRequiredColumns`) reaches the reader,
  * which materializes only requested fields from the parsed tree.
  * Re-executed partitions re-fetch (at-least-once GET) — same
  * idempotence story as the reference: extract lands into an
  * idempotent sink keyed by run, not by fetch.
  *
  * Schema: writer-fixed reader-tolerant (SURVEY.md §1.3) — the
  * reference `SampleItem` fields by default, or a user schema via
  * `.schema(...)` (`supportsExternalMetadata`). Unknown JSON fields
  * drop; missing fields are null; a non-object array element becomes
  * an all-null row (PERMISSIVE, like a POCO deserializer yielding
  * defaults, EtlProcess.cs:146).
  */
class HttpJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-json"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonSource.defaultSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new HttpJsonTable(schema, new CaseInsensitiveStringMap(properties))
}

/** Per-request transport settings, carried into every InputPartition
  * (serializable — ships to executors). One place for both the batch
  * source and the `http-feed` stream to share the retry/auth policy. */
private[v2] case class HttpRequestConf(
    accept: String = "application/json",
    headers: Seq[(String, String)] = Nil,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 200L)

object HttpJsonSource {
  /** The reference `SampleItem` surface (EtlProcess.cs:212-229), minus
    * the generator-only key. */
  val defaultSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("Date", StringType),
    StructField("Desc", StringType),
    StructField("Done", StringType),
    StructField("Name", StringType),
    StructField("Pr", StringType),
    StructField("LogicalPartition", StringType)))

  /** Collect `header.<Name>` options (original casing preserved via
    * the case-sensitive view) into request headers, name-sorted for a
    * deterministic partition payload. */
  private[v2] def headerOptions(options: CaseInsensitiveStringMap): Seq[(String, String)] =
    options.asCaseSensitiveMap().asScala.toSeq.collect {
      case (k, v) if k.length > 7 &&
          k.substring(0, 7).equalsIgnoreCase("header.") =>
        (k.substring(7), v)
    }.sortBy(_._1)

  /** Build the shared transport conf from DSv2 options. */
  private[v2] def requestConf(options: CaseInsensitiveStringMap): HttpRequestConf =
    HttpRequestConf(
      accept = Option(options.get("accept")).getOrElse("application/json"),
      headers = headerOptions(options),
      connectTimeoutMs = options.getInt("connectTimeoutMs", 10000),
      readTimeoutMs = options.getInt("readTimeoutMs", 30000),
      maxRetries = math.max(0, options.getInt("maxRetries", 3)),
      retryBackoffMs = math.max(1L, options.getLong("retryBackoffMs", 200L)))

  private val maxBackoffMs = 10000L

  /** Is this status worth retrying? Rate limiting and server-side
    * failures heal; other 4xx are caller errors that never will. */
  private def retryableStatus(status: Int): Boolean =
    status == 429 || (status >= 500 && status < 600)

  /** Full-jitter exponential delay for attempt `i` (0-based), optionally
    * overridden by the server's `Retry-After: <seconds>` (capped). */
  private def backoffMs(conf: HttpRequestConf, attempt: Int,
      retryAfter: Option[Long]): Long = {
    val exp = math.min(maxBackoffMs, conf.retryBackoffMs << math.min(attempt, 20))
    val jittered = exp / 2 +
      java.util.concurrent.ThreadLocalRandom.current().nextLong(exp / 2 + 1)
    retryAfter.map(s => math.min(maxBackoffMs, s * 1000L)).getOrElse(jittered)
  }

  /** GET `url` and parse the body as a JSON array; `Left(status)` on a
    * non-retryable (or retry-exhausted) non-2xx; transport exceptions
    * propagate to the caller's policy after the retry budget. Payload
    * parse failures ([[JacksonException]]) propagate IMMEDIATELY — a
    * 200 whose body is garbage is corruption, not a transient blip,
    * and re-GETting it would re-download the same garbage. Advertises
    * and transparently decompresses gzip (real feed endpoints compress
    * large JSON pages; wire bytes drop ~10x on typical payloads). Runs
    * on the EXECUTOR (called from the partition reader). */
  private[v2] def fetch(url: String, conf: HttpRequestConf): Either[Int, JsonNode] = {
    var attempt = 0
    while (true) {
      val outcome: Either[(Int, Option[Long]), Either[Throwable, JsonNode]] = {
        val conn = new URI(url).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("GET")
        conn.setRequestProperty("Accept", conf.accept)
        conn.setRequestProperty("Accept-Encoding", "gzip")
        conf.headers.foreach { case (n, v) => conn.setRequestProperty(n, v) }
        conn.setConnectTimeout(conf.connectTimeoutMs)
        conn.setReadTimeout(conf.readTimeoutMs)
        try {
          val status = conn.getResponseCode
          if (status < 200 || status >= 300) {
            val retryAfter = Option(conn.getHeaderField("Retry-After"))
              .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
            Left((status, retryAfter))
          } else {
            val raw: InputStream = conn.getInputStream
            val in: InputStream =
              if ("gzip".equalsIgnoreCase(conn.getContentEncoding))
                new java.util.zip.GZIPInputStream(raw)
              else raw
            try Right(Right(new ObjectMapper().readTree(in)))
            catch {
              // transport death mid-body (reset, truncation of the
              // gzip frame) is retryable; malformed JSON is not
              case e: JacksonException => throw e
              case e: IOException => Right(Left(e))
            }
            finally in.close()
          }
        } catch {
          case e: JacksonException => throw e
          case e: IOException => Right(Left(e))
        } finally conn.disconnect()
      }
      outcome match {
        case Right(Right(node)) => return Right(node)
        case Left((status, retryAfter)) =>
          if (retryableStatus(status) && attempt < conf.maxRetries) {
            Thread.sleep(backoffMs(conf, attempt, retryAfter))
            attempt += 1
          } else return Left(status)
        case Right(Left(io)) =>
          if (attempt < conf.maxRetries) {
            Thread.sleep(backoffMs(conf, attempt, None))
            attempt += 1
          } else throw io
      }
    }
    throw new IllegalStateException("unreachable") // while(true) above
  }
}

private[v2] class HttpJsonTable(schema0: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"http_json(${options.get("url")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new HttpJsonScanBuilder(schema0, opts)
}

private[v2] class HttpJsonScanBuilder(schema0: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private val url: String = {
    val u = options.get("url")
    require(u != null, "http-json source requires option 'url'")
    u
  }
  private var required: StructType = schema0

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HttpJsonScan(
    url,
    math.max(1, options.getInt("pages", 1)),
    Option(options.get("pageParam")).getOrElse("page"),
    HttpJsonSource.requestConf(options),
    options.getBoolean("errorAsEmpty", false),
    required)
}

private[v2] class HttpJsonScan(url: String, pages: Int, pageParam: String,
    conf: HttpRequestConf, errorAsEmpty: Boolean, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftHttpJson(url=$url, pages=$pages, errorAsEmpty=$errorAsEmpty, " +
      s"columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    def pageUrl(p: Int): String =
      if (pages == 1) url
      else url + (if (url.contains("?")) "&" else "?") + s"$pageParam=$p"
    (0 until pages).map(p => HttpJsonPage(pageUrl(p), conf, errorAsEmpty,
      required.fields.map(f => (f.name, f.dataType.typeName)))
      : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new HttpJsonReader(p.asInstanceOf[HttpJsonPage])
    }
}

private[v2] case class HttpJsonPage(url: String, conf: HttpRequestConf,
    errorAsEmpty: Boolean, fields: Array[(String, String)])
    extends InputPartition

private[v2] class HttpJsonReader(page: HttpJsonPage)
    extends PartitionReader[InternalRow] {

  // ONE fetch per partition, lazily on first next(): the whole page
  // body parses on the executor BEFORE any row is emitted (readTree
  // buffers), so no exception can surface after the first next() —
  // errorAsEmpty's empty-or-everything contract needs no mid-stream
  // case. Failure policy: transport errors (non-2xx after retries,
  // IOException) follow the option; payload corruption (parse failure,
  // non-array 200) ALWAYS throws — see the source scaladoc.
  private lazy val items: Iterator[JsonNode] = {
    val fetched: Option[JsonNode] =
      try {
        HttpJsonSource.fetch(page.url, page.conf) match {
          case Right(root) => Some(root)
          case Left(status) =>
            if (page.errorAsEmpty) {
              System.err.println(
                s"[http-json] ${page.url} -> $status (emitting no rows)")
              None
            } else throw new IOException(
              s"http-json: GET ${page.url} returned status $status")
        }
      } catch {
        // JacksonException extends IOException — listed first so
        // corruption is never downgraded to an empty page
        case e: JacksonException =>
          throw new IOException(
            s"http-json: ${page.url} returned unparseable JSON " +
              s"(payload corruption is never errorAsEmpty): ${e.getMessage}", e)
        case e: IOException if page.errorAsEmpty =>
          System.err.println(
            s"[http-json] ${page.url} failed: ${e.getMessage} (emitting no rows)")
          None
      }
    fetched match {
      case None => Iterator.empty
      case Some(root) =>
        // a live 200 that is not an array is corruption in BOTH modes
        if (!root.isArray) throw new IOException(
          s"http-json: expected a top-level JSON array at ${page.url}, " +
            s"got ${root.getNodeType} (payload corruption is never errorAsEmpty)")
        val it = root.elements()
        new Iterator[JsonNode] {
          def hasNext: Boolean = it.hasNext
          def next(): JsonNode = it.next()
        }
    }
  }

  private var cur: JsonNode = _

  override def next(): Boolean = {
    val has = items.hasNext
    if (has) cur = items.next()
    has
  }

  private def convert(node: JsonNode, typeName: String): Any = {
    if (node == null || node.isNull || node.isMissingNode) null
    else typeName match {
      case "string" => UTF8String.fromString(
        if (node.isTextual) node.asText() else node.toString)
      case "long" => if (node.canConvertToLong) node.asLong() else null
      case "integer" => if (node.canConvertToInt) node.asInt() else null
      case "double" => if (node.isNumber) node.asDouble() else null
      case "boolean" => if (node.isBoolean) Boolean.box(node.asBoolean()) else null
      case other => throw new IllegalArgumentException(
        s"http-json: unsupported column type $other")
    }
  }

  override def get(): InternalRow = {
    // non-object element -> all-null row (PERMISSIVE)
    val obj = if (cur.isObject) cur else null
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      page.fields.map { case (name, tpe) =>
        if (obj == null) null else convert(obj.get(name), tpe)
      }))
  }

  override def close(): Unit = ()
}
