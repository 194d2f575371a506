package graft.sources.v2

import java.io.InputStream
import java.net.{HttpURLConnection, URI}

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
  *   - `errorAsEmpty=true`: a failed page yields zero rows and the scan
  *     carries on — the forgiving mode for wide fan-outs where one dead
  *     page of thousands must not kill the job.
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

  /** GET `url` and parse the body as a JSON array; `Left(status)` on a
    * non-2xx, exceptions propagate to the caller's policy. Advertises
    * and transparently decompresses gzip (real feed endpoints compress
    * large JSON pages; wire bytes drop ~10x on typical payloads). Runs
    * on the EXECUTOR (called from the partition reader). */
  private[v2] def fetch(url: String, accept: String,
      connectTimeoutMs: Int, readTimeoutMs: Int): Either[Int, JsonNode] = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setRequestProperty("Accept", accept)
    conn.setRequestProperty("Accept-Encoding", "gzip")
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      val status = conn.getResponseCode
      if (status < 200 || status >= 300) Left(status)
      else {
        val raw: InputStream = conn.getInputStream
        val in: InputStream =
          if ("gzip".equalsIgnoreCase(conn.getContentEncoding))
            new java.util.zip.GZIPInputStream(raw)
          else raw
        try Right(new ObjectMapper().readTree(in))
        finally in.close()
      }
    } finally conn.disconnect()
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
    Option(options.get("accept")).getOrElse("application/json"),
    options.getInt("connectTimeoutMs", 10000),
    options.getInt("readTimeoutMs", 30000),
    options.getBoolean("errorAsEmpty", false),
    required)
}

private[v2] class HttpJsonScan(url: String, pages: Int, pageParam: String,
    accept: String, connectTimeoutMs: Int, readTimeoutMs: Int,
    errorAsEmpty: Boolean, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftHttpJson(url=$url, pages=$pages, errorAsEmpty=$errorAsEmpty, " +
      s"columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    def pageUrl(p: Int): String =
      if (pages == 1) url
      else url + (if (url.contains("?")) "&" else "?") + s"$pageParam=$p"
    (0 until pages).map(p => HttpJsonPage(pageUrl(p), accept,
      connectTimeoutMs, readTimeoutMs, errorAsEmpty,
      required.fields.map(f => (f.name, f.dataType.typeName)))
      : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new HttpJsonReader(p.asInstanceOf[HttpJsonPage])
    }
}

private[v2] case class HttpJsonPage(url: String, accept: String,
    connectTimeoutMs: Int, readTimeoutMs: Int, errorAsEmpty: Boolean,
    fields: Array[(String, String)]) extends InputPartition

private[v2] class HttpJsonReader(page: HttpJsonPage)
    extends PartitionReader[InternalRow] {

  // ONE fetch per partition, lazily on first next(): the whole page
  // body parses on the executor; failure policy per the option.
  private lazy val items: Iterator[JsonNode] =
    try {
      HttpJsonSource.fetch(page.url, page.accept,
        page.connectTimeoutMs, page.readTimeoutMs) match {
        case Right(root) =>
          require(root.isArray,
            s"http-json: expected a top-level JSON array at ${page.url}")
          val it = root.elements()
          new Iterator[JsonNode] {
            def hasNext: Boolean = it.hasNext
            def next(): JsonNode = it.next()
          }
        case Left(status) =>
          if (page.errorAsEmpty) {
            System.err.println(
              s"[http-json] ${page.url} -> $status (emitting no rows)")
            Iterator.empty
          } else throw new java.io.IOException(
            s"http-json: GET ${page.url} returned status $status")
      }
    } catch {
      case e: Exception if page.errorAsEmpty =>
        System.err.println(
          s"[http-json] ${page.url} failed: ${e.getMessage} (emitting no rows)")
        Iterator.empty
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
