package graft.sources.v2

import java.io.IOException
import java.net.URLEncoder
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STORE-NATIVE CHANGE-FEED CONNECTOR pattern, executable in this
  * sandbox: the reference's transform leg rides the Cosmos change feed
  * with a lease container tracking the consumer's position
  * (EtlProcess.cs:183-187, host.json lease config). This source maps
  * that to Structured Streaming's own offset machinery — a DSv2
  * `MicroBatchStream` polling an HTTP feed:
  *
  * `spark.readStream.format("http-feed").option("url", ...).load()`
  *
  *   - **offsets = the lease.** The cursor lives in the checkpoint's
  *     offset log (exactly the role of the Cosmos lease document);
  *     restart resumes from the last committed position, no external
  *     lease container needed.
  *   - **backpressure**: `maxPagesPerTrigger` bounds each micro-batch
  *     via `SupportsAdmissionControl` — the analogue of the change
  *     feed's `maxItemsPerInvocation` (and of the file stand-in's
  *     `maxFilesPerTrigger`). The PASSED `ReadLimit` is honored, so
  *     `Trigger.AvailableNow` (via `SupportsTriggerAvailableNow`) and
  *     `Trigger.Once` drain exactly what their contracts promise: the
  *     AvailableNow wrapper pins the head observed at prepare time and
  *     runs capped batches until the cursor reaches it.
  *   - **at-least-once page fetch, exactly-once rows downstream**: a
  *     re-executed partition re-GETs its page; the change-feed contract
  *     (a cursor's page is immutable once published — Cosmos change
  *     feed, Kafka segments, and WAL shippers all guarantee this) makes
  *     the replay value-identical, and the engine's idempotent sinks
  *     (TransformStream's run-keyed upsert) de-duplicate re-delivery.
  *   - **parallel within a batch**: the batch's pages fan out one
  *     InputPartition each — a wide backlog catches up across the
  *     cluster, not through the driver.
  *   - **auth + transient-retry**: the `header.*` / `maxRetries` /
  *     `retryBackoffMs` options of [[HttpJsonSource]] apply to every
  *     head poll and page fetch.
  *
  * Two CURSOR PROTOCOLS (`cursorMode` option):
  *
  *   - `page` (default): monotone numeric cursor. `GET {url}/head` →
  *     `{"head": N}` (number of published pages; the Kafka end-offset
  *     analogue) and `GET {url}?page=k` → JSON array for 0 ≤ k < N.
  *     Offsets log as the bare page number.
  *   - `token`: OPAQUE CONTINUATION TOKENS — the protocol Cosmos
  *     change feed, Kafka REST, and most CDC HTTP feeds actually
  *     speak. `GET {headUrl}?cursor=t` → `{"next": "t2"}` naming the
  *     page after position `t` (`{"next": null}` at the feed head),
  *     and `GET {url}?cursor=t2` → that page's JSON array. The token
  *     is stored VERBATIM in the offset (`{"epoch":N,"token":"..."}`;
  *     `epoch` counts consumed pages so offset equality still means
  *     "no new data"). The driver walks the head chain — tiny
  *     responses, never payloads — and caches walked tokens so
  *     `planInputPartitions` can fan the batch's pages out to
  *     executors; after a restart the cache rebuilds by re-walking
  *     FROM THE START OFFSET'S OWN TOKEN (the chain is deterministic
  *     because published pages are immutable), so recovery costs
  *     O(batch) head calls, not O(history), and committed entries are
  *     trimmed on `commit`. A chain that ends or diverges while
  *     replaying a logged batch fails loudly — that means the feed
  *     regressed or changed identity, which no cursor protocol can
  *     paper over.
  *
  * **Multi-range token feeds** (`ranges` option, token mode only):
  * Cosmos consumes its change feed per PARTITION-KEY RANGE with an
  * independent continuation token per range (FeedRange + per-range
  * lease documents) — that is what makes the feed horizontally
  * scalable: cursor DISCOVERY itself parallelizes across ranges, not
  * just page fetching. `ranges = "r0,r1,..."` (the operator's range
  * ids, e.g. from the store's ranges endpoint) switches the offset to
  * a per-range cursor map (`{"ranges":{"r0":{"epoch":..,"token":..},
  * ...}}`, key-sorted so offset equality is well-defined); every head
  * and page call carries `range=<id>`; `maxPagesPerTrigger` is a
  * TOTAL budget spread round-robin across ranges so one hot range
  * cannot starve the others; each range keeps its own chain cache
  * with the same trim/rebuild/diverge-loudly discipline. A single
  * un-ranged chain is exactly the `ranges` singleton with the empty
  * id (no `range` param on the wire).
  *
  * Failed page fetches THROW (after the retry budget) — for a stream,
  * dropping a page silently would violate the feed's total order;
  * Spark retries the task, then the query fails loudly for the
  * restart-with-backoff loop to handle (same policy as the soak
  * harness). Transient HEAD failures idle the affected range at its
  * current offset instead (the next trigger re-polls). Schema:
  * reference SampleItem or user schema, as in [[HttpJsonSource]].
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

/** One range's continuation position: the opaque token VERBATIM plus
  * the consumed-page count (the count lets partition planning index
  * the walked chain). */
private[v2] case class RangeCursor(epoch: Long, token: String)

/** Token-mode offset: per-range cursors, range-id-sorted in `json()`
  * so structurally-equal offsets serialize identically (offset
  * equality is the engine's no-new-data signal). The single un-ranged
  * chain uses the one-entry map keyed by "" and serializes in the
  * flat legacy shape `{"epoch":..,"token":..}`. */
private[v2] case class TokenOffset(cursors: Map[String, RangeCursor])
    extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    if (cursors.keySet == Set("")) {
      val c = cursors("")
      val node = m.createObjectNode()
      node.put("epoch", c.epoch)
      node.put("token", c.token)
      m.writeValueAsString(node)
    } else {
      val node = m.createObjectNode()
      val rs = node.putObject("ranges")
      cursors.toSeq.sortBy(_._1).foreach { case (r, c) =>
        val rn = rs.putObject(r)
        rn.put("epoch", c.epoch)
        rn.put("token", c.token)
      }
      m.writeValueAsString(node)
    }
  }
}

private[v2] object TokenOffset {
  def single(epoch: Long, token: String): TokenOffset =
    TokenOffset(Map("" -> RangeCursor(epoch, token)))

  def fromJson(json: String): TokenOffset = {
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    if (n.has("ranges")) {
      val rs = n.get("ranges")
      val b = Map.newBuilder[String, RangeCursor]
      rs.properties().forEach { e =>
        b += e.getKey -> RangeCursor(
          e.getValue.get("epoch").asLong(), e.getValue.get("token").asText())
      }
      TokenOffset(b.result())
    } else {
      require(n.has("epoch") && n.has("token"),
        s"http-feed: not a token-mode offset: $json (was the checkpoint " +
          "written in cursorMode=page?)")
      single(n.get("epoch").asLong(), n.get("token").asText())
    }
  }
}

private[v2] class HttpFeedMicroBatch(schema0: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val url: String = {
    val u = options.get("url")
    require(u != null, "http-feed source requires option 'url'")
    u
  }
  private val headUrl: String =
    Option(options.get("headUrl")).getOrElse(s"$url/head")
  private val pageParam: String =
    Option(options.get("pageParam")).getOrElse("page")
  private val cursorParam: String =
    Option(options.get("cursorParam")).getOrElse("cursor")
  private val rangeParam: String =
    Option(options.get("rangeParam")).getOrElse("range")
  private val conf: HttpRequestConf = HttpJsonSource.requestConf(options)
  private val maxPagesPerTrigger = options.getLong("maxPagesPerTrigger", 10L)
  private val startPage = options.getLong("startPage", 0L)
  private val tokenMode: Boolean =
    Option(options.get("cursorMode")).getOrElse("page") match {
      case "page" => false
      case "token" => true
      case other => throw new IllegalArgumentException(
        s"http-feed: cursorMode must be 'page' or 'token', got '$other'")
    }
  private val startToken: String =
    Option(options.get("startToken")).getOrElse("")
  /** Range ids for multi-range token feeds; Seq("") = one un-ranged
    * chain (no range param on the wire). */
  private val rangeIds: Seq[String] =
    Option(options.get("ranges")) match {
      case None => Seq("")
      case Some(rs) =>
        require(tokenMode, "http-feed: ranges requires cursorMode=token")
        val ids = rs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(ids.nonEmpty && ids.distinct == ids,
          s"http-feed: ranges must be distinct non-empty ids, got '$rs'")
        ids.sorted
    }

  // ---- read-limit plumbing --------------------------------------------

  /** Pages allowed in this batch, from the PASSED limit — maxRows is
    * interpreted in this source's admission unit (pages), matching
    * getDefaultReadLimit; allAvailable means drain to the head. */
  private def capFor(limit: ReadLimit): Long = limit match {
    case _: ReadAllAvailable => Long.MaxValue
    case r: ReadMaxRows => math.max(1L, r.maxRows())
    case c: CompositeReadLimit => c.getReadLimits.map(capFor).min
    case _ => maxPagesPerTrigger
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPagesPerTrigger) // unit here = pages

  /** Head pinned at prepare time for Trigger.AvailableNow (page mode);
    * token mode drains naturally until every range's `next` runs out. */
  @volatile private var availableNowHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    if (!tokenMode) {
      val h = fetchHead()
      availableNowHead = if (h >= 0) Some(h) else None
    }

  // ---- page mode: numeric head poll -----------------------------------

  /** DRIVER-side head poll — one tiny GET per trigger, the analogue of
    * the change-feed processor's lease renewal heartbeat (transient
    * retry already applied inside fetch). Non-2xx or a dead socket
    * means "nothing new observable"; the stream idles at the current
    * offset instead of failing on a transient blip (the next trigger
    * re-polls). */
  private def fetchHead(): Long =
    try {
      HttpJsonSource.fetch(headUrl, conf) match {
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

  // ---- token mode: per-range chain walk + cache -------------------------

  /** Walked chain cache for one range: `toks(i - base)` = token at
    * epoch `i` (the token of the i-th consumed page; `startToken` at
    * epoch 0). Driver memory is bounded: committed prefixes trim on
    * `commit`, and a restart re-anchors at the start offset's own
    * token. */
  private final class RangeChain(var base: Long, val toks: ArrayBuffer[String]) {
    def top: Long = base + toks.length - 1
    def at(e: Long): String = toks((e - base).toInt)
  }
  private val chains = mutable.Map.empty[String, RangeChain]

  private def enc(t: String): String = URLEncoder.encode(t, StandardCharsets.UTF_8)

  private def withParams(base: String, params: Seq[(String, String)]): String = {
    val sep = if (base.contains("?")) "&" else "?"
    base + sep + params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  private def headNextUrl(range: String, t: String): String =
    withParams(headUrl,
      (if (range.isEmpty) Nil else Seq(rangeParam -> range)) :+ (cursorParam -> t))

  private def tokenPageUrl(range: String, t: String): String =
    withParams(url,
      (if (range.isEmpty) Nil else Seq(rangeParam -> range)) :+ (cursorParam -> t))

  /** One head-chain step for one range. `Right(Some(t))` = next page's
    * token; `Right(None)` = at the feed head; `Left(err)` = transient
    * transport failure (retries exhausted). */
  private def advance(range: String, t: String): Either[String, Option[String]] = {
    val u = headNextUrl(range, t)
    try {
      HttpJsonSource.fetch(u, conf) match {
        case Right(n) if n.hasNonNull("next") && n.get("next").isTextual =>
          Right(Some(n.get("next").asText()))
        case Right(_) => Right(None)
        case Left(status) => Left(s"head $u -> $status")
      }
    } catch {
      case e: Exception => Left(s"head $u failed: ${e.getMessage}")
    }
  }

  /** Re-anchor a range's chain cache at a logged cursor (restart, or a
    * cache that drifted): if the cache doesn't already hold this epoch
    * with this exact token, reset to it — the walk restarts from the
    * offset's own token, never from history. */
  private def anchor(range: String, c: RangeCursor): RangeChain = {
    val ch = chains.get(range)
    ch match {
      case Some(x) if c.epoch >= x.base && c.epoch <= x.top &&
          x.at(c.epoch) == c.token => x
      case _ =>
        val fresh = new RangeChain(c.epoch, ArrayBuffer(c.token))
        chains(range) = fresh
        fresh
    }
  }

  /** Walk a range's chain STRICTLY up to `epoch` — replaying a logged
    * batch must reconstruct exactly its pages or fail loudly. */
  private def extendToStrict(range: String, ch: RangeChain, epoch: Long): Unit =
    while (ch.top < epoch) {
      advance(range, ch.at(ch.top)) match {
        case Right(Some(t)) => ch.toks += t
        case Right(None) => throw new IllegalStateException(
          s"http-feed: token chain (range '$range') ended at epoch ${ch.top} " +
            s"while replaying a batch up to epoch $epoch — the feed's " +
            "published pages regressed")
        case Left(err) => throw new IOException(
          s"http-feed: cannot rebuild token chain for batch replay: $err")
      }
    }

  // ---- offsets ----------------------------------------------------------

  override def initialOffset(): Offset =
    if (tokenMode)
      TokenOffset(rangeIds.map(_ -> RangeCursor(0L, startToken)).toMap)
    else PageOffset(startPage)

  /** Rotates the round-robin sweep's starting range across triggers:
    * with budget < |ranges| a fixed sweep order would hand every page
    * of every trigger to the same (sorted-first) hot range and starve
    * the rest forever. Fairness only — resets on restart. */
  private var sweepStart = 0

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = capFor(limit)
    if (tokenMode) {
      val s = start.asInstanceOf[TokenOffset]
      // the page budget is TOTAL across ranges, spread round-robin so a
      // hot range cannot starve the others; a range stops contributing
      // when its chain hits the feed head (or a transient head error)
      val cur = mutable.Map.empty[String, Long]
      val live = mutable.Set.empty[String]
      rangeIds.foreach { r =>
        val c = s.cursors.getOrElse(r, RangeCursor(0L, startToken))
        anchor(r, c)
        cur(r) = c.epoch
        live += r
      }
      val k = sweepStart % rangeIds.size
      sweepStart += 1
      val sweepOrder = rangeIds.drop(k) ++ rangeIds.take(k)
      var budget = cap
      while (budget > 0 && live.nonEmpty) {
        // one round-robin sweep over the still-advancing ranges
        sweepOrder.filter(live.contains).foreach { r =>
          if (budget > 0) {
            val ch = chains(r)
            val n = cur(r)
            if (ch.top > n) { cur(r) = n + 1; budget -= 1 }
            else advance(r, ch.at(n)) match {
              case Right(Some(t)) => ch.toks += t; cur(r) = n + 1; budget -= 1
              case Right(None) => live -= r // at this range's head
              case Left(err) =>
                System.err.println(s"[http-feed] $err (idling range)")
                live -= r
            }
          }
        }
      }
      TokenOffset(rangeIds.map { r =>
        r -> RangeCursor(cur(r), chains(r).at(cur(r)))
      }.toMap)
    } else {
      val from = start.asInstanceOf[PageOffset].page
      val head = availableNowHead.getOrElse(fetchHead())
      if (head < 0) PageOffset(from) // transient head failure: idle
      else {
        val capped = if (cap == Long.MaxValue) head else math.min(head, from + cap)
        PageOffset(math.max(from, capped))
      }
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "http-feed implements SupportsAdmissionControl.latestOffset(start, limit)")

  /** Best-effort "what exists right now" for progress reporting: the
    * numeric head in page mode; unknown (null) in token mode — an
    * opaque chain has no cheap end-position query. */
  override def reportLatestOffset(): Offset =
    if (tokenMode) null
    else {
      val h = fetchHead()
      if (h < 0) null else PageOffset(h)
    }

  override def deserializeOffset(json: String): Offset =
    if (tokenMode) TokenOffset.fromJson(json) else PageOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val fields = schema0.fields.map(f => (f.name, f.dataType.typeName))
    if (tokenMode) {
      val s = start.asInstanceOf[TokenOffset]
      val e = end.asInstanceOf[TokenOffset]
      rangeIds.flatMap { r =>
        val sc = s.cursors.getOrElse(r, RangeCursor(0L, startToken))
        val ec = e.cursors.getOrElse(r, sc)
        val ch = anchor(r, sc)
        extendToStrict(r, ch, ec.epoch)
        if (ch.at(ec.epoch) != ec.token) throw new IllegalStateException(
          s"http-feed: token chain (range '$r') diverged replaying epoch " +
            s"${ec.epoch}: expected '${ec.token}', walked to " +
            s"'${ch.at(ec.epoch)}' — the feed changed identity under its " +
            "checkpoint")
        (sc.epoch until ec.epoch).map { i =>
          HttpJsonPage(tokenPageUrl(r, ch.at(i + 1)), conf,
            errorAsEmpty = false, fields): InputPartition
        }
      }.toArray
    } else {
      val lo = start.asInstanceOf[PageOffset].page
      val hi = end.asInstanceOf[PageOffset].page
      val sep = if (url.contains("?")) "&" else "?"
      (lo until hi).map { k =>
        HttpJsonPage(s"$url$sep$pageParam=$k", conf,
          errorAsEmpty = false, fields): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new HttpJsonReader(p.asInstanceOf[HttpJsonPage])
    }

  override def commit(end: Offset): Unit =
    // feed retains pages (no ack); token mode trims each range's
    // committed prefix so driver state is O(in-flight pages) per range,
    // not O(history)
    if (tokenMode) end match {
      case TokenOffset(cursors) =>
        cursors.foreach { case (r, c) =>
          chains.get(r) match {
            case Some(ch) if c.epoch > ch.base && c.epoch <= ch.top &&
                ch.at(c.epoch) == c.token =>
              ch.toks.remove(0, (c.epoch - ch.base).toInt)
              ch.base = c.epoch
            case _ => ()
          }
        }
      case _ => ()
    }

  override def stop(): Unit = ()
}
