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
  *     `Trigger.Once` drain exactly what their contracts promise: at
  *     prepare time the drain target is PINNED — the numeric head in
  *     page mode, a per-range head EPOCH in token mode (one walk of
  *     each range's chain) — and capped batches run until the cursor
  *     reaches it, so a feed that keeps publishing cannot keep an
  *     AvailableNow query alive. A prepare-time head failure throws
  *     (after the transport retry budget): silently falling back to a
  *     live head would quietly drain post-start data.
  *   - **start position**: `startAt = beginning | now` (default
  *     `beginning`, the Cosmos trigger's `StartFromBeginning=false`
  *     analogue inverted — an analytics backfill wants history unless
  *     told otherwise). `now` attaches to a long-lived feed without
  *     replaying it: page mode reads the numeric head once (and fails
  *     loudly if unreachable — starting at 0 would replay everything);
  *     token mode attaches in ONE call per range when the protocol
  *     offers a head-token endpoint (`headTokenUrl` → the current
  *     continuation, the Cosmos attach shape), and otherwise walks
  *     each range's chain to its head once at first start (O(backlog)
  *     tiny head GETs and O(1) driver memory, paid once; a deep feed
  *     without a head-token endpoint should supply `startToken`
  *     instead). The RESOLVED attach position is
  *     persisted under the source's checkpoint directory (the Kafka
  *     initial-offset-log pattern) and replayed verbatim by every
  *     later `initialOffset()` call: the engine re-invokes
  *     `initialOffset()` when recovering an uncommitted batch 0, and
  *     re-reading a LIVE head there would attach ahead of the logged
  *     end offset, silently dropping the rows in between.
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
  * **Dynamic range discovery + split/merge** (`discoverRanges=true`,
  * token mode): the Cosmos model discovers partition-key ranges at
  * runtime, and ranges SPLIT as throughput grows — the change-feed
  * processor's lease machinery absorbs this inside the library
  * (EtlProcess.cs:183-187; lease container config host.json:15-17).
  * Here the driver polls `GET {rangesUrl}` (default `{url}/ranges`,
  * response `{"ranges":[{"id":"r1","start":"<token>"}, ...]}` or a
  * plain id array) at every batch plan:
  *
  *   - a NEWLY DISCOVERED range (e.g. a split child) is admitted into
  *     the offset map at its advertised `start` token (or the global
  *     `startToken`) with ZERO pages in its admission batch — it
  *     consumes from the next trigger on. The zero-page rule is what
  *     makes restart replay self-contained: a range absent from a
  *     batch's start offset provably has epoch 0 in its end offset,
  *     so `planInputPartitions` never needs out-of-band state.
  *   - a VANISHED range (absent from a successful discovery) whose
  *     chain has drained to its head is TERMINAL: its committed cursor
  *     stays in every offset verbatim (replay still works) and the
  *     driver stops polling its head — a split parent retires cleanly
  *     instead of diverging or error-logging forever. A range that is
  *     merely missing while discovery itself fails keeps polling (a
  *     transient discovery outage must not retire live ranges).
  *   - discovery is SKIPPED while an AvailableNow drain is pinned:
  *     AvailableNow processes what existed at prepare time; ranges
  *     born later belong to the next run.
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
          new HttpFeedMicroBatch(schema0, options, checkpointLocation)
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
    options: CaseInsensitiveStringMap, checkpointLocation: String)
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
  /** Optional O(1) attach endpoint for `startAt=now` first starts on
    * deep feeds: `GET {headTokenUrl}[?range=r]` → `{"token": "..."}`
    * naming the feed's CURRENT head cursor directly — the Cosmos shape,
    * where the store hands the processor a current continuation in one
    * call (EtlProcess.cs:183-187) instead of making it walk history.
    * Without it, `startAt=now` walks each range's token chain from its
    * start token (O(history) tiny head GETs, O(1) memory, paid once).
    * A transport failure or malformed body falls back to the walk —
    * both resolve the same attach position, and the resolution is
    * persisted under the checkpoint either way. */
  private val headTokenUrl: Option[String] = {
    val u = Option(options.get("headTokenUrl"))
    require(u.isEmpty || tokenMode,
      "http-feed: headTokenUrl requires cursorMode=token")
    u
  }
  /** `startAt=now` attaches at the live head instead of replaying the
    * feed (the Cosmos trigger's StartFromBeginning=false shape). */
  private val startAtNow: Boolean =
    Option(options.get("startAt")).getOrElse("beginning") match {
      case "beginning" => false
      case "now" => true
      case other => throw new IllegalArgumentException(
        s"http-feed: startAt must be 'beginning' or 'now', got '$other'")
    }
  private val discoverRangesOn: Boolean = {
    val on = options.getBoolean("discoverRanges", false)
    require(!on || tokenMode,
      "http-feed: discoverRanges requires cursorMode=token")
    on
  }
  /** Static range ids for multi-range token feeds; Seq("") = one
    * un-ranged chain (no range param on the wire). With discovery on
    * and no static list, the range set is WHOLLY dynamic — no un-ranged
    * default chain to poll a range-keyed feed without a range param. */
  private val rangeIds: Seq[String] =
    Option(options.get("ranges")) match {
      case None => if (discoverRangesOn) Seq.empty else Seq("")
      case Some(rs) =>
        require(tokenMode, "http-feed: ranges requires cursorMode=token")
        val ids = rs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(ids.nonEmpty && ids.distinct == ids,
          s"http-feed: ranges must be distinct non-empty ids, got '$rs'")
        ids.sorted
    }
  private val rangesUrl: String =
    Option(options.get("rangesUrl")).getOrElse(s"$url/ranges")

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

  /** Page mode: head pinned at prepare time for Trigger.AvailableNow. */
  @volatile private var availableNowHead: Option[Long] = None
  /** Token mode: per-range drain-target epochs, resolved ONCE per range
    * on first sight in [[latestOffset]] (the map is installed — i.e.
    * the drain is pinned — at prepare time; entries fill lazily). The
    * deferral is what makes deep restarts O(batch): prepare runs before
    * the engine hands over the start offset, so a prepare-time walk
    * could only start from the range's START token — O(history) head
    * GETs and O(history) driver memory on a months-old feed. At first
    * latestOffset the checkpointed cursor has already anchored the
    * chain, so the walk covers exactly the un-drained backlog. The
    * pinned-target semantics are unchanged: each range's target is
    * resolved exactly once, before any of its pages are admitted, so a
    * feed that keeps publishing cannot keep the query alive; a walk
    * failure at resolution still fails the query loudly. */
  @volatile private var availableNowTargets: Option[mutable.Map[String, Long]] = None
  /** Token mode: the range SET pinned at prepare time (a discovery
    * outage at prepare fails loudly — AvailableNow must not silently
    * drain a partial range set). */
  @volatile private var availableNowRanges: Seq[String] = Nil

  override def prepareForTriggerAvailableNow(): Unit =
    if (tokenMode) {
      availableNowRanges =
        if (discoverRangesOn)
          (rangeIds ++ discoverRanges().getOrElse(throw new IOException(
            s"http-feed: range discovery $rangesUrl failed while pinning " +
              "the Trigger.AvailableNow drain target"))).distinct.sorted
        else rangeIds
      availableNowTargets = Some(mutable.Map.empty)
    } else {
      val h = fetchHead()
      if (h < 0) throw new IOException(
        s"http-feed: head poll $headUrl failed while pinning the " +
          "Trigger.AvailableNow drain target (transport retries " +
          "exhausted) — failing loudly instead of silently draining a " +
          "live head")
      availableNowHead = Some(h)
    }

  // ---- page mode: numeric head poll -----------------------------------

  /** DRIVER-side head poll — one tiny GET per trigger, the analogue of
    * the change-feed processor's lease renewal heartbeat (transient
    * retry already applied inside fetch). Non-2xx or a dead socket
    * means "nothing new observable"; the stream idles at the current
    * offset instead of failing on a transient blip (the next trigger
    * re-polls). Start/prepare paths, where idling would silently
    * change semantics, check for -1 and fail loudly instead. */
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
    * epoch `i` (the token of the i-th consumed page; the range's start
    * token at epoch 0). Driver memory is bounded: committed prefixes
    * trim on `commit`, and a restart re-anchors at the start offset's
    * own token. */
  private final class RangeChain(var base: Long, val toks: ArrayBuffer[String]) {
    def top: Long = base + toks.length - 1
    def at(e: Long): String = toks((e - base).toInt)
  }
  private val chains = mutable.Map.empty[String, RangeChain]
  /** Per-range start token advertised by discovery (global
    * `startToken` otherwise). */
  private val rangeStart = mutable.Map.empty[String, String]
  private def startTok(r: String): String = rangeStart.getOrElse(r, startToken)
  /** Ranges retired by a split/merge: drained AND absent from a
    * successful discovery. Their cursors stay in the offset verbatim;
    * their heads are no longer polled. Rebuilt per run (a restart
    * re-polls each once, then re-retires). */
  private val terminal = mutable.Set.empty[String]

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

  /** Walk a range's chain to the CURRENT feed head; Some(head epoch) or
    * None on a transport failure. Extends (and reuses) the chain cache,
    * so a subsequent batch re-reads the walked tokens for free. */
  private def walkToHead(range: String): Option[Long] = {
    val ch = chains.getOrElseUpdate(range,
      new RangeChain(0L, ArrayBuffer(startTok(range))))
    var done = false
    while (!done) {
      advance(range, ch.at(ch.top)) match {
        case Right(Some(t)) => ch.toks += t
        case Right(None) => done = true
        case Left(err) =>
          System.err.println(s"[http-feed] $err (head walk aborted)")
          return None
      }
    }
    Some(ch.top)
  }

  /** Walk from a range's start token to the live head keeping O(1)
    * driver state — the attach path for `startAt=now` first starts,
    * where tokens BELOW the head are never needed (nothing below the
    * attach point will ever be fetched), so buffering them in the
    * chain cache would be O(history) driver memory on a deep feed.
    * Installs the head-anchored single-entry chain and returns the
    * head cursor; `None` on a transport failure. */
  private def walkToHeadTrimmed(range: String): Option[RangeCursor] = {
    var epoch = 0L
    var tok = startTok(range)
    var done = false
    while (!done) {
      advance(range, tok) match {
        case Right(Some(t)) => tok = t; epoch += 1
        case Right(None) => done = true
        case Left(err) =>
          System.err.println(s"[http-feed] $err (attach walk aborted)")
          return None
      }
    }
    chains(range) = new RangeChain(epoch, ArrayBuffer(tok))
    Some(RangeCursor(epoch, tok))
  }

  /** One-call attach: ask the feed's head-token endpoint for the
    * current cursor of `range` (see [[headTokenUrl]]). The returned
    * cursor anchors epoch 0 at the attach token — epochs are
    * checkpoint-relative page counts, and the resolved offset is
    * persisted verbatim, so "0 = the attach point" is as consistent as
    * the walk's "history depth = the attach point". `None` (transport
    * failure, malformed body, endpoint unset) → caller falls back to
    * the chain walk. */
  private def fetchHeadToken(range: String): Option[RangeCursor] =
    headTokenUrl.flatMap { hu =>
      val u = if (range.isEmpty) hu else withParams(hu, Seq(rangeParam -> range))
      val got = try {
        HttpJsonSource.fetch(u, conf) match {
          case Right(n) if n.hasNonNull("token") && n.get("token").isTextual =>
            Some(n.get("token").asText())
          // a feed may legitimately be EMPTY at attach: token null means
          // "no pages published yet" — attach at the range's start token
          case Right(n) if n.has("token") && n.get("token").isNull =>
            Some(startTok(range))
          case Right(_) =>
            System.err.println(s"[http-feed] head-token $u returned a " +
              "malformed body (falling back to the chain walk)")
            None
          case Left(status) =>
            System.err.println(s"[http-feed] head-token $u -> $status " +
              "(falling back to the chain walk)")
            None
        }
      } catch {
        case e: Exception =>
          System.err.println(s"[http-feed] head-token $u failed: " +
            s"${e.getMessage} (falling back to the chain walk)")
          None
      }
      got.map { tok =>
        chains(range) = new RangeChain(0L, ArrayBuffer(tok))
        RangeCursor(0L, tok)
      }
    }

  /** Poll the ranges endpoint. `Some(ids)` on a well-formed response
    * (also records advertised per-range start tokens); `None` on a
    * transport failure or malformed body — the caller must then keep
    * its current range set (a discovery blip must not retire ranges).
    * A blank/empty advertised id makes the response MALFORMED: the
    * static `ranges` option rejects blank ids for the same reason — ""
    * is the un-ranged sentinel (no range param on the wire), so
    * admitting it would silently poll the global chain of a
    * range-keyed feed and plant a bogus cursor in the offset map. */
  private def discoverRanges(): Option[Seq[String]] =
    try {
      HttpJsonSource.fetch(rangesUrl, conf) match {
        case Right(n) if n.has("ranges") && n.get("ranges").isArray =>
          val b = Seq.newBuilder[String]
          var ok = true
          n.get("ranges").forEach { e =>
            if (e.isTextual && e.asText().trim.nonEmpty) b += e.asText()
            else if (!e.isTextual && e.hasNonNull("id") && e.get("id").isTextual &&
                e.get("id").asText().trim.nonEmpty) {
              val id = e.get("id").asText()
              b += id
              if (e.hasNonNull("start") && e.get("start").isTextual)
                rangeStart(id) = e.get("start").asText()
            } else ok = false
          }
          if (ok) Some(b.result().distinct) else None
        case Right(_) =>
          System.err.println(
            s"[http-feed] ranges poll $rangesUrl returned no 'ranges' array")
          None
        case Left(status) =>
          System.err.println(s"[http-feed] ranges poll $rangesUrl -> $status")
          None
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[http-feed] ranges poll failed: ${e.getMessage}")
        None
    }

  // ---- offsets ----------------------------------------------------------

  /** The source-scoped initial-offset metadata file (the Kafka
    * initial-offset log pattern): `initialOffset()` is NOT called once —
    * the engine re-invokes it when recovering an uncommitted batch 0
    * (the offset log already holds batch 0's END offset, the commit log
    * holds nothing). For the non-deterministic start positions
    * (`startAt=now` reads a LIVE head; `discoverRanges` polls a live
    * range set) a re-resolution after such a crash would attach at a
    * NEW head — planInputPartitions would then plan batch 0 from a
    * start AHEAD of its logged end, silently dropping the rows between
    * the two attach points. The first resolution is therefore persisted
    * under the source's checkpoint directory and replayed verbatim by
    * every later call. Written atomically (temp + rename); if a
    * concurrent writer won the rename, its value is re-read — either
    * way exactly one resolution ever reaches the offset log. */
  private def initialOffsetFile = new org.apache.hadoop.fs.Path(
    checkpointLocation, "graft-initial-offset")

  private def hadoopConf() =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def loadPersistedInitial(): Option[Offset] = {
    val p = initialOffsetFile
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(deserializeOffset(
          new String(out.toByteArray, StandardCharsets.UTF_8)))
      } finally in.close()
    }
  }

  /** Persist the first resolution (temp + rename, so a crash mid-write
    * never leaves a torn destination). First-resolution-wins is
    * FS-DEPENDENT: HDFS rename fails when the destination exists, but
    * RawLocalFileSystem delegates to POSIX rename, which atomically
    * OVERWRITES — so on local FS a concurrent second writer would
    * last-win. The exists-check below plus the adopt-by-re-read after
    * the rename narrows that window; it cannot eliminate it on POSIX.
    * That residue is harmless in-engine: Structured Streaming calls
    * `initialOffset()` from one driver thread per query, so concurrent
    * first-resolutions of one checkpoint never actually race. */
  private def persistInitial(o: Offset): Offset = {
    val p = initialOffsetFile
    val fs = p.getFileSystem(hadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(
      checkpointLocation, s".graft-initial-offset.${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, false)
    try out.write(o.json().getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(p)) {
      // a concurrent resolution already landed: theirs is authoritative
      fs.delete(tmp, false)
      loadPersistedInitial().getOrElse(o)
    } else if (fs.rename(tmp, p)) {
      // re-read rather than return `o`: on POSIX the rename may have
      // overwritten (or been overwritten by) a concurrent writer —
      // adopting the file's actual content keeps every caller agreeing
      // on ONE persisted resolution either way
      loadPersistedInitial().getOrElse(o)
    } else {
      // rename refused (HDFS semantics): the other resolution won
      fs.delete(tmp, false)
      loadPersistedInitial().getOrElse(o)
    }
  }

  /** Resolve the start position from the live feed — called at most
    * once per checkpoint lifetime (see [[initialOffsetFile]]). */
  private def resolveInitialOffset(): Offset =
    if (tokenMode) {
      val initialRanges =
        if (discoverRangesOn) discoverRanges() match {
          case Some(ids) => (rangeIds ++ ids).distinct.sorted
          case None if startAtNow => throw new IOException(
            s"http-feed: range discovery $rangesUrl failed at first start " +
              "with startAt=now — cannot resolve the attach position")
          // beginning-start: missed ranges are admitted by a later
          // trigger's discovery at their own start tokens, losing nothing
          case None => rangeIds
        }
        else rangeIds
      if (startAtNow)
        TokenOffset(initialRanges.map { r =>
          // O(1) head-token attach when the protocol offers it;
          // otherwise the trimmed walk: O(history) tiny head GETs but
          // O(1) driver memory — tokens below the attach point are
          // never needed
          r -> fetchHeadToken(r).orElse(walkToHeadTrimmed(r))
            .getOrElse(throw new IOException(
              s"http-feed: head chain walk (range '$r') failed at first " +
                "start with startAt=now — cannot resolve the attach position"))
        }.toMap)
      else
        TokenOffset(initialRanges.map(r => r -> RangeCursor(0L, startTok(r))).toMap)
    } else if (startAtNow) {
      val h = fetchHead()
      if (h < 0) throw new IOException(
        s"http-feed: head poll $headUrl failed at first start with " +
          "startAt=now — starting at page 0 instead would replay the feed")
      PageOffset(math.max(h, startPage))
    } else PageOffset(startPage)

  override def initialOffset(): Offset =
    loadPersistedInitial().getOrElse(persistInitial(resolveInitialOffset()))

  /** Rotates the round-robin sweep's starting range across triggers:
    * with budget < |ranges| a fixed sweep order would hand every page
    * of every trigger to the same (sorted-first) hot range and starve
    * the rest forever. Fairness only — resets on restart. */
  private var sweepStart = 0

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = capFor(limit)
    if (tokenMode) {
      val s = start.asInstanceOf[TokenOffset]
      // discovery runs at batch planning (not while an AvailableNow
      // drain is pinned — that run processes what existed at prepare);
      // None = discovery unavailable this trigger, retire nothing
      val disc: Option[Seq[String]] =
        if (discoverRangesOn && availableNowTargets.isEmpty) discoverRanges()
        else None
      // availableNowRanges covers a pinned drain whose range set was
      // discovered at prepare but (e.g. after a discovery blip at first
      // start) is absent from both the start offset and the static list
      val known = (s.cursors.keySet ++ rangeIds ++ disc.getOrElse(Nil) ++
        availableNowRanges).toSeq.sorted
      // the page budget is TOTAL across ranges, spread round-robin so a
      // hot range cannot starve the others; a range stops contributing
      // when its chain hits the feed head (or a transient head error),
      // when it reaches a pinned AvailableNow target, or terminally
      // when it drained and discovery no longer lists it
      val cur = mutable.Map.empty[String, Long]
      val live = mutable.Set.empty[String]
      known.foreach { r =>
        if (!terminal.contains(r)) {
          val c = s.cursors.getOrElse(r, RangeCursor(0L, startTok(r)))
          anchor(r, c)
          cur(r) = c.epoch
          // a range discovered THIS trigger is admitted with zero pages
          // (consumes from the next trigger) — the admission batch must
          // not need the range's start token on replay
          val admittedNow = !s.cursors.contains(r) && !rangeIds.contains(r)
          if (!admittedNow) live += r
        }
      }
      // pinned AvailableNow drain targets; pin-on-first-sight covers
      // checkpointed ranges prepare could not know (e.g. a retired
      // split parent still carrying backlog)
      def target(r: String): Long = availableNowTargets match {
        case Some(m) =>
          m.getOrElseUpdate(r, walkToHead(r).getOrElse(throw new IOException(
            s"http-feed: head chain walk (range '$r') failed while " +
              "pinning its Trigger.AvailableNow drain target — failing " +
              "loudly instead of silently under-draining")))
        case None => Long.MaxValue
      }
      val k = if (known.isEmpty) 0 else sweepStart % known.size
      sweepStart += 1
      val sweepOrder = known.drop(k) ++ known.take(k)
      var budget = cap
      while (budget > 0 && live.nonEmpty) {
        // one round-robin sweep over the still-advancing ranges
        sweepOrder.filter(live.contains).foreach { r =>
          if (budget > 0) {
            val ch = chains(r)
            val n = cur(r)
            if (n >= target(r)) live -= r // AvailableNow drain target hit
            else if (ch.top > n) { cur(r) = n + 1; budget -= 1 }
            else advance(r, ch.at(n)) match {
              case Right(Some(t)) => ch.toks += t; cur(r) = n + 1; budget -= 1
              case Right(None) => // at this range's head
                live -= r
                if (disc.exists(d => !d.contains(r))) terminal += r
              case Left(err) =>
                System.err.println(s"[http-feed] $err (idling range)")
                live -= r
            }
          }
        }
      }
      TokenOffset(known.map { r =>
        if (terminal.contains(r) && !cur.contains(r))
          r -> s.cursors(r) // retired range: committed cursor verbatim
        else r -> RangeCursor(cur(r), chains(r).at(cur(r)))
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
      // the END offset is authoritative for the batch's range set: a
      // dynamically admitted range exists there before it ever has a
      // start-offset entry
      e.cursors.keys.toSeq.sorted.flatMap { r =>
        val ec = e.cursors(r)
        val sc = s.cursors.getOrElse(r,
          if (rangeIds.contains(r)) RangeCursor(0L, startTok(r))
          else {
            // dynamically discovered ranges are admitted with zero
            // pages, so their first batch is replayable from the end
            // offset alone
            require(ec.epoch == 0L,
              s"http-feed: range '$r' missing from the start offset " +
                s"with ${ec.epoch} consumed pages — the offset log " +
                "predates this range's admission batch")
            ec
          })
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
