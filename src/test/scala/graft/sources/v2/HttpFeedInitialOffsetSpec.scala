package graft.sources.v2

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `initialOffset()` is re-invoked by the engine when it recovers an
  * uncommitted batch 0 (the offset log holds batch 0's END offset, the
  * commit log holds nothing — MicroBatchExecution's start-offset
  * fallback). With `startAt=now` the resolution reads a LIVE head, so a
  * second call after the feed advanced would attach AHEAD of the logged
  * end and silently drop the rows in between. The fix: the first
  * resolution persists under the source's checkpoint directory (the
  * Kafka initial-offset-log pattern) and every later call — including
  * one from a FRESH stream instance, as recovery constructs — replays
  * it verbatim. */
class HttpFeedInitialOffsetSpec extends graft.SparkSpec {

  /** Minimal token-protocol feed: tokens `t<k>`; head grows with the
    * counter. Page fetches are not needed — only offset resolution. */
  private def withServer(f: (String, AtomicLong) => Unit): Unit = {
    val head = new AtomicLong(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val cursor = query.split("&").collectFirst {
        case kv if kv.startsWith("cursor=") =>
          java.net.URLDecoder.decode(kv.substring(7), StandardCharsets.UTF_8)
      }.getOrElse("")
      val pos = if (cursor.isEmpty) -1L else cursor.stripPrefix("t").toLong
      val body =
        if (ex.getRequestURI.getPath.endsWith("/head"))
          if (pos + 1 < head.get()) s"""{"next": "t${pos + 1}"}"""
          else """{"next": null}"""
        else s"""[{"id":"p$pos"}]"""
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items", head)
    finally server.stop(0)
  }

  private def stream(url: String, ckpt: String,
      extra: (String, String)*): HttpFeedMicroBatch = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("url", url)
    opts.put("startAt", "now")
    opts.put("retryBackoffMs", "20")
    extra.foreach { case (k, v) => opts.put(k, v) }
    new HttpFeedMicroBatch(HttpJsonSource.defaultSchema,
      new CaseInsensitiveStringMap(opts), ckpt)
  }

  test("startAt=now (token): uncommitted-batch-0 recovery replays the SAME attach position") {
    withServer { (url, head) =>
      val ckpt = Files.createTempDirectory("graft_init_tok").toString
      head.set(3)
      val first = stream(url, ckpt, "cursorMode" -> "token").initialOffset()
      assert(first.json().contains("t2"), s"attach not at the live head: ${first.json()}")
      // the crash window: batch 0's end offset was logged, nothing
      // committed, and the feed keeps publishing before recovery
      head.set(7)
      val recovered = stream(url, ckpt, "cursorMode" -> "token").initialOffset()
      assert(recovered.json() == first.json(),
        s"recovery re-resolved a NEW live head — batch 0's rows between " +
          s"the two attach points are lost: ${first.json()} vs ${recovered.json()}")
      // a genuinely fresh checkpoint still attaches at the CURRENT head
      val fresh = stream(url,
        Files.createTempDirectory("graft_init_tok2").toString,
        "cursorMode" -> "token").initialOffset()
      assert(fresh.json() != first.json(),
        "fresh checkpoint did not re-resolve the live head")
    }
  }

  test("startAt=now (page): uncommitted-batch-0 recovery replays the SAME attach position") {
    withServer { (url, head) =>
      // page mode reads {"head": N}; this server speaks token-head, so
      // run a page server inline instead
      val pageHead = new AtomicLong(5)
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/pages", (ex: HttpExchange) => {
        val body =
          if (ex.getRequestURI.getPath.endsWith("/head"))
            s"""{"head": ${pageHead.get()}}"""
          else "[]"
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.getResponseBody.close(); ex.close()
      })
      server.start()
      try {
        val pUrl = s"http://127.0.0.1:${server.getAddress.getPort}/pages"
        val ckpt = Files.createTempDirectory("graft_init_pg").toString
        val first = stream(pUrl, ckpt).initialOffset()
        assert(first.json() == "5")
        pageHead.set(9)
        assert(stream(pUrl, ckpt).initialOffset().json() == "5",
          "page-mode recovery re-read the live head")
      } finally server.stop(0)
    }
  }
}
