package graft.sources.v2

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Unit-level fairness contract of the ranged token cursor: when the
  * per-trigger page budget is SMALLER than the range count, the
  * round-robin sweep must rotate its starting range across triggers —
  * a fixed order would hand every page of every trigger to the
  * sorted-first range and starve the rest as long as it keeps
  * publishing (exactly the continuously-hot-range case a sharded feed
  * exists for). */
class HttpFeedFairnessSpec extends graft.SparkSpec {

  test("budget < ranges: consecutive triggers advance DIFFERENT ranges") {
    // token feed with two ranges, both with deep backlogs
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      def param(n: String) = q.split("&").collectFirst {
        case kv if kv.startsWith(n + "=") =>
          java.net.URLDecoder.decode(kv.substring(n.length + 1),
            StandardCharsets.UTF_8)
      }.getOrElse("")
      val r = param("range")
      val cur = param("cursor")
      val pos = if (cur.isEmpty) -1L else cur.split("-").last.toLong
      val body =
        if (ex.getRequestURI.getPath.endsWith("/head"))
          s"""{"next": "$r-${pos + 1}"}""" // endless backlog on every range
        else """[{"id":"x"}]"""
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/items"
      val opts = new java.util.HashMap[String, String]()
      opts.put("url", url)
      opts.put("cursorMode", "token")
      opts.put("ranges", "ra,rb")
      opts.put("maxPagesPerTrigger", "1")
      val mb = new HttpFeedMicroBatch(HttpJsonSource.defaultSchema,
        new CaseInsensitiveStringMap(opts),
        java.nio.file.Files.createTempDirectory("graft_fair_ckpt").toString)
      val limit = ReadLimit.maxRows(1)
      var off = mb.initialOffset().asInstanceOf[TokenOffset]
      val advanced = (0 until 4).map { _ =>
        val next = mb.latestOffset(off, limit).asInstanceOf[TokenOffset]
        val moved = next.cursors.collect {
          case (r, c) if c.epoch > off.cursors(r).epoch => r
        }.toSeq
        off = next
        assert(moved.size == 1, s"1-page budget must advance exactly one range, got $moved")
        moved.head
      }
      assert(advanced.toSet == Set("ra", "rb"),
        s"fixed sweep order starved a range: trigger sequence $advanced")
      // and the budget stays TOTAL: epochs sum to the number of triggers
      assert(off.cursors.values.map(_.epoch).sum == 4)
    } finally server.stop(0)
  }
}
