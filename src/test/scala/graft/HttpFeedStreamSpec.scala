package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** Drives the `http-feed` change-feed source end-to-end over a live
  * loopback endpoint: cursor offsets advance with the published head,
  * maxPagesPerTrigger bounds every micro-batch, a checkpoint restart
  * resumes from the committed cursor WITHOUT refetching delivered
  * pages (the offset log plays the Cosmos lease role), and a transient
  * head failure idles the stream instead of killing it. */
class HttpFeedStreamSpec extends SparkSpec {

  /** Feed server: /items/head → {"head": N}, /items?page=k → 2-row JSON
    * array for k < N, 404 past the head. `headFails` simulates a
    * transient head-endpoint outage. Records every page fetch. */
  private def withFeed(f: (String, AtomicLong, AtomicLong,
      ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val head = new AtomicLong(0)
    val headFails = new AtomicLong(0)
    val fetched = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      def send(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) { ex.getResponseBody.write(b); ex.getResponseBody.close() }
        ex.close()
      }
      if (path.endsWith("/head")) {
        if (headFails.get() > 0) { headFails.decrementAndGet(); send(503, "") }
        else send(200, s"""{"head": ${head.get()}}""")
      } else {
        val page = query.split("=").last.toLong
        fetched.add(s"page=$page")
        if (page < head.get())
          send(200, s"""[{"id":"p${page}a","Name":"Item_${page}_a"},
                       | {"id":"p${page}b","Name":"Item_${page}_b"}]""".stripMargin)
        else send(404, "")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items",
      head, headFails, fetched)
    finally server.stop(0)
  }

  test("cursor offsets, per-trigger page cap, lease-style resume from checkpoint") {
    withFeed { (url, head, headFails, fetched) =>
      val ckpt = Files.createTempDirectory("graft_feed_ckpt").toString
      val batchSizes = new ConcurrentLinkedQueue[Long]()
      val ids = new ConcurrentLinkedQueue[String]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("maxPagesPerTrigger", "2").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = df.select(col("id")).collect().map(_.getString(0))
          batchSizes.add(got.length.toLong)
          got.foreach(ids.add)
        }.start()

      head.set(3)
      val q = start()
      q.processAllAvailable()
      assert(ids.size == 6, s"3 pages x 2 rows expected, got ${ids.size}")
      // backpressure: no batch may exceed maxPagesPerTrigger * rows/page
      assert(batchSizes.toArray.forall(_.asInstanceOf[Long] <= 4L),
        s"a micro-batch exceeded the 2-page cap: $batchSizes")

      // the feed grows while the query runs: the cursor follows the head
      head.set(5)
      q.processAllAvailable()
      assert(ids.size == 10)

      // transient head outage: the poll loop keeps running, absorbs the
      // 503s, and the stream stays active with no data loss. Wait until
      // BOTH planted failures are consumed so they can't leak into the
      // restarted query's first polls.
      headFails.set(2)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (headFails.get() > 0 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(headFails.get() == 0, "head poll loop stopped polling during outage")
      q.processAllAvailable()
      assert(q.isActive && ids.size == 10)
      q.stop()

      // restart against the SAME checkpoint: the committed cursor is the
      // lease — only the newly published page is fetched
      val before = fetched.toArray.count(_ == "page=0")
      head.set(6)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      assert(ids.size == 12, s"resume lost or duplicated rows: ${ids.size}")
      assert(ids.toArray.distinct.length == 12, "duplicate ids after resume")
      assert(fetched.toArray.count(_ == "page=0") == before,
        "restart refetched an already-committed page — the offset lease leaked")
    }
  }
}
