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
        if (page < head.get()) {
          def item(sfx: String) =
            s"""{"id":"p$page$sfx","Date":"2020-05-01 10:00:00",
               |"Desc":"Sample item #$page$sfx","Done":"true",
               |"Name":"Item_${page}_$sfx","Pr":"Additional field info",
               |"LogicalPartition":"Partition_A"}""".stripMargin
          send(200, s"[${item("a")},${item("b")}]")
        } else send(404, "")
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

  test("churn: abrupt kills during a LIVE feed stay exactly-once downstream") {
    // the soak discipline (SoakHarness) applied to the new connector: a
    // publisher grows the feed while the consumer is repeatedly KILLED
    // mid-flight (abrupt stop, no drain). At-least-once page refetch +
    // the idempotent per-epoch overwrite sink must converge to
    // exactly-once rows — the offset log carries the cursor across
    // every kill.
    withFeed { (url, head, _, _) =>
      val base = Files.createTempDirectory("graft_feed_churn")
      val out = base.resolve("out").toString
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("maxPagesPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epochId: Long) =>
          // idempotent replay: a re-delivered epoch overwrites its own dir
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$out/batch=$epochId")
        }.start()

      val totalPages = 24
      @volatile var publishing = true
      val publisher = new Thread(() => {
        while (publishing && head.get() < totalPages) {
          head.incrementAndGet(); Thread.sleep(120)
        }
      })
      publisher.start()
      var q = start()
      var restarts = 0
      while (head.get() < totalPages) {
        Thread.sleep(1100)
        q.stop() // abrupt: no drain, batches die mid-flight
        q.exception.foreach(throw _) // any failure is a real break
        q = start()
        restarts += 1
      }
      publishing = false; publisher.join()
      q.processAllAvailable() // final graceful drain
      q.stop()
      assert(restarts >= 3, s"churn loop barely churned: $restarts restarts")
      val got = spark.read.parquet(out)
      assert(got.count() == totalPages * 2L,
        s"lost or duplicated rows across $restarts kills")
      assert(got.select("id").distinct().count() == totalPages * 2L,
        "duplicate ids after churn — replay was not idempotent")
    }
  }

  /** Token-protocol feed server: pages are identified by OPAQUE tokens
    * (`tok-k-<mixed bits>` — nothing numeric-orderable about them from
    * the client's view). `/items/head?cursor=t` → `{"next": ...}` names
    * the page after position t (null at the head); `/items?cursor=t` →
    * that page's 2-row JSON array. */
  private def withTokenFeed(f: (String, AtomicLong,
      ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val head = new AtomicLong(0)
    val fetched = new ConcurrentLinkedQueue[String]()
    def tok(k: Long): String =
      s"tok-$k-${java.lang.Long.toHexString((k * 2654435761L) & 0xffffffL)}"
    def parseTok(t: String): Option[Long] =
      if (t.isEmpty) Some(-1L)
      else t.split("-") match {
        case Array("tok", k, _) => scala.util.Try(k.toLong).toOption
        case _ => None
      }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val cursor = query.split("&").collectFirst {
        case kv if kv.startsWith("cursor=") =>
          java.net.URLDecoder.decode(kv.substring(7), StandardCharsets.UTF_8)
      }.getOrElse("")
      def send(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) { ex.getResponseBody.write(b); ex.getResponseBody.close() }
        ex.close()
      }
      parseTok(cursor) match {
        case None => send(400, "")
        case Some(pos) =>
          if (path.endsWith("/head")) {
            if (pos + 1 < head.get()) send(200, s"""{"next": "${tok(pos + 1)}"}""")
            else send(200, """{"next": null}""")
          } else {
            fetched.add(s"page=$pos")
            if (pos >= 0 && pos < head.get()) {
              def item(sfx: String) =
                s"""{"id":"p$pos$sfx","Name":"Item_${pos}_$sfx",
                   |"LogicalPartition":"Partition_A"}""".stripMargin
              send(200, s"[${item("a")},${item("b")}]")
            } else send(404, "")
          }
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items", head, fetched)
    finally server.stop(0)
  }

  test("token cursor mode: opaque continuation tokens drive the lease") {
    withTokenFeed { (url, head, fetched) =>
      val ckptDir = Files.createTempDirectory("graft_tok_ckpt")
      val ckpt = ckptDir.toString
      val ids = new ConcurrentLinkedQueue[String]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()

      head.set(3)
      val q = start()
      q.processAllAvailable()
      assert(ids.size == 6, s"3 token pages x 2 rows expected, got ${ids.size}")

      // the feed grows while the query runs
      head.set(5)
      q.processAllAvailable()
      assert(ids.size == 10)
      q.stop()

      // the OPAQUE TOKEN is in the offset log VERBATIM (the portable
      // lease: a Cosmos/Kafka-REST continuation would ride the same way)
      val offsets = ckptDir.resolve("offsets")
      // numeric batch files only — the local FS checkpoint also holds
      // binary .crc sidecars that are not UTF-8
      val logged = java.nio.file.Files.list(offsets).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.forall(_.isDigit))
        .map(_.toString).sorted
        .flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines())
      assert(logged.exists(l => l.contains("\"token\"") && l.contains("tok-")),
        s"offset log does not carry the verbatim token: ${logged.mkString("\n")}")

      // restart against the SAME checkpoint: resume from the committed
      // token — already-delivered pages are not refetched
      val before = fetched.toArray.count(_ == "page=0")
      head.set(6)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      assert(ids.size == 12, s"token resume lost or duplicated rows: ${ids.size}")
      assert(ids.toArray.distinct.length == 12, "duplicate ids after token resume")
      assert(fetched.toArray.count(_ == "page=0") == before,
        "restart refetched a committed page — the token lease leaked")
    }
  }

  test("token-mode churn: abrupt kills stay exactly-once (portable-feed contract)") {
    withTokenFeed { (url, head, _) =>
      val base = Files.createTempDirectory("graft_tok_churn")
      val out = base.resolve("out").toString
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("maxPagesPerTrigger", "1")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epochId: Long) =>
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$out/batch=$epochId")
        }.start()

      val totalPages = 24
      @volatile var publishing = true
      val publisher = new Thread(() => {
        while (publishing && head.get() < totalPages) {
          head.incrementAndGet(); Thread.sleep(120)
        }
      })
      publisher.start()
      var q = start()
      var restarts = 0
      while (head.get() < totalPages) {
        Thread.sleep(1100)
        q.stop() // abrupt: no drain; the in-memory chain cache dies too
        q.exception.foreach(throw _)
        q = start() // forces the anchor-at-start-offset rebuild path
        restarts += 1
      }
      publishing = false; publisher.join()
      q.processAllAvailable()
      q.stop()
      assert(restarts >= 3, s"churn loop barely churned: $restarts restarts")
      val got = spark.read.parquet(out)
      assert(got.count() == totalPages * 2L,
        s"lost or duplicated rows across $restarts token-mode kills")
      assert(got.select("id").distinct().count() == totalPages * 2L,
        "duplicate ids after token churn — replay was not idempotent")
    }
  }

  /** Two-range token feed (the Cosmos FeedRange shape): each range has
    * its own independent token chain and head. Range ids "ra"/"rb". */
  private def withRangedFeed(f: (String, AtomicLong, AtomicLong,
      ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val heads = Map("ra" -> new AtomicLong(0), "rb" -> new AtomicLong(0))
    val fetched = new ConcurrentLinkedQueue[String]()
    def tok(r: String, k: Long): String = s"$r-tok-$k"
    def parseTok(r: String, t: String): Option[Long] =
      if (t.isEmpty) Some(-1L)
      else t.split("-") match {
        case Array(`r`, "tok", k) => scala.util.Try(k.toLong).toOption
        case _ => None
      }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      def param(name: String): String = query.split("&").collectFirst {
        case kv if kv.startsWith(name + "=") =>
          java.net.URLDecoder.decode(kv.substring(name.length + 1),
            StandardCharsets.UTF_8)
      }.getOrElse("")
      def send(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) { ex.getResponseBody.write(b); ex.getResponseBody.close() }
        ex.close()
      }
      val r = param("range")
      heads.get(r) match {
        case None => send(400, "")
        case Some(head) => parseTok(r, param("cursor")) match {
          case None => send(400, "")
          case Some(pos) =>
            if (path.endsWith("/head")) {
              if (pos + 1 < head.get()) send(200, s"""{"next": "${tok(r, pos + 1)}"}""")
              else send(200, """{"next": null}""")
            } else {
              fetched.add(s"$r=$pos")
              if (pos >= 0 && pos < head.get()) {
                def item(sfx: String) =
                  s"""{"id":"$r-p$pos$sfx","Name":"Item_${r}_${pos}_$sfx",
                     |"LogicalPartition":"Partition_A"}""".stripMargin
                send(200, s"[${item("a")},${item("b")}]")
              } else send(404, "")
            }
        }
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items",
      heads("ra"), heads("rb"), fetched)
    finally server.stop(0)
  }

  test("multi-range token cursors: per-range chains, fair budget, per-range resume") {
    withRangedFeed { (url, headA, headB, fetched) =>
      val ckptDir = Files.createTempDirectory("graft_rng_ckpt")
      val ids = new ConcurrentLinkedQueue[String]()
      val batchSizes = new ConcurrentLinkedQueue[Long]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("ranges", "ra,rb")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = df.select(col("id")).collect().map(_.getString(0))
          batchSizes.add(got.length.toLong)
          got.foreach(ids.add)
        }.start()

      // an UNBALANCED backlog: the 2-page budget must round-robin, so
      // range rb (1 page) lands alongside ra's first page in batch one
      headA.set(4); headB.set(1)
      val q = start()
      q.processAllAvailable()
      assert(ids.size == 10, s"4+1 pages x 2 rows expected, got ${ids.size}")
      assert(ids.toArray.map(_.toString).count(_.startsWith("rb-")) == 2,
        "range rb's page did not arrive")
      // total budget, not per-range: no batch over 2 pages x 2 rows
      assert(batchSizes.toArray.forall(_.asInstanceOf[Long] <= 4L),
        s"a batch exceeded the TOTAL 2-page budget: $batchSizes")

      // the offset log carries BOTH ranges' verbatim tokens
      val logged = java.nio.file.Files.list(ckptDir.resolve("offsets")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.forall(_.isDigit))
        .map(_.toString).sorted
        .flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines())
      assert(logged.exists(l => l.contains("ra-tok-") && l.contains("rb-tok-")),
        s"per-range tokens missing from the offset log:\n${logged.mkString("\n")}")
      q.stop()

      // restart: each range resumes from ITS OWN committed token
      val beforeA0 = fetched.toArray.count(_ == "ra=0")
      val beforeB0 = fetched.toArray.count(_ == "rb=0")
      headA.set(5); headB.set(3)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      assert(ids.size == 16, s"per-range resume lost/duplicated rows: ${ids.size}")
      assert(ids.toArray.distinct.length == 16, "duplicate ids after ranged resume")
      assert(fetched.toArray.count(_ == "ra=0") == beforeA0 &&
        fetched.toArray.count(_ == "rb=0") == beforeB0,
        "restart refetched a committed page — a range's token lease leaked")
    }
  }

  test("multi-range AvailableNow drains every range's backlog") {
    withRangedFeed { (url, headA, headB, _) =>
      headA.set(3); headB.set(4)
      val base = Files.createTempDirectory("graft_rng_an")
      var total = 0L
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("ranges", "ra,rb")
        .option("maxPagesPerTrigger", "2").load()
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          total += df.count()
        }.start()
      assert(q.awaitTermination(120000),
        "ranged AvailableNow query did not self-terminate")
      assert(total == 14, s"ranged AvailableNow drained $total/14 rows")
    }
  }

  test("Trigger.AvailableNow drains the whole backlog through capped batches") {
    withFeed { (url, head, _, _) =>
      head.set(7) // backlog > maxPagesPerTrigger: needs multiple batches
      val base = Files.createTempDirectory("graft_feed_an")
      val batches = new ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("maxPagesPerTrigger", "2").load()
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(df.count()); ()
        }.start()
      assert(q.awaitTermination(120000),
        "AvailableNow query did not self-terminate")
      val sizes = batches.toArray.map(_.asInstanceOf[Long])
      assert(sizes.sum == 14,
        s"AvailableNow left backlog unread: drained ${sizes.sum}/14 rows " +
          s"(the pre-fix behavior read one capped batch and stopped)")
      // admission control still applies per batch
      assert(sizes.forall(_ <= 4L),
        s"a batch exceeded the 2-page cap under AvailableNow: ${sizes.mkString(",")}")
    }
  }

  test("Trigger.AvailableNow drains a token-mode backlog to the feed head") {
    withTokenFeed { (url, head, _) =>
      head.set(5)
      val base = Files.createTempDirectory("graft_tok_an")
      var total = 0L
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("maxPagesPerTrigger", "2").load()
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          total += df.count()
        }.start()
      assert(q.awaitTermination(120000),
        "token-mode AvailableNow query did not self-terminate")
      assert(total == 10, s"token-mode AvailableNow drained $total/10 rows")
    }
  }

  test("startAt=now (page mode) attaches at the live head — history never fetched") {
    withFeed { (url, head, _, fetched) =>
      head.set(5) // 5 pages of history that must NOT replay
      val ckpt = Files.createTempDirectory("graft_feed_now").toString
      val ids = new ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("startAt", "now")
        .option("maxPagesPerTrigger", "2").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()
      q.processAllAvailable()
      assert(ids.isEmpty, s"startAt=now replayed history: ${ids.size} rows")
      head.set(7) // two post-attach pages
      q.processAllAvailable()
      q.stop()
      val got = ids.toArray.map(_.toString).toSet
      assert(got == Set("p5a", "p5b", "p6a", "p6b"),
        s"expected exactly the post-attach pages, got $got")
      assert(!fetched.toArray.map(_.toString).exists(p =>
        p.stripPrefix("page=").toLong < 5),
        s"a history page was fetched despite startAt=now: $fetched")
    }
  }

  test("startAt=now (token mode) walks to the head once, observes only new pages") {
    withTokenFeed { (url, head, fetched) =>
      head.set(3)
      val ckpt = Files.createTempDirectory("graft_tok_now").toString
      val ids = new ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("startAt", "now").option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()
      q.processAllAvailable()
      assert(ids.isEmpty, s"token startAt=now replayed history: ${ids.size} rows")
      head.set(5)
      q.processAllAvailable()
      q.stop()
      val got = ids.toArray.map(_.toString).toSet
      assert(got == Set("p3a", "p3b", "p4a", "p4b"),
        s"expected exactly the post-attach token pages, got $got")
      assert(!fetched.toArray.map(_.toString).exists(p =>
        p.stripPrefix("page=").toLong < 3),
        s"a history page was fetched despite startAt=now: $fetched")
    }
  }

  /** Token feed with an O(1) head-token endpoint (`/items/headtoken` →
    * `{"token": <current head cursor>}`, the Cosmos one-call attach
    * shape) plus a counter of head-CHAIN GETs — the evidence surface
    * for the fast-attach path: an attach that walks pays O(history)
    * chain GETs, one that uses the endpoint pays none. `tokenFails`
    * turns the endpoint into a 500 to drive the walk fallback. */
  private def withHeadTokenFeed(f: (String, AtomicLong, AtomicLong,
      java.util.concurrent.atomic.AtomicBoolean,
      ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val head = new AtomicLong(0)
    val headGets = new AtomicLong(0)
    val tokenFails = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fetched = new ConcurrentLinkedQueue[String]()
    def tok(k: Long): String = s"tok-$k"
    def parseTok(t: String): Option[Long] =
      if (t.isEmpty) Some(-1L)
      else t.split("-") match {
        case Array("tok", k) => scala.util.Try(k.toLong).toOption
        case _ => None
      }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val cursor = query.split("&").collectFirst {
        case kv if kv.startsWith("cursor=") =>
          java.net.URLDecoder.decode(kv.substring(7), StandardCharsets.UTF_8)
      }.getOrElse("")
      def send(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) { ex.getResponseBody.write(b); ex.getResponseBody.close() }
        ex.close()
      }
      if (path.endsWith("/headtoken")) {
        if (tokenFails.get()) send(500, "")
        else if (head.get() == 0) send(200, """{"token": null}""")
        else send(200, s"""{"token": "${tok(head.get() - 1)}"}""")
      } else parseTok(cursor) match {
        case None => send(400, "")
        case Some(pos) =>
          if (path.endsWith("/head")) {
            headGets.incrementAndGet()
            if (pos + 1 < head.get()) send(200, s"""{"next": "${tok(pos + 1)}"}""")
            else send(200, """{"next": null}""")
          } else {
            fetched.add(s"page=$pos")
            if (pos >= 0 && pos < head.get()) {
              def item(sfx: String) =
                s"""{"id":"p$pos$sfx","Name":"Item_${pos}_$sfx",
                   |"LogicalPartition":"Partition_A"}""".stripMargin
              send(200, s"[${item("a")},${item("b")}]")
            } else send(404, "")
          }
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items", head,
      headGets, tokenFails, fetched)
    finally server.stop(0)
  }

  test("headTokenUrl: startAt=now on a 40-page feed attaches O(1) — no history walk") {
    withHeadTokenFeed { (url, head, headGets, _, fetched) =>
      head.set(40) // deep history: a chain walk would cost >= 40 head GETs
      val ckpt = Files.createTempDirectory("graft_tok_fast").toString
      val ids = new ConcurrentLinkedQueue[String]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("startAt", "now").option("headTokenUrl", s"$url/headtoken")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()
      val q = start()
      q.processAllAvailable()
      assert(ids.isEmpty, s"fast attach replayed history: ${ids.size} rows")
      val attachGets = headGets.get()
      assert(attachGets < 10,
        s"attach cost $attachGets head-chain GETs on a 40-page feed — " +
          "the head-token endpoint was not used (a walk costs >= 40)")
      head.set(42)
      q.processAllAvailable()
      q.stop()
      val got = ids.toArray.map(_.toString).toSet
      assert(got == Set("p40a", "p40b", "p41a", "p41b"),
        s"expected exactly the post-attach pages, got $got")
      assert(!fetched.toArray.map(_.toString).exists(p =>
        p.stripPrefix("page=").toLong < 40),
        s"a history page was fetched despite the fast attach: $fetched")
    }
  }

  test("headTokenUrl outage falls back to the chain walk — same attach position") {
    withHeadTokenFeed { (url, head, headGets, tokenFails, _) =>
      tokenFails.set(true)
      head.set(5)
      val ckpt = Files.createTempDirectory("graft_tok_fastfail").toString
      val ids = new ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("startAt", "now").option("headTokenUrl", s"$url/headtoken")
        .option("maxPagesPerTrigger", "2")
        .option("maxRetries", "0").option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()
      q.processAllAvailable()
      assert(ids.isEmpty, s"fallback attach replayed history: ${ids.size} rows")
      assert(headGets.get() >= 5,
        s"only ${headGets.get()} head-chain GETs — the walk fallback did not run")
      head.set(6)
      q.processAllAvailable()
      q.stop()
      val got = ids.toArray.map(_.toString).toSet
      assert(got == Set("p5a", "p5b"),
        s"expected exactly the post-attach page, got $got")
    }
  }

  test("token-mode AvailableNow pins the prepare-time backlog — a live feed can't extend it") {
    withTokenFeed { (url, head, _) =>
      head.set(4)
      val base = Files.createTempDirectory("graft_tok_an_pin")
      val total = new AtomicLong(0)
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          total.addAndGet(df.count())
          // the feed keeps publishing MID-DRAIN: without the pinned
          // per-range target epoch, latestOffset would chase this head
          // and the pre-fix query would drain 10 pages (or never stop
          // against a steadily growing feed)
          head.set(10); ()
        }.start()
      assert(q.awaitTermination(120000),
        "pinned AvailableNow query did not self-terminate")
      assert(total.get() == 8,
        s"AvailableNow drained ${total.get()}/8 rows — the prepare-time " +
          "pin leaked (post-start pages were consumed)")
    }
  }

  test("page-mode AvailableNow prepare fails LOUDLY on a dead head (no silent live drain)") {
    withFeed { (url, head, headFails, _) =>
      head.set(3)
      headFails.set(100) // outlasts the transport retry budget
      val base = Files.createTempDirectory("graft_feed_an_fail")
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").option("maxRetries", "1").load()
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(failed).exists(m => m != null &&
        m.contains("pinning the Trigger.AvailableNow drain target")),
        s"query failed for the wrong reason: ${chain(failed).mkString(" <- ")}")
    }
  }

  /** Split-capable discovered-range feed: `/items/ranges` advertises the
    * CURRENT range set (the Cosmos FeedRange discovery shape); each
    * range has its own token chain (`<r>-tok-<k>`) and head counter. A
    * split retires the parent (its chain stays drained at its final
    * head — still answerable, never growing) and advertises children. */
  private def withSplitFeed(f: (String,
      scala.collection.concurrent.TrieMap[String, AtomicLong],
      java.util.concurrent.atomic.AtomicReference[Seq[String]],
      ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val heads = scala.collection.concurrent.TrieMap[String, AtomicLong]()
    val advertised = new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)
    val polls = new ConcurrentLinkedQueue[String]() // head+page+ranges calls
    def tok(r: String, k: Long): String = s"$r-tok-$k"
    def parseTok(r: String, t: String): Option[Long] =
      if (t.isEmpty) Some(-1L)
      else if (t.startsWith(s"$r-tok-"))
        scala.util.Try(t.stripPrefix(s"$r-tok-").toLong).toOption
      else None
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/items", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      def param(name: String): String = query.split("&").collectFirst {
        case kv if kv.startsWith(name + "=") =>
          java.net.URLDecoder.decode(kv.substring(name.length + 1),
            StandardCharsets.UTF_8)
      }.getOrElse("")
      def send(status: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) { ex.getResponseBody.write(b); ex.getResponseBody.close() }
        ex.close()
      }
      if (path.endsWith("/ranges")) {
        polls.add("ranges")
        send(200, advertised.get().map(r => s"""{"id":"$r"}""")
          .mkString("""{"ranges":[""", ",", "]}"))
      } else {
        val r = param("range")
        heads.get(r) match {
          case None => send(400, "")
          case Some(head) => parseTok(r, param("cursor")) match {
            case None => send(400, "")
            case Some(pos) =>
              if (path.endsWith("/head")) {
                polls.add(s"head:$r")
                if (pos + 1 < head.get()) send(200, s"""{"next": "${tok(r, pos + 1)}"}""")
                else send(200, """{"next": null}""")
              } else {
                polls.add(s"page:$r=$pos")
                if (pos >= 0 && pos < head.get()) {
                  def item(sfx: String) =
                    s"""{"id":"$r-p$pos$sfx","Name":"Item_${r}_${pos}_$sfx",
                       |"LogicalPartition":"Partition_A"}""".stripMargin
                  send(200, s"[${item("a")},${item("b")}]")
                } else send(404, "")
              }
          }
        }
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items",
      heads, advertised, polls)
    finally server.stop(0)
  }

  test("range SPLIT mid-stream: children admitted, parent retired terminal, exactly-once across restart") {
    withSplitFeed { (url, heads, advertised, polls) =>
      val ckptDir = Files.createTempDirectory("graft_split_ckpt")
      val ids = new ConcurrentLinkedQueue[String]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("discoverRanges", "true")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()

      // phase 1: one parent range with 3 pages, discovered dynamically
      // (no static `ranges` option at all)
      heads.put("ra", new AtomicLong(3))
      advertised.set(Seq("ra"))
      val q = start()
      q.processAllAvailable()
      assert(ids.size == 6, s"parent backlog: expected 6 rows, got ${ids.size}")
      q.stop() // kill at the worst moment: the split happens while down

      // phase 2: SPLIT — the parent drains (head frozen at 3) and the
      // feed now advertises two children with fresh chains
      heads.put("rb", new AtomicLong(2))
      heads.put("rc", new AtomicLong(1))
      advertised.set(Seq("rb", "rc"))
      val q2 = start()
      q2.processAllAvailable()
      assert(ids.size == 12,
        s"split admission lost/duplicated rows: ${ids.size} (want 12)")
      assert(ids.toArray.distinct.length == 12,
        "duplicate ids across the split — admission broke exactly-once")
      assert(ids.toArray.map(_.toString).count(_.startsWith("rb-")) == 4 &&
        ids.toArray.map(_.toString).count(_.startsWith("rc-")) == 2,
        s"children under-consumed: ${ids.toArray.mkString(",")}")

      // phase 3: the drained, un-advertised parent is TERMINAL — its
      // head is no longer polled while live ranges keep polling
      q2.processAllAvailable()
      val raBefore = polls.toArray.count(_ == "head:ra")
      val rbBefore = polls.toArray.count(_ == "head:rb")
      Thread.sleep(800) // continuous trigger keeps planning batches
      val raAfter = polls.toArray.count(_ == "head:ra")
      val rbAfter = polls.toArray.count(_ == "head:rb")
      assert(rbAfter > rbBefore,
        "trigger loop stalled — terminal assertion would be vacuous")
      assert(raAfter == raBefore,
        s"retired parent still polled: $raBefore -> $raAfter head polls")

      // phase 4: children keep flowing after the split
      heads("rb").set(4)
      q2.processAllAvailable()
      q2.stop()
      assert(ids.size == 16 && ids.toArray.distinct.length == 16,
        s"post-split growth lost/duplicated rows: ${ids.size} (want 16)")
    }
  }

  test("AvailableNow deep-checkpoint restart anchors at the committed cursor — O(batch) head GETs") {
    withSplitFeed { (url, heads, advertised, polls) =>
      // a "months-old" feed: 40 pages of committed history
      heads.put("ra", new AtomicLong(40))
      advertised.set(Seq("ra"))
      val ckptDir = Files.createTempDirectory("graft_deep_ckpt")
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("discoverRanges", "true")
        .option("maxPagesPerTrigger", "50")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count(); ()
        }.start()
      q.processAllAvailable() // drains all 40, commits the deep cursor
      q.stop()

      val before = polls.toArray.count(_ == "head:ra")
      assert(before >= 40, s"history drain did not walk the chain: $before")
      heads("ra").set(42) // 2 new pages since the checkpoint
      val total = new AtomicLong(0)
      val q2 = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("discoverRanges", "true")
        .option("maxPagesPerTrigger", "50")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          total.addAndGet(df.count()); ()
        }.start()
      assert(q2.awaitTermination(120000),
        "deep-restart AvailableNow query did not self-terminate")
      assert(total.get() == 4, s"restart drained ${total.get()}/4 new rows")
      val during = polls.toArray.count(_ == "head:ra") - before
      // the drain target must anchor at the CHECKPOINTED cursor (epoch
      // 40): ~3 GETs to find the head plus a couple of per-batch polls —
      // a prepare-time walk from the start token would pay >= 40
      assert(during <= 12,
        s"deep AvailableNow restart re-walked history: $during head GETs " +
          "(O(history), not O(batch))")
    }
  }

  test("range MERGE mid-stream: parents retire terminal, child admitted, exactly-once across restart") {
    withSplitFeed { (url, heads, advertised, polls) =>
      val ckptDir = Files.createTempDirectory("graft_merge_ckpt")
      val ids = new ConcurrentLinkedQueue[String]()
      def start() = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("discoverRanges", "true")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()

      // phase 1: two parent ranges, discovered dynamically
      heads.put("rb", new AtomicLong(3))
      heads.put("rc", new AtomicLong(2))
      advertised.set(Seq("rb", "rc"))
      val q = start()
      q.processAllAvailable()
      assert(ids.size == 10, s"parent backlog: expected 10 rows, got ${ids.size}")
      q.stop() // the merge happens while the consumer is down

      // phase 2: MERGE — both parents drain (heads frozen) and the feed
      // advertises ONE merged child with a fresh chain
      heads.put("rm", new AtomicLong(2))
      advertised.set(Seq("rm"))
      val q2 = start()
      q2.processAllAvailable()
      assert(ids.size == 14,
        s"merge admission lost/duplicated rows: ${ids.size} (want 14)")
      assert(ids.toArray.distinct.length == 14,
        "duplicate ids across the merge — admission broke exactly-once")
      assert(ids.toArray.map(_.toString).count(_.startsWith("rm-")) == 4,
        s"merged child under-consumed: ${ids.toArray.mkString(",")}")

      // phase 3: BOTH drained, un-advertised parents are terminal — no
      // more head polls while the child keeps polling
      q2.processAllAvailable()
      val rbBefore = polls.toArray.count(_ == "head:rb")
      val rcBefore = polls.toArray.count(_ == "head:rc")
      val rmBefore = polls.toArray.count(_ == "head:rm")
      Thread.sleep(800)
      assert(polls.toArray.count(_ == "head:rm") > rmBefore,
        "trigger loop stalled — terminal assertion would be vacuous")
      assert(polls.toArray.count(_ == "head:rb") == rbBefore &&
        polls.toArray.count(_ == "head:rc") == rcBefore,
        "a retired merge parent is still being polled")

      // phase 4: the merged child keeps flowing
      heads("rm").set(4)
      q2.processAllAvailable()
      q2.stop()
      assert(ids.size == 18 && ids.toArray.distinct.length == 18,
        s"post-merge growth lost/duplicated rows: ${ids.size} (want 18)")
    }
  }

  test("a blank advertised range id marks discovery MALFORMED — the un-ranged sentinel is never admitted") {
    withSplitFeed { (url, heads, advertised, polls) =>
      val ckptDir = Files.createTempDirectory("graft_blank_ckpt")
      val ids = new ConcurrentLinkedQueue[String]()
      // a head chain for the "" sentinel DOES answer (the global chain
      // of a range-keyed store): if the blank id were admitted, pages
      // would flow from it
      heads.put("", new AtomicLong(9))
      heads.put("rb", new AtomicLong(2))
      advertised.set(Seq("rb"))
      val q = spark.readStream.format("http-feed")
        .option("url", url).option("cursorMode", "token")
        .option("discoverRanges", "true")
        .option("maxPagesPerTrigger", "2")
        .option("retryBackoffMs", "20").load()
        .writeStream.option("checkpointLocation", ckptDir.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("id")).collect().map(_.getString(0)).foreach(ids.add)
        }.start()
      q.processAllAvailable()
      assert(ids.size == 4, s"rb backlog: expected 4 rows, got ${ids.size}")

      // the feed starts advertising a BLANK id next to rb: a malformed
      // response — the current range set must persist (rb keeps
      // flowing), and the "" sentinel must never be polled or consumed
      advertised.set(Seq("rb", ""))
      heads("rb").set(4)
      q.processAllAvailable()
      q.stop()
      assert(ids.size == 8, s"rb stalled under malformed discovery: ${ids.size}")
      assert(ids.toArray.distinct.length == 8, "duplicate ids")
      assert(!ids.toArray.map(_.toString).exists(_.startsWith("-p")),
        s"rows consumed from the un-ranged sentinel: ${ids.toArray.mkString(",")}")
      assert(!polls.toArray.map(_.toString).contains("head:"),
        "the blank id's head chain was polled — the sentinel was admitted")
    }
  }

  test("FULL PIPELINE: the transform leg rides the http-feed change feed") {
    // the reference's §3.2 leg with a store-native feed instead of the
    // landing-zone file stream: http-feed source -> TransformStream's
    // per-batch GUID + seq + idempotent per-epoch overwrite sink
    withFeed { (url, head, _, _) =>
      val base = Files.createTempDirectory("graft_feed_tx")
      head.set(3)
      val src = spark.readStream.format("http-feed")
        .schema(graft.model.Model.sampleItemSchema)
        .option("url", url).option("maxPagesPerTrigger", "1").load()
      val q = new graft.streaming.TransformStream(spark,
        landingDir = "unused", outDir = base.resolve("out").toString,
        checkpointDir = base.resolve("ckpt").toString,
        preferredLocations = "East US,West US",
        frozenNow = Some("2020-05-02 03:04:05"),
        sourceOverride = Some(src)).start()
      q.processAllAvailable()
      q.stop()
      val out = spark.read.parquet(base.resolve("out").toString)
      assert(out.count() == 6, "3 pages x 2 items must be transformed")
      // P4: ONE batch GUID per micro-batch; 1-page batches -> 3 GUIDs
      assert(out.select("TransformBatch").distinct().count() == 3)
      // the transform projection landed (UpdateLocation from preferred)
      assert(out.select("UpdateLocation").distinct().collect()
        .map(_.getString(0)).forall(_ == "East US"))
      // P5: the per-batch seq counter restarts at 1 in every micro-batch
      val seqs = out.groupBy(col("TransformBatch"))
        .agg(collect_set(col("AdditionalData")).as("ad")).collect()
      assert(seqs.forall(_.getSeq[String](1).toSet == Set(
        "Data added from transform function [1]",
        "Data added from transform function [2]")),
        s"per-batch seq broken: ${seqs.mkString(",")}")
    }
  }
}
