package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.sources.JsonSource
import graft.sources.v2.HttpJsonSource

/** Live-socket coverage for the `http-json` DSv2 source: an in-process
  * loopback HTTP server (JDK built-in, zero egress) plays the
  * reference's ExternalEndpoint, and the assertions pin the reference's
  * observable contract (EtlProcess.cs:139-160): 2xx JSON array → rows
  * in the SampleItem schema, non-2xx / dead socket → the error-as-null
  * branch, 200 `[]` → the distinct saved-0-documents branch. */
class HttpJsonSourceSpec extends SparkSpec {

  /** Serve `body` (or `status` with empty body) at every path; records
    * each request's path?query for fan-out assertions. */
  private def withServer(status: Int, body: String)(
      f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new ConcurrentLinkedQueue[String]()
    server.createContext("/", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      seen.add(ex.getRequestURI.getPath + q)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      // assert the reference's Accept header reaches the wire
      val accept = ex.getRequestHeaders.getFirst("Accept")
      val out = if (accept == "application/json") bytes
        else "[]".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, if (out.isEmpty) -1 else out.length)
      if (out.nonEmpty) { ex.getResponseBody.write(out); ex.getResponseBody.close() }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/items", seen)
    finally server.stop(0)
  }

  private val payload =
    """[
      |  {"id":"a1","Date":"2020-05-01 10:00:00","Desc":"Sample item #1",
      |   "Done":"true","Name":"Item_1","Pr":"Additional field info",
      |   "LogicalPartition":"Partition_B","unknownField":"dropped"},
      |  {"id":"a2","Date":"2020-05-01 10:00:00",
      |   "Name":"Item_2","LogicalPartition":"Partition_C"},
      |  42
      |]""".stripMargin

  test("GET lands the reference schema: tolerant fields, permissive rows") {
    withServer(200, payload) { (url, _) =>
      val df = spark.read.format("http-json").option("url", url).load()
      assert(df.schema == HttpJsonSource.defaultSchema)
      val rows = df.orderBy(col("id").asc_nulls_last).collect()
      assert(rows.length == 3)
      // full row: unknown JSON field silently dropped
      assert(rows(0).getString(0) == "a1" &&
        rows(0).getString(6) == "Partition_B")
      // missing fields -> null (writer-fixed, reader-tolerant)
      assert(rows(1).getString(0) == "a2" && rows(1).isNullAt(3) &&
        rows(1).getString(4) == "Item_2")
      // non-object array element -> all-null row (POCO-default analogue)
      assert((0 until 7).forall(rows(2).isNullAt))
    }
  }

  test("column pruning reaches the HTTP reader") {
    withServer(200, payload) { (url, _) =>
      val df = spark.read.format("http-json").option("url", url).load()
        .select(col("id"), col("Name"))
      val scan = df.queryExecution.executedPlan.toString()
      assert(scan.contains("columns=[id,Name]"),
        s"pruned columns not in scan description:\n$scan")
      assert(df.count() == 3)
    }
  }

  test("non-2xx follows the reference error contract: strict raise, tryReadUrl None") {
    withServer(503, "oops") { (url, _) =>
      val df = spark.read.format("http-json").option("url", url).load()
      val e = intercept[Exception](df.count())
      assert(e.getMessage != null)
      // EtlProcess.cs:61-69 — the empty-successful-run branch
      assert(JsonSource.tryReadUrl(spark, HttpJsonSource.defaultSchema, url).isEmpty)
    }
  }

  test("null-vs-empty distinction: 200 [] is a successful run with 0 items") {
    withServer(200, "[]") { (url, _) =>
      val got = JsonSource.tryReadUrl(spark, HttpJsonSource.defaultSchema, url)
      assert(got.isDefined, "an empty feed is NOT a failed fetch")
      assert(got.get.count() == 0)
    }
  }

  test("errorAsEmpty: a dead page yields zero rows instead of failing the scan") {
    withServer(500, "") { (url, _) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").load()
      assert(df.count() == 0)
    }
    // dead SOCKET (connection refused), not just a status code
    val df = spark.read.format("http-json")
      .option("url", "http://127.0.0.1:1/never")
      .option("errorAsEmpty", "true")
      .option("connectTimeoutMs", "500").load()
    assert(df.count() == 0)
  }

  test("pages>1 fans out one partition per page URL") {
    withServer(200, "[]") { (url, seen) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("pages", "3").load()
      assert(df.rdd.getNumPartitions == 3)
      df.count()
      val got = seen.toArray.map(_.toString).sorted.toSeq
      assert(got == Seq("/items?page=0", "/items?page=1", "/items?page=2"),
        s"pages did not fan out: $got")
    }
  }

  test("tryReadUrl None on unreachable endpoint (exception branch)") {
    assert(JsonSource.tryReadUrl(spark, HttpJsonSource.defaultSchema,
      "http://127.0.0.1:1/nope").isEmpty)
  }

  test("gzip-encoded responses decompress transparently") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gz", (ex: HttpExchange) => {
      // honor the advertised Accept-Encoding with an actual gzip body
      assert(ex.getRequestHeaders.getFirst("Accept-Encoding") == "gzip")
      val raw = """[{"id":"z1","Name":"Zip_1"},{"id":"z2","Name":"Zip_2"}]"""
        .getBytes(StandardCharsets.UTF_8)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      val body = bos.toByteArray
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/gz"
      val rows = spark.read.format("http-json").option("url", url).load()
        .orderBy(col("id")).collect()
      assert(rows.length == 2 && rows(0).getString(0) == "z1" &&
        rows(1).getString(4) == "Zip_2")
    } finally server.stop(0)
  }

  test("user schema with typed columns: long/double/boolean coercion, bad types null") {
    val typed =
      """[
        |  {"id":"a","n":42,"score":1.5,"ok":true},
        |  {"id":"b","n":"not-a-number","score":"nope","ok":"yes"},
        |  {"id":"c"}
        |]""".stripMargin
    withServer(200, typed) { (url, _) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ok",
          org.apache.spark.sql.types.BooleanType)))
      val rows = spark.read.format("http-json").schema(schema)
        .option("url", url).load().orderBy(col("id")).collect()
      assert(rows.length == 3)
      assert(rows(0).getLong(1) == 42L && rows(0).getDouble(2) == 1.5 &&
        rows(0).getBoolean(3))
      // wrong-typed JSON values -> null, not a crash (PERMISSIVE)
      assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
      assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
    }
  }

  test("header.* options become request headers (bearer auth on the wire)") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seenAuth = new ConcurrentLinkedQueue[String]()
    server.createContext("/auth", (ex: HttpExchange) => {
      seenAuth.add(ex.getRequestHeaders.getFirst("Authorization") + "|" +
        ex.getRequestHeaders.getFirst("X-Api-Key"))
      val ok = ex.getRequestHeaders.getFirst("Authorization") == "Bearer sekrit"
      val body = (if (ok) """[{"id":"ok"}]""" else "[]")
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(if (ok) 200 else 401, body.length)
      ex.getResponseBody.write(body); ex.getResponseBody.close(); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/auth"
      val rows = spark.read.format("http-json").option("url", url)
        .option("header.Authorization", "Bearer sekrit")
        .option("header.X-Api-Key", "key-123")
        .load().collect()
      assert(rows.length == 1 && rows(0).getString(0) == "ok")
      assert(seenAuth.peek() == "Bearer sekrit|key-123",
        s"auth headers did not reach the wire: ${seenAuth.peek()}")
    } finally server.stop(0)
  }

  test("429/5xx retry with backoff until success; Retry-After honored") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/flaky", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      if (n <= 2) { // two rate-limit blips, then healthy
        ex.getResponseHeaders.set("Retry-After", "0")
        ex.sendResponseHeaders(429, -1); ex.close()
      } else {
        val body = """[{"id":"r1"},{"id":"r2"}]""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body); ex.getResponseBody.close(); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/flaky"
      // default maxRetries=3 covers the two blips; STRICT mode — the
      // retry, not errorAsEmpty, is what saves the scan
      val rows = spark.read.format("http-json").option("url", url)
        .option("retryBackoffMs", "10").load().collect()
      assert(rows.length == 2, "retried fetch must deliver the page")
      assert(hits.get() == 3, s"expected 2 retries then success, got ${hits.get()} hits")
    } finally server.stop(0)
  }

  test("non-retryable 4xx fails fast: a 404 never retries") {
    withServer(404, "") { (url, seen) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("retryBackoffMs", "10").load()
      intercept[Exception](df.count())
      assert(seen.size == 1, s"404 must not retry; saw ${seen.size} requests")
    }
  }

  test("retry budget exhausts: persistent 503 still fails strict mode") {
    withServer(503, "") { (url, seen) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("maxRetries", "2").option("retryBackoffMs", "5").load()
      intercept[Exception](df.count())
      // initial attempt + 2 retries; Spark task retries in local mode = 1
      assert(seen.size >= 3, s"expected >= 3 attempts (1 + 2 retries), got ${seen.size}")
    }
  }

  test("payload corruption is never errorAsEmpty: non-array and parse failures throw") {
    // a live 200 returning a JSON object, not an array
    withServer(200, """{"not":"an array"}""") { (url, _) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").load()
      val e = intercept[Exception](df.count())
      assert(e.getMessage.contains("array") ||
        Option(e.getCause).exists(_.getMessage.contains("array")),
        s"non-array 200 must throw the corruption error, got: ${e.getMessage}")
    }
    // a live 200 returning malformed JSON
    withServer(200, """[{"id": "broken"""") { (url, _) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").option("maxRetries", "0").load()
      intercept[Exception](df.count())
    }
    // sanity: the SAME option still forgives a transport-dead page
    withServer(502, "") { (url, _) =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").option("maxRetries", "0").load()
      assert(df.count() == 0)
    }
  }

  test("mid-body connection kill: the documented transport-vs-corruption boundary") {
    // the reader parses the FULL body before emitting any row, so a
    // mid-body death can never drop a page's tail after rows flowed —
    // it surfaces at fetch time as one of exactly two cases:
    //  (a) plain JSON truncated -> a Jackson parse failure ->
    //      CORRUPTION (throws even in errorAsEmpty: truncated-vs-
    //      malformed is indistinguishable once the bytes stop);
    //  (b) gzip frame truncated -> EOFException (transport IO) ->
    //      forgiven by errorAsEmpty like any dead socket.
    def killerServer(gzip: Boolean)(f: String => Unit): Unit = {
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/kill", (ex: HttpExchange) => {
        val full = ("[" + (0 until 200).map(i => s"""{"id":"k$i"}""")
          .mkString(",") + "]").getBytes(StandardCharsets.UTF_8)
        val body = if (gzip) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(full); gz.close(); bos.toByteArray
        } else full
        if (gzip) ex.getResponseHeaders.set("Content-Encoding", "gzip")
        // advertise the full length, deliver half, die
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body, 0, body.length / 2)
        ex.close()
      })
      server.start()
      try f(s"http://127.0.0.1:${server.getAddress.getPort}/kill")
      finally server.stop(0)
    }
    killerServer(gzip = false) { url =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").option("maxRetries", "0").load()
      val e = intercept[Exception](df.count())
      assert(e.getMessage.contains("unparseable") ||
        Option(e.getCause).exists(_.getMessage.contains("unparseable")),
        s"truncated plain JSON must surface as corruption, got: ${e.getMessage}")
    }
    killerServer(gzip = true) { url =>
      val df = spark.read.format("http-json").option("url", url)
        .option("errorAsEmpty", "true").option("maxRetries", "0").load()
      assert(df.count() == 0,
        "a truncated gzip frame is a transport death — errorAsEmpty forgives it")
    }
  }

  test("END-TO-END: the batch saga runs against a LIVE endpoint") {
    import graft.pipeline.{ExtractLoadJob, RunAudit, RunLock}
    // the real user wiring: extract = tryReadUrl over the live socket,
    // then the reference saga (lease -> extract -> land -> release+audit)
    def mkJob(url: String) = {
      val base = java.nio.file.Files.createTempDirectory("etl_http")
      val job = new ExtractLoadJob(spark,
        () => JsonSource.tryReadUrl(spark, HttpJsonSource.defaultSchema, url),
        base.resolve("landing").toString,
        new RunLock(base.resolve("lock")),
        new RunAudit(base.resolve("audit").toString), "http-worker")
      (job, new RunAudit(base.resolve("audit").toString), base)
    }
    // 200 + data -> landed, partitioned, success audit with the count
    val body = (0 until 12).map(i =>
      s"""{"id":"x$i","Name":"Item_$i","LogicalPartition":"Partition_${"ABC"(i % 3)}"}""")
      .mkString("[", ",", "]")
    withServer(200, body) { (url, _) =>
      val (job, audit, base) = mkJob(url)
      job.runOnce()
      val landed = spark.read.parquet(base.resolve("landing").toString)
      assert(landed.count() == 12)
      assert(landed.select("LogicalPartition").distinct().count() == 3)
      val runs = audit.read(spark).collect()
      assert(runs.length == 1 && runs.head.Succeeded)
      assert(runs.head.AdditionlInfo.startsWith(
        "Successful extracted and saved 12 documents"))
    }
    // 503 -> the reference's EMPTY SUCCESSFUL run, nothing landed
    withServer(503, "down") { (url, _) =>
      val (job, audit, base) = mkJob(url)
      job.runOnce()
      val runs = audit.read(spark).collect()
      assert(runs.length == 1 && runs.head.Succeeded)
      assert(runs.head.AdditionlInfo ==
        "Successful executed the orchestration. No documents retrieved " +
          "from the Extract endpoint.")
      assert(!java.nio.file.Files.exists(base.resolve("landing")),
        "a failed fetch must land nothing")
    }
  }
}
