package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.Http

/** The network edge, executed end-to-end: [[Http.s3LiveScan]] drives real
  * HTTP requests from Spark tasks against an in-process JDK HttpServer
  * that emulates the reference's paginated listing API — including fault
  * injection (first hit on selected pages returns 429/503) so the
  * retry + pool-rotation path runs inside the distributed plan, not just
  * in unit specs. No sockets leave the machine.
  */
class HttpSourceSpec extends SparkSpecBase {

  private val N_ITEMS = 230 // 5 pages of 48: last page ragged (230 - 4*48 = 38)
  private val PAGE = 48

  // per-offset request counters + the set of User-Agents seen, both
  // concurrent: Spark tasks hit the server from many threads
  private val hits = new ConcurrentHashMap[Long, AtomicInteger]()
  private val userAgents = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // the config-driven static header, recorded per request ("<null>" when
  // absent) — the Settings.apiHeaders wire check
  private val clientIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def startServer(): (HttpServer, String) = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/listing", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        val offset = params("offset").toLong
        val limit = params("limit").toInt
        userAgents.add(ex.getRequestHeaders.getFirst("User-Agent"))
        clientIds.add(Option(ex.getRequestHeaders.getFirst("x-client-id")).getOrElse("<null>"))
        val n = hits.computeIfAbsent(offset, _ => new AtomicInteger(0)).incrementAndGet()
        // fault injection: pages 1 and 3 fail their FIRST attempt (429 on
        // one, 503 on the other) — both must succeed via retry
        val status =
          if (offset == PAGE.toLong * 1 && n == 1) 429
          else if (offset == PAGE.toLong * 3 && n == 1) 503
          else 200
        if (status != 200) {
          ex.sendResponseHeaders(status, -1); ex.close(); return
        }
        val items = (offset until math.min(offset + limit, N_ITEMS.toLong)).map { i =>
          s"""{"code":"v$i","name":"vendor $i"}"""
        }
        val body =
          s"""{"available_count":$N_ITEMS,"returned_count":${items.size},
             |"items":[${items.mkString(",")}]}""".stripMargin
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/listing")
  }

  test("live paginated scan: full coverage, retries inside the plan, pool rotation") {
    hits.clear(); userAgents.clear()
    val (server, base) = startServer()
    try {
      val df = Http.s3LiveScan(spark, base, pageSize = PAGE,
        maxAttempts = 3, baseDelayMs = 1L, timeoutMs = 5000L)
      val rows = df.collect()
      // every item exactly once, page provenance correct
      assert(rows.length === N_ITEMS)
      assert(rows.map(_.getString(0)).toSet === (0 until N_ITEMS).map(i => s"v$i").toSet)
      val byPage = rows.groupBy(_.getInt(2))
      assert(byPage.keySet === (0 until 5).toSet)
      assert(byPage(4).length === N_ITEMS - 4 * PAGE) // ragged last page
      assert(rows.forall(r => r.getInt(3) === r.getInt(2) + 1)) // batch_number
      assert(rows.forall(_.getLong(4) === N_ITEMS.toLong))
      // the injected faults really exercised the retry path: the faulted
      // pages were requested at least twice, everything else at most... the
      // probe page (offset 0) is hit once by the driver and once by its task
      assert(hits.get(PAGE.toLong * 1).get() >= 2, "429 page was not retried")
      assert(hits.get(PAGE.toLong * 3).get() >= 2, "503 page was not retried")
      // rotation: distinct identities reached the server (clientSeed varies
      // per page and the retry attempt advances the pool index)
      assert(userAgents.size() >= 2, s"expected rotated identities, saw $userAgents")
    } finally server.stop(0)
  }

  test("politeness parity: the reference's delay budgets, as schedules and live") {
    import graft.sources.Throttle
    // schedule parity under a fake clock: the reference sleeps
    // base + U[0, w] between requests; paced(rate, jit) spaces by
    // mean*(1 ± jit) — Http's REF_* constants are exactly the pairs with
    // the same support and the same mean, asserted here against the
    // BASELINE.md budgets (both distributions uniform)
    class FakeClock { var now = 0L; def sleep(n: Long): Unit = { assert(n > 0); now += n } }
    def gaps(rate: Double, jit: Double): Vector[Long] = {
      val c = new FakeClock; var rel = Vector.empty[Long]
      Throttle.paced((1 to 400).iterator, rate, jit, seed = 11L,
        nanoTime = () => c.now, sleep = c.sleep _).foreach(_ => rel :+= c.now)
      rel.sliding(2).map(p => p(1) - p(0)).toVector
    }
    val ms = 1000000L
    val pg = gaps(Http.REF_PAGE_RATE, Http.REF_PAGE_JITTER)
    assert(pg.forall(g => g >= 2000 * ms && g <= 3000 * ms), // main.rs:139-141
      s"page gap outside the 2000+U[0,1000]ms budget: ${pg.min}..${pg.max}")
    assert(math.abs(pg.sum.toDouble / pg.length - 2500.0 * ms) < 0.02 * 2500 * ms)
    val vd = gaps(Http.REF_VENDOR_RATE, Http.REF_VENDOR_JITTER)
    assert(vd.forall(g => g >= 1500 * ms && g <= 2500 * ms), // vendor.rs:33,44
      s"vendor gap outside the 1500+U[0,1000]ms budget: ${vd.min}..${vd.max}")
    assert(math.abs(vd.sum.toDouble / vd.length - 2000.0 * ms) < 0.02 * 2000 * ms)
    // live: the page budget wired through the conf seam must space
    // consecutive same-partition page requests by the reference's 2s
    // floor, measured at the server (one real paced gap per partition)
    val arrivals = new ConcurrentHashMap[Long, java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]]()
    val par = spark.sparkContext.defaultParallelism
    val pageSz = 5
    val nPages = 2 * par // two pages per partition -> one paced gap each
    val nItems = nPages * pageSz
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/listing", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val t = System.nanoTime()
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val offset = params("offset").toLong
        arrivals.computeIfAbsent(offset,
          _ => new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()).add(t)
        val items = (offset until math.min(offset + params("limit").toInt, nItems.toLong))
          .map(i => s"""{"code":"v$i","name":"vendor $i"}""")
        val body =
          s"""{"available_count":$nItems,"returned_count":${items.size},
             |"items":[${items.mkString(",")}]}""".stripMargin
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/listing"
    spark.conf.set("spark.graft.source.maxRowsPerSecond", Http.REF_PAGE_RATE.toString)
    spark.conf.set("spark.graft.source.rateJitter", Http.REF_PAGE_JITTER.toString)
    try {
      val rows = Http.s3LiveScan(spark, base, pageSize = pageSz,
        maxAttempts = 2, baseDelayMs = 1L, timeoutMs = 5000L).collect()
      assert(rows.length === nItems)
      for (p <- 0 until par) {
        val first = arrivals.get(pageSz.toLong * (2 * p))
        val second = arrivals.get(pageSz.toLong * (2 * p + 1))
        assert(first != null && second != null, s"partition $p pages not fetched")
        // last arrival of the first page (page 0 is also probed by the
        // driver before the job) to the first arrival of the second
        val gap = second.get(0) - first.get(first.size - 1)
        assert(gap >= 1900 * ms, s"partition $p paced gap only ${gap / ms}ms")
        assert(gap <= 15000 * ms, s"partition $p implausible gap ${gap / ms}ms")
      }
    } finally {
      server.stop(0)
      spark.conf.set("spark.graft.source.maxRowsPerSecond", "0")
      spark.conf.set("spark.graft.source.rateJitter", "0.2")
    }
  }

  test("live point lookup: misses kept as NULL rows, transients retried in-plan") {
    val detailHits = new ConcurrentHashMap[String, AtomicInteger]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/detail", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val code = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst { case kv if kv.startsWith("code=") => kv.drop(5) }
          .getOrElse("")
        val id = code.drop(1).toLong
        val n = detailHits.computeIfAbsent(code, _ => new AtomicInteger(0)).incrementAndGet()
        if (id % 7 == 0) { ex.sendResponseHeaders(400, -1); ex.close() } // miss = data
        else if (id % 5 == 0 && n == 1) { ex.sendResponseHeaders(429, -1); ex.close() }
        else {
          val bytes = s"""{"name":"vendor $id"}""".getBytes("UTF-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes); ex.close()
        }
      }
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/detail"
    try {
      val sparkS = spark
      import sparkS.implicits._
      val codes = (0L until 70L).map(i => s"v$i").toDF("code")
      val out = Http.s4LiveLookup(spark, codes, base,
        maxAttempts = 3, baseDelayMs = 1L, timeoutMs = 5000L).collect()
      assert(out.length === 70) // every key survives, miss or not
      val misses = out.filter(_.getBoolean(2)).map(_.getString(0)).toSet
      assert(misses === (0L until 70L).filter(_ % 7 == 0).map(i => s"v$i").toSet)
      assert(out.filter(_.getBoolean(2)).forall(_.getString(3) === "Unknown"))
      assert(out.filterNot(_.getBoolean(2)).forall(r =>
        r.getString(1).contains("vendor " + r.getString(0).drop(1))))
      // a 429 key (id%5==0, not a miss) must have been requested twice
      val retried = (0L until 70L).filter(i => i % 5 == 0 && i % 7 != 0)
      assert(retried.forall(i => detailHits.get(s"v$i").get() === 2),
        "429 keys were not retried exactly once")
    } finally server.stop(0)
  }

  test("live ETL end-to-end: listing -> detail enrich -> partitioned parquet sink") {
    // the reference's whole main() flow (main.rs:107-273) over real HTTP:
    // paginated listing scan, per-code detail enrichment with 400-misses
    // kept as 'Unknown', the typed projection, and a page-partitioned
    // parquet write with read-back — every stage a distributed plan
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/listing", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val offset = params("offset").toLong
        val limit = params("limit").toInt
        val items = (offset until math.min(offset + limit, N_ITEMS.toLong)).map { i =>
          s"""{"code":"v$i","name":"vendor $i"}"""
        }
        val body = s"""{"available_count":$N_ITEMS,"returned_count":${items.size},"items":[${items.mkString(",")}]}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.createContext("/detail", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val code = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst { case kv if kv.startsWith("code=") => kv.drop(5) }
          .getOrElse("")
        val id = code.drop(1).toLong
        if (id % 7 == 0) { ex.sendResponseHeaders(400, -1); ex.close() }
        else {
          val bytes = s"""{"segment":"seg${id % 3}"}""".getBytes("UTF-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes); ex.close()
        }
      }
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val sparkS = spark
      import sparkS.implicits._
      import org.apache.spark.sql.functions._
      val listing = Http.s3LiveScan(spark, s"http://127.0.0.1:$port/listing",
        pageSize = PAGE, maxAttempts = 3, baseDelayMs = 1L, timeoutMs = 5000L)
      val details = Http.s4LiveLookup(spark, listing.select($"code"),
        s"http://127.0.0.1:$port/detail",
        maxAttempts = 3, baseDelayMs = 1L, timeoutMs = 5000L)
      val vendors = listing.join(details, Seq("code"))
        .select($"code", $"name",
          $"detail_or_default".as("details"), $"is_miss",
          $"batch_number")
      val out = java.nio.file.Files.createTempDirectory("live_etl").toString
      vendors.write.mode("overwrite").partitionBy("batch_number").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() === N_ITEMS)
      // partition dirs follow page provenance
      val parts = back.groupBy($"batch_number").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(parts === Map(1 -> 48L, 2 -> 48L, 3 -> 48L, 4 -> 48L, 5 -> 38L))
      // the 400-miss rows survived with the default payload
      val misses = back.filter($"is_miss").select($"code").collect().map(_.getString(0)).toSet
      assert(misses === (0 until N_ITEMS).filter(_ % 7 == 0).map(i => s"v$i").toSet)
      assert(back.filter($"is_miss").select($"details").collect().forall(_.getString(0) == "Unknown"))
    } finally server.stop(0)
  }

  test("fatal status is not retried; transient exhaustion propagates") {
    val fatalHits = new AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/bad", (ex: HttpExchange) => {
      fatalHits.incrementAndGet()
      ex.sendResponseHeaders(403, -1); ex.close()
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      ex.sendResponseHeaders(503, -1); ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val pool = new Http.Pool(timeoutMs = 5000L)
      // 403 is data/routing, never retried: exactly one request
      val fatal = intercept[IllegalArgumentException] {
        Http.fetchListingPage(pool, s"http://127.0.0.1:$port/bad", 0, PAGE,
          maxAttempts = 3, baseDelayMs = 1L, sleep = _ => ())
      }
      assert(fatal.getMessage.contains("403") && fatalHits.get() === 1)
      // persistent 503 exhausts the budget and surfaces as Transient
      intercept[graft.sources.Retry.Transient] {
        Http.fetchListingPage(pool, s"http://127.0.0.1:$port/flaky", 0, PAGE,
          maxAttempts = 3, baseDelayMs = 1L, sleep = _ => ())
      }
    } finally server.stop(0)
  }

  test("Settings-loaded api headers ride every live request (config.rs layered-config parity)") {
    // the reference attaches Settings.api.headers to each request; the
    // engine counterpart: graft.Settings loads file + GRAFT_ overlay and
    // s3LiveScan's pools attach the map on top of the rotating identity.
    // Every request to the in-process server — driver probe AND executor
    // page fetches — must carry the configured header.
    hits.clear(); userAgents.clear(); clientIds.clear()
    val conf = java.nio.file.Files.createTempFile("graft_live", ".yaml")
    java.nio.file.Files.write(conf,
      ("cities:\n  - \"1\"\nminio:\n  endpoint: e\n  access_key: a\n" +
        "  secret_key: s\n  bucket: b\n  region: r\napi:\n  headers:\n" +
        "    x-client-id: \"file-id\"\n").getBytes("UTF-8"))
    val settings = Settings.load(conf.toString,
      env = Map("GRAFT_API_HEADERS_X-CLIENT-ID" -> "ignored-unaddressable"))
    assert(settings.apiHeaders === Map("x-client-id" -> "file-id"))
    val (server, base) = startServer()
    try {
      val rows = Http.s3LiveScan(spark, base, pageSize = PAGE,
        maxAttempts = 3, baseDelayMs = 1L, timeoutMs = 5000L,
        headers = settings.apiHeaders).collect()
      assert(rows.length === N_ITEMS)
      import scala.jdk.CollectionConverters._
      assert(clientIds.asScala.toSet === Set("file-id"),
        s"requests missing the configured header: ${clientIds.asScala}")
    } finally server.stop(0)
  }
}
