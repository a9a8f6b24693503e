package graft

import java.net.{HttpURLConnection, URI}

import graft.SparkSpec

/** Drives [[ServingHttp]] over REAL sockets: every route's body must be
  * byte-identical to the pure function it wraps, and the status-code /
  * error-envelope mapping must match the reference's `app.py`. */
class ServingHttpSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def withServer(f: Int => Unit): Unit = {
    val srv = ServingHttp.start(spark, d, 0) // ephemeral port
    try f(srv.getAddress.getPort)
    finally srv.stop(0)
  }

  private def req(port: Int, method: String, path: String,
      body: Option[Array[Byte]] = None): (Int, String) = {
    val c = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    body.foreach { b =>
      c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b) finally os.close()
    }
    val status = c.getResponseCode
    val in = if (status >= 400) c.getErrorStream else c.getInputStream
    val out = new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (status, out)
  }

  private def post(port: Int, path: String, json: String): (Int, String) =
    req(port, "POST", path,
      Some(json.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  test("GET /health answers Serving.health verbatim with 200") {
    withServer { port =>
      val (status, body) = req(port, "GET", "/health")
      assert(status === 200)
      assert(body === Serving.health(spark, d))
      assert(body.contains("\"status\":\"healthy\""))
    }
  }

  test("POST /api/search: body = Serving.handle for the same request") {
    withServer { port =>
      val json = """{"mode":"whole","top_k":3,"query_image_id":1}"""
      val (status, body) = post(port, "/api/search", json)
      assert(status === 200)
      assert(body === Serving.handle(spark, d, json))
      assert(body.contains("\"mode\":\"whole\"") && body.contains("\"results\":["))
    }
  }

  test("POST /search/<mode>: path mode overrides/injects into the body") {
    withServer { port =>
      val (status, body) =
        post(port, "/search/tags", """{"tags":"lbl_2,lbl_4","top_k":4}""")
      assert(status === 200)
      assert(body === Serving.handle(spark, d,
        """{"tags":"lbl_2,lbl_4","top_k":4,"mode":"tags"}"""))
      // empty body is a valid mode-only request on the path routes
      val (s2, b2) = post(port, "/search/whole", "")
      assert(s2 === 200 && b2.contains("\"mode\":\"whole\""))
      // unknown mode path → 404, not a 500
      val (s3, _) = post(port, "/search/nonsense", "{}")
      assert(s3 === 404)
    }
  }

  test("beyond-reference modes are routable over HTTP (r19): body = Serving.handle") {
    withServer { port =>
      // the serving-latency contract is measured per run() mode through
      // this envelope (ServingBench) — every mode must route
      val (s1, b1) = post(port, "/search/lexical",
        """{"terms":"hash,merge","top_k":3}""")
      assert(s1 === 200)
      assert(b1 === Serving.handle(spark, d,
        """{"terms":"hash,merge","top_k":3,"mode":"lexical"}"""))
      val (s2, b2) = post(port, "/api/search",
        """{"mode":"centrality","query_image_id":7}""")
      assert(s2 === 200)
      assert(b2 === Serving.handle(spark, d,
        """{"mode":"centrality","query_image_id":7}"""))
    }
  }

  test("invalid mode on /api/search → 400 with app.py's exact envelope") {
    withServer { port =>
      val (status, body) = post(port, "/api/search", """{"mode":"sideways"}""")
      assert(status === 400)
      assert(body ===
        """{"error":"Invalid mode. Use: whole, segment, hybrid, or tags"}""")
      val (s2, b2) = post(port, "/api/search", """{"top_k":3}""")
      assert(s2 === 400 && b2 === body, "missing mode takes the same envelope")
    }
  }

  test("engine-rejected request → 400 with handle's error JSON") {
    withServer { port =>
      val (status, body) =
        post(port, "/api/search", """{"mode":"tags","top_k":"three"}""")
      assert(status === 400)
      assert(body.startsWith("""{"error":"""))
    }
  }

  test("malformed body → 400, never 200 with silently-defaulted parameters") {
    withServer { port =>
      // truncated JSON on a path route: discarding it would answer 200
      // with default top_k and the client never learns
      val (s1, b1) = post(port, "/search/whole", """{"top_k": 3""")
      assert(s1 === 400 && b1.startsWith("""{"error":"""), b1)
      // a JSON array is not a request object — on either route
      val (s2, b2) = post(port, "/api/search", """[1,2,3]""")
      assert(s2 === 400 && b2.startsWith("""{"error":"""), b2)
      val (s3, b3) = post(port, "/search/tags", """"just a string"""")
      assert(s3 === 400 && b3.startsWith("""{"error":"""), b3)
    }
  }

  test("engine fault on a valid request → 500 internal-error envelope, not 400") {
    // a server whose data directory vanished after startup: the request
    // is well-formed, the engine faults — a monitor must never be told
    // the client was at fault (app.py:329-331's envelope)
    val gone = java.nio.file.Files.createTempDirectory("graft_gone").toString
    val srv = ServingHttp.start(spark, gone, 0)
    try {
      val (status, body) = post(srv.getAddress.getPort, "/api/search",
        """{"mode":"whole","top_k":3,"query_image_id":1}""")
      assert(status === 500, body)
      assert(body.startsWith("""{"error":"Internal server error","details":"""), body)
    } finally srv.stop(0)
  }

  test("body over 16MB → 413 with app.py's exact envelope") {
    withServer { port =>
      val big = new Array[Byte]((ServingHttp.MaxBody + 2).toInt)
      java.util.Arrays.fill(big, 'x'.toByte)
      val (status, body) = req(port, "POST", "/api/search", Some(big))
      assert(status === 413)
      assert(body === """{"error":"File too large. Max size: 16MB"}""")
    }
  }

  test("concurrent searches don't stall /health; parallel responses ≡ the pure function") {
    // Substantiates the cached-pool rationale at ServingHttp.start: with
    // a NULL executor every handler would run on the single dispatcher
    // thread, so a burst of slow collect()-backed searches would queue
    // /health behind them past any liveness probe. Shape: launch N
    // searches concurrently, then (while they are in flight) demand
    // /health — it must answer BEFORE the search burst drains, and
    // every search must still return the exact pure-function body.
    withServer { port =>
      // hybrid, and 12 of them: the r19 serving rewires made whole mode
      // fast enough (memoized imageVecs) that a 6-request burst drained
      // before /health could answer, flaking the overlap assertion — the
      // heavier mode keeps the burst reliably in flight while /health
      // runs, which is the very situation the test exists to pin
      val json = """{"mode":"hybrid","top_k":3,"query_image_id":1}"""
      val want = Serving.handle(spark, d, json)
      val n = 12
      val results = new java.util.concurrent.ConcurrentHashMap[Int, (Int, String)]()
      val done = new java.util.concurrent.CountDownLatch(n)
      val lastSearchDone = new java.util.concurrent.atomic.AtomicLong(0L)
      (0 until n).foreach { i =>
        new Thread(() => {
          try results.put(i, post(port, "/search/hybrid", json))
          finally {
            lastSearchDone.set(System.nanoTime()); done.countDown()
          }
        }, s"burst-$i").start()
      }
      Thread.sleep(50) // let the burst reach the server first
      val (hs, hb) = req(port, "GET", "/health")
      val healthDone = System.nanoTime()
      assert(hs === 200 && hb.contains("\"status\":\"healthy\""))
      val stillInFlight = done.getCount > 0
      assert(done.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "search burst must drain")
      // health either answered while searches were still in flight, or
      // (if the burst happened to drain first) strictly before the last
      // search finished — both prove it was not queued behind the burst
      assert(stillInFlight || healthDone < lastSearchDone.get,
        "/health must not be serialized behind the search burst")
      (0 until n).foreach { i =>
        val (st, body) = results.get(i)
        assert(st === 200, s"burst request $i: status $st")
        assert(body === want, s"burst request $i drifted from the pure function")
      }
    }
  }

  test("overload sheds immediately with 503 + Retry-After; admitted requests still succeed (r20)") {
    // the SRS availability face: past the admission ceiling a node must
    // fail FAST (503 the balancer can route around), never stretch the
    // queue — the r19 C=128 burst measured 28 s pure-queueing tails
    val srv = ServingHttp.start(spark, d, 0, maxConcurrent = 1)
    try {
      val port = srv.getAddress.getPort
      val n = 12
      case class R(status: Int, retryAfter: Option[String], sec: Double, body: String)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[R] {
          def call(): R = {
            gate.await()
            val t0 = System.nanoTime()
            val c = new URI(s"http://127.0.0.1:$port/api/search").toURL
              .openConnection().asInstanceOf[HttpURLConnection]
            c.setRequestMethod("POST"); c.setDoOutput(true)
            val os = c.getOutputStream
            try os.write(s"""{"mode":"whole","top_k":3,"query_image_id":$i}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally os.close()
            val status = c.getResponseCode
            val ra = Option(c.getHeaderField("Retry-After"))
            val in = if (status >= 400) c.getErrorStream else c.getInputStream
            val body = new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            in.close()
            R(status, ra, (System.nanoTime() - t0) / 1e9, body)
          }
        })
      }
      gate.countDown()
      val rs = futures.map(_.get())
      pool.shutdown()
      val (ok, shed) = rs.partition(_.status == 200)
      assert(shed.nonEmpty, "12 concurrent requests at capacity 1 must shed load")
      assert(ok.nonEmpty, "admitted requests must still succeed under shedding")
      shed.foreach { r =>
        assert(r.status === 503, s"shed status must be 503, got ${r.status}")
        assert(r.retryAfter.contains("1"), "503 must carry Retry-After: 1")
        assert(r.body.contains("overloaded"))
      }
      // the fail-fast contract: no success waited behind an unbounded queue
      ok.foreach(r => assert(r.sec < 5.0,
        f"a success took ${r.sec}%.1f s — shedding must prevent queue tails"))
      // a VALIDATION failure is a 400 even when the node is at capacity —
      // and /health (exempt by construction) keeps answering
      val (bs, _) = post(port, "/api/search", """{"mode":"nonsense"}""")
      assert(bs === 400)
      val (hs, _) = req(port, "GET", "/health")
      assert(hs === 200)
    } finally srv.stop(0)
  }
}
