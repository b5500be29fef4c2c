package graft.server

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Query governance — the reference's request-context semantics on Spark's
  * job-group mechanism: deadline → `ErrQueryTimeout`, explicit cancellation
  * → `ErrQueryCancelled` (`reference/pilosa.go:55-56`, enforced by
  * `validateQueryContext`, `reference/executor.go:8165-8180`), and the
  * long-query log + counter (`reference/http_handler.go:397-406`,
  * `server.go:199-204` LongQueryTime). */
class QueryGovernanceSpec extends SparkSpec {

  private lazy val facade = new HttpFacade(spark, sfDir, 0)
  private lazy val port = facade.start()
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def get(path: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  override def afterAll(): Unit = { facade.stop(); super.afterAll() }

  test("query timeout: deadline kills the request with the reference's " +
    "ErrQueryTimeout wording (pilosa.go:56, executor.go:8165-8180)") {
    spark.conf.set("spark.graft.queryTimeout", "1ms")
    try {
      // heavy enough that 1ms always expires before the answer exists
      val (c, b) = post("/sql",
        "select count(*) from lineitem a, lineitem b")
      assert(c == 400, s"$c $b")
      assert(b == """{"error":"query timeout"}""", b)

      // the PQL path hits the same deadline (per-call QueryContext check +
      // job-group cancel)
      val (c2, b2) = post("/index/lineitem/query", "Count(All())")
      assert(c2 == 400, s"$c2 $b2")
      assert(b2 == """{"error":"query timeout"}""", b2)
    } finally spark.conf.unset("spark.graft.queryTimeout")

    // governance is per-request: with the deadline gone the engine answers
    // normally (the timeout's reaper must not leak into new job groups)
    val (c3, b3) = post("/index/region/query", "Count(All())")
    assert(c3 == 200, s"$c3 $b3")
    assert(b3.contains("5"), b3)
  }

  test("explicit cancellation: /queries reports ids, POST /queries/cancel " +
    "aborts the named query with ErrQueryCancelled (pilosa.go:55)") {
    // a long multi-call program: cancellation bites at the next call
    // boundary (QueryContext.validate) — the driver-side mirror of the
    // reference's per-call ctx poll (executor.go:193) — so the request
    // aborts promptly and leaves no long-running tasks behind
    val heavy = Seq.fill(300)("Count(All())").mkString(" ")
    @volatile var result: (Int, String) = null
    val t = new Thread(() => result = post("/index/lineitem/query", heavy),
      "gov-heavy-query")
    t.start()

    // poll the reference's /queries shape until the request is visible;
    // "id" is our additive field naming the query for the cancel route
    val deadline = System.nanoTime() + 30L * 1000000000L
    var id = -1L
    while (id < 0 && System.nanoTime() < deadline) {
      val (qc, qb) = get("/queries")
      assert(qc == 200, s"$qc $qb")
      if (qb.contains("Count(All()) Count(All())")) {
        val m = """"id":(\d+)""".r.findFirstMatchIn(qb)
        m.foreach(g => id = g.group(1).toLong)
      }
      if (id < 0) Thread.sleep(50)
    }
    assert(id >= 0, "heavy query never appeared in /queries")

    val (cc, cb) = post(s"/queries/cancel?id=$id", "")
    assert(cc == 200, s"$cc $cb")
    assert(cb == s"""{"cancelled":$id}""", cb)

    t.join(60000)
    assert(!t.isAlive, "cancelled request did not return")
    assert(result._1 == 400, s"${result._1} ${result._2}")
    assert(result._2 == """{"error":"query cancelled"}""", result._2)

    // cancelling a query that no longer exists → 404 (plain-text error)
    val (c404, b404) = post(s"/queries/cancel?id=$id", "")
    assert(c404 == 404, s"$c404 $b404")
    assert(b404.startsWith(s"no active query $id"), b404)
  }

  test("cancellation storm: concurrent multi-call programs cancelled " +
    "mid-flight answer cleanly and leave the facade fully serviceable") {
    val n = 10
    val results = new Array[(Int, String)](n)
    val threads = (0 until n).map { i =>
      val t = new Thread(() => results(i) =
        post("/index/lineitem/query", Seq.fill(40)("Count(All())").mkString(" ")),
        s"gov-storm-$i")
      t.start(); t
    }
    // fire cancels at every id that shows up while the storm runs; a 404
    // (already finished) is fine — the race is the point
    val until = System.nanoTime() + 8L * 1000000000L
    var cancelsSent = 0
    while (System.nanoTime() < until && threads.exists(_.isAlive)) {
      val (_, qb) = get("/queries")
      """"id":(\d+)""".r.findAllMatchIn(qb).foreach { m =>
        post(s"/queries/cancel?id=${m.group(1)}", ""); cancelsSent += 1
      }
      Thread.sleep(30)
    }
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive), "storm requests did not all return")
    assert(cancelsSent > 0, "storm never observed an in-flight query")
    // every response is a clean outcome: full results or the exact
    // reference cancellation error — nothing garbled, nothing hung
    val cancelled = results.count(_ == ((400, """{"error":"query cancelled"}""")))
    results.foreach { r =>
      assert(r._1 == 200 || r == ((400, """{"error":"query cancelled"}""")),
        s"${r._1} ${r._2.take(120)}")
    }
    assert(cancelled > 0, "no request was actually cancelled mid-flight")
    // registry drained, engine healthy
    assert(get("/queries")._2 == """{"queries":[]}""")
    val (c, b) = post("/index/region/query", "Count(All())")
    assert(c == 200, s"$c $b")
  }

  test("long-query accounting: LongQueryTime overrun increments the slow " +
    "counter surfaced at /metrics (http_handler.go:397-406)") {
    val before = graft.core.Metrics.get(graft.core.Metrics.SlowQuery)
    spark.conf.set("spark.graft.longQueryTime", "1ms")
    try {
      val (c, _) = post("/index/region/query", "Count(All())")
      assert(c == 200)
    } finally spark.conf.unset("spark.graft.longQueryTime")
    assert(graft.core.Metrics.get(graft.core.Metrics.SlowQuery) > before)
    val (mc, mb) = get("/metrics")
    assert(mc == 200)
    assert(mb.contains("pilosa_http_request_slow_total"), mb.take(500))
  }
}
