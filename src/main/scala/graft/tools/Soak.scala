package graft.tools

import org.apache.spark.sql.SparkSession
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Randomized multi-minute soak of the durable serving path: concurrent
  * HTTP + gRPC writes, reads, CSV imports, backups, and facade RESTARTS
  * against one warehouse, with an invariant checker.
  *
  * The GC-grace race of round 5 (a superseded TableLog piece deleted under a
  * lock-free reader) was found by a 2-thread spec; this drives the same
  * surface for minutes at a time with restarts in the loop — the way a
  * serving fleet actually exercises it.
  *
  * Invariants checked continuously and at the end:
  *  1. no request ever fails (5xx / transport error / Spark exception);
  *  2. every read of a writer's own key returns the LAST value that writer
  *     committed (writers own disjoint key ranges, so no write-write races
  *     can excuse a stale read);
  *  3. after every restart, the restored count equals the number of
  *     distinct keys committed so far (durability, O(delta) restore).
  *
  * Run: `sbt "runMain graft.tools.Soak [seconds]"` (default 60; the SURVEY
  * records a 600 s run).
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(60)
    val spark0 = graft.core.EngineConf(SparkSession.builder()
      .master("local[8]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // aggressive GC grace to hunt reader-vs-GC races hard
      .config("spark.graft.gc.graceMs", "2000"))
      .getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-soak-wh").toString
    // the RELIABLE checkpoint tier stays ON for the whole soak: every
    // durable write routes through Materialize.stable → Dataset.checkpoint,
    // so this drives the cleanCheckpoints reclamation path (round-9 ADVICE
    // #1) under sustained serving and PROVES the tree is bounded — a
    // leak here is one checkpoint tree per write on a long-lived server
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-soak-ckpt")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val client = HttpClient.newHttpClient()

    def dirBytes(p: java.nio.file.Path): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length() // vanished-mid-walk files read 0 — fine for a gauge
      walk(p.toFile)
    }
    val ckptMax = new AtomicLong()

    val stop = new AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val requests = new AtomicLong()
    val restarts = new AtomicLong()

    // facade handle, swapped on restart under a read-write lock so requests
    // in flight finish against the old facade before it stops
    final case class Node(session: SparkSession, http: graft.server.HttpFacade,
        httpPort: Int)
    @volatile var node: Node = null
    val nodeLock = new java.util.concurrent.locks.ReentrantReadWriteLock()

    def boot(): Node = {
      val s = spark0.newSession()
      s.conf.set("spark.graft.warehouse", wh)
      s.conf.set("spark.graft.checkpointDir", ckptDir.toString)
      graft.sql.Ddl.restoreSession(s)
      val http = new graft.server.HttpFacade(s, sfDir, 0)
      Node(s, http, http.start())
    }

    def post(path: String, body: String): (Int, String) = {
      val n = node
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${n.httpPort}$path"))
          .timeout(java.time.Duration.ofSeconds(60))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }

    node = boot()
    // seed table for the soak (separate from the parquet test tables)
    post("/sql", "CREATE TABLE IF NOT EXISTS soak (_id ID, v INT, tag STRING)")

    // ANN serving across bounces (r12): build once, append once, then the
    // reader below re-runs the SAME exhaustive query all soak long — every
    // response must be byte-identical to the first, including right after
    // a facade restart replayed the registration from the warehouse.
    val annQueryBody = {
      val qv = (0 until 64).map(i => (0.01 * (i % 7)).toString)
        .mkString("[", ",", "]")
      s"""{"query":$qv,"k":10,"nProbe":0,"shortlist":1000000}"""
    }
    post("/ann/soak/build", """{"table":"embeddings","id":"vec_id",""" +
      """"vec":"embedding","dim":64,"nCells":4,"m":8,"k":16}""")
    post("/ann/soak/append",
      """{"table":"embeddings","where":"vec_id % 7 = 0"}""") // dup no-op path
    val annExpect = post("/ann/soak/query", annQueryBody) match {
      case (200, b) => b
      case (c, b)   => sys.error(s"ann seed query $c: ${b.take(200)}")
    }

    // each writer owns keys [base, base+span) and remembers its last value
    val nWriters = 4
    val span = 1000L
    val lastValue = Array.fill(nWriters)(
      new java.util.concurrent.ConcurrentHashMap[Long, Long]())

    def guarded[T](tag: String)(f: => T): Option[T] = {
      nodeLock.readLock().lock()
      try { requests.incrementAndGet(); Some(f) }
      catch { case e: Throwable =>
        errors.add(s"$tag: ${e.toString.linesIterator.next()}"); None }
      finally nodeLock.readLock().unlock()
    }

    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        val rnd = new scala.util.Random(1234 + w)
        while (!stop.get()) {
          val key = w * span + rnd.nextInt(200)
          val v = rnd.nextInt(1000000)
          guarded(s"writer$w") {
            val (c, b) = post("/index/soak/query", s"Set($key, v=$v)")
            if (c != 200) sys.error(s"write $c: ${b.take(120)}")
            lastValue(w).put(key, v.toLong)
          }
          if (rnd.nextInt(10) == 0) guarded(s"writer$w-read") {
            val k = w * span + rnd.nextInt(200)
            Option(lastValue(w).get(k)).foreach { want =>
              val (c, b) = post("/index/soak/query", s"FieldValue(field=v, column=$k)")
              if (c != 200) sys.error(s"read $c")
              if (!b.contains(s"[$want,")) // ValCount row: [value, 1]
                sys.error(s"stale read key=$k want=$want got=${b.take(120)}")
            }
          }
        }
      }, s"soak-writer-$w")
    }

    val reader = new Thread(() => {
      val rnd = new scala.util.Random(99)
      while (!stop.get()) {
        guarded("reader") {
          val (c, _) = post("/index/soak/query", "Count(All())")
          if (c != 200) sys.error(s"count $c")
        }
        if (rnd.nextInt(4) == 0) guarded("reader-sql") {
          val (c, _) = post("/sql", "SELECT count(*) AS c FROM soak WHERE v > 500000")
          if (c != 200) sys.error(s"sql $c")
        }
        if (rnd.nextInt(4) == 1) guarded("reader-ann") {
          val (c, b) = post("/ann/soak/query", annQueryBody)
          if (c != 200) sys.error(s"ann $c: ${b.take(120)}")
          if (b != annExpect)
            sys.error(s"ann drifted across bounce: got=${b.take(120)} " +
              s"want=${annExpect.take(120)}")
        }
        Thread.sleep(20)
      }
    }, "soak-reader")

    val backupper = new Thread(() => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-soak-bk")
      var i = 0
      while (!stop.get()) {
        Thread.sleep(5000)
        guarded("backup") {
          graft.core.Backup.backup(wh, tmp.resolve(s"b$i.tar").toString)
          i += 1
        }
      }
    }, "soak-backup")

    val restarter = new Thread(() => {
      while (!stop.get()) {
        Thread.sleep(8000)
        if (!stop.get()) {
          nodeLock.writeLock().lock()
          try {
            val old = node
            old.http.stop()
            // simulate a true process bounce for the ANN registry (it is
            // JVM-global state): wipe it so boot()'s restoreSession must
            // replay the durable record for /ann/soak to keep answering
            graft.server.AnnServe.clear()
            node = boot()
            restarts.incrementAndGet()
            // durability invariant: every committed key is back
            val want = lastValue.map(_.size()).sum
            val (c, b) = post("/index/soak/query", "Count(All())")
            if (c != 200 || !b.contains(s"[$want]"))
              errors.add(s"restart: count after restore got=${b.take(120)} want=$want")
          } catch { case e: Throwable =>
            errors.add(s"restart: ${e.toString.linesIterator.next()}")
          } finally nodeLock.writeLock().unlock()
        }
      }
    }, "soak-restart")

    val ckptWatcher = new Thread(() => {
      while (!stop.get()) {
        val b = dirBytes(ckptDir)
        ckptMax.updateAndGet(m => math.max(m, b))
        Thread.sleep(2000)
      }
    }, "soak-ckpt-watch")

    val threads = writers ++ Seq(reader, backupper, restarter, ckptWatcher)
    threads.foreach(_.start())
    Thread.sleep(seconds * 1000L)
    stop.set(true)
    threads.foreach(_.join(60000))

    // final invariant sweep: every writer's last values readable
    var checked = 0
    lastValue.zipWithIndex.foreach { case (m, w) =>
      m.forEach { (k, v) =>
        val (c, b) = post("/index/soak/query", s"FieldValue(field=v, column=$k)")
        if (c != 200 || !b.contains(s"[$v,"))
          errors.add(s"final: key=$k want=$v got=${b.take(120)}")
        checked += 1
      }
    }
    node.http.stop()

    // reclamation proof: once the serving state is dropped, the
    // ContextCleaner (cleanCheckpoints=true) must GC the checkpoint trees
    // of superseded pieces — poll until the size stops falling, then assert
    // the tree is BOUNDED (≈ the live state, nowhere near the churn peak)
    node = null
    var ckptFinal = dirBytes(ckptDir)
    var settleTries = 0
    var shrinking = true
    while (shrinking && settleTries < 15) {
      System.gc()
      Thread.sleep(2000)
      val b = dirBytes(ckptDir)
      shrinking = b < ckptFinal
      ckptFinal = b
      settleTries += 1
    }
    if (requests.get() >= 500 && ckptMax.get() > 0 &&
        ckptFinal > math.max(ckptMax.get() / 4, 64L << 20))
      errors.add(s"checkpoint tree not reclaimed: final=$ckptFinal " +
        s"max=${ckptMax.get()}")

    println(s"""{"soak_seconds":$seconds,"requests":${requests.get()},""" +
      s""""restarts":${restarts.get()},"final_keys_checked":$checked,""" +
      s""""ckpt_max_bytes":${ckptMax.get()},"ckpt_final_bytes":$ckptFinal,""" +
      s""""errors":${errors.size()}}""")
    if (!errors.isEmpty) {
      scala.jdk.CollectionConverters.IteratorHasAsScala(errors.iterator())
        .asScala.take(20).foreach(e => System.err.println(s"[soak] $e"))
      sys.exit(1)
    }
    sys.exit(0)
  }
}
