package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chaos sweep of the RELIABLE checkpoint tier ([[graft.core.Materialize]]
  * with `spark.graft.checkpointDir` — the 100-TB production mode): under a
  * multi-JVM master it runs a representative query subset — the MinHash
  * pipeline, exact-substring dedup, the connected-components loop, and BPE
  * training — each with a `kill -9` of a RANDOM executor JVM landed
  * mid-query, and asserts every faulted run returns a result identical to
  * its fault-free run. [[FaultProbe]] proves one kill on one query per
  * tier; this probe is the breadth pass the reliable tier needed — each
  * query routes its `Materialize.stable` sites through
  * `Dataset.checkpoint` on the shared filesystem, so recovery reads
  * checkpoint files instead of dead-executor blocks, and the loops
  * (components label propagation, BPE merge iterations) checkpoint
  * REPEATEDLY, giving the kill a different materialization to land on each
  * attempt. The reference's equivalent is re-fetching fragments from
  * replicas on ErrShardUnavailable (`/root/reference/executor.go:5966`).
  *
  *   SPARK_GRAFT_MASTER='local-cluster[2,4,3072]' \
  *     sbt 'runMain graft.tools.ChaosProbe'
  *
  * PROBE lines (consumed by ClusterFaultSpec):
  *   PROBE chaos_tier OK checkpointDir=...
  *   PROBE chaos_minhash OK digest=... killAt=...
  *   PROBE chaos_substring OK ...
  *   PROBE chaos_components OK ...
  *   PROBE chaos_bpe OK ...
  *   PROBE chaos_aborts OK count=0
  */
object ChaosProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), "local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"PROBE master=${spark.sparkContext.master}")
    // under plain local[N] executors ARE the driver JVM — executorPids()
    // would return the driver's own pid and the chaos kill would destroy
    // the probe itself. Refuse anything but real separate executor JVMs.
    val m = spark.sparkContext.master
    require(m.startsWith("local-cluster") || m.startsWith("spark://") ||
      m.startsWith("yarn") || m.startsWith("k8s"),
      s"ChaosProbe needs a multi-JVM master (got '$m'); run with " +
        "SPARK_GRAFT_MASTER='local-cluster[2,4,3072]'")

    var failures = 0
    def check(name: String)(body: => String): Unit =
      try println(s"PROBE $name OK $body")
      catch { case e: Throwable =>
        failures += 1
        println(s"PROBE $name FAIL ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(8).foreach(f => println(s"  at $f"))
      }

    // reliable tier ON for the whole sweep
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-chaos-ck").toString
    spark.conf.set("spark.graft.checkpointDir", ckDir)
    check("chaos_tier") {
      require(spark.conf.get("spark.graft.checkpointDir") == ckDir)
      s"checkpointDir=$ckDir"
    }

    def executorPids(): Set[Long] =
      spark.sparkContext.parallelize(1 to 64, 16)
        .map(_ => ProcessHandle.current().pid()).distinct().collect().toSet
    def awaitExecutors(want: Int, timeoutMs: Long = 90000): Set[Long] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      var pids = executorPids()
      while (pids.size < want && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000); pids = executorPids()
      }
      pids
    }
    val tracker = spark.sparkContext.statusTracker
    val killedPids = collection.mutable.Set[Long]()
    val rnd = new scala.util.Random(
      sys.env.getOrElse("SPARK_GRAFT_CHAOS_SEED", "1009").toLong)

    /** (count, order-independent value hash) of a result — value identity
      * without assuming an output ordering. */
    def digest(df: DataFrame): String = {
      // bit_xor: order-independent and overflow-free (a sum of hashes
      // trips ANSI long-overflow on any decent-sized result)
      val r = df
        .select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("__h"))
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(expr("bit_xor(__h)"), lit(0L)).as("h")).head()
      s"${r.getLong(0)}:${r.getLong(1)}"
    }

    /** One query run with `nKills` kill -9s of random executor JVMs fired
      * from inside the query window (`gapMs` apart when nKills > 1).
      * Returns (result, all kills landed mid-window and the victims died,
      * per-kill offsets into the window, window length). */
    def killedRun(name: String, q: () => String, lastRunSec: Double,
                  frac: Double, nKills: Int, gapMs: Long)
        : (String, Boolean, Seq[Double], Double) = {
      val pids = awaitExecutors(math.max(2, nKills))
      val alive = rnd.shuffle((pids -- killedPids).toSeq.sorted)
      val victims = alive.take(nKills)
      val killTs = Array.fill(nKills)(0L)
      val died = Array.fill(nKills)(false)
      val killer = new Thread(() => {
        val deadline = System.currentTimeMillis() + 60000
        while (tracker.getActiveJobIds().isEmpty &&
               System.currentTimeMillis() < deadline) Thread.sleep(20)
        Thread.sleep(math.max(100L, (lastRunSec * frac * 1000).toLong))
        victims.zipWithIndex.foreach { case (v, i) =>
          if (i > 0) Thread.sleep(gapMs)
          ProcessHandle.of(v).ifPresent { h =>
            killTs(i) = System.nanoTime()
            h.destroyForcibly()
            val dl = System.currentTimeMillis() + 30000
            while (h.isAlive && System.currentTimeMillis() < dl) Thread.sleep(50)
            died(i) = !h.isAlive
          }
        }
      }, s"chaos-killer-$name")
      val q0 = System.nanoTime()
      killer.start()
      val got = q() // an abort throws here and fails the check loudly
      val q1 = System.nanoTime()
      killer.join(60000)
      victims.zip(died.toSeq).foreach { case (v, d) => if (d) killedPids += v }
      val window = (q1 - q0) / 1e9
      val offsets = killTs.toSeq.map(t => (t - q0) / 1e9)
      val landed = died.forall(identity) &&
        killTs.forall(t => t > q0 && t < q1)
      (got, landed, offsets, window)
    }

    /** Run `q` fault-free twice (pin answer, calibrate the kill window),
      * then land `kills` SEQUENTIAL mid-query executor kills — the reliable
      * tier's contract is "survives ANY number of losses", not one — each
      * faulted run returning the pinned answer. Runs whose kill misses the
      * window don't count toward the quota but must still match. */
    def chaos(name: String, kills: Int = 3)(q: () => String): Unit =
      check(s"chaos_$name") {
        val expected = q()
        val w0 = System.nanoTime()
        val again = q()
        var lastRunSec = (System.nanoTime() - w0) / 1e9
        require(again == expected,
          s"fault-free reruns diverged: $expected vs $again")
        var landed = 0
        var attempt = 0
        val details = Seq.newBuilder[String]
        while (landed < kills && attempt < kills * 4) {
          attempt += 1
          val frac = 0.1 + rnd.nextDouble() * 0.5
          val (got, mid, offs, window) =
            killedRun(s"$name-$attempt", q, lastRunSec, frac, 1, 0)
          lastRunSec = window
          require(got == expected,
            s"$name diverged after executor kill: $expected vs $got")
          if (mid) {
            landed += 1
            details += f"${offs.head}%.2f/${window}%.2f"
          } else println(s"PROBE note $name attempt $attempt missed the " +
            f"window (kill at ${offs.head}%.2f s of $window%.2f s)")
        }
        require(landed >= kills,
          s"only $landed of $kills kills landed inside the $name window")
        s"digest=$expected kills=$landed attempts=$attempt " +
          s"killAt=${details.result().mkString(",")}"
      }

    /** BOTH executors killed inside one query window, ~400 ms apart (well
      * inside a single stage at these corpus sizes): the cluster is briefly
      * at ZERO executors mid-stage and the run must still return the pinned
      * answer once the worker respawns them. */
    def doubleKill(name: String)(q: () => String): Unit =
      check("chaos_doublekill") {
        val expected = q()
        val w0 = System.nanoTime()
        require(q() == expected, "fault-free reruns diverged")
        var lastRunSec = (System.nanoTime() - w0) / 1e9
        var attempt = 0
        var done = ""
        while (done.isEmpty && attempt < 6) {
          attempt += 1
          val (got, mid, offs, window) =
            killedRun(s"$name-double-$attempt", q, lastRunSec,
              frac = 0.1 + rnd.nextDouble() * 0.3, nKills = 2, gapMs = 400)
          lastRunSec = window
          require(got == expected,
            s"double-kill diverged: $expected vs $got")
          if (mid) done = f"digest=$got killsAt=${offs.head}%.2f," +
            f"${offs(1)}%.2f of $window%.2f s attempt=$attempt"
          else println(s"PROBE note doublekill attempt $attempt missed " +
            s"(offsets ${offs.map(o => f"$o%.2f").mkString(",")} of $window)")
        }
        require(done.nonEmpty, "double kill never landed inside the window")
        done
      }

    // corpora as pure distributed expressions (no parquet round-trip);
    // sized so each query runs long enough for a kill window on 2×4 cores
    val docs = DocGen.frame(spark, 100000L, parts = 32)
    val docsSmall = DocGen.frame(spark, 40000L, parts = 16)

    chaos("minhash") { () =>
      digest(graft.functions.Dedup.minhashPairs(
        graft.functions.Dedup.shingledPosting(docs, "doc_id", "text",
          layoutById = true), 0.5))
    }
    chaos("substring") { () =>
      digest(graft.functions.Dedup.substringDedup(docs, "doc_id", "text", 5))
    }
    chaos("components") { () =>
      // label-propagation loop: every iteration re-materializes its state
      // through the reliable tier, so the kill lands mid-loop
      digest(graft.functions.Dedup.duplicateClusters(
        graft.functions.Dedup.minhashPairs(
          graft.functions.Dedup.shingledPosting(docsSmall, "doc_id", "text",
            layoutById = true), 0.3)))
    }
    chaos("bpe") { () =>
      digest(graft.functions.Text.bpeTrain(docsSmall, "text", 24))
    }
    doubleKill("minhash") { () =>
      digest(graft.functions.Dedup.minhashPairs(
        graft.functions.Dedup.shingledPosting(docs, "doc_id", "text",
          layoutById = true), 0.5))
    }

    // ONLINE grouped-index maintenance absorbs the kill: each invocation is
    // a fresh 3-batch maintained ingest (fileSource → per-batch fact
    // publish + index fold + re-register), digesting the FINAL index
    // version. Executor loss mid-fold retries the fold job's tasks; the
    // version markers keep folds exactly-once, so the digest must pin.
    // Digest columns are strings and LONG sums — order-independent exactly.
    val imsN = new java.util.concurrent.atomic.AtomicInteger
    chaos("index_maintain") { () =>
      import graft.streaming.{IndexMaintain, Ingest}
      val root = Ingest.scratch(s"chaos_ims_${imsN.incrementAndGet()}")
      val src = AbleGen.frame(spark, 300000L, 24)
        .select(col("_id"), col("education_level"), col("age"))
      Seq(0, 1, 2).foreach(i => src.filter(col("_id") % 3 === i)
        .repartition(2).write.parquet(s"$root/src/p$i.parquet"))
      val stream = Ingest.fileSource(spark, s"$root/src/*", "PARQUET",
        src.schema, maxFilesPerTrigger = 1)
      val (sq, state) = IndexMaintain.start(stream, s"$root/fact",
        s"$root/ckpt", s"$root/idx/g", Seq("education_level"), Seq("age"))
      sq.awaitTermination()
      digest(spark.read.parquet(state.currentIndexPath.get))
    }

    check("chaos_aborts") {
      require(failures == 0, s"$failures scenario(s) aborted or diverged")
      "count=0"
    }

    println("PROBE done")
    spark.stop()
    // the sweep's checkpoint trees are probe-local scratch; reclaim them
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(ckDir))
    if (failures > 0) sys.exit(1)
  }
}
