package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss fault-tolerance probe: under a multi-JVM master
  * (`local-cluster[2,4,3072]`) it runs the shuffle-heavy MinHash dedup
  * pipeline once fault-free, then AGAIN while `kill -9`-ing one executor
  * JVM mid-query, and asserts the faulted run returns the identical
  * result. This exercises the deepest recovery path a 1000-executor
  * cluster hits routinely: ExecutorLost → the dead executor's shuffle map
  * outputs are unregistered → FetchFailed on the reduce side → parent
  * stage resubmission recomputes ONLY the lost partitions — through our
  * custom codegen expressions ([[graft.functions.WordShingles]],
  * [[graft.functions.BandKeys]]) and the roaring/array-buffer imperative
  * aggregate ([[graft.functions.MinHashSigAgg]]), whose partial states
  * live on the killed executor and must be recomputed, not resumed.
  *
  * The kill scenario runs TWICE, once per [[graft.core.Materialize]]
  * cluster tier: the default replicated-localCheckpoint tier (the
  * candidate-pair blocks survive the kill via their replica on the other
  * executor) and the reliable-checkpoint tier
  * (`spark.graft.checkpointDir`; blocks survive via the shared
  * filesystem). Round 9's first probe runs caught the pre-fix hole here:
  * a bare localCheckpoint block dying with its executor aborted the whole
  * query with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — exactly the failure an
  * executor drain causes at 100 TB.
  *
  * The reference handles node loss by re-fetching fragments from replicas
  * (`/root/reference/executor.go:5966` remoteExec retry on
  * ErrShardUnavailable); Spark's lineage recompute + block replication is
  * the engine-native equivalent, and this probe is the evidence it
  * actually works for our custom serialization surfaces — parity alone
  * ([[ClusterProbe]]) only proves the happy path.
  *
  *   SPARK_GRAFT_MASTER='local-cluster[2,4,3072]' \
  *     sbt 'runMain graft.tools.FaultProbe'
  *
  * PROBE lines (one per assertion, consumed by ClusterFaultSpec):
  *   PROBE jvms OK executorPids=... driverPid=...
  *   PROBE fault_kill OK pid=... midQuery=true            (default tier)
  *   PROBE fault_result OK expected=N got=N
  *   PROBE fault_recovery OK newExecutors=...
  *   PROBE fault_kill_reliable OK ...                     (checkpointDir tier)
  *   PROBE fault_result_reliable OK expected=N got=N
  */
object FaultProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), "local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"PROBE master=${spark.sparkContext.master}")

    var failures = 0
    def check(name: String)(body: => String): Unit =
      try println(s"PROBE $name OK $body")
      catch { case e: Throwable =>
        failures += 1
        println(s"PROBE $name FAIL ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(8).foreach(f => println(s"  at $f"))
      }

    def executorPids(): Set[Long] =
      spark.sparkContext.parallelize(1 to 64, 16)
        .map(_ => ProcessHandle.current().pid()).distinct().collect().toSet

    /** Wait until `want` distinct executor JVMs answer (a replacement
      * executor needs a few seconds to register after a kill). */
    def awaitExecutors(want: Int, timeoutMs: Long = 90000): Set[Long] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      var pids = executorPids()
      while (pids.size < want && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000); pids = executorPids()
      }
      pids
    }

    val driverPid = ProcessHandle.current().pid()
    val pids0 = awaitExecutors(2)
    check("jvms") {
      require(pids0.size >= 2 && !pids0.contains(driverPid),
        s"want 2 executor JVMs distinct from driver, got $pids0")
      s"executorPids=${pids0.toSeq.sorted.mkString(",")} driverPid=$driverPid"
    }

    // corpus sized so the fault-free pipeline runs long enough (~5-15 s on
    // 2x4 cores) that a mid-flight kill has a wide window; generated as
    // pure distributed expressions, no parquet round-trip needed
    val docs = DocGen.frame(spark, 120000L, parts = 32)
    def pairsCount(): Long =
      graft.functions.Dedup.minhashPairs(
        graft.functions.Dedup.shingledPosting(docs, "doc_id", "text",
          layoutById = true), 0.5).count()

    // fault-free runs: the cold run pins the expected answer, the warm run
    // calibrates the kill delay (JIT makes run 2 ~2× faster than run 1 —
    // timing the kill off the cold run would overshoot the window)
    val expected = pairsCount()
    val w0 = System.nanoTime()
    val warmCheck = pairsCount()
    var lastRunSec = (System.nanoTime() - w0) / 1e9
    require(warmCheck == expected, s"warm run diverged fault-free: " +
      s"$expected vs $warmCheck — probe corpus is nondeterministic")

    val tracker = spark.sparkContext.statusTracker
    val killedPids = collection.mutable.Set[Long]()

    /** Kill one executor mid-query under the CURRENT Materialize tier —
      * deep enough that stage-1 shuffle output exists on the victim
      * (forcing FetchFailed + parent-stage resubmit), early enough that
      * work remains. The delay is a fraction of the previous run's wall
      * clock; if a run finishes before the kill lands, retry with an
      * earlier kill point (each attempt re-checks the two-executor roster
      * first — a prior off-window kill still consumed an executor). */
    def faultScenario(suffix: String): Unit = {
      var attempt = 0
      var midKill = false
      var victim = 0L
      var killDied = false
      var killAtSec, faultedSec = 0.0
      var got = -1L
      while (!midKill && attempt < 3) {
        attempt += 1
        val pids = awaitExecutors(2)
        victim = (pids -- killedPids).head
        val frac = Seq(0.45, 0.25, 0.08)(attempt - 1)
        @volatile var killTsNs = 0L
        @volatile var died = false
        val killer = new Thread(() => {
          val deadline = System.currentTimeMillis() + 60000
          while (tracker.getActiveJobIds().isEmpty &&
                 System.currentTimeMillis() < deadline) Thread.sleep(20)
          Thread.sleep(math.max(100L, (lastRunSec * frac * 1000).toLong))
          ProcessHandle.of(victim).ifPresent { h =>
            killTsNs = System.nanoTime()
            h.destroyForcibly()
            val dl = System.currentTimeMillis() + 30000
            while (h.isAlive && System.currentTimeMillis() < dl) Thread.sleep(50)
            died = !h.isAlive
          }
        }, s"executor-killer$suffix-$attempt")
        val q0 = System.nanoTime()
        killer.start()
        got = pairsCount()
        val q1 = System.nanoTime()
        killer.join(60000)
        killedPids += victim
        killDied = died
        faultedSec = (q1 - q0) / 1e9
        lastRunSec = faultedSec
        killAtSec = (killTsNs - q0) / 1e9
        midKill = killTsNs > q0 && killTsNs < q1 && died
        if (!midKill) println(s"PROBE note attempt $attempt$suffix missed " +
          s"the window (kill at $killAtSec s of $faultedSec s, died=$died); retrying")
      }

      check(s"fault_kill$suffix") {
        require(killDied, s"kill did not land: pid=$victim died=$killDied")
        require(midKill, s"kill landed outside the query window on every " +
          s"attempt (last: $killAtSec s of $faultedSec s)")
        s"pid=$victim midQuery=true atSec=$killAtSec attempt=$attempt"
      }
      check(s"fault_result$suffix") {
        require(got == expected, s"faulted run diverged: $expected vs $got")
        s"expected=$expected got=$got faultedSec=$faultedSec"
      }
    }

    // tier 1: default cluster mode — replicated localCheckpoint blocks
    faultScenario("")
    check("fault_recovery") {
      val pids1 = awaitExecutors(2)
      require(pids1.size >= 2, s"cluster did not recover two executors: $pids1")
      require(!killedPids.exists(pids1.contains),
        s"a killed pid is still serving: $pids1")
      val fresh = pids1 -- pids0
      require(fresh.nonEmpty, s"no replacement executor joined: $pids1")
      s"newExecutors=${fresh.toSeq.sorted.mkString(",")}"
    }

    // tier 2: reliable-checkpoint mode — blocks on the shared filesystem
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-fault-ck").toString
    spark.conf.set("spark.graft.checkpointDir", ckDir)
    try faultScenario("_reliable")
    finally spark.conf.unset("spark.graft.checkpointDir")

    println("PROBE done")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
