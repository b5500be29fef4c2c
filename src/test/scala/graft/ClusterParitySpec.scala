package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Multi-JVM execution proof INSIDE the test suite: spawns a fresh driver
  * JVM running [[graft.tools.ClusterProbe]] under
  * `local-cluster[2,4,3072]` — a real standalone master + 2 workers, each
  * launching a separate EXECUTOR JVM — and asserts every risky
  * serialization surface (custom codegen'd expressions, roaring-buffer
  * imperative aggregates, the minhash signature aggregate, BPE-encode
  * fused codegen, ivy closures, PQ ADC scans) executes across the process
  * boundary. `local[]` structurally hides this bug class: expression
  * trees, TypedImperativeAggregate buffers, and closures never leave the
  * driver's classloader there.
  *
  * A spawned JVM (not a session swap) because [[SparkSpec]]'s shared
  * session is a JVM-wide singleton — stopping it to rebuild with a
  * cluster master would strand every later suite on a dead context.
  *
  * The full 140-query parity run is tools-level (graft.Verify under
  * SPARK_GRAFT_MASTER + graft.tools.VerifyDiff); this spec keeps the
  * in-suite gate fast (~90 s) while covering each distinct surface.
  */
class ClusterParitySpec extends AnyFunSuite {
  test("custom expressions/aggregates/closures execute in separate " +
      "executor JVMs under local-cluster") {
    assume(ClusterLaunch.available, "no Spark distribution / sbt classes")
    val (finished, probeLines, tail) = ClusterLaunch.probe(
      "graft.tools.ClusterProbe", "local-cluster[2,4,3072]",
      Map("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001"))
    assert(finished == 0, s"probe exit $finished:\n$tail")
    assert(probeLines.exists(_.startsWith("PROBE master=local-cluster")),
      probeLines.mkString("\n"))
    // executors really are OTHER processes
    val jvms = probeLines.find(_.startsWith("PROBE jvms OK"))
      .getOrElse(fail(s"no jvms line:\n${probeLines.mkString("\n")}"))
    val pids = "executorPids=([0-9,]+) driverPid=([0-9]+)".r
      .findFirstMatchIn(jvms).getOrElse(fail(s"unparseable: $jvms"))
    val execPids = pids.group(1).split(",").toSet
    assert(execPids.size == 2 && !execPids.contains(pids.group(2)),
      s"expected 2 executor JVMs distinct from the driver: $jvms")
    // every surface crossed the boundary
    for (surface <- Seq("minhash_pipeline", "roaring_agg", "bpe_encode",
        "ivy_apply", "pq_adc"))
      assert(probeLines.exists(l =>
        l.startsWith(s"PROBE $surface OK")),
        s"$surface did not pass:\n${probeLines.mkString("\n")}")
    assert(!probeLines.exists(_.contains(" FAIL ")),
      probeLines.filter(_.contains(" FAIL ")).mkString("\n"))
  }
}
