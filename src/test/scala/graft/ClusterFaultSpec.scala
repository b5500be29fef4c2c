package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executor-loss recovery proof INSIDE the test suite: spawns
  * [[graft.tools.FaultProbe]] under `local-cluster[2,4,3072]`, which
  * `kill -9`s one executor JVM MID-QUERY during the shuffle-heavy MinHash
  * pipeline and asserts (a) the kill landed inside the query window,
  * (b) the faulted run's answer is identical to the fault-free run —
  * lineage recompute through custom codegen expressions and the
  * imperative signature aggregate whose partial buffers died with the
  * executor — and (c) a replacement executor JVM joined. This is the
  * failure mode a 1000-executor cluster hits routinely;
  * [[ClusterParitySpec]] only proves the happy path crosses process
  * boundaries. */
class ClusterFaultSpec extends AnyFunSuite {
  test("query survives kill -9 of an executor JVM mid-flight with an " +
      "identical result") {
    assume(ClusterLaunch.available, "no Spark distribution / sbt classes")
    val (exit, probes, tail) =
      ClusterLaunch.probe("graft.tools.FaultProbe", "local-cluster[2,4,3072]")
    assert(exit == 0, s"probe exit $exit:\n$tail")
    for (surface <- Seq("jvms", "fault_kill", "fault_result", "fault_recovery",
        "fault_kill_reliable", "fault_result_reliable"))
      assert(probes.exists(_.startsWith(s"PROBE $surface OK")),
        s"$surface did not pass:\n${probes.mkString("\n")}")
    assert(!probes.exists(_.contains(" FAIL ")),
      probes.filter(_.contains(" FAIL ")).mkString("\n"))
    // the result line proves value identity, not just completion
    val res = probes.find(_.startsWith("PROBE fault_result OK")).get
    val m = "expected=(\\d+) got=(\\d+)".r.findFirstMatchIn(res)
      .getOrElse(fail(s"unparseable: $res"))
    assert(m.group(1) == m.group(2), res)
  }

  test("reliable-tier chaos sweep: minhash, substring, components loop, " +
      "BPE train and the online index-maintenance loop each survive 3 " +
      "sequential executor kills (plus a zero-executor double-kill) with " +
      "identical results") {
    assume(ClusterLaunch.available, "no Spark distribution / sbt classes")
    val (exit, probes, tail) =
      ClusterLaunch.probe("graft.tools.ChaosProbe", "local-cluster[2,4,3072]")
    assert(exit == 0, s"probe exit $exit:\n$tail")
    for (surface <- Seq("chaos_tier", "chaos_minhash", "chaos_substring",
        "chaos_components", "chaos_bpe", "chaos_index_maintain",
        "chaos_doublekill", "chaos_aborts"))
      assert(probes.exists(_.startsWith(s"PROBE $surface OK")),
        s"$surface did not pass:\n${probes.mkString("\n")}")
    // the reliable tier's claim is "survives ANY number of losses" — each
    // scenario must have absorbed its full 3-kill quota, not one lucky hit
    for (surface <- Seq("chaos_minhash", "chaos_substring",
        "chaos_components", "chaos_bpe", "chaos_index_maintain")) {
      val line = probes.find(_.startsWith(s"PROBE $surface OK")).get
      assert(line.contains("kills=3"), s"$surface under-killed: $line")
    }
    assert(!probes.exists(_.contains(" FAIL ")),
      probes.filter(_.contains(" FAIL ")).mkString("\n"))
  }

  test("streaming upsert survives kill -9 of an executor JVM mid-stream " +
      "with exactly-once output") {
    assume(ClusterLaunch.available, "no Spark distribution / sbt classes")
    val (exit, probes, tail) = ClusterLaunch.probe(
      "graft.tools.StreamFaultProbe", "local-cluster[2,4,3072]")
    assert(exit == 0, s"probe exit $exit:\n$tail")
    for (surface <- Seq("stream_kill", "stream_result"))
      assert(probes.exists(_.startsWith(s"PROBE $surface OK")),
        s"$surface did not pass:\n${probes.mkString("\n")}")
    assert(!probes.exists(_.contains(" FAIL ")),
      probes.filter(_.contains(" FAIL ")).mkString("\n"))
  }
}
