package graft

import scala.jdk.CollectionConverters._

/** Shared launcher for multi-JVM probe specs: spawns a fresh driver JVM
  * running a probe main under a `local-cluster` master (a real standalone
  * master + workers, each with a separate executor JVM) and returns its
  * combined output. A spawned JVM (not a session swap) because
  * [[SparkSpec]]'s shared session is a JVM-wide singleton — stopping it to
  * rebuild with a cluster master would strand every later suite on a dead
  * context. */
object ClusterLaunch {
  /** True when the environment can launch executor JVMs at the sbt layout. */
  def available: Boolean =
    new java.io.File("/opt/spark/jars").isDirectory &&
      new java.io.File("target/scala-2.13/classes").isDirectory

  /** Run `mainClass` under `master`; returns (exitCode, PROBE lines, full
    * output tail for diagnostics). */
  def probe(mainClass: String, master: String,
            env: Map[String, String] = Map.empty): (Int, Vector[String], String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // reuse this JVM's --add-opens set (Spark 4 on JDK 17 needs them);
    // input arguments carry each flag as ONE string "--add-opens" followed
    // by its value OR as "--add-opens=..." depending on the launcher
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val opens = Vector.newBuilder[String]
    var i = 0
    while (i < in.size) {
      if (in(i) == "--add-opens" && i + 1 < in.size) {
        opens += in(i) += in(i + 1); i += 2
      } else if (in(i).startsWith("--add-opens=")) { opens += in(i); i += 1 }
      else i += 1
    }
    val cmd = (Vector(javaBin) ++ opens.result() ++ Vector(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      mainClass)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.directory(new java.io.File("."))
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_GRAFT_MASTER", master)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val finished = p.waitFor()
    // full output on disk for post-mortem (the returned tail is truncated)
    val dump = java.io.File.createTempFile(s"graft-probe-", ".log")
    java.nio.file.Files.writeString(dump.toPath, out)
    (finished, out.linesIterator.filter(_.startsWith("PROBE")).toVector,
      s"[full output: $dump]\n" + out.takeRight(4000))
  }
}
