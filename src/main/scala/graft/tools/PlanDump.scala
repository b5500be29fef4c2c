package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for bench/declared queries to files —
  * the r15+ optimization-round evidence trail (`plans/r15/<q>_before.txt`).
  *
  *   runMain graft.tools.PlanDump <outDir> <suffix> [name ...]
  *
  * Names default to every [[graft.SparkEntry.benchQueries]] entry. The
  * session mirrors Bench's conf (same shuffle partitions/AQE/master) so the
  * dumped plan is the one the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.benchQueries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.benchQueries.get(name)
        .orElse(graft.SparkEntry.queries.get(name))
        .getOrElse(sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(plan) finally w.close()
      println(s"[plandump] wrote ${f.getPath} (${plan.length} chars)")
    }
    spark.stop()
  }
}
