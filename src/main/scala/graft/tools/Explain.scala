package graft.tools

import org.apache.spark.sql.SparkSession

/** Explain + time any SparkEntry query by name:
  *   runMain graft.tools.Explain <queryName> [sfDir] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
                else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.get(name)
      .orElse(graft.SparkEntry.benchQueries.get(name))
      .getOrElse(sys.error(s"unknown query $name"))
    val df = fn(spark, sfDir)
    if (args.contains("--plan")) df.explain("formatted")
    // warm + time
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name timed=${(System.nanoTime() - t0) / 1e9}%.3fs")
    spark.stop()
  }
}
