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
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.get(name)
      .orElse(graft.SparkEntry.benchQueries.get(name))
      .getOrElse(sys.error(s"unknown query $name"))
    val df = fn(spark, sfDir)
    if (args.contains("--plan")) df.explain("formatted")
    if (args.contains("--build")) {
      // separates plan construction (parse/analyze/table load) from
      // execution: fn() is rebuilt per bench run, so its cost is real
      fn(spark, sfDir) // warm
      val tb = System.nanoTime()
      (1 to 5).foreach(_ => fn(spark, sfDir).queryExecution.optimizedPlan)
      println(f"[explain] $name build=${(System.nanoTime() - tb) / 5e9}%.3fs/call")
      // component bisect for the SQL path: table load vs parse/analyze
      def t(label: String)(f: => Any): Unit = {
        f // warm
        val t0 = System.nanoTime()
        (1 to 5).foreach(_ => f)
        println(f"[explain] part $label ${(System.nanoTime() - t0) / 5e9}%.3fs/call")
      }
      t("load3")(Seq("orders", "customer", "nation")
        .map(n => graft.core.Tables.load(spark, sfDir, n)))
      Seq("orders", "customer", "nation").foreach(n =>
        graft.core.Tables.load(spark, sfDir, n).createOrReplaceTempView(n))
      val q = "SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 2) AS rev " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"
      t("parse+analyze")(spark.sql(q).queryExecution.analyzed)
      t("optimize")(spark.sql(q).queryExecution.optimizedPlan)
    }
    // warm + time
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name timed=${(System.nanoTime() - t0) / 1e9}%.3fs")
    spark.stop()
  }
}
