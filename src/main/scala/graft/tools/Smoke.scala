package graft.tools

import org.apache.spark.sql.SparkSession

/** Replays the driver's smoke check: SparkEntry.entry rows > 0.
  * Optional arg: a PQL query + table to run ad hoc, e.g.
  *   runMain graft.tools.Smoke lineitem "Count(All())"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length >= 2) {
      val df = graft.pql.Pql.run(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001"), args(0), args(1))
      df.show(50, truncate = false)
      df.explain("formatted")
    } else {
      val df = graft.SparkEntry.entry(spark)
      val n = df.count()
      df.show(10, truncate = false)
      println(s"entry rows=$n " + (if (n > 0) "SMOKE-OK" else "SMOKE-FAIL"))
    }
    spark.stop()
  }
}
