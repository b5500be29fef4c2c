package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query against an sf dir and show it.
  *   runMain graft.tools.RunQ sql_flatten /root/testdata/sf0.001 [outParquet]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.printSchema()
    df.show(30, truncate = false)
    if (args.length > 2)
      df.coalesce(1).write.mode("overwrite").parquet(args(2))
    graft.SparkEntry.oracleSql.get(name).foreach(s => println(s"ORACLE: $s"))
    spark.stop()
  }
}
