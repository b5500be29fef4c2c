package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: EXECUTE a named query (collect drives the query's own
  * QueryExecution, unlike a noop write which plans separately) and print
  * the FINAL adaptive plan — shows whether AQE exchange reuse dedupes
  * repeated subtrees at runtime. `runMain graft.tools.ReuseCheck [query] [sfDir]`. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd_minhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("[reuse] ReusedExchange/Stage occurrences: " +
      "(reusedEx=" + "ReusedExchange".r.findAllIn(p).size + " reusedStage=" + "ReusedQueryStage".r.findAllIn(p).size +
      " shuffleEx=" + "Exchange hashpartitioning".r.findAllIn(p).size +
      " scans=" + "Scan parquet".r.findAllIn(p).size + ")")
    println(p.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Scan parquet") ||
      l.contains("ShuffleQueryStage") || l.contains("TableCacheQueryStage"))
      .take(40).mkString("\n"))
    spark.stop()
  }
}
