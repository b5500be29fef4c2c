package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query by name and dump it the way Verify does —
  * the fast local loop for checking ONE query against its DuckDB oracle
  * without a full Verify pass:
  *
  * `runMain graft.tools.RunQuery <name> [sfDir] [outDir]`
  * then `python3 tools/check.py <sfDir> <outDir>` (oracle_sql.json carries
  * just this query's oracle).
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunQuery <name> [sfDir] [outDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse("/tmp/runquery_out")
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), "local[8]")
      .appName("graft-runquery")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"no query '$name'"))
    new java.io.File(outDir).mkdirs()
    val df = fn(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    df.show(20, truncate = false)
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"{${q(name)}: ${q(sql)}}")
    }
    spark.stop()
  }
}
