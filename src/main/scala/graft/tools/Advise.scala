package graft.tools

import org.apache.spark.sql.SparkSession

/** Operator CLI for the workload index advisor: feed it the dashboard's
  * SQL (Spark SQL or reference-dialect via `--dialect`) and it prints, per
  * (fact path, explode-set) cluster, the ONE GroupIndex registration that
  * serves every query in the cluster — exact, coarser-quantum rollup,
  * dimension rollup, or dialect string cut ([[graft.plans.IndexAdvisor]]).
  *
  *   runMain graft.tools.Advise /root/testdata/sf0.001 \
  *     "SELECT event_type, count(*) FROM events GROUP BY event_type" \
  *     "SELECT date_trunc('hour', ts), count(*) FROM events GROUP BY 1"
  */
object Advise {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Advise <sfDir> [--dialect] <sql>...")
    val sfDir = args(0)
    val dialect = args.contains("--dialect")
    val sqls = args.drop(1).filterNot(_ == "--dialect")
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.registerAll(spark, sfDir)
    val dfs = sqls.toSeq.map(q =>
      if (dialect) graft.sql.GraftSql.sql(spark, sfDir, q) else spark.sql(q))
    val (analyses, recs) = graft.plans.IndexAdvisor.analyze(dfs)
    analyses.foreach { a =>
      val shape = a.shape.map(s =>
        s"keys=${s.groupKeys.mkString(",")} sums=${s.sumCols.mkString(",")}" +
          (if (s.distinctCols.nonEmpty) s" distincts=${s.distinctCols.mkString(",")}" else ""))
        .getOrElse("")
      println(f"query #${a.query}%-3d ${a.note}%-50s $shape")
    }
    if (recs.isEmpty) println("no index-able grouped queries in the workload")
    else {
      println(s"\n${recs.size} recommendation(s):")
      recs.foreach(r => println("  " + r.render))
    }
    spark.stop()
  }
}
