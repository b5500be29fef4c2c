package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the r15 InferFiltersFromGenerate exclusion on the 1B able
  * hc-GroupBy (the one plan whose shape the exclusion changes at that
  * scale): interleaved legs, min-of-2 per leg, one JVM.
  *
  *   runMain graft.tools.RuleAbProbe [ablePath] [legsPerSide]
  */
object RuleAbProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-able-v5-1000000000")
    val legs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(path)
    def run1(): Double = {
      val t = System.nanoTime()
      new graft.pql.Compiler(df).run(graft.pql.Parser.parseOne(
        "GroupBy(Rows(education_level), Rows(gender), " +
          "Rows(political_party), Rows(domain), aggregate=Sum(field=age))"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val key = "spark.sql.optimizer.excludedRules"
    val excluded = spark.conf.get(key) // EngineConf's value
    run1() // warm (cache the 26 GB as far as the box allows)
    (1 to legs).foreach { leg =>
      for ((label, v) <- Seq("excluded" -> excluded, "enabled" -> "")) {
        spark.conf.set(key, v)
        val ts = (1 to 2).map(_ => run1())
        println(f"RULEAB leg=$leg $label min=${ts.min}%.1f " +
          f"runs=${ts.map(t => f"$t%.1f").mkString(",")}")
      }
    }
    spark.conf.set(key, excluded)
    spark.stop()
  }
}
