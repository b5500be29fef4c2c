package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the r16 collision-free dictionary-encoded grouping on the 1B able
  * hc-GroupBy (the 4-string-key HashAggregate over ~3B post-explode rows
  * that ScanProbe adjudicated: string keys 43.7–50.3 s, UNSOUND xxhash64
  * keys 27.5–28.9 s). Interleaved legs, min-of-2 per leg, one JVM, plus a
  * result-equality check between the two plans on every leg.
  *
  *   runMain graft.tools.DictAbProbe [ablePath] [legsPerSide]
  */
object DictAbProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-able-v5-1000000000")
    val legs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(path)
    def q = new graft.pql.Compiler(df).run(graft.pql.Parser.parseOne(
      "GroupBy(Rows(education_level), Rows(gender), " +
        "Rows(political_party), Rows(domain), aggregate=Sum(field=age))"))
    def run1(): Double = {
      val t = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val key = "spark.graft.groupby.dictEncode"
    // label fidelity first: identical result rows under both plans
    spark.conf.set(key, "true")
    val dictRows = q.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val dictPlan = q.queryExecution.executedPlan.toString
    require(dictPlan.contains("dict_encode"),
      "dict rewrite did not fire on the probe query:\n" + dictPlan)
    spark.conf.set(key, "false")
    val strRows = q.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    require(dictRows.length == strRows.length &&
      dictRows.zip(strRows).forall(p => p._1 == p._2),
      s"DICT/string results differ: ${dictRows.length} vs ${strRows.length} rows")
    println(s"DICTAB fidelity OK: ${dictRows.length} identical combos")
    run1() // warm
    (1 to legs).foreach { leg =>
      for ((label, v) <- Seq("dict" -> "true", "string" -> "false")) {
        spark.conf.set(key, v)
        val ts = (1 to 2).map(_ => run1())
        println(f"DICTAB leg=$leg $label min=${ts.min}%.1f " +
          f"runs=${ts.map(t => f"$t%.1f").mkString(",")}")
      }
    }
    spark.conf.set(key, "true")
    spark.stop()
  }
}
