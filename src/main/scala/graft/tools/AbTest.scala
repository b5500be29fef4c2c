package graft.tools

import org.apache.spark.sql.SparkSession

/** Conf A/B harness: times named bench queries with a runtime SQL conf
  * toggled true/false twice each (interleaved, min-of-3 per leg) in ONE
  * JVM, so a proposed engine-wide conf can be attributed or acquitted on
  * the spot. Round-10 use: acquitted forceOptimizeSkewedJoin of the
  * headline drift (≤8%, inconsistent sign — box noise).
  *
  *   runMain graft.tools.AbTest <confKey> <benchQuery...>
  */
object AbTest {
  def main(args: Array[String]): Unit = {
    val conf = args(0)
    val names = args.drop(1)
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run1(name: String): Double = {
      val fn = graft.SparkEntry.benchQueries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // restore the ENGINE-applied value after the legs, not the session
    // default — unset() would silently drop an EngineConf-set conf for
    // every later query in the loop
    val before = spark.conf.getOption(conf)
    for (name <- names) {
      run1(name); run1(name) // warm
      for (v <- Seq("true", "false", "true", "false")) {
        spark.conf.set(conf, v)
        val ts = (1 to 3).map(_ => run1(name))
        println(f"ABTEST $name $conf=$v min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      before match {
        case Some(v) => spark.conf.set(conf, v)
        case None    => spark.conf.unset(conf)
      }
    }
    spark.stop()
  }
}
