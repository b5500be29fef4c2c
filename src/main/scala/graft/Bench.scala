package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes [[SparkEntry.benchQueries]] on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is executed once untimed (JVM/codegen/file-footer warmup —
  * otherwise the first query absorbs ~5s of session startup and the numbers
  * mis-attribute it), then timed. Timing materializes the full result via the
  * noop sink so limit-ended plans can't short-circuit.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val qs = SparkEntry.benchQueries.toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) => // warmup pass
      try exec(fn)
      catch { case e: Throwable => System.err.println(s"[bench-warm] $name: ${e.getMessage}") }
    }
    val results = qs.map { case (name, fn) =>
      // min of 2 timed runs: drops GC/compilation jitter on a shared box
      // without hiding real cost (both runs execute the full plan)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { exec(fn); true } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
