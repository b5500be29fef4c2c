package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot scale probe for exact-substring dedup at corpus sizes beyond
  * the per-round bench's two points: runs the full
  * [[graft.functions.Dedup.substringDedup]] pipeline over DocGen corpora
  * and prints warm-then-timed seconds per point.
  *
  * `runMain graft.tools.SubstringProbe [nBase] [points] [runs]`
  */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(50000L)
    val points = args.lift(1).map(_.toInt).getOrElse(3)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-substring-probe")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val counts = (0 until points).map(i => nBase * math.pow(10, i).toLong)
    def partsFor(n: Long): Int =
      math.min(1024L, math.max(cpus.toLong, n / 80000L)).toInt
    val results = counts.map { n =>
      val p = DocGen.ensure(spark, n, s"$tmp/graft-docs-v2-$n")
      spark.conf.set("spark.sql.shuffle.partitions", partsFor(n).toString)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.functions.Dedup.substringDedup(
            spark.read.parquet(p), "doc_id", "text", 5)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        t
      }
      println(f"[substring] n=$n%d runs=${ts.map(t => f"$t%.1f").mkString(",")}")
      n -> ts
    }
    results.sliding(2).foreach { case Seq((a, ta), (b, tb)) =>
      println(f"[substring] step ${a}->${b}: ${tb.drop(1).min / ta.drop(1).min}%.2f")
    case _ => ()
    }
    spark.stop()
  }
}
