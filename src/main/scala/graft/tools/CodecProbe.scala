package graft.tools

import org.apache.spark.sql.SparkSession

/** Shuffle-codec A/B leg: run the MinHash+LSH full pipeline (the engine's
  * shuffle-heaviest rehearsal shape) at one corpus point and print per-run
  * seconds plus the codec actually in effect. `spark.io.compression.codec`
  * is a static core conf, so each codec needs its own JVM:
  *
  *   SPARK_GC_OPTS="-XX:+UseParallelGC -Dspark.io.compression.codec=zstd" \
  *     sbt "runMain graft.tools.CodecProbe 5000000 3"
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val codec = spark.sparkContext.getConf
      .get("spark.io.compression.codec", "lz4(default)")
    val tmp = System.getProperty("java.io.tmpdir")
    val p = DocGen.ensure(spark, n, s"$tmp/graft-docs-v2-$n")
    val parts = math.min(1024L, math.max(cpus.toLong, n / 80000L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    def run1(): Double = {
      val t0 = System.nanoTime()
      graft.functions.Dedup.minhashPairs(
        graft.functions.Dedup.shingledPosting(
          spark.read.parquet(p), "doc_id", "text", layoutById = true), 0.5)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      t
    }
    val ts = (0 to runs).map(_ => run1()) // first = warm
    println(f"CODEC $codec n=$n warm+runs=${ts.map(t => f"$t%.1f").mkString(",")} " +
      f"min=${ts.drop(1).min}%.1f")
    spark.stop()
  }
}
