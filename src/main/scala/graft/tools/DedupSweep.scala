package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Dedup

/** One-point dedup pipeline timing under a chosen shuffle-partition count —
  * the knob-sweep companion to [[MinhashProbe]] (which cuts stages). Used to
  * attribute a scale-step's super-linearity: re-run the same corpus under
  * different partition counts / driver heaps (`SPARK_DRIVER_MEM`) and
  * compare.
  *
  * args: <parquet path> [runs=2]; env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE.
  */
object DedupSweep {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(sys.error("usage: DedupSweep <parquet> [runs]"))
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = graft.core.EngineConf(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mem = Runtime.getRuntime.maxMemory() / (1L << 30)
    println(s"[sweep] path=$path cpus=$cpus parts=$parts heapGiB=$mem")
    def dropCheckpoints(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    (1 to runs + 1).foreach { i =>
      val t0 = System.nanoTime()
      Dedup.minhashPairs(
        Dedup.shingledPosting(spark.read.parquet(path), "doc_id", "text",
          layoutById = true), 0.5)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] run$i ${t}%.2fs" + (if (i == 1) " (warm)" else ""))
      dropCheckpoints()
    }
    spark.stop()
  }
}
