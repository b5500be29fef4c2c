package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot deep-scale probe for the PQ ANN serving path beyond the
  * per-round bench's 1M/10M points: generate n synthetic vectors, build
  * the code table once, then time brute-force cosine top-k vs the ADC
  * scan + exact rerank, reporting recall and the scanned byte asymmetry.
  *
  * `runMain graft.tools.AnnProbe [nVectors] [timedRuns]`
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val timed = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-ann-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity
    val tmp = System.getProperty("java.io.tmpdir")
    val dim = 64
    val t0 = System.nanoTime()
    val path = EmbGen.ensure(spark, n, s"$tmp/graft-emb-v1-$n")
    val genSec = (System.nanoTime() - t0) / 1e9
    val emb = spark.read.parquet(path)
    val q = EmbGen.frame(spark, 1, dim).select("embedding").head().getSeq[Float](0)
    val t1 = System.nanoTime()
    val cb = Similarity.pqTrain(emb, "embedding", dim, m = 16, k = 32)
    val codesPath = s"$tmp/graft-pqcodes-$n"
    Similarity.pqEncode(emb, "vec_id", "embedding", dim, cb)
      .write.mode("overwrite").parquet(codesPath)
    val buildSec = (System.nanoTime() - t1) / 1e9
    def size(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    def brute(): Double = {
      val t = System.nanoTime()
      Similarity.cosineTopK(emb, "vec_id", "embedding", q, 20)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    def pq(): Double = {
      val t = System.nanoTime()
      Similarity.pqTopK(spark.read.parquet(codesPath), emb, "vec_id",
          "embedding", cb, q, 20, shortlist = 500)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val runs = (0 to timed).map(_ => (brute(), pq()))
    val bruteIds = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val pqIds = Similarity.pqTopK(spark.read.parquet(codesPath), emb,
        "vec_id", "embedding", cb, q, 20, shortlist = 500)
      .collect().map(_.getLong(0)).toSet
    def f(d: Double) = java.lang.String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"tool":"ann_probe","vectors":$n,"gen_sec":${f(genSec)},""" +
      s""""build_sec":${f(buildSec)},"raw_bytes":${size(path)},""" +
      s""""code_bytes":${size(codesPath)},""" +
      s""""brute_runs":[${runs.map(r => f(r._1)).mkString(",")}],""" +
      s""""pq_runs":[${runs.map(r => f(r._2)).mkString(",")}],""" +
      s""""recall_at_20":${(pqIds & bruteIds).size}}""")
    spark.stop()
  }
}
