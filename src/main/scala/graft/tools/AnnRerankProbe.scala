package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan + timing evidence for the r15 ANN rerank change: with a
  * serving-sized shortlist, [[graft.functions.Similarity.pqTopK]] attaches
  * the shortlist ids to the raw-vector scan as a pushable `isin` instead of
  * a broadcast join, so the rerank reads candidate pages instead of the
  * corpus. Writes the production-shaped (shortlist=500) rerank plan to
  * `<outDir>/ann_rerank_<suffix>.txt` and prints warm+timed serve seconds.
  *
  *   runMain graft.tools.AnnRerankProbe <embPath> <outDir> <suffix> [shortlist]
  */
object AnnRerankProbe {
  def main(args: Array[String]): Unit = {
    val embPath = args(0)
    val outDir = new java.io.File(args(1)); outDir.mkdirs()
    val suffix = args(2)
    val shortlist = args.lift(3).map(_.toInt).getOrElse(500)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity
    val tmp = System.getProperty("java.io.tmpdir")
    // idempotent: paths named like the bench's EmbGen caches regenerate
    // in place when absent (args may name a count-suffixed cache path)
    "-(\\d+)$".r.findFirstMatchIn(embPath).foreach { m =>
      graft.tools.EmbGen.ensure(spark, m.group(1).toLong, embPath): Unit
    }
    val emb = spark.read.parquet(embPath)
    val dim = 64
    val q = graft.tools.EmbGen.frame(spark, 1, dim)
      .select("embedding").head().getSeq[Float](0)
    val codesPath = s"$tmp/graft-pqcodes-probe"
    val (codesDf, cents, cb) = Similarity.ivfPqIndex(
      emb, "vec_id", "embedding", dim, nCells = 64, m = 16, k = 256)
    codesDf.write.mode("overwrite").parquet(codesPath)
    def pq(): org.apache.spark.sql.DataFrame =
      Similarity.ivfPqTopK(spark.read.parquet(codesPath), emb,
        "vec_id", "embedding", cents, cb, q, 20, nProbe = 64,
        shortlist = shortlist)
    // plan of the final (rerank) query — the isin must appear in
    // PushedFilters of the embedding scan
    val plan = pq().queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val f = new java.io.File(outDir, s"ann_rerank_$suffix.txt")
    val w = new java.io.PrintWriter(f, "UTF-8"); try w.write(plan) finally w.close()
    println(s"[annprobe] wrote ${f.getPath}")
    def timed(): Double = {
      val t0 = System.nanoTime()
      pq().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val runs = (1 to 4).map(_ => timed())
    println(f"[annprobe] shortlist=$shortlist pq_serve warm+timed=" +
      runs.map(t => f"$t%.2f").mkString(","))
    spark.stop()
  }
}
