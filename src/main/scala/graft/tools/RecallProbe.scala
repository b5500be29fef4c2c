package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Recall/latency probe for the deep-ANN serving configs on the synthetic
  * worst-case (uniform) vectors: flat PQ vs residual IVF-PQ at selectable
  * corpus size / m / k / shortlist. The tool that sizes the ann_deep bench
  * config (Bench.scala) — run as
  * `runMain graft.tools.RecallProbe [nVectors]`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[$cpus]").appName("recallprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val tmp = System.getProperty("java.io.tmpdir")
    val p = EmbGen.ensure(spark, n, s"$tmp/graft-emb-v1-$n")
    val emb = spark.read.parquet(p)
    val q = EmbGen.frame(spark, 1, dim).select("embedding").head().getSeq[Float](0)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (m <- Seq(16); k <- Seq(32, 256); sl <- Seq(500)) {
      // flat PQ
      val (cb, tTrain) = timed(Similarity.pqTrain(emb, "embedding", dim, m, k))
      val (_, tEnc) = timed(
        Similarity.pqEncode(emb, "vec_id", "embedding", dim, cb)
          .write.mode("overwrite").parquet(s"$tmp/graft-rp-flat"))
      val codes = spark.read.parquet(s"$tmp/graft-rp-flat")
      def flatRun() = Similarity.pqTopK(codes, emb, "vec_id", "embedding",
        cb, q, 20, sl).collect().map(_.getLong(0)).toSet
      flatRun() // warm
      val (ids, tQ) = timed(flatRun())
      println(f"flat    m=$m k=$k sl=$sl recall=${(ids & brute).size}/20 " +
        f"train=$tTrain%.1f enc=$tEnc%.1f query=$tQ%.2f")
      // residual IVF-PQ, exhaustive probe (scan all cells: same scan size
      // as flat — isolates the encoding improvement from cell pruning)
      for (nCells <- Seq(64)) {
        val ((ix, cents, icb), tBuild) = timed(Similarity.ivfPqIndex(
          emb, "vec_id", "embedding", dim, nCells, m, k))
        val (_, tEnc2) = timed(
          ix.write.mode("overwrite").parquet(s"$tmp/graft-rp-ivf"))
        val icodes = spark.read.parquet(s"$tmp/graft-rp-ivf")
        for (nProbe <- Seq(nCells, nCells / 4)) {
          def run() = Similarity.ivfPqTopK(icodes, emb, "vec_id",
            "embedding", cents, icb, q, 20, nProbe, sl)
            .collect().map(_.getLong(0)).toSet
          run() // warm
          val (rids, rtQ) = timed(run())
          println(f"ivfpq   m=$m k=$k sl=$sl cells=$nCells probe=$nProbe " +
            f"recall=${(rids & brute).size}/20 build=$tBuild%.1f " +
            f"enc=$tEnc2%.1f query=$rtQ%.2f")
        }
      }
    }
    spark.stop()
  }
}
