package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity
/** Recall probe for the PQ ANN path: sweeps (m subspaces, k centroids,
  * shortlist) over the sf0.01 embeddings and prints top-20 recall vs brute
  * force — the tool that sized PipelineSpec's PQ recall bound. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(SparkSession.builder().master("local[8]")
      .appName("pqprobe").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 20, Some(0L))
      .collect().map(_.getLong(0)).toSet
    for (m <- Seq(4, 8, 16); k <- Seq(16, 32, 64); sl <- Seq(60, 100)) {
      val cb = Similarity.pqTrain(emb, "embedding", 64, m, k)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", 64, cb)
      val got = Similarity.pqTopK(codes, emb, "vec_id", "embedding", cb, q, 20, sl, Some(0L))
        .collect().map(_.getLong(0)).toSet
      println(s"m=$m k=$k sl=$sl recall=${(got & brute).size}/20")
    }
    spark.stop()
  }
}
