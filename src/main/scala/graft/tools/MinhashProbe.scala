package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Stage-by-stage timing probe for the MinHash+LSH dedup pipeline at sf0.1.
  * Each stage runs twice, uncached; the second time is reported (JIT-warm,
  * matching Bench's warmup-then-time protocol). */
object MinhashProbe {

  /** The pipeline's cumulative stage cuts, each a full plan from the raw
    * docs (stage N's time includes stages < N, so per-stage growth between
    * two corpus sizes exposes which stage goes super-linear). Used by
    * [[graft.Bench]]'s dedup rehearsal and by this probe's main. */
  def stages(base: org.apache.spark.sql.DataFrame)
      : Seq[(String, () => org.apache.spark.sql.DataFrame)] = {
    def posting = Dedup.shingledPosting(base, "doc_id", "text", layoutById = true)
    Seq(
      "posting" -> (() => posting),
      "sig" -> (() => Dedup.minhashSignatures(posting, 128)),
      "cand" -> (() => Dedup.minhashCandidates(posting, 128, 64, 5000)),
      "full" -> (() => Dedup.minhashPairs(posting, 0.5)))
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = graft.core.EngineConf(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // raw:<path> probes an arbitrary (doc_id, text) parquet — e.g. the
    // DocGen rehearsal corpora — instead of a testdata sf dir
    val base =
      if (dir.startsWith("raw:")) spark.read.parquet(dir.stripPrefix("raw:"))
      else graft.core.Tables.load(spark, dir, "documents")
    println(s"[probe] docs=${base.count()}")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time2(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f)
      val t0 = System.nanoTime(); noop(f)
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    time2("posting")(Dedup.shingledPosting(base, "doc_id", "text", layoutById = true))
    time2("posting+sig")(Dedup.minhashSignatures(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 128))
    // NOTE: the banded stages run the checkpoint-FREE diagnostic path
    // (single consumer), so they undercount vs the cand/full stages which
    // pay the pipeline's posting+sig materializations
    time2("posting+sig+banded")(Dedup.minhashBanded(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 128, 64))
    time2("posting+sig+banded+sorted")(Dedup.minhashBanded(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 128, 64)
      .repartition(org.apache.spark.sql.functions.col("bk"))
      .sortWithinPartitions("bk", "id"))
    time2("posting+sig+cand")(Dedup.minhashCandidates(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 128, 64, 5000))
    time2("full")(Dedup.minhashPairs(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 0.5))
    time2("full2")(Dedup.minhashPairs(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 0.5))
    time2("full3")(Dedup.minhashPairs(
      Dedup.shingledPosting(base, "doc_id", "text", layoutById = true), 0.5))
    spark.stop()
  }
}
