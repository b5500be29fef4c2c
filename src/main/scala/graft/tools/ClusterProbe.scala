package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal multi-JVM launch probe: brings a session up on
  * SPARK_GRAFT_MASTER (intended: `local-cluster[2,8,8192]`) and pushes the
  * engine's riskiest serialization surfaces across the executor boundary —
  * custom codegen'd expressions, roaring-buffer imperative aggregates, the
  * minhash signature aggregate, a BPE-encode fused expression, and an ivy
  * closure — printing one PROBE line per surface. Used to shake out
  * classloader/serialization issues before the full Verify sweep runs
  * under local-cluster.
  *
  *   SPARK_GRAFT_MASTER='local-cluster[2,8,8192]' sbt 'runMain graft.tools.ClusterProbe'
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineConf(graft.core.EngineConf.master(
      SparkSession.builder(), "local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    println(s"PROBE master=${spark.sparkContext.master} " +
      s"defaultParallelism=${spark.sparkContext.defaultParallelism}")

    var failures = 0
    def check(name: String)(body: => String): Unit =
      try println(s"PROBE $name OK $body")
      catch { case e: Throwable =>
        failures += 1
        println(s"PROBE $name FAIL ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(8).foreach(f => println(s"  at $f"))
      }

    // executors really are separate JVMs?
    check("jvms") {
      val pids = spark.sparkContext.parallelize(1 to 64, 16)
        .map(_ => ProcessHandle.current().pid()).distinct().collect().sorted
      s"executorPids=${pids.mkString(",")} driverPid=${ProcessHandle.current().pid()}"
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // custom codegen'd expressions: shingles → minhash agg → band keys
    check("minhash_pipeline") {
      val pairs = graft.functions.Dedup.minhashPairs(
        graft.functions.Dedup.shingledPosting(docs, "doc_id", "text"), 0.5)
      s"pairs=${pairs.count()}"
    }
    // roaring bitmap imperative aggregate + count expression
    check("roaring_agg") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val idx = graft.index.Bitmap.segmentIndex(li, "l_returnflag", "l_orderkey")
      val n = idx.select(graft.index.Bitmap.bitmapCount(col("bm")).as("c"))
        .agg(sum("c")).head().getLong(0)
      s"bits=$n"
    }
    // fused normalize expression (java.text.Normalizer inside codegen)
    check("normalize_text") {
      val n = docs.select(graft.functions.Text.normalizeText(
          concat(lit("  x́ "), col("text"))).as("t"))
        .agg(sum(length(col("t")))).head().getLong(0)
      s"chars=$n"
    }
    // fused BPE encode expression (per-thread state inside codegen)
    check("bpe_encode") {
      val merges = graft.functions.Text.bpeTrain(docs.limit(200), "text", 20)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
      val enc = graft.functions.Text.bpeEncode(docs.limit(200), "doc_id", "text", merges)
      s"rows=${enc.count()} merges=${merges.size}"
    }
    // ivy/APL closure crossing the boundary via the PQL compiler
    check("ivy_apply") {
      val r = graft.pql.Pql.run(spark, sf, "part",
        "Apply(Row(p_size > 40), 'p_size', '+/_')")
      s"rows=${r.count()}"
    }
    // IndexRewrite-substituted plan
    check("pq_adc") {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val dim = emb.select("embedding").head().getSeq[Float](0).size
      val cb = graft.functions.Similarity.pqTrain(emb, "embedding", dim, m = 4, k = 8)
      val codes = graft.functions.Similarity.pqEncode(emb, "vec_id", "embedding", dim, cb)
      val q = emb.select("embedding").head().getSeq[Float](0)
      val top = graft.functions.Similarity.pqTopK(codes, emb, "vec_id",
        "embedding", cb, q, 5, shortlist = 50)
      s"top=${top.count()}"
    }
    println("PROBE done")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
