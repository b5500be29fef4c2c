package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupIngestSpec extends SparkSpec {

  private def scratch3(): (String, String, String) = (
    Ingest.scratch("dedup_spec_state"),
    Ingest.scratch("dedup_spec_out") + "/kept",
    Ingest.scratch("dedup_spec_ckpt"))

  private def run(batches: Seq[Seq[(Long, String)]],
                  replayFirst: Boolean = false): Set[Long] = {
    import spark.implicits._
    val (state, out, _) = scratch3()
    batches.zipWithIndex.foreach { case (b, i) =>
      def once() = DedupIngest.dedupBatch(s"$state/posting", s"$state/sizes",
        out, "doc_id", "text", 0.5)(b.toDF("doc_id", "text"), i.toLong)
      once()
      // at-least-once replay: rerunning a batch must change nothing
      if (replayFirst && i == 0) once()
    }
    spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("online dedup drops near-dups across batches and within a batch") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val kept = run(Seq(
      Seq(1L -> a, 2L -> "totally different words here nothing shared at all"),
      // 3 ≈ doc 1 (earlier batch), 5 ≈ doc 4 (same batch, lower id earlier)
      Seq(3L -> a,
          4L -> "unique content for the fourth document in this stream",
          5L -> "unique content for the fourth document in this flow")))
    assert(kept == Set(1L, 2L, 4L))
  }

  test("chained near-dups collapse onto the first arrival") {
    // Trigram sets (12 words → 10 trigrams each): J(A,B)=9/11, J(B,C)=7/13
    // (≥0.5), but J(A,C)=6/14 (<0.5) — so C is dropped ONLY because B,
    // itself dropped, stayed in the seen-index. This is the load-bearing
    // check that the whole batch (kept AND dropped) enters the store.
    val A = "one two three four five six seven eight nine ten eleven twelve"
    val B = "one two three four five six seven eight nine ten eleven zulu"
    val C = "one two three four five six xray eight nine ten eleven zulu"
    val kept = run(Seq(Seq(10L -> A), Seq(20L -> B), Seq(30L -> C)))
    assert(kept == Set(10L))
  }

  test("batch replay is idempotent: rerunning a batch changes nothing") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val batches = Seq(
      Seq(1L -> a, 2L -> "totally different words here nothing shared at all"),
      Seq(3L -> a,
          4L -> "unique content for the fourth document in this stream"))
    assert(run(batches, replayFirst = true) == run(batches))
  }

  test("streamed file source processes id-ordered batches through the filter") {
    import spark.implicits._
    val (state, out, ckpt) = scratch3()
    val src = Ingest.scratch("dedup_spec_src")
    val d1 = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val d2 = Seq((2L, "the quick brown fox jumps over the lazy cat"),
                 (3L, "completely fresh sentence with no shared trigrams anywhere")).toDF("doc_id", "text")
    d1.coalesce(1).write.parquet(s"$src/b0.parquet")
    d2.coalesce(1).write.parquet(s"$src/b1.parquet")
    new java.io.File(s"$src/b0.parquet").listFiles().foreach(f => { f.setLastModified(1000000L); () })
    new java.io.File(s"$src/b1.parquet").listFiles().foreach(f => { f.setLastModified(2000000L); () })
    val stream = Ingest.fileSource(spark, src + "/*", "PARQUET", d1.schema,
      maxFilesPerTrigger = 1)
    DedupIngest.start(stream, state, out, ckpt, "doc_id", "text", 0.5)
      .awaitTermination()
    val kept = spark.read.parquet(out).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }
}
