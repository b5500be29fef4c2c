package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Dedup

/** Incremental near-duplicate filtering at ingest — the 100-TB dedup
  * pattern. A corpus is not re-paired when documents arrive; each
  * micro-batch is checked against a PERSISTENT shingle inverted index of
  * everything seen so far, duplicates are dropped at the door, and the
  * index grows by exactly the batch. Per-batch cost is
  * (batch posting) ⋈ (store posting on shingle hash) — driven by the batch
  * size and shingle selectivity, never by corpus pair count.
  *
  * Semantics (deterministic, oracle-replayable): a document is DROPPED iff
  * its exact n-gram Jaccard with any EARLIER-SEEN document reaches the
  * threshold — earlier batches, or lower-id docs of its own batch. "Seen"
  * includes docs that were themselves dropped (the whole batch enters the
  * index), so chained near-dups (B≈A, C≈B, C̸≈A) all collapse onto the
  * first arrival: with id-ordered arrival the kept set is exactly
  * `id NOT IN (SELECT b FROM pairs)` over the corpus pair list — a plain
  * SQL oracle, no recursion.
  *
  * Scale notes: the store here is appended parquet; production is the same
  * two tables as Delta, BUCKETED BY the shingle hash so the per-batch
  * candidate join co-locates without shuffling the store, plus a
  * precomputed stop-shingle list (the [[Dedup.jaccardPairs]] `maxDocFreq`
  * guard, maintained as corpus stats) so no hot shingle makes a batch
  * quadratic. An LSH signature store (1 row/doc vs ~hundreds) is the swap
  * when posting storage dominates; the verify join shape is unchanged.
  */
object DedupIngest {

  /** One micro-batch through the online filter. Adds the FULL batch to the
    * posting/sizes store, writes surviving docs to `outDir`.
    *
    * Idempotent under foreachBatch's at-least-once replay: every write is an
    * OVERWRITE of a `batch=<id>` partition (a replayed batch replaces its
    * own half-written partitions instead of appending duplicates), and the
    * store read EXCLUDES this batch's own partition — present only if a
    * prior attempt crashed after its store write — so a replay can never
    * self-match the batch at Jaccard 1 or double intersection counts. */
  def dedupBatch(postingDir: String, sizesDir: String, outDir: String,
                 idCol: String, textCol: String, threshold: Double)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // (id, hs): distinct-shingle posting of the batch, 8-byte hashed keys —
    // three consumers (store join, within-batch join, index append)
    val postingB = graft.core.Materialize.stable(
      Dedup.shingledPosting(batch, idCol, textCol)
        .select(col("id"), xxhash64(col("s")).as("hs")))
    val sizesB = postingB.groupBy("id").agg(count(lit(1)).as("n"))
    // Path API, not java.io.File — the state dirs live on whatever
    // filesystem the production deployment uses (HDFS/S3), where a local
    // File.exists() is silently always-false
    val rootPath = new org.apache.hadoop.fs.Path(postingDir)
    val storeExists = rootPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(rootPath)
    def readStore(dir: String) =
      spark.read.parquet(dir).filter(col("batch") =!= batchId)
    // candidates vs the store (inverted-index join on hs; store ids are all
    // earlier-seen) plus within-batch lower-id pairs
    val inBatch = postingB.as("a")
      .join(postingB.as("b"),
        col("a.hs") === col("b.hs") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
    val cand =
      if (storeExists)
        readStore(postingDir).select(col("id").as("ida"), col("hs"))
          .join(postingB.withColumnRenamed("id", "idb"), "hs")
          .select("ida", "idb")
          .unionByName(inBatch)
      else inBatch
    val inter = cand.groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
    val sizes =
      if (storeExists)
        readStore(sizesDir).select("id", "n").unionByName(sizesB)
      else sizesB
    val dropped = inter
      .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("n", "na"), "ida")
      .join(sizesB.withColumnRenamed("id", "idb").withColumnRenamed("n", "nb"), "idb")
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= threshold)
      .select(col("idb").as(idCol)).distinct()
    batch.join(dropped, Seq(idCol), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // the WHOLE batch becomes "seen" — kept and dropped alike
    postingB.write.mode("overwrite").parquet(s"$postingDir/batch=$batchId")
    sizesB.write.mode("overwrite").parquet(s"$sizesDir/batch=$batchId")
  }

  /** Start the online-dedup ingest loop over a streaming source of
    * (idCol, textCol) documents. */
  def start(stream: DataFrame, stateDir: String, outDir: String,
            checkpointDir: String, idCol: String, textCol: String,
            threshold: Double): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        dedupBatch(s"$stateDir/posting", s"$stateDir/sizes", outDir,
          idCol, textCol, threshold)(b, id))
      .trigger(Trigger.AvailableNow())
      .start()
}
