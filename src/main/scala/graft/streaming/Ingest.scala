package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest parity (SURVEY.md §2.3).
  *
  * The reference's "real-time" capability is low-latency *ingest*, not a
  * streaming query engine: IDK consumers (Kafka/Kinesis/CSV,
  * `reference/idk/interfaces.go:46-69`) pull records, batch them
  * (`reference/batch/batch.go:83-99`), and import per-shard roaring fragments;
  * offset `Commit()` gives at-least-once with idempotent bit-set writes.
  * Data is queryable seconds after arrival; time-quantum views + TTL
  * (`reference/field.go:329-350`) handle event-time organization and age-out.
  *
  * Spark-native equivalents, all built on Structured Streaming:
  *   - source      → `readStream` (files here; on a cluster the Kafka swap is
  *                   `.format("kafka")` + `from_json(value)` — same DataFrame
  *                   from there on, nothing else changes);
  *   - Commit()    → checkpointLocation (exactly-once file sources / Kafka
  *                   offsets; strictly stronger than the reference's
  *                   at-least-once);
  *   - batch import→ `foreachBatch` upsert, latest-write-wins per `_id`
  *                   (mutex replace, `reference/field.go:352-365`);
  *   - quantum view→ watermarked event-time window aggregation — maintained
  *                   *incrementally* by the state store instead of being
  *                   re-derived per query;
  *   - TTL         → event-time filter job (Delta `DELETE WHERE` in prod).
  *
  * Scale notes (100 TB): the upsert here rewrites a parquet snapshot, which is
  * correct-but-local; on a cluster the same `foreachBatch` body becomes a
  * Delta/Iceberg MERGE keyed on `_id` (file-skipping bounds rewrite to touched
  * partitions). The windowed aggregation path is already scale-correct: state
  * is partitioned by group key across executors and watermarking bounds state
  * size; shuffle partitions should be sized to cluster cores.
  */
object Ingest {

  /** File-based streaming source over the BULK INSERT formats
    * (CSV/NDJSON/PARQUET, `reference/sql3/planner/compilebulkinsert.go:197`).
    * `maxFilesPerTrigger=1` makes micro-batches observable in tests. */
  def fileSource(spark: SparkSession, path: String, format: String,
      schema: StructType, maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(schema)
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r
    format.toUpperCase match {
      case "CSV"     => r2.option("header", "false").csv(path)
      case "NDJSON"  => r2.json(path)
      case "PARQUET" => r2.parquet(path)
      case other     => sys.error(s"unsupported stream format: $other")
    }
  }

  /** Upsert one micro-batch into a parquet-backed table: within the batch the
    * last record per id wins (Kafka offset order = arrival order; here the
    * caller supplies `orderCol`, e.g. the event timestamp), then batch rows
    * replace existing rows with the same id — the reference's mutex
    * replace-on-write. Prod: Delta `MERGE WHEN MATCHED UPDATE`. */
  def upsertBatch(spark: SparkSession, targetDir: String, idCol: String,
      orderCol: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val deduped = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col(orderCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val tgt = new java.io.File(targetDir)
    val next =
      if (tgt.exists()) {
        val existing = spark.read.parquet(targetDir)
        existing.join(deduped.select(idCol), Seq(idCol), "left_anti")
          .unionByName(deduped)
      } else deduped
    // local-FS snapshot swap; Delta MERGE replaces this block in prod
    val tmp = targetDir + ".tmp"
    next.write.mode("overwrite").parquet(tmp)
    val old = new java.io.File(targetDir + ".old")
    deleteRec(old)
    if (tgt.exists()) tgt.renameTo(old)
    new java.io.File(tmp).renameTo(tgt)
    deleteRec(old)
  }

  /** Start the ingest loop: stream → foreachBatch upsert. */
  def startUpsert(stream: DataFrame, targetDir: String, checkpointDir: String,
      idCol: String = "_id", orderCol: String = "_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        upsertBatch(b.sparkSession, targetDir, idCol, orderCol)(b, id))
      .trigger(Trigger.AvailableNow())
      .start()

  /** Incrementally-maintained time-quantum view (reference views
    * `standard_2023 / 202301 / …`, `reference/time.go:74-225`): watermarked
    * tumbling-window aggregate per (quantum bucket, key). State is bounded by
    * the watermark; at 100 TB this runs forever with finite state. */
  def quantumCounts(events: DataFrame, tsCol: String, keyCol: String,
      quantum: String, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), quantum).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("h"), col(keyCol), col("cnt"), col("sv"))

  /** TTL age-out (`reference/field.go:329-350` deletes expired quantum
    * views): keep records with event time ≥ now − ttl. Prod: Delta
    * `DELETE WHERE ts < now() - ttl` on an event-time-partitioned table, so
    * expiry is a metadata-only partition drop. */
  def ttlFilter(df: DataFrame, tsCol: String, cutoff: java.time.Instant): DataFrame =
    df.filter(col(tsCol) >= lit(cutoff))

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) { f.delete(); () }
  }

  /** Fresh scratch dir under /tmp for checkpoints/targets. */
  def scratch(name: String): String = {
    val d = new java.io.File(s"/tmp/graft_stream/$name")
    deleteRec(d)
    d.mkdirs()
    d.getAbsolutePath
  }
}
