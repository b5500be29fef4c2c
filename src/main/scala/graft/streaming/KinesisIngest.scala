package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import KafkaIngest.IdkField

/** Kinesis IDK consumer (`reference/idk/kinesis/source.go`): Kinesis
  * records carry JSON payloads (`source.go:81,110` json.Unmarshal of
  * `msg.Data`) decoded against the same IDK field taxonomy as Kafka — the
  * reference shares the whole post-wire pipeline between the two, and so do
  * we: [[decode]] is [[KafkaIngest.decode]] applied to the connector's
  * `data` column.
  *
  * The Kinesis DataSource itself (`spark-sql-kinesis` / Kinesis EFO
  * connector, format `"aws-kinesis"`) is a deploy-time classpath addition
  * like the Kafka connector — not bundled in this offline container, so
  * [[source]] is exercised down to the format string only while the decode
  * transform (the part with semantics) is fully tested via file-compatible
  * streams. Checkpointed offsets subsume the reference's
  * `Record.Commit()`/shard-iterator persistence. */
object KinesisIngest {

  /** Kinesis connector output → typed rows: the record payload column
    * (`data`, binary JSON) through the shared IDK decode. */
  def decode(raw: DataFrame, fields: Seq[IdkField]): DataFrame =
    KafkaIngest.decode(
      raw.select(col("data").cast(StringType).as("value")), fields)

  /** Production source: a Kinesis stream → decoded typed stream. Requires a
    * Kinesis connector on the classpath (format `aws-kinesis`). */
  def source(spark: SparkSession, streamName: String, region: String,
             fields: Seq[IdkField],
             startingPosition: String = "TRIM_HORIZON"): DataFrame =
    decode(
      spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", streamName)
        .option("kinesis.region", region)
        .option("kinesis.startingPosition", startingPosition)
        .load(),
      fields)

  /** File-compatible stand-in exercising the identical decode: a text-file
    * stream of JSON lines stands in for the record payloads. */
  def fileCompatSource(spark: SparkSession, path: String,
                       fields: Seq[IdkField]): DataFrame =
    decode(spark.readStream.text(path).select(col("value").as("data")), fields)
}
