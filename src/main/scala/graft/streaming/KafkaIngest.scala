package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka ingest parity with the reference's IDK consumer
  * (`reference/idk/kafka/`, source contract `reference/idk/interfaces.go:46-69`).
  *
  * The IDK pipeline is: Kafka record → schema-directed field decode
  * (`interfaces.go:106` Field taxonomy: IDField, StringField, IntField,
  * DecimalField, TimestampField (epoch + unit d/h/m/s/ms/us/ns,
  * `interfaces.go:328-406`), BoolField, StringArrayField, IDArrayField,
  * DateIntField) → batch → import; `Record.Commit()` persists offsets for
  * at-least-once delivery.
  *
  * Spark-native equivalent: `readStream.format("kafka")` → `from_json` over
  * `value` with the wire schema derived from the same field taxonomy → typed
  * conversions (epoch-unit → TIMESTAMP, scaled int → DECIMAL) → the existing
  * [[Ingest.startUpsert]] sink. Offset tracking is the stream checkpoint —
  * exactly-once to the sink, strictly stronger than IDK's Commit().
  *
  * Everything after `.load()` is source-agnostic: [[decode]] takes any
  * DataFrame with a `value` column (Kafka's binary, a file stream's string,
  * a MemoryStream in tests) — the transform under test IS the production
  * transform. The Kafka DataSource itself ships in the
  * `spark-sql-kafka-0-10` connector jar (a deploy-time classpath addition;
  * not bundled in this offline container, so [[source]] is exercised down to
  * the format string only).
  */
object KafkaIngest {

  /** One ingest field, mirroring the IDK taxonomy (`interfaces.go:119`).
    * @param typ   id | string | int | decimal | double | bool | timestamp |
    *              recordtime | dateint | stringset | idset | ignore
    * @param unit  timestamp epoch unit: d/h/m/s/ms/us/ns (`interfaces.go:329`)
    * @param epoch epoch origin for integer timestamps (default Unix epoch)
    * @param scale decimal scale (`DecimalField.Scale`) */
  case class IdkField(name: String, typ: String, unit: String = "s",
                      epoch: java.time.Instant = java.time.Instant.EPOCH,
                      scale: Int = 0)

  /** JSON wire type for a field — what `from_json` parses before the typed
    * conversion. Integer timestamps arrive as the raw epoch count. */
  private def wireType(f: IdkField): DataType = f.typ match {
    case "id" | "int" | "dateint"     => LongType
    case "string" | "recordtime"      => StringType
    case "decimal"                    => DecimalType(38, f.scale)
    case "double"                     => DoubleType
    case "bool"                       => BooleanType
    case "timestamp"                  => LongType // epoch count in `unit`
    case "stringset"                  => ArrayType(StringType)
    case "idset"                      => ArrayType(LongType)
    case "ignore"                     => StringType
    case other => sys.error(s"unknown IDK field type '$other'")
  }

  def wireSchema(fields: Seq[IdkField]): StructType =
    StructType(fields.map(f => StructField(f.name, wireType(f))))

  /** Typed conversion from the parsed wire column (`PilosafyVal` semantics:
    * epoch+unit integer timestamps `interfaces.go:410-418`, RFC3339 strings
    * for RecordTimeField `interfaces.go:449-471`). */
  private def convert(f: IdkField, c: Column): Column = f.typ match {
    case "timestamp"  => graft.core.TimeUnits.epochToTimestamp(c, f.unit, f.epoch)
    case "recordtime" => to_timestamp(c) // RFC3339 layout default
    case _ => c
  }

  /** Decode a stream of raw records into typed rows: `value` (binary or
    * string JSON) → `from_json(wireSchema)` → per-field typed conversion.
    * Unparseable records yield null fields (IDK logs-and-skips; filter on a
    * required id downstream). Source-agnostic — this is the whole transform
    * between the Kafka socket and the upsert sink. */
  def decode(raw: DataFrame, fields: Seq[IdkField]): DataFrame = {
    val parsed = raw.select(
      from_json(col("value").cast(StringType), wireSchema(fields)).as("r"))
      .select(col("r.*"))
    typedProjection(parsed, fields)
  }

  /** The shared post-wire conversion: wire-schema columns → typed columns.
    * Used by the JSON path above and the Avro path ([[AvroIngest]]). */
  private[streaming] def typedProjection(parsed: DataFrame,
                                         fields: Seq[IdkField]): DataFrame = {
    val kept = fields.filter(_.typ != "ignore")
    parsed.select(kept.map(f => convert(f, col(f.name)).as(f.name)): _*)
  }

  /** The production source: Kafka topic → decoded typed stream. Requires the
    * spark-sql-kafka-0-10 connector on the classpath. */
  def source(spark: SparkSession, bootstrapServers: String, topic: String,
             fields: Seq[IdkField],
             startingOffsets: String = "earliest"): DataFrame =
    decode(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      fields)

  /** File-compatible stand-in exercising the identical decode: a text-file
    * stream of JSON lines is exactly Kafka's `value` column. Used by tests
    * and the `stream_kafka` correctness entry. */
  def fileCompatSource(spark: SparkSession, path: String,
                       fields: Seq[IdkField]): DataFrame =
    decode(spark.readStream.text(path), fields)
}
