package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-field timestamp units (`reference/field.go:195-241`
  * OptFieldTypeTimestamp, units `reference/idk/interfaces.go:328-406`):
  * integer values of a timestamp field are an epoch offset counted in the
  * field's unit from the field's epoch origin. Shared by DDL (`TIMEUNIT`
  * column constraint) and the Kafka-wire ingest decode. */
object TimeUnits {

  /** Nanoseconds per unit (`interfaces.go:382-406` Unit.ToNanos). */
  def unitNanos(u: String): Long = u match {
    case "d"  => 86400L * 1000000000L
    case "h"  => 3600L * 1000000000L
    case "m"  => 60L * 1000000000L
    case "s"  => 1000000000L
    case "ms" => 1000000L
    case "us" => 1000L
    case "ns" => 1L
    case other => sys.error(s"unknown unit '$other', choose from d/h/m/s/ms/us/ns")
  }

  /** epoch + value·unit → TIMESTAMP, in long microseconds (exact for
    * d/h/m/s/ms/us; ns truncates to Spark's microsecond resolution). */
  def epochToTimestamp(c: Column, unit: String, epoch: java.time.Instant): Column = {
    val epochMicros = epoch.getEpochSecond * 1000000L + epoch.getNano / 1000L
    val nanos = unitNanos(unit)
    val micros =
      if (nanos >= 1000L) c.cast(LongType) * lit(nanos / 1000L) + lit(epochMicros)
      else (c.cast(LongType) / lit(1000L)).cast(LongType) + lit(epochMicros)
    timestamp_micros(micros)
  }
}
