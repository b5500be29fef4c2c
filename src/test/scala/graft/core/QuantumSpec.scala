package graft.core

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit
import graft.SparkSpec
import graft.pql.Pql
import org.apache.spark.sql.functions._

/** Time-quantum semantics — `reference/time.go:74-225`. */
class QuantumSpec extends SparkSpec {

  test("quantizeRange snaps outward to the finest unit") {
    val f = LocalDateTime.parse("2024-01-05T10:30:15")
    val t = LocalDateTime.parse("2024-01-20T13:30:00")
    assert(Quantum.quantizeRange(f, t, "YMDH") ==
      (LocalDateTime.parse("2024-01-05T10:00"), LocalDateTime.parse("2024-01-20T14:00")))
    assert(Quantum.quantizeRange(f, t, "YMD") ==
      (LocalDateTime.parse("2024-01-05T00:00"), LocalDateTime.parse("2024-01-21T00:00")))
    assert(Quantum.quantizeRange(f, t, "M") ==
      (LocalDateTime.parse("2024-01-01T00:00"), LocalDateTime.parse("2024-02-01T00:00")))
    assert(Quantum.quantizeRange(f, t, "Y") ==
      (LocalDateTime.parse("2024-01-01T00:00"), LocalDateTime.parse("2025-01-01T00:00")))
  }

  test("exact boundaries are not widened") {
    val f = LocalDateTime.parse("2024-01-05T10:00")
    val t = LocalDateTime.parse("2024-01-20T14:00")
    assert(Quantum.quantizeRange(f, t, "YMDH") == (f, t))
    assert(Quantum.finestUnit("D") == ChronoUnit.DAYS)
  }

  test("Row with from/to filters on the hour-quantized range") {
    val events = Tables.load(spark, sfDir, "events")
    val got = Pql.run(spark, sfDir, "events",
      "Count(Row(event_type='purchase', from='2024-01-05T10:30', to='2024-01-20T13:30'))")
      .head.getLong(0)
    val want = events.filter(col("event_type") === "purchase" &&
      col("ts") >= lit(java.time.Instant.parse("2024-01-05T10:00:00Z")) &&
      col("ts") < lit(java.time.Instant.parse("2024-01-20T14:00:00Z"))).count()
    assert(got == want)
  }

  test("RANGEQ over the nested quantum-set representation") {
    Tables.registerAll(spark, sfDir)
    graft.sql.Functions.register(spark)
    val got = spark.sql("SELECT count(*) AS cnt FROM user_events WHERE " +
      "RANGEQ(types, '2024-03-05T10:30', '2024-03-10T13:30')").head.getLong(0)
    val want = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= lit(java.time.Instant.parse("2024-03-05T10:00:00Z")) &&
        col("ts") < lit(java.time.Instant.parse("2024-03-10T14:00:00Z")))
      .select("user_id").distinct().count()
    assert(got == want)
  }

  test("membersInRange filters and projects quantum set members") {
    val ue = Tables.userEvents(spark, sfDir)
    val f = LocalDateTime.parse("2024-03-05T10:30")
    val t = LocalDateTime.parse("2024-03-10T13:30")
    val got = ue.select(col("_id"),
        explode(Quantum.membersInRange(col("types"), f, t)).as("val"))
      .distinct().count()
    val want = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= lit(java.time.Instant.parse("2024-03-05T10:00:00Z")) &&
        col("ts") < lit(java.time.Instant.parse("2024-03-10T14:00:00Z")))
      .select("user_id", "event_type").distinct().count()
    assert(got == want)
  }
}
