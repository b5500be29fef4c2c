package graft.core

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-quantum semantics (`reference/time.go:74-225`).
  *
  * The reference stores time-quantum fields as one view per granularity unit
  * (`standard_2024`, `standard_202401`, …) and answers `from=`/`to=` queries by
  * unioning the minimal covering set of views (`viewsByTimeRange`,
  * `reference/time.go:158-225`). The observable semantics of that view
  * selection: the effective range is the query range SNAPPED OUTWARD to the
  * quantum's finest unit —
  *
  *   [floor(from, finest), ceil(to, finest))
  *
  * (walk-up starts at `from`'s unit boundary and each emitted view covers its
  * whole unit; the walk emits a final unit-view whenever `t < to`). We
  * replicate by quantizing the literal bounds driver-side, then filtering the
  * event-time column — Catalyst pushes both bounds into the parquet scan,
  * which at 100 TB prunes row-groups (and partitions, when the table is
  * date-partitioned) exactly like the reference prunes views.
  *
  * Quantum *set* fields (STRINGSETQ/IDSETQ, SURVEY §1.2) carry a timestamp per
  * member; we model them either exploded — a side table `(_id, value, ts)` —
  * or nested as `ARRAY<STRUCT<value, ts>>`, with [[Quantum.rangeq]] as the SQL
  * membership predicate (`reference/sql3/planner/inbuiltfunctionsquantum.go:43`).
  */
object Quantum {

  /** Finest granularity unit of a quantum spec like "YMDH" — view selection
    * snaps range bounds to this unit. */
  def finestUnit(quantum: String): ChronoUnit = {
    require(quantum.nonEmpty && quantum.forall("YMDH".contains(_)),
      s"bad time quantum: $quantum")
    if (quantum.contains('H')) ChronoUnit.HOURS
    else if (quantum.contains('D')) ChronoUnit.DAYS
    else if (quantum.contains('M')) ChronoUnit.MONTHS
    else ChronoUnit.YEARS
  }

  def floorTo(t: LocalDateTime, u: ChronoUnit): LocalDateTime = u match {
    case ChronoUnit.HOURS  => t.truncatedTo(ChronoUnit.HOURS)
    case ChronoUnit.DAYS   => t.truncatedTo(ChronoUnit.DAYS)
    case ChronoUnit.MONTHS => t.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
    case ChronoUnit.YEARS  => t.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
    case other             => sys.error(s"unsupported quantum unit $other")
  }

  def ceilTo(t: LocalDateTime, u: ChronoUnit): LocalDateTime = {
    val f = floorTo(t, u)
    if (f == t) t else f.plus(1, u)
  }

  /** Quantize [from, to) outward to the quantum's finest unit. */
  def quantizeRange(from: LocalDateTime, to: LocalDateTime, quantum: String)
      : (LocalDateTime, LocalDateTime) = {
    val u = finestUnit(quantum)
    (floorTo(from, u), ceilTo(to, u))
  }

  def utc(t: LocalDateTime): java.time.Instant =
    t.atOffset(java.time.ZoneOffset.UTC).toInstant

  /** Parse a PQL/SQL time literal: '2024-01-05', '2024-01-05T10:30',
    * '2024-01-05T10:30:00', with optional trailing zone offset
    * ('…T00:00:00Z', reference literal style) normalized to UTC. */
  def parseLdt(s: String): LocalDateTime = {
    val t = s.replace(' ', 'T')
    if (t.exists(c => c == 'Z' || c == '+') || t.count(_ == '-') > 2)
      return java.time.OffsetDateTime.parse(t)
        .withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
    val full = t.length match {
      case 10 => t + "T00:00:00"
      case 13 => t + ":00:00"
      case 16 => t + ":00"
      case _  => t
    }
    LocalDateTime.parse(full)
  }

  /** Predicate: event-time column within the quantized range. */
  def rangePredicate(ts: Column, from: LocalDateTime, to: LocalDateTime,
      quantum: String): Column = {
    val (lo, hi) = quantizeRange(from, to, quantum)
    ts >= lit(utc(lo)) && ts < lit(utc(hi))
  }

  /** RANGEQ over a nested quantum set column `ARRAY<STRUCT<value, ts>>`:
    * does any member's timestamp fall in the quantized range?
    * (`reference/sql3/planner/inbuiltfunctionsquantum.go:43`,
    * PQL lowering `reference/sql3/planner/expressionpql.go:99-160`). */
  def rangeq(setCol: Column, from: LocalDateTime, to: LocalDateTime,
      quantum: String = "YMDH"): Column = {
    val (lo, hi) = quantizeRange(from, to, quantum)
    exists(setCol, m =>
      m.getField("ts") >= lit(utc(lo)) && m.getField("ts") < lit(utc(hi)))
  }

  /** Members of a nested quantum set column visible in the quantized range —
    * the per-record view behind `Rows(field, from=, to=)` on STRINGSETQ. */
  def membersInRange(setCol: Column, from: LocalDateTime, to: LocalDateTime,
      quantum: String = "YMDH"): Column = {
    val (lo, hi) = quantizeRange(from, to, quantum)
    array_distinct(transform(
      filter(setCol, m =>
        m.getField("ts") >= lit(utc(lo)) && m.getField("ts") < lit(utc(hi))),
      m => m.getField("value")))
  }
}
