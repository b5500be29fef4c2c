package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.index.GroupIndex
import org.apache.spark.sql.functions._

/** Time-quantum group keys riding the grouped index: `GROUP BY
  * date_trunc(unit, ts)` resolves structurally to the build's reserved
  * `__q_<unit>_<ts>` column (the reference's time-quantum views,
  * `time.go:74-225`), with timezone-skew and raw-ts-filter declines. */
class QuantumIndexSpec extends SparkSpec {

  private def setup(): (String, String) = {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_quantum_spec")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val q = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(q)),
      Seq(q.name, "event_type"), Seq("value"), s"$root/g")
    (fact, s"$root/g")
  }

  /** Through Cols.dateTrunc (native TruncTimestamp) — the SQL name
    * `date_trunc` may be shadowed by the dialect registry when other
    * suites ran first on the shared session. */
  private def hourly(fact: String) =
    spark.read.parquet(fact)
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("h", "event_type")

  test("GROUP BY date_trunc('hour', ts) is served from the quantum index, " +
    "fact table unread") {
    val (fact, idx) = setup()
    val q = GroupIndex.Quantum("ts", "hour")
    IndexCatalog.registerGroup(fact, Seq(q.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(idx),
      quantums = Map(q.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    val served = hourly(fact)
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    // baseline under the kill-switch: the direct aggregation would itself
    // be index-served otherwise (a tautological compare)
    spark.conf.set("spark.graft.indexRewrite", "false")
    val want = try spark.read.parquet(fact)
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .orderBy("h", "event_type").collect()
    finally spark.conf.unset("spark.graft.indexRewrite")
    val got = served.collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.get(0) == w.get(0) && g.getString(1) == w.getString(1) &&
        g.getLong(2) == w.getLong(2), s"$g vs $w")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) <=
        1e-9 * math.max(1.0, math.abs(w.getDouble(3))), s"$g vs $w")
    }
    // a different unit does not match (the key name embeds the unit)
    val daily = spark.read.parquet(fact)
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type")).agg(count(lit(1)))
    assert(daily.queryExecution.executedPlan.toString.contains("/fact"),
      "day-quantum query must not ride an hour-quantum index")
    // a WHERE on the raw ts must decline (it bounds rows, not buckets)
    val filtered = spark.read.parquet(fact)
      .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)))
    assert(filtered.queryExecution.executedPlan.toString.contains("/fact"),
      "raw-ts filter must keep the fact scan")
    IndexCatalog.clear()
  }

  test("a timezone skew between build and query declines") {
    val (fact, idx) = setup()
    val q = GroupIndex.Quantum("ts", "hour")
    // registration claims the index was built under a DIFFERENT tz than the
    // session queries with — same-name key, different bucketing → decline
    IndexCatalog.registerGroup(fact, Seq(q.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(idx),
      quantums = Map(q.name -> "America/New_York"))
    IndexRewrite.install(spark)
    assert(hourly(fact).queryExecution.executedPlan.toString.contains("/fact"),
      "tz-skewed quantum index must not serve")
    IndexCatalog.clear()
  }
}
