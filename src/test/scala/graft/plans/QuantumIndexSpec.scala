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
    // a FINER unit than the index cannot serve (minute buckets are not
    // unions of hour buckets)
    val minutely = spark.read.parquet(fact)
      .groupBy(graft.core.Cols.dateTrunc("minute", col("ts")).as("m"),
        col("event_type")).agg(count(lit(1)))
    assert(minutely.queryExecution.executedPlan.toString.contains("/fact"),
      "minute-quantum query must not ride an hour-quantum index")
    // a COARSER unit rides it via rollup (separate spec below): day query
    // over the hour index is index-served since r12
    val daily = spark.read.parquet(fact)
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type")).agg(count(lit(1)))
    assert(!daily.queryExecution.executedPlan.toString.contains("/fact"),
      "day-quantum query should roll up from the hour-quantum index")
    // a STRICT-lower `>` on an aligned bound splits the edge bucket (all
    // of bucket t except the instant t) — bounds rows, not buckets: decline
    val filtered = spark.read.parquet(fact)
      .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)))
    assert(filtered.queryExecution.executedPlan.toString.contains("/fact"),
      "strict-lower raw-ts filter must keep the fact scan")
    IndexCatalog.clear()
  }

  /** Baseline collector under the rewrite kill-switch (the direct compare
    * would otherwise itself be index-served). */
  private def baseline(df: => org.apache.spark.sql.DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    spark.conf.set("spark.graft.indexRewrite", "false")
    try df.collect()
    finally spark.conf.unset("spark.graft.indexRewrite")
  }

  private def sameRows(got: Array[org.apache.spark.sql.Row],
                       want: Array[org.apache.spark.sql.Row]): Unit = {
    assert(got.length == want.length, s"${got.length} vs ${want.length} rows")
    got.zip(want).foreach { case (g, w) =>
      assert(g.length == w.length, s"$g vs $w")
      (0 until g.length).foreach { i => (g.get(i), w.get(i)) match {
        case (d: java.lang.Double, e: java.lang.Double) =>
          assert(math.abs(d - e) <= 1e-9 * math.max(1.0, math.abs(e)), s"$g vs $w")
        case (p, q) => assert(p == q, s"$g vs $w")
      }}
    }
  }

  test("quantum-ALIGNED time-range bounds transfer onto the index column " +
    "(viewsByTimeRange semantics); non-aligned and edge-splitting bounds " +
    "decline") {
    val (fact, idx) = setup()
    val q = GroupIndex.Quantum("ts", "hour")
    IndexCatalog.registerGroup(fact, Seq(q.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(idx),
      quantums = Map(q.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
    def ranged(lo: String, hi: String) = spark.read.parquet(fact)
      .filter(col("ts") >= ts(lo) && col("ts") < ts(hi))
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("h", "event_type")
    // both bounds exactly on hour boundaries → a pure bucket predicate:
    // index served, fact table unread
    val served = ranged("2024-01-05 00:00:00", "2024-01-20 00:00:00")
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    sameRows(served.collect(),
      baseline(ranged("2024-01-05 00:00:00", "2024-01-20 00:00:00")))
    // a non-aligned bound (minute 30) bounds rows, not buckets → decline
    val nonAligned = ranged("2024-01-05 00:30:00", "2024-01-20 00:00:00")
    assert(nonAligned.queryExecution.executedPlan.toString.contains("/fact"),
      "non-aligned lower bound must keep the fact scan")
    // ts <= aligned-upper includes a single instant of the edge bucket —
    // bucket-splitting, must decline
    val edgeSplit = spark.read.parquet(fact)
      .filter(col("ts") >= ts("2024-01-05 00:00:00") &&
        col("ts") <= ts("2024-01-20 00:00:00"))
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(edgeSplit.queryExecution.executedPlan.toString.contains("/fact"),
      "inclusive aligned upper bound must keep the fact scan")
    IndexCatalog.clear()
  }

  test("a COARSER quantum GROUP BY is re-aggregated from a finer index " +
    "(the reference's month-from-day view union), fact table unread") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_rollup_spec")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq(qh.name, "event_type"), Seq("value"), s"$root/g",
      distinctCols = Seq("event_id"))
    IndexCatalog.registerGroup(fact, Seq(qh.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"), Seq("event_id"),
      quantums = Map(qh.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    // DAY query over the HOUR index: the full aggregate vector rides the
    // merge algebra (cnt/sum ADD, min/max COMBINE, avg from sums, distinct
    // from bitmap OR)
    def daily = facts
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"),
        avg(col("value")).as("av"),
        countDistinct(col("event_id")).as("ue"))
      .orderBy("d", "event_type")
    val phys = daily.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("/g"), s"index not scanned:\n$phys")
    sameRows(daily.collect(), baseline(daily))
    // WEEK rollup nests from hour too (week is a rollup TARGET only)
    def weekly = facts
      .groupBy(graft.core.Cols.dateTrunc("week", col("ts")).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("w", "event_type")
    assert(!weekly.queryExecution.executedPlan.toString.contains("/fact"),
      "week-from-hour rollup should serve from the index")
    sameRows(weekly.collect(), baseline(weekly))
    // rollup + hour-ALIGNED range bounds compose: bucket cut on the fine
    // key, then re-aggregate
    def rangedDaily = facts
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("d", "event_type")
    assert(!rangedDaily.queryExecution.executedPlan.toString.contains("/fact"),
      "aligned-range rollup should serve from the index")
    sameRows(rangedDaily.collect(), baseline(rangedDaily))
    // a range bound NOT aligned to the FINE unit declines even for rollup
    def badRange = facts
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:30:00")))
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(badRange.queryExecution.executedPlan.toString.contains("/fact"),
      "non-aligned bound must keep the fact scan under rollup too")
    // dropping a non-quantum key COMPOSES with the unit rollup (DIMENSION
    // rollup): GROUP BY day only re-aggregates (hour, event_type) combos
    def dayOnly = facts
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
        countDistinct(col("event_id")).as("ue"))
      .orderBy("d")
    assert(!dayOnly.queryExecution.executedPlan.toString.contains("/fact"),
      "dimension+unit rollup should serve from the index")
    sameRows(dayOnly.collect(), baseline(dayOnly))
    IndexCatalog.clear()
  }

  test("DIMENSION rollup: GROUP BY over a key subset re-aggregates the " +
    "index, and filters on DROPPED keys cut combo rows exactly") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_dimroll_spec")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)
    // two-key index (event_type, user_id), value sums + event_id bitmaps
    GroupIndex.buildTo(facts, Seq("event_type", "user_id"), Seq("value"),
      s"$root/g", distinctCols = Seq("event_id"))
    IndexCatalog.registerGroup(fact, Seq("event_type", "user_id"),
      Set.empty, Seq("value"), spark.read.parquet(s"$root/g"),
      Seq("event_id"))
    IndexRewrite.install(spark)
    // GROUP BY event_type only: user_id re-aggregates away
    def byType = facts.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"),
        avg(col("value")).as("av"), countDistinct(col("event_id")).as("ue"))
      .orderBy("event_type")
    assert(!byType.queryExecution.executedPlan.toString.contains("/fact"),
      s"dimension rollup should serve:\n${byType.queryExecution.executedPlan}")
    sameRows(byType.collect(), baseline(byType))
    // a filter on the DROPPED key commutes (combo-level cut == row cut)
    def filtered = facts.filter(col("user_id") < 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("event_type")
    assert(!filtered.queryExecution.executedPlan.toString.contains("/fact"),
      "dropped-key filter should transfer onto the index")
    sameRows(filtered.collect(), baseline(filtered))
    // a filter on a column that is NOT an index key still declines
    def foreign = facts.filter(col("event_id") % 2 === 0)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    assert(foreign.queryExecution.executedPlan.toString.contains("/fact"),
      "non-key filter must keep the fact scan")
    // an extra key the index lacks declines
    def extra = facts.groupBy("event_type", "event_id")
      .agg(count(lit(1)).as("cnt"))
    assert(extra.queryExecution.executedPlan.toString.contains("/fact"),
      "uncovered key must keep the fact scan")
    IndexCatalog.clear()
  }

  test("rollup composes with parent operators (HAVING / ORDER BY / LIMIT) " +
    "and with TWO coarser units of the same ts in one query") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_rollup_parents")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq(qh.name, "event_type"), Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq(qh.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"),
      quantums = Map(qh.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    // HAVING + ORDER BY + LIMIT above the rolled-up aggregate: the
    // substitution preserves output exprIds, so the parents stay untouched
    facts.createOrReplaceTempView("qro_parents")
    def having = spark.sql(
      "SELECT date_trunc('day', ts) AS d, event_type, count(*) AS cnt, " +
      "sum(value) AS sv FROM qro_parents GROUP BY 1, 2 " +
      "HAVING count(*) > 5 ORDER BY sv DESC LIMIT 7")
    // NB: SQL date_trunc may be dialect-shadowed when sql suites ran first
    // on this shared session — only assert when the plan actually rolled up
    val planStr = having.queryExecution.executedPlan.toString
    if (!planStr.contains("/fact")) {
      sameRows(having.collect(), baseline(having))
    } else {
      // dialect-shadowed date_trunc: fall back to the DataFrame shape
      def havingDf = facts
        .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
        .filter(col("cnt") > 5)
        .orderBy(col("sv").desc).limit(7)
      assert(!havingDf.queryExecution.executedPlan.toString.contains("/fact"),
        "HAVING/ORDER/LIMIT over the rollup should still index-serve")
      sameRows(havingDf.collect(), baseline(havingDf))
    }
    // two coarser units of the SAME ts (day + month) both from the hour key
    def two = facts
      .groupBy(graft.core.Cols.dateTrunc("month", col("ts")).as("m"),
        graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("m", "d", "event_type")
    assert(!two.queryExecution.executedPlan.toString.contains("/fact"),
      "two-unit rollup should serve from the hour index")
    sameRows(two.collect(), baseline(two))
    spark.catalog.dropTempView("qro_parents")
    IndexCatalog.clear()
  }

  test("PQL time-bounded GroupBy rides the quantum index: the compiler " +
    "snaps from=/to= OUTWARD to the table quantum's finest unit, so every " +
    "PQL time range is bucket-exact by construction (viewsByTimeRange " +
    "served from precomputation)") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_pql_time")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq(qh.name, "event_type"), Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq(qh.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"),
      quantums = Map(qh.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    // non-aligned user bounds (10:30 / 13:30) snap to 10:00 / 14:00 — the
    // reference's view-selection semantics make the filter bucket-exact,
    // so the dimension rollup (drop __q_hour_ts) + quantumized bounds fire
    val pql = "GroupBy(Rows(event_type), " +
      "filter=Row(from='2024-01-05T10:30', to='2024-01-20T13:30'), " +
      "aggregate=Sum(field=value))"
    def run() = new graft.pql.Compiler(facts, Some("ts"))
      .run(graft.pql.Parser.parseOne(pql))
    val served = run()
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("/g"), s"index not scanned:\n$phys")
    spark.conf.set("spark.graft.indexRewrite", "false")
    val want = try run().collect()
    finally spark.conf.unset("spark.graft.indexRewrite")
    sameRows(served.collect(), want)
    IndexCatalog.clear()
  }

  test("PQL GroupBy / TopK / Rows with DROPPED keys all serve from ONE " +
    "superset index via the rollup matcher — the whole PQL dashboard " +
    "lattice off one registration") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_pql_roll")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq(qh.name, "event_type", "user_id"), Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact,
      Seq(qh.name, "event_type", "user_id"), Set.empty, Seq("value"),
      spark.read.parquet(s"$root/g"),
      quantums = Map(qh.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    def pql(q: String) = new graft.pql.Compiler(facts, Some("ts"))
      .run(graft.pql.Parser.parseOne(q))
    // each shape drops keys the index carries (dimension rollup); the
    // time-bounded TopK also rides the quantum key via snapped bounds
    Seq(
      "GroupBy(Rows(event_type), aggregate=Sum(field=value))",
      "GroupBy(Rows(event_type), Rows(user_id))",
      "TopK(event_type, k=3)",
      "TopK(event_type, from='2024-01-05T10:30', to='2024-01-20T13:30', k=3)",
      "Rows(event_type)",
      "Distinct(field=event_type)").foreach { q =>
      val served = pql(q)
      val phys = served.queryExecution.executedPlan.toString
      assert(!phys.contains("/fact"), s"$q still scans facts:\n$phys")
      assert(phys.contains("/g"), s"$q not index-served:\n$phys")
      spark.conf.set("spark.graft.indexRewrite", "false")
      val want = try pql(q).collect()
      finally spark.conf.unset("spark.graft.indexRewrite")
      sameRows(served.collect(), want)
    }
    IndexCatalog.clear()
  }

  test("DIALECT string quantum: GROUP BY DATE_TRUNC('<unit>', ts) through " +
    "the reference dialect rides a __qs index; coarser dialect units roll " +
    "up by string prefix") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_qs_spec")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)
    val qs = GroupIndex.QuantumStr("ts", "hh")
    GroupIndex.buildTo(GroupIndex.withQuantumStrs(facts, Seq(qs)),
      Seq(qs.name, "event_type"), Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq(qs.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"),
      quantums = Map(qs.name -> spark.sessionState.conf.sessionLocalTimeZone))
    IndexRewrite.install(spark)
    facts.createOrReplaceTempView("qsd_fact")
    // through the REFERENCE DIALECT (graft.sql.GraftSql): its DATE_TRUNC
    // returns the RFC3339 string cut; with a literal unit the CaseWhen
    // folds to date_format(ts, pattern), which the walk resolves to the
    // build's __qs_hh_ts column
    def dialect(unit: String) = graft.sql.GraftSql.statement(spark,
      s"SELECT DATE_TRUNC('$unit', ts) AS h, event_type, COUNT(*) AS cnt, " +
      s"SUM(value) AS sv FROM qsd_fact GROUP BY DATE_TRUNC('$unit', ts), " +
      "event_type ORDER BY h, event_type")
    val served = dialect("HH")
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("/g"), s"index not scanned:\n$phys")
    sameRows(served.collect(), baseline(dialect("HH")))
    // coarser dialect units (D, M, YY) roll up from the hh key by prefix
    for (u <- Seq("D", "M", "YY")) {
      val roll = dialect(u)
      assert(!roll.queryExecution.executedPlan.toString.contains("/fact"),
        s"dialect $u rollup should serve from the __qs_hh index")
      sameRows(roll.collect(), baseline(dialect(u)))
    }
    // a FINER dialect unit (MI) cannot serve from hh
    assert(dialect("MI").queryExecution.executedPlan.toString.contains("/fact"),
      "minute cut must not ride an hour-cut index")
    // hour-ALIGNED raw-ts bounds transfer onto the STRING key as rendered
    // prefix comparisons (RFC3339 sorts lexicographically); non-aligned
    // bounds decline — same contract as the timestamp-kind keys
    def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))
    def ranged(lo: String) = facts
      .filter(col("ts") >= ts(lo) && col("ts") < ts("2024-01-20 00:00:00"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd'T'HH").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .orderBy("h", "event_type")
    val rangedServed = ranged("2024-01-05 00:00:00")
    assert(!rangedServed.queryExecution.executedPlan.toString.contains("/fact"),
      "aligned bounds should transfer onto the string key")
    sameRows(rangedServed.collect(), baseline(ranged("2024-01-05 00:00:00")))
    assert(ranged("2024-01-05 00:30:00").queryExecution.executedPlan
      .toString.contains("/fact"), "non-aligned bound must decline")
    spark.catalog.dropTempView("qsd_fact")
    IndexCatalog.clear()
  }

  test("rollup declines on timezone skew between build and query") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_rollup_tz")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val qh = GroupIndex.Quantum("ts", "hour")
    val facts = spark.read.parquet(fact)
    GroupIndex.buildTo(GroupIndex.withQuantums(facts, Seq(qh)),
      Seq(qh.name, "event_type"), Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq(qh.name, "event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"),
      quantums = Map(qh.name -> "America/New_York"))
    IndexRewrite.install(spark)
    val daily = facts
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(daily.queryExecution.executedPlan.toString.contains("/fact"),
      "tz-skewed rollup must not serve")
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
