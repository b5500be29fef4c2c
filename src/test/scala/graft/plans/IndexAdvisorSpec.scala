package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.index.GroupIndex
import org.apache.spark.sql.functions._

/** The workload advisor recommends ONE covering index per (path,
  * explode-set) cluster, and the recommendation ACTUALLY SERVES every
  * query it claims to cover — the closed loop is asserted by building
  * exactly what the advisor said and checking each query's plan. */
class IndexAdvisorSpec extends SparkSpec {

  test("a mixed workload folds to one covering recommendation; building " +
    "it serves every covered query (exact / unit rollup / dimension " +
    "rollup / dialect cut)") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_advisor")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)
    facts.createOrReplaceTempView("adv_fact")

    def q1 = facts // hour × type, count+sum
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
    def q2 = facts // day only (unit + dimension rollup), min/max/distinct
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"),
        countDistinct(col("event_id")).as("ue"))
    def q3 = facts // plain type × user, avg
      .groupBy("event_type", "user_id")
      .agg(avg(col("value")).as("av"))
    def q4 = graft.sql.GraftSql.statement(spark, // dialect month cut
      "SELECT DATE_TRUNC('M', ts) AS m, COUNT(*) AS cnt FROM adv_fact " +
        "GROUP BY DATE_TRUNC('M', ts)")
    def q5 = facts.groupBy("event_type") // stddev: not index-able
      .agg(stddev(col("value")).as("sd"))
    val queries = Seq(() => q1, () => q2, () => q3, () => q4, () => q5)

    val (analyses, recs, _) = IndexAdvisor.analyze(queries.map(_.apply()))
    assert(analyses(4).shape.isEmpty &&
      analyses(4).note.contains("unsupported"), analyses(4).toString)
    assert(analyses.take(4).forall(_.shape.isDefined),
      analyses.map(_.note).mkString("; "))
    // one cluster: same path, no explodes
    assert(recs.size == 1, recs.map(_.render).mkString("\n"))
    val rec = recs.head
    assert(rec.covers == Seq(0, 1, 2, 3), rec.render)
    // hour covers {hour, day}; the dialect month cut is its own family
    assert(rec.groupCols.toSet ==
      Set("event_type", "user_id", "__q_hour_ts", "__qs_m_ts"), rec.render)
    assert(rec.sumCols == Seq("value") &&
      rec.distinctCols == Seq("event_id"), rec.render)

    // CLOSED LOOP: build exactly the recommendation, register, and every
    // covered query must serve scan-free with values matching the baseline
    val withKeys = GroupIndex.withQuantumStrs(
      GroupIndex.withQuantums(facts, Seq(GroupIndex.Quantum("ts", "hour"))),
      Seq(GroupIndex.QuantumStr("ts", "m")))
    GroupIndex.buildTo(withKeys, rec.groupCols, rec.sumCols, s"$root/g",
      distinctCols = rec.distinctCols)
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    IndexCatalog.registerGroup(fact, rec.groupCols, rec.explodedCols,
      rec.sumCols, spark.read.parquet(s"$root/g"), rec.distinctCols,
      quantums = Map("__q_hour_ts" -> tz, "__qs_m_ts" -> tz))
    IndexRewrite.install(spark)
    queries.take(4).zipWithIndex.foreach { case (mk, i) =>
      val df = mk()
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("/fact"), s"q${i + 1} still scans facts:\n$phys")
      val got = df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect()
      spark.conf.set("spark.graft.indexRewrite", "false")
      val want = try {
        val b = mk()
        b.orderBy(b.columns.map(col).toIndexedSeq: _*).collect()
      } finally spark.conf.unset("spark.graft.indexRewrite")
      assert(got.length == want.length, s"q${i + 1}: ${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) =>
        (0 until g.length).foreach { j => (g.get(j), w.get(j)) match {
          case (d: java.lang.Double, e: java.lang.Double) =>
            assert(math.abs(d - e) <= 1e-9 * math.max(1.0, math.abs(e)),
              s"q${i + 1}: $g vs $w")
          case (p, q) => assert(p == q, s"q${i + 1}: $g vs $w")
        }}
      }
    }
    spark.catalog.dropTempView("adv_fact")
    IndexCatalog.clear()
  }

  test("FILTERED workload: WHERE-referenced columns join the recommended " +
    "keys, aligned ts bounds map to the quantum key, and the built " +
    "recommendation plan-provably serves every covered query") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_advisor_f")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)

    def f1 = facts // plain filter on a column the query does NOT group by:
      .filter(col("user_id") < 50) // user_id must become an index key or
      .groupBy("event_type")       // the predicate can never transfer
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
    def f2 = facts // day-ALIGNED ts bounds + hour grouping: one family,
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    def f3 = facts // edge-splitting bound: un-index-able, reported as such
      .filter(col("ts") > lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val queries = Seq(() => f1, () => f2, () => f3)

    val (analyses, recs, _) = IndexAdvisor.analyze(queries.map(_.apply()))
    assert(analyses(0).shape.exists(_.filterKeys == Set("user_id")),
      analyses(0).toString)
    assert(analyses(1).shape.exists(_.filterKeys == Set("__q_day_ts")),
      analyses(1).toString)
    assert(analyses(2).shape.isEmpty &&
      analyses(2).note.contains("edge-splitting"), analyses(2).toString)
    assert(recs.size == 1, recs.map(_.render).mkString("\n"))
    val rec = recs.head
    // hour covers the day-aligned bound's family; user_id joins the keys
    assert(rec.groupCols.toSet ==
      Set("event_type", "user_id", "__q_hour_ts"), rec.render)
    assert(rec.covers == Seq(0, 1), rec.render)

    // CLOSED LOOP: build exactly the recommendation; both covered queries
    // serve scan-free and read identically to the rewrite-off baseline
    val withKeys = GroupIndex.withQuantums(facts,
      Seq(GroupIndex.Quantum("ts", "hour")))
    GroupIndex.buildTo(withKeys, rec.groupCols, rec.sumCols, s"$root/g",
      distinctCols = rec.distinctCols)
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    IndexCatalog.registerGroup(fact, rec.groupCols, rec.explodedCols,
      rec.sumCols, spark.read.parquet(s"$root/g"), rec.distinctCols,
      quantums = Map("__q_hour_ts" -> tz))
    IndexRewrite.install(spark)
    queries.take(2).zipWithIndex.foreach { case (mk, i) =>
      val df = mk()
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("/fact"), s"f${i + 1} still scans facts:\n$phys")
      val got = df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect()
      spark.conf.set("spark.graft.indexRewrite", "false")
      val want = try {
        val b = mk()
        b.orderBy(b.columns.map(col).toIndexedSeq: _*).collect()
      } finally spark.conf.unset("spark.graft.indexRewrite")
      assert(got.length == want.length,
        s"f${i + 1}: ${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) =>
        (0 until g.length).foreach { j => (g.get(j), w.get(j)) match {
          case (d: java.lang.Double, e: java.lang.Double) =>
            assert(math.abs(d - e) <= 1e-9 * math.max(1.0, math.abs(e)),
              s"f${i + 1}: $g vs $w")
          case (p, q) => assert(p == q, s"f${i + 1}: $g vs $w")
        }}
      }
    }
    IndexCatalog.clear()
  }

  test("GLOBAL count shapes get SEGMENT-index recommendations (the PQL " +
    "Count(Row(f=v)) workload): built + registered, they serve scan-free") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id").as("_id"), col("event_type"), col("user_id"))
    val root = graft.streaming.Ingest.scratch("idx_advisor_seg")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    val facts = spark.read.parquet(fact)

    def g1 = facts.filter(col("event_type") === "click")
      .agg(count(lit(1)).as("cnt")) // count(*) → record-id index
    def g2 = facts.filter(col("event_type") === "view")
      .agg(countDistinct(col("user_id")).as("ud"))
    val queries = Seq(() => g1, () => g2)

    val (analyses, recs, segRecs) = IndexAdvisor.analyze(queries.map(_.apply()))
    assert(recs.isEmpty, recs.map(_.render).mkString("\n"))
    assert(analyses.forall(a => a.seg.isDefined &&
      a.note.contains("segment")), analyses.mkString("; "))
    // two recommendations: same segCol, different id columns
    assert(segRecs.map(r => (r.segCol, r.idCol)).toSet ==
      Set(("event_type", "_id"), ("event_type", "user_id")),
      segRecs.map(_.render).mkString("\n"))

    // CLOSED LOOP: build exactly the recommendations and both serve
    segRecs.foreach { r =>
      graft.index.Bitmap.segmentIndex(facts, r.segCol, r.idCol)
        .write.mode("overwrite").parquet(s"$root/seg_${r.idCol}")
      IndexCatalog.register(fact, r.segCol, r.idCol,
        spark.read.parquet(s"$root/seg_${r.idCol}"))
    }
    IndexRewrite.install(spark)
    queries.zipWithIndex.foreach { case (mk, i) =>
      val df = mk()
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("/fact"), s"g${i + 1} still scans facts:\n$phys")
      val got = df.collect()
      spark.conf.set("spark.graft.indexRewrite", "false")
      val want = try mk().collect()
      finally spark.conf.unset("spark.graft.indexRewrite")
      assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq,
        s"g${i + 1}: ${got.toSeq} vs ${want.toSeq}")
    }
    IndexCatalog.clear()
  }

  test("explode-set clusters stay separate (multiplicity differs)") {
    import spark.implicits._
    val root = graft.streaming.Ingest.scratch("idx_advisor_ex")
    Seq(("a", Seq("x", "y"), 1L), ("b", Seq("x"), 2L))
      .toDF("k", "tags", "v").write.parquet(s"$root/fact")
    val f = spark.read.parquet(s"$root/fact")
    val qPlain = f.groupBy("k").agg(sum(col("v")).as("sv"))
    val qExploded = f.select(explode(col("tags")).as("t"), col("v"))
      .groupBy("t").agg(sum(col("v")).as("sv"))
    val (analyses, recs, _) = IndexAdvisor.analyze(Seq(qPlain, qExploded))
    assert(analyses.forall(_.shape.isDefined))
    assert(recs.size == 2, recs.map(_.render).mkString("\n"))
    assert(recs.map(_.explodedCols).toSet == Set(Set.empty, Set("tags")))
  }

  test("cardinality guard: materialize estimates combos and REFUSES a " +
    "near-unique key set (the index would be a copy of the table); a " +
    "sane key set builds and reports its estimate") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    val root = graft.streaming.Ingest.scratch("idx_advisor_card")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    // a workload filter `WHERE event_id = …` legitimately keys event_id —
    // but event_id is unique, so the "index" has one combo per fact row
    val bad = IndexAdvisor.Recommendation(fact,
      Seq("event_id", "event_type"), Set.empty, Seq("value"), Nil, Seq(0))
    val est = IndexAdvisor.estimateCombos(spark, bad)
    val rows = spark.read.parquet(fact).count()
    assert(est > rows / 2, s"estimate $est should be ~row count $rows")
    spark.conf.set("spark.graft.advisor.maxCombos", "500")
    try {
      val ex = intercept[IllegalArgumentException] {
        IndexAdvisor.materialize(spark, bad, s"$root/g")
      }
      assert(ex.getMessage.contains("maxCombos"), ex.getMessage)
      assert(!new java.io.File(s"$root/g").exists(), "refused build wrote")
      // a sane key set builds under the same cap, reporting its estimate
      val ok = IndexAdvisor.Recommendation(fact, Seq("event_type"),
        Set.empty, Seq("value"), Nil, Seq(0))
      val est2 = IndexAdvisor.materialize(spark, ok, s"$root/g2")
      assert(est2 > 0 && est2 <= 10, s"est2 = $est2")
      assert(new java.io.File(s"$root/g2").isDirectory)
    } finally spark.conf.unset("spark.graft.advisor.maxCombos")
    IndexCatalog.clear()
  }
}
