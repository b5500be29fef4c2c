package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.index.Bitmap
import org.apache.spark.sql.functions._

class IndexRewriteSpec extends SparkSpec {

  private def buildAndRegister(): String = {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_event_type"
    Bitmap.segmentIndex(base, "event_type", "user_id")
      .write.mode("overwrite").parquet(idxDir)
    IndexCatalog.register(s"$sfDir/events.parquet", "event_type", "user_id",
      spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    base.createOrReplaceTempView("ev_idx")
    idxDir
  }

  test("count-distinct per segment is served from the bitmap index") {
    val idxDir = buildAndRegister()
    val q = spark.sql(
      "SELECT event_type AS seg, count(DISTINCT user_id) AS cnt " +
        "FROM ev_idx GROUP BY event_type ORDER BY seg")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_cardinality"), s"not rewritten:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    assert(phys.contains("events_event_type"), s"index not scanned:\n$phys")
    // results identical to the direct aggregation
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type").as("seg"))
      .agg(countDistinct("user_id").as("cnt")).orderBy("seg").collect()
    assert(q.collect().toSeq == want.toSeq)
  }

  test("seg-value filters are pushed onto the index scan and still rewritten") {
    buildAndRegister()
    val q = spark.sql(
      "SELECT event_type AS seg, count(DISTINCT user_id) AS cnt FROM ev_idx " +
        "WHERE event_type IN ('click', 'view') GROUP BY event_type ORDER BY seg")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_cardinality"), s"not rewritten:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    // the IN predicate reaches the index parquet scan as a pushed filter
    assert(phys.contains("PushedFilters: [In(seg,") ||
      phys.contains("PushedFilters: [Or(EqualTo(seg,"),
      s"seg predicate not pushed to the index scan:\n$phys")
    val want = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type").as("seg"))
      .agg(countDistinct("user_id").as("cnt")).orderBy("seg").collect()
    assert(q.collect().toSeq == want.toSeq)
  }

  test("filtered or non-matching aggregates are NOT rewritten") {
    buildAndRegister()
    val filtered = spark.sql(
      "SELECT event_type, count(DISTINCT user_id) FROM ev_idx " +
        "WHERE value > 50 GROUP BY event_type")
    assert(!filtered.queryExecution.optimizedPlan.toString.contains("bitmap_cardinality"))
    val otherAgg = spark.sql(
      "SELECT event_type, sum(value) FROM ev_idx GROUP BY event_type")
    assert(!otherAgg.queryExecution.optimizedPlan.toString.contains("bitmap_cardinality"))
    val otherCol = spark.sql(
      "SELECT event_type, count(DISTINCT event_id) FROM ev_idx GROUP BY event_type")
    assert(!otherCol.queryExecution.optimizedPlan.toString.contains("bitmap_cardinality"))
  }

  test("bitmap expressions evaluate correctly under codegen") {
    import spark.implicits._
    val idx = Bitmap.segmentIndex(
      Seq((1L, "a"), (2L, "a"), (3L, "b"), (1L, "b"), (2L, "b"))
        .toDF("user_id", "event_type"), "event_type", "user_id")
    BitmapFunctions.register(spark)
    val out = idx.select(col("seg"),
      expr("bitmap_cardinality(bm)").as("c"))
      .orderBy("seg").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 3L)))
    // full boolean algebra over the pair: a={1,2}, b={1,2,3}
    val pair = idx.as("a").join(idx.as("b"),
      col("a.seg") === "a" && col("b.seg") === "b")
      .select(
        expr("bitmap_and_cardinality(a.bm, b.bm)").as("and"),
        expr("bitmap_or_cardinality(a.bm, b.bm)").as("or"),
        expr("bitmap_andnot_cardinality(b.bm, a.bm)").as("diff"),
        expr("bitmap_xor_cardinality(a.bm, b.bm)").as("xor"))
      .collect()(0)
    assert((pair.getLong(0), pair.getLong(1), pair.getLong(2), pair.getLong(3))
      == ((2L, 3L, 1L, 1L)))
  }

  test("TopK-by-distinct-count is served from the index (Sort/Limit compose)") {
    buildAndRegister()
    val q = spark.sql(
      "SELECT event_type AS seg, count(DISTINCT user_id) AS cnt " +
        "FROM ev_idx GROUP BY event_type ORDER BY cnt DESC, seg LIMIT 3")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_cardinality"), s"not rewritten:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type").as("seg"))
      .agg(countDistinct("user_id").as("cnt"))
      .orderBy(col("cnt").desc, col("seg")).limit(3).collect()
    assert(q.collect().toSeq == want.toSeq)
  }

  test("global seg-filtered count-distinct ORs index bitmaps, no fact scan") {
    buildAndRegister()
    val q = spark.sql(
      "SELECT count(DISTINCT user_id) AS cnt FROM ev_idx " +
        "WHERE event_type IN ('click', 'view')")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_or_agg") && opt.contains("bitmap_cardinality"),
      s"not rewritten:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    val want = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view"))
      .agg(countDistinct("user_id").as("cnt")).collect()
    assert(q.collect().toSeq == want.toSeq)
    // equality predicate works too (the Count(Row(seg=v)) shape)
    val q1 = spark.sql(
      "SELECT count(DISTINCT user_id) AS cnt FROM ev_idx WHERE event_type = 'click'")
    assert(q1.queryExecution.optimizedPlan.toString.contains("bitmap_or_agg"))
    val want1 = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "click")
      .agg(countDistinct("user_id").as("cnt")).collect()
    assert(q1.collect().toSeq == want1.toSeq)
  }

  private def registerRecordIdIndex(): Unit = {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_type_recid"
    Bitmap.segmentIndex(base, "event_type", "_id")
      .write.mode("overwrite").parquet(idxDir)
    IndexCatalog.register(s"$sfDir/events.parquet", "event_type", "_id",
      spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    base.createOrReplaceTempView("ev_idx")
  }

  test("plain count(*) per segment is served from a record-id index") {
    registerRecordIdIndex()
    val q = spark.sql(
      "SELECT event_type AS seg, count(*) AS cnt FROM ev_idx " +
        "GROUP BY event_type ORDER BY seg")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_cardinality"), s"not rewritten:\n$opt")
    assert(!q.queryExecution.executedPlan.toString.contains("events.parquet"))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type").as("seg"))
      .agg(count(lit(1)).as("cnt")).orderBy("seg").collect()
    assert(q.collect().toSeq == want.toSeq)
  }

  test("PQL Count(Row(seg=v)) is served scan-free through the same rule") {
    registerRecordIdIndex()
    val q = graft.pql.Pql.run(spark, sfDir, "events",
      "Count(Row(event_type='click'))")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap"), s"PQL count not index-served:\n$opt")
    assert(!q.queryExecution.executedPlan.toString.contains("events.parquet"),
      "fact table still scanned")
    val want = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "click").count()
    assert(q.collect()(0).getLong(0) == want)
  }

  test("global rewrite declines without a seg filter or with foreign predicates") {
    buildAndRegister()
    val plain = spark.sql("SELECT count(DISTINCT user_id) FROM ev_idx")
    assert(!plain.queryExecution.optimizedPlan.toString.contains("bitmap_or_agg"))
    val mixed = spark.sql(
      "SELECT count(DISTINCT user_id) FROM ev_idx " +
        "WHERE event_type = 'click' AND value > 10")
    assert(!mixed.queryExecution.optimizedPlan.toString.contains("bitmap_or_agg"))
  }

  test("nondeterministic seg-only predicates are NOT transferred to the index") {
    buildAndRegister()
    // `event_type = 'click' OR rand() < 0.5` references only seg, but
    // evaluating it once per index row instead of once per fact row would
    // change results — the rewrite must decline both shapes.
    val grouped = spark.sql(
      "SELECT event_type, count(DISTINCT user_id) FROM ev_idx " +
        "WHERE event_type = 'click' OR rand() < 0.5 GROUP BY event_type")
    assert(!grouped.queryExecution.optimizedPlan.toString.contains("bitmap_cardinality"),
      "nondeterministic filter transferred onto grouped index scan")
    val global = spark.sql(
      "SELECT count(DISTINCT user_id) FROM ev_idx " +
        "WHERE event_type = 'click' OR rand() < 0.5")
    assert(!global.queryExecution.optimizedPlan.toString.contains("bitmap_or_agg"),
      "nondeterministic filter transferred onto global index scan")
  }
}
