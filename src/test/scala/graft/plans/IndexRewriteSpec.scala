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

  // ------------------------------------------------ grouped count/sum index

  private def registerGroupSum(): Unit = {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_groupsum"
    // buildTo: a REBUILD with the registration already live must not be
    // answered from the index files it is overwriting (second call here)
    graft.index.GroupIndex.buildTo(base, Seq("event_type"), Seq("value"), idxDir)
    IndexCatalog.registerGroup(s"$sfDir/events.parquet", Seq("event_type"),
      Set.empty, Seq("value"), spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    base.createOrReplaceTempView("ev_gidx")
  }

  test("grouped count+sum is served from the GroupIndex, fact table unread") {
    registerGroupSum()
    val q = spark.sql(
      "SELECT event_type, count(*) AS cnt, sum(value) AS sv FROM ev_gidx " +
        "GROUP BY event_type ORDER BY event_type")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    assert(phys.contains("events_groupsum"), s"group index not scanned:\n$phys")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .orderBy("event_type").collect()
    val got = q.collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1))
      // double sums aggregate in a different order at build time — bound the
      // comparison the way the DuckDB oracle does (1e-9 relative)
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) <=
        1e-9 * math.max(1.0, math.abs(w.getDouble(2))))
    }
  }

  test("PQL GroupBy(Rows…, aggregate=Sum) over a set field is index-served " +
    "with exact explode and null semantics") {
    import spark.implicits._
    val factDir = "/tmp/graft_gidx/fact"
    val idxDir = "/tmp/graft_gidx/idx"
    // NULL education row and empty-domain row pin the semantics: PQL
    // excludes both (presence filter + explode); the index keeps the NULL
    // group and the transferred IS NOT NULL drops it at serve time
    Seq(
      ("hs", Seq("a.com", "b.com"), 30L),
      ("hs", Seq("a.com"), 40L),
      ("uni", Seq("b.com"), 50L),
      (null.asInstanceOf[String], Seq("a.com"), 60L),
      ("hs", Seq.empty[String], 70L)
    ).toDF("education_level", "domain", "age")
      .write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    graft.index.GroupIndex.build(fact, Seq("education_level", "domain"), Seq("age"))
      .write.mode("overwrite").parquet(idxDir)
    IndexCatalog.registerGroup(factDir, Seq("education_level", "domain"),
      Set("domain"), Seq("age"), spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    val q = new graft.pql.Compiler(fact).run(graft.pql.Parser.parseOne(
      "GroupBy(Rows(education_level), Rows(domain), aggregate=Sum(field=age))"))
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("gidx/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("gidx/idx"), s"group index not scanned:\n$phys")
    val got = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("hs", "a.com", 2L, 70L), ("hs", "b.com", 1L, 30L),
      ("uni", "b.com", 1L, 50L)), got.toString)
  }

  test("the 1B-bench hc_groupby shape (Rows×4 + Sum) is index-served with " +
    "results identical to the scan") {
    // same PQL, same generator, same registration as Bench's able_1b block,
    // at spec scale — proves the 4-key + set-explode shape end-to-end
    val factDir = graft.tools.AbleGen.ensure(spark, 50000L,
      "/tmp/graft_gidx/able50k")
    val fact = spark.read.parquet(factDir)
    val hc = "GroupBy(Rows(education_level), Rows(gender), " +
      "Rows(political_party), Rows(domain), aggregate=Sum(field=age))"
    val want = new graft.pql.Compiler(fact)
      .run(graft.pql.Parser.parseOne(hc)).collect().toSeq
    val gCols = Seq("education_level", "gender", "political_party", "domain")
    val idxDir = "/tmp/graft_gidx/able50k_idx"
    graft.index.GroupIndex.buildTo(fact, gCols, Seq("age"), idxDir)
    IndexCatalog.registerGroup(factDir, gCols, Set("domain"), Seq("age"),
      spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    val q = new graft.pql.Compiler(fact).run(graft.pql.Parser.parseOne(hc))
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("able50k/"), s"fact table still scanned:\n$phys")
    assert(phys.contains("able50k_idx"), s"group index not scanned:\n$phys")
    assert(q.collect().toSeq == want)
  }

  test("MIXED aggregate vector (count + sum + count-distinct) served from " +
    "one grouped-index row via bitmap cardinality") {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_groupmixed"
    graft.index.GroupIndex.buildTo(base, Seq("event_type"), Seq("value"),
      idxDir, distinctCols = Seq("user_id"))
    IndexCatalog.registerGroup(s"$sfDir/events.parquet", Seq("event_type"),
      Set.empty, Seq("value"), spark.read.parquet(idxDir), Seq("user_id"))
    IndexRewrite.install(spark)
    base.createOrReplaceTempView("ev_gmix")
    val q = spark.sql(
      "SELECT event_type, count(*) AS cnt, sum(value) AS sv, " +
        "avg(value) AS av, min(value) AS mn, max(value) AS mx, " +
        "count(DISTINCT user_id) AS ud FROM ev_gmix " +
        "GROUP BY event_type ORDER BY event_type")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bitmap_cardinality"), s"distinct not bitmap-served:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"),
        avg("value").as("av"), min("value").as("mn"), max("value").as("mx"),
        countDistinct("user_id").as("ud"))
      .orderBy("event_type").collect()
    val got = q.collect()
    assert(got.length == want.length)
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1)
        && g.getLong(6) == w.getLong(6), s"$g vs $w")
      assert(close(g.getDouble(2), w.getDouble(2)), s"sum: $g vs $w")
      assert(close(g.getDouble(3), w.getDouble(3)), s"avg: $g vs $w")
      // min/max are order-independent: exact
      assert(g.getDouble(4) == w.getDouble(4) &&
        g.getDouble(5) == w.getDouble(5), s"min/max: $g vs $w")
    }
    // distinct of an UNINDEXED column declines (plan keeps the fact scan)
    val miss = spark.sql(
      "SELECT event_type, count(DISTINCT event_id), sum(value) FROM ev_gmix " +
        "GROUP BY event_type")
    assert(miss.queryExecution.executedPlan.toString.contains("events.parquet"),
      "unindexed count-distinct must stay on the fact table")
  }

  test("TWO set fields grouped together: cross-product multiplicity " +
    "(a record counts once per member PAIR) is index-served exactly") {
    import spark.implicits._
    val factDir = "/tmp/graft_gidx/twoset"
    val idxDir = "/tmp/graft_gidx/twosetidx"
    // row 1 contributes 2×2 = 4 combos; row 2 contributes 1; row 3 has an
    // empty second set → contributes nothing (explode drops it)
    Seq(
      (1L, Seq("a", "b"), Seq("x", "y"), 10L),
      (2L, Seq("a"), Seq("x"), 5L),
      (3L, Seq("b"), Seq.empty[String], 7L)
    ).toDF("_id", "s1", "s2", "v").write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    graft.index.GroupIndex.buildTo(fact, Seq("s1", "s2"), Seq("v"), idxDir)
    IndexCatalog.registerGroup(factDir, Seq("s1", "s2"), Set("s1", "s2"),
      Seq("v"), spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    val q = new graft.pql.Compiler(fact).run(graft.pql.Parser.parseOne(
      "GroupBy(Rows(s1), Rows(s2), aggregate=Sum(field=v))"))
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("gidx/twoset/"), s"fact still scanned:\n$phys")
    assert(phys.contains("twosetidx"), s"index not scanned:\n$phys")
    val got = q.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("a", "x", 2L, 15L), ("a", "y", 1L, 10L),
      ("b", "x", 1L, 10L), ("b", "y", 1L, 10L)), got.toString)
  }

  test("grouped rewrite declines on foreign filters, explode mismatch, " +
    "unindexed sums") {
    registerGroupSum()
    // predicate on a non-group column: combo rows can't answer it
    val foreign = spark.sql(
      "SELECT event_type, sum(value) FROM ev_gidx WHERE user_id > 10 " +
        "GROUP BY event_type")
    assert(foreign.queryExecution.executedPlan.toString.contains("events.parquet"),
      "foreign-filtered group query must stay on the fact table")
    // sum of a column the index didn't precompute
    val unindexed = spark.sql(
      "SELECT event_type, sum(user_id) FROM ev_gidx GROUP BY event_type")
    assert(unindexed.queryExecution.executedPlan.toString.contains("events.parquet"),
      "unindexed sum must stay on the fact table")
    // stddev has no stored form — declines
    val sd = spark.sql(
      "SELECT event_type, stddev(value) FROM ev_gidx GROUP BY event_type")
    assert(sd.queryExecution.executedPlan.toString.contains("events.parquet"),
      "stddev must stay on the fact table")
    // key-set mismatch: extra group key not covered by the registration
    val extraKey = spark.sql(
      "SELECT event_type, user_id, sum(value) FROM ev_gidx " +
        "GROUP BY event_type, user_id")
    assert(extraKey.queryExecution.executedPlan.toString.contains("events.parquet"),
      "unregistered key set must stay on the fact table")
  }

  test("grouped rewrite keeps SQL NULL-group semantics (no presence filter)") {
    import spark.implicits._
    val factDir = "/tmp/graft_gidx/nullfact"
    val idxDir = "/tmp/graft_gidx/nullidx"
    Seq(("x", 1L), (null.asInstanceOf[String], 2L), (null.asInstanceOf[String], 3L))
      .toDF("seg2", "v").write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    graft.index.GroupIndex.build(fact, Seq("seg2"), Seq("v"))
      .write.mode("overwrite").parquet(idxDir)
    IndexCatalog.registerGroup(factDir, Seq("seg2"), Set.empty, Seq("v"),
      spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    fact.createOrReplaceTempView("nullfact")
    val q = spark.sql(
      "SELECT seg2, count(*) AS cnt, sum(v) AS sv FROM nullfact GROUP BY seg2")
    assert(!q.queryExecution.executedPlan.toString.contains("nullfact"),
      "expected index serving")
    val got = q.collect().map(r => (Option(r.getString(0)), r.getLong(1),
      r.getLong(2))).toSet
    assert(got == Set((Some("x"), 1L, 1L), (None, 2L, 5L)), got.toString)
  }

  test("differential property: random grouped queries read identically with " +
    "the rewrite ON vs the kill-switch baseline") {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_groupprop"
    graft.index.GroupIndex.buildTo(base, Seq("event_type"), Seq("value"),
      idxDir, distinctCols = Seq("user_id"))
    IndexCatalog.registerGroup(s"$sfDir/events.parquet", Seq("event_type"),
      Set.empty, Seq("value"), spark.read.parquet(idxDir), Seq("user_id"))
    IndexRewrite.install(spark)
    base.createOrReplaceTempView("ev_gprop")
    val aggPool = Seq("count(*)", "sum(value)", "avg(value)", "min(value)",
      "max(value)", "count(DISTINCT user_id)")
    val predPool = Seq("", " WHERE event_type = 'click'",
      " WHERE event_type IN ('view', 'purchase')",
      " WHERE event_type IS NOT NULL", " WHERE event_type <> 'click'")
    val rnd = new scala.util.Random(101611L)
    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
      rows.toSeq.map(_.toSeq.map {
        case d: Double => f"$d%.9e" // sums legitimately differ in last bits
        case v => String.valueOf(v)
      })
    for (_ <- 1 to 40) {
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(4))
        .zipWithIndex.map { case (a, i) => s"$a AS a$i" }
      val sql = s"SELECT event_type, ${aggs.mkString(", ")} FROM ev_gprop" +
        predPool(rnd.nextInt(predPool.size)) +
        " GROUP BY event_type ORDER BY event_type"
      val served = spark.sql(sql)
      assert(!served.queryExecution.executedPlan.toString
          .contains("events.parquet"), s"not index-served: $sql")
      spark.conf.set("spark.graft.indexRewrite", "false")
      val baseline = try canon(spark.sql(sql).collect())
      finally spark.conf.unset("spark.graft.indexRewrite")
      assert(canon(served.collect()) == baseline, s"diverged: $sql")
    }
  }

  test("the reference SQL dialect path (GraftSql) rides the grouped index") {
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_groupsql"
    graft.index.GroupIndex.buildTo(base, Seq("event_type"), Seq("value"), idxDir)
    IndexCatalog.registerGroup(s"$sfDir/events.parquet", Seq("event_type"),
      Set.empty, Seq("value"), spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    val q = graft.sql.GraftSql.sql(spark, sfDir,
      "SELECT event_type, count(*) AS cnt, sum(value) AS sv FROM events " +
        "GROUP BY event_type ORDER BY event_type")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"), s"fact table still scanned:\n$phys")
    assert(phys.contains("events_groupsql"), s"index not scanned:\n$phys")
    assert(q.collect().length > 0)
  }

  test("PQL TopK and Rows ride the grouped index (set-field value " +
    "histogram and distinct-values shapes)") {
    import spark.implicits._
    val factDir = "/tmp/graft_gidx/topkfact"
    val idxDir = "/tmp/graft_gidx/topkidx"
    Seq((1L, Seq("a", "b")), (2L, Seq("a")), (3L, Seq("b", "c")),
        (4L, Seq("a", "c")), (5L, Seq("a")))
      .toDF("_id", "tags").write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    graft.index.GroupIndex.buildTo(fact, Seq("tags"), Nil, idxDir)
    IndexCatalog.registerGroup(factDir, Seq("tags"), Set("tags"), Nil,
      spark.read.parquet(idxDir))
    IndexRewrite.install(spark)
    // TopK(field, k): explode → groupBy(count) → sort/limit — the grouped
    // matcher serves the aggregate, Sort/Limit compose above
    val topk = new graft.pql.Compiler(fact)
      .run(graft.pql.Parser.parseOne("TopK(tags, k=2)"))
    val physT = topk.queryExecution.executedPlan.toString
    assert(!physT.contains("topkfact"), s"TopK still scans the fact:\n$physT")
    assert(physT.contains("topkidx"), s"TopK not on the index:\n$physT")
    assert(topk.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 4L), ("b", 2L)))
    // Rows(field): explode → distinct — a keys-only Aggregate, served as
    // the index's combo column
    val rows = new graft.pql.Compiler(fact)
      .run(graft.pql.Parser.parseOne("Rows(tags)"))
    val physR = rows.queryExecution.executedPlan.toString
    assert(!physR.contains("topkfact"), s"Rows still scans the fact:\n$physR")
    assert(rows.collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("durable index registrations replay after a session bounce") {
    val wh = java.nio.file.Files.createTempDirectory("graft-idxreg-wh").toString
    val base = Tables.load(spark, sfDir, "events")
    val idxDir = "/tmp/graft_index/events_groupdurable"
    graft.index.GroupIndex.buildTo(base, Seq("event_type"), Seq("value"), idxDir)
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.warehouse", wh)
    IndexRegistry.registerGroupDurable(s1, s"$sfDir/events.parquet",
      Seq("event_type"), Set.empty, Seq("value"), idxDir)
    // bounce: wipe the in-memory catalog, restore a FRESH session from the
    // warehouse — the registration must come back without code
    IndexCatalog.clear()
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.warehouse", wh)
    graft.sql.Ddl.restoreSession(s2)
    Tables.load(s2, sfDir, "events").createOrReplaceTempView("ev_gdur")
    val q = s2.sql(
      "SELECT event_type, count(*) AS cnt, sum(value) AS sv FROM ev_gdur " +
        "GROUP BY event_type ORDER BY event_type")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("events.parquet"),
      s"restored session not index-serving:\n$phys")
    assert(phys.contains("events_groupdurable"), s"index not scanned:\n$phys")
    // a registration whose index files vanished since is skipped, not fatal
    val goneDir = "/tmp/graft_index/events_gone"
    graft.index.GroupIndex.buildTo(
      Tables.load(spark, sfDir, "documents"), Seq("lang"), Nil, goneDir)
    IndexRegistry.registerGroupDurable(s1, s"$sfDir/documents.parquet",
      Seq("lang"), Set.empty, Nil, goneDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(goneDir))
    IndexCatalog.clear()
    graft.sql.Ddl.restoreSession(s2) // must not throw
    // the intact registration still restored alongside the skipped one
    assert(IndexCatalog.lookupGroup(Seq(s"$sfDir/events.parquet"),
      Set("event_type")).isDefined)
    IndexRewrite.install(spark)
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

  test("IndexRewrite.suppress is THREAD-scoped: the suppressed thread's " +
    "plans skip index serving while a concurrent query on the same " +
    "session keeps it, and the session conf is never touched") {
    buildAndRegister()
    def q = spark.sql(
      "SELECT event_type AS seg, count(DISTINCT user_id) AS cnt " +
        "FROM ev_idx GROUP BY event_type")
    val confBefore = spark.conf.getOption("spark.graft.indexRewrite")
    IndexRewrite.suppress {
      // this thread sees the LOGICAL shape (what builds/advisor need)…
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("bitmap_cardinality"))
      // …while another thread, same session, AT THE SAME TIME, still serves
      // from the index — the production-query property the r13 session-conf
      // flip could not give (it turned serving off session-wide)
      val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
      try {
        val served = pool.submit(
          new java.util.concurrent.Callable[java.lang.Boolean] {
            override def call(): java.lang.Boolean =
              q.queryExecution.optimizedPlan.toString
                .contains("bitmap_cardinality")
          })
        assert(served.get(), "concurrent thread lost index serving")
      } finally pool.shutdown()
    }
    // suppression scope ended: this thread serves again
    assert(q.queryExecution.optimizedPlan.toString
      .contains("bitmap_cardinality"))
    assert(spark.conf.getOption("spark.graft.indexRewrite") == confBefore)
    // the advisor rides the same mechanism: analysis on a serving session
    // reads the logical workload shape with the conf untouched
    val (as, _, _) = IndexAdvisor.analyze(Seq(q))
    assert(as.head.shape.isDefined, as.toString)
    assert(spark.conf.getOption("spark.graft.indexRewrite") == confBefore)
  }
}
