package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.index.GroupIndex
import graft.plans.{IndexCatalog, IndexRewrite}
import org.apache.spark.sql.functions._

/** Incremental grouped-index maintenance: appendDelta == rebuild, replayed
  * micro-batches fold exactly once, version reclamation keeps current +
  * previous, and the maintained index actually serves the grouped query
  * scan-free after streaming ingest. */
class IndexMaintainSpec extends SparkSpec {

  /** Row-wise equality with 1e-9 RELATIVE tolerance on doubles (the index
    * path and the live aggregate accumulate partial sums in different
    * orders — same contract as the oracle gate's float compare). */
  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean = {
    val (ra, rb) = (a.collect(), b.collect())
    ra.length == rb.length && ra.zip(rb).forall { case (x, y) =>
      x.length == y.length && (0 until x.length).forall { i =>
        (x.get(i), y.get(i)) match {
          case (d: java.lang.Double, e: java.lang.Double) =>
            math.abs(d - e) <= 1e-9 * math.max(math.abs(d), math.abs(e))
          case (p: Array[Byte], q: Array[Byte]) => java.util.Arrays.equals(p, q)
          case (p, q) => p == q
        }
      }
    }
  }

  test("appendDelta over a prefix+rest split equals a full rebuild") {
    val ev = Tables.load(spark, sfDir, "events")
    val root = Ingest.scratch("ims_delta")
    val idx = s"$root/inc"
    GroupIndex.buildTo(ev.filter(col("event_id") % 3 =!= 0),
      Seq("event_type"), Seq("value"), idx, distinctCols = Seq("user_id"))
    val merged = GroupIndex.appendDelta(ev.filter(col("event_id") % 3 === 0),
      Seq("event_type"), Seq("value"), idx, distinctCols = Seq("user_id"))
    assert(merged == s"$root/inc.v1")
    val full = s"$root/full"
    GroupIndex.buildTo(ev, Seq("event_type"), Seq("value"), full,
      distinctCols = Seq("user_id"))
    val m = spark.read.parquet(merged)
    val f = spark.read.parquet(full)
    assert(m.schema == f.schema,
      s"merged schema drifted:\n${m.schema}\nvs\n${f.schema}")
    assert(sameRows(m.orderBy("event_type"), f.orderBy("event_type")))
    // a second fold keeps the schema pinned (no decimal/type widening creep)
    val merged2 = GroupIndex.appendDelta(ev.limit(0), Seq("event_type"),
      Seq("value"), merged, distinctCols = Seq("user_id"))
    assert(merged2 == s"$root/inc.v2")
    assert(spark.read.parquet(merged2).schema == f.schema)
  }

  test("appendDelta with an EXPLODED set-typed group column matches the " +
    "full rebuild (the 1B able fold shape, rehearsed small)") {
    val able = graft.tools.AbleGen.frame(spark, 20000L, 4)
    val gCols = Seq("education_level", "gender", "political_party", "domain")
    val root = Ingest.scratch("ims_able")
    GroupIndex.buildTo(able.filter(col("_id") < 15000L), gCols, Seq("age"),
      s"$root/g")
    val merged = GroupIndex.appendDelta(able.filter(col("_id") >= 15000L),
      gCols, Seq("age"), s"$root/g")
    GroupIndex.buildTo(able, gCols, Seq("age"), s"$root/full")
    val m = spark.read.parquet(merged)
    val f = spark.read.parquet(s"$root/full")
    assert(m.schema == f.schema)
    assert(sameRows(m.orderBy(gCols.map(col): _*),
      f.orderBy(gCols.map(col): _*)))
  }

  test("maintained streaming ingest serves the grouped query from the " +
    "index, fact table unread, and a replayed batch folds exactly once") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = Ingest.scratch("ims_stream")
    Seq(0, 1, 2).foreach(i => ev.filter(col("event_id") % 3 === i)
      .repartition(1).write.parquet(s"$root/src/part$i.parquet"))
    val stream = Ingest.fileSource(spark, s"$root/src/*", "PARQUET",
      ev.schema, maxFilesPerTrigger = 1)
    val factDir = s"$root/fact"
    val stem = s"$root/idx/events_maint"
    val (q, state) = IndexMaintain.start(stream, factDir, s"$root/ckpt",
      stem, Seq("event_type"), Seq("value"), Seq("user_id"))
    q.awaitTermination()
    val cur = state.currentIndexPath.get
    assert(cur == s"$stem.b2", s"expected three folded batches, got $cur")

    // version reclamation: current + previous only
    val versions = new java.io.File(s"$root/idx").listFiles()
      .map(_.getName).filter(_.startsWith("events_maint.b")).sorted.toSeq
    assert(versions == Seq("events_maint.b1", "events_maint.b2"), versions)

    // the serving query is index-served: fact dir unread in the plan
    val sql = spark.read.parquet(factDir)
    sql.createOrReplaceTempView("ims_q")
    val served = spark.sql("SELECT event_type, count(*) AS cnt, " +
      "sum(value) AS sv, count(DISTINCT user_id) AS ud FROM ims_q " +
      "GROUP BY event_type ORDER BY event_type")
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("events_maint.b2"), s"index not scanned:\n$phys")
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"),
      sum("value").as("sv"), countDistinct("user_id").as("ud"))
      .orderBy("event_type")
    assert(sameRows(served, want))

    // at-least-once replay: re-fold the LAST batch (same batchId) — the
    // committed version marker short-circuits the fold, values unchanged
    val lastBatch = ev.filter(col("event_id") % 3 === 2)
    IndexMaintain.foldBatch(lastBatch, 2L, factDir, stem,
      Seq("event_type"), Seq("value"), Seq("user_id"), state)
    assert(state.currentIndexPath.get == s"$stem.b2")
    val again = spark.sql("SELECT event_type, count(*) AS cnt, " +
      "sum(value) AS sv, count(DISTINCT user_id) AS ud FROM ims_q " +
      "GROUP BY event_type ORDER BY event_type")
    assert(sameRows(again, want))
    // the replayed fact publish did not duplicate rows either
    assert(spark.read.parquet(factDir).count() == ev.count())
    spark.catalog.dropTempView("ims_q")
    IndexCatalog.clear()
  }

  test("restarted stream resumes from the committed index version — a " +
    "second AvailableNow run folds ON TOP, never a delta-only restart") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = Ingest.scratch("ims_restart")
    val factDir = s"$root/fact"
    val stem = s"$root/idx/ev"
    // first run: two batches
    Seq(0, 1).foreach(i => ev.filter(col("event_id") % 3 === i)
      .repartition(1).write.parquet(s"$root/src/part$i.parquet"))
    val schema = ev.schema
    val (q1, s1) = IndexMaintain.start(
      Ingest.fileSource(spark, s"$root/src/*", "PARQUET", schema,
        maxFilesPerTrigger = 1),
      factDir, s"$root/ckpt", stem, Seq("event_type"), Seq("value"),
      Seq("user_id"))
    q1.awaitTermination()
    assert(s1.currentIndexPath.contains(s"$stem.b1"))
    // new data lands while the stream is DOWN, then a fresh start() against
    // the same checkpoint with initialIndexPath = None (the advice's
    // corruption path: pre-fix this built a delta-only index from batch 2
    // and reclaimed b0/b1)
    ev.filter(col("event_id") % 3 === 2)
      .repartition(1).write.parquet(s"$root/src/part2.parquet")
    val (q2, s2) = IndexMaintain.start(
      Ingest.fileSource(spark, s"$root/src/*", "PARQUET", schema,
        maxFilesPerTrigger = 1),
      factDir, s"$root/ckpt", stem, Seq("event_type"), Seq("value"),
      Seq("user_id"))
    q2.awaitTermination()
    assert(s2.currentIndexPath.contains(s"$stem.b2"),
      s"expected resume at b2, got ${s2.currentIndexPath}")
    // the resumed index holds ALL THREE batches, not just the last
    val sql = spark.read.parquet(factDir)
    sql.createOrReplaceTempView("ims_r")
    val served = spark.sql("SELECT event_type, count(*) AS cnt, " +
      "sum(value) AS sv, count(DISTINCT user_id) AS ud FROM ims_r " +
      "GROUP BY event_type ORDER BY event_type")
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("ev.b2"), s"index not scanned:\n$phys")
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"),
      sum("value").as("sv"), countDistinct("user_id").as("ud"))
      .orderBy("event_type")
    assert(sameRows(served, want))
    // latestCommitted reads the resumed version; an unrelated stem reads None
    assert(IndexMaintain.latestCommitted(spark, stem).contains(s"$stem.b2"))
    assert(IndexMaintain.latestCommitted(spark, s"$root/idx/other").isEmpty)
    spark.catalog.dropTempView("ims_r")
    IndexCatalog.clear()
  }

  test("factSignatureFast (plain FS listing) equals factSignature (Spark " +
    "file index) on a maintained fact dir — the per-batch fingerprint " +
    "must stay guard-compatible") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    val root = Ingest.scratch("ims_sig")
    val state = new IndexMaintain.State(None)
    IndexMaintain.foldBatch(ev.limit(100), 0L, s"$root/fact", s"$root/idx/g",
      Seq("event_type"), Seq("value"), Nil, state)
    val slow = IndexCatalog.factSignature(spark, s"$root/fact")
    val fast = IndexCatalog.factSignatureFast(spark, s"$root/fact")
    assert(slow.isDefined && slow == fast, s"$slow vs $fast")
    IndexCatalog.clear()
  }

  test("QUANTUM group keys are maintained ONLINE: the streamed index " +
    "serves GROUP BY date_trunc scan-free, and the day rollup rides it") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val root = Ingest.scratch("ims_quantum")
    Seq(0, 1, 2).foreach(i => ev.filter(col("event_id") % 3 === i)
      .repartition(1).write.parquet(s"$root/src/part$i.parquet"))
    val q = GroupIndex.Quantum("ts", "hour")
    val stream = Ingest.fileSource(spark, s"$root/src/*", "PARQUET",
      ev.schema, maxFilesPerTrigger = 1)
    val (sq, state) = IndexMaintain.start(stream, s"$root/fact",
      s"$root/ckpt", s"$root/idx/evq", Seq(q.name, "event_type"),
      Seq("value"), quantums = Seq(q))
    sq.awaitTermination()
    assert(state.currentIndexPath.contains(s"$root/idx/evq.b2"))
    val facts = spark.read.parquet(s"$root/fact")
    def hourly = facts
      .groupBy(graft.core.Cols.dateTrunc("hour", col("ts")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .orderBy("h", "event_type")
    val phys = hourly.queryExecution.executedPlan.toString
    assert(!phys.contains("/fact"), s"fact table still scanned:\n$phys")
    assert(phys.contains("evq.b2"), s"index not scanned:\n$phys")
    spark.conf.set("spark.graft.indexRewrite", "false")
    val want = try hourly.collect()
    finally spark.conf.unset("spark.graft.indexRewrite")
    assert(hourly.collect().zip(want).forall { case (g, w) =>
      g.get(0) == w.get(0) && g.get(1) == w.get(1) && g.get(2) == w.get(2) &&
        math.abs(g.getDouble(3) - w.getDouble(3)) <=
          1e-9 * math.max(1.0, math.abs(w.getDouble(3)))
    })
    // the coarser DAY query rides the maintained hour index via rollup
    def daily = facts
      .groupBy(graft.core.Cols.dateTrunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    assert(!daily.queryExecution.executedPlan.toString.contains("/fact"),
      "day rollup should ride the maintained hour index")
    IndexCatalog.clear()
  }

  test("a fresh batch folded after the stream keeps serving fresh results") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = Ingest.scratch("ims_fresh")
    val factDir = s"$root/fact"
    val stem = s"$root/idx/ev"
    val state = new IndexMaintain.State(None)
    IndexMaintain.foldBatch(ev.filter(col("event_id") % 2 === 0), 0L,
      factDir, stem, Seq("event_type"), Seq("value"), Nil, state)
    IndexMaintain.foldBatch(ev.filter(col("event_id") % 2 === 1), 1L,
      factDir, stem, Seq("event_type"), Seq("value"), Nil, state)
    IndexRewrite.install(spark)
    val df = spark.read.parquet(factDir)
    df.createOrReplaceTempView("ims_f")
    val served = spark.sql("SELECT event_type, count(*) AS cnt, " +
      "sum(value) AS sv FROM ims_f GROUP BY event_type ORDER BY event_type")
    assert(!served.queryExecution.executedPlan.toString.contains("/fact"))
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"),
      sum("value").as("sv")).orderBy("event_type")
    assert(sameRows(served, want))
    spark.catalog.dropTempView("ims_f")
    IndexCatalog.clear()
  }
}
