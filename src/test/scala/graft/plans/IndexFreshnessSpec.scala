package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.index.{Bitmap, GroupIndex}
import org.apache.spark.sql.functions._

/** Freshness guard: an index whose fact files changed underneath declines
  * at rule time (the query answers from the new facts), a re-registration
  * resumes serving, and the kill-switch restores the unguarded behavior. */
class IndexFreshnessSpec extends SparkSpec {

  private def grouped(fact: String) = {
    val df = spark.read.parquet(fact)
    df.createOrReplaceTempView("fr_q")
    spark.sql("SELECT event_type, count(*) AS cnt, sum(value) AS sv " +
      "FROM fr_q GROUP BY event_type ORDER BY event_type")
  }

  test("a stale grouped index declines; re-registration resumes serving") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_fresh_g")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    GroupIndex.buildTo(spark.read.parquet(fact), Seq("event_type"),
      Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq("event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"))
    IndexRewrite.install(spark)
    assert(!grouped(fact).queryExecution.executedPlan.toString.contains("/fact"),
      "registered index should serve")

    // facts change OUTSIDE the maintenance loop: half the rows dropped
    ev.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(fact)
    val after = grouped(fact)
    assert(after.queryExecution.executedPlan.toString.contains("/fact"),
      "stale index must NOT serve")
    val want = ev.filter(col("event_id") % 2 === 0).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .orderBy("event_type").collect().toSeq
    assert(after.collect().toSeq == want, "declined query must read new facts")

    // kill-switch: documented unguarded behavior (serves the stale index)
    spark.conf.set("spark.graft.indexFreshnessCheck", "false")
    try assert(!grouped(fact).queryExecution.executedPlan.toString.contains("/fact"))
    finally spark.conf.unset("spark.graft.indexFreshnessCheck")

    // rebuilding + re-registering against the new facts resumes serving
    GroupIndex.buildTo(spark.read.parquet(fact), Seq("event_type"),
      Seq("value"), s"$root/g2")
    IndexCatalog.registerGroup(fact, Seq("event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g2"))
    val again = grouped(fact)
    assert(!again.queryExecution.executedPlan.toString.contains("/fact"),
      "re-registered index should serve")
    assert(again.collect().toSeq == want)
    spark.catalog.dropTempView("fr_q")
    IndexCatalog.clear()
  }

  test("a stale segment (bitmap) index declines the same way") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id")
    val root = graft.streaming.Ingest.scratch("idx_fresh_s")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    Bitmap.segmentIndex(spark.read.parquet(fact), "event_type", "user_id")
      .write.parquet(s"$root/b")
    IndexCatalog.register(fact, "event_type", "user_id",
      spark.read.parquet(s"$root/b"))
    IndexRewrite.install(spark)
    def q() = {
      spark.read.parquet(fact).createOrReplaceTempView("fr_s")
      spark.sql("SELECT event_type AS seg, count(DISTINCT user_id) AS cnt " +
        "FROM fr_s GROUP BY event_type ORDER BY seg")
    }
    assert(q().queryExecution.executedPlan.toString.contains("/b"),
      "registered index should serve")
    ev.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(fact)
    val after = q()
    assert(after.queryExecution.executedPlan.toString.contains("/fact"),
      "stale index must NOT serve")
    val want = ev.filter(col("event_id") % 2 === 0)
      .groupBy(col("event_type").as("seg"))
      .agg(countDistinct("user_id").as("cnt")).orderBy("seg").collect().toSeq
    assert(after.collect().toSeq == want)
    spark.catalog.dropTempView("fr_s")
    IndexCatalog.clear()
  }

  test("mutation paths warn IMMEDIATELY when the touched fact table has a " +
    "registered index (not silently at the next query)") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "user_id", "value")
    val root = graft.streaming.Ingest.scratch("idx_mut_warn")
    val fact = s"$root/fact"
    ev.write.parquet(fact)
    GroupIndex.buildTo(spark.read.parquet(fact), Seq("event_type"),
      Seq("value"), s"$root/g")
    IndexCatalog.registerGroup(fact, Seq("event_type"), Set.empty,
      Seq("value"), spark.read.parquet(s"$root/g"))
    val factsDf = spark.read.parquet(fact)
    // capture stderr around a PQL write over the indexed facts
    def capturing(f: => Unit): String = {
      val buf = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      try f finally System.setErr(old)
      new String(buf.toByteArray, "UTF-8")
    }
    val out = capturing {
      new graft.pql.Compiler(factsDf)
        .write(graft.pql.Parser.parseOne("Delete(Row(event_type='click'))"))
        .count(): Unit
    }
    assert(out.contains("mutation touched indexed fact table") &&
      out.contains("STALE"), s"expected immediate warning, got: '$out'")
    // once per path: a second write over the same facts stays quiet
    val out2 = capturing {
      new graft.pql.Compiler(factsDf)
        .write(graft.pql.Parser.parseOne("Delete(Row(event_type='view'))"))
        .count(): Unit
    }
    assert(!out2.contains("mutation touched"), s"second warn: '$out2'")
    // an UNINDEXED table never warns
    val out3 = capturing {
      new graft.pql.Compiler(Tables.load(spark, sfDir, "nation"))
        .write(graft.pql.Parser.parseOne("Set(901, n_regionkey=7)"))
        .count(): Unit
    }
    assert(!out3.contains("mutation touched"), s"unindexed warn: '$out3'")
    IndexCatalog.clear()
  }
}
