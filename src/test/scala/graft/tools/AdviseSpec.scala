package graft.tools

import graft.SparkSpec

/** `Advise --from-log`: production traffic captured by the facade's
  * query log (`spark.graft.queryLog`) advises indexes directly — SQL and
  * PQL records compile (lazily, never executed), writes and junk lines are
  * skipped, repeats dedupe, and the recommendation covers the workload. */
class AdviseSpec extends SparkSpec {

  test("parseLog: extracts SQL + [index]PQL bodies, dedupes repeats, " +
    "ignores non-log lines") {
    val lines = Seq(
      "GRPC: 10.0.0.1, [k6/0.42], QuerySQL, u1, alice, SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type",
      "26/08/16 12:00:00 WARN SomeSparkNoise: not a query line",
      "GRPC: , [], QueryPQLUnary, , , [events]GroupBy(Rows(event_type))",
      "GRPC: , [], QueryPQL, , , [events]Set(1, event_type='x')",
      // exact repeat of the first line: production dashboards replay
      "GRPC: 10.0.0.1, [k6/0.42], QuerySQL, u1, alice, SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type")
    val parsed = Advise.parseLog(lines)
    assert(parsed.size == 3, parsed.toString)
    assert(parsed.count(_._1 == false) == 1) // one distinct SQL
    assert(parsed.collect { case (true, idx, q) => (idx, q) }.toSet ==
      Set(("events", "GroupBy(Rows(event_type))"),
          ("events", "Set(1, event_type='x')")))
  }

  test("--from-log advises from a captured log: PQL+SQL cluster to one " +
    "covering recommendation, write calls are skipped unexecuted") {
    val log = java.nio.file.Files.createTempFile("graft-advise", ".log")
    java.nio.file.Files.writeString(log, Seq(
      "GRPC: , [], QuerySQL, , , SELECT event_type, COUNT(*) AS c, SUM(value) AS sv FROM events GROUP BY event_type",
      "GRPC: , [], QueryPQL, , , [events]GroupBy(Rows(event_type), Rows(user_id))",
      "GRPC: , [], QueryPQL, , , [events]Delete(Row(event_type='view'))",
      "GRPC: , [], QueryPQL, , , GroupBy(Rows(event_type))",
      "stray non-log line").mkString("\n"))
    val before = graft.core.Tables.load(spark, sfDir, "events").count()
    val report = Advise.advise(spark, sfDir, dialect = false,
      fromLog = true, Seq(log.toString))
    assert(report.contains("skipped (write call)"), report)
    assert(report.contains("skipped (PQL without [index] tag)"), report)
    assert(report.contains("1 recommendation(s):"), report)
    assert(report.contains("event_type") && report.contains("user_id"),
      report)
    // the write record was never executed: the table is untouched
    assert(graft.core.Tables.load(spark, sfDir, "events").count() == before)
  }

  test("--from-log is FREQUENCY-WEIGHTED: hit counts survive dedupe, " +
    "recommendations report the traffic share they serve and rank " +
    "highest-traffic first") {
    val log = java.nio.file.Files.createTempFile("graft-advise-f", ".log")
    val hot = "GRPC: , [], QuerySQL, , , SELECT event_type, COUNT(*) AS c " +
      "FROM events GROUP BY event_type"
    val cold = "GRPC: , [], QuerySQL, , , SELECT n_name, COUNT(*) AS c " +
      "FROM nation GROUP BY n_name"
    // the dashboard replays its query; the ad-hoc one runs once
    java.nio.file.Files.writeString(log,
      (Seq.fill(3)(hot) :+ cold).mkString("\n"))
    val report = Advise.advise(spark, sfDir, dialect = false,
      fromLog = true, Seq(log.toString))
    assert(report.contains("×3"), report) // per-query hit count in the table
    assert(report.contains("2 recommendation(s):"), report)
    val lines = report.linesIterator.filter(_.contains("GroupIndex over")).toSeq
    assert(lines.length == 2, report)
    // hot cluster first (75% of 4 captured hits), cold second (25%)
    assert(lines(0).contains("event_type") &&
      lines(0).contains("3 hits, 75.0% of captured traffic"), lines(0))
    assert(lines(1).contains("n_name") &&
      lines(1).contains("1 hits, 25.0% of captured traffic"), lines(1))
  }

  test("--from-log NEVER executes captured statements: SQL writes/DDL are " +
    "skipped like PQL writes, and an eager-compiling PQL read " +
    "(Percentile) triggers ZERO Spark jobs") {
    val log = java.nio.file.Files.createTempFile("graft-advise-w", ".log")
    java.nio.file.Files.writeString(log, Seq(
      // Ddl.run would EXECUTE these eagerly if they ever compiled; the
      // nonexistent table means accidental execution would also surface
      // as a "does not compile" line rather than a skip — the assertion
      // distinguishes the two
      "GRPC: , [], QuerySQL, , , INSERT INTO advise_guard_t VALUES (1)",
      "GRPC: , [], QuerySQL, , , DROP TABLE advise_guard_t",
      "HTTP: 10.0.0.1, [curl], /sql, , , DELETE FROM advise_guard_t WHERE 1 = 1",
      // Percentile's compile path runs a driver-side bisection of Count
      // probes (Compiler.percentileCall .head()) — a production log line
      // must not make the advisor execute production-scale scans
      "GRPC: , [], QueryPQL, , , [events]Percentile(field=value, nth=50)",
      // ExternalLookup compiles eagerly too (temp view + external engine)
      "GRPC: , [], QueryPQL, , , [events]ExternalLookup(All(), query='SELECT 1')")
      .mkString("\n"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    val report = try {
      val r = Advise.advise(spark, sfDir, dialect = false,
        fromLog = true, Seq(log.toString))
      Thread.sleep(500) // listener bus drain window
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(report.contains("skipped (write/DDL): INSERT INTO"), report)
    assert(report.contains("skipped (write/DDL): DROP TABLE"), report)
    assert(report.contains("skipped (write/DDL): DELETE FROM"), report)
    assert(report.contains(
      "skipped (not shape-analyzable without executing: Percentile)"), report)
    assert(report.contains(
      "skipped (not shape-analyzable without executing: ExternalLookup)"),
      report)
    assert(report.contains("no index-able queries"), report)
    assert(jobs.get() == 0, s"log replay executed ${jobs.get()} Spark job(s)")
  }

  test("--build materializes + registers the recommendation: the advised " +
    "workload serves scan-free immediately afterwards") {
    val log = java.nio.file.Files.createTempFile("graft-advise-b", ".log")
    val sql = "SELECT event_type, COUNT(*) AS c, SUM(value) AS sv " +
      "FROM events GROUP BY event_type"
    java.nio.file.Files.writeString(log,
      s"GRPC: , [], QuerySQL, , , $sql")
    val dir = java.nio.file.Files.createTempDirectory("graft-advised").toString
    val report = Advise.advise(spark, sfDir, dialect = false,
      fromLog = true, Seq(log.toString), Some(dir))
    assert(report.contains(s"built + registered: $dir/advised_g0"), report)
    // the logged query now rides the index it advised
    val df = graft.sql.GraftSql.sql(spark, sfDir, sql)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("advised_g0"), phys)
    assert(!phys.contains("events.parquet"), phys)
    assert(df.collect().length == 5)
    graft.plans.IndexCatalog.clear()
  }
}
