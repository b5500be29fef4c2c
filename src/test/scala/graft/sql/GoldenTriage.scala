package graft.sql

/** Triage driver for the golden corpus port: parse the reference def files,
  * run every case through the engine, and bucket failures so divergences can
  * be fixed (or documented) wholesale. `Test/runMain graft.sql.GoldenTriage
  * [parse|run] [filterSubstring]`. */
object GoldenTriage {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("parse")
    val tests = GoldenDefs.loadCorpus()
    val nSql = tests.map(_.sqlTests.map(_.sqls.size).sum).sum
    val nPql = tests.map(_.pqlTests.map(_.pqls.size).sum).sum
    val nCases = tests.map(_.sqlTests.size).sum
    println(s"parsed ${tests.size} TableTests, $nCases SQL cases, $nSql SQL statements, $nPql PQL statements")
    if (mode == "parse") {
      // dump a few samples for eyeballing
      for (t <- tests.take(3)) {
        println(s"== ${t.varName} (${t.name}) fixture=${t.fixture.map(_.name)}")
        t.fixture.foreach { f => println("  " + f.createTable); println("  " + f.insertInto().take(200)) }
        for (c <- t.sqlTests.take(2))
          println(s"  case ${c.name} compare=${c.compare} err=${c.expErr} sqls=${c.sqls.take(1)} rows=${c.rows.map(_.take(2))}")
      }
      return
    }
    val filter = args.drop(1).headOption
    GoldenRunner.runAll(tests, filter, verbose = true)
  }
}
