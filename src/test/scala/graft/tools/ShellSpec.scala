package graft.tools

import graft.SparkSpec
import java.nio.file.Files

/** The fbsql-style shell's repl loop driven headlessly: meta-commands for
  * warehouse selection and backup/restore (`reference/ctl/backup.go` verbs)
  * round-trip a table through a tar into a second warehouse. */
class ShellSpec extends SparkSpec {

  private def run(script: String): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    Shell.repl(spark, sfDir,
      new java.io.BufferedReader(new java.io.StringReader(script)), out)
    new String(bos.toByteArray, "UTF-8")
  }

  test(":set warehouse / :backup / :restore round-trip through the repl") {
    val wh1 = Files.createTempDirectory("graft-shell-wh1").toString
    val wh2 = Files.createTempDirectory("graft-shell-wh2").toString
    val tar = Files.createTempFile("graft-shell", ".tar").toString
    try {
      // backup without a warehouse is a clear error, not a stack trace
      // (must run BEFORE :set warehouse — the conf sticks to the session)
      val o0 = run(":backup /tmp/nope.tar\n:quit\n")
      assert(o0.contains("set spark.graft.warehouse first"), o0)

      val o1 = run(
        s""":set warehouse $wh1
           |CREATE TABLE shellt (_id ID, v INT)
           |INSERT INTO shellt VALUES (1, 5), (2, 6)
           |:backup $tar
           |:quit
           |""".stripMargin)
      assert(o1.contains("ok - DML and :backup/:restore"), o1)
      assert(raw"\d+ entries -> ".r.findFirstIn(o1).isDefined, o1)

      val s2 = spark.newSession()
      val bos = new java.io.ByteArrayOutputStream()
      Shell.repl(s2, sfDir, new java.io.BufferedReader(new java.io.StringReader(
        s""":set warehouse $wh2
           |:restore $tar
           |:quit
           |""".stripMargin)), new java.io.PrintStream(bos, true, "UTF-8"))
      val o2 = new String(bos.toByteArray, "UTF-8")
      assert(o2.contains("restored:") && o2.contains("shellt"), o2)
      assert(s2.table("shellt").count() == 2)
    } finally {
      spark.conf.unset("spark.graft.warehouse")
      scala.util.Try(graft.sql.Ddl.run(spark, "DROP TABLE shellt"))
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p))
          scala.jdk.CollectionConverters.IteratorHasAsScala(
            Files.list(p).iterator).asScala.toList.foreach(rm)
        Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(wh1)); rm(java.nio.file.Paths.get(wh2))
      Files.deleteIfExists(java.nio.file.Paths.get(tar))
    }
  }

  test("\\d lists relations; \\d <table> describes columns (meta.go:503-534)") {
    val o = run("\\d\n\\d nation\n\\q\n")
    assert(o.contains("nation") && o.contains("lineitem"), o)
    // SHOW COLUMNS wire shape: the described table's columns appear as rows
    assert(o.contains("n_name") && o.contains("n_regionkey"), o)
  }

  test("\\dt and \\dv list tables and views; \\echo prints") {
    val o = run(
      """CREATE VIEW shell_v AS SELECT r_name FROM region
        |\dv
        |\dt
        |\echo done-echo
        |\q
        |""".stripMargin)
    assert(o.contains("shell_v"), o)          // fb_views row
    assert(o.contains("region"), o)           // SHOW TABLES row
    assert(o.contains("done-echo"), o)
    graft.sql.Ddl.run(spark, "DROP VIEW shell_v")
  }

  test("\\x expanded display and \\timing wrap query output (writer.go:80)") {
    val o = run(
      """\x on
        |SELECT r_regionkey, r_name FROM region WHERE r_regionkey = 0
        |\x off
        |\timing on
        |SELECT count(*) AS n FROM region
        |\q
        |""".stripMargin)
    assert(o.contains("Expanded display is on."), o)
    assert(o.contains("-[ RECORD 1 ]-"), o)
    assert(o.contains("Timing is on."), o)
    assert(raw"Execution time: \d+μs".r.findFirstIn(o).isDefined, o)
  }

  test("\\o redirects query output to a file; bare \\o resets (meta.go:651)") {
    val f = Files.createTempFile("graft-shell-o", ".txt").toString
    try {
      val o = run(
        s"""\\o $f
           |SELECT r_name FROM region ORDER BY r_regionkey
           |\\qecho sink-line
           |\\o
           |SELECT 1 AS back_on_term
           |\\q
           |""".stripMargin)
      val redirected = new String(Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      assert(redirected.contains("AFRICA") && redirected.contains("sink-line"),
        redirected)
      assert(!o.contains("AFRICA"), o)         // rows went to the file
      assert(o.contains("back_on_term"), o)    // reset restored the terminal
    } finally Files.deleteIfExists(java.nio.file.Paths.get(f))
  }

  test("\\i executes statements from a file (meta.go:411-466)") {
    val f = Files.createTempFile("graft-shell-i", ".sql")
    Files.write(f,
      """SELECT count(*) AS nat_count FROM nation
        |\echo included-ran
        |""".stripMargin.getBytes("UTF-8"))
    try {
      val o = run(s"\\i $f\n\\q\n")
      assert(o.contains("nat_count"), o)
      assert(o.contains("included-ran"), o)
      // a missing file is an error message, not a stack trace
      val o2 = run("\\i /nonexistent/nope.sql\n\\q\n")
      assert(o2.contains("error: opening"), o2)
    } finally Files.deleteIfExists(f)
  }
}
