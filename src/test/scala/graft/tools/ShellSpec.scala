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
}
