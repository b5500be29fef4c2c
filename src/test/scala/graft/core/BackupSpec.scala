package graft.core

import graft.SparkSpec
import graft.sql.Ddl
import java.nio.file.{Files, Paths}

/** Warehouse backup/restore via a single tar archive
  * (`reference/ctl/backup.go` / `backup_tar.go` shape): a table's full
  * durable state (pieces + manifest + DDL metadata) round-trips through one
  * file into a FRESH warehouse dir, and a restored session serves identical
  * results. The archive is plain POSIX ustar — standard `tar` can list it. */
class BackupSpec extends SparkSpec {

  private def rm(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        Files.list(p).iterator).asScala.toList.foreach(rm)
    Files.deleteIfExists(p)
  }

  test("backup tar round-trips a warehouse; restored session serves identical results") {
    val wh1 = Files.createTempDirectory("graft-bk-src").toString
    val wh2 = Files.createTempDirectory("graft-bk-dst").toString
    val tar = Files.createTempFile("graft-backup", ".tar").toString
    spark.conf.set("spark.graft.warehouse", wh1)
    try {
      Ddl.run(spark, "CREATE TABLE bk_t (_id ID, v STRING, n INT MIN 0 MAX 1000)")
      Ddl.run(spark, "INSERT INTO bk_t VALUES " +
        (1 to 100).map(i => s"($i, 'v$i', ${i * 3})").mkString(", "))
      Ddl.run(spark, "DELETE FROM bk_t WHERE n > 270")
      val expect = spark.sql(
        "SELECT _id, v, n FROM bk_t ORDER BY _id").collect().toSeq
      assert(expect.length == 90)

      val entries = Backup.backup(wh1, tar)
      assert(entries.exists(_.endsWith("manifest.json")), entries.mkString(","))
      assert(entries.exists(_.contains("bk_t/")), entries.mkString(","))

      // interop: the archive is real ustar — system tar lists it
      val p = new ProcessBuilder("tar", "tf", tar).redirectErrorStream(true).start()
      val listing = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0 && listing.contains("manifest.json"), listing.take(300))

      val restored = Backup.restore(tar, wh2)
      assert(restored.sorted == entries.sorted)

      // the restart case: fresh session, restored warehouse
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.warehouse", wh2)
      val tables = Ddl.restoreSession(s2)
      assert(tables.contains("bk_t"), tables.mkString(","))
      val got = s2.sql("SELECT _id, v, n FROM bk_t ORDER BY _id").collect().toSeq
      assert(got == expect)
      // and the restored table keeps taking durable writes
      Ddl.run(s2, "INSERT INTO bk_t VALUES (500, 'after', 1)")
      assert(s2.sql("SELECT count(*) AS c FROM bk_t").head().getLong(0) == 91)
    } finally {
      spark.conf.unset("spark.graft.warehouse")
      scala.util.Try(Ddl.run(spark, "DROP TABLE bk_t"))
      rm(Paths.get(wh1)); rm(Paths.get(wh2)); Files.deleteIfExists(Paths.get(tar))
    }
  }

  test("backup concurrent with a write skips in-flight commit staging") {
    // found by tools/Soak: a backup walking the warehouse while a write was
    // mid-commit read a `_temporary` staging file that vanished between the
    // walk and the open. A consistent snapshot = committed pieces only.
    val wh = Files.createTempDirectory("graft-bk-race").toString
    val stage = Paths.get(wh, "t", "overlay-1", "_temporary", "0")
    Files.createDirectories(stage)
    Files.writeString(stage.resolve("part-in-flight.parquet"), "x" * 100)
    Files.createDirectories(Paths.get(wh, "t"))
    Files.writeString(Paths.get(wh, "t", "base-1.json"), "{}")
    val tar = Files.createTempFile("graft-bk-race", ".tar").toString
    try {
      val entries = Backup.backup(wh, tar)
      assert(entries.contains("t/base-1.json"))
      assert(!entries.exists(_.contains("_temporary")), entries)
    } finally { rm(Paths.get(wh)); Files.deleteIfExists(Paths.get(tar)) }
  }
}
