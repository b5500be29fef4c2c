package graft.core

import graft.SparkSpec
import graft.sql.Ddl
import java.nio.file.Files

/** Durable warehouse mode: with `spark.graft.warehouse` set, every DML
  * materialization is parquet + manifest, and a FRESH SparkSession (empty
  * temp-view catalog — the restart case) restores tables, field metadata,
  * and views via Ddl.restoreSession. Point writes must stay O(delta). */
class DurabilitySpec extends SparkSpec {

  private def withWarehouse[A](f: String => A): A = {
    val wh = Files.createTempDirectory("graft-wh-").toString
    spark.conf.set("spark.graft.warehouse", wh)
    try f(wh)
    finally {
      spark.conf.unset("spark.graft.warehouse")
    }
  }

  test("CREATE + INSERT + DELETE survive a new SparkSession via restore") {
    withWarehouse { wh =>
      Ddl.run(spark, "CREATE TABLE dur_t (_id ID, v STRING, n INT MIN 0 MAX 100)")
      Ddl.run(spark, "INSERT INTO dur_t VALUES (1, 'a', 5), (2, 'b', 6), (3, 'c', 7)")
      Ddl.run(spark, "INSERT INTO dur_t VALUES (2, 'B', 60)") // upsert
      Ddl.run(spark, "DELETE FROM dur_t WHERE _id = 3")
      Ddl.run(spark, "CREATE VIEW dur_v AS SELECT _id, n FROM dur_t WHERE n > 5")

      // a fresh session has its own (empty) temp-view catalog = restart
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.warehouse", wh)
      assert(!s2.catalog.tableExists("dur_t"))
      val restored = Ddl.restoreSession(s2)
      assert(restored.contains("dur_t"))

      val got = s2.table("dur_t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((1L, "a", 5L), (2L, "B", 60L)))
      // view replayed
      assert(s2.table("dur_v").collect().map(_.getLong(0)).toSet === Set(2L))
      // declared bounds survive: out-of-range INSERT still rejected
      val e = intercept[Exception](
        Ddl.run(s2, "INSERT INTO dur_t VALUES (9, 'x', 999)"))
      assert(e.getMessage.toLowerCase.contains("out of range"))
      // and writes keep working after restore
      Ddl.run(s2, "INSERT INTO dur_t VALUES (4, 'd', 8)")
      assert(s2.table("dur_t").count() === 3)

      Ddl.run(s2, "DROP VIEW dur_v")
      Ddl.run(s2, "DROP TABLE dur_t")
      // the view/table were CREATED in the shared `spark` session — drop
      // there too, or a dangling view over the deleted warehouse leaks into
      // every later suite sharing the session (it made the facade's
      // shards/max probe fail suite-order-dependently)
      Ddl.run(spark, "DROP VIEW IF EXISTS dur_v")
      Ddl.run(spark, "DROP TABLE IF EXISTS dur_t")
    }
  }

  test("warehouse point writes leave the base piece untouched (O(delta))") {
    withWarehouse { _ =>
      Ddl.run(spark, "CREATE TABLE dur_p (_id ID, v STRING)")
      Ddl.run(spark, "INSERT INTO dur_p VALUES (0, 'seed')")
      val base0 = TableLog.baseOf(spark, "dur_p").get
      (1 to 5).foreach(i =>
        Ddl.run(spark, s"INSERT INTO dur_p VALUES ($i, 'v$i')"))
      assert(TableLog.baseOf(spark, "dur_p").get eq base0)
      assert(spark.table("dur_p").count() === 6)
      Ddl.run(spark, "DROP TABLE dur_p")
    }
  }

  test("compaction GCs stale piece dirs; restore sees only the live state") {
    withWarehouse { wh =>
      TableLog.compactAfter = 4
      // zero retention grace: this test is single-threaded, and the point
      // is that superseded pieces ARE deleted once past the grace window
      spark.conf.set("spark.graft.gc.graceMs", "0")
      try {
        Ddl.run(spark, "CREATE TABLE dur_gc (_id ID, v STRING)")
        (1 to 9).foreach(i =>
          Ddl.run(spark, s"INSERT INTO dur_gc VALUES ($i, 'v$i')"))
        val pieces = Files.list(java.nio.file.Paths.get(wh, "dur_gc"))
          .filter(p => p.getFileName.toString.matches("(base|overlay|tomb)-\\d+"))
          .count()
        // two compactions happened; stale generations are gone
        assert(pieces <= TableLog.compactAfter + 2,
          s"expected GC'd piece dirs, found $pieces")
        val s2 = spark.newSession()
        s2.conf.set("spark.graft.warehouse", wh)
        Ddl.restoreSession(s2)
        assert(s2.table("dur_gc").count() === 9)
        Ddl.run(spark, "DROP TABLE dur_gc")
      } finally {
        TableLog.compactAfter = 16
        spark.conf.unset("spark.graft.gc.graceMs")
      }
    }
  }

  test("compacted base is range-partitioned and sorted on _id (file-stat pruning)") {
    withWarehouse { wh =>
      TableLog.compactAfter = 2
      try {
        Ddl.run(spark, "CREATE TABLE dur_lay (_id ID, v INT)")
        Ddl.run(spark, "INSERT INTO dur_lay VALUES " +
          (1 to 500).map(i => s"($i, $i)").mkString(", "))
        (1 to 3).foreach(i =>
          Ddl.run(spark, s"INSERT INTO dur_lay VALUES (${1000 + i}, $i)"))
        // find the newest base piece and read each part file independently:
        // ranges must be disjoint (range partitioning) and rows sorted
        import scala.jdk.CollectionConverters._
        val baseDir = Files.list(java.nio.file.Paths.get(wh, "dur_lay"))
          .iterator.asScala.toSeq
          .filter(_.getFileName.toString.startsWith("base-"))
          .maxBy(_.getFileName.toString.stripPrefix("base-").toLong)
        val parts = Files.list(baseDir).iterator.asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(_.toString)
        assert(parts.nonEmpty)
        val ranges = parts.toSeq.map { f =>
          val ids = spark.read.parquet(f)
            .select("_id").collect().map(_.getLong(0)).toSeq
          assert(ids == ids.sorted, s"file $f not sorted on _id")
          (ids.min, ids.max)
        }.sortBy(_._1)
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax < bMin, s"overlapping _id ranges across base files: $ranges")
          case _ =>
        }
        Ddl.run(spark, "DROP TABLE dur_lay")
      } finally TableLog.compactAfter = 16
    }
  }
}
