package graft.core

import graft.SparkSpec
import graft.sql.Ddl
import org.apache.spark.sql.functions._

/** Log-structured DML state (TableLog): semantics match the naive snapshot
  * rewrite, while point writes stay O(delta) — the base is untouched and the
  * read plan doesn't grow with statement count. */
class TableLogSpec extends SparkSpec {

  private def rows(name: String): Set[(Long, String)] =
    spark.table(name).collect()
      .map(r => (r.getLong(r.fieldIndex("_id")),
        Option(r.getAs[String]("v")).getOrElse(""))).toSet

  private def planNodes(name: String): Int =
    spark.table(name).queryExecution.optimizedPlan.collect { case p => p }.size

  test("upsert / delete / resurrect sequence matches expected contents") {
    Ddl.run(spark, "CREATE TABLE tl_sem (_id ID, v STRING)")
    Ddl.run(spark, "INSERT INTO tl_sem VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(rows("tl_sem") === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // upsert replaces same-id row
    Ddl.run(spark, "INSERT INTO tl_sem VALUES (2, 'B')")
    assert(rows("tl_sem") === Set((1L, "a"), (2L, "B"), (3L, "c")))

    // delete tombstones base AND overlay rows
    Ddl.run(spark, "DELETE FROM tl_sem WHERE _id = 2")
    assert(rows("tl_sem") === Set((1L, "a"), (3L, "c")))

    // re-insert of a tombstoned id resurrects it
    Ddl.run(spark, "INSERT INTO tl_sem VALUES (2, 'bb')")
    assert(rows("tl_sem") === Set((1L, "a"), (2L, "bb"), (3L, "c")))

    // predicate delete over merged state (hits base row 1 + overlay row 2)
    Ddl.run(spark, "DELETE FROM tl_sem WHERE v < 'c'")
    assert(rows("tl_sem") === Set((3L, "c")))
    Ddl.run(spark, "DROP TABLE tl_sem")
  }

  test("point writes never re-materialize the base; plan depth is bounded") {
    Ddl.run(spark, "CREATE TABLE tl_plan (_id ID, v STRING)")
    Ddl.run(spark, "INSERT INTO tl_plan VALUES (0, 'seed')")
    val base0 = TableLog.baseOf(spark, "tl_plan").get
    val nodesAfter1 = planNodes("tl_plan")
    (1 to 10).foreach { i =>
      Ddl.run(spark, s"INSERT INTO tl_plan VALUES ($i, 'v$i')")
    }
    // 11 statements < compactAfter: base identity unchanged — every write
    // cost O(incoming), the old code would have rewritten the table 11×
    assert(TableLog.baseOf(spark, "tl_plan").get eq base0)
    // read plan doesn't stack with statement count (leaves are checkpointed)
    assert(planNodes("tl_plan") <= nodesAfter1 + 8)
    assert(spark.table("tl_plan").count() === 11)
    Ddl.run(spark, "DROP TABLE tl_plan")
  }

  test("compaction folds the log into a new base after compactAfter statements") {
    val prev = TableLog.compactAfter
    TableLog.compactAfter = 4
    try {
      Ddl.run(spark, "CREATE TABLE tl_cmp (_id ID, v STRING)")
      (1 to 4).foreach { i =>
        Ddl.run(spark, s"INSERT INTO tl_cmp VALUES ($i, 'v$i')")
      }
      // 4th statement hit the threshold → depth reset, log folded
      assert(TableLog.depthOf(spark, "tl_cmp") === 0)
      assert(spark.table("tl_cmp").count() === 4)
      // and the next write starts a fresh log on the compacted base
      Ddl.run(spark, "INSERT INTO tl_cmp VALUES (5, 'v5')")
      assert(TableLog.depthOf(spark, "tl_cmp") === 1)
      assert(spark.table("tl_cmp").count() === 5)
      Ddl.run(spark, "DROP TABLE tl_cmp")
    } finally TableLog.compactAfter = prev
  }

  test("opt-in clusterBy lays base pieces out range-clustered on the key") {
    val prev = TableLog.compactAfter
    val wh = java.nio.file.Files.createTempDirectory("graft-tl-clu").toString
    TableLog.compactAfter = 2
    spark.conf.set("spark.graft.warehouse", wh)
    spark.conf.set("spark.graft.layout.clusterBy.tl_clu", "v")
    // tiny test rows: keep AQE from coalescing the range exchange to one
    // file, or there is no multi-file layout to assert on
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      Ddl.run(spark, "CREATE TABLE tl_clu (_id ID, v STRING)")
      // interleaved key arrival: without clustering every file would span
      // the whole key domain
      val vals = (1 to 40).map(i => s"($i, 'k${i % 8}')").mkString(", ")
      Ddl.run(spark, s"INSERT INTO tl_clu VALUES $vals")
      Ddl.run(spark, "INSERT INTO tl_clu VALUES (41, 'k0')") // trips compaction
      assert(TableLog.depthOf(spark, "tl_clu") === 0)
      assert(spark.table("tl_clu").count() === 41)
      // the compacted base piece's files carry tight, non-overlapping key
      // ranges — the property refoldMutation's IN-prune needs
      val baseDirs = new java.io.File(wh, "tl_clu").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("base-"))
        .sortBy(_.getName.stripPrefix("base-").toLong)
      val parts = baseDirs.last.listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(parts.length > 1, "need >1 file to check clustering")
      val ranges = parts.map { p =>
        val r = spark.read.parquet(p).agg(min("v"), max("v")).head()
        (r.getString(0), r.getString(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: ${ranges.mkString(", ")}")
      }
      Ddl.run(spark, "DROP TABLE tl_clu")
    } finally {
      TableLog.compactAfter = prev
      spark.conf.unset("spark.graft.layout.clusterBy.tl_clu")
      spark.conf.unset("spark.graft.warehouse")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }

  test("external view re-registration resets the log onto the live view") {
    Ddl.run(spark, "CREATE TABLE tl_ext (_id ID, v STRING)")
    Ddl.run(spark, "INSERT INTO tl_ext VALUES (1, 'a')")
    // someone replaces the view without going through TableLog
    spark.range(5).select(col("id").as("_id"), lit("x").as("v"))
      .createOrReplaceTempView("tl_ext")
    Ddl.run(spark, "INSERT INTO tl_ext VALUES (99, 'y')")
    assert(spark.table("tl_ext").count() === 6) // 5 live + 1, not 1 + 1
    Ddl.run(spark, "DROP TABLE tl_ext")
  }

  test("DELETE without WHERE truncates; keyless tables append on insert") {
    Ddl.run(spark, "CREATE TABLE tl_tr (_id ID, v STRING)")
    Ddl.run(spark, "INSERT INTO tl_tr VALUES (1, 'a'), (2, 'b')")
    Ddl.run(spark, "DELETE FROM tl_tr")
    assert(spark.table("tl_tr").count() === 0)
    // insert after truncate works on the fresh empty base
    Ddl.run(spark, "INSERT INTO tl_tr VALUES (7, 'z')")
    assert(rows("tl_tr") === Set((7L, "z")))
    Ddl.run(spark, "DROP TABLE tl_tr")
  }
}
