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
