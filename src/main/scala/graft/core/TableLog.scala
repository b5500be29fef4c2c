package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Log-structured DML state for session tables: Delta Lake's merge-on-read
  * model rebuilt on temp views, replacing the round-1 snapshot rewrite that
  * re-materialized the WHOLE table on every statement.
  *
  * The reference mutates per-shard roaring fragments in place under an RBF
  * transaction (`reference/rbf/`, `reference/executor.go:6194` Set) — point
  * writes cost O(write), not O(table). The Spark-idiomatic equivalent of
  * that property is a log-structured table: a large stable *base* plus a
  * small *overlay* of upserted rows and a *tombstone* set of deleted ids.
  *
  *  - write cost   = O(delta): only the overlay/tombstones (re-)materialize
  *    per statement, never the base;
  *  - read cost    = base scan + two anti-joins whose right sides are small
  *    → AQE broadcasts them (no base shuffle);
  *  - plan depth   = CONSTANT in statement count (leaves are checkpointed),
  *    so chained DML can't stack an unbounded analysis tree;
  *  - compaction   = after `compactAfter` statements the merged state is
  *    materialized as the new base — the same rewrite the old code did
  *    per-statement, now amortized 1/compactAfter.
  *
  * Invariant: overlay and tombstones are disjoint by `_id`, so the merged
  * view is `base ∖ tombstones ∖ overlayIds ∪ overlay` with no double
  * filtering. DELETE-then-INSERT of the same id resurrects the record
  * (upsert anti-removes the tombstone); INSERT-then-DELETE tombstones the
  * base row AND drops the overlay row.
  *
  * A statement on a table whose temp view was re-registered behind our back
  * (CREATE TABLE over an existing name, a test registering parquet directly)
  * is detected via canonicalized-plan comparison and resets the log onto the
  * current view — the view is always the source of truth.
  */
object TableLog {

  /** Statements between compactions; small enough that ≤16 broadcast-side
    * deltas never grow the read plan meaningfully, large enough that the
    * O(table) rewrite is paid on 6% of statements, not 100%. */
  @volatile var compactAfter: Int = 16

  private final case class State(
      base: DataFrame,
      overlay: Option[DataFrame],    // latest-wins upserted rows; None = empty
      tombstones: Option[DataFrame], // single `_id` column; None = empty
      depth: Int,                    // statements since last compaction
      registered: LogicalPlan)       // canonicalized plan we last put in the view

  private val states =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), State]

  private def key(spark: SparkSession, name: String) = (spark, name.toLowerCase)

  private def hasId(df: DataFrame): Boolean = df.columns.contains("_id")

  private def canon(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed.canonicalized

  private def merged(st: State): DataFrame = {
    val afterTomb = st.tombstones match {
      case Some(t) => st.base.join(t, Seq("_id"), "left_anti")
      case None    => st.base
    }
    st.overlay match {
      case Some(o) =>
        if (hasId(st.base) && hasId(o))
          afterTomb.join(o.select("_id"), Seq("_id"), "left_anti").unionByName(o)
        else afterTomb.unionByName(o)
      case None => afterTomb
    }
  }

  /** Register the merged plan as the table's temp view and record the state.
    * Compacts first when the statement budget is spent. */
  private def commit(spark: SparkSession, name: String, st0: State): Unit = {
    val st =
      if (st0.depth >= compactAfter)
        State(merged(st0).localCheckpoint(), None, None, 0, st0.registered)
      else st0
    val view = merged(st)
    view.createOrReplaceTempView(name)
    states.put(key(spark, name), st.copy(registered = canon(view)))
  }

  /** Current log state for `name`, resetting onto the live view if someone
    * re-registered it without going through us. */
  private def stateOf(spark: SparkSession, name: String): State = {
    val cur = spark.table(name)
    val existing = Option(states.get(key(spark, name)))
      .filter(st => scala.util.Try(canon(cur) == st.registered).getOrElse(false))
    existing.getOrElse(State(cur, None, None, 0, canon(cur)))
  }

  /** Swap in a whole new table state (CREATE TABLE, COPY TO, ALTER —
    * schema changes are honest O(table) rewrites, as in Delta).
    * `checkpoint` materializes first so the view never references itself. */
  def replace(spark: SparkSession, name: String, df: DataFrame,
              checkpoint: Boolean): Unit = {
    val base = if (checkpoint) df.localCheckpoint() else df
    base.createOrReplaceTempView(name)
    states.put(key(spark, name), State(base, None, None, 0, canon(base)))
  }

  /** Upsert-by-`_id`: incoming replaces same-id rows (mutex replace on every
    * field, `reference/field.go:352-365`), resurrects tombstoned ids, appends
    * the rest. Cost: materializes `incoming` + new overlay/tombstones only. */
  def upsert(spark: SparkSession, name: String, incoming: DataFrame): Unit = {
    val st = stateOf(spark, name)
    val next =
      if (!hasId(st.base) || !hasId(incoming)) {
        // keyless table: INSERT is append
        val o = st.overlay.map(_.unionByName(incoming)).getOrElse(incoming)
          .localCheckpoint()
        st.copy(overlay = Some(o), depth = st.depth + 1)
      } else {
        val inc = incoming.localCheckpoint() // reused by the joins below
        val ids = inc.select("_id")
        val o = st.overlay match {
          case Some(prev) => prev.join(ids, Seq("_id"), "left_anti")
            .unionByName(inc).localCheckpoint()
          case None => inc
        }
        val t = st.tombstones.map(
          _.join(ids, Seq("_id"), "left_anti").localCheckpoint())
        st.copy(overlay = Some(o), tombstones = t, depth = st.depth + 1)
      }
    commit(spark, name, next)
  }

  /** DELETE: `cond=None` truncates; a predicate evaluates once over the
    * merged view (one read — the unavoidable cost of finding matches) but
    * materializes only the matching ids, Delta-deletion-vector style. */
  def delete(spark: SparkSession, name: String, cond: Option[Column]): Unit = {
    val st = stateOf(spark, name)
    cond match {
      case None =>
        replace(spark, name,
          emptyLike(spark, merged(st).schema), checkpoint = false)
      case Some(w) =>
        val m = merged(st)
        val hit = coalesce(w, lit(false))
        if (!hasId(m)) {
          // keyless: no id to tombstone — filtered rewrite is the honest cost
          replace(spark, name, m.filter(!hit), checkpoint = true)
        } else {
          val ids = m.filter(hit).select("_id").localCheckpoint()
          val t = st.tombstones.map(_.unionByName(ids).localCheckpoint())
            .getOrElse(ids)
          val o = st.overlay.map(
            _.join(ids, Seq("_id"), "left_anti").localCheckpoint())
          commit(spark, name,
            st.copy(overlay = o, tombstones = Some(t), depth = st.depth + 1))
        }
    }
  }

  /** Drop all log state for a table (DROP TABLE). */
  def forget(spark: SparkSession, name: String): Unit =
    states.remove(key(spark, name))

  private def emptyLike(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  // ------------------------------------------------------------- test hooks

  /** Statements since last compaction (spec: compaction cadence). */
  private[graft] def depthOf(spark: SparkSession, name: String): Int =
    Option(states.get(key(spark, name))).map(_.depth).getOrElse(0)

  /** Identity of the current base (spec: point writes must not touch it). */
  private[graft] def baseOf(spark: SparkSession, name: String): Option[DataFrame] =
    Option(states.get(key(spark, name))).map(_.base)
}
