package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as a custom stateful operator.
  *
  * The reference has no streaming state machine — its closest notion is the
  * time-quantum view family (`reference/time.go:74-225`). Sessionization is
  * the canonical "operation a large-scale event pipeline needs" that Spark's
  * built-ins don't provide directly, so it's implemented per SURVEY §7.3
  * preference (c): typed `KeyValueGroupedDataset` state ops.
  *
  * One pure core ([[split]]) drives two execution shapes:
  *   - batch: `flatMapGroups` — each user's events arrive at once;
  *   - streaming: `flatMapGroupsWithState` with event-time timeout — open
  *     sessions live in the state store, closed sessions are appended when
  *     the gap is exceeded or the watermark passes (state stays bounded at
  *     100 TB: one small record per active user).
  */
object Sessionize {

  case class Ev(user_id: Long, event_id: Long, tsSec: Long)
  /** Streaming-side row: keeps the watermarked `ts` column intact (the
    * event-time watermark must reach the stateful operator unprojected). */
  case class EvT(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class Sess(user_id: Long, startSec: Long, endSec: Long, n: Long)
  /** Open-session state: first/last event second + count. */
  case class Open(startSec: Long, lastSec: Long, lastId: Long, n: Long)

  /** Pure gap-split: sorted events → (closed sessions, open tail). */
  def split(uid: Long, sorted: Seq[Ev], gapSec: Long,
      prior: Option[Open]): (Seq[Sess], Option[Open]) = {
    var open = prior
    val closed = Seq.newBuilder[Sess]
    sorted.foreach { e =>
      open match {
        case Some(o) if e.tsSec - o.lastSec <= gapSec =>
          open = Some(o.copy(lastSec = e.tsSec, lastId = e.event_id, n = o.n + 1))
        case Some(o) =>
          closed += Sess(uid, o.startSec, o.lastSec, o.n)
          open = Some(Open(e.tsSec, e.tsSec, e.event_id, 1))
        case None =>
          open = Some(Open(e.tsSec, e.tsSec, e.event_id, 1))
      }
    }
    (closed.result(), open)
  }

  private def toEv(df: DataFrame): Dataset[Ev] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id").cast("long"),
        col("event_id").cast("long"),
        col("ts").cast("long").as("tsSec"))
      .as[Ev]
  }

  /** Batch sessionization: all of a user's events in one group. Matches the
    * window-function formulation (lag + cumulative sum) row-for-row; the
    * typed-state path exists so the SAME core is exercised by the streaming
    * spec. */
  def sessionsBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toEv(events)
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val (closed, open) =
          split(uid, it.toSeq.sortBy(e => (e.tsSec, e.event_id)), gapSec, None)
        (closed ++ open.map(o => Sess(uid, o.startSec, o.lastSec, o.n))).iterator
      }
      .toDF()
  }

  /** Streaming sessionization: open sessions persist in the state store,
    * closed by gap or by event-time timeout once the watermark passes
    * lastSec + gap. Emits closed sessions (append mode). */
  def sessionsStream(events: DataFrame, gapSec: Long): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        col("event_id").cast("long"), col("ts"))
      .withWatermark("ts", "30 minutes")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator.single(Sess(uid, o.startSec, o.lastSec, o.n))
          } else {
            val evs = it.map(e =>
              Ev(e.user_id, e.event_id, e.ts.getTime / 1000L)).toSeq
            val (closed, open) = split(
              uid, evs.sortBy(e => (e.tsSec, e.event_id)), gapSec,
              state.getOption)
            open match {
              case Some(o) =>
                state.update(o)
                state.setTimeoutTimestamp((o.lastSec + gapSec) * 1000L + 1)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Roll sessions up to the reference-test summary shape. */
  def summarize(sessions: DataFrame): DataFrame =
    sessions.agg(count(lit(1)).as("n_sessions"),
      round(avg(col("n")), 4).as("avg_len"))
}
