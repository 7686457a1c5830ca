package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.OutputMode

/** Event-time streaming semantics (§2.11 upgrade path): the reference's
  * windows are COUNT-based micro-batches (ParaCOSM/CSM/matching/main.cpp:
  * 258,407 — a sliding window of w pending updates), because a C++ process
  * has no event-time machinery. The `input_hint` schema ships `warc_ts` /
  * `events.ts`, so the Spark-native engine also exposes true event-time
  * operators:
  *
  *  - `windowedCounts`: watermarked tumbling-window aggregation — late rows
  *    beyond the watermark are dropped by the engine, state is bounded
  *    (the 100 TB requirement: unbounded keys ⇒ bounded state via
  *    watermark eviction);
  *  - `sessionize`: gap-based session windows per user via
  *    flatMapGroupsWithState with event-time timeout — the stateful-operator
  *    form of the batch q_events_sessions query.
  *
  * Both run identically over a static DataFrame (batch mode) — Structured
  * Streaming's unified semantics — which is how the specs pin them against
  * the batch oracles.
  */
object EventTime {

  /** Tumbling event-time window counts with a watermark. `tsCol` must be a
    * timestamp column; works on both streaming and static frames. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermarkDelay: String): DataFrame = {
    val wm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    wm.groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))
  }

  final case class SessionEvent(user_id: Long, tsSec: Double)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

  /** Per-user session summary (gap-closed sessions, 1800s default) as a
    * stateful streaming operator. For STREAMING input wire this through
    * flatMapGroupsWithState; the pure function `foldSessions` is the state
    * transition both modes share. */
  def foldSessions(gapSec: Double)(events: Iterator[SessionEvent]): (Long, Long) = {
    var nSessions = 0L
    var nEvents = 0L
    var last = Double.NegativeInfinity
    events.toSeq.sortBy(_.tsSec).foreach { e =>
      if (e.tsSec - last > gapSec) nSessions += 1
      last = e.tsSec
      nEvents += 1
    }
    (nSessions, nEvents)
  }

  /** Streaming sessionization over Dataset[SessionEvent] (grouped by user).
    * ProcessingTimeTimeout keeps the example portable to AvailableNow
    * triggers used in tests; state is the running (lastTs, nSessions,
    * nEvents) triple — O(1) per user, the bounded-state requirement. */
  def sessionizeStream(events: Dataset[SessionEvent], gapSec: Double)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Double, Long, Long), SessionSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid: Long, rows: Iterator[SessionEvent],
              state: GroupState[(Double, Long, Long)]) =>
          var (last, nSess, nEv) = state.getOption.getOrElse(
            (Double.NegativeInfinity, 0L, 0L))
          rows.toSeq.sortBy(_.tsSec).foreach { e =>
            if (e.tsSec - last > gapSec) nSess += 1
            last = e.tsSec
            nEv += 1
          }
          state.update((last, nSess, nEv))
          Iterator(SessionSummary(uid, nSess, nEv))
      }
  }
}
