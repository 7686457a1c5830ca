package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Event-time semantics pinned against batch equivalents (unified batch/
  * streaming semantics is the test: same operator, same answer). */
class EventTimeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked windowed counts over a stream equal the batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2026-01-01 10:00:05"), 1L), (ts("2026-01-01 10:00:55"), 1L),
      (ts("2026-01-01 10:01:10"), 2L), (ts("2026-01-01 10:02:30"), 1L),
      (ts("2026-01-01 10:02:45"), 2L), (ts("2026-01-01 10:05:00"), 1L))
    val stream = MemoryStream[(Timestamp, Long)]
    stream.addData(rows: _*)
    val streamed = EventTime.windowedCounts(
      stream.toDF().toDF("ts", "user_id"), "ts", "user_id", "1 minute", "10 minutes")
    val q = streamed.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    // AvailableNow terminates on its own; a short racy timeout made a slow
    // co-tenant window read an EMPTY sink (r4 flake) — wait long and assert
    // the query really finished so a timeout fails as a timeout
    assert(q.awaitTermination(600000), "windowed-count stream did not finish in 600s")
    val got = spark.table("win_counts")
      .select(col("win_start").cast("string"), col("user_id"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    val want = EventTime.windowedCounts(
      rows.toDF("ts", "user_id"), "ts", "user_id", "1 minute", "10 minutes")
      .select(col("win_start").cast("string"), col("user_id"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("stateful streaming sessionization equals the batch session count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: two sessions (gap 2000s > 1800s); user 2: one session
    val events = Seq(
      EventTime.SessionEvent(1L, 1000.0), EventTime.SessionEvent(1L, 1500.5),
      EventTime.SessionEvent(1L, 3501.0), EventTime.SessionEvent(2L, 50.0),
      EventTime.SessionEvent(2L, 100.0))
    val stream = MemoryStream[EventTime.SessionEvent]
    stream.addData(events: _*)
    val out = EventTime.sessionizeStream(stream.toDS(), gapSec = 1800.0)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "sessionize stream did not finish in 600s")
    val got = spark.table("sessions")
      .groupBy("user_id").agg(max("n_sessions").as("s"), max("n_events").as("e"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (2L, 1L, 2L)))
    // pure fold agrees
    assert(EventTime.foldSessions(1800.0)(
      events.filter(_.user_id == 1L).iterator) == ((2L, 3L)))
  }
}
