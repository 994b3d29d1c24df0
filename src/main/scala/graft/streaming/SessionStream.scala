package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the continuous twin of the batch
  * `q20_sessionize` operator, built on Structured Streaming's
  * merging `session_window` state store plus an event-time watermark.
  *
  * ONE definition serves both executions: [[sessionize]] is applied
  * unchanged to a batch DataFrame (where the watermark is a no-op and
  * every session emits) and to a `readStream` DataFrame (where
  * sessions are held in versioned state, merged as events extend or
  * bridge them, and emitted in APPEND mode only once the watermark
  * proves no more events can join — exactly the semantics a
  * downstream training-data consumer needs: each session row is
  * final the moment it appears).
  *
  * Scale shape: state is keyed by (user_id, open session), so memory
  * is proportional to ACTIVE sessions, not history — the watermark
  * evicts closed sessions every trigger. The shuffle is the same
  * single hashpartitioning(user_id) exchange as the batch plan; late
  * events inside the watermark re-open and re-merge their session
  * instead of producing a duplicate row, and events later than the
  * watermark are dropped — the documented, bounded-staleness
  * trade-off every production sessionizer makes.
  *
  * Reference behavior (sessionize-by-gap over a CDC/event feed) per
  * the survey's streaming-aggregation rows; the session-window state
  * machine itself is Spark's, not hand-rolled — custom state via
  * flatMapGroupsWithState is reserved for semantics Spark lacks
  * (see `CdcStream.dedupMonotonic`).
  */
object SessionStream {

  /** 30-minute-gap sessions per user: `(user_id, session_start_ms,
    * n_events, value_cents)` — identical columns to `q20_sessionize`.
    * Pass any watermark-annotated streaming frame or a plain batch
    * frame of the `events` schema.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.queries.Q.cents(col("value"))).as("value_cents"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"), col("value_cents"))

  /** [[sessionize]] over a stream, with the event-time watermark that
    * lets the state store finalize (and append-emit) sessions whose
    * gap has provably passed.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame =
    sessionize(events.withWatermark("ts", watermark), gapMinutes)
}
