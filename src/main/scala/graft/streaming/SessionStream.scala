package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via
  * `flatMapGroupsWithState` — the arbitrary-state API for semantics
  * `session_window` can't express (here: emitting each closed session
  * exactly once, in append mode, as soon as it closes).
  *
  * Semantics match the batch `session_window(ts, 30 min)` exactly
  * (boundary INCLUSIVE: an event at precisely last+gap merges — see
  * Temporal.streamSession and the pinned TemporalSpec rule):
  *   - events within `gap` of the session's last event extend it;
  *   - a strictly-later event closes the old session and emits it;
  *   - the final session of a key closes when the event-time watermark
  *     passes last+gap (GroupStateTimeout.EventTimeTimeout), so state
  *     is bounded by the watermark like any windowed aggregation.
  *
  * Scale design: state is ONE small case class per active user (not per
  * event) in executor-local state stores, keyed by the shuffle on
  * user_id; per-batch work is a sort of that user's batch slice only.
  * Money math is exact: per-event values quantize to cents (HALF_UP,
  * same as CAST(x AS DECIMAL(18,2))) and accumulate in Long, so the
  * emitted total is bit-equal to the batch decimal sum regardless of
  * merge order.
  */
object SessionStream {

  /** One event after event-time derivation. `ts_utc` is the
    * watermark-tagged column (the unsupported-operation checker requires
    * it present in the stateful operator's input); `ts_us` is the same
    * instant as µs since epoch for exact state arithmetic.
    */
  case class SEvent(user_id: Long, ts_utc: java.sql.Timestamp, ts_us: Long,
      value: Double)

  /** Per-user open-session state: timestamps in µs, money in cents. */
  case class Open(start_us: Long, last_us: Long, n: Long, cents: Long)

  /** An emitted (closed) session — matches Temporal.streamSession's
    * output row shape.
    */
  case class Closed(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  private val GapUs = 30L * 60 * 1000000
  private val GapMs = 30L * 60 * 1000

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  private def close(user: Long, s: Open): Closed =
    Closed(user,
      java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
        java.time.Duration.of(s.start_us, java.time.temporal.ChronoUnit.MICROS))),
      s.n, s.cents / 100.0)

  /** The state-transition function: fold this batch's events (time
    * order) into the open session, emitting every session that closes.
    */
  private[streaming] def updateUser(user: Long, events: Iterator[SEvent],
      state: GroupState[Open]): Iterator[Closed] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: the session closed
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      out
    } else {
      val sorted = events.toArray.sortBy(_.ts_us)
      val out = Seq.newBuilder[Closed]
      var cur = state.getOption
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts_us - s.last_us <= GapUs =>
            Some(Open(s.start_us, math.max(s.last_us, e.ts_us),
              s.n + 1, s.cents + cents(e.value)))
          case Some(s) =>
            out += close(user, s)
            Some(Open(e.ts_us, e.ts_us, 1, cents(e.value)))
          case None =>
            Some(Open(e.ts_us, e.ts_us, 1, cents(e.value)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close via timeout when the watermark passes last+gap (ms —
        // GroupState timeouts are millisecond-granular; rounding UP
        // keeps the inclusive boundary: never time out early)
        state.setTimeoutTimestamp((s.last_us + GapUs + 999) / 1000)
      }
      out.result().iterator
    }
  }

  /** Streaming per-user sessionization over the events file source.
    * Emits one row per CLOSED session (append semantics).
    */
  def sessions(spark: SparkSession, inputDir: String,
      watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(inputDir)
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_utc", watermark)
      .select(col("user_id"), col("ts_utc"),
        unix_micros(col("ts_utc")).as("ts_us"), col("value"))
      .as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Closed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
      .toDF()
  }
}
