package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Custom per-key streaming state (SURVEY.md §2.I): sessionization with
  * an inactivity gap, as a `flatMapGroupsWithState` state machine.
  *
  * The declarative forms already exist — `session_window` /
  * the lag+cumsum batch shape in [[Shapes]] (`q_stream_session`) — and
  * should be preferred whenever they express the semantics. This is the
  * escape hatch for per-key logic the built-ins can't say (custom
  * session payloads, conditional resets, cross-event invariants), kept
  * deliberately small and spec-checked against the declarative batch
  * form for exact agreement on closed sessions.
  *
  * Scale shape: state is keyed by user and O(1) per user (start, last,
  * count — no event buffering); a shuffle on the key partitions state
  * across executors; the event-time timeout closes sessions as the
  * watermark passes `last + gap`, so state size is bounded by the
  * number of concurrently-active users, not history.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)

  /** O(1) per-key state: epoch-second bounds + count. */
  final case class SessionState(start: Long, last: Long, n: Long)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Closed sessions for an event stream, `gapSec` inactivity gap.
    * Emits a session when the event-time watermark passes its last
    * event + gap (timeout) or when a later in-stream event of the same
    * user opens the next session.
    */
  def sessions(
      events: Dataset[Event],
      gapSec: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(user, s))
          } else {
            // batch arrival order is arbitrary; equal-ts ties cannot
            // change session membership (gap 0 <= gapSec)
            val sorted = it.toArray.sortBy(_.ts.getTime)
            val out = ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last > gapSec =>
                  out += close(user, s)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) if s.start - t > gapSec =>
                  // late arrival more than a gap BEFORE the open session:
                  // its own (already-closed) earlier session. Approximation:
                  // multiple such stragglers arriving in different batches
                  // each close separately instead of merging — exact
                  // handling would require buffering evicted history.
                  out += Session(user, e.ts, e.ts, 1)
                case Some(s) =>
                  // in-gap arrival, possibly late: extend BOTH bounds so a
                  // late-but-in-window event moves session_start back, as
                  // the declarative batch form would
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1, (s.last + gapSec) * 1000 + 1))
            }
            out.iterator
          }
      }
  }

  private def close(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.start * 1000), new Timestamp(s.last * 1000), s.n)
}
