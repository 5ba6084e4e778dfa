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
  * Scale shape: state is keyed by user and bounded at `MaxOpen` open
  * sessions × O(1) each (start, last, count — no event buffering); a
  * shuffle on the key partitions state across executors; the event-time
  * timeout closes sessions as the watermark passes `last + gap`, so
  * state size is bounded by the number of concurrently-active users,
  * not history.
  *
  * Late-data semantics (bounded merge-on-late): sessions stay open in
  * the buffer until the WATERMARK passes `last + gap` — not until a
  * later event arrives — so any event landing within the gap of an
  * open session extends or MERGES it, including stragglers that arrive
  * batches apart and events that bridge two open sessions into one.
  * The single remaining approximation is the buffer bound: beyond
  * `MaxOpen` concurrently-open sessions per key, the oldest closes
  * eagerly, and a subsequent straggler for an evicted session opens a
  * new one instead of merging (exact handling would require unbounded
  * evicted history — the trade every bounded-state sessionizer makes).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)

  /** One open session: epoch-second bounds + count. O(1). */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Per-key state: the open sessions, pairwise more than a gap apart
    * (merging on arrival maintains the invariant), bounded at
    * [[MaxOpen]].
    */
  final case class SessionBuffer(open: Seq[SessionState])

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Open-session buffer bound per key. 8 spans: a user would need 9+
    * sessions all inside the watermark delay for eviction to bite.
    */
  val MaxOpen = 8

  /** Closed sessions for an event stream, `gapSec` inactivity gap.
    * A session is emitted when the event-time watermark passes its
    * last event + gap (timeout), or eagerly if the per-key buffer
    * exceeds [[MaxOpen]].
    */
  def sessions(
      events: Dataset[Event],
      gapSec: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionBuffer]) =>
          if (state.hasTimedOut) {
            val wmSec = state.getCurrentWatermarkMs / 1000
            val (expired, live) = state.get.open.partition(_.last + gapSec < wmSec)
            if (live.isEmpty) state.remove()
            else { state.update(SessionBuffer(live)); arm(state, live, gapSec) }
            expired.sortBy(_.start).iterator.map(close(user, _))
          } else {
            // batch arrival order is arbitrary; equal-ts ties cannot
            // change session membership (gap 0 <= gapSec)
            val sorted = it.toArray.sortBy(_.ts.getTime)
            val out = ArrayBuffer.empty[Session]
            var open = state.getOption.map(_.open).getOrElse(Seq.empty)
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              // an event within the gap of any open session joins it;
              // touching two (possible only for an in-between arrival —
              // open sessions are pairwise > gap apart) bridges them
              val (touched, rest) = open.partition(
                s => t >= s.start - gapSec && t <= s.last + gapSec)
              val merged = touched.foldLeft(SessionState(t, t, 1)) { (a, b) =>
                SessionState(math.min(a.start, b.start), math.max(a.last, b.last), a.n + b.n)
              }
              open = merged +: rest
              if (open.size > MaxOpen) {
                // bounded buffer: evict the stalest span eagerly (the
                // one the watermark would close first)
                val oldest = open.minBy(_.last)
                out += close(user, oldest)
                open = open.filterNot(_ == oldest)
              }
            }
            if (open.isEmpty) state.remove()
            else { state.update(SessionBuffer(open)); arm(state, open, gapSec) }
            out.iterator
          }
      }
  }

  /** Next timeout: the earliest open session's `last + gap`, clamped
    * strictly ahead of the current watermark (a timeout at-or-behind
    * the watermark is rejected by the state API).
    */
  private def arm(state: GroupState[SessionBuffer], open: Seq[SessionState],
      gapSec: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs + 1,
        (open.map(_.last).min + gapSec) * 1000 + 1))

  private def close(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.start * 1000), new Timestamp(s.last * 1000), s.n)
}
