package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel monitor — the stateful twin of the batch
  * `q_funnel` (ClickHouse `windowFunnel`): per user, the strictly
  * ordered signup → click → purchase progression folds forward as
  * events arrive, so a live pipeline serves the conversion funnel an
  * ops dashboard polls without rescanning history.
  *
  * Semantics are the batch query's verbatim: `t1` is the FIRST signup
  * (events apply in (t, id) order, so first seen = min), `t2` the
  * first click with `t1 < t ≤ t1 + window`, `t3` the first purchase
  * with `t2 < t ≤ t1 + window` — each level anchored to the signup
  * window, strict on the left like the batch join predicates. The
  * fold is therefore not merely equivalent in the limit: given the
  * same (t, id)-ordered event feed it takes the IDENTICAL branch the
  * batch min()-aggregates select, and StreamingSpec asserts EXACT
  * per-user level equality across micro-batch boundaries plus
  * agreement with the declared per-level counts.
  *
  * Scale shape: state is THREE longs per user who signed up —
  * O(users), never O(events); users who never sign up hold no state
  * at all. Each micro-batch sorts only its own per-key slice
  * (micro-batch-bounded) to apply events in (t, id) order. No shuffle
  * beyond the one keyed exchange every stateful operator pays.
  */
object StreamFunnel {

  /** q_funnel's conversion window: 7 days, in epoch seconds. */
  val WindowSec = 604800L

  final case class Ev(user_id: Long, event_type: String, t: Long,
      event_id: Long)
  /** Unset stages are 0 (funnel timestamps are epoch seconds > 0). */
  final case class St(t1: Long, t2: Long, t3: Long)
  final case class Out(user_id: Long, level: Long)

  def transform(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0L, 0L, 0L))
          // events inside one micro-batch may interleave arbitrarily;
          // apply them in (t, event_id) order — the batch query's
          // min()-selection order
          it.toSeq.sortBy(e => (e.t, e.event_id)).foreach { e =>
            e.event_type match {
              case "signup" if st.t1 == 0L =>
                st = st.copy(t1 = e.t)
              case "click" if st.t1 > 0L && st.t2 == 0L &&
                  e.t > st.t1 && e.t <= st.t1 + WindowSec =>
                st = st.copy(t2 = e.t)
              case "purchase" if st.t2 > 0L && st.t3 == 0L &&
                  e.t > st.t2 && e.t <= st.t1 + WindowSec =>
                st = st.copy(t3 = e.t)
              case _ => ()
            }
          }
          if (st.t1 == 0L) Iterator.empty
          else {
            state.update(st)
            Iterator(Out(key,
              1L + (if (st.t2 > 0L) 1L else 0L) + (if (st.t3 > 0L) 1L else 0L)))
          }
      }
  }
}
