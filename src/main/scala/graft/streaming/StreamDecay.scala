package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-decayed features — the stateful twin of the batch
  * `q_win_decayed_avg` (ClickHouse `exponentialTimeDecayed*`): each
  * user's decayed sum/count fold forward as events arrive, so an
  * online feature store can serve "activity in the last ~day" without
  * re-scanning history. The recurrence
  *
  *   s' = s·e^{−Δt/τ} + v,   c' = c·e^{−Δt/τ} + 1
  *
  * is algebraically the batch window formula (each step multiplies
  * every prior term by the same decay), so the stream and the batch
  * query agree to floating-point reassociation — StreamingSpec pins
  * the equivalence per event, across micro-batch boundaries.
  *
  * Scale shape: state is THREE numbers per user key (last timestamp +
  * two decayed accumulators) in the state store — O(users), never
  * O(events); each micro-batch sorts only its own per-user slice
  * (micro-batch-bounded) to apply events in time order. No shuffle
  * beyond the one keyed exchange every stateful operator pays.
  */
object StreamDecay {

  /** τ = 1 day, matching q_win_decayed_avg. */
  val TauSec = 86400.0

  final case class Ev(user_id: Long, t: Long, event_id: Long, value: Double)
  final case class St(lastT: Long, dSum: Double, dCnt: Double)
  final case class Out(user_id: Long, event_id: Long,
      d_sum: Double, d_cnt: Double, d_avg: Double)

  def transform(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(Long.MinValue, 0.0, 0.0))
          // events inside one micro-batch may interleave arbitrarily;
          // apply them in (t, event_id) order — the batch query's sort
          val out = it.toSeq.sortBy(e => (e.t, e.event_id)).map { e =>
            val decay =
              if (st.lastT == Long.MinValue) 0.0
              else math.exp(-(e.t - st.lastT).toDouble / TauSec)
            val s = st.dSum * decay + e.value
            val c = st.dCnt * decay + 1.0
            st = St(e.t, s, c)
            Out(uid, e.event_id, s, c, s / c)
          }
          state.update(st)
          out.iterator
      }
  }
}
