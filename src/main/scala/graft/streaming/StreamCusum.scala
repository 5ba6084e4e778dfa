package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming change-point monitor — the stateful twin of the batch
  * `q_changepoint` (one-sided CUSUM, Page 1954): per event type, the
  * drift statistic folds forward as events arrive, so a live pipeline
  * can raise the level-shift alarm the batch query finds in
  * retrospect. The batch form rewrites the recurrence
  *
  *   S_i = max(0, S_{i−1} + dev_i)
  *
  * as prefix − min(0, running-min of prefix); the stream keeps the
  * SAME two numbers (prefix and its running min) as per-key state, so
  * the two forms are not merely equivalent in the limit — they are
  * the identical integer arithmetic, and StreamingSpec asserts EXACT
  * (epsilon-free) equality per event, across micro-batch boundaries.
  *
  * The target mean is a parameter (the classical CUSUM contract: the
  * monitor tests drift AGAINST a known baseline; the batch query
  * derives it from the full window, a stream is handed it), as is the
  * slack and the alarm threshold — all in exact integer cents,
  * matching q_changepoint's choice to leave IEEE arithmetic entirely
  * once the per-type baseline is fixed.
  *
  * Scale shape: state is TWO longs per event type — O(types), never
  * O(events); each micro-batch sorts only its own per-key slice
  * (micro-batch-bounded) to apply events in (t, id) order. No shuffle
  * beyond the one keyed exchange every stateful operator pays.
  */
object StreamCusum {

  /** q_changepoint's constants: slack cents and alarm threshold. */
  val SlackCents = 200L
  val AlarmCents = 50000L

  final case class Ev(event_type: String, t: Long, event_id: Long,
      dev_c: Long)
  final case class St(prefix: Long, minPrefix: Long)
  final case class Out(event_type: String, event_id: Long,
      cusum_c: Long, alarm: Boolean)

  /** dev_c is the pre-computed integer-cent deviation
    * round((x − μ_r − slack)·100) — the caller owns the baseline, the
    * monitor owns the fold (so the state machine is test-separable
    * from the injection).
    */
  def transform(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0L, 0L))
          // events inside one micro-batch may interleave arbitrarily;
          // apply them in (t, event_id) order — the batch query's sort
          val out = it.toSeq.sortBy(e => (e.t, e.event_id)).map { e =>
            val prefix = st.prefix + e.dev_c
            val minP = math.min(st.minPrefix, prefix)
            st = St(prefix, minP)
            val cusum = prefix - math.min(0L, minP)
            Out(key, e.event_id, cusum, cusum > AlarmCents)
          }
          state.update(st)
          out.iterator
      }
  }
}
