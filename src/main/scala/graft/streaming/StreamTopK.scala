package graft.streaming

import graft.functions.TopKAgg
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — ClickHouse `topK` maintained ON A STREAM:
  * the per-group SpaceSaving counter table lives in keyed state and
  * every micro-batch folds its new arrivals through the SAME
  * `TopKAgg.evictingAdd` kernel the batch aggregate uses, then emits
  * the group's refreshed top-k (Update semantics — downstream sees the
  * current leaderboard after each tick, the streaming analog of an
  * AggregatingMergeTree-backed topK materialized view).
  *
  * Scale shape: state is ONE bounded `capacity`-entry table per group
  * — O(groups × capacity) total however many rows or distinct items
  * the stream carries, and it never grows with time, so no watermark
  * eviction is needed (this is a running aggregate, not a windowed
  * one). The shuffle is on the group key only; arrivals within a batch
  * fold in deterministic (item) order so replays reproduce the table.
  *
  * Approximation contract is the batch kernel's: with capacity m, any
  * item with true count > N/m is present, counts overestimate by at
  * most the recorded err, and when m covers the live item domain the
  * table is EXACT (StreamingSpec pins stream ≡ batch in that regime).
  */
object StreamTopK {

  final case class Arrival(group: String, item: String)

  final case class TopRow(group: String, item: String, count: Long, err: Long)

  /** Per-group running top-k over a stream with columns
    * (group string, item string). Emits the refreshed top-k rows for
    * every group touched by each micro-batch.
    */
  def heavyHitters(arrivals: DataFrame, k: Int, capacity: Int): Dataset[TopRow] = {
    import arrivals.sparkSession.implicits._
    require(capacity >= k, "sketch capacity must be at least k")
    arrivals
      .select(col("group"), col("item"))
      .as[Arrival]
      .groupByKey(_.group)
      .flatMapGroupsWithState[Map[String, (Long, Long)], TopRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[Arrival], state: GroupState[Map[String, (Long, Long)]]) =>
          // fold in deterministic item order: batch arrival order is
          // arbitrary under shuffles/retries, and SpaceSaving eviction
          // is order-sensitive once the table saturates
          val items = it.map(_.item).toArray.sorted
          val table = items.foldLeft(state.getOption.getOrElse(Map.empty)) {
            (m, item) => TopKAgg.evictingAdd(m, item, 1L, 0L, capacity)
          }
          state.update(table)
          table.toSeq
            .map { case (item, (c, e)) => TopRow(group, item, c, e) }
            .sortBy(t => (-t.count, t.item))
            .take(k)
            .iterator
      }
  }
}
