package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heavy hitters — ClickHouse's `topK(k)` aggregate, as a typed
  * [[Aggregator]] running the SpaceSaving sketch (Metwally et al.,
  * ICDT'05, the algorithm ClickHouse itself uses).
  *
  * Why a sketch and not `q_vocab_topk`'s exact explode→groupBy: the
  * exact form shuffles the full (key, count) vocabulary. SpaceSaving
  * buffers a BOUNDED `capacity`-sized counter table per partition and
  * map-side-combines, so the shuffle carries `partitions × capacity`
  * counters regardless of vocabulary size — the only viable shape when
  * the key space itself is 100 TB-scale (URLs, n-grams, user ids).
  *
  * Guarantee: with capacity m, any item with true count >
  * N/m is in the table, and reported counts overestimate by at most
  * the recorded `err`. The merge (sum counts pairwise, keep the
  * largest m, error bounds add) preserves the overestimate invariant;
  * the spec checks the sketch's top-k equals the exact top-k on the
  * fixture vocabulary, where counts are well-separated.
  */
object TopKAgg {

  /** (item → (count, err)); the map stays ≤ capacity entries. */
  final case class Buf(items: Map[String, (Long, Long)])

  final case class TopItem(item: String, count: Long, err: Long)

  /** Shared with streaming.StreamTopK — the streaming heavy-hitter
    * keeps exactly this batch kernel as its per-key state transition.
    */
  private[graft] def evictingAdd(m: Map[String, (Long, Long)], item: String,
      c: Long, e: Long, capacity: Int): Map[String, (Long, Long)] =
    m.get(item) match {
      case Some((c0, e0)) => m.updated(item, (c0 + c, e0 + e))
      case None if m.size < capacity => m.updated(item, (c, e))
      case None =>
        // SpaceSaving eviction: the new item inherits the min counter's
        // count as its overestimate bound
        val (minItem, (minC, _)) = m.minBy { case (k, (cnt, _)) => (cnt, k) }
        m.removed(minItem).updated(item, (minC + c, minC + e))
    }

  final class TopK(k: Int, capacity: Int)
      extends Aggregator[String, Buf, Seq[TopItem]] {
    require(capacity >= k, "sketch capacity must be at least k")

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, item: String): Buf =
      Buf(evictingAdd(b.items, item, 1L, 0L, capacity))

    override def merge(a: Buf, b: Buf): Buf = {
      // fold the smaller table into the larger: counts sum for shared
      // items; new items evict as in reduce, inheriting the min bound
      val (big, small) =
        if (a.items.size >= b.items.size) (a.items, b.items) else (b.items, a.items)
      Buf(small.foldLeft(big) { case (m, (item, (c, e))) =>
        evictingAdd(m, item, c, e, capacity)
      })
    }

    override def finish(b: Buf): Seq[TopItem] =
      b.items.toSeq
        .map { case (item, (c, e)) => TopItem(item, c, e) }
        .sortBy(t => (-t.count, t.item))
        .take(k)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[TopItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopItem]]()
  }

  /** ClickHouse `topKWeighted(k)`: each occurrence contributes its
    * weight instead of 1 — "top items by summed weight" with the same
    * bounded SpaceSaving table. `reduce` adds the row's weight where
    * the unweighted form adds 1; eviction and merge are unchanged
    * (the invariants hold for any non-negative increments), so the
    * bound/guarantee carries over with N = total weight.
    */
  final class TopKWeighted(k: Int, capacity: Int)
      extends Aggregator[(String, Long), Buf, Seq[TopItem]] {
    require(capacity >= k, "sketch capacity must be at least k")
    private val inner = new TopK(k, capacity)

    override def zero: Buf = inner.zero
    override def reduce(b: Buf, in: (String, Long)): Buf = {
      // the SpaceSaving overestimate invariant only holds for
      // non-negative increments — fail fast rather than return a
      // confidently wrong top-k on delta-like weight columns
      require(in._2 >= 0, s"topKWeighted weight must be non-negative, got ${in._2}")
      Buf(evictingAdd(b.items, in._1, in._2, 0L, capacity))
    }
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): Seq[TopItem] = inner.finish(b)
    override def bufferEncoder: Encoder[Buf] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[TopItem]] = inner.outputEncoder
  }

  /** `df.agg(TopKAgg(col("word"), k = 10))` — capacity defaults to 8×k,
    * the usual overprovisioning that keeps the guarantee comfortable.
    */
  def apply(item: Column, k: Int, capacity: Int = 0): Column =
    udaf(new TopK(k, if (capacity > 0) capacity else 8 * k)).apply(item)

  /** `TopKAgg.weighted(col("w"), col("n"), k = 10)`. */
  def weighted(item: Column, weight: Column, k: Int, capacity: Int = 0): Column =
    udaf(new TopKWeighted(k, if (capacity > 0) capacity else 8 * k))
      .apply(item, weight)
}
