package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse `uniqUpTo(N)` — exact distinct count saturating at N+1
  * ("more than N"), as a typed [[Aggregator]] whose per-group STATE is
  * capped too: the buffer holds at most N+1 distinct values and stops
  * growing the moment saturation is reached.
  *
  * Why the cap matters at scale: `least(countDistinct(x), N+1)` is
  * value-correct but its partial state is the full distinct set of
  * every group — for a hot group with 10⁹ distinct users that is 8 GB
  * of shuffle for an answer that saturated after the first 101. Here
  * every partial buffer is ≤ N+1 longs regardless of group size, the
  * merge is a capped set-union, and the shuffle carries
  * `partitions × (N+1)` longs at most — the same bounded-state contract
  * as [[TopKAgg]].
  *
  * Exactness: while a buffer is below the cap it is the true distinct
  * set, so counts ≤ N are exact; once any buffer reaches N+1 the group
  * provably has > N distinct values and the result is pinned at N+1 —
  * precisely `least(exact_distinct, N+1)` (UniqUpToSpec checks the
  * equivalence on the live fixture).
  */
object UniqUpToAgg {

  /** Distinct values seen so far, ≤ n+1 entries (saturation point). */
  final case class Buf(items: Seq[Long])

  final class UniqUpTo(n: Int) extends Aggregator[java.lang.Long, Buf, Long] {
    require(n > 0, "uniqUpTo threshold must be positive")
    private val cap = n + 1

    override def zero: Buf = Buf(Vector.empty)

    // boxed input + null skip: SQL distinct aggregates ignore NULLs
    // (count(DISTINCT x) in both engines), and a primitive Long input
    // would silently deserialize a null row as a phantom 0
    override def reduce(b: Buf, boxed: java.lang.Long): Buf =
      if (boxed == null) b
      else {
        val v = boxed.longValue()
        if (b.items.length >= cap || b.items.contains(v)) b
        else Buf(b.items :+ v)
      }

    override def merge(a: Buf, b: Buf): Buf = {
      val (big, small) =
        if (a.items.length >= b.items.length) (a.items, b.items) else (b.items, a.items)
      if (big.length >= cap) Buf(big)
      else Buf((big ++ small.filterNot(big.contains)).take(cap))
    }

    override def finish(b: Buf): Long = b.items.length.toLong

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** `df.agg(UniqUpToAgg(col("user_id"), n = 100))`. */
  def apply(value: Column, n: Int): Column = udaf(new UniqUpTo(n)).apply(value)
}
