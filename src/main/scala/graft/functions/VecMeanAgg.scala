package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of an `array<float>` column — the distributed
  * centroid computation, as a typed [[Aggregator]] (the engine's UDAF
  * surface, SURVEY.md §2.J).
  *
  * Why an Aggregator and not posexplode→per-(key, dim) avg: the explode
  * multiplies the shuffle by the dimensionality (64 rows per vector
  * through the exchange), while this buffers one (sums, count) state
  * per group per partition and map-side-combines — the shuffle carries
  * k × (dim + 1) doubles total regardless of corpus size. That is the
  * canonical distributed-mean shape at 100 TB.
  *
  * The buffer is immutable-by-convention mutable state: `reduce`
  * updates the sums array in place (Spark gives the Aggregator
  * exclusive ownership of its buffer between serializations).
  */
object VecMeanAgg {

  final case class Buf(sums: Array[Double], n: Long)

  private val agg = new Aggregator[Seq[Float], Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

    override def reduce(b: Buf, v: Seq[Float]): Buf = {
      if (b.n == 0L) {
        val s = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
        Buf(s, 1L)
      } else {
        // fail fast on ragged input: silently truncating would make the
        // result depend on per-partition arrival order
        require(v.length == b.sums.length,
          s"vec_mean: dimension mismatch (${v.length} vs ${b.sums.length})")
        val s = b.sums
        var i = 0
        while (i < s.length) { s(i) += v(i).toDouble; i += 1 }
        Buf(s, b.n + 1L)
      }
    }

    override def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length,
          s"vec_mean: dimension mismatch (${a.sums.length} vs ${b.sums.length})")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        Buf(a.sums, a.n + b.n)
      }

    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0L) Seq.empty
      else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column-API form: `df.groupBy(...).agg(VecMeanAgg(col("embedding")))`. */
  def apply(vec: Column): Column = udaf(agg).apply(vec)
}
