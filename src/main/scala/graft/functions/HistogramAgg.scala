package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Adaptive-bin histogram — ClickHouse's `histogram(n)` semantics
  * (variable-width bins fitted to the data, no declared range), as a
  * typed mergeable [[Aggregator]] running the streaming-histogram
  * algorithm of Ben-Haim & Tom-Tov (JMLR 11, 2010): keep a bounded set
  * of (sum, weight, lo, hi) bins ordered by mean; inserting a value
  * adds a unit bin; whenever the set exceeds its bound, merge the two
  * bins with the closest means (weighted mean, summed weight, unioned
  * bounds).
  *
  * Mergeability is the point: partial histograms combine by merging
  * the two sorted bin lists and re-compacting — the same operation as
  * insertion — so the shuffle carries `partitions × capacity` bins no
  * matter the row count, the map side pre-reduces, and the final
  * `finish` compacts to exactly `n` bins. The working capacity is 4×n
  * (standard oversampling: compaction error accumulates in the
  * smallest gaps first, so carrying extra bins through the partial
  * phase keeps well-separated modes from being merged prematurely).
  *
  * Like every sketch here, the exact fixed-bin `q_agg_histogram` is
  * the oracle-checked reference; this one is declared rows-only and
  * HistogramSpec pins recovery of well-separated clusters (exact
  * counts + bounds) and weight conservation under any partitioning.
  */
object HistogramAgg {

  /** One bin: value sum (mean = sum/weight), weight, inclusive bounds. */
  final case class HBin(sum: Double, weight: Long, lo: Double, hi: Double) {
    def mean: Double = sum / weight
  }

  /** Bins ordered by mean, ≤ capacity entries. */
  final case class HBuf(bins: Seq[HBin])

  final case class BinOut(lower: Double, upper: Double, count: Long)

  private def mergeBins(a: HBin, b: HBin): HBin =
    HBin(a.sum + b.sum, a.weight + b.weight, math.min(a.lo, b.lo), math.max(a.hi, b.hi))

  /** Merge closest-mean adjacent pairs until ≤ cap bins remain. */
  private def compact(bins: Vector[HBin], cap: Int): Vector[HBin] = {
    var v = bins
    while (v.length > cap) {
      var minIdx = 0
      var minGap = Double.PositiveInfinity
      var i = 0
      while (i < v.length - 1) {
        val gap = v(i + 1).mean - v(i).mean
        if (gap < minGap) { minGap = gap; minIdx = i }
        i += 1
      }
      v = (v.take(minIdx) :+ mergeBins(v(minIdx), v(minIdx + 1))) ++ v.drop(minIdx + 2)
    }
    v
  }

  /** Merge two mean-sorted bin vectors, keeping order. */
  private def mergeSorted(a: Vector[HBin], b: Vector[HBin]): Vector[HBin] = {
    val out = Vector.newBuilder[HBin]
    var (i, j) = (0, 0)
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && a(i).mean <= b(j).mean)) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.result()
  }

  final class AdaptiveHistogram(nBins: Int)
      extends Aggregator[Double, HBuf, Seq[BinOut]] {
    require(nBins > 0, "histogram bin count must be positive")
    private val cap = 4 * nBins

    override def zero: HBuf = HBuf(Vector.empty)

    override def reduce(b: HBuf, v: Double): HBuf = {
      val bins = b.bins.toVector
      val at = bins.indexWhere(_.mean > v) match {
        case -1 => bins.length
        case i => i
      }
      val inserted = (bins.take(at) :+ HBin(v, 1L, v, v)) ++ bins.drop(at)
      HBuf(compact(inserted, cap))
    }

    override def merge(a: HBuf, b: HBuf): HBuf =
      HBuf(compact(mergeSorted(a.bins.toVector, b.bins.toVector), cap))

    override def finish(b: HBuf): Seq[BinOut] =
      compact(b.bins.toVector, nBins)
        .map(bin => BinOut(bin.lo, bin.hi, bin.weight))

    override def bufferEncoder: Encoder[HBuf] = Encoders.product[HBuf]
    override def outputEncoder: Encoder[Seq[BinOut]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[BinOut]]()
  }

  /** The canonical single-order fold `q_agg_histogram_fold` declares,
    * through the kernel's own compact(): mean-sorted weighted unit
    * bins (sum = v·w) compacted straight to n. Package-private so
    * HistogramSpec can pin the declared HOF fold against the exact
    * in-process kernel.
    */
  private[graft] def canonicalCompact(
      bins: Seq[(Double, Long)], n: Int): Seq[BinOut] =
    compact(bins.sortBy(_._1)
      .map { case (v, w) => HBin(v * w, w, v, v) }.toVector, n)
      .map(b => BinOut(b.lo, b.hi, b.weight))

  /** `df.agg(HistogramAgg(col("x"), n = 10))`. */
  def apply(value: Column, n: Int): Column = udaf(new AdaptiveHistogram(n)).apply(value)
}
