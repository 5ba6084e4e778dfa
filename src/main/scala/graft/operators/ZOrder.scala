package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the layout
  * trick behind ClickHouse's multi-column primary keys and Delta's
  * `OPTIMIZE ZORDER BY`: interleave the bits of several column ranks
  * so that sorting by the single interleaved value places rows that
  * are close in EVERY dimension into the same files. Per-file (and
  * parquet row-group) min/max statistics then become tight
  * hyper-rectangles for ALL clustered columns at once, and a
  * multi-dimensional range predicate prunes most files — where a
  * linear sort buys tight spans on its leading column only and leaves
  * every other column's span at the full range in every file.
  *
  * Scale shape: the only data-wide work is one range repartition +
  * in-partition sort on the computed z-value (exactly the cost of any
  * clustered write); the per-dimension extents feeding the rank
  * bucketization are one tiny min/max aggregate (2 doubles per
  * dimension — model scale, broadcast as literals). The z-value
  * itself is a pure codegen'd bit-shuffle projection, dropped before
  * the write. Everything is semantics-neutral — clustering changes
  * WHERE rows sit, never which rows exist — so the scan query is
  * oracle-checkable against the unclustered fixture.
  */
object ZOrder {

  /** Bits per dimension: 8 ⇒ 256 rank buckets per column, d·8 total
    * z-bits. Finer ranks stop paying once files are narrower than a
    * bucket; 8 bits comfortably out-resolves any practical file count.
    */
  val BitsPerDim = 8

  /** Monotonic rank of `c` into [0, 2^bits) given its global extent —
    * the equi-width bucketization Delta's zorder uses (range-id based;
    * equi-width is deterministic and needs only min/max, and skew
    * costs layout quality, never correctness).
    */
  private def rank(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
    least(greatest(
        floor((c.cast("double") - lit(mn)) / lit(span) * lit(1 << bits)).cast("long"),
        lit(0L)),
      lit((1L << bits) - 1))
  }

  /** The Morton interleave: bit i of dimension j lands at z-bit
    * i·d + j. A fold of d·bits shift/mask terms — pure codegen, no
    * UDF, no state.
    */
  private[graft] def zValue(ranks: Seq[Column], bits: Int): Column = {
    val d = ranks.size
    val terms = for {
      (r, j) <- ranks.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(r, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `dest` as `numFiles` parquet files clustered on the
    * z-curve over `cols`. Each output file covers one contiguous
    * z-range ⇒ a tight rectangle in every clustered dimension.
    */
  def clusteredWrite(df: DataFrame, dest: String, cols: Seq[String],
      numFiles: Int): Unit = {
    require(cols.size >= 2, "z-ordering one column is just a sort")
    require(cols.size * BitsPerDim <= 63, "z-value must fit a long")
    val extents = cols.flatMap(c => Seq(
      min(col(c)).cast("double"), max(col(c)).cast("double")))
    val extentRow = df.agg(extents.head, extents.tail: _*).head()
    val ranks = cols.zipWithIndex.map { case (c, j) =>
      rank(col(c), extentRow.getDouble(2 * j), extentRow.getDouble(2 * j + 1),
        BitsPerDim)
    }
    df.withColumn("_z", zValue(ranks, BitsPerDim))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dest)
  }
}
