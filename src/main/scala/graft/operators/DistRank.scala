package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed global ordering primitives — the one thing the DataFrame
  * API can only express as a `Window` with an empty `partitionBy`, which
  * Spark executes by dragging the WHOLE input through a single task.
  * These helpers keep the same total-order semantics but stay
  * distributed: range-repartition on the order key, sort within
  * partitions, then stamp global positions / running sums from
  * per-partition offsets computed by one lightweight statistics job
  * (O(partitions) rows to the driver, never data).
  *
  * Requirements: `order` must be a TOTAL order (include a unique
  * tie-break key) — range partitioning plus in-partition sort only
  * reconstructs a global order when no two rows compare equal.
  *
  * At 100 TB the input would be persisted before calling (two passes);
  * at fixture scale recomputation is cheaper than caching. Reference
  * shape: ClickHouse evaluates `row_number() OVER (ORDER BY …)` with a
  * single-stream sort — same semantics, same bottleneck this avoids.
  */
object DistRank {

  /** Stamp a 0-based global position column in the given total order.
    * `totalCol`, when set, adds the input's total row count as a
    * constant column (known from the same statistics pass — saves the
    * caller a separate count job).
    */
  def withPos(df: DataFrame, order: Seq[Column], posCol: String,
      totalCol: Option[String] = None): DataFrame =
    stamp(df, order, posCol, valueCol = None, cumCol = None, totalCol,
      totalSumCol = None)

  /** Stamp a 0-based global position AND an inclusive running sum of
    * `valueCol` (LongType accumulates exactly in Long; anything else
    * accumulates in Double, sequential association — identical to a
    * cumulative window's frame order). `totalSumCol`, when set, adds
    * the grand total of `valueCol` as a constant column.
    */
  def withRunningSum(df: DataFrame, order: Seq[Column], posCol: String,
      valueCol: String, cumCol: String,
      totalSumCol: Option[String] = None): DataFrame =
    stamp(df, order, posCol, Some(valueCol), Some(cumCol), totalCol = None,
      totalSumCol)

  private def stamp(df: DataFrame, order: Seq[Column], posCol: String,
      valueCol: Option[String], cumCol: Option[String],
      totalCol: Option[String], totalSumCol: Option[String]): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema0 = sorted.schema
    val valIdx = valueCol.map(schema0.fieldIndex)
    val longVal = valIdx.exists(i => schema0(i).dataType == LongType)

    // pass 1 — per-partition (count, sum): O(partitions) to the driver
    val stats = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      var n = 0L; var sL = 0L; var sD = 0.0
      valIdx match {
        case Some(vi) if longVal => it.foreach { r => n += 1; sL += r.getLong(vi) }
        case Some(vi) => it.foreach { r => n += 1; sD += r.getAs[Number](vi).doubleValue() }
        case None => it.foreach(_ => n += 1)
      }
      Iterator((pi, n, sL, sD))
    }.collect().sortBy(_._1)
    val posOff = stats.scanLeft(0L)(_ + _._2).init
    val cumOffL = stats.scanLeft(0L)(_ + _._3).init
    val cumOffD = stats.scanLeft(0.0)(_ + _._4).init
    val nTotal = stats.map(_._2).sum
    val sumTotL = stats.map(_._3).sum
    val sumTotD = stats.map(_._4).sum

    // pass 2 — stamp rows in place from the per-partition offsets
    var schema = schema0.add(posCol, LongType, nullable = false)
    cumCol.foreach { c =>
      schema = schema.add(c, if (longVal) LongType else DoubleType, nullable = false) }
    totalCol.foreach { c => schema = schema.add(c, LongType, nullable = false) }
    totalSumCol.foreach { c =>
      schema = schema.add(c, if (longVal) LongType else DoubleType, nullable = false) }
    val stamped = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      var pos = posOff(pi); var cl = cumOffL(pi); var cd = cumOffD(pi)
      it.map { r =>
        val extras = Seq.newBuilder[Any]
        extras += pos
        valIdx.foreach { vi =>
          if (longVal) { cl += r.getLong(vi); extras += cl }
          else { cd += r.getAs[Number](vi).doubleValue(); extras += cd }
        }
        if (totalCol.isDefined) extras += nTotal
        if (totalSumCol.isDefined) extras += (if (longVal) sumTotL else sumTotD)
        pos += 1
        Row.fromSeq(r.toSeq ++ extras.result())
      }
    }
    sorted.sparkSession.createDataFrame(stamped, schema)
  }
}
