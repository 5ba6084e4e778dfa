package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming embedding-drift monitor: keeps the corpus covariance
  * moments (`functions.CovAgg`'s (n, d, μ, upper-triangle cov) flat
  * vector) fresh as embeddings stream in. Each micro-batch folds its
  * vectors through the SAME aggregate the batch PCA/outlier queries
  * use and merges monoidally into the standing moments — counts and
  * sums add; the covariance re-derives from merged raw moments, so
  * batch boundaries can't change the result. Downstream,
  * `CovAgg.covarianceOf` + `topEigen` on the standing file give the
  * live principal axis; comparing it across checkpoints IS the drift
  * alarm.
  *
  * Scale shape: state is ONE d(d+3)/2+2-double vector however many
  * vectors the stream carries. Replay fencing and the atomic
  * write-new-then-rename swap follow [[ProjectionStream]] exactly
  * (foreachBatch is at-least-once; sums must not double-count).
  */
object MomentsStream {

  private val MarkerFile = "_merged_batch"

  private[graft] def mergedBatchId(dest: String): Long = {
    graft.AtomicDir.recover(dest) // repair any half-finished swap first
    val f = new java.io.File(dest, MarkerFile)
    if (f.exists()) java.nio.file.Files.readString(f.toPath).trim.toLong else -1L
  }

  /** Standing flat moment vector at `dest`, if any. */
  def moments(spark: org.apache.spark.sql.SparkSession, dest: String): Option[Seq[Double]] = {
    graft.AtomicDir.recover(dest)
    if (new java.io.File(dest).exists())
      Some(spark.read.parquet(dest).collect()(0).getSeq[Double](0))
    else None
  }

  /** Merge two flat (n, d, μ, ut-cov) vectors by reconstituting raw
    * moments (Σv = μ·n, Σvvᵀ = (cov + μμᵀ)·n), adding, and
    * re-finishing. Exact: the flat form is a bijection of the raw
    * moments.
    */
  private[graft] def mergeFlat(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    import graft.functions.CovAgg.covarianceOf
    val (na, ma, ca) = covarianceOf(a)
    val (nb, mb, cb) = covarianceOf(b)
    require(ma.length == mb.length, s"dim mismatch: ${ma.length} vs ${mb.length}")
    val d = ma.length
    val n = na + nb
    val mean = Array.tabulate(d)(i => (ma(i) * na + mb(i) * nb) / n)
    val out = new Array[Double](2 + d + d * (d + 1) / 2)
    out(0) = n.toDouble; out(1) = d.toDouble
    System.arraycopy(mean, 0, out, 2, d)
    var k = 2 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val m2 = (ca(i)(j) + ma(i) * ma(j)) * na + (cb(i)(j) + mb(i) * mb(j)) * nb
        out(k) = m2 / n - mean(i) * mean(j)
        k += 1; j += 1
      }
      i += 1
    }
    out.toSeq
  }

  /** Fold one batch of raw vectors (column `embedding`) into the
    * standing moments at `dest`. Batch ids at or below the marker are
    * no-ops (replay fence); the marker commits inside the swap.
    */
  def mergeBatch(batch: DataFrame, dest: String,
      batchId: Long = Long.MinValue): Unit = {
    graft.AtomicDir.recover(dest)
    if (batchId != Long.MinValue && batchId <= mergedBatchId(dest)) return
    val spark = batch.sparkSession
    import spark.implicits._
    val freshRow = batch.agg(graft.functions.CovAgg(col("embedding"))).collect()(0)
    val fresh = freshRow.getSeq[Double](0)
    if (fresh.isEmpty) return // empty batch: nothing to fold
    val merged = moments(spark, dest) match {
      case Some(standing) => mergeFlat(standing, fresh)
      case None => fresh
    }
    val tmp = graft.AtomicDir.tmpPath(dest)
    Seq(merged).toDF("moments").coalesce(1).write.mode("overwrite").parquet(tmp)
    if (batchId != Long.MinValue)
      java.nio.file.Files.writeString(
        new java.io.File(tmp, MarkerFile).toPath, batchId.toString)
    graft.AtomicDir.swap(dest)
  }

  /** foreachBatch writer maintaining the moments at `dest` from a
    * stream with an `embedding: array<float>` column.
    */
  def maintain(stream: DataFrame, dest: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, dest, id)
      }
}
