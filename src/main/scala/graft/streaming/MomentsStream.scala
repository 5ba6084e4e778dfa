package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * Scale shape: state is one d(d+3)/2+2-double vector PER DAY BUCKET
  * (one total when the stream carries no day column) however many
  * vectors the stream carries — day count is calendar-bounded, so the
  * standing file stays metadata-scale and the driver-side day merge
  * is O(days·d²), never O(rows). Day sharding is what makes the state
  * MUTATION-RECONCILABLE ([[reconcile]]): a retroactive DELETE/UPDATE
  * on the base snapshot rewrites whole day partitions, so the
  * correction recomputes exactly those days' vectors and leaves every
  * other day's state untouched. Replay fencing and the atomic
  * write-new-then-rename swap follow [[ProjectionStream]] exactly
  * (foreachBatch is at-least-once; sums must not double-count).
  */
object MomentsStream {

  private val MarkerFile = "_merged_batch"

  /** Marker/existence reads resolve through the Hadoop FileSystem of
    * `dest`'s own scheme — same URI-portability contract as the swap
    * ([[graft.RestartSpec]] drives the restart battery over torn
    * `tornfs://` renames).
    */
  private[graft] def mergedBatchId(dest: String): Long = {
    graft.AtomicDir.recover(dest) // repair any half-finished swap first
    val fs = graft.AtomicDir.fileSystem(dest)
    val f = new org.apache.hadoop.fs.Path(dest, MarkerFile)
    if (fs.exists(f)) {
      val in = fs.open(f)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    } else -1L
  }

  /** Standing per-day flat moment vectors at `dest` (empty if none).
    * Metadata-scale: one row per day bucket.
    */
  private[graft] def perDay(spark: SparkSession, dest: String): Map[String, Seq[Double]] = {
    graft.AtomicDir.recover(dest)
    if (graft.AtomicDir.fileSystem(dest)
        .exists(new org.apache.hadoop.fs.Path(dest)))
      spark.read.parquet(dest).collect()
        .map(r => r.getString(r.fieldIndex("day")) ->
          r.getSeq[Double](r.fieldIndex("moments"))).toMap
    else Map.empty
  }

  /** Standing CORPUS flat moment vector at `dest`, if any — the
    * per-day vectors folded through [[mergeFlat]] in day order (exact
    * up to fp reassociation; day count is calendar-bounded).
    */
  def moments(spark: SparkSession, dest: String): Option[Seq[Double]] = {
    val days = perDay(spark, dest)
    if (days.isEmpty) None
    else Some(days.toSeq.sortBy(_._1).map(_._2).reduceLeft(mergeFlat))
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

  /** Write the standing per-day map (with the replay marker) via the
    * crash-safe AtomicDir swap.
    */
  private def writeState(spark: SparkSession, dest: String,
      state: Map[String, Seq[Double]], batchId: Long): Unit = {
    import spark.implicits._
    val tmp = graft.AtomicDir.tmpPath(dest)
    state.toSeq.sortBy(_._1).toDF("day", "moments")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    if (batchId >= 0) {
      val fs = graft.AtomicDir.fileSystem(tmp)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, MarkerFile), true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
    graft.AtomicDir.swap(dest)
  }

  /** Fold one batch of raw vectors (column `embedding`) into the
    * standing moments at `dest`, one vector per `dayCol` bucket (all
    * under one "" bucket when absent). The per-day fold runs as ONE
    * distributed groupBy-CovAgg pass over the batch; only the
    * day-keyed summary vectors reach the driver. Batch ids at or
    * below the marker are no-ops (replay fence); the marker commits
    * inside the swap.
    */
  def mergeBatch(batch: DataFrame, dest: String,
      batchId: Long = Long.MinValue, dayCol: Option[String] = None): Unit =
    // whole tick under the writer lease — overlapping ticks serialize
    // or fail fast instead of interleaving with this read-modify-write
    graft.AtomicDir.withLease(dest) {
      graft.AtomicDir.recover(dest)
      if (batchId == Long.MinValue || batchId > mergedBatchId(dest)) {
        val spark = batch.sparkSession
        val keyed = dayCol match {
          case Some(c) => batch.select(col(c).cast("string").as("day"), col("embedding"))
          case None => batch.select(lit("").as("day"), col("embedding"))
        }
        val fresh = keyed.groupBy("day")
          .agg(graft.functions.CovAgg(col("embedding")).as("m"))
          .collect()
          .map(r => r.getString(0) -> r.getSeq[Double](1))
          .filter(_._2.nonEmpty).toMap
        if (fresh.nonEmpty) { // empty batch: nothing to fold
          val standing = perDay(spark, dest)
          val merged = (standing.keySet ++ fresh.keySet).map { d =>
            d -> ((standing.get(d), fresh.get(d)) match {
              case (Some(a), Some(b)) => mergeFlat(a, b)
              case (Some(a), None) => a
              case (None, b) => b.get
            })
          }.toMap
          writeState(spark, dest, merged,
            if (batchId != Long.MinValue) batchId else -1L)
        }
      }
    }

  /** Reconcile the standing moments with a MUTATION applied to the
    * day-partitioned base snapshot (`ALTER … DELETE/UPDATE` between
    * micro-batches, [[graft.operators.Snapshot.delete]]/`update`):
    * every mutated day whose vectors were ALREADY folded gets its
    * moment vector recomputed from the post-mutation snapshot; days
    * the stream has not delivered yet are left alone (their
    * post-mutation rows arrive through the normal batch path).
    *
    * Soundness contract: affected days must be fully folded before
    * the mutation (the retroactive-correction shape — mutations edit
    * CLOSED days while the stream tails live ones). Scale shape: the
    * correction reads only the mutated days' rows — the same cost
    * class as the mutation's own day-partition rewrite.
    */
  def reconcile(spark: SparkSession, snapshotDest: String, embedCol: String,
      dest: String, report: graft.operators.Snapshot.MutationReport): Unit =
    graft.AtomicDir.withLease(dest) {
      graft.AtomicDir.recover(dest)
      if (graft.AtomicDir.fileSystem(dest)
          .exists(new org.apache.hadoop.fs.Path(dest))) {
        val standing = perDay(spark, dest)
        val affected = (report.daysRewritten ++ report.daysDropped).distinct
          .filter(standing.contains)
        if (affected.nonEmpty) {
          val recomputed = graft.operators.Snapshot.resolve(spark, snapshotDest)
            .filter(col("bucket_day").cast("string").isin(affected: _*))
            .groupBy(col("bucket_day").cast("string").as("day"))
            .agg(graft.functions.CovAgg(col(embedCol)).as("m"))
            .collect()
            .map(r => r.getString(0) -> r.getSeq[Double](1))
            .filter(_._2.nonEmpty).toMap
          // dropped / fully-deleted days simply leave the state
          val merged = (standing -- affected) ++ recomputed
          writeState(spark, dest, merged, mergedBatchId(dest))
        }
      }
    }

  /** foreachBatch writer maintaining the moments at `dest` from a
    * stream with an `embedding: array<float>` column (plus `dayCol`
    * when the state should shard by day — required for
    * [[reconcile]]).
    */
  def maintain(stream: DataFrame, dest: String,
      dayCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, dest, id, dayCol)
      }
}
