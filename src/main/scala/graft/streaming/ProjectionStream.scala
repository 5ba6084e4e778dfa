package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming maintenance of an aggregate projection — the
  * AggregatingMergeTree materialized-view loop (ClickHouse keeps
  * `ADD PROJECTION` pre-aggregates fresh on every insert; the
  * reference backs the result up wholesale, backup.sh:45). Each
  * micro-batch folds its rows into the SAME mergeable partial states
  * `plans.Projections.materialize` writes (count / per-measure sum,
  * min, max, non-null count), then merges them into the standing
  * projection parquet: sums add, mins/maxes fold — every stored state
  * is a commutative monoid, so batch boundaries can't change the
  * result.
  *
  * Scale shape: the merge re-aggregates ONLY (standing keys ∪ batch
  * keys) partial rows — the key domain, never the history of raw
  * rows. The swap is write-new-then-rename (single-FS atomic enough
  * for the local runtime; at cluster scale the same loop writes day
  * partitions or a table format with atomic commit — the partials
  * and the merge are unchanged).
  *
  * A projection maintained here is immediately servable by
  * `plans.ProjectionRewrite` — register the dest path and batch
  * queries over the base table silently re-aggregate the partials
  * (ProjectionStreamSpec drives exactly that end-to-end).
  */
object ProjectionStream {

  /** Partial-state aggregate columns for `measures` — shared shape
    * with `plans.Projections.materialize` (kept in lockstep by spec).
    */
  private def partialAggs(measures: Seq[String]) =
    count(lit(1)).as("_cnt") +: measures.flatMap { m =>
      Seq(sum(col(m)).as(s"_sum_$m"), min(col(m)).as(s"_min_$m"),
        max(col(m)).as(s"_max_$m"), count(col(m)).as(s"_cnt_$m"))
    }

  /** Merge-aggregate columns over unioned partial rows. */
  private def mergeAggs(measures: Seq[String]) =
    sum(col("_cnt")).as("_cnt") +: measures.flatMap { m =>
      Seq(sum(col(s"_sum_$m")).as(s"_sum_$m"),
        min(col(s"_min_$m")).as(s"_min_$m"),
        max(col(s"_max_$m")).as(s"_max_$m"),
        sum(col(s"_cnt_$m")).as(s"_cnt_$m"))
    }

  private val MarkerFile = "_merged_batch"

  /** Highest batch id already folded into the projection at `dest`,
    * or -1. The marker travels INSIDE the projection directory, so
    * the atomic swap commits data and watermark together. All paths
    * resolve through the Hadoop FileSystem of `dest`'s own scheme —
    * the same URI-portability contract as the swap itself, so the
    * loop runs unchanged over `file:`, a test scheme, or an
    * object-store connector ([[graft.RestartSpec]] drives the whole
    * restart battery over torn `tornfs://` renames).
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

  /** Write the replay-fence marker into the staged tmp directory. */
  private def writeMarker(tmp: String, batchId: Long): Unit = {
    val fs = graft.AtomicDir.fileSystem(tmp)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, MarkerFile), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Fold one batch of RAW rows into the standing projection at
    * `dest` (creates it on first call). Exposed for the spec and for
    * batch backfills; `maintain` wires it into foreachBatch.
    *
    * Exactly-once under replay: foreachBatch is at-least-once (a
    * crash between sink commit and checkpoint advance replays the
    * batch), and a re-merged batch would DOUBLE-COUNT — sums are not
    * idempotent. `batchId` fences it: ids at or below the marker in
    * the standing dir are no-ops, and the marker is written into the
    * NEW directory before the rename, so the swap atomically commits
    * the merged partials and the watermark together — a crash at any
    * point leaves either (old data, old marker) or (new data, new
    * marker), never a half state.
    */
  def mergeBatch(batch: DataFrame, keys: Seq[String], measures: Seq[String],
      dest: String, batchId: Long = Long.MinValue): Unit =
    // the WHOLE tick holds the writer lease — recover, fence read,
    // standing read, tmp write, swap — so an overlapping tick
    // (go-cron forks the next run regardless, init.sh:14) fails fast
    // instead of interleaving with this one's read-modify-write
    graft.AtomicDir.withLease(dest) {
      graft.AtomicDir.recover(dest)
      if (batchId == Long.MinValue || batchId > mergedBatchId(dest)) {
        val spark = batch.sparkSession
        val fresh = batch.groupBy(keys.map(col): _*)
          .agg(partialAggs(measures).head, partialAggs(measures).tail: _*)
        val merged =
          if (graft.AtomicDir.fileSystem(dest)
              .exists(new org.apache.hadoop.fs.Path(dest))) {
            val standing = spark.read.parquet(dest)
            standing.unionByName(fresh)
              .groupBy(keys.map(col): _*)
              .agg(mergeAggs(measures).head, mergeAggs(measures).tail: _*)
          } else fresh
        // write-new-then-swap via AtomicDir: the old state is renamed
        // aside, never deleted, until the new one is live — a crash at
        // any point leaves a recoverable standing directory (AtomicDir)
        val tmp = graft.AtomicDir.tmpPath(dest)
        merged.write.mode("overwrite").parquet(tmp)
        if (batchId != Long.MinValue) writeMarker(tmp, batchId)
        graft.AtomicDir.swap(dest)
      }
    }

  /** Reconcile the standing projection with a MUTATION applied to the
    * day-partitioned base snapshot (`ALTER … DELETE/UPDATE` between
    * micro-batches, [[graft.operators.Snapshot.delete]]/`update`).
    * Partial states are not invertible (min/max can't subtract), so
    * the correction is DAY-GRANULAR — the projection must key on
    * `bucket_day`, the snapshot's own mutation granularity: every
    * mutated day already folded into the standing state gets its
    * partial rows recomputed from the post-mutation snapshot; days
    * the stream has not delivered yet are left alone (their
    * post-mutation rows arrive through the normal batch path).
    *
    * Soundness contract: affected days must be fully folded before
    * the mutation (the retroactive-correction shape — mutations edit
    * CLOSED days while the stream tails live ones). Scale shape: the
    * rebuild reads only the mutated days' rows and rewrites only
    * their partial rows — the same cost class as the mutation's own
    * day-partition rewrite, never O(corpus) or O(key domain).
    */
  def reconcile(spark: SparkSession, snapshotDest: String, keys: Seq[String],
      measures: Seq[String], dest: String,
      report: graft.operators.Snapshot.MutationReport): Unit = graft.AtomicDir.withLease(dest) {
    require(keys.contains("bucket_day"),
      "mutation-reconcilable projections must key on bucket_day — the " +
        "day is the snapshot's mutation granularity, so it bounds what " +
        "a reconcile may touch")
    graft.AtomicDir.recover(dest)
    if (graft.AtomicDir.fileSystem(dest)
        .exists(new org.apache.hadoop.fs.Path(dest))) {
      import spark.implicits._
      val standingDays = spark.read.parquet(dest)
        .select(col("bucket_day").cast("string")).distinct()
        .as[String].collect().toSet // key-domain-scale, never row-scale
      val affected = (report.daysRewritten ++ report.daysDropped).distinct
        .filter(standingDays)
      if (affected.nonEmpty) {
        val marker = mergedBatchId(dest)
        val keep = spark.read.parquet(dest)
          .filter(!col("bucket_day").cast("string").isin(affected: _*))
        // partition-column inference may type the snapshot's bucket_day
        // differently from the streamed rows (yyyyMMdd reads back as
        // int); align it to the standing projection's type pre-union
        val dayType = keep.schema("bucket_day").dataType
        val recomputed = graft.operators.Snapshot.resolve(spark, snapshotDest)
          .filter(col("bucket_day").cast("string").isin(affected: _*))
          .withColumn("bucket_day", col("bucket_day").cast(dayType))
          .groupBy(keys.map(col): _*)
          .agg(partialAggs(measures).head, partialAggs(measures).tail: _*)
        val tmp = graft.AtomicDir.tmpPath(dest)
        keep.unionByName(recomputed).write.mode("overwrite").parquet(tmp)
        if (marker >= 0) writeMarker(tmp, marker)
        graft.AtomicDir.swap(dest)
      }
    }
  }

  /** foreachBatch writer maintaining the projection at `dest` from a
    * stream of raw rows. Caller picks the trigger/checkpoint.
    */
  def maintain(stream: DataFrame, keys: Seq[String], measures: Seq[String],
      dest: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, keys, measures, dest, id)
      }
}
