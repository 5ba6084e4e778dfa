package graft.streaming

import graft.operators.Retention
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** The reference's runtime loop (EP1/EP2/EP3, SURVEY.md §3) as a
  * Structured Streaming job:
  *
  *  - go-cron tick (init.sh:14, `SCHEDULE=@daily` Dockerfile:20) →
  *    micro-batch trigger (`ProcessingTime`, or `AvailableNow` for the
  *    "run once now" `BACKUP_ON_START` path, init.sh:10–12);
  *  - per-tick `BACKUP DATABASE` (backup.sh:45) → `foreachBatch`
  *    writing the batch as a day-bucket-partitioned parquet snapshot
  *    (Retention.writeSnapshot);
  *  - retention GC (backup.sh:119–122) → watermark: state older than
  *    the retention window is evicted instead of find-and-rm;
  *  - pre/post/error webhooks (backup.sh:16–18,128–130; 00-webhook) →
  *    a StreamingQueryListener publishing lifecycle events.
  *
  * Scale: the aggregation state is keyed by (window, event_type) — tiny
  * and bounded by the watermark; the snapshot write is partitioned by
  * day bucket so downstream tier views prune. Nothing touches the
  * driver except the listener callbacks.
  */
object SnapshotStream {

  /** Lifecycle events captured by [[HookListener]] — the webhook
    * payloads of hooks/00-webhook:10–62 (`{"status": "<action>"}`).
    */
  final case class HookEvent(status: String, detail: String)

  /** The run-parts/webhook analog (backup.sh:8,17,129): collects
    * lifecycle events; a production deployment would POST them with
    * retry (00-webhook:14–15 `--retry 5 --max-time 10`).
    */
  final class HookListener(publish: HookEvent => Unit) extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      publish(HookEvent("pre-backup", e.id.toString))
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      publish(HookEvent("post-backup", s"rows=${e.progress.numInputRows}"))
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      publish(HookEvent(if (e.exception.isDefined) "error" else "terminated",
        e.exception.getOrElse("")))
  }

  /** In-flight exact dedup — the streaming form of `q_dedup_exact`
    * (and the ingestion-time half of the training-data dedup story):
    * duplicates arriving within the watermark delay are dropped, and
    * the key state is EVICTED once the watermark passes, so state size
    * is bounded by the key arrival rate × delay, not by history.
    */
  def dedupedEvents(events: DataFrame, idCol: String,
      watermarkDelay: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Tumbling daily aggregate with watermark eviction — the streaming
    * form of `q_stream_tumbling`. Input must carry (ts: timestamp,
    * event_type: string, value: double).
    */
  def dailyCounts(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("day_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: purchases enriched with the same
    * user's clicks from the preceding hour (the attribution join every
    * event pipeline runs). Both sides carry watermarks and the join
    * condition is time-bounded, which is exactly what lets Spark evict
    * buffered join state once the watermark passes `ts + interval` —
    * state is bounded by arrival rate × (delay + 1 h), not history.
    * Works identically on a batch DataFrame (same code path, no state),
    * which is what the integration spec compares against.
    */
  def purchaseAttribution(events: DataFrame,
      watermarkDelay: String = "1 day"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("user_id", "purchase_id", "click_id", "p_ts", "c_ts")
  }

  /** Start the snapshot pipeline: aggregate → foreachBatch snapshot
    * write (one parquet dataset, day-partitioned; tiers are views).
    * `AvailableNow` = drain-everything-then-stop (the BACKUP_ON_START
    * immediate run); pass a ProcessingTime trigger for the cron shape.
    *
    * Each micro-batch is one backup tick, and `hooks` carries the
    * reference's gate semantics (backup.sh:16–18): pre-backup hooks
    * run SYNCHRONOUSLY at the top of the tick and a failure aborts it
    * — nothing is written, the query terminates exceptionally, and
    * the async [[HookListener]] (if attached) reports the error.
    * Post hooks fire after a successful tick, reverse order,
    * best-effort (backup.sh:129 `--reverse`).
    */
  def start(
      spark: SparkSession,
      events: DataFrame,
      destDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: String,
      gcKeepDays: Option[Int] = None,
      hooks: Hooks = Hooks.none): StreamingQuery = {
    dailyCounts(events).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the gate: a failing pre-backup hook throws HookAbort and the
        // tick writes NOTHING (the checkpoint does not advance either,
        // so a later restart replays the batch — at-least-once, like
        // re-running the reference's cron tick after a hook fix)
        hooks.firePre(s"batch=$batchId")
        // Atomic-swap analog (backup.sh:71–89): DYNAMIC partition
        // overwrite — append batches carry only newly closed windows,
        // so each tick must replace exactly its own day partitions and
        // leave every previously snapshotted day in place (static
        // overwrite would truncate the whole snapshot per tick).
        if (!batch.isEmpty)
          Retention.writeSnapshot(batch, col("day_start"), s"$destDir/snapshots",
            dynamicPartitions = true)
        // the reference's per-tick GC (backup.sh:119–122 runs right
        // after every backup): directory-name expiry, metadata-only
        gcKeepDays.foreach(k =>
          Retention.gcDirs(spark, s"$destDir/snapshots", k))
        hooks.firePost(s"batch=$batchId")
        ()
      }
      .start()
  }

  /** The reference's full boot sequence (init.sh:10–14) under a parsed
    * [[graft.Config.Settings]]: when `BACKUP_ON_START` is set, first
    * drain everything already available in ONE immediate run
    * (`AvailableNow`, blocking — init.sh runs the on-start backup to
    * completion BEFORE handing off to cron), then hand off to the
    * configured `SCHEDULE` cadence. Both phases share the checkpoint,
    * so the scheduled query resumes exactly where the drain stopped —
    * no event is double-snapshotted and none is skipped. Every tick
    * ends with the daily-tier retention GC (`keepDays`), completing
    * the reference's backup→gc loop.
    */
  def startScheduled(
      spark: SparkSession,
      events: DataFrame,
      destDir: String,
      checkpoint: String,
      settings: graft.Config.Settings): StreamingQuery = {
    val keep = Some(settings.keepDays)
    if (settings.backupOnStart)
      start(spark, events, destDir, Trigger.AvailableNow(), checkpoint, keep)
        .awaitTermination()
    start(spark, events, destDir, settings.schedule, checkpoint, keep)
  }
}
