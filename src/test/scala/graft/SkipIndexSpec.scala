package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Retention, SkipIndex, Snapshot}

/** Data-skipping index: exact results, real partition skips (scan
  * metrics, not plan text), and the digest staleness fence.
  */
class SkipIndexSpec extends SparkSpec {

  private lazy val events = Relational.eventsSec(spark, sf)
    .select("event_id", "user_id", "event_type", "value", "ts_s")

  private lazy val dest: String = {
    val d = Files.createTempDirectory("graft-skip").toString
    Snapshot.backup(events, col("ts_s"), d)
    SkipIndex.build(spark, d,
      bloomCols = Seq("user_id"), minmaxCols = Seq("value", "ts_s"))
    d
  }

  /** Day partitions the executed plan actually read under `dir` —
    * from the scan's own numPartitions metric (plan-text-free; zero
    * when empty-relation propagation removed the scan entirely).
    */
  private def partitionsRead(df: DataFrame, dir: String): Long = {
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains(dir)))
      .flatMap(_.metrics.get("numPartitions").map(_.value)).sum
  }

  test("bloom point lookup is exact and skips non-admitted days") {
    val uid = events.agg(min("user_id")).head.getLong(0)
    val got = SkipIndex.scanEq(spark, dest, "user_id", uid)
    val want = Snapshot.resolve(spark, dest).filter(col("user_id") === uid)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    val allDays = Snapshot.parts(spark, dest).count()
    // a key no row has: every day's bloom rejects it (false positives
    // may admit a few) — the result is exactly empty and the scan
    // touches (almost) no partition
    val ghost = SkipIndex.scanEq(spark, dest, "user_id", -987654321L)
    assert(ghost.isEmpty)
    assert(partitionsRead(ghost, dest) < allDays,
      "an absent key must skip days (1024-bit bloom over tiny day key sets)")
  }

  test("minmax range scan is exact; out-of-range scans read nothing") {
    val (lo, hi) = (0.25, 0.75)
    val got = SkipIndex.scanRange(spark, dest, "value", lo, hi)
    val want = Snapshot.resolve(spark, dest)
      .filter(col("value") >= lo && col("value") <= hi)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // a range above every day's max prunes ALL days through minmax
    val none = SkipIndex.scanRange(spark, dest, "value", 1e9, 2e9)
    assert(none.isEmpty)
    assert(partitionsRead(none, dest) == 0,
      "fully out-of-range scan must read zero partitions")

    // ts_s minmax: a one-day window reads exactly the overlapping day
    val day = Snapshot.parts(spark, dest).agg(max("bucket_day")).head.getString(0)
    val dayTs = s"${day.take(4)}-${day.slice(4, 6)}-${day.drop(6)}"
    val dayScan = SkipIndex.scanRange(spark, dest, "ts_s",
      java.sql.Timestamp.valueOf(s"$dayTs 00:00:00"),
      java.sql.Timestamp.valueOf(s"$dayTs 23:59:59"))
    assert(dayScan.count() ==
      events.filter(Retention.bucketDay(col("ts_s")) === day).count())
    assert(partitionsRead(dayScan, dest) == 1,
      "a one-day time window must read exactly one partition")
  }

  test("mutated days fall out of the fence: stale index loses pruning, never rows") {
    val d = Files.createTempDirectory("graft-skipmut").toString
    Snapshot.backup(events, col("ts_s"), d)
    SkipIndex.build(spark, d, bloomCols = Seq("user_id"))
    // mutate ONE day: delete everything in it except one user
    val day = Snapshot.parts(spark, d).agg(min("bucket_day")).head.getString(0)
    val keepUid = events.agg(max("user_id")).head.getLong(0)
    Snapshot.delete(spark, d,
      Retention.bucketDay(col("ts_s")) === day && col("user_id") =!= keepUid)

    // results stay exact through the stale index
    val got = SkipIndex.scanEq(spark, d, "user_id", keepUid)
    val want = Snapshot.resolve(spark, d).filter(col("user_id") === keepUid)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // sharp fence probe: a ghost key is bloom-rejected by EVERY day,
    // but the mutated day's digest no longer matches the build-time
    // fence — it must be read unconditionally (exactly 1 partition)
    val ghost = SkipIndex.scanEq(spark, d, "user_id", -987654321L)
    assert(ghost.isEmpty)
    assert(partitionsRead(ghost, d) == 1,
      "the fence-stale day must be force-read; all fence-valid days skip")

    // rebuilding re-fences: the same ghost now reads zero partitions
    SkipIndex.build(spark, d, bloomCols = Seq("user_id"))
    val ghost2 = SkipIndex.scanEq(spark, d, "user_id", -987654321L)
    assert(ghost2.isEmpty)
    assert(partitionsRead(ghost2, d) == 0)
  }
}
