package graft

import graft.operators.{Relational, Retention}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Retention invariants (SURVEY.md §5.2): GC keeps exactly the rows
  * older than the cutoff, the latest pointer is the argmax, dedup is
  * idempotent, tier fan-out preserves counts. The arithmetic property
  * check runs ScalaCheck against a driver-side evaluation of the same
  * Columns (per-sample Spark jobs would take minutes).
  */
class RetentionSpec extends SparkSpec {

  test("gcCandidates keeps exactly rows strictly older than max(ts) - keep") {
    val e = Relational.eventsSec(spark, sf)
    val mx = e.agg(max(col("ts_s"))).head.getTimestamp(0).toInstant
    val cutoff = mx.minusSeconds(7L * 24 * 3600)
    val got = Retention.gcCandidates(e, col("ts_s"), "INTERVAL 7 DAYS").count()
    val want = e.filter(col("ts_s") < lit(java.sql.Timestamp.from(cutoff))).count()
    assert(got == want && got > 0)
  }

  test("latest is the argmax per group") {
    val e = Relational.eventsSec(spark, sf)
    val got = Retention.latest(e, Seq(col("event_type")), col("ts_s"), col("event_id"))
      .select("event_type", "event_id")
    // independent formulation: max_by over (ts, id) struct
    val want = e.groupBy("event_type")
      .agg(max_by(col("event_id"), struct(col("ts_s"), col("event_id"))).as("event_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == e.select("event_type").distinct().count())
  }

  test("dedup is idempotent and tier fan-out preserves counts") {
    val e = Relational.eventsSec(spark, sf).select("user_id", "event_type")
    val once = e.dropDuplicates("user_id", "event_type")
    assert(once.count() == once.dropDuplicates("user_id", "event_type").count())
    val n = Relational.eventsSec(spark, sf).count()
    val buckets = Retention.withBuckets(
      Relational.eventsSec(spark, sf), col("ts_s"), col("event_type"))
    assert(buckets.count() == n) // fan-out is column-wise, not row-wise
  }

  test("retention window arithmetic matches env.sh:26-29") {
    // one Spark evaluation over a sampled batch of (weeks, months)
    val gen = Gen.listOfN(50, Gen.zip(Gen.choose(0, 520), Gen.choose(0, 120)))
    val samples = gen.sample.get
    val df = spark.createDataFrame(samples).toDF("weeks", "months")
      .select(col("weeks"), col("months"),
        Retention.weeksToDays(col("weeks")).as("wd"),
        Retention.monthsToDays(col("months")).as("md"))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (w, m, wd, md) =>
      assert(wd == w * 7 + 1 && md == m * 31 + 1, s"w=$w m=$m wd=$wd md=$md")
    }
  }

  test("bucketWeekIso produces true ISO %G%V labels at year boundaries") {
    // hand-checked ISO 8601 facts: the week-YEAR differs from the
    // calendar year exactly where %G%V and %Y%V diverge
    val cases = Seq(
      "2021-01-01" -> "202053", // Friday of 2020-W53
      "2020-12-31" -> "202053",
      "2019-12-30" -> "202001", // Monday of 2020-W01
      "2023-01-01" -> "202252", // Sunday of 2022-W52
      "2024-12-30" -> "202501", // Monday of 2025-W01
      "2024-06-15" -> "202424") // mid-year: %G == %Y
    val df = spark.createDataFrame(cases).toDF("d", "want")
      .select(col("want"), Retention.bucketWeekIso(to_date(col("d"))).as("got"))
    df.collect().foreach(r =>
      assert(r.getString(1) == r.getString(0), s"want=${r.getString(0)} got=${r.getString(1)}"))
  }

  test("latestPointer honors the three BACKUP_LATEST_TYPE modes") {
    val e = Relational.eventsSec(spark, sf)
    def run(m: Retention.LatestMode) =
      Retention.latestPointer(e, Seq(col("event_type")), col("ts_s"), col("event_id"), m)
    assert(run(Retention.LatestMode.Off).isEmpty)
    val symlink = run(Retention.LatestMode.Symlink).get
    val hardlink = run(Retention.LatestMode.Hardlink).get
    // symlink is pointer-only (keys + identity), hardlink is the full row
    assert(symlink.columns.toSet == Set("event_type", "event_id", "ts_s"))
    assert(hardlink.columns.toSet == e.columns.toSet)
    // both select the same winners
    val a = symlink.select("event_type", "event_id")
    val b = hardlink.select("event_type", "event_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(Retention.LatestMode.parse("HardLink") == Right(Retention.LatestMode.Hardlink))
    assert(Retention.LatestMode.parse("sym-link").isLeft)
  }

  test("bucket templates are consistent projections of one timestamp") {
    val b = Retention.withBuckets(
      Relational.eventsSec(spark, sf), col("ts_s"), col("event_type"))
    // day prefix of instant; month prefix of day; filename embeds bucket
    val bad = b.filter(
      !col("bucket_instant").startsWith(col("bucket_day")) ||
      !col("bucket_day").startsWith(col("bucket_month")) ||
      !col("f_daily").startsWith(concat(col("event_type"), lit("-"), col("bucket_day"))))
    assert(bad.isEmpty)
  }

  test("gcDirs expires day directories by name; newest survives; missing dir is a no-op") {
    val src = Relational.eventsSec(spark, sf).select("event_id", "ts_s")
    val dest = java.nio.file.Files.createTempDirectory("graft-gcdirs").toString
    Retention.writeSnapshot(src, col("ts_s"), dest)
    val days = src.select(Retention.bucketDay(col("ts_s")).as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0)).toSeq
    assert(days.length >= 3)
    // expectations from the cutoff DATE predicate, not day positions —
    // a fixture with calendar gaps must not flip them
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    def ld(s: String) = java.time.LocalDate.parse(s, fmt)
    val cutoff = ld(days.max).minusDays(1)
    val wantExpired = days.filter(d => ld(d).isBefore(cutoff))
    val wantKept = days.filterNot(d => ld(d).isBefore(cutoff))
    val deleted = Retention.gcDirs(spark, dest, keepDays = 1)
    assert(deleted == wantExpired)
    deleted.foreach(d => assert(!new java.io.File(s"$dest/bucket_day=$d").exists()))
    val back = operators.Snapshot.restore(spark, dest)
      .select("bucket_day").distinct().orderBy("bucket_day")
      .collect().map(_.getString(0)).toSeq
    assert(back == wantKept)
    // keepDays=0 can never delete the newest day
    assert(Retention.gcDirs(spark, dest, 0) == wantKept.filterNot(_ == days.max))
    assert(Retention.gcDirs(spark, "/tmp/graft-no-such-dir", 1).isEmpty)
  }

  test("expireDays never anchors on or deletes an unparseable day name") {
    val (exp, kept) = Retention.expireDays(
      Seq("20240101", "20240301", "__HIVE_DEFAULT_PARTITION__"), 1)
    assert(exp == Seq("20240101"), "anchor must be the max PARSEABLE day")
    assert(kept == Seq("20240301", "__HIVE_DEFAULT_PARTITION__"))
    assert(Retention.expireDays(Seq("junk"), 0) == (Nil, Seq("junk")))
    assert(Retention.expireDays(Nil, 3) == (Nil, Nil))
  }
}
