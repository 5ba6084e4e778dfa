package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's own dataflow (layer [R]), re-expressed relationally.
  *
  * The reference rotates every backup into four retention tiers named by
  * time-bucket templates (backup.sh:26–29): instant `%Y%m%d-%H%M%S`,
  * day `%Y%m%d`, ISO week `%G%V`, month `%Y%m`; keeps a per-(db, tier)
  * "latest" pointer (backup.sh:99–115); and garbage-collects snapshots
  * older than a per-tier retention window (backup.sh:119–122, windows
  * computed at env.sh:26–29).
  *
  * Spark-first modeling (SURVEY.md §4): ONE physical dataset with bucket
  * columns; tiers are filters/views over it (the hardlink fan-out of
  * backup.sh:67–97 becomes zero-copy projections). All helpers are pure
  * Column/DataFrame transforms — no driver-side iteration, no collect —
  * so they hold at any scale: bucketing is a narrow map, latest-pointer
  * is a shuffle on (db, bucket) only, GC is a filter with a broadcast
  * 1-row cutoff.
  */
object Retention {

  /** Week bucket: `date_trunc('week')` day key rather than `%G%V`
    * (SURVEY.md §5.3.6 — ISO-week-year formatting is an oracle parity
    * hazard; Monday-truncation is identical in Spark and DuckDB).
    */
  def bucketWeek(ts: Column): Column = date_format(date_trunc("week", ts), "yyyyMMdd")
  def bucketInstant(ts: Column): Column = date_format(ts, "yyyyMMdd-HHmmss")
  def bucketDay(ts: Column): Column = date_format(ts, "yyyyMMdd")
  def bucketMonth(ts: Column): Column = date_format(ts, "yyyyMM")

  /** True ISO `%G%V` week bucket — bit-faithful to backup.sh:28, which
    * [[bucketWeek]] only approximates (same partitioning, different
    * label at year boundaries). Spark's datetime patterns ban the
    * week-based-year letter, so the week-year is derived structurally:
    * the ISO week-year of a date is the calendar year of the THURSDAY
    * of its ISO week (ISO 8601), and `date_trunc('week')` is the week's
    * Monday, +3 days = Thursday. `weekofyear` is already ISO
    * week-of-year in both Spark and DuckDB.
    */
  def bucketWeekIso(ts: Column): Column =
    format_string("%04d%02d",
      year(date_add(date_trunc("week", ts).cast("date"), 3)),
      weekofyear(ts))

  /** `BACKUP_LATEST_TYPE` (Dockerfile:24; applied backup.sh:99–115):
    * how the per-group "latest" pointer materializes.
    */
  sealed trait LatestMode
  object LatestMode {
    /** A zero-copy reference: group keys + the winning snapshot's
      * identity only, dereferenced against the snapshot at read time —
      * the relational symlink. GC of the target dangles the pointer,
      * exactly like a filesystem symlink.
      */
    case object Symlink extends LatestMode
    /** A full materialized copy of the latest rows — survives GC of the
      * original, exactly like a hardlinked inode.
      */
    case object Hardlink extends LatestMode
    /** No pointer emitted at all (`BACKUP_LATEST_TYPE=none`). */
    case object Off extends LatestMode

    def parse(s: String): Either[String, LatestMode] = s.toLowerCase match {
      case "symlink" => Right(Symlink)
      case "hardlink" => Right(Hardlink)
      case "none" => Right(Off)
      case other => Left(s"latest-pointer type must be symlink|hardlink|none, got '$other'")
    }
  }

  /** The latest-pointer emission under a [[LatestMode]]: `None` for
    * `Off`; pointer-only columns (group keys + id + ts) for `Symlink`;
    * the full latest rows for `Hardlink`. All three share [[latest]]'s
    * single window pass — the mode only chooses what survives it.
    */
  def latestPointer(df: DataFrame, groupCols: Seq[Column], ts: Column,
      id: Column, mode: LatestMode): Option[DataFrame] = mode match {
    case LatestMode.Off => None
    case LatestMode.Hardlink => Some(latest(df, groupCols, ts, id))
    case LatestMode.Symlink =>
      Some(latest(df, groupCols, ts, id).select(groupCols :+ id :+ ts: _*))
  }

  /** Snapshot filename per tier: `${db}-${bucket}${suffix}`
    * (backup.sh:26–34, suffix default ".zip" per Dockerfile:23).
    */
  def filename(db: Column, bucket: Column, suffix: String = ".zip"): Column =
    concat(db, lit("-"), bucket, lit(suffix))

  /** Adds the four tier-bucket columns + per-tier filenames. `db` plays
    * the role of the reference's database name (backup.sh:24 loop).
    */
  def withBuckets(df: DataFrame, ts: Column, db: Column): DataFrame =
    df.withColumn("bucket_instant", bucketInstant(ts))
      .withColumn("bucket_day", bucketDay(ts))
      .withColumn("bucket_week", bucketWeek(ts))
      .withColumn("bucket_month", bucketMonth(ts))
      .withColumn("f_last", filename(db, bucketInstant(ts)))
      .withColumn("f_daily", filename(db, bucketDay(ts)))
      .withColumn("f_weekly", filename(db, bucketWeek(ts)))
      .withColumn("f_monthly", filename(db, bucketMonth(ts)))

  /** Latest pointer per group (backup.sh:99–115): rank-1 by recency.
    * Deterministic tie-break on `id` so the winner is identical across
    * engines (and across reruns). Window shuffles on the group keys
    * only — at 100 TB this is a single hash-partition pass, and the
    * per-group state is O(1) (row_number needs no buffering beyond sort).
    */
  def latest(df: DataFrame, groupCols: Seq[Column], ts: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(ts.desc, id.desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Retention-GC candidates (backup.sh:119–122): rows strictly older
    * than `max(ts) − keep`. Anchoring the cutoff to max(ts) instead of
    * wall-clock keeps results deterministic (SURVEY.md §2.B). The 1-row
    * aggregate is broadcast — no full-table shuffle, scale-safe.
    */
  def gcCandidates(df: DataFrame, ts: Column, keepExpr: String): DataFrame = {
    val cutoff = df.agg(max(ts).as("mx"))
      .select((col("mx") - expr(keepExpr)).as("cutoff"))
    df.join(broadcast(cutoff)).filter(ts < col("cutoff")).drop("cutoff")
  }

  /** Retention-window arithmetic (env.sh:26–29): weeks→days `*7+1`,
    * months→days `*31+1`.
    */
  def weeksToDays(weeks: Column): Column = weeks * 7 + 1
  def monthsToDays(months: Column): Column = months * 31 + 1

  /** THE expiry rule, shared by every GC form ([[gcDirs]] here and the
    * manifest-aware [[Snapshot.gc]] — one copy so they cannot drift):
    * a day expires iff it is strictly older than `max(day) − keepDays`
    * (wall-clock-free; the newest day always survives). Days are
    * `yyyyMMdd` strings; anything unparseable is treated as KEPT (and
    * excluded from the anchor) — a stray `__HIVE_DEFAULT_PARTITION__`
    * directory must neither win the max nor crash the GC tick.
    * Returns (expired, kept), both sorted.
    */
  private[graft] def expireDays(days: Seq[String], keepDays: Int)
      : (Seq[String], Seq[String]) = {
    require(keepDays >= 0, s"keepDays must be non-negative, got $keepDays")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    def parse(d: String): Option[java.time.LocalDate] =
      try Some(java.time.LocalDate.parse(d, fmt)) catch { case _: Exception => None }
    val dated = days.flatMap(d => parse(d).map(d -> _))
    if (dated.isEmpty) return (Nil, days.sorted)
    val cutoff = dated.map(_._2).max.minusDays(keepDays)
    val (exp, kept) = dated.partition(_._2.isBefore(cutoff))
    (exp.map(_._1).sorted,
      (kept.map(_._1) ++ days.filter(d => parse(d).isEmpty)).sorted)
  }

  /** Directory-name GC for manifest-less day-partitioned snapshots —
    * the streaming sink's form of [[Snapshot.gc]]: the day IS the
    * partition directory name, so expiry needs no manifest at all.
    * Deletes `bucket_day=` directories per [[expireDays]] and returns
    * the deleted days. Pure metadata: one directory listing +
    * O(expired) deletes, no data file reads — cheap enough to run
    * after every micro-batch, which is exactly the reference's
    * backup-then-gc tick (backup.sh:45 → 119–122).
    */
  def gcDirs(spark: SparkSession, dest: String, keepDays: Int): Seq[String] = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(destPath)) return Nil
    val days = fs.listStatus(destPath).map(_.getPath.getName)
      .collect { case n if n.startsWith("bucket_day=") => n.stripPrefix("bucket_day=") }
    val (expired, _) = expireDays(days.toSeq, keepDays)
    expired.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$d"), true))
    expired
  }

  /** Snapshot writer (the `BACKUP DATABASE … TO Disk` analog,
    * backup.sh:45): one physical copy, partitioned by day bucket so the
    * tier views and GC prune partitions instead of scanning.
    *
    * `dynamicPartitions` selects the overwrite semantics: `false`
    * (default) is a FULL replace — the whole snapshot is this
    * DataFrame, the batch-backup contract; `true` replaces ONLY the
    * partitions present in the batch, leaving earlier days in place —
    * the reference's atomic per-tier `mv` swap (backup.sh:71–89) and
    * the required mode for the streaming sink, whose append batches
    * carry only newly closed days (a full replace there would truncate
    * every previously snapshotted day on each tick).
    */
  def writeSnapshot(df: DataFrame, ts: Column, dest: String,
      dynamicPartitions: Boolean = false): Unit = {
    val w = df.withColumn("bucket_day", bucketDay(ts))
      .write.mode("overwrite")
    (if (dynamicPartitions) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("bucket_day")
      .parquet(dest)
  }
}
