package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The backup/restore loop itself (layer [R]): `BACKUP DATABASE … TO
  * Disk` (backup.sh:45) with the post-write validation of
  * backup.sh:47–65, and the restore direction the ClickHouse BACKUP
  * feature implies.
  *
  * Scale shape: the snapshot is ONE physical parquet dataset
  * partitioned by day bucket ([[Retention.writeSnapshot]]); the four
  * retention tiers are zero-copy views (filters on bucket columns —
  * the hardlink fan-out of backup.sh:67–97 without the copies), and
  * reads that filter a bucket prune partitions at the scan.
  */
object Snapshot {

  /** Hidden manifest directory inside a snapshot: one row per day
    * partition with an order-insensitive content digest. Paths starting
    * with `_` are invisible to Spark's file index, so a plain
    * `spark.read.parquet(dest)` of the data never picks it up.
    */
  private val ManifestDir = "_graft_manifest"

  /** Per-day-partition content digest: row count + XOR and
    * overflow-free decimal SUM of the per-row `xxhash64` over all data
    * columns (column order fixed by sorting names, so the digest is
    * schema-order independent). XOR alone cancels duplicate-row pairs;
    * the (count, xor, sum) triple disambiguates. Order-insensitive by
    * construction — parquet row order across writers never matters.
    * One row per day bucket: metadata-scale, whatever the data scale.
    */
  private[graft] def digest(bucketed: DataFrame): DataFrame = {
    val dataCols = bucketed.columns.filterNot(_ == "bucket_day").sorted
      .map(col(_))
    bucketed
      .select(col("bucket_day"), xxhash64(dataCols: _*).as("_rh"))
      .groupBy("bucket_day").agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(_rh)").as("content_xor"),
        sum(col("_rh").cast("decimal(38,0)")).as("content_sum"))
  }

  /** Snapshot write + the reference's fail-fast post-write checks
    * (backup.sh:47–65: file must exist and be non-trivial, else exit
    * 1): write day-partitioned, read back, verify row count matches.
    * The read-back pass also produces the per-partition digest manifest
    * that incremental backups diff against — validation and manifest
    * cost one pass together. Returns the verified row count.
    */
  def backup(df: DataFrame, ts: Column, dest: String): Long = graft.AtomicDir.withLease(dest) {
    // writer lease on the snapshot itself: two overlapping backups of
    // one destination — the go-cron fork-regardless schedule
    // (init.sh:14), whether both arrive via the Scala API, the SQL-text
    // router, or one of each — serialize here; the loser fails fast
    // with LeaseHeldException. BackupLoop's whole-tick lease re-enters.
    val expected = df.count()
    Retention.writeSnapshot(df, ts, dest)
    // an empty write leaves no readable footers — that IS the failure
    // mode the reference's [ -f FILE ] check catches (backup.sh:47–52)
    val dig =
      try digest(restore(df.sparkSession, dest)).collect()
      catch { case _: org.apache.spark.sql.AnalysisException => Array.empty[org.apache.spark.sql.Row] }
    val actual = dig.map(_.getLong(1)).sum
    require(actual == expected,
      s"snapshot validation failed: wrote $expected rows, read back $actual (dest=$dest)")
    require(actual > 0, s"snapshot validation failed: empty snapshot at $dest")
    writeManifest(df.sparkSession, dest, dig.map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toString, "full", null: String)
    })
    actual
  }

  /** Incremental snapshot — the `base_backup` capability of ClickHouse
    * 24.8's BACKUP (the version the reference pins, Dockerfile:2): a
    * daily-cadence tool (Dockerfile:20 `@daily`) mostly re-backs-up
    * unchanged data, so the delta writes ONLY day-partitions whose
    * content digest differs from the base snapshot's manifest, plus a
    * manifest mapping every current day to its source (base | delta).
    *
    * Scale shape: one full read of the data being backed up (the same
    * read a full backup needs) but a write proportional to the CHANGED
    * days only; the base is never re-read — its manifest (one row per
    * day) carries the comparison. The only `.collect()`s move per-day
    * digest rows: metadata scale, like the KMeans model pulls.
    *
    * Returns (changedDays, totalDays).
    */
  def backupIncremental(df: DataFrame, ts: Column, baseDir: String,
      dest: String): (Int, Int) = graft.AtomicDir.withLease(dest) {
    val spark = df.sparkSession
    val (_, baseRows) = readManifest(spark, baseDir).getOrElse(
      throw new IllegalArgumentException(
        s"base snapshot at $baseDir has no manifest — re-run Snapshot.backup on it"))
    val baseDig = baseRows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val cur = df.withColumn("bucket_day", Retention.bucketDay(ts))
    val curDig = digest(cur).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toString)
    }.sortBy(_._1)
    require(curDig.nonEmpty, s"snapshot validation failed: empty snapshot at $dest")
    val changed = curDig.collect {
      case (day, n, x, s) if !baseDig.get(day).contains((n, x, s)) => day
    }
    if (changed.nonEmpty)
      // the day list is O(days) literals — a partition-metadata-scale
      // predicate the writer uses to re-scan only the changed days
      cur.filter(col("bucket_day").isin(changed: _*))
        .write.mode("overwrite").partitionBy("bucket_day").parquet(dest)
    writeManifest(spark, dest, curDig.map { case (day, n, x, s) =>
      (day, n, x, s, if (changed.contains(day)) "delta" else "base", baseDir)
    })
    // fail-fast validation, digest-deep like the reference's post-write
    // check: the RESOLVED view (delta ∪ pruned base) must reproduce the
    // current per-day digests exactly
    val resolved = digest(resolve(spark, dest)).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toString)
    }.sortBy(_._1)
    require(resolved.sameElements(curDig),
      s"incremental snapshot validation failed: resolved view diverges from source (dest=$dest)")
    (changed.length, curDig.length)
  }

  /** Chain-resolving restore: a full snapshot reads directly; an
    * incremental one unions its delta partitions with the (recursively
    * resolved) base restricted to the days the manifest attributes to
    * the base. Both sides filter on `bucket_day` — the partition column
    * — so every leaf scan prunes to exactly the days it contributes.
    * Days deleted since the base simply aren't in the manifest: restore
    * reproduces the state at backup time, like RESTORE from a BACKUP
    * chain.
    */
  def resolve(spark: SparkSession, dest: String): DataFrame =
    readManifest(spark, dest) match {
      case None | Some((None, _)) => restore(spark, dest)
      case Some((Some(base), rows)) =>
        val deltaDays = rows.collect { case (d, _, _, _, "delta") => d }
        val baseDays = rows.collect { case (d, _, _, _, "base") => d }
        // fail-fast on a broken chain (manifest-only, no data reads):
        // if the base was GC'd past days this delta still attributes to
        // it, a silent filter would return a "successful" restore
        // missing those days
        readManifest(spark, base).foreach { case (_, baseRows) =>
          val have = baseRows.map(_._1).toSet
          val missing = baseDays.filterNot(have)
          require(missing.isEmpty,
            s"incremental chain broken: base $base no longer holds day(s) " +
              s"${missing.mkString(", ")} that $dest attributes to it " +
              "(base GC'd after the delta was taken?)")
        }
        val fromBase = resolve(spark, base)
          .filter(col("bucket_day").isin(baseDays: _*))
        if (deltaDays.isEmpty) fromBase // nothing changed: no delta footers exist
        else restore(spark, dest)
          .filter(col("bucket_day").isin(deltaDays: _*))
          .unionByName(fromBase)
    }

  /** Per-day outcome of a [[gc]] run. */
  final case class GcReport(deletedDays: Seq[String], keptDays: Seq[String])

  /** Physical retention GC — the `find … -exec rm -rvf` that ends the
    * reference's backup loop (backup.sh:119–122), completing what
    * [[Retention.gcCandidates]] only computes: day partitions strictly
    * older than `max(day) − keepDays` are DELETED from the snapshot
    * directory and the manifest is rewritten without them, so restores,
    * tier views, and incremental chains all exclude the expired days
    * from then on. The cutoff anchors to the newest day in the
    * manifest, not wall-clock, mirroring gcCandidates' deterministic
    * `max(ts) − keep` predicate — and guaranteeing the newest day
    * always survives (GC can never empty a snapshot, the reference's
    * keep-at-least-latest invariant).
    *
    * Scale shape: pure metadata — the decision reads only the manifest
    * (one row per day), the deletes are O(expired days) directory
    * removals, and the rewrite is the one-row-per-day manifest. No data
    * file is ever read.
    *
    * On an incremental snapshot, expired days sourced from the base
    * have no local `bucket_day=` directory — they leave the manifest
    * here (excluding them from resolution) and their bytes are
    * reclaimed when gc runs on the base snapshot itself, exactly like
    * the reference GC'ing each retention tier's own directory.
    * Conversely, GC'ing a snapshot that still serves as a chain's BASE
    * orphans the days its dependents attribute to it — [[resolve]]
    * fails fast on such a chain rather than silently restoring less
    * data (run gc root-first with windows no tighter than the
    * dependents').
    */
  def gc(spark: SparkSession, dest: String, keepDays: Int): GcReport = {
    val (base, rows) = readManifest(spark, dest).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot at $dest has no manifest — re-run Snapshot.backup on it"))
    // one shared expiry rule with the directory GC (Retention.expireDays)
    val (expiredDays, _) = Retention.expireDays(rows.map(_._1), keepDays)
    val expiredSet = expiredDays.toSet
    val (expired, kept) = rows.partition(r => expiredSet(r._1))
    if (expired.nonEmpty) {
      val destPath = new org.apache.hadoop.fs.Path(dest)
      val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
      expired.foreach { case (day, _, _, _, source) =>
        if (source != "base")
          fs.delete(new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day"), true)
      }
      writeManifest(spark, dest, kept.map { case (day, n, x, s, src) =>
        (day, n, x, s, src, base.orNull)
      })
      // fail-fast consistency: the surviving local partition dirs must
      // be exactly the kept locally-sourced days (metadata-scale listing)
      val remaining = fs.listStatus(destPath).map(_.getPath.getName)
        .collect { case p if p.startsWith("bucket_day=") => p.stripPrefix("bucket_day=") }
        .sorted.toSeq
      val wantLocal = kept.collect { case (day, _, _, _, src) if src != "base" => day }
        .sorted
      require(remaining == wantLocal,
        s"gc left inconsistent partitions at $dest: have $remaining, want $wantLocal")
    }
    GcReport(expired.map(_._1).sorted, kept.map(_._1).sorted)
  }

  final case class CompactReport(daysCompacted: Seq[String],
      filesBefore: Long, filesAfter: Long)

  /** ClickHouse `OPTIMIZE TABLE … FINAL` analog for the snapshot's
    * file layout: rewrite every local day partition that has
    * accumulated multiple part files into one file. Content (and
    * therefore the manifest digests) is unchanged — this is purely
    * the small-files defense: a snapshot written by a 1000-task job,
    * or grown by many incremental ticks, otherwise fragments into
    * task-count × days files and every restore/scan pays the
    * per-file open cost. Runs day-at-a-time (write-new-then-rename,
    * same swap discipline as the streaming projection) so a crash
    * leaves every partition either old or new, never half.
    */
  def compact(spark: SparkSession, dest: String): CompactReport = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())

    // recover any half-finished swap from a previous crashed run: a
    // missing day dir with a surviving tmp promotes (content identical
    // by construction); with only an old, the old restores; leftovers
    // next to an intact day dir are uncommitted and drop
    fs.listStatus(destPath).map(_.getPath).foreach { p =>
      val n = p.getName
      val dayName = if (n.startsWith("_compact_tmp_")) Some(n.stripPrefix("_compact_tmp_"))
        else if (n.startsWith("_compact_old_")) Some(n.stripPrefix("_compact_old_"))
        else None
      dayName.foreach { day =>
        val dir = new org.apache.hadoop.fs.Path(destPath, day)
        if (fs.exists(dir)) fs.delete(p, true)
        else if (!fs.rename(p, dir))
          throw new java.io.IOException(s"compaction recovery failed for $dir")
      }
    }

    val dayDirs = fs.listStatus(destPath).map(_.getPath)
      .filter(_.getName.startsWith("bucket_day="))
    var before = 0L
    var after = 0L
    val compacted = Seq.newBuilder[String]
    dayDirs.sortBy(_.getName).foreach { dir =>
      val parts = fs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") || p.getName.startsWith("part-"))
      before += parts.length
      if (parts.length > 1) {
        val tmp = new org.apache.hadoop.fs.Path(
          destPath, "_compact_tmp_" + dir.getName)
        spark.read.parquet(dir.toString).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        // keep only data files in the swapped-in dir (drop _SUCCESS)
        fs.listStatus(tmp).map(_.getPath)
          .filterNot(p => p.getName.endsWith(".parquet") || p.getName.startsWith("part-"))
          .foreach(p => fs.delete(p, false))
        // rename-aside swap: the old partition is never deleted before
        // the new one is live — a crash leaves either dir or a
        // recoverable tmp/old pair (see the recovery pass above)
        val old = new org.apache.hadoop.fs.Path(
          destPath, "_compact_old_" + dir.getName)
        if (!fs.rename(dir, old))
          throw new java.io.IOException(s"compaction swap failed for $dir (set-aside)")
        if (!fs.rename(tmp, dir)) {
          fs.rename(old, dir) // roll back before failing
          throw new java.io.IOException(s"compaction swap failed for $dir")
        }
        fs.delete(old, true)
        compacted += dir.getName.stripPrefix("bucket_day=")
        after += 1
      } else after += parts.length
    }
    CompactReport(compacted.result(), before, after)
  }

  final case class MutationReport(daysRewritten: Seq[String],
      daysDropped: Seq[String], rowsAffected: Long)

  /** `ALTER TABLE … DELETE WHERE predicate` over a snapshot — the
    * ClickHouse 24.8 mutation surface (the engine version the
    * reference pins, Dockerfile:2), and the GDPR/right-to-be-forgotten
    * path a 100 TB corpus needs: rows matching `predicate` are removed
    * from the snapshot IN PLACE, rewriting only the day partitions
    * that actually contain matches.
    *
    * Scale shape: one predicate scan finds the affected days (pruned
    * to the predicate's partition column when it names `bucket_day`),
    * then each affected day rewrites independently — cost is O(matched
    * days), never O(snapshot). Unaffected days keep their files and
    * manifest digests untouched. Day swaps use the same rename-aside
    * discipline as [[compact]]; a crash leaves every day either old or
    * new.
    *
    * On an incremental snapshot, a mutated day the manifest attributes
    * to the base is materialized LOCALLY (copy-on-write) and its
    * source flips to `delta` — the chain stays resolvable and the base
    * snapshot is never touched. Mutating a snapshot that itself serves
    * as a BASE for other deltas propagates into their restores (the
    * dependents attribute those days to it by reference) — for the
    * GDPR use case that propagation is the point; take a fresh full
    * backup first if the dependents must keep the old rows.
    */
  def delete(spark: SparkSession, dest: String, predicate: Column): MutationReport = {
    // NULL-predicate rows survive: DELETE removes rows where the
    // predicate is TRUE — `!pred` alone would filter NULLs out too
    val r = mutate(spark, dest, predicate, day => day.filter(!coalesce(predicate, lit(false))))
    logMutation(spark, dest, "DELETE", predicateSql(predicate), r)
    r
  }

  /** `ALTER TABLE … UPDATE col = expr WHERE predicate`: rows matching
    * `predicate` get each assignment applied (cast back to the
    * column's original type — a mutation must never drift the schema);
    * everything else, and every untouched day, stays bit-identical.
    * Same day-granular rewrite + manifest re-digest as [[delete]].
    */
  def update(spark: SparkSession, dest: String, predicate: Column,
      assignments: Map[String, Column]): MutationReport = {
    val r = mutate(spark, dest, predicate, { day =>
      val bad = assignments.keySet -- day.columns.toSet
      require(bad.isEmpty, s"update assigns to unknown column(s): ${bad.mkString(", ")}")
      val fields = day.schema.fields.map(f => f.name -> f.dataType).toMap
      day.select(day.columns.map { c =>
        assignments.get(c) match {
          case Some(a) => when(predicate, a.cast(fields(c))).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
    })
    val cmd = assignments.keys.toSeq.sorted.mkString("UPDATE ", ", ", "")
    logMutation(spark, dest, cmd, predicateSql(predicate), r)
    r
  }

  /** `OPTIMIZE TABLE … FINAL DEDUPLICATE` — drop fully identical rows
    * (ClickHouse's other OPTIMIZE arm; [[compact]] is the file-layout
    * one). Day partitions are independent dedup domains (the snapshot
    * partitions on the event day, so a true duplicate lands in the
    * same partition); only days that actually contain duplicates
    * rewrite — found by ONE per-day (count, distinct-count) pass,
    * metadata-scale collect.
    */
  def deduplicate(spark: SparkSession, dest: String): MutationReport = {
    recoverMutationDebris(spark, dest)
    val (base, manifestRows) = requireManifest(spark, dest)
    val resolved = resolve(spark, dest)
    val dataCols = resolved.columns.filterNot(_ == "bucket_day").sorted
    val perDay = resolved.groupBy("bucket_day").agg(
      count(lit(1)).as("n"),
      countDistinct(struct(dataCols.map(col): _*)).as("nd")).collect()
    val dup = perDay.filter(r => r.getLong(1) > r.getLong(2))
    val report =
      if (dup.isEmpty) MutationReport(Nil, Nil, 0L)
      else rewriteDayPartitions(spark, dest, base, manifestRows,
        dup.map(_.getString(0)).sorted.toSeq, _.dropDuplicates(),
        dup.map(r => r.getLong(1) - r.getLong(2)).sum)
    logMutation(spark, dest, "OPTIMIZE DEDUPLICATE", "", report)
    report
  }

  /** Hidden `system.mutations` sidecar: the ordered audit log of every
    * mutation command run against the snapshot.
    */
  private val MutationsDir = "_graft_mutations"

  /** A stable rendering of the mutation predicate for the audit log —
    * Column.toString's prefix form, e.g. `=(event_type, 'error')`.
    */
  private def predicateSql(predicate: Column): String = predicate.toString

  /** `system.mutations` analog: one row per mutation command ever run
    * — ordinal, wall-clock time, command, predicate, day/row impact,
    * completion flag (always true: mutations here are synchronous,
    * where ClickHouse's are queued). Pure metadata, AtomicDir-swapped
    * like the manifest; model-scale by construction.
    */
  def mutations(spark: SparkSession, dest: String): DataFrame = {
    import spark.implicits._
    graft.AtomicDir.recover(s"$dest/$MutationsDir")
    try spark.read.parquet(s"$dest/$MutationsDir")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        Seq.empty[(Long, Long, String, String, Long, Long, Long, Boolean)]
          .toDF("mutation_id", "event_time_ms", "command", "predicate",
            "days_rewritten", "days_dropped", "rows_affected", "is_done")
    }
  }

  private def logMutation(spark: SparkSession, dest: String, command: String,
      predicate: String, r: MutationReport): Unit = {
    import spark.implicits._
    val dir = s"$dest/$MutationsDir"
    val prior = mutations(spark, dest).collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getString(2), x.getString(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getBoolean(7))).toSeq
    val nextId = prior.map(_._1).maxOption.getOrElse(0L) + 1
    val row = (nextId, System.currentTimeMillis(), command, predicate,
      r.daysRewritten.length.toLong, r.daysDropped.length.toLong,
      r.rowsAffected, true)
    (prior :+ row)
      .toDF("mutation_id", "event_time_ms", "command", "predicate",
        "days_rewritten", "days_dropped", "rows_affected", "is_done")
      .coalesce(1).write.mode("overwrite").parquet(graft.AtomicDir.tmpPath(dir))
    graft.AtomicDir.swap(dir)
  }

  /** Clear debris a crashed mutation left behind, BEFORE any scan of
    * the snapshot (a day missing mid-swap must be restored before the
    * predicate pass, or its rows would be invisible to the mutation):
    * stray `_mutate_tmp_` dirs are uncommitted work (drop); a
    * `_mutate_old_` set-aside whose day directory is missing restores
    * (the crash hit between the swap's two renames); one next to an
    * intact day is a completed swap's leftover (drop).
    */
  private def recoverMutationDebris(spark: SparkSession, dest: String): Unit = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(destPath)) return
    fs.listStatus(destPath).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("_mutate_tmp_")) fs.delete(p, true)
      else if (n.startsWith("_mutate_old_")) {
        val dir = new org.apache.hadoop.fs.Path(destPath, n.stripPrefix("_mutate_old_"))
        if (fs.exists(dir)) fs.delete(p, true)
        else if (!fs.rename(p, dir))
          throw new java.io.IOException(s"mutation recovery failed for $dir")
      }
    }
  }

  private def requireManifest(spark: SparkSession, dest: String) =
    readManifest(spark, dest).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot at $dest has no manifest — re-run Snapshot.backup on it"))

  /** Per-day content digests (day, xor, sum) — the staleness fence
    * [[SkipIndex]] records at build time and re-checks at scan time,
    * and the byte-identity witness [[graft.GraftSqlSpec]] compares
    * between the SQL-text BACKUP route and the direct API.
    */
  private[graft] def manifestDigests(
      spark: SparkSession, dest: String): Seq[(String, Long, String)] =
    requireManifest(spark, dest)._2.map(r => (r._1, r._3, r._4))

  private def mutate(spark: SparkSession, dest: String, predicate: Column,
      rewriteDay: DataFrame => DataFrame): MutationReport = {
    recoverMutationDebris(spark, dest)
    val (base, manifestRows) = requireManifest(spark, dest)
    // one pass over the resolved view: which days contain matches, and
    // how many rows (metadata-scale collect — one row per affected day)
    val hits = digestScan(resolve(spark, dest).filter(predicate))
    if (hits.isEmpty) return MutationReport(Nil, Nil, 0L)
    rewriteDayPartitions(spark, dest, base, manifestRows,
      hits.map(_._1).sorted, rewriteDay, hits.map(_._2).sum)
  }

  /** Shared day-granular rewrite core of [[delete]]/[[update]]/
    * [[deduplicate]]: swap each affected day via rename-aside, drop
    * emptied days, re-digest only what changed, update the manifest.
    *
    * Two phases: every rewritten day is first materialized into a
    * `_mutate_tmp_` directory with NOTHING existing touched — so the
    * refuse-to-empty-the-snapshot guard (and any write failure) aborts
    * with the snapshot bit-identical — and only then do the
    * rename-aside swaps and day drops run. Crash debris from a
    * previous run is swept by [[recoverMutationDebris]] at the
    * mutation ENTRY points — before the predicate scan, so a day
    * missing mid-swap is restored before its rows are searched.
    */
  private def rewriteDayPartitions(spark: SparkSession, dest: String,
      base: Option[String],
      manifestRows: Seq[(String, Long, Long, String, String)],
      affected: Seq[String], rewriteDay: DataFrame => DataFrame,
      rowsAffected: Long): MutationReport = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val resolved = resolve(spark, dest)

    // phase 1 — materialize: compute every affected day into its tmp
    // dir (or mark it dropped); the snapshot itself is untouched
    val rewritten = Seq.newBuilder[String]
    val dropped = Seq.newBuilder[String]
    affected.foreach { day =>
      val dayDf = rewriteDay(resolved.filter(col("bucket_day") === day))
        .drop("bucket_day")
      if (dayDf.isEmpty) dropped += day
      else {
        val tmp = new org.apache.hadoop.fs.Path(destPath, s"_mutate_tmp_bucket_day=$day")
        dayDf.write.mode("overwrite").parquet(tmp.toString)
        fs.listStatus(tmp).map(_.getPath)
          .filterNot(p => p.getName.endsWith(".parquet") || p.getName.startsWith("part-"))
          .foreach(p => fs.delete(p, false))
        rewritten += day
      }
    }
    val rewrittenDays = rewritten.result()
    val droppedDays = dropped.result()
    if ((manifestRows.map(_._1).toSet -- droppedDays).isEmpty) {
      // refuse BEFORE anything is destroyed — the guard must protect
      // the data, not lament it
      rewrittenDays.foreach { day =>
        fs.delete(new org.apache.hadoop.fs.Path(destPath, s"_mutate_tmp_bucket_day=$day"), true)
      }
      throw new IllegalArgumentException(
        s"mutation would delete every row of $dest — refusing to leave an empty snapshot")
    }

    // phase 2 — swap: rename-aside each rewritten day (the old dir may
    // not exist: a base-sourced day materializes locally here —
    // copy-on-write), delete the emptied days
    rewrittenDays.foreach { day =>
      val dayDir = new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day")
      val tmp = new org.apache.hadoop.fs.Path(destPath, s"_mutate_tmp_bucket_day=$day")
      val old = new org.apache.hadoop.fs.Path(destPath, s"_mutate_old_bucket_day=$day")
      if (fs.exists(dayDir) && !fs.rename(dayDir, old))
        throw new java.io.IOException(s"mutation swap failed for $dayDir (set-aside)")
      if (!fs.rename(tmp, dayDir)) {
        if (fs.exists(old)) fs.rename(old, dayDir)
        throw new java.io.IOException(s"mutation swap failed for $dayDir")
      }
      if (fs.exists(old)) fs.delete(old, true)
    }
    droppedDays.foreach { day =>
      val dayDir = new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day")
      if (fs.exists(dayDir)) fs.delete(dayDir, true)
    }

    // re-digest ONLY the rewritten days from the read-back (they are
    // all local dirs now) — write-then-verify, like backup()
    val newDigests: Map[String, (Long, Long, String)] =
      if (rewrittenDays.isEmpty) Map.empty
      else digestScan(restore(spark, dest)
        .filter(col("bucket_day").isin(rewrittenDays: _*)))
        .map { case (d, n, x, s) => d -> ((n, x, s)) }.toMap
    require(newDigests.keySet == rewrittenDays.toSet,
      s"mutation read-back lost day(s): ${(rewrittenDays.toSet -- newDigests.keySet).mkString(", ")}")

    val newRows = manifestRows.flatMap { case (day, n, x, s, source) =>
      if (droppedDays.contains(day)) None
      else newDigests.get(day) match {
        case Some((n2, x2, s2)) =>
          // a day rewritten locally is now delta-sourced on a chain
          val src = if (source == "base") "delta" else source
          Some((day, n2, x2, s2, src, base.orNull))
        case None => Some((day, n, x, s, source, base.orNull))
      }
    }
    require(newRows.nonEmpty,
      s"mutation deleted every row of $dest — refuse to leave an empty snapshot")
    writeManifest(spark, dest, newRows)
    MutationReport(rewrittenDays, droppedDays, rowsAffected)
  }

  /** `system.parts` analog: the snapshot's part inventory as a
    * DataFrame — one row per day partition with its manifest row count
    * and source (`full` | `base` | `delta`). Pure metadata: reads only
    * the manifest, never a data footer — at 100 TB this is the
    * operator's monitoring surface (which days exist, how big, which
    * live locally vs on the chain's base) at one-row-per-day cost.
    */
  def parts(spark: SparkSession, dest: String): DataFrame = {
    import spark.implicits._
    val (_, rows) = requireManifest(spark, dest)
    rows.map(r => (r._1, r._2, r._5))
      .toDF("bucket_day", "n_rows", "source")
  }

  /** `system.detached_parts` analog: the days currently sitting in the
    * snapshot's `_detached/` area — the inventory a ClickHouse operator
    * polls before deciding what to ATTACH back or delete. One row per
    * detached day with its row count and byte size. The listing is
    * metadata-scale; the row count reads each detached day's footers —
    * O(detached days) day-sized reads, bounded by operator actions
    * (DETACH is a manual verb), never by the corpus.
    */
  def detachedParts(spark: SparkSession, dest: String): DataFrame = {
    import spark.implicits._
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val detachedRoot = new org.apache.hadoop.fs.Path(destPath, "_detached")
    val rows =
      if (!fs.exists(detachedRoot)) Seq.empty[(String, Long, Long)]
      else fs.listStatus(detachedRoot)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket_day="))
        .map(_.getPath).sortBy(_.getName)
        .map { p =>
          val day = p.getName.stripPrefix("bucket_day=")
          val bytes = fs.getContentSummary(p).getLength
          (day, spark.read.parquet(p.toString).count(), bytes)
        }.toSeq
    rows.toDF("bucket_day", "n_rows", "bytes")
  }

  /** `ALTER TABLE … DETACH PARTITION` — take one day out of service:
    * its directory moves aside to `_detached_bucket_day=<day>` (data
    * preserved, exactly ClickHouse's `detached/` area) and the manifest
    * drops the row, so restores, tier views, gc, and incremental
    * chains all exclude the day immediately. A base-sourced day on a
    * chain has no local directory — it materializes copy-on-write into
    * the detached area first, so the attach-back contract is uniform
    * and the base snapshot is never touched.
    *
    * Scale shape: one rename (or one day-sized copy for base-sourced
    * days) + the one-row-per-day manifest rewrite. No other data moves.
    */
  def detachPartition(spark: SparkSession, dest: String, day: String): Unit = {
    val (base, rows) = requireManifest(spark, dest)
    val row = rows.find(_._1 == day).getOrElse(throw new IllegalArgumentException(
      s"no partition bucket_day=$day in snapshot $dest (have: ${rows.map(_._1).mkString(", ")})"))
    require(rows.length > 1,
      s"refusing to detach the only partition of $dest — that would empty the snapshot")
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dayDir = new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day")
    // nested under a plain `_`-prefixed dir: a name containing `=` at
    // the snapshot root would be parsed as a conflicting partition
    // column by Spark's discovery; `_detached/` is invisible like the
    // manifest (exactly ClickHouse's `detached/` area)
    val detached = new org.apache.hadoop.fs.Path(destPath, s"_detached/bucket_day=$day")
    require(!fs.exists(detached),
      s"a detached copy of bucket_day=$day already exists at $dest — attach or delete it first")
    fs.mkdirs(detached.getParent)
    if (row._5 == "base")
      // copy-on-write: the day's bytes live in the base; materialize
      // them locally so attach-back never depends on the base's gc
      resolve(spark, dest).filter(col("bucket_day") === day).drop("bucket_day")
        .write.parquet(detached.toString)
    else if (!fs.rename(dayDir, detached))
      throw new java.io.IOException(s"detach failed for $dayDir")
    writeManifest(spark, dest, rows.filterNot(_._1 == day)
      .map(r => (r._1, r._2, r._3, r._4, r._5, base.orNull)))
  }

  /** `ALTER TABLE … ATTACH PARTITION` — bring a detached day back: the
    * directory renames into place, the read-back re-digests it (the
    * checksum verification ClickHouse does on ATTACH), and the manifest
    * gains the row back as locally-sourced (`delta` on a chain — the
    * local dir now carries the day, whatever its original source).
    */
  def attachPartition(spark: SparkSession, dest: String, day: String): Unit = {
    val (base, rows) = requireManifest(spark, dest)
    require(!rows.exists(_._1 == day),
      s"partition bucket_day=$day is already attached at $dest")
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val detached = new org.apache.hadoop.fs.Path(destPath, s"_detached/bucket_day=$day")
    require(fs.exists(detached), s"no detached partition bucket_day=$day at $dest")
    val dayDir = new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day")
    if (!fs.rename(detached, dayDir))
      throw new java.io.IOException(s"attach failed for $dayDir")
    // ATTACH verifies what it adopted: digest the day from the read-back
    val dig = digestScan(restore(spark, dest).filter(col("bucket_day") === day))
    require(dig.length == 1 && dig.head._2 > 0,
      s"attach read-back failed for bucket_day=$day at $dest")
    val (_, n, x, s) = dig.head
    val src = if (base.isDefined) "delta" else "full"
    writeManifest(spark, dest, (rows.map(r => (r._1, r._2, r._3, r._4, r._5, base.orNull))
      :+ ((day, n, x, s, src, base.orNull))).sortBy(_._1))
  }

  /** `ALTER TABLE … DROP PARTITION` — discard one day outright: the
    * local directory deletes (if any — a base-sourced day on a chain
    * has none and the base is never touched) and the manifest drops
    * the row, so restores, tier views, and chains exclude the day
    * immediately. Pure metadata + one directory delete — the
    * partition-aligned fast path of [[delete]] (which would reach the
    * same outcome through a predicate scan). Refuses to drop the only
    * partition, like every other would-empty guard.
    */
  def dropPartition(spark: SparkSession, dest: String, day: String): Unit = {
    val (base, rows) = requireManifest(spark, dest)
    val row = rows.find(_._1 == day).getOrElse(throw new IllegalArgumentException(
      s"no partition bucket_day=$day in snapshot $dest (have: ${rows.map(_._1).mkString(", ")})"))
    require(rows.length > 1,
      s"refusing to drop the only partition of $dest — that would empty the snapshot")
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (row._5 != "base")
      fs.delete(new org.apache.hadoop.fs.Path(destPath, s"bucket_day=$day"), true)
    writeManifest(spark, dest, rows.filterNot(_._1 == day)
      .map(r => (r._1, r._2, r._3, r._4, r._5, base.orNull)))
  }

  /** `ALTER TABLE … MOVE PARTITION TO TABLE` — re-home one day from
    * one snapshot to another: detach at the source, rename the
    * detached directory across (one filesystem move — no data rewrite,
    * like ClickHouse moving parts between tables on one disk), attach
    * at the destination (which re-digests — the adoption checksum).
    * Schemas must agree; checked against the source day's footer
    * BEFORE anything moves, so a mismatch aborts with both snapshots
    * untouched.
    */
  def movePartition(spark: SparkSession, srcDest: String, dstDest: String,
      day: String): Unit = {
    val srcDay = new org.apache.hadoop.fs.Path(srcDest, s"bucket_day=$day")
    val fs = srcDay.getFileSystem(spark.sessionState.newHadoopConf())
    // fail fast with nothing moved: destination must be a manifested
    // snapshot without the day, and the schemas must line up
    val (_, dstRows) = requireManifest(spark, dstDest)
    require(!dstRows.exists(_._1 == day),
      s"destination $dstDest already holds bucket_day=$day")
    val srcSchema = resolve(spark, srcDest).filter(col("bucket_day") === day)
      .drop("bucket_day").schema
    val dstSchema = resolve(spark, dstDest).drop("bucket_day").schema
    require(srcSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
        dstSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema mismatch moving bucket_day=$day: source $srcSchema vs destination $dstSchema")
    detachPartition(spark, srcDest, day)
    val from = new org.apache.hadoop.fs.Path(srcDest, s"_detached/bucket_day=$day")
    val to = new org.apache.hadoop.fs.Path(dstDest, s"_detached/bucket_day=$day")
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to)) {
      attachPartition(spark, srcDest, day) // roll back before failing
      throw new java.io.IOException(s"move failed renaming $from to $to")
    }
    attachPartition(spark, dstDest, day)
  }

  /** `ALTER TABLE … REPLACE PARTITION … FROM src` — adopt the source
    * snapshot's version of one day, COPY semantics (the source is
    * never touched, unlike [[movePartition]]): the source day resolves
    * (chains materialize copy-on-write) into the destination's
    * detached area, the destination's current day — if any — detaches
    * aside, and the incoming directory attaches (re-digest, the
    * adoption checksum). Schema compatibility is checked BEFORE any
    * write. A crash mid-way leaves the destination either pre-replace
    * or in the documented detached state ([[attachPartition]] rolls
    * forward); the staged `.incoming`/`.replaced` directories are
    * `_`-hidden debris, never data.
    */
  def replacePartition(spark: SparkSession, srcDest: String, dstDest: String,
      day: String): Unit = {
    val (_, srcRows) = requireManifest(spark, srcDest)
    require(srcRows.exists(_._1 == day),
      s"source $srcDest has no partition bucket_day=$day")
    val (_, dstRows) = requireManifest(spark, dstDest)
    val srcSchema = resolve(spark, srcDest).drop("bucket_day").schema
    val dstSchema = resolve(spark, dstDest).drop("bucket_day").schema
    require(srcSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
        dstSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema mismatch replacing bucket_day=$day: source $srcSchema vs destination $dstSchema")
    val fs = new org.apache.hadoop.fs.Path(dstDest)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val detached = new org.apache.hadoop.fs.Path(dstDest, s"_detached/bucket_day=$day")
    require(!fs.exists(detached),
      s"destination $dstDest already has a detached bucket_day=$day — attach or remove it first")
    // stage the copy while the destination still serves its old day
    val staged = new org.apache.hadoop.fs.Path(dstDest, s"_detached/bucket_day=$day.incoming")
    resolve(spark, srcDest).filter(col("bucket_day") === day).drop("bucket_day")
      .write.mode("overwrite").parquet(staged.toString)
    val replaced = new org.apache.hadoop.fs.Path(dstDest, s"_detached/bucket_day=$day.replaced")
    if (dstRows.exists(_._1 == day)) {
      detachPartition(spark, dstDest, day)
      if (!fs.rename(detached, replaced))
        throw new java.io.IOException(s"replace: cannot set aside $detached")
    }
    if (!fs.rename(staged, detached))
      throw new java.io.IOException(s"replace: cannot promote $staged")
    attachPartition(spark, dstDest, day)
    fs.delete(replaced, true)
  }

  /** Hidden schema-evolution sidecar: the ordered `ALTER TABLE ADD/
    * DROP COLUMN` log. Like the manifest, `_`-prefixed so data reads
    * never see it.
    */
  private val SchemaDir = "_graft_schema"

  /** `ALTER TABLE … ADD COLUMN name type DEFAULT expr` — metadata-only,
    * exactly ClickHouse's semantics: NO data file is touched; existing
    * rows surface the default at read time ([[readEvolved]]), and the
    * column becomes physical only as new data carrying it is written.
    * At 100 TB this is the only viable ALTER: a schema change must
    * never imply a corpus rewrite.
    */
  def addColumn(spark: SparkSession, dest: String, name: String,
      defaultSql: String, dataType: String): Unit = {
    requireManifest(spark, dest) // only evolve real snapshots
    require(!resolve(spark, dest).columns.contains(name) &&
        !readSchemaLog(spark, dest).exists(r => r._2 == "add" && r._3 == name),
      s"column $name already exists at $dest")
    // validate the default parses and casts NOW, not at first read
    spark.range(1).select(expr(defaultSql).cast(dataType))
    writeSchemaLog(spark, dest,
      readSchemaLog(spark, dest) :+ ((nextOrd(spark, dest), "add", name, defaultSql, dataType)))
  }

  /** `ALTER TABLE … DROP COLUMN` — metadata-only: the column vanishes
    * from evolved reads immediately; bytes are reclaimed only as days
    * rewrite for other reasons (mutation, compaction), like ClickHouse
    * parts dropping the column on their next merge.
    */
  def dropColumn(spark: SparkSession, dest: String, name: String): Unit = {
    requireManifest(spark, dest)
    require(readEvolved(spark, dest).columns.contains(name),
      s"no column $name at $dest")
    require(name != "bucket_day", "cannot drop the partition column")
    writeSchemaLog(spark, dest,
      readSchemaLog(spark, dest) :+ ((nextOrd(spark, dest), "drop", name, null, null)))
  }

  /** [[resolve]] with the schema-evolution log replayed in order:
    * added columns materialize their default where the footers lack
    * them (or are null — the pre-evolution rows), dropped columns
    * disappear. Pure projection on top of the resolved scan — zero
    * extra shuffle, codegen'd like any withColumn.
    */
  def readEvolved(spark: SparkSession, dest: String): DataFrame = {
    var df = resolve(spark, dest)
    readSchemaLog(spark, dest).sortBy(_._1).foreach {
      case (_, "add", name, defaultSql, dtype) =>
        df =
          if (df.columns.contains(name))
            df.withColumn(name, coalesce(col(name), expr(defaultSql).cast(dtype)))
          else df.withColumn(name, expr(defaultSql).cast(dtype))
      case (_, "drop", name, _, _) =>
        df = df.drop(name)
      case (_, other, _, _, _) =>
        throw new IllegalStateException(s"unknown schema-log action '$other' at $dest")
    }
    df
  }

  private def nextOrd(spark: SparkSession, dest: String): Long =
    readSchemaLog(spark, dest).map(_._1).maxOption.getOrElse(0L) + 1L

  private def readSchemaLog(spark: SparkSession, dest: String)
      : Seq[(Long, String, String, String, String)] =
    try {
      graft.AtomicDir.recover(s"$dest/$SchemaDir")
      spark.read.parquet(s"$dest/$SchemaDir")
        .select("ord", "action", "name", "default_sql", "data_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4)))
        .sortBy(_._1).toSeq
    } catch { case _: org.apache.spark.sql.AnalysisException => Nil }

  private def writeSchemaLog(spark: SparkSession, dest: String,
      rows: Seq[(Long, String, String, String, String)]): Unit = {
    import spark.implicits._
    val dir = s"$dest/$SchemaDir"
    graft.AtomicDir.recover(dir)
    rows.toDF("ord", "action", "name", "default_sql", "data_type")
      .coalesce(1).write.mode("overwrite").parquet(graft.AtomicDir.tmpPath(dir))
    graft.AtomicDir.swap(dir)
  }

  /** digest() collected as (day, n, xor, sum-string) tuples. */
  private def digestScan(df: DataFrame): Seq[(String, Long, Long, String)] =
    digest(df).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toString)
    }.toSeq

  private def writeManifest(spark: SparkSession, dest: String,
      rows: Seq[(String, Long, Long, String, String, String)]): Unit = {
    import spark.implicits._
    // AtomicDir swap: a plain overwrite deletes the old manifest before
    // the new one exists — a crash in that window would orphan the
    // snapshot's gc/incremental/mutation surface (restore still works;
    // everything manifest-driven refuses). Same discipline as the
    // streaming standing-state swaps.
    val dir = s"$dest/$ManifestDir"
    graft.AtomicDir.recover(dir)
    rows.toDF("bucket_day", "n_rows", "content_xor", "content_sum", "source", "base_path")
      .coalesce(1).write.mode("overwrite").parquet(graft.AtomicDir.tmpPath(dir))
    graft.AtomicDir.swap(dir)
  }

  /** (base path if incremental, per-day rows (day, n, xor, sum, source));
    * None when the directory has no manifest (a bare parquet dataset).
    */
  private def readManifest(spark: SparkSession, dir: String)
      : Option[(Option[String], Seq[(String, Long, Long, String, String)])] =
    try {
      graft.AtomicDir.recover(s"$dir/$ManifestDir")
      val rows = spark.read.parquet(s"$dir/$ManifestDir")
        .select("bucket_day", "n_rows", "content_xor", "content_sum", "source", "base_path")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getString(4), Option(r.getString(5))))
      val bases = rows.flatMap(_._6).distinct
      require(bases.length <= 1, s"manifest at $dir names multiple bases: ${bases.mkString(",")}")
      Some((bases.headOption, rows.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq))
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** RESTORE analog: read the snapshot back (schema from parquet
    * footers — the engine is schema-dynamic like the reference, which
    * backs up whatever schema the DB has). Partition-column type
    * inference is disabled DURING the read (and restored after — the
    * read resolves its schema eagerly) so `bucket_day` comes back as
    * the string it was written as without perturbing the caller's
    * session for unrelated reads.
    */
  def restore(spark: SparkSession, dest: String): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try spark.read.parquet(dest)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Format-parametric export — the `BACKUP_SUFFIX` axis of the
    * reference (Dockerfile:23: the archive format is a config choice,
    * not a semantic one). Parquet is the engine's native snapshot
    * format (columnar, typed, partition-prunable); ORC matches it
    * feature-for-feature; JSON/CSV are interchange sinks whose
    * read-back needs the schema re-applied (text formats erase types —
    * import requires the original schema for a lossless round trip,
    * which [[importFrom]] enforces by taking it explicitly).
    */
  val Formats: Set[String] = Set("parquet", "orc", "json", "csv", "zip")

  def exportAs(df: DataFrame, dest: String, format: String): Unit = {
    require(Formats(format), s"unsupported snapshot format '$format' (one of $Formats)")
    if (format == "zip") { exportZip(df, dest); return }
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(dest)
  }

  /** Single-file compressed archive — the reference's literal artifact
    * shape (`BACKUP_SUFFIX=".zip"`, Dockerfile:23; one object per
    * (db, bucket), backup.sh:26–34). The rows are staged as the
    * engine's native parquet next to `dest`, then streamed into ONE
    * zip object through the Hadoop [[FileSystem]] of the destination
    * (URI-portable — a bucket URI works wherever a connector is on the
    * classpath). Entries are name-sorted with zeroed timestamps
    * (archive layout independent of listing order and wall clock;
    * part-file names still carry the write's job id, as in any Spark
    * sink). Parquet pages are
    * already compressed, so entries are STORED, not deflated — the zip
    * is the container (single PUT / single download), not a second
    * compressor. A single object is inherently single-writer: this arm
    * is the reference-parity interchange artifact; the partitioned
    * parquet/orc directory stays the 100 TB path.
    */
  private def exportZip(df: DataFrame, dest: String): Unit = {
    val spark = df.sparkSession
    val stage = new org.apache.hadoop.fs.Path(dest + ".stage")
    df.write.mode("overwrite").parquet(stage.toString)
    zipDirectory(spark, stage.toString, dest)
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(stage, true)
  }

  /** Stream a whole directory tree into ONE zip object — the container
    * arm shared by [[exportZip]] and the SQL-text `BACKUP … TO
    * Disk('backups', '….zip')` route ([[graft.GraftSql]]). Entries are
    * relative paths, name-sorted, STORED, zero-timestamped (see
    * [[exportZip]]'s determinism notes).
    */
  private[graft] def zipDirectory(spark: SparkSession, srcDir: String,
      dest: String): Unit = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(srcDir)
    // recursive listStatus walk, not listFiles: the latter's
    // LocatedFileStatus eagerly loads permissions through a
    // file:-scheme-only java.io.File path on local-backed filesystems
    // — exactly the portability trap this layer must avoid
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st.getPath)
      }
    // deterministic archive: fixed entry order whatever listing order
    // the store returns
    val files = walk(stage).sortBy(_.toString)
    val out = new java.util.zip.ZipOutputStream(fs.create(destPath, true))
    try {
      // listStatus returns fs-qualified paths; qualify the stage the
      // same way or the prefix strip silently yields absolute entry
      // names on schemeless destinations
      val stagePrefix = fs.makeQualified(stage).toString + "/"
      val buf = new Array[Byte](64 * 1024)
      files.foreach { f =>
        val name = f.toString.stripPrefix(stagePrefix)
        require(name != f.toString && !name.startsWith("/"),
          s"archive entry $f does not relativize under $stagePrefix")
        val st = fs.getFileStatus(f)
        val entry = new java.util.zip.ZipEntry(name)
        entry.setMethod(java.util.zip.ZipEntry.STORED)
        entry.setSize(st.getLen)
        entry.setTime(0L)
        val in = fs.open(f)
        val crc = new java.util.zip.CRC32
        try {
          var n = in.read(buf)
          while (n >= 0) { crc.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        entry.setCrc(crc.getValue)
        out.putNextEntry(entry)
        val in2 = fs.open(f)
        try {
          var n = in2.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in2.read(buf) }
        } finally in2.close()
        out.closeEntry()
      }
    } finally out.close()
  }

  /** Schema-explicit import: text formats come back string-typed
    * without it, and even parquet/ORC benefit from the assert-early
    * contract (a drifted snapshot fails at read, not mid-query).
    */
  def importFrom(spark: SparkSession, dest: String, format: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(Formats(format), s"unsupported snapshot format '$format' (one of $Formats)")
    if (format == "zip") return importZip(spark, dest, schema)
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(dest)
  }

  /** Unpack the archive next to itself (overwriting any previous
    * unpack) and read the parquet back under the asserted schema.
    * Entry names are relative paths from [[exportZip]]; each is
    * re-rooted under the unpack dir and validated against `..`
    * traversal before any byte lands.
    */
  private def importZip(spark: SparkSession,
      dest: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val unpack = dest + ".unpacked"
    unzipDirectory(spark, dest, unpack)
    spark.read.schema(schema).parquet(unpack)
  }

  /** Unpack a zip object into `destDir` (clearing any previous unpack)
    * — the restore half of [[zipDirectory]], shared with the SQL-text
    * `RESTORE … FROM '….zip'` route. Entry names are relative paths;
    * each is re-rooted under the unpack dir and validated against `..`
    * traversal before any byte lands.
    */
  private[graft] def unzipDirectory(spark: SparkSession, zipFile: String,
      destDir: String): Unit = {
    val zipPath = new org.apache.hadoop.fs.Path(zipFile)
    val fs = zipPath.getFileSystem(spark.sessionState.newHadoopConf())
    val unpack = new org.apache.hadoop.fs.Path(destDir)
    fs.delete(unpack, true)
    val in = new java.util.zip.ZipInputStream(fs.open(zipPath))
    try {
      val buf = new Array[Byte](64 * 1024)
      var entry = in.getNextEntry
      while (entry != null) {
        require(!entry.getName.split('/').contains(".."),
          s"zip entry escapes the archive root: ${entry.getName}")
        if (!entry.isDirectory) {
          val out = fs.create(new org.apache.hadoop.fs.Path(unpack, entry.getName), true)
          try {
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally out.close()
        }
        entry = in.getNextEntry
      }
    } finally in.close()
  }

  /** A retention-tier view over the snapshot: day-bucket prefix length
    * selects the tier granularity (day=8, month=6 via prefix). Filters
    * on `bucket_day` are partition predicates — the scan prunes whole
    * directories, which is the point of partitioning by the bucket.
    */
  def dayView(snap: DataFrame, day: String): DataFrame =
    snap.filter(col("bucket_day") === day)

  def monthView(snap: DataFrame, month: String): DataFrame =
    snap.filter(col("bucket_day").startsWith(month))
}
