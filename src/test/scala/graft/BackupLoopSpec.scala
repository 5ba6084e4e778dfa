package graft

import graft.operators.{BackupLoop, Relational, Retention, Snapshot}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The composed EP1 tick (backup.sh:21–130): multi-database snapshot →
  * validate → latest pointer → GC, against fixture-backed "databases".
  */
class BackupLoopSpec extends SparkSpec {

  private def source(s: org.apache.spark.sql.SparkSession, db: String) = db match {
    case "events" => Relational.eventsSec(s, sf)
      .select(col("event_id"), col("event_type"), col("value"), col("ts_s").as("ts"))
    case "orders" => Tables(s, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("ts"))
  }

  private def settings(dir: String, extra: (String, String)*) =
    Config.fromEnvOrThrow(Map(
      "GRAFT_DBS" -> "events,orders",
      "GRAFT_SNAPSHOT_DIR" -> dir) ++ extra)

  test("an overlapping tick on the same snapshot fails fast and fires the error hooks") {
    // the go-cron overlap (init.sh:14 forks the next tick regardless;
    // backup.sh takes no flock): while tick A holds the events
    // snapshot's writer lease, tick B must abort — error hooks fired,
    // LeaseHeldException rethrown (set -e semantics) — and the next
    // un-contended tick must succeed normally
    val dir = Files.createTempDirectory("graft-loop-race").toString
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val hooks = streaming.Hooks(error = Seq(ev => { errors += ev.detail; true }))
    intercept[AtomicDir.LeaseHeldException] {
      AtomicDir.withLease(s"$dir/events") {
        // run tick B from another thread: the lease is per-THREAD, so
        // the overlap is genuine even inside one JVM
        val out = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val b = new Thread(() =>
          try { BackupLoop.backupAll(spark, settings(dir), source _, "ts", hooks); () }
          catch { case t: Throwable => out.set(t) })
        b.start(); b.join()
        assert(out.get() != null, "overlapping tick must not silently succeed")
        throw out.get()
      }
    }
    assert(errors.exists(_.contains("lease")),
      s"error hooks must record the lease conflict, got: $errors")
    // the loser left nothing behind; a clean tick then lands normally
    val reports = BackupLoop.backupAll(spark, settings(dir), source _, "ts")
    assert(reports.map(_.db) == Seq("events", "orders") && reports.forall(_.rows > 0))
  }

  test("a tick snapshots every configured db, writes pointers, and GCs") {
    val dir = Files.createTempDirectory("graft-loop").toString
    val reports = BackupLoop.backupAll(spark, settings(dir), source _, "ts")
    assert(reports.map(_.db) == Seq("events", "orders"), "reference's serial db order")
    reports.foreach { r =>
      assert(r.rows > 0 && r.keptDays.nonEmpty)
      assert(r.latestDay == r.keptDays.max, "the latest day always survives GC")
      // default keepDays=7 on a ~29-day fixture must actually reclaim
      assert(r.deletedDays.nonEmpty, s"${r.db}: expected expired days")
      val days = Snapshot.restore(spark, s"$dir/${r.db}")
        .select("bucket_day").distinct().collect().map(_.getString(0)).toSeq.sorted
      assert(days == r.keptDays, s"${r.db}: restore must see exactly the kept days")
      // default symlink pointer dereferences to the latest day's rows
      val latest = BackupLoop.readLatest(spark, s"$dir/${r.db}",
        Retention.LatestMode.Symlink).get
      assert(latest.count() ==
        Snapshot.restore(spark, s"$dir/${r.db}")
          .filter(col("bucket_day") === r.latestDay).count())
    }
  }

  test("GRAFT_SUFFIX=.zip publishes one archive object per db per tick") {
    val dir = Files.createTempDirectory("graft-loop-zip").toString
    val reports = BackupLoop.backupAll(spark,
      settings(dir, "GRAFT_SUFFIX" -> ".zip"), source _, "ts")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    reports.foreach { r =>
      // the reference's literal artifact: ${DB}-<bucket>${BACKUP_SUFFIX}
      // (backup.sh:26–34), one single object
      val path = r.archive.getOrElse(fail(s"${r.db}: no archive published"))
      assert(path.endsWith(s"${r.db}-${r.latestDay}.zip"))
      assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(path)).isFile)
      // it holds exactly the latest day's rows
      val snap = Snapshot.restore(spark, s"$dir/${r.db}")
      val want = snap.filter(col("bucket_day") === r.latestDay)
      val back = Snapshot.importFrom(spark, path, "zip", want.schema)
      assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
        s"${r.db}: archive must round-trip the latest day")
      // and the underscore prefix keeps it out of restore()'s
      // partition discovery (snap above would have thrown otherwise)
    }
    // default suffix "" publishes nothing
    val dir2 = Files.createTempDirectory("graft-loop-nozip").toString
    assert(BackupLoop.backupAll(spark, settings(dir2), source _, "ts")
      .forall(_.archive.isEmpty))
  }

  test("a failing pre-backup hook aborts the tick: no snapshot, error hook fired") {
    val dir = Files.createTempDirectory("graft-loop-gate").toString
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    val hooks = streaming.Hooks(
      pre = Seq(
        e => { fired += s"pre1:${e.status}"; true },
        _ => { fired += "pre2:FAIL"; false }, // the guard says no
        _ => { fired += "pre3:NEVER"; true }),
      post = Seq(_ => { fired += "post:NEVER"; true }),
      error = Seq(e => { fired += s"err:${e.status}"; true }))
    intercept[streaming.HookAbort] {
      BackupLoop.backupAll(spark, settings(dir), source _, "ts", hooks)
    }
    // --exit-on-error: hooks after the failure never ran; the tick
    // wrote NOTHING; the error hook was notified; post never fired
    assert(fired.toSeq == Seq("pre1:pre-backup", "pre2:FAIL", "err:error"))
    assert(!new java.io.File(s"$dir/events").exists()
      && !new java.io.File(s"$dir/orders").exists(),
      "a gated tick must not write any snapshot")

    // a THROWING pre hook gates identically (a crashed script under
    // run-parts --exit-on-error)
    intercept[streaming.HookAbort] {
      BackupLoop.backupAll(spark, settings(dir), source _, "ts",
        streaming.Hooks(pre = Seq(_ => sys.error("boom"))))
    }
    assert(!new java.io.File(s"$dir/events").exists())
  }

  test("post-backup hooks run in reverse order after a successful tick") {
    val dir = Files.createTempDirectory("graft-loop-post").toString
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    val hooks = streaming.Hooks(
      pre = Seq(_ => { fired += "pre"; true }),
      post = Seq(
        _ => { fired += "post1"; true },
        _ => sys.error("post hook crash is best-effort"),
        _ => { fired += "post3"; true }))
    val reports = BackupLoop.backupAll(spark,
      settings(dir, "GRAFT_DBS" -> "events"), source _, "ts", hooks)
    assert(reports.nonEmpty)
    // --reverse: post3 before post1; the crashing post2 is swallowed
    assert(fired.toSeq == Seq("pre", "post3", "post1"))
  }

  test("hardlink mode materializes the latest day; off mode writes nothing") {
    val dir = Files.createTempDirectory("graft-loop-hard").toString
    val reports = BackupLoop.backupAll(spark,
      settings(dir, "GRAFT_LATEST_TYPE" -> "hardlink", "GRAFT_DBS" -> "events"),
      source _, "ts")
    val r = reports.head
    val copy = BackupLoop.readLatest(spark, s"$dir/events",
      Retention.LatestMode.Hardlink).get
    val want = Snapshot.dayView(Snapshot.restore(spark, s"$dir/events"), r.latestDay)
    assert(copy.count() == want.count() && copy.count() > 0)
    assert(copy.drop("bucket_day").exceptAll(want.drop("bucket_day")).isEmpty)

    val dirOff = Files.createTempDirectory("graft-loop-off").toString
    BackupLoop.backupAll(spark,
      settings(dirOff, "GRAFT_LATEST_TYPE" -> "none", "GRAFT_DBS" -> "events"),
      source _, "ts")
    assert(BackupLoop.readLatest(spark, s"$dirOff/events",
      Retention.LatestMode.Off).isEmpty)
    assert(!new java.io.File(s"$dirOff/events/_graft_latest").exists())
  }
}
