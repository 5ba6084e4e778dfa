package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe directory swap for standing state maintained by
  * write-new-then-swap loops ([[streaming.ProjectionStream]],
  * [[streaming.MomentsStream]], [[pipeline.IndexLifecycle]], the
  * snapshot manifest). A naive delete-then-rename has a window where
  * NO standing directory exists: a crash there makes the next run
  * treat the state as empty and silently drop every previously
  * accumulated partial.
  *
  * All paths go through the Hadoop [[FileSystem]] API resolved from
  * the path's own scheme — the same resolution the snapshot layer
  * uses (Snapshot.scala) — so the commit primitive is URI-portable:
  * `file:`, `hdfs:`, an object-store connector, or a custom test
  * scheme all take the identical code path ([[PortableFsSpec]] drives
  * the battery through a non-`file:` scheme end to end).
  *
  * Two protocols, chosen by when the crash is discovered:
  *
  * '''Rename protocol''' (steps; safe wherever directory rename is
  * atomic — local FS, HDFS):
  *
  *   1. create marker `dest.commit`  (THE commit point: one small
  *      file create — atomic even on object stores)
  *   2. rename dest   -> dest.old    (old state still recoverable)
  *   3. rename tmp    -> dest        (new state live)
  *   4. delete dest.old              (cleanup only)
  *   5. delete marker
  *
  * [[recover]] rolls a crash at any window to a deterministic winner:
  * marker present ⇒ the fully-written tmp was committed, so it (or
  * the dest it already became) wins and any partial/old state drops;
  * marker absent ⇒ the swap never committed, so the old state wins
  * and an uncommitted tmp drops. On a store whose rename is
  * copy+delete (no atomicity), the marker is what keeps the outcome
  * deterministic: a torn rename can leave both halves, and the marker
  * says which half is authoritative. Callers run [[recover]] before
  * every read of the standing directory.
  *
  * '''Writer lease''' (`dest.lock`): the crash windows above assume ONE
  * writer at a time, but the reference's scheduler happily overlaps
  * ticks — go-cron forks the next backup whether or not the previous
  * one finished (init.sh:14, no flock anywhere in backup.sh). Two
  * interleaved swaps could interleave their renames (A's set-aside
  * between B's set-aside and promote ⇒ B's recover promotes A's tmp
  * over B's). So every swap — and every standing-state TICK via
  * [[withLease]] — runs under an atomic-create lock file carrying a
  * lease expiry: the loser of a race fails fast
  * ([[LeaseHeldException]], retry next tick), an in-process failure
  * releases in `finally`, and only a DEAD holder leaves the lock to
  * expire by TTL — after which the next writer breaks it and
  * [[recover]] repairs whatever the corpse left, exactly as for any
  * crash ([[ContentionSpec]] drives both races over atomic and torn
  * renames).
  */
object AtomicDir {

  /** Hadoop conf: the active session's (so `spark.hadoop.*` overrides
    * and custom `fs.<scheme>.impl` registrations apply), or a plain
    * default when called outside any session.
    */
  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf())

  /** The staging path callers write the new state to. */
  def tmpPath(dest: String): String = dest + ".tmp"

  private def markerPath(dest: String) = new Path(dest + ".commit")

  private def lockPath(dest: String) = new Path(dest + ".lock")

  /** FileSystem for an arbitrary path string, resolved from its scheme
    * with the active session's conf — shared with the standing-state
    * loops so their marker/existence checks take the same URI-portable
    * path as the swap itself (never `java.io.File`).
    */
  private[graft] def fileSystem(path: String): FileSystem = fsOf(new Path(path))

  /** Default writer-lease TTL. A swap is a handful of renames — 60 s is
    * generous; the TTL exists only so a lease whose holder DIED (not
    * merely crashed its protocol — an in-process failure releases in
    * `finally`) cannot fence the directory forever.
    */
  val DefaultLeaseTtlMs: Long = 60000L

  /** A live writer already holds the `dest` lease — the overlapping-tick
    * scenario (a backup slower than its schedule: go-cron forks the next
    * tick regardless, init.sh:14). Callers fail the tick and retry on
    * their next schedule; they must NOT break the lock.
    */
  final class LeaseHeldException(msg: String) extends java.io.IOException(msg)

  /** Leases this thread currently holds (re-entrancy: a swap inside
    * `withLease` must not dead-fail against its own lock).
    */
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  /** Acquire the writer lease on `dest`: one atomic-exclusive small-file
    * create (the same primitive as the commit marker) whose content is
    * the lease EXPIRY epoch-millis. A live (unexpired) lock fails fast
    * with [[LeaseHeldException]]; an expired lock is broken and
    * re-acquired — its holder is dead, and the swap protocol itself
    * (marker + recover) guarantees whatever it left mid-flight repairs
    * deterministically.
    */
  private def acquire(fs: FileSystem, dest: String, ttlMs: Long): Unit = {
    val lock = lockPath(dest)
    var attempts = 0
    while (true) {
      try {
        val out = fs.create(lock, false)
        out.write((System.currentTimeMillis() + ttlMs).toString.getBytes("UTF-8"))
        out.close()
        return
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.io.IOException if fs.exists(lock) =>
          val expiry: Option[Long] =
            try {
              val in = fs.open(lock)
              val s = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
              if (s.nonEmpty) Some(s.toLong)
              // created-but-not-yet-written race window: fall back to
              // the file's own mtime + the caller's TTL
              else Some(fs.getFileStatus(lock).getModificationTime + ttlMs)
            } catch { case _: java.io.FileNotFoundException => None }
          expiry match {
            case Some(e) if System.currentTimeMillis() > e =>
              fs.delete(lock, false) // stale: holder died; break and retry
            case Some(e) =>
              throw new LeaseHeldException(
                s"writer lease on $dest held until epoch-ms $e — " +
                  "concurrent swap in flight (overlapping tick?)")
            case None => () // lock vanished between create and read: retry
          }
          attempts += 1
          if (attempts > 100)
            throw new java.io.IOException(s"livelock acquiring lease on $dest")
      }
    }
  }

  private def release(fs: FileSystem, dest: String): Unit =
    fs.delete(lockPath(dest), false)

  /** Run `body` holding the writer lease on `dest` — the
    * write-new-then-swap loops wrap their WHOLE tick (recover → marker
    * read → compute → write tmp → swap) in this, so two overlapping
    * ticks serialize: the loser fails fast with [[LeaseHeldException]]
    * instead of interleaving renames with the winner's protocol.
    * Re-entrant per thread. The lock releases in `finally` (an
    * in-process failure — including a torn rename — frees the
    * directory immediately; only a DEAD holder leaves the lock to
    * expire by TTL).
    */
  def withLease[A](dest: String, ttlMs: Long = DefaultLeaseTtlMs)(body: => A): A = {
    if (held.get.contains(dest)) return body
    val fs = fsOf(new Path(dest))
    acquire(fs, dest, ttlMs)
    held.get += dest
    try body
    finally {
      held.get -= dest
      release(fs, dest)
    }
  }

  /** Swap the fully-written `dest`.tmp into place over `dest`.
    * Standalone calls take the writer lease for the swap's duration;
    * calls inside [[withLease]] ride the caller's lease.
    */
  def swap(dest: String): Unit = withLease(dest) {
    val d = new Path(dest)
    val fs = fsOf(d)
    val t = new Path(tmpPath(dest))
    val o = new Path(dest + ".old")
    val m = markerPath(dest)
    if (fs.exists(o)) fs.delete(o, true)
    if (fs.exists(m))
      throw new java.io.IOException(
        s"swap: unrecovered commit marker at $dest — run recover first")
    // step 1 — commit point: from here the tmp content is authoritative
    fs.create(m, false).close()
    if (fs.exists(d) && !fs.rename(d, o)) {
      fs.delete(m, true)
      throw new java.io.IOException(s"swap: cannot set aside $dest")
    }
    if (!fs.rename(t, d)) {
      // roll back: the old state must come back before we fail
      if (fs.exists(o)) fs.rename(o, d)
      fs.delete(m, true)
      throw new java.io.IOException(s"swap failed: $t -> $dest")
    }
    if (fs.exists(o)) fs.delete(o, true)
    fs.delete(m, true)
  }

  /** Repair any half-finished swap at `dest`. Idempotent; call before
    * reading the standing state. Respects a LIVE writer lease (repair
    * while a swap is mid-protocol would steal its tmp): fails fast with
    * [[LeaseHeldException]] unless this thread holds the lease; an
    * EXPIRED lock (dead holder) is broken and the repair proceeds.
    */
  def recover(dest: String): Unit = {
    val d = new Path(dest)
    val fs = fsOf(d)
    if (!held.get.contains(dest)) {
      val lock = lockPath(dest)
      if (fs.exists(lock)) {
        val expiry =
          try {
            val in = fs.open(lock)
            val s = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
            if (s.nonEmpty) s.toLong
            else fs.getFileStatus(lock).getModificationTime + DefaultLeaseTtlMs
          } catch { case _: java.io.FileNotFoundException => 0L }
        if (System.currentTimeMillis() > expiry) fs.delete(lock, false)
        else throw new LeaseHeldException(
          s"recover($dest): writer lease live until epoch-ms $expiry — " +
            "swap in flight, repair would steal its tmp")
      }
    }
    val t = new Path(tmpPath(dest))
    val o = new Path(dest + ".old")
    val m = markerPath(dest)
    if (fs.exists(m)) {
      // committed: the tmp (or the dest it already became) must win.
      // A torn copy+delete rename can leave BOTH halves; tmp is the
      // fully-written original, so while it survives it is the source
      // of truth and any partial dest drops.
      if (fs.exists(t)) {
        if (fs.exists(d)) fs.delete(d, true)
        if (!fs.rename(t, d))
          throw new java.io.IOException(s"recover: cannot promote $t -> $dest")
      } else if (!fs.exists(d)) {
        // tmp fully consumed but dest absent: the only remaining copy
        // is the set-aside old state — surface it rather than nothing
        if (fs.exists(o) && !fs.rename(o, d))
          throw new java.io.IOException(s"recover: cannot restore $o -> $dest")
      }
      if (fs.exists(o)) fs.delete(o, true)
      fs.delete(m, true)
    } else {
      // uncommitted: pre-marker legacy windows (and states written by
      // the pre-marker protocol) — the old state wins
      if (!fs.exists(d) && fs.exists(o) && fs.exists(t)) {
        // crashed between set-aside and promote: the tmp is complete — promote it
        if (!fs.rename(t, d))
          throw new java.io.IOException(s"recover: cannot promote $t -> $dest")
      } else if (!fs.exists(d) && fs.exists(o)) {
        // tmp lost before going live: restore the old state
        if (!fs.rename(o, d))
          throw new java.io.IOException(s"recover: cannot restore $o -> $dest")
      }
      // leftovers from a crash before any rename (uncommitted tmp) or
      // after promote (old not yet deleted) are safe to drop
      if (fs.exists(d)) {
        if (fs.exists(o)) fs.delete(o, true)
        if (fs.exists(t)) fs.delete(t, true)
      }
    }
  }
}
