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
  * every read of the standing directory; a CLEAN directory (no
  * marker, no tmp, no old) returns immediately WITHOUT consulting the
  * writer lock, so readers are fenced only during the actual swap
  * windows, never for the length of a compute tick.
  *
  * '''Writer lease''' (`dest.lock`): the crash windows above assume ONE
  * writer at a time, but the reference's scheduler happily overlaps
  * ticks — go-cron forks the next backup whether or not the previous
  * one finished (init.sh:14, no flock anywhere in backup.sh). Two
  * interleaved swaps could interleave their renames (A's set-aside
  * between B's set-aside and promote ⇒ B's recover promotes A's tmp
  * over B's). So every swap — and every standing-state TICK via
  * [[withLease]] — runs under a lock file carrying a lease expiry AND
  * a holder-unique owner token:
  *
  *   - the loser of a race fails fast ([[LeaseHeldException]], retry
  *     next tick); an in-process failure releases in `finally`; only
  *     a DEAD holder leaves the lock to expire by TTL.
  *   - expired locks are broken ATOMICALLY: the breaker RENAMES the
  *     lock to a breaker-unique name first and only the successful
  *     renamer proceeds — two contenders reading the same stale
  *     expiry can never both break it (rename is the one primitive
  *     the rest of the protocol already relies on; a read-then-delete
  *     break would be a TOCTOU admitting two holders).
  *   - `create(overwrite=false)` on a local filesystem is itself
  *     exists-then-create, so a "successful" create is confirmed by
  *     READING THE TOKEN BACK: if a racing contender's token landed
  *     instead, this contender lost and fails fast.
  *   - release deletes the lock ONLY while it still carries this
  *     holder's token — a lease that expired mid-tick and was broken
  *     by the next writer is never deleted out from under that
  *     writer (which would have admitted a third).
  *   - [[swap]] re-verifies ownership at the COMMIT POINT and renews
  *     the expiry while it still holds it ([[LeaseLostException]]
  *     aborts the tick BEFORE any rename if the lease was lost), so a
  *     tick that outlives its TTL fails cleanly instead of
  *     interleaving renames with the successor's protocol.
  *
  * ([[ContentionSpec]] drives the races over atomic and torn renames.)
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

  /** Default writer-lease TTL — sized to a standing-state TICK, not to
    * the handful of renames inside it: [[operators.BackupLoop]] and the
    * streaming merge loops hold the lease across whole ticks (backup +
    * validation + GC), which at rehearsal scale run minutes. The TTL
    * exists only so a lease whose holder DIED (not merely crashed its
    * protocol — an in-process failure releases in `finally`) cannot
    * fence the directory forever; a live holder additionally RENEWS at
    * every swap commit point, so even a tick longer than the TTL keeps
    * its fence as long as no successor has broken the lock in between
    * (and aborts cleanly via [[LeaseLostException]] if one has).
    */
  val DefaultLeaseTtlMs: Long = 600000L

  /** A live writer already holds the `dest` lease — the overlapping-tick
    * scenario (a backup slower than its schedule: go-cron forks the next
    * tick regardless, init.sh:14). Callers fail the tick and retry on
    * their next schedule; they must NOT break the lock.
    */
  final class LeaseHeldException(msg: String) extends java.io.IOException(msg)

  /** This holder's lease was broken mid-tick (its TTL elapsed and a
    * successor took over). Thrown at the swap's commit-point ownership
    * check — BEFORE any rename — so the dispossessed tick aborts
    * without ever interleaving with the new holder's protocol.
    */
  final class LeaseLostException(msg: String) extends java.io.IOException(msg)

  /** Leases this thread currently holds, dest → owner token
    * (re-entrancy: a swap inside `withLease` must not dead-fail
    * against its own lock).
    */
  private val held = new ThreadLocal[scala.collection.mutable.Map[String, String]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, String]
  }

  /** Lock-file payload: expiry epoch-ms, newline, owner token. A legacy
    * or hand-written lock carrying only the expiry line parses with an
    * empty token (breakable on expiry, never release-matched).
    */
  private def readLock(fs: FileSystem, lock: Path,
      ttlMs: Long): Option[(Long, String)] =
    try {
      val in = fs.open(lock)
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = s.split("\n", 2)
      val expiry =
        try lines(0).trim.toLong
        catch {
          // created-but-not-yet-written (or torn by two concurrent
          // non-atomic creates): treat as an anonymous lock expiring
          // one TTL after the file's own mtime — breakable, never ours
          case _: RuntimeException =>
            fs.getFileStatus(lock).getModificationTime + ttlMs
        }
      val token =
        if (lines.length > 1 && lines(0).trim.nonEmpty) lines(1).trim else ""
      Some((expiry, token))
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: java.io.IOException => None // vanished mid-read: same as absent
    }

  /** Break an expired lock ATOMICALLY: rename it to a breaker-unique
    * name; only the contender whose rename succeeds has broken it (and
    * deletes the set-aside). Returns whether THIS caller was the
    * breaker — either way the original lock path is (being) cleared
    * and the caller may retry its create.
    */
  private def breakExpired(fs: FileSystem, lock: Path, token: String): Boolean = {
    val aside = new Path(lock.getParent, lock.getName + ".broken." + token)
    val won = try fs.rename(lock, aside) catch { case _: java.io.IOException => false }
    if (won) fs.delete(aside, false)
    won
  }

  /** Acquire the writer lease on `dest`: one small-file create carrying
    * the lease expiry and a fresh owner token, confirmed by read-back
    * (local `create(overwrite=false)` is not truly atomic). A live
    * (unexpired) foreign lock fails fast with [[LeaseHeldException]];
    * an expired lock is broken via [[breakExpired]] — its holder is
    * dead, and the swap protocol itself (marker + recover) guarantees
    * whatever it left mid-flight repairs deterministically. Returns the
    * owner token on success.
    */
  /** JVM-wide gate around the create-write-close-readback critical
    * section: a local filesystem's `create(overwrite=false)` is
    * exists-then-create, so two SAME-PROCESS threads (exactly the
    * local-mode overlapping-tick case) could interleave creates and
    * tear each other's content. The gate makes the in-process race
    * exact; the cross-process residue is covered by the read-back
    * token check below (and is absent on HDFS/object stores, whose
    * exclusive create is genuinely atomic).
    */
  private val jvmGate = new Object

  private def acquire(fs: FileSystem, dest: String, ttlMs: Long): String = {
    val lock = lockPath(dest)
    val token = java.util.UUID.randomUUID().toString
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(s"livelock acquiring lease on $dest")
      val created = jvmGate.synchronized {
        try {
          val out = fs.create(lock, false)
          out.write((System.currentTimeMillis() + ttlMs + "\n" + token)
            .getBytes("UTF-8"))
          out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(lock) => false
        }
      }
      if (created) {
        // read-back confirmation: on a filesystem whose exclusive
        // create is exists-then-create, two contenders can both
        // "succeed" — the token that actually landed decides
        readLock(fs, lock, ttlMs) match {
          case Some((_, tok)) if tok == token => return token
          case Some((e, _)) if System.currentTimeMillis() <= e =>
            throw new LeaseHeldException(
              s"writer lease on $dest lost to a concurrent creator " +
                s"(held until epoch-ms $e)")
          case _ => () // foreign-but-expired or vanished: retry
        }
      } else {
        readLock(fs, lock, ttlMs) match {
          case Some((e, _)) if System.currentTimeMillis() > e =>
            breakExpired(fs, lock, token) // stale: holder died
          case Some((e, _)) =>
            throw new LeaseHeldException(
              s"writer lease on $dest held until epoch-ms $e — " +
                "concurrent swap in flight (overlapping tick?)")
          case None => () // lock vanished between create and read: retry
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Release only OUR lock: a lease that expired and was broken by a
    * successor carries the successor's token now — deleting it would
    * admit a third writer under the successor's feet.
    */
  private def release(fs: FileSystem, dest: String, token: String): Unit = {
    val lock = lockPath(dest)
    try readLock(fs, lock, 0L) match {
      case Some((_, tok)) if tok == token => fs.delete(lock, false)
      case _ => () // not ours anymore (broken + re-acquired), or gone
    } catch {
      // a failed release must never mask the body's own outcome; the
      // worst case is a lock that waits out its TTL like a dead holder's
      case _: java.io.IOException => ()
    }
  }

  /** Re-assert THIS thread's ownership of the `dest` lease and renew
    * its expiry — called at every commit point so (a) a dispossessed
    * tick aborts before its first rename and (b) a healthy tick longer
    * than the TTL keeps extending its fence. The renewal overwrite is
    * safe: only the verified current owner performs it.
    */
  private def verifyAndRenew(fs: FileSystem, dest: String, ttlMs: Long): Unit = {
    val token = held.get.getOrElse(dest,
      throw new IllegalStateException(s"verifyAndRenew outside withLease for $dest"))
    val lock = lockPath(dest)
    readLock(fs, lock, ttlMs) match {
      case Some((_, tok)) if tok == token =>
        val out = fs.create(lock, true)
        out.write((System.currentTimeMillis() + ttlMs + "\n" + token)
          .getBytes("UTF-8"))
        out.close()
      case other =>
        throw new LeaseLostException(
          s"lease on $dest no longer held by this tick (lock=$other) — " +
            "TTL elapsed and a successor took over; aborting before the commit point")
    }
  }

  /** Run `body` holding the writer lease on `dest` — the
    * write-new-then-swap loops wrap their WHOLE tick (recover → marker
    * read → compute → write tmp → swap) in this, so two overlapping
    * ticks serialize: the loser fails fast with [[LeaseHeldException]]
    * instead of interleaving renames with the winner's protocol.
    * Re-entrant per thread. The lock releases in `finally` (an
    * in-process failure — including a torn rename — frees the
    * directory immediately; only a DEAD holder leaves the lock to
    * expire by TTL), and only while it still carries this holder's
    * token.
    */
  def withLease[A](dest: String, ttlMs: Long = DefaultLeaseTtlMs)(body: => A): A = {
    if (held.get.contains(dest)) return body
    val fs = fsOf(new Path(dest))
    val token = acquire(fs, dest, ttlMs)
    held.get(dest) = token
    try body
    finally {
      held.get -= dest
      release(fs, dest, token)
    }
  }

  /** Swap the fully-written `dest`.tmp into place over `dest`.
    * Standalone calls take the writer lease for the swap's duration;
    * calls inside [[withLease]] ride the caller's lease. Either way the
    * lease is re-verified (and renewed) immediately before the commit
    * point — a tick whose lease was broken mid-compute aborts with
    * [[LeaseLostException]] before touching anything.
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
    verifyAndRenew(fs, dest, DefaultLeaseTtlMs)
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
    * reading the standing state. A CLEAN directory — no commit marker,
    * no tmp, no set-aside old — returns immediately WITHOUT consulting
    * the writer lock: a lease spans a whole compute tick, and fencing
    * every reader for its duration would turn routine backups into
    * read outages; only actual swap debris needs the repair (and the
    * swap windows that produce debris are the brief rename protocol).
    * With debris present, a LIVE writer lease fails fast with
    * [[LeaseHeldException]] (repair mid-protocol would steal the
    * writer's tmp) unless this thread holds the lease; an EXPIRED lock
    * (dead holder) is broken atomically and the repair proceeds.
    */
  def recover(dest: String): Unit = {
    val d = new Path(dest)
    val fs = fsOf(d)
    val t = new Path(tmpPath(dest))
    val o = new Path(dest + ".old")
    val m = markerPath(dest)
    if (!fs.exists(m) && !fs.exists(t) && !fs.exists(o)) return
    if (!held.get.contains(dest)) {
      val lock = lockPath(dest)
      var fenced = true
      var attempts = 0
      while (fenced) {
        attempts += 1
        if (attempts > 100)
          throw new java.io.IOException(s"livelock breaking lease in recover($dest)")
        readLock(fs, lock, DefaultLeaseTtlMs) match {
          case Some((e, _)) if System.currentTimeMillis() > e =>
            // same atomic break as acquire: only the renamer proceeds;
            // a losing rename loops to re-read whatever replaced it
            if (breakExpired(fs, lock,
                java.util.UUID.randomUUID().toString)) fenced = false
          case Some((e, _)) =>
            throw new LeaseHeldException(
              s"recover($dest): writer lease live until epoch-ms $e — " +
                "swap in flight, repair would steal its tmp")
          case None => fenced = false
        }
      }
    }
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
