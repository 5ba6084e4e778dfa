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

  /** Swap the fully-written `dest`.tmp into place over `dest`. */
  def swap(dest: String): Unit = {
    val d = new Path(dest)
    val fs = fsOf(d)
    val t = new Path(tmpPath(dest))
    val o = new Path(dest + ".old")
    val m = markerPath(dest)
    if (fs.exists(o)) fs.delete(o, true)
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
    * reading the standing state.
    */
  def recover(dest: String): Unit = {
    val d = new Path(dest)
    val fs = fsOf(d)
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
