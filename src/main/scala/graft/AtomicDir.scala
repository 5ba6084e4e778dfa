package graft

import java.io.File
import org.apache.commons.io.FileUtils

/** Crash-safe directory swap for standing state maintained by
  * write-new-then-swap loops ([[streaming.ProjectionStream]],
  * [[streaming.MomentsStream]]). A naive delete-then-rename has a
  * window where NO standing directory exists: a crash there makes the
  * next run treat the state as empty and silently drop every
  * previously accumulated partial. The swap here never unlinks the
  * old state before the new one is in place:
  *
  *   1. rename dest   -> dest.old   (old state still recoverable)
  *   2. rename tmp    -> dest       (new state live)
  *   3. delete dest.old             (cleanup only)
  *
  * A crash between any two steps leaves a combination [[recover]]
  * rolls forward (a complete tmp promotes) or back (dest.old
  * restores) — never an absent state. Callers run [[recover]] before
  * every read of the standing directory.
  *
  * Local-filesystem rename semantics are what the single-JVM runtime
  * needs; at cluster scale the same loop writes through a table
  * format with an atomic commit protocol and this class is moot —
  * the partials and the merge are unchanged.
  */
object AtomicDir {

  private def oldDir(dest: String) = new File(dest + ".old")
  private def tmpDir(dest: String) = new File(dest + ".tmp")

  /** The staging path callers write the new state to. */
  def tmpPath(dest: String): String = dest + ".tmp"

  /** Swap the fully-written `dest`.tmp into place over `dest`. */
  def swap(dest: String): Unit = {
    val d = new File(dest)
    val t = tmpDir(dest)
    val o = oldDir(dest)
    if (o.exists()) FileUtils.deleteDirectory(o)
    if (d.exists() && !d.renameTo(o))
      throw new java.io.IOException(s"swap: cannot set aside $dest")
    if (!t.renameTo(d)) {
      // roll back: the old state must come back before we fail
      if (o.exists()) o.renameTo(d)
      throw new java.io.IOException(s"swap failed: $t -> $dest")
    }
    if (o.exists()) FileUtils.deleteDirectory(o)
  }

  /** Repair any half-finished swap at `dest`. Idempotent; call before
    * reading the standing state.
    */
  def recover(dest: String): Unit = {
    val d = new File(dest)
    val t = tmpDir(dest)
    val o = oldDir(dest)
    if (!d.exists() && o.exists() && t.exists()) {
      // crashed between steps 1 and 2: the tmp is complete — promote it
      if (!t.renameTo(d))
        throw new java.io.IOException(s"recover: cannot promote $t -> $dest")
    } else if (!d.exists() && o.exists()) {
      // tmp lost before going live: restore the old state
      if (!o.renameTo(d))
        throw new java.io.IOException(s"recover: cannot restore $o -> $dest")
    }
    // leftovers from a crash before step 1 (uncommitted tmp) or after
    // step 2 (old not yet deleted) are safe to drop
    if (d.exists()) {
      if (o.exists()) FileUtils.deleteDirectory(o)
      if (t.exists()) FileUtils.deleteDirectory(t)
    }
  }
}
