package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop [[org.apache.hadoop.fs.FileSystem]] registered under a
  * scheme that is NOT `file:` — local-disk storage behind a foreign
  * URI. Every snapshot/commit op driven through `graftfs://` paths
  * proves the op resolves its FileSystem from the path's scheme and
  * never shortcuts through `java.io.File` / default-FS assumptions —
  * the portability contract an `s3a://`-style destination relies on
  * ([[PortableFsSpec]]). Registered via `fs.graftfs.impl` on the
  * session's Hadoop conf.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** A FileSystem whose `rename` is COPY-THEN-DELETE — the object-store
  * semantics AtomicDir's marker protocol exists for (AtomicDir.scala:
  * 38–41) — with an injectable crash point, so the documented torn
  * windows (partial destination, both halves alive, source never
  * deleted) are EXECUTED by the real protocol code instead of
  * hand-built as aftermath states ([[TornRenameSpec]]). Registered
  * under `tornfs://` via `fs.tornfs.impl`.
  *
  * Every rename through this FS runs the copy+delete protocol, crash
  * injected or not — the happy-path swap over it proves the commit
  * primitive never depended on rename atomicity to begin with.
  */
class TornRenameFs extends RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileUtil, Path}

  override def getScheme: String = "tornfs"
  override def getUri: URI = URI.create("tornfs:///")

  /** Depth-first file-by-file copy in sorted order (deterministic
    * partial prefixes), decrementing the crash budget per FILE: a
    * budget of 1 copies one file then dies — a genuinely torn
    * multi-file directory, exactly what a killed object-store copy
    * loop leaves.
    */
  private def copyTree(src: Path, dst: Path,
      budget: java.util.concurrent.atomic.AtomicInteger): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).sortBy(_.getPath.getName).foreach { c =>
        copyTree(c.getPath, new Path(dst, c.getPath.getName), budget)
      }
    } else {
      if (budget.decrementAndGet() < 0)
        throw new TornRenameFs.TornCrash(s"crash mid-copy before $src")
      FileUtil.copy(this, src, this, dst, false, getConf)
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val inj = TornRenameFs.inject.filter(_.srcName == src.getName)
    val budget = new java.util.concurrent.atomic.AtomicInteger(
      inj.map(_.copyBudget).getOrElse(Int.MaxValue))
    if (!exists(src)) return false
    if (exists(dst)) return false
    copyTree(src, dst, budget)
    if (inj.exists(_.crashBeforeDelete))
      throw new TornRenameFs.TornCrash(
        s"crash after copy, before source delete: $src")
    delete(src, true)
    true
  }
}

object TornRenameFs {
  /** The injected crash: fires on renames whose SOURCE directory name
    * matches (`st` = the set-aside rename, `st.tmp` = the promote).
    * `copyBudget` = files copied before dying mid-copy;
    * `crashBeforeDelete` = die between the completed copy and the
    * source delete (both halves alive — the canonical torn state).
    */
  final case class Inject(srcName: String,
      copyBudget: Int = Int.MaxValue,
      crashBeforeDelete: Boolean = false)

  final class TornCrash(msg: String) extends java.io.IOException(msg)

  @volatile var inject: Option[Inject] = None
}
