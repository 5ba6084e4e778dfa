package graft

import java.io.File
import org.apache.commons.io.FileUtils
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safety of the standing-state swap: every interleaving a
  * crash can leave behind must recover to a complete state — never
  * an absent one (the delete-then-rename bug re-initialized streaming
  * partials from a single batch, silently dropping history). The
  * whole battery drives [[AtomicDir]] through a Hadoop FileSystem
  * handle — the class is FileSystem-API-only since r8 (the
  * foreign-scheme run lives in [[PortableFsSpec]]); both the
  * pre-marker legacy windows and the marker-commit windows are
  * pinned here.
  */
class AtomicDirSpec extends SparkSpec {

  private lazy val fs: FileSystem =
    FileSystem.getLocal(spark.sessionState.newHadoopConf()).getRaw

  private def mkState(dir: String, tag: String): Unit = {
    val out = fs.create(new Path(dir, "state"), true)
    out.write(tag.getBytes("UTF-8")); out.close()
  }

  private def readState(dest: String): String = {
    val in = fs.open(new Path(dest, "state"))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def exists(p: String): Boolean = fs.exists(new Path(p))

  private def marker(dest: String): Unit =
    fs.create(new Path(dest + ".commit"), true).close()

  private def withTmpRoot[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_atomic").toString
    try body(root + "/st")
    finally FileUtils.deleteDirectory(new File(root))
  }

  test("swap replaces the standing state and leaves no leftovers") {
    withTmpRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      AtomicDir.swap(dest)
      assert(readState(dest) == "v2")
      assert(!exists(dest + ".tmp") && !exists(dest + ".old") &&
        !exists(dest + ".commit"))
    }
  }

  // ---- pre-marker windows (also the legacy on-disk states a
  // pre-r8 deployment could leave behind) ----

  test("crash between set-aside and promote: tmp promotes, old drops") {
    withTmpRoot { dest =>
      // simulate: dest was renamed to .old, tmp complete, then crash
      mkState(dest + ".old", "v1")
      mkState(dest + ".tmp", "v2")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2", "the complete tmp must go live")
      assert(!exists(dest + ".tmp") && !exists(dest + ".old"))
    }
  }

  test("crash after promote, before cleanup: old drops, state stays new") {
    withTmpRoot { dest =>
      mkState(dest, "v2")
      mkState(dest + ".old", "v1")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assert(!exists(dest + ".old"))
    }
  }

  test("crash before any rename: uncommitted tmp drops, state stays old") {
    withTmpRoot { dest =>
      mkState(dest, "v1")
      mkState(dest + ".tmp", "half-written")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v1")
      assert(!exists(dest + ".tmp"))
    }
  }

  test("tmp lost with only .old surviving: old restores") {
    withTmpRoot { dest =>
      mkState(dest + ".old", "v1")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v1", "the set-aside state must come back")
    }
  }

  // ---- marker-commit windows: once `dest.commit` exists the
  // fully-written tmp is authoritative, whatever else a torn
  // (copy+delete, non-atomic) rename left behind ----

  test("marker + untouched dest + tmp (crash right after commit): tmp wins") {
    withTmpRoot { dest =>
      mkState(dest, "v1")
      mkState(dest + ".tmp", "v2")
      marker(dest)
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2",
        "the marker is the commit point — the old state must NOT win")
      assert(!exists(dest + ".tmp") && !exists(dest + ".commit"))
    }
  }

  test("marker + torn partial dest + surviving tmp: the partial drops, tmp wins") {
    withTmpRoot { dest =>
      // a torn copy-rename on an object store: some files landed in
      // dest, tmp still holds the complete original
      mkState(dest, "partial-junk")
      mkState(dest + ".tmp", "v2")
      mkState(dest + ".old", "v1")
      marker(dest)
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assert(!exists(dest + ".tmp") && !exists(dest + ".old") &&
        !exists(dest + ".commit"))
    }
  }

  test("marker + complete dest, tmp consumed (crash before cleanup): state stays new") {
    withTmpRoot { dest =>
      mkState(dest, "v2")
      mkState(dest + ".old", "v1")
      marker(dest)
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assert(!exists(dest + ".old") && !exists(dest + ".commit"))
    }
  }

  test("marker with only .old surviving: the last copy restores") {
    withTmpRoot { dest =>
      mkState(dest + ".old", "v1")
      marker(dest)
      AtomicDir.recover(dest)
      assert(readState(dest) == "v1",
        "when both tmp and dest are gone the set-aside copy is all that's left")
      assert(!exists(dest + ".commit"))
    }
  }

  test("recover is idempotent after any repair") {
    withTmpRoot { dest =>
      mkState(dest, "v1")
      mkState(dest + ".tmp", "v2")
      marker(dest)
      AtomicDir.recover(dest)
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
    }
  }

  test("streaming merge survives a simulated crash mid-swap") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pcr").toString
    val dest = root + "/proj"
    try {
      val keys = Seq("k")
      val measures = Seq("v")
      val b1 = Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
      val b2 = Seq(("A", 10.0)).toDF("k", "v")
      streaming.ProjectionStream.mergeBatch(b1, keys, measures, dest, batchId = 0)
      // simulate the lethal crash window of the old delete-then-rename:
      // standing dir renamed aside, nothing in its place yet
      assert(new File(dest).renameTo(new File(dest + ".old")))
      // the next merge must NOT see empty state — recovery restores it
      streaming.ProjectionStream.mergeBatch(b2, keys, measures, dest, batchId = 1)
      val got = spark.read.parquet(dest)
        .select("k", "_cnt", "_sum_v").orderBy("k")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == Seq(("A", 2L, 11.0), ("B", 1L, 2.0)),
        s"batch-0 history must survive the crash: $got")
    } finally FileUtils.deleteDirectory(new File(root))
  }

  test("moments merge survives a simulated crash mid-swap") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mcr").toString
    val dest = root + "/m"
    try {
      val b1 = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)).toDF("embedding")
      val b2 = Seq(Seq(2.0f, 2.0f)).toDF("embedding")
      streaming.MomentsStream.mergeBatch(b1, dest, batchId = 0)
      assert(new File(dest).renameTo(new File(dest + ".old")))
      streaming.MomentsStream.mergeBatch(b2, dest, batchId = 1)
      val got = streaming.MomentsStream.moments(spark, dest).get
      assert(got(0) == 3.0, s"all three vectors must be counted: ${got(0)}")
    } finally FileUtils.deleteDirectory(new File(root))
  }
}
