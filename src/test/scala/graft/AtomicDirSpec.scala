package graft

import java.io.File
import org.apache.commons.io.FileUtils

/** Crash-safety of the standing-state swap: every interleaving a
  * crash can leave behind must recover to a complete state — never
  * an absent one (the delete-then-rename bug re-initialized streaming
  * partials from a single batch, silently dropping history).
  */
class AtomicDirSpec extends SparkSpec {

  private def mkState(dir: File, tag: String): Unit = {
    dir.mkdirs()
    java.nio.file.Files.writeString(new File(dir, "state").toPath, tag)
  }

  private def readState(dest: String): String =
    java.nio.file.Files.readString(new File(dest, "state").toPath)

  private def withTmpRoot[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_atomic").toString
    try body(root + "/st")
    finally FileUtils.deleteDirectory(new File(root))
  }

  test("swap replaces the standing state and leaves no leftovers") {
    withTmpRoot { dest =>
      mkState(new File(dest), "v1")
      mkState(new File(AtomicDir.tmpPath(dest)), "v2")
      AtomicDir.swap(dest)
      assert(readState(dest) == "v2")
      assert(!new File(dest + ".tmp").exists() && !new File(dest + ".old").exists())
    }
  }

  test("crash between set-aside and promote: tmp promotes, old drops") {
    withTmpRoot { dest =>
      // simulate: dest was renamed to .old, tmp complete, then crash
      mkState(new File(dest + ".old"), "v1")
      mkState(new File(dest + ".tmp"), "v2")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2", "the complete tmp must go live")
      assert(!new File(dest + ".tmp").exists() && !new File(dest + ".old").exists())
    }
  }

  test("crash after promote, before cleanup: old drops, state stays new") {
    withTmpRoot { dest =>
      mkState(new File(dest), "v2")
      mkState(new File(dest + ".old"), "v1")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assert(!new File(dest + ".old").exists())
    }
  }

  test("crash before any rename: uncommitted tmp drops, state stays old") {
    withTmpRoot { dest =>
      mkState(new File(dest), "v1")
      mkState(new File(dest + ".tmp"), "half-written")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v1")
      assert(!new File(dest + ".tmp").exists())
    }
  }

  test("tmp lost with only .old surviving: old restores") {
    withTmpRoot { dest =>
      mkState(new File(dest + ".old"), "v1")
      AtomicDir.recover(dest)
      assert(readState(dest) == "v1", "the set-aside state must come back")
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
