package graft

import java.io.File
import org.apache.commons.io.FileUtils
import org.apache.hadoop.fs.{FileSystem, Path}

/** The marker protocol EXECUTED over torn renames — closing the r8
  * gap that AtomicDirSpec's crash windows were hand-constructed
  * aftermath states while GraftTestFs inherited an atomic local
  * rename. [[TornRenameFs]] renames by copy-then-delete (the
  * object-store semantics AtomicDir.scala:38–41 documents) with an
  * injectable crash, so every window here is produced by the REAL
  * `swap` dying mid-protocol on a store whose rename genuinely tears —
  * then `recover` must land the committed winner from whatever the
  * tear left.
  */
class TornRenameSpec extends SparkSpec {

  private lazy val fs: FileSystem = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornfs.impl", classOf[TornRenameFs].getName)
    new Path("tornfs:///").getFileSystem(spark.sessionState.newHadoopConf())
  }

  /** Two files per state so a budget-1 copy is a GENUINE tear (one
    * file landed, one missing).
    */
  private def mkState(dir: String, tag: String): Unit = {
    val a = fs.create(new Path(dir, "state"), true)
    a.write(tag.getBytes("UTF-8")); a.close()
    val b = fs.create(new Path(dir, "state2"), true)
    b.write(tag.getBytes("UTF-8")); b.close()
  }

  private def readState(dest: String): String = {
    val parts = Seq("state", "state2").map { f =>
      val in = fs.open(new Path(dest, f))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(parts.distinct.size == 1, s"state files disagree: $parts")
    parts.head
  }

  private def exists(p: String): Boolean = fs.exists(new Path(p))

  private def withTornRoot[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_torn").toString
    try body("tornfs://" + root + "/st")
    finally {
      TornRenameFs.inject = None
      FileUtils.deleteDirectory(new File(root))
    }
  }

  private def assertClean(dest: String, want: String): Unit = {
    assert(readState(dest) == want,
      s"recover must land the committed state '$want'")
    assert(!exists(dest + ".tmp") && !exists(dest + ".old") &&
      !exists(dest + ".commit"), "recover must leave no protocol leftovers")
  }

  test("happy-path swap completes over copy+delete renames (no atomicity needed)") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      AtomicDir.swap(dest)
      assertClean(dest, "v2")
    }
  }

  test("set-aside rename tears after copy (both halves alive): recover promotes tmp") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      // dest -> dest.old copies fully, dies before deleting dest:
      // marker + dest + .old + tmp all alive — the canonical tear
      TornRenameFs.inject =
        Some(TornRenameFs.Inject("st", crashBeforeDelete = true))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      AtomicDir.recover(dest)
      assertClean(dest, "v2")
    }
  }

  test("set-aside rename tears mid-copy (partial .old): recover promotes tmp") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      TornRenameFs.inject = Some(TornRenameFs.Inject("st", copyBudget = 1))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      AtomicDir.recover(dest)
      assertClean(dest, "v2")
    }
  }

  test("promote rename tears mid-copy (partial dest + surviving tmp): recover drops the partial") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      TornRenameFs.inject = Some(TornRenameFs.Inject("st.tmp", copyBudget = 1))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      // the tear left a HALF-copied dest; the marker says tmp is
      // authoritative, so the partial must drop wholesale
      AtomicDir.recover(dest)
      assertClean(dest, "v2")
    }
  }

  test("promote rename tears after copy, before delete (complete dest AND tmp): recover is stable") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      TornRenameFs.inject =
        Some(TornRenameFs.Inject("st.tmp", crashBeforeDelete = true))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      AtomicDir.recover(dest)
      assertClean(dest, "v2")
    }
  }

  test("recover is idempotent after repairing a torn swap") {
    withTornRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      TornRenameFs.inject = Some(TornRenameFs.Inject("st.tmp", copyBudget = 1))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      AtomicDir.recover(dest)
      AtomicDir.recover(dest)
      assertClean(dest, "v2")
    }
  }
}
