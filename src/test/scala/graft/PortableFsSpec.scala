package graft

import graft.operators.{Relational, Retention, SkipIndex, Snapshot}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The s3a:// rehearsal: every snapshot/commit op driven end to end
  * through [[GraftTestFs]], a Hadoop FileSystem registered under the
  * non-`file:` scheme `graftfs://`. The ops only ever see foreign-
  * scheme URIs, so anything that resolved paths through `java.io.File`
  * or assumed the default filesystem would fail here — passing pins
  * the URI-portability contract an object-store destination
  * (`s3a://bucket/...`) relies on: same FileSystem-API code path,
  * different connector behind the scheme.
  */
class PortableFsSpec extends SparkSpec {

  private def port(): String = {
    // register the scheme once on the shared session's Hadoop conf —
    // sessionState.newHadoopConf() re-reads this on every call, which
    // is itself part of the contract under test
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    "graftfs://" + Files.createTempDirectory("graft-portable").toString
  }

  private def src =
    Relational.eventsSec(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "ts_s")

  test("backup → validate → restore round-trips through a foreign scheme") {
    val dest = port() + "/snap"
    val n = Snapshot.backup(src, col("ts_s"), dest)
    assert(n == src.count())
    val back = Snapshot.restore(spark, dest).drop("bucket_day")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("incremental chain writes and resolves on a foreign scheme") {
    val root = port()
    val (baseDir, deltaDir, fullDir) = (s"$root/base", s"$root/delta", s"$root/full")
    Snapshot.backup(src, col("ts_s"), baseDir)
    val days = src.select(Retention.bucketDay(col("ts_s")).as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0))
    val first = days.head
    val modified = src.withColumn("value",
      when(Retention.bucketDay(col("ts_s")) === first, col("value") + 1)
        .otherwise(col("value")))
    val (changed, total) = Snapshot.backupIncremental(modified, col("ts_s"), baseDir, deltaDir)
    assert(changed == 1 && total == days.length)
    Snapshot.backup(modified, col("ts_s"), fullDir)
    val resolved = Snapshot.resolve(spark, deltaDir)
    val full = Snapshot.resolve(spark, fullDir)
    assert(resolved.exceptAll(full).isEmpty && full.exceptAll(resolved).isEmpty,
      "base+delta must reproduce the full backup across schemes")
  }

  test("mutations, compaction, and gc run on a foreign scheme") {
    val dest = port() + "/mut"
    Snapshot.backup(src.repartition(8), col("ts_s"), dest)
    // update in place
    val pred = col("event_type") === "error"
    val upd = Snapshot.update(spark, dest, pred, Map("user_id" -> lit(-1)))
    assert(upd.rowsAffected == src.filter(pred).count())
    // delete a slice
    val del = Snapshot.delete(spark, dest, col("event_type") === "purchase")
    assert(del.rowsAffected == src.filter(col("event_type") === "purchase").count())
    val want = src.filter(col("event_type") =!= "purchase")
      .withColumn("user_id", when(pred, lit(-1L)).otherwise(col("user_id")))
    val got = Snapshot.restore(spark, dest).drop("bucket_day")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "mutation results must be value-identical across schemes")
    // compact the fragmented layout, then a no-op gc over the manifest
    val rep = Snapshot.compact(spark, dest)
    assert(rep.filesBefore > rep.filesAfter)
    assert(Snapshot.gc(spark, dest, keepDays = 10000).deletedDays.isEmpty)
    val after = Snapshot.restore(spark, dest).drop("bucket_day")
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty)
  }

  test("detach/attach and the skip index work on a foreign scheme") {
    val dest = port() + "/detach"
    Snapshot.backup(src, col("ts_s"), dest)
    val day = Snapshot.parts(spark, dest).orderBy("bucket_day").head.getString(0)
    Snapshot.detachPartition(spark, dest, day)
    assert(Snapshot.resolve(spark, dest).filter(col("bucket_day") === day).isEmpty)
    Snapshot.attachPartition(spark, dest, day)
    val got = Snapshot.restore(spark, dest).drop("bucket_day")
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
    // skip-index sidecar: build + a pruned point scan, same values
    SkipIndex.build(spark, dest, minmaxCols = Seq("value"), bloomCols = Seq("user_id"))
    val uid = src.select("user_id").head.getLong(0)
    val scanned = SkipIndex.scanEq(spark, dest, "user_id", uid)
      .drop("bucket_day")
    val expect = src.filter(col("user_id") === uid)
    assert(scanned.exceptAll(expect).isEmpty && expect.exceptAll(scanned).isEmpty)
  }

  test("AtomicDir's commit protocol is scheme-portable") {
    val root = port()
    val dest = s"$root/state"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def write(dir: String, tag: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, "state"), true)
      out.write(tag.getBytes("UTF-8")); out.close()
    }
    def read(): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(dest, "state"))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    write(dest, "v1")
    write(AtomicDir.tmpPath(dest), "v2")
    AtomicDir.swap(dest)
    assert(read() == "v2")
    // crash window: set-aside done, promote not — recover rolls forward
    write(dest + ".old", "v2")
    assert(fs.rename(new org.apache.hadoop.fs.Path(dest),
      new org.apache.hadoop.fs.Path(dest + ".junk")))
    fs.delete(new org.apache.hadoop.fs.Path(dest + ".junk"), true)
    write(AtomicDir.tmpPath(dest), "v3")
    AtomicDir.recover(dest)
    assert(read() == "v3", "the complete tmp must promote on any scheme")
  }

  test("zip archive export/import round-trips on a foreign scheme") {
    val root = port()
    val arch = s"$root/events-20240101.zip"
    val data = src.orderBy("event_id").limit(200)
    Snapshot.exportAs(data, arch, "zip")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(arch)).isFile,
      "the artifact must be ONE object, like the reference's ${DB}-<bucket>.zip")
    val back = Snapshot.importFrom(spark, arch, "zip", data.schema)
    assert(back.exceptAll(data).isEmpty && data.exceptAll(back).isEmpty,
      "unzip + read must reproduce the exported rows exactly")
  }
}
