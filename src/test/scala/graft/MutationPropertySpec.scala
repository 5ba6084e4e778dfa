package graft

import graft.operators.{Relational, Retention, Snapshot}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Property tests for the mutation surface: for RANDOM predicates and
  * assignments, the day-granular partition-rewrite machinery must be
  * observationally identical to the corresponding whole-dataset
  * DataFrame operation. The example-based SnapshotSpec cases pin the
  * mechanics (which days rewrite, manifest consistency); these pin the
  * SEMANTICS across the predicate space — including predicates that
  * hit no day, every day, whole days, and NULL-evaluating rows.
  */
class MutationPropertySpec extends SparkSpec {

  private def freshSrc = Relational.eventsSec(spark, sf)
    .select("event_id", "user_id", "event_type", "value", "ts_s")

  private lazy val firstDay = freshSrc
    .select(Retention.bucketDay(col("ts_s")).as("d")).agg(min("d")).head.getString(0)

  /** A deterministic bank of predicates spanning the interesting
    * shapes: day-aligned, sub-day, type-only, empty, and a
    * NULL-evaluating arm (CASE WHEN … THEN NULL) — DELETE must treat
    * NULL as keep.
    */
  private def predicates: Seq[(String, Column)] = Seq(
    "type_eq" -> (col("event_type") === "click"),
    "value_gt" -> (col("value") > 50),
    "day_aligned" -> (Retention.bucketDay(col("ts_s")) === firstDay),
    "sub_day" -> (col("event_type") === "error" && col("user_id") % 3 === 0),
    "empty" -> (col("value") > 1e18),
    "null_arm" -> when(col("event_type") === "view", lit(null).cast("boolean"))
      .otherwise(col("value") > 30))

  test("delete(pred) is observationally filter(NOT coalesce(pred, false))") {
    predicates.foreach { case (label, pred) =>
      val src = freshSrc
      val dest = Files.createTempDirectory(s"graft-prop-del-$label").toString
      Snapshot.backup(src, col("ts_s"), dest)
      val report = Snapshot.delete(spark, dest, pred)
      val got = Snapshot.resolve(spark, dest).drop("bucket_day")
      val want = src.filter(!coalesce(pred, lit(false)))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"delete($label) diverged from the filter complement")
      assert(report.rowsAffected == src.count() - want.count(),
        s"delete($label) reported wrong rowsAffected")
      // the manifest stays digest-consistent: a follow-up gc must see
      // a coherent snapshot
      assert(Snapshot.gc(spark, dest, keepDays = 100000).deletedDays.isEmpty)
    }
  }

  test("a delete matching every row refuses BEFORE destroying anything") {
    val src = freshSrc
    val dest = Files.createTempDirectory("graft-prop-del-total").toString
    Snapshot.backup(src, col("ts_s"), dest)
    intercept[IllegalArgumentException](
      Snapshot.delete(spark, dest, col("value") >= -1e18))
    // the refusal must leave the snapshot bit-identical, not lament a
    // deletion that already happened
    val got = Snapshot.resolve(spark, dest).drop("bucket_day")
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty,
      "refused mutation must leave the snapshot untouched")
    // and a follow-up partial delete still works on the intact snapshot
    Snapshot.delete(spark, dest, col("event_type") === "click")
    assert(Snapshot.resolve(spark, dest).filter(col("event_type") === "click").isEmpty)
  }

  test("update(pred, assignments) is observationally the CASE projection") {
    predicates.filterNot(_._1 == "total").foreach { case (label, pred) =>
      val src = freshSrc
      val dest = Files.createTempDirectory(s"graft-prop-upd-$label").toString
      Snapshot.backup(src, col("ts_s"), dest)
      Snapshot.update(spark, dest, pred,
        Map("value" -> (col("value") * 2 + 1), "user_id" -> lit(-7L)))
      val got = Snapshot.resolve(spark, dest).drop("bucket_day")
      val want = src.select(col("event_id"),
        when(pred, lit(-7L)).otherwise(col("user_id")).as("user_id"),
        col("event_type"),
        when(pred, col("value") * 2 + 1).otherwise(col("value")).as("value"),
        col("ts_s"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"update($label) diverged from the CASE projection")
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"update($label) drifted the schema")
    }
  }

  test("deduplicate is observationally dropDuplicates, whatever the duplication") {
    // three duplication shapes: none, one day doubled, scattered rows tripled
    val src = freshSrc
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "clean" -> src,
      "day_doubled" -> src.unionByName(
        src.filter(Retention.bucketDay(col("ts_s")) === "20240105")),
      "scattered_tripled" -> {
        val extra = src.filter(col("user_id") % 17 === 0)
        src.unionByName(extra).unionByName(extra)
      })
    shapes.foreach { case (label, dirty) =>
      val dest = Files.createTempDirectory(s"graft-prop-dedup-$label").toString
      Snapshot.backup(dirty, col("ts_s"), dest)
      val report = Snapshot.deduplicate(spark, dest)
      val got = Snapshot.resolve(spark, dest).drop("bucket_day")
      val want = dirty.dropDuplicates()
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"deduplicate($label) diverged from dropDuplicates")
      assert(report.rowsAffected == dirty.count() - want.count(),
        s"deduplicate($label) reported wrong rowsAffected")
    }
  }
}
