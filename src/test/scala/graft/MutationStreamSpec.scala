package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** Mutations landing MID-STREAM: a standing-state stream is folding
  * micro-batches from a day-partitioned snapshot when an
  * `ALTER … DELETE/UPDATE` rewrites closed days under it. The
  * reconcile path must bring the standing partials back to exactly
  * what a from-scratch rebuild over the mutated snapshot would give —
  * including retracting already-folded rows the mutation deleted
  * (sums are not invertible; the day-granular rebuild is the
  * correction mechanism). One test per standing-state stream.
  */
class MutationStreamSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("projection stream: mid-stream delete+update reconcile to the from-scratch rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot("graft_msp")
    val snap = s"$root/snap"; val proj = s"$root/proj"
    val keys = Seq("bucket_day", "event_type"); val measures = Seq("value")
    try {
      val events = spark.read.parquet(s"$sf/events.parquet")
      Snapshot.backup(events, col("ts"), snap)
      val days = Snapshot.resolve(spark, snap)
        .select(col("bucket_day").cast("string")).distinct()
        .orderBy("bucket_day").as[String].collect().toSeq
      assert(days.length >= 4, s"need several day partitions, got $days")
      val (streamed, pending) = days.splitAt(days.length / 2)

      def dayRows(ds: Seq[String]) = Snapshot.resolve(spark, snap)
        .filter(col("bucket_day").isin(ds: _*))
        .select(col("bucket_day").cast("string"), col("event_type"), col("value"))
        .as[(String, String, Double)].collect().toSeq

      val mem = MemoryStream[(String, String, Double)]
      val q = streaming.ProjectionStream.maintain(
          mem.toDF().toDF("bucket_day", "event_type", "value"),
          keys, measures, proj).start()
      try {
        // micro-batch 1: the already-closed first half of the days
        mem.addData(dayRows(streamed)); q.processAllAvailable()

        // mid-stream DELETE touching already-streamed days (and some
        // pending ones — those must NOT be prematurely folded)
        val del = Snapshot.delete(spark, snap, col("event_type") === "click")
        assert(del.rowsAffected > 0 && del.daysRewritten.nonEmpty)
        assert(del.daysRewritten.exists(streamed.contains),
          "the delete must hit at least one already-streamed day")
        streaming.ProjectionStream.reconcile(spark, snap, keys, measures, proj, del)

        // pending days must not have leaked into the standing state
        val afterDel = spark.read.parquet(proj)
          .select(col("bucket_day").cast("string")).distinct()
          .as[String].collect().toSet
        assert(afterDel.subsetOf(streamed.toSet),
          s"reconcile folded un-streamed days: ${afterDel -- streamed.toSet}")

        // mid-stream UPDATE, also reconciled
        val upd = Snapshot.update(spark, snap, col("value") > 50.0,
          Map("value" -> (col("value") * 2)))
        assert(upd.rowsAffected > 0)
        streaming.ProjectionStream.reconcile(spark, snap, keys, measures, proj, upd)

        // micro-batch 2: the rest of the days, post-mutation
        mem.addData(dayRows(pending)); q.processAllAvailable()
      } finally q.stop()

      // from-scratch rebuild over the mutated snapshot
      val oneShot = s"$root/oneshot"
      plans.Projections.materialize(
        Snapshot.resolve(spark, snap)
          .select(col("bucket_day").cast("string"), col("event_type"), col("value")),
        keys, measures, oneShot)
      val cols = spark.read.parquet(proj).columns
      val got = spark.read.parquet(proj)
        .orderBy(keys.map(col): _*).collect().toSeq
      val want = spark.read.parquet(oneShot).select(cols.map(col): _*)
        .orderBy(keys.map(col): _*).collect().toSeq
      assert(got.length == want.length,
        s"${got.length} vs ${want.length} key rows after reconcile")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) == w.getString(0) && g.getString(1) == w.getString(1))
        assert(g.getLong(g.fieldIndex("_cnt")) == w.getLong(w.fieldIndex("_cnt")),
          s"count drifted for key (${g.getString(0)}, ${g.getString(1)})")
        assert(g.getDouble(g.fieldIndex("_min_value"))
          == w.getDouble(w.fieldIndex("_min_value")))
        assert(g.getDouble(g.fieldIndex("_max_value"))
          == w.getDouble(w.fieldIndex("_max_value")))
        assert(math.abs(g.getDouble(g.fieldIndex("_sum_value"))
          - w.getDouble(w.fieldIndex("_sum_value"))) < 1e-6,
          s"sum drifted for key (${g.getString(0)}, ${g.getString(1)})")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("moments stream: mid-stream delete reconciles to the one-shot moments") {
    import spark.implicits._
    val root = tmpRoot("graft_msm")
    val snap = s"$root/snap"; val dest = s"$root/moments"
    try {
      // embeddings snapshot over 7 synthetic day buckets
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .withColumn("ts", expr(
          "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, cast(vec_id % 7 as int), 0, 0, 0)"))
      Snapshot.backup(emb, col("ts"), snap)
      val days = Snapshot.resolve(spark, snap)
        .select(col("bucket_day").cast("string")).distinct()
        .orderBy("bucket_day").as[String].collect().toSeq
      assert(days.length == 7)
      val (streamed, pending) = days.splitAt(4)

      def batchOf(ds: Seq[String]) = Snapshot.resolve(spark, snap)
        .filter(col("bucket_day").isin(ds: _*))
        .select(col("bucket_day").cast("string").as("day"), col("embedding"))

      // micro-batch 1: first four days (driven exactly as foreachBatch would)
      streaming.MomentsStream.mergeBatch(batchOf(streamed), dest,
        batchId = 0, dayCol = Some("day"))

      // mid-stream DELETE: every 11th vector, across all days
      val del = Snapshot.delete(spark, snap, col("vec_id") % 11 === 0)
      assert(del.rowsAffected > 0)
      streaming.MomentsStream.reconcile(spark, snap, "embedding", dest, del)

      // pending days must not have leaked into the standing state
      val afterDel = streaming.MomentsStream.perDay(spark, dest).keySet
      assert(afterDel == streamed.toSet,
        s"reconcile must only touch folded days: $afterDel vs $streamed")

      // micro-batch 2: remaining days, post-mutation
      streaming.MomentsStream.mergeBatch(batchOf(pending), dest,
        batchId = 1, dayCol = Some("day"))

      val got = streaming.MomentsStream.moments(spark, dest).get
      val want = Snapshot.resolve(spark, snap)
        .agg(graft.functions.CovAgg(col("embedding")))
        .collect()(0).getSeq[Double](0)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 1e-8 * math.max(1.0, math.abs(w)),
          s"moment drifted after mid-stream mutation: $g vs $w")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
