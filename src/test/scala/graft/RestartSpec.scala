package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.file.Files
import java.sql.Timestamp
import scala.collection.mutable

/** Checkpoint-RESTART battery for every stateful streaming monitor —
  * the reference's core operational property: go-cron restarts the
  * whole process daily (init.sh:10–14), so every monitor must come
  * back FROM ITS CHECKPOINT with its keyed state intact, not merely
  * survive micro-batch boundaries inside one running query
  * (StreamingSpec pins those).
  *
  * Protocol, per monitor: feed the first half of the input in two
  * micro-batches, STOP the query (clean daily shutdown), start a NEW
  * query from the SAME checkpoint, feed the rest, and assert the final
  * surface is EXACTLY the uninterrupted single-query run's (collected
  * side by side from an independent checkpoint). If recovery dropped
  * or re-initialized any key's state, every post-restart emission for
  * that key diverges (folds restart from zero, funnels lose stages,
  * winners lose versions) — the equality is the recovery proof.
  * Stream ≡ batch semantics are pinned separately in StreamingSpec;
  * CUSUM additionally anchors to a pure in-process fold here so the
  * battery cannot drift into comparing two equally-wrong runs.
  */
class RestartSpec extends SparkSpec {

  /** Feed `parts` through the query with a kill+recover after
    * `restartAfter` parts: each part is one micro-batch
    * (processAllAvailable commits it), the stop is the clean daily
    * shutdown, and the second start() resumes from the checkpoint the
    * first run wrote.
    */
  private def feedWithRestart[A](
      mem: MemoryStream[A],
      startQuery: () => StreamingQuery,
      parts: Seq[Seq[A]],
      restartAfter: Int): Unit = {
    val q1 = startQuery()
    try parts.take(restartAfter).foreach { b =>
      mem.addData(b); q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery()
    try {
      parts.drop(restartAfter).foreach { b =>
        mem.addData(b); q2.processAllAvailable()
      }
      q2.processAllAvailable()
    } finally q2.stop()
  }

  /** The uninterrupted control run: same parts, one query. */
  private def feedStraight[A](
      mem: MemoryStream[A],
      startQuery: () => StreamingQuery,
      parts: Seq[Seq[A]]): Unit = {
    val q = startQuery()
    try parts.foreach { b =>
      mem.addData(b); q.processAllAvailable()
    } finally q.stop()
  }

  private def parts[A](rows: Seq[A], n: Int): Seq[Seq[A]] =
    rows.grouped(math.max(1, rows.length / n + 1)).toSeq

  private def ckptDir(): String =
    Files.createTempDirectory("graft-restart-ckpt").toString

  test("CUSUM monitor recovers its per-type fold from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("event_type"), unix_timestamp(col("ts_s")).as("t"),
        col("event_id"),
        round((col("value") - 50.0) * 100, 0).cast("long").as("dev_c"))
      .as[streaming.StreamCusum.Ev].collect().toSeq
      .sortBy(e => (e.t, e.event_id))
    def run(withRestart: Boolean): Map[(String, Long), Long] = {
      val mem = MemoryStream[streaming.StreamCusum.Ev]
      val got = mutable.Map[(String, Long), Long]()
      val ckpt = ckptDir()
      def start() = streaming.StreamCusum.transform(mem.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamCusum.Out], _: Long) =>
            df.collect().foreach(o =>
              got.synchronized { got((o.event_type, o.event_id)) = o.cusum_c })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toMap
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(restarted.size == rows.size)
    assert(restarted == straight,
      "post-restart CUSUM surface differs from the uninterrupted run")
    // anchor to the pure fold so equal-but-wrong runs can't both pass
    val expect = mutable.Map[(String, Long), Long]()
    rows.groupBy(_.event_type).foreach { case (k, es) =>
      var prefix = 0L; var minP = 0L
      es.sortBy(e => (e.t, e.event_id)).foreach { e =>
        prefix += e.dev_c; minP = math.min(minP, prefix)
        expect((k, e.event_id)) = prefix - math.min(0L, minP)
      }
    }
    assert(restarted == expect.toMap,
      "recovered CUSUM fold diverged from the exact in-process reference")
  }

  test("funnel monitor recovers per-user stage state from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts_s")).as("t"), col("event_id"))
      .as[streaming.StreamFunnel.Ev].collect().toSeq
      .sortBy(e => (e.t, e.event_id))
    def run(withRestart: Boolean): Map[Long, Long] = {
      val mem = MemoryStream[streaming.StreamFunnel.Ev]
      val got = mutable.Map[Long, Long]()
      val ckpt = ckptDir()
      def start() = streaming.StreamFunnel.transform(mem.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamFunnel.Out], _: Long) =>
            df.collect().foreach(o => got.synchronized { got(o.user_id) = o.level })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toMap
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(restarted.nonEmpty)
    assert(restarted == straight,
      "post-restart funnel levels differ from the uninterrupted run")
  }

  test("decayed-feature monitor recovers per-user accumulators from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts_s")).as("t"),
        col("event_id"), col("value"))
      .as[streaming.StreamDecay.Ev].collect().toSeq
      .sortBy(e => (e.t, e.event_id))
    def run(withRestart: Boolean): Map[(Long, Long), (Double, Double, Double)] = {
      val mem = MemoryStream[streaming.StreamDecay.Ev]
      val got = mutable.Map[(Long, Long), (Double, Double, Double)]()
      val ckpt = ckptDir()
      def start() = streaming.StreamDecay.transform(mem.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamDecay.Out], _: Long) =>
            df.collect().foreach(o => got.synchronized {
              got((o.user_id, o.event_id)) = (o.d_sum, o.d_cnt, o.d_avg)
            })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toMap
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(restarted.size == rows.size)
    // bit-exact: the recovered (lastT, dSum, dCnt) state feeds the
    // identical IEEE fold, so even the doubles must match exactly
    assert(restarted == straight,
      "post-restart decayed features differ from the uninterrupted run")
  }

  test("replacing monitor recovers per-key winners from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("event_type").as("key"), col("event_id").as("ver"),
        col("value").as("v"))
      .as[(String, Long, Double)].collect().toSeq
    def run(withRestart: Boolean): Map[String, (Long, Double, Long)] = {
      val mem = MemoryStream[(String, Long, Double)]
      val got = mutable.Map[String, (Long, Double, Long)]()
      val ckpt = ckptDir()
      def start() = streaming.StreamReplacing
        .replacing(mem.toDF().toDF("key", "ver", "v"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamReplacing.LatestRow], _: Long) =>
            df.collect().foreach(o => got.synchronized {
              got(o.key) = (o.last_ver, o.last_value, o.n_versions)
            })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toMap
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(restarted.nonEmpty)
    assert(restarted == straight,
      "post-restart replacing winners differ from the uninterrupted run")
    // n_versions is the recovery tripwire: a lost state row undercounts
    val totalVersions = restarted.values.map(_._3).sum
    assert(totalVersions == rows.size.toLong,
      s"version counts lost rows across the restart: $totalVersions vs ${rows.size}")
  }

  test("heavy-hitter monitor recovers per-group counter tables from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("event_type").as("group"),
        concat(lit("u"), col("user_id")).as("item"))
      .as[(String, String)].collect().toSeq
    def run(withRestart: Boolean): Map[String, Seq[(String, Long, Long)]] = {
      val mem = MemoryStream[(String, String)]
      val got = mutable.Map[String, Seq[(String, Long, Long)]]()
      val ckpt = ckptDir()
      def start() = streaming.StreamTopK
        .heavyHitters(mem.toDF().toDF("group", "item"), k = 3, capacity = 256)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamTopK.TopRow], _: Long) =>
            val byGroup = df.collect().groupBy(_.group)
            got.synchronized {
              byGroup.foreach { case (g, ts) =>
                got(g) = ts.toSeq.sortBy(t => (-t.count, t.item))
                  .map(t => (t.item, t.count, t.err))
              }
            }
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toMap
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(restarted.nonEmpty)
    // capacity covers the item domain ⇒ exact counts; a state-losing
    // restart would restart every count from the post-restart slice
    assert(restarted == straight,
      "post-restart heavy-hitter tables differ from the uninterrupted run")
  }

  test("sessionizer recovers open-session buffers from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("user_id"), col("ts_s").as("ts"))
      .as[streaming.Sessionize.Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.user_id))
    def run(withRestart: Boolean): Set[(Long, Timestamp, Timestamp, Long)] = {
      val mem = MemoryStream[streaming.Sessionize.Event]
      val got = mutable.Set[(Long, Timestamp, Timestamp, Long)]()
      val ckpt = ckptDir()
      def start() = streaming.Sessionize.sessions(mem.toDS(), gapSec = 3600L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.Sessionize.Session], _: Long) =>
            df.collect().foreach(s => got.synchronized {
              got += ((s.user_id, s.session_start, s.session_end, s.n_events))
            })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toSet
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(straight.nonEmpty, "fixture must close at least one session")
    // identical parts ⇒ identical watermark trajectory ⇒ a correct
    // recovery closes the identical session set (an open session lost
    // at the restart would re-open and split)
    assert(restarted == straight,
      "post-restart closed sessions differ from the uninterrupted run")
  }

  test("projection maintenance resumes from the checkpoint without double-counting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the OTHER restart failure mode: foreachBatch standing state is
    // outside Spark's state store, so a restart can replay a committed
    // batch (double-count) or re-deliver from offset zero — the batch-id
    // fence inside the AtomicDir swap must absorb both
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity")
    val dest = Files.createTempDirectory("graft-restart-proj").toString + "/proj"
    val oneShot = Files.createTempDirectory("graft-restart-proj1").toString
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .as[(String, String, Double)].collect().toSeq
    val mem = MemoryStream[(String, String, Double)]
    val ckpt = ckptDir()
    def start() = streaming.ProjectionStream.maintain(
        mem.toDF().toDF("l_returnflag", "l_linestatus", "l_quantity"),
        keys, measures, dest)
      .option("checkpointLocation", ckpt)
      .start()
    feedWithRestart(mem, () => start(), parts(rows, 4), 2)
    plans.Projections.materialize(
      Tables(spark, sf, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")),
      keys, measures, oneShot)
    val got = spark.read.parquet(dest)
      .select(col("l_returnflag"), col("l_linestatus"), col("_cnt"),
        col("_sum_l_quantity"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    val want = spark.read.parquet(oneShot)
      .select(col("l_returnflag"), col("l_linestatus"), col("_cnt"),
        col("_sum_l_quantity"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0) && g.getString(1) == w.getString(1))
      assert(g.getLong(2) == w.getLong(2),
        s"key ${g.getString(0)}/${g.getString(1)}: count ${g.getLong(2)} vs " +
          s"${w.getLong(2)} — a replayed or dropped batch across the restart")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6)
    }
  }

  test("moments maintenance resumes from the checkpoint without double-counting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dest = Files.createTempDirectory("graft-restart-mom").toString + "/m"
    val one = Files.createTempDirectory("graft-restart-mom1").toString + "/m"
    val rows = Tables(spark, sf, "embeddings")
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
    val mem = MemoryStream[Seq[Float]]
    val ckpt = ckptDir()
    def start() = streaming.MomentsStream.maintain(
        mem.toDF().toDF("embedding"), dest)
      .option("checkpointLocation", ckpt)
      .start()
    feedWithRestart(mem, () => start(), parts(rows, 4), 2)
    streaming.MomentsStream.mergeBatch(
      rows.toDF("embedding"), one, batchId = 0)
    val got = streaming.MomentsStream.moments(spark, dest).get
    val want = streaming.MomentsStream.moments(spark, one).get
    assert(got(0) == want(0),
      s"vector count ${got(0)} vs ${want(0)} — rows lost or replayed across the restart")
    // merged sums associate differently across batch splits — equal
    // within fp reassociation on every moment entry
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-6 * math.max(1.0, math.abs(w)))
    }
  }

  test("projection maintenance restarts ACROSS a torn standing-state swap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the composed failure the two r9 batteries proved only separately:
    // an object-store rename TEARS mid-swap (TornRenameFs), the stream
    // dies mid-batch, and the checkpoint restart must replay the batch
    // against whatever debris the tear left — recover promotes the
    // committed tmp (its marker already carries the batch id), and the
    // replayed batch must fence as a no-op, or sums double-count
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornfs.impl", classOf[TornRenameFs].getName)
    val root = Files.createTempDirectory("graft-restart-torn").toString
    val dest = "tornfs://" + root + "/proj"
    val oneShot = Files.createTempDirectory("graft-restart-torn1").toString
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity")
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .as[(String, String, Double)].collect().toSeq
    val ps = parts(rows, 4)
    val mem = MemoryStream[(String, String, Double)]
    val ckpt = ckptDir()
    def start() = streaming.ProjectionStream.maintain(
        mem.toDF().toDF("l_returnflag", "l_linestatus", "l_quantity"),
        keys, measures, dest)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val q1 = start()
      try {
        mem.addData(ps.head); q1.processAllAvailable() // batch 0 lands clean
        // batch 1's PROMOTE rename tears after one copied file
        TornRenameFs.inject = Some(TornRenameFs.Inject("proj.tmp", copyBudget = 1))
        mem.addData(ps(1))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
      } finally { TornRenameFs.inject = None; q1.stop() }
      val q2 = start() // replays batch 1 over the torn debris, then continues
      try {
        ps.drop(2).foreach { b => mem.addData(b); q2.processAllAvailable() }
        q2.processAllAvailable()
      } finally q2.stop()
      plans.Projections.materialize(
        Tables(spark, sf, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")),
        keys, measures, oneShot)
      graft.AtomicDir.recover(dest)
      val got = spark.read.parquet(dest)
        .select(col("l_returnflag"), col("l_linestatus"), col("_cnt"),
          col("_sum_l_quantity"))
        .orderBy("l_returnflag", "l_linestatus").collect()
      val want = spark.read.parquet(oneShot)
        .select(col("l_returnflag"), col("l_linestatus"), col("_cnt"),
          col("_sum_l_quantity"))
        .orderBy("l_returnflag", "l_linestatus").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) == w.getString(0) && g.getString(1) == w.getString(1))
        assert(g.getLong(2) == w.getLong(2),
          s"key ${g.getString(0)}/${g.getString(1)}: count ${g.getLong(2)} vs " +
            s"${w.getLong(2)} — the torn swap + replay double-counted or dropped a batch")
        assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6)
      }
    } finally TornRenameFs.inject = None
  }

  test("moments maintenance restarts ACROSS a torn standing-state swap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.hadoopConfiguration
      .set("fs.tornfs.impl", classOf[TornRenameFs].getName)
    val root = Files.createTempDirectory("graft-restart-torn-m").toString
    val dest = "tornfs://" + root + "/m"
    val one = Files.createTempDirectory("graft-restart-torn-m1").toString + "/m"
    val rows = Tables(spark, sf, "embeddings")
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
    val ps = parts(rows, 4)
    val mem = MemoryStream[Seq[Float]]
    val ckpt = ckptDir()
    def start() = streaming.MomentsStream.maintain(
        mem.toDF().toDF("embedding"), dest)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val q1 = start()
      try {
        mem.addData(ps.head); q1.processAllAvailable()
        // this tear dies BETWEEN copy and delete: both halves alive —
        // the other canonical window (the projection arm tears mid-copy)
        TornRenameFs.inject =
          Some(TornRenameFs.Inject("m.tmp", crashBeforeDelete = true))
        mem.addData(ps(1))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
      } finally { TornRenameFs.inject = None; q1.stop() }
      val q2 = start()
      try {
        ps.drop(2).foreach { b => mem.addData(b); q2.processAllAvailable() }
        q2.processAllAvailable()
      } finally q2.stop()
      streaming.MomentsStream.mergeBatch(rows.toDF("embedding"), one, batchId = 0)
      val got = streaming.MomentsStream.moments(spark, dest).get
      val want = streaming.MomentsStream.moments(spark, one).get
      assert(got(0) == want(0),
        s"vector count ${got(0)} vs ${want(0)} — torn swap + replay lost or doubled rows")
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 1e-6 * math.max(1.0, math.abs(w)))
      }
    } finally TornRenameFs.inject = None
  }

  test("near-dup monitor recovers band-bucket representatives from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // documents carry no timestamp; synthesize one deterministically
    // (doc_id minutes after a fixed epoch) — both runs see the same
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    val rows = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      .sortBy(_._1)
      .map { case (id, text) => (id, new Timestamp(base + id * 60000L), text) }
    def run(withRestart: Boolean): Set[(Long, Long)] = {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val got = mutable.Set[(Long, Long)]()
      val ckpt = ckptDir()
      def start() = streaming.StreamDedup
        .nearDupCandidates(mem.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[streaming.StreamDedup.Candidate], _: Long) =>
            df.collect().foreach(c => got.synchronized {
              got += ((c.doc_id, c.dup_of))
            })
        }
        .start()
      if (withRestart) feedWithRestart(mem, () => start(), parts(rows, 4), 2)
      else feedStraight(mem, () => start(), parts(rows, 4))
      got.toSet
    }
    val restarted = run(withRestart = true)
    val straight = run(withRestart = false)
    assert(straight.nonEmpty, "fixture must produce at least one candidate pair")
    // a bucket representative lost at the restart would re-admit the
    // next collider as a NEW representative — missing pairs, or pairs
    // pointing at the wrong dup_of
    assert(restarted == straight,
      "post-restart near-dup candidates differ from the uninterrupted run")
  }
}
