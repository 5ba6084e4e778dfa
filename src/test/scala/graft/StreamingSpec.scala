package graft

import graft.streaming.{SnapshotStream, StreamIndexer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp
import scala.collection.mutable

/** Integration test for the streaming runtime (SURVEY.md §2.I, hazard
  * H6): feed the fixture events through a MemoryStream, run the
  * snapshot pipeline once (AvailableNow = the BACKUP_ON_START path),
  * assert the partitioned snapshot landed and lifecycle hooks fired.
  */
class StreamingSpec extends SparkSpec {

  test("snapshot stream writes day-partitioned parquet and fires hooks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)]
      .collect().toSeq

    val events = mutable.ArrayBuffer[SnapshotStream.HookEvent]()
    val listener = new SnapshotStream.HookListener(e => events.synchronized { events += e })
    spark.streams.addListener(listener)
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows)
    val dest = Files.createTempDirectory("graft-snap").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = SnapshotStream.start(spark,
      mem.toDF().toDF("ts", "event_type", "value"),
      dest, Trigger.AvailableNow(), ckpt)
    try q.awaitTermination(120000) finally {
      q.stop(); spark.streams.removeListener(listener)
    }

    val snap = spark.read.parquet(s"$dest/snapshots")
    assert(snap.columns.contains("bucket_day"))
    assert(snap.count() > 0)
    // watermark closed the daily windows for all but the tail day(s)
    val days = snap.select("bucket_day").distinct().count()
    assert(days >= 25, s"expected ~29 closed daily windows, got $days")
    events.synchronized {
      assert(events.exists(_.status == "pre-backup"))
      assert(events.exists(_.status == "post-backup"))
    }
  }

  test("streaming dedup drops in-flight duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_id"), col("user_id"))
      .as[(Timestamp, Long, Long)].collect().toSeq.take(2000)
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val q = SnapshotStream.dedupedEvents(
        mem.toDF().toDF("ts", "event_id", "user_id"), "event_id")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      mem.addData(rows)
      mem.addData(rows) // exact duplicate replay
      mem.addData(rows.map { case (ts, id, u) => (ts, id, u + 1) }) // same ids, new payload
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out")
    assert(got.count() == rows.length,
      "each event_id must survive exactly once")
    assert(got.select("event_id").distinct().count() == rows.length)
  }

  test("flatMapGroupsWithState sessionizer matches batch sessionization exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = operators.Relational.eventsSec(spark, sf)
      .select(col("user_id"), col("ts_s").as("ts"))
      .as[streaming.Sessionize.Event].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max

    val mem = MemoryStream[streaming.Sessionize.Event]
    val q = streaming.Sessionize.sessions(mem.toDS(), gapSec = 1800)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      mem.addData(ev)
      q.processAllAvailable()
      // two sentinel rounds: round 1 advances the watermark past every
      // real session's timeout, round 2 fires those timeouts
      mem.addData(Seq(streaming.Sessionize.Event(-1L, new Timestamp(maxTs + 86400000L))))
      q.processAllAvailable()
      mem.addData(Seq(streaming.Sessionize.Event(-1L, new Timestamp(maxTs + 2 * 86400000L))))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_out")
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
    val want = SparkEntry.queries("q_stream_session")(spark, sf)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events").cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "closed-session sets must agree exactly with the declarative batch form")
    assert(got.count() == want.count())
  }

  test("sessionizer handles late cross-batch arrivals: in-gap extends start, isolated closes alone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[streaming.Sessionize.Event]
    val q = streaming.Sessionize.sessions(mem.toDS(), gapSec = 1800, watermarkDelay = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("sess_late").start()
    try {
      mem.addData(Seq(
        streaming.Sessionize.Event(1L, ts("2024-01-01 10:00:00")),
        streaming.Sessionize.Event(2L, ts("2024-01-01 12:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq(
        streaming.Sessionize.Event(1L, ts("2024-01-01 09:50:00")), // in-gap late
        streaming.Sessionize.Event(2L, ts("2024-01-01 08:00:00")))) // isolated late
      q.processAllAvailable()
      // sentinel rounds advance the watermark so open sessions time out
      mem.addData(Seq(streaming.Sessionize.Event(-1L, ts("2024-01-05 00:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq(streaming.Sessionize.Event(-1L, ts("2024-01-09 00:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_late").filter(col("user_id") > 0)
      .select(col("user_id"),
        date_format(col("session_start"), "HH:mm").as("s"),
        date_format(col("session_end"), "HH:mm").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, "09:50", "10:00", 2L), // late in-gap event moved session_start back
      (2L, "08:00", "08:00", 1L), // isolated late arrival closed alone
      (2L, "12:00", "12:00", 1L)), s"got $got")
  }

  test("sessionizer merges stragglers across batches and bridges open sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[streaming.Sessionize.Event]
    val q = streaming.Sessionize.sessions(mem.toDS(), gapSec = 1800, watermarkDelay = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("sess_merge").start()
    try {
      mem.addData(Seq(streaming.Sessionize.Event(1L, ts("2024-01-01 12:00:00"))))
      q.processAllAvailable()
      // straggler well before the open session: opens its own session
      mem.addData(Seq(streaming.Sessionize.Event(1L, ts("2024-01-01 08:00:00"))))
      q.processAllAvailable()
      // second straggler in a LATER batch, in-gap of the first: must
      // merge with it, not close as another singleton
      mem.addData(Seq(streaming.Sessionize.Event(1L, ts("2024-01-01 08:10:00"))))
      q.processAllAvailable()
      // bridge: 08:30 is within the gap of [08:00,08:10] AND of a new
      // 08:55 arrival in the same batch — one fused session
      mem.addData(Seq(
        streaming.Sessionize.Event(1L, ts("2024-01-01 08:55:00")),
        streaming.Sessionize.Event(1L, ts("2024-01-01 08:30:00"))))
      q.processAllAvailable()
      // sentinel rounds: advance the watermark, then fire the timeouts
      mem.addData(Seq(streaming.Sessionize.Event(-1L, ts("2024-01-05 00:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq(streaming.Sessionize.Event(-1L, ts("2024-01-09 00:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_merge").filter(col("user_id") > 0)
      .select(date_format(col("session_start"), "HH:mm").as("s"),
        date_format(col("session_end"), "HH:mm").as("e"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("08:00", "08:55", 4L), // stragglers + bridge all fused
      ("12:00", "12:00", 1L)), s"got $got")
  }

  test("webhook publisher retries transient failures and delivers") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val pub = new streaming.WebhookPublisher(
      transport = { _ =>
        if (calls.incrementAndGet() <= 2) sys.error("transient 503")
      },
      backoffMillis = 1)
    val ok = pub.publish(SnapshotStream.HookEvent("post-backup", ""))
    assert(ok && calls.get() == 3, s"expected success on attempt 3, calls=${calls.get()}")
    assert(pub.payload(SnapshotStream.HookEvent("pre-backup", "x"))
      == """{"status": "pre-backup"}""")
  }

  test("webhook publisher gives up after the reference's retry budget") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val gaveUp = new java.util.concurrent.atomic.AtomicReference[String](null)
    val pub = new streaming.WebhookPublisher(
      transport = { _ => calls.incrementAndGet(); sys.error("down") },
      retries = 5, backoffMillis = 1,
      onGiveUp = (e, t) => gaveUp.set(s"${e.status}:${t.getMessage}"))
    val ok = pub.publish(SnapshotStream.HookEvent("error", "boom"))
    assert(!ok && calls.get() == 6, s"curl --retry 5 = 6 attempts, got ${calls.get()}")
    assert(gaveUp.get() == "error:down")
  }

  test("query failure reaches the webhook error channel through a flaky transport") {
    // isolated session: the shared session's listener bus also carries
    // every OTHER suite's query events when suites run in parallel,
    // which can starve/flood this listener — hermetic by construction
    val session = spark.newSession()
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    // every event's FIRST delivery attempt fails — only retry gets it out
    val delivered = mutable.ArrayBuffer[String]()
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pub = new streaming.WebhookPublisher(
      transport = { body =>
        if (failedOnce.add(body)) sys.error("first attempt always fails")
        delivered.synchronized { delivered += body }
      },
      backoffMillis = 1)
    val listener = pub.listener
    session.streams.addListener(listener)
    val mem = MemoryStream[Int]
    mem.addData(1, 2, 3)
    val q = mem.toDF().writeStream.outputMode("append")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        sys.error("batch exploded") // backup.sh:7–11 trap ERR analog
      }.start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000); ()
      }
      // listener delivery is async — poll for the error event WHILE
      // the listener is still attached (removing it first races the
      // bus delivering QueryTerminated and drops the event)
      val deadline = System.currentTimeMillis() + 60000
      def got = delivered.synchronized { delivered.toList }
      while (!got.contains("""{"status": "error"}""")
          && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(got.contains("""{"status": "error"}"""),
        s"error event must survive the flaky transport via retry, delivered=$got")
      assert(got.contains("""{"status": "pre-backup"}"""))
    } finally session.streams.removeListener(listener)
  }

  test("default HTTP transport delivers over a real socket, retrying through 503s") {
    import com.sun.net.httpserver.HttpServer
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val bodies = mutable.ArrayBuffer[(String, String)]() // (content-type, body)
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/hook", ex => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      bodies.synchronized {
        bodies += ((ex.getRequestHeaders.getFirst("Content-type"), body))
      }
      // fail twice, then accept — the retry path over a live socket
      val code = if (calls.incrementAndGet() <= 2) 503 else 200
      ex.sendResponseHeaders(code, -1)
      ex.close()
    })
    server.start()
    try {
      val pub = new streaming.WebhookPublisher(
        streaming.WebhookPublisher.httpTransport(
          s"http://localhost:${server.getAddress.getPort}/hook"),
        backoffMillis = 1)
      val ok = pub.publish(SnapshotStream.HookEvent("post-backup", ""))
      assert(ok && calls.get() == 3,
        s"two 503s then success should cost 3 attempts, got ${calls.get()}")
      bodies.synchronized {
        assert(bodies.forall(_._1 == "application/json"))
        assert(bodies.forall(_._2 == """{"status": "post-backup"}"""))
      }
    } finally server.stop(0)
  }

  test("startScheduled drains on start, then hands off to the configured cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows)
    val dest = Files.createTempDirectory("graft-sched").toString
    val ckpt = Files.createTempDirectory("graft-sched-ckpt").toString
    val settings = Config.fromEnvOrThrow(Map(
      "GRAFT_DBS" -> "events",
      "GRAFT_SNAPSHOT_DIR" -> dest,
      "GRAFT_BACKUP_ON_START" -> "TRUE", // init.sh:10–12
      "GRAFT_SCHEDULE" -> "@every 1s"))
    val q = SnapshotStream.startScheduled(spark,
      mem.toDF().toDF("ts", "event_type", "value"), dest, ckpt, settings)
    try {
      // the blocking on-start drain already snapshotted before the
      // scheduled query came up — init.sh's backup-then-cron ordering
      val snap = spark.read.parquet(s"$dest/snapshots")
      assert(snap.count() > 0, "on-start drain must have written the snapshot")
      assert(q.isActive, "the scheduled query must keep running after the drain")
    } finally q.stop()
  }

  test("later ticks preserve earlier snapshot days (dynamic partition overwrite)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq.sortBy(_._1.getTime)
    val (early, late) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(Timestamp, String, Double)]
    val dest = Files.createTempDirectory("graft-ticks").toString
    val ckpt = Files.createTempDirectory("graft-ticks-ckpt").toString
    def tick(rows: Seq[(Timestamp, String, Double)]): Unit = {
      mem.addData(rows)
      val q = SnapshotStream.start(spark,
        mem.toDF().toDF("ts", "event_type", "value"),
        dest, Trigger.AvailableNow(), ckpt)
      try q.awaitTermination(120000) finally q.stop()
    }
    def snapDays(): Set[String] = operators.Snapshot.restore(spark, s"$dest/snapshots")
      .select("bucket_day").distinct().collect().map(_.getString(0)).toSet
    tick(early)
    val afterFirst = snapDays()
    assert(afterFirst.nonEmpty)
    tick(late) // second run, same checkpoint — the cron tick
    val afterSecond = snapDays()
    // the second tick's batch carries only newly closed windows; its
    // write must NOT truncate the days the first tick snapshotted
    assert(afterFirst.subsetOf(afterSecond),
      s"tick 2 lost tick 1's days: ${afterFirst.diff(afterSecond)}")
    assert(afterSecond.size > afterFirst.size, "tick 2 must add its own days")
  }

  test("a failing pre-backup hook gates the streaming tick: nothing written") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows)
    val dest = Files.createTempDirectory("graft-gate").toString
    val ckpt = Files.createTempDirectory("graft-gate-ckpt").toString
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    val gate = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hooks = streaming.Hooks(
      pre = Seq(e => { fired.synchronized { fired += e.status }; gate.get() }),
      post = Seq(e => { fired.synchronized { fired += e.status }; true }))
    val q1 = SnapshotStream.start(spark,
      mem.toDF().toDF("ts", "event_type", "value"),
      dest, Trigger.AvailableNow(), ckpt, hooks = hooks)
    // the gated tick must terminate exceptionally with the abort
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000)
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: rootCauses(t.getCause)
    assert(rootCauses(err).exists(_.isInstanceOf[streaming.HookAbort]),
      s"tick must abort through HookAbort: $err")
    assert(!new java.io.File(s"$dest/snapshots").exists(),
      "a gated tick must write nothing")
    assert(fired.synchronized(fired.toSeq) == Seq("pre-backup"), "post must not fire")

    // open the gate: the SAME checkpoint replays the batch and the
    // tick completes — the cron-tick-after-hook-fix path
    gate.set(true)
    val q2 = SnapshotStream.start(spark,
      mem.toDF().toDF("ts", "event_type", "value"),
      dest, Trigger.AvailableNow(), ckpt, hooks = hooks)
    try q2.awaitTermination(120000) finally q2.stop()
    assert(spark.read.parquet(s"$dest/snapshots").count() > 0,
      "the replayed tick must write the snapshot")
    assert(fired.synchronized(fired.toSeq).last == "post-backup")
  }

  test("per-tick GC expires old snapshot day partitions as batches land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows)
    val dest = Files.createTempDirectory("graft-tickgc").toString
    val ckpt = Files.createTempDirectory("graft-tickgc-ckpt").toString
    val q = SnapshotStream.start(spark,
      mem.toDF().toDF("ts", "event_type", "value"),
      dest, Trigger.AvailableNow(), ckpt, gcKeepDays = Some(2))
    try q.awaitTermination(120000) finally q.stop()
    val days = operators.Snapshot.restore(spark, s"$dest/snapshots")
      .select("bucket_day").distinct().collect().map(_.getString(0)).sorted
    assert(days.length <= 3, // max day + 2 kept
      s"per-tick gc must bound the snapshot to keepDays+1 days, got ${days.toSeq}")
    assert(days.nonEmpty, "the newest days must survive")
  }

  test("stream-stream interval join matches the identical batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = operators.Relational.eventsSec(spark, sf)
      .select(col("ts_s").as("ts"), col("event_id"), col("user_id"), col("event_type"))
    val rows = batch.as[(Timestamp, Long, Long, String)].collect().toSeq
    val mem = MemoryStream[(Timestamp, Long, Long, String)]
    val q = SnapshotStream.purchaseAttribution(
        mem.toDF().toDF("ts", "event_id", "user_id", "event_type"))
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_out")
    val want = SnapshotStream.purchaseAttribution(batch)
    assert(want.count() > 0, "fixture must produce attribution pairs")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming interval join must equal its batch form")
  }

  test("health endpoint serves ok, flips to 503 on the error channel, and recovers") {
    val (health, listener) = streaming.Health.withListener(spark, port = 0)
    try {
      def probe(): (Int, String) = {
        val conn = new java.net.URI(s"http://localhost:${health.port}/health")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = new String(stream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        (code, body)
      }
      val (okCode, okBody) = probe()
      assert(okCode == 200 && okBody.contains("\"status\": \"ok\""), s"$okCode $okBody")
      // the error channel (what the listener forwards) fails the probe —
      // the HEALTHCHECK `curl --fail` contract
      assert(listener != null) // wiring exists; drive the state directly
      health.reportError("backup exploded")
      val (errCode, errBody) = probe()
      assert(errCode == 503 && errBody.contains("\"status\": \"error\""), s"$errCode $errBody")
      health.clearError()
      assert(probe()._1 == 200)
    } finally health.stop()
  }

  test("streaming LSH near-dup candidates equal the batch star edges; state survives batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), t0, r.getString(1))).toSeq

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = streaming.StreamDedup.nearDupCandidates(
        mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      // batch 2: a byte-identical copy of an existing doc under a new
      // id — the bucket representatives retained in state must pair it
      mem.addData(Seq((1000000L, t0, docs.head._3)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("neardup_out").distinct()
    // expected for batch 1: every band bucket's members pair with the
    // bucket minimum (equal ts ⇒ admission order is doc_id order)
    val bands = functions.TextFns.bandKeys(
      functions.TextFns.minhashSignature(col("text"), 3, 16), 4, 4)
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(bands).as("band_key"))
      .groupBy("band_key").agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "transform(slice(ids, 2, size(ids) - 1), x -> struct(x AS doc_id, ids[0] AS dup_of))")).as("p"))
      .select("p.*").distinct()
    val gotB1 = got.filter(col("doc_id") =!= 1000000L)
    assert(gotB1.exceptAll(want).isEmpty && want.exceptAll(gotB1).isEmpty,
      "streaming candidates must equal the batch bucket-star pairs")
    // the cross-batch duplicate collided with retained representatives
    assert(got.filter(col("doc_id") === 1000000L).count() > 0,
      "a later-batch duplicate must pair with a representative kept in state")
  }

  test("streaming near-dup state is evicted at the horizon: a post-eviction copy finds no rep") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val mem = MemoryStream[(Long, Timestamp, String)]
    // tight 1-minute watermark delay and horizon so sentinels can push
    // the watermark past every bucket's eviction timeout
    val q = streaming.StreamDedup.nearDupCandidates(
        mem.toDF().toDF("doc_id", "ts", "text"),
        watermarkDelay = "1 minute", horizonMs = 60000L)
      .writeStream.outputMode("append").format("memory").queryName("neardup_ttl").start()
    try {
      mem.addData(Seq((1L, ts("2024-01-01 00:00:00"), text)))
      q.processAllAvailable()
      // sentinel advances the watermark far past 00:00 + horizon; the
      // second batch fires the timeouts that drop doc 1's bucket reps
      mem.addData(Seq((50L, ts("2024-01-02 00:00:00"), "unrelated filler words only here")))
      q.processAllAvailable()
      mem.addData(Seq((51L, ts("2024-01-02 00:00:30"), "other unrelated filler text rows")))
      q.processAllAvailable()
      // an exact copy of doc 1, arriving after eviction: no surviving
      // representative, so it must be ADMITTED silently (becomes the
      // new rep), not paired — bounded state trades exactly this recall
      mem.addData(Seq((2L, ts("2024-01-02 00:01:00"), text)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_ttl").select("doc_id", "dup_of")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists(_._1 == 2L),
      s"doc 2 paired with an evicted representative — state was not dropped: $got")
  }

  test("batch and streaming tumbling aggregations agree on closed windows") {
    val batch = SparkEntry.queries("q_stream_tumbling")(spark, sf)
      .filter(col("day") < "2024-01-29") // watermark-closed region
    val stream = SnapshotStream.dailyCounts(
        operators.Relational.eventsSec(spark, sf)
          .select(col("ts_s").as("ts"), col("event_type"), col("value")))
      .select(date_format(col("day_start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
      .filter(col("day") < "2024-01-29")
    // dailyCounts on a batch DF computes the same aggregation sans state
    assert(batch.exceptAll(stream).isEmpty && stream.exceptAll(batch).isEmpty)
  }

  test("streaming indexer: frozen-model stream encode equals the batch encode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables(spark, sf, "embeddings")
    val coarse = pipeline.KMeans.fit(emb, "embedding", "vec_id", 10, iters = 3)
    val books = pipeline.Similarity.pqModels(emb, sf)
    // batch reference: the SAME pure projection over the static table
    val batch = StreamIndexer.encoded(emb, coarse, books).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamIndexer.encoded(
        mem.toDF().toDF("vec_id", "embedding"), coarse, books)
      .writeStream.outputMode("append").format("memory")
      .queryName("sidx_out").start()
    try {
      mem.addData(rows.take(rows.size / 2))
      mem.addData(rows.drop(rows.size / 2)) // two micro-batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sidx_out").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got.size == rows.size, "every arriving vector must be indexed once")
    assert(got == batch,
      "stream-encoded (cell, code) must be identical to the batch encode")
  }

  test("streaming heavy hitters equal the batch topK sketch while capacity covers the domain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"), concat(lit("u"), col("user_id")).as("item"))
      .as[(String, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    // latest leaderboard per group — update-mode output replaces, so
    // keep only each group's most recent emission
    val latest = scala.collection.mutable.Map.empty[String, Set[(String, Long, Long)]]
    val mem = MemoryStream[(String, String)]
    val q = streaming.StreamTopK.heavyHitters(
        mem.toDF().toDF("group", "item"), k = 5, capacity = 1000)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamTopK.TopRow], _: Long) =>
        df.collect().groupBy(_.group).foreach { case (g, ts) =>
          latest(g) = ts.map(t => (t.item, t.count, t.err)).toSet
        }
      }
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val want = Tables(spark, sf, "events")
      .select(col("event_type"), concat(lit("u"), col("user_id")).as("item"))
      .groupBy("event_type")
      .agg(functions.TopKAgg(col("item"), 5, 1000).as("tk"))
      .select(col("event_type"), explode(col("tk")).as("t"))
      .select(col("event_type"), col("t.item"), col("t.count"), col("t.err"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      }
    assert(latest.toMap == want,
      s"stream leaderboard ${latest.toMap} must equal batch sketch $want")
    // capacity covered the domain -> counts are exact, zero error
    assert(latest.values.flatten.forall(_._3 == 0L))
  }

  test("streaming collapse nets equal the batch CollapsingMergeTree FINAL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables(spark, sf, "events")
      .select(concat(lit("u"), col("user_id")).as("key"),
        when(col("event_type") === "error", lit(-1L)).otherwise(lit(1L)).as("sign"),
        col("value").as("v"))
      .as[(String, Long, Double)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val latest = scala.collection.mutable.Map.empty[String, (Long, Double, Long)]
    val mem = MemoryStream[(String, Long, Double)]
    val q = streaming.StreamCollapse.collapse(mem.toDF().toDF("key", "sign", "v"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamCollapse.NetRow], _: Long) =>
        df.collect().foreach(r => latest(r.key) = (r.net, r.net_value, r.n_rows))
      }
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // batch FINAL over the same rows, through the SAME collapse kernel
    val batch = operators.Analytics.collapse(
        rows.toDF("key", "sign", "v"), "key", col("sign"), col("v"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val streamFinal = latest.toMap
      .filter { case (_, (net, _, _)) => net > 0 }
      .map { case (k, (net, nv, c)) => k -> (net, math.rint(nv * 10000) / 10000, c) }
    assert(streamFinal == batch,
      s"stream FINAL ${streamFinal.size} keys must equal batch ${batch.size}")
  }

  test("streaming replacing winners equal the batch ReplacingMergeTree FINAL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables(spark, sf, "events")
      .select(concat(col("user_id"), lit("|"), col("event_type")).as("key"),
        col("event_id").cast("long").as("ver"),
        col("value").as("v"))
      .as[(String, Long, Double)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val latest = scala.collection.mutable.Map.empty[String, (Long, Double, Long)]
    val mem = MemoryStream[(String, Long, Double)]
    val q = streaming.StreamReplacing.replacing(mem.toDF().toDF("key", "ver", "v"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamReplacing.LatestRow], _: Long) =>
        df.collect().foreach(r => latest(r.key) = (r.last_ver, r.last_value, r.n_versions))
      }
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // batch FINAL over the same rows — the q_replacing_final kernel
    val batch = rows.toDF("key", "ver", "v")
      .groupBy("key")
      .agg(max("ver").as("last_ver"), max_by(col("v"), col("ver")).as("last_v"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(latest.toMap == batch,
      s"stream FINAL ${latest.size} keys must equal batch ${batch.size}")
  }

  test("streaming heavy hitters keep the dominant item once the table saturates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 30 occurrences of "hot" interleaved with 15 one-off items, table
    // capacity 4: SpaceSaving must retain "hot" with count >= 30
    val noise = (1 to 15).map(i => ("g", s"cold_$i"))
    val data = (1 to 30).map(_ => ("g", "hot")) ++ noise
    val mem = MemoryStream[(String, String)]
    val got = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val q = streaming.StreamTopK.heavyHitters(
        mem.toDF().toDF("group", "item"), k = 2, capacity = 4)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamTopK.TopRow], _: Long) =>
        got.clear()
        df.collect().foreach(t => got(t.item) = (t.count, t.err))
      }
      .start()
    try {
      data.grouped(15).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(got.contains("hot"), s"dominant item evicted: $got")
    val (c, e) = got("hot")
    assert(c >= 30 && c - e <= 30,
      s"count $c (err $e) must overestimate the true 30 by at most err")
  }

  test("streaming time-decayed features reproduce the batch window across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference on the same fixture slice (unrounded recompute:
    // the declared query rounds to 4, so tolerate rounding + fp
    // reassociation between the prefix-scaled window form and the
    // streaming recurrence)
    val batch = SparkEntry.queries("q_win_decayed_avg")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val rows = operators.Relational.eventsSec(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts_s")).as("t"),
        col("event_id"), col("value"))
      .as[streaming.StreamDecay.Ev].collect().toSeq
      .sortBy(e => (e.t, e.event_id))
    val mem = MemoryStream[streaming.StreamDecay.Ev]
    val got = mutable.Map[(Long, Long), (Double, Double, Double)]()
    val q = streaming.StreamDecay.transform(mem.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamDecay.Out], _: Long) =>
        df.collect().foreach(o =>
          got.synchronized { got((o.user_id, o.event_id)) = (o.d_sum, o.d_cnt, o.d_avg) })
      }
      .start()
    try {
      // THREE micro-batches split on the global time order, so state
      // must carry correctly across batch boundaries for every user
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.size == batch.size, s"stream emitted ${got.size} of ${batch.size} events")
    batch.foreach { case (k, (bs, bc, ba)) =>
      val (ss, sc, sa) = got(k)
      assert(math.abs(ss - bs) < 2e-4 && math.abs(sc - bc) < 2e-4 &&
        math.abs(sa - ba) < 2e-4,
        s"event $k: stream ($ss,$sc,$sa) vs batch ($bs,$bc,$ba)")
    }
  }

  test("streaming CUSUM monitor reproduces the batch change-point statistic exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Batch reference: the q_changepoint internals re-run per event
    // (the declared query ships only the 5-row summary) — same
    // injection, same rounded baseline, same integer-cent fold.
    val shifted = operators.Relational.eventsSec(spark, sf)
      .select(col("event_type"), col("ts_s"), col("event_id"),
        (col("value") + when(datediff(date_trunc("day", col("ts_s")),
          to_date(lit("2024-01-01"))) >= 20, lit(25.0)).otherwise(lit(0.0)))
          .as("x"))
    val mu = shifted.groupBy(col("event_type").as("mt"))
      .agg(round(avg(col("x")) + lit(1e-9), 2).as("mu_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("t", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dev = shifted.join(broadcast(mu), col("event_type") === col("mt"))
      .select(col("event_type"), unix_timestamp(col("ts_s")).as("t"),
        col("event_id"),
        round((col("x") - col("mu_r") - lit(2.0)) * 100, 0).cast("long")
          .as("dev_c"))
    val batch = dev
      .withColumn("prefix", sum(col("dev_c")).over(w))
      .withColumn("cusum_c",
        col("prefix") - least(lit(0L), min(col("prefix")).over(w)))
      .select(col("event_type"), col("event_id"), col("cusum_c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = dev.as[streaming.StreamCusum.Ev].collect().toSeq
      .sortBy(e => (e.t, e.event_id))
    val mem = MemoryStream[streaming.StreamCusum.Ev]
    val got = mutable.Map[(String, Long), Long]()
    var alarms = 0L
    val q = streaming.StreamCusum.transform(mem.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamCusum.Out], _: Long) =>
        df.collect().foreach { o =>
          got.synchronized {
            got((o.event_type, o.event_id)) = o.cusum_c
            if (o.alarm) alarms += 1
          }
        }
      }
      .start()
    try {
      // THREE micro-batches split on the global time order, so state
      // must carry correctly across batch boundaries for every type
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.size == batch.size, s"stream emitted ${got.size} of ${batch.size} events")
    batch.foreach { case (k, bc) =>
      assert(got(k) == bc, s"event $k: stream ${got(k)} vs batch $bc — " +
        "the integer fold must match EXACTLY")
    }
    // and the declared summary agrees on the alarm count
    val declared = SparkEntry.queries("q_changepoint")(spark, sf).collect()
      .map(r => r.getLong(2)).sum
    assert(alarms == declared,
      s"stream alarm count $alarms vs declared query $declared")
  }

  test("streaming funnel monitor reproduces the batch funnel levels exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Batch reference: the q_funnel internals per user (the declared
    // query ships only the per-level counts) — same strict signup →
    // click → purchase windows.
    val e = operators.Relational.eventsSec(spark, sf)
      .select("user_id", "event_type", "ts_s", "event_id")
    val u1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
    val u2 = e.filter(col("event_type") === "click")
      .join(u1, Seq("user_id"))
      .filter(col("ts_s") > col("t1") &&
        col("ts_s") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id")
      .agg(min(col("ts_s")).as("t2"), first(col("t1")).as("t1b"))
    val u3 = e.filter(col("event_type") === "purchase")
      .join(u2, Seq("user_id"))
      .filter(col("ts_s") > col("t2") &&
        col("ts_s") <= col("t1b") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts_s")).as("t3"))
    val batch = u1
      .join(u2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(u3, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + col("t2").isNotNull.cast("int")
          + col("t3").isNotNull.cast("int")).cast("long").as("level"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = e.select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts_s")).as("t"), col("event_id"))
      .as[streaming.StreamFunnel.Ev].collect().toSeq
      .sortBy(ev => (ev.t, ev.event_id))
    val mem = MemoryStream[streaming.StreamFunnel.Ev]
    val got = mutable.Map[Long, Long]()
    val q = streaming.StreamFunnel.transform(mem.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[streaming.StreamFunnel.Out], _: Long) =>
        df.collect().foreach(o =>
          got.synchronized { got(o.user_id) = o.level })
      }
      .start()
    try {
      // THREE micro-batches split on the global time order, so state
      // must carry correctly across batch boundaries for every user
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.size == batch.size,
      s"stream tracked ${got.size} funnel users vs batch ${batch.size}")
    batch.foreach { case (u, lvl) =>
      assert(got(u) == lvl, s"user $u: stream level ${got(u)} vs batch $lvl")
    }
    // and the declared per-level counts agree
    val declaredLevels = SparkEntry.queries("q_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamLevels = got.values.groupBy(identity).map { case (l, vs) =>
      l -> vs.size.toLong }
    assert(streamLevels == declaredLevels,
      s"stream level counts $streamLevels vs declared $declaredLevels")
  }
}
