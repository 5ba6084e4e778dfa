package graft

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Semantic checks for the §2.M time-series / interval / rank-test
  * kernels on hand-crafted inputs with known ground truth. The DuckDB
  * oracle replays each query's relational shape; these pin the
  * SEMANTICS — reset handling, open/closed interval edges, island
  * boundaries, tie-corrected ranks, entropy identities.
  */
class TimeSeriesSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("deltaSum counts only positive increments and ignores resets") {
    import spark.implicits._
    // counter A: 0→5→3(reset)→10: increments 5 + 7 = 12, 3 deltas
    // counter B: monotone 1→2→4: increments 1 + 2 = 3, 2 deltas
    val df = Seq(
      ("a", 1, 0.0), ("a", 2, 5.0), ("a", 3, 3.0), ("a", 4, 10.0),
      ("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 4.0))
      .toDF("k", "t", "v")
    val got = operators.TimeSeries.deltaSum(df, "k", Seq("t"), "v")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 12.0, 3L), ("b", 3.0, 2L)))
  }

  test("maxIntersections finds the peak and its first instant, ends exclusive") {
    import spark.implicits._
    // [1,5) [2,4) [3,6): all three overlap only on [3,4) -> max 3 at day 3.
    // [5,7) starts exactly where [1,5) ends -> must NOT overlap it.
    val iv = Seq(
      (ts(1), ts(5)), (ts(2), ts(4)), (ts(3), ts(6)), (ts(5), ts(7)))
      .toDF("st", "en")
    val got = operators.TimeSeries.maxIntersections(iv).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 3L, s"peak concurrency: ${got.toSeq}")
    assert(got(0).getTimestamp(1) == ts(3), s"first peak instant: ${got.toSeq}")
  }

  test("mergeIslands coalesces overlapping and touching-inside intervals per key") {
    import spark.implicits._
    val iv = Seq(
      // k1: [1,3) + [2,5) overlap -> island [1,5); [7,8) separate
      ("k1", 1L, ts(1), ts(3)), ("k1", 2L, ts(2), ts(5)), ("k1", 3L, ts(7), ts(8)),
      // k2: [1,2) then [2,3): st == prior en -> NOT st > en -> same island
      ("k2", 4L, ts(1), ts(2)), ("k2", 5L, ts(2), ts(3)))
      .toDF("k", "tie", "st", "en")
    val got = operators.TimeSeries.mergeIslands(iv, "k", "tie")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // k1: islands [1,5) (4 days) + [7,8) (1 day); k2: one island [1,3) (2 days)
    assert(got.toSeq == Seq(("k1", 2L, 5L), ("k2", 1L, 2L)))
  }

  test("mannWhitneyU matches the hand-computed statistic with ties") {
    import spark.implicits._
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, then 2/3/4 tie at avg 3, 5.
    // R1 = 1 + 3 + 3 = 7 -> U1 = 7 - 3*4/2 = 1; U2 = n1*n2 - U1 = 5.
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("g", "x")
    val got = operators.Analytics.mannWhitneyU(df,
        col("g") === "A", col("g") === "B", col("x"))
      .collect()(0)
    assert(got.getDouble(0) == 1.0, s"u1: $got")
    assert(got.getDouble(1) == 5.0, s"u2: $got")
    assert(got.getLong(3) == 3L && got.getLong(4) == 2L)
    // tie-corrected z: mu = 3, sigma = sqrt(6/12 * (6 - 24/20)) = sqrt(2.4)
    val z = (1.0 - 3.0) / math.sqrt(6.0 / 12 * ((5 + 1) - 24.0 / (5 * 4)))
    assert(math.abs(got.getDouble(2) - math.rint(z * 10000) / 10000) < 1e-9,
      s"z: got $got want $z")
  }

  test("theilsU is 1 when A determines B, 0 when independent") {
    import spark.implicits._
    // B = f(A) exactly: knowing B removes all uncertainty about A only
    // if the map is invertible; here it is (bijection) -> both U = 1.
    val det = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2), ("z", 3))
      .toDF("a", "b")
    val g1 = operators.Analytics.theilsU(det, "a", "b").collect()(0)
    assert(g1.getDouble(0) == 1.0 && g1.getDouble(1) == 1.0, s"bijection: $g1")
    // independent uniform grid: every (a, b) cell equal -> U = 0 both ways
    val ind = (for { a <- Seq("x", "y"); b <- Seq(1, 2); _ <- 1 to 3 }
      yield (a, b)).toDF("a", "b")
    val g2 = operators.Analytics.theilsU(ind, "a", "b").collect()(0)
    assert(g2.getDouble(0) == 0.0 && g2.getDouble(1) == 0.0, s"independent: $g2")
    // entropies: H(A) = ln 2, H(B) = ln 2 on the independent grid
    assert(math.abs(g2.getDouble(2) - math.rint(math.log(2) * 10000) / 10000) < 1e-9)
  }

  test("spearman is ±1 on monotone data and uses midranks for ties") {
    import spark.implicits._
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y")
    val g1 = operators.Analytics.spearman(mono, col("x"), col("y")).collect()(0)
    assert(g1.getDouble(0) == 1.0 && g1.getLong(1) == 3L, s"monotone up: $g1")
    val anti = Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)).toDF("x", "y")
    val g2 = operators.Analytics.spearman(anti, col("x"), col("y")).collect()(0)
    assert(g2.getDouble(0) == -1.0, s"monotone down: $g2")
    // ties: x = (1,2,2,3), y = (1,2,3,4). midranks x: 1, 2.5, 2.5, 4.
    // Pearson of (1,2.5,2.5,4) vs (1,2,3,4): Σdxdy = 4.5, Σdx² = 4.5,
    // Σdy² = 5 -> 4.5/sqrt(4.5*5) ≈ 0.9487
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val g3 = operators.Analytics.spearman(tied, col("x"), col("y")).collect()(0)
    val want = 4.5 / math.sqrt(4.5 * 5.0)
    assert(math.abs(g3.getDouble(0) - math.rint(want * 10000) / 10000) < 1e-9,
      s"midrank ties: got $g3 want $want")
  }

  test("ksTest matches the hand-computed sup-CDF distance") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: CDF gaps 0.5 (at 1), 0.5 (at 2), 0 (at 3)
    // -> D = 0.5, KS = sqrt(2*2/4) * 0.5 = 0.5
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)).toDF("g", "x")
    val got = operators.Analytics.ksTest(df,
      col("g") === "A", col("g") === "B", col("x")).collect()(0)
    assert(got.getDouble(0) == 0.5 && got.getDouble(1) == 0.5, s"ks: $got")
    assert(got.getLong(2) == 2L && got.getLong(3) == 2L)
    // identical samples -> D = 0
    val same = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0)).toDF("g", "x")
    val g0 = operators.Analytics.ksTest(same,
      col("g") === "A", col("g") === "B", col("x")).collect()(0)
    assert(g0.getDouble(0) == 0.0, s"identical samples: $g0")
  }

  test("lttb keeps both endpoints, one point per bucket, and the spike") {
    val got = SparkEntry.queries("q_win_lttb")(spark, sf).collect()
    val xs = got.map(_.getDouble(1))
    assert(xs.sameElements(xs.sorted), "output must be in time order")
    assert(got.count(_.getLong(0) == -1L) == 2, "exactly the two endpoints")
    val mids = got.filter(_.getLong(0) >= 0L)
    assert(mids.map(_.getLong(0)).distinct.length == mids.length,
      "one survivor per bucket")
    // downsample is a subset of the true series: re-derive the daily
    // counts and check every kept (x, y) is a real point
    val ser = operators.Relational.eventsSec(spark, sf)
      .groupBy(datediff(date_trunc("day", col("ts_s")),
        to_date(lit("2024-01-01"))).cast("double").as("x"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    got.foreach(r => assert(ser.contains((r.getDouble(1), r.getDouble(2))),
      s"kept point ${r.toSeq} is not in the source series"))
  }

  test("zipf fit recovers the exact power-law slope from synthetic counts") {
    import spark.implicits._
    // corpus where token t_r appears round(1000 * r^-1) times -> the
    // log-log regression over the full grid must come out at ~ -1
    val toks = (1 to 20).flatMap { r =>
      val n = math.round(1000.0 * math.pow(r, -1.0)).toInt
      Seq.fill(n)(f"tok$r%02d")
    }
    val docs = toks.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val got = SparkEntry.queries("q_zipf_fit")(spark, sf)
    // shape only from the fixture run (n_ranks bounded, slope negative)
    val fx = got.collect()(0)
    assert(fx.getLong(2) <= 100 && fx.getDouble(0) < 0)
    // crafted corpus through the same token->count->rank->fit pipeline
    val cnt = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).cast("double").as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("c").desc, col("tok"))))
    val slope = cnt
      .agg(expr("regr_slope(ln(c), ln(CAST(rk AS DOUBLE)))"))
      .collect()(0).getDouble(0)
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope should be ~ -1")
  }

  test("seasonal decomposition reconstructs the series and centers the seasonal") {
    val rows = SparkEntry.queries("q_series_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, t, s, res) = (r.getLong(2).toDouble, r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      // identity y = trend + seasonal + resid survives the 4-dp rounds
      assert(math.abs(y - (t + s + res)) < 3e-4,
        s"decomposition identity broken at $r")
    }
    // every (type, dow) seasonal is a mean of detrended values, so the
    // per-type seasonal means weighted by dow counts must net to ~the
    // detrended mean; cheap proxy: |seasonal| stays below the series max
    val maxY = rows.map(_.getLong(2)).max.toDouble
    assert(rows.map(r => math.abs(r.getDouble(4))).max < maxY)
  }

  test("tukey fences flag exactly the points outside [q1-1.5IQR, q3+1.5IQR]") {
    val rows = SparkEntry.queries("q_tukey_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, lo, hi, flag) =
        (r.getLong(2).toDouble, r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      assert(lo <= hi, s"fences inverted at $r")
      assert(flag == (y < lo || y > hi), s"flag inconsistent at $r")
    }
  }

  test("autocorrelation stays in [-1, 1] and pairs shrink with the lag") {
    val rows = SparkEntry.queries("q_autocorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-6, s"acf out of range: $r")
    }
    // within one event type, n_pairs is non-increasing as lag grows
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byLag = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(byLag.zip(byLag.tail).forall { case (a, b) => b <= a })
    }
  }

  test("DFT period detection: one winner per type with consistent geometry") {
    val rows = SparkEntry.queries("q_series_period")(spark, sf).collect()
    val types = operators.Relational.eventsSec(spark, sf)
      .select("event_type").distinct().count()
    assert(rows.length == types, "exactly one dominant period per type")
    rows.foreach { r =>
      val (k, period, mag, nDays) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(k >= 1 && k <= 12, s"k out of the scanned band: $r")
      assert(mag > 0, s"degenerate zero magnitude: $r")
      // period = N/k on the 4-decimal grid
      assert(math.abs(period - nDays.toDouble / k) < 5e-4, s"geometry: $r")
    }
    // determinism across runs (trig + rank ties)
    val again = SparkEntry.queries("q_series_period")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("CUSUM prefix-minus-running-min identity equals the sequential recurrence") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r2(x: Double, s: Int) = BigDecimal(x).setScale(s, HALF_UP).toDouble
    val shiftCut = java.time.LocalDate.of(2024, 1, 21)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val rows = operators.Relational.eventsSec(spark, sf)
      .select("event_type", "ts_s", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      val xs = ord.map { case (_, sec, id, v) =>
        (id, if (sec >= shiftCut) v + 25.0 else v) }
      val mu = r2(xs.map(_._2).sum / xs.length + 1e-9, 2)
      var s = 0L; var maxC = 0L; var nAlarm = 0L
      var first: Option[Long] = None
      xs.foreach { case (id, x) =>
        val dev = BigDecimal((x - mu - 2.0) * 100).setScale(0, HALF_UP).toLong
        s = math.max(0L, s + dev)
        if (s > maxC) maxC = s
        if (s > 50000L) { nAlarm += 1; if (first.isEmpty) first = Some(id) }
      }
      t -> (xs.length.toLong, nAlarm, r2(maxC / 100.0, 2), first)
    }
    val got = SparkEntry.queries("q_changepoint")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, want) =>
      assert(got(t) == want, s"$t: got ${got(t)}, want $want")
    }
    assert(expected.values.exists(_._2 > 0),
      "the injected day-20 level shift must trigger at least one alarm")
  }

  test("Hampel filter equals the brute-force sliding median/MAD") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r4(x: Double) = BigDecimal(x).setScale(4, HALF_UP).toDouble
    def lowerMedian(v: Seq[Double]): Double = {
      val s = v.sorted; s((s.length + 1) / 2 - 1)
    }
    val rows = operators.Relational.eventsSec(spark, sf)
      .select("user_id", "ts_s", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      ord.indices.map { i =>
        val frame = ord.slice(math.max(0, i - 8), i + 1).map(_._4).toSeq
        val med = lowerMedian(frame)
        val mad = lowerMedian(frame.map(x => math.abs(x - med)))
        (u, ord(i)._3) ->
          ((r4(med), r4(mad), math.abs(ord(i)._4 - med) > mad * 3.5))
      }
    }
    val got = SparkEntry.queries("q_win_hampel")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, want) =>
      assert(got(k) == want, s"$k: got ${got(k)}, want $want")
    }
    val spikes = got.values.count(_._3)
    assert(spikes > 0 && spikes < got.size,
      s"fixture should show some but not all spikes ($spikes/${got.size})")
  }

  test("q_series_forecast matches a driver-side Holt replay on the fixture grid") {
    // Recompute the (type × day) count grid and fold Holt in plain
    // Scala with the SAME arithmetic the Column fold writes out —
    // pins the HOF `aggregate()` against an independent
    // implementation (the oracle pins it against DuckDB's
    // list_reduce; this pins the semantics).
    val grid = operators.Relational.eventsSec(spark, sf)
      .groupBy(col("event_type"),
        datediff(date_trunc("day", col("ts_s")),
          to_date(lit("2024-01-01"))).cast("long").as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toList
      }
    val want = grid.map { case (t, ys) =>
      var l = ys.head; var b = 0.0
      ys.tail.foreach { x =>
        val nl = 0.3 * x + 0.7 * (l + b)
        val nb = 0.2 * (nl - l) + 0.8 * b
        l = nl; b = nb
      }
      t -> (ys.size.toLong, math.rint((l + 1e-9) * 1e4) / 1e4,
        math.rint((b + 1e-9) * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("q_series_forecast")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size == want.size)
    want.foreach { case (t, (nd, level, trend)) =>
      val (gn, gl, gt) = got(t)
      assert(gn == nd, s"$t n_days: $gn vs $nd")
      assert(math.abs(gl - level) < 1e-9, s"$t level: $gl vs $level")
      assert(math.abs(gt - trend) < 1e-9, s"$t trend: $gt vs $trend")
    }
    // the fixture series are non-degenerate: at least one type must
    // carry a visible trend component
    assert(want.values.exists { case (_, _, tr) => math.abs(tr) > 1e-4 },
      "all fitted trends are zero — fixture grid degenerate?")
  }
}
