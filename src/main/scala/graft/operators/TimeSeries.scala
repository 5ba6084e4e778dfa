package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.M — time-series / interval analytics: ClickHouse's
  * counter and interval aggregate families ([CH] capability of the
  * engine the reference snapshots — Dockerfile:2 pins ClickHouse 24.8;
  * `BACKUP DATABASE` at backup.sh:45 includes any table feeding
  * deltaSum / maxIntersections-style monitoring queries), plus the
  * Pareto cumulative-share report every ops dashboard over backup
  * sizes runs ([NS]).
  *
  * Scale shapes: the counter windows partition on the counter key
  * (users — the natural parallelism of the data); the sweep-line and
  * Pareto windows run over DOMAIN GRIDS (distinct dates, one row per
  * customer) that a prior map-side-combined hash aggregate has already
  * collapsed the fact rows into — the single-partition window input is
  * bounded by the domain, never the data.
  */
object TimeSeries extends QueryModule {

  /** Order intervals: [o_orderdate, o_orderdate + (o_orderkey%30 + 1)
    * days). Deterministic synthetic duration — the fixtures carry no
    * second date column (TESTDATA.md).
    */
  private def intervals(df: DataFrame): DataFrame =
    df.select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").as("st"),
      expr("timestampadd(DAY, CAST(o_orderkey % 30 AS INT) + 1, o_orderdate)")
        .as("en"))

  /** deltaSum kernel over rows (key, ord…, v): per-key sum of positive
    * increments in (ord…) order. Shared by q_agg_delta_sum and
    * TimeSeriesSpec's crafted counters.
    */
  private[graft] def deltaSum(df: DataFrame, key: String,
      ord: Seq[String], v: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.map(col): _*)
    df.withColumn("dv", col(v) - lag(v, 1).over(w))
      .filter(col("dv").isNotNull)
      .groupBy(key)
      .agg(
        round(sum(when(col("dv") > 0, col("dv")).otherwise(lit(0.0))), 4)
          .as("delta_sum"),
        count(lit(1)).as("n_deltas"))
  }

  /** Sweep-line max-intersections kernel over rows (st, en): collapses
    * interval endpoints to the distinct-instant delta grid, runs the
    * running-sum window over that bounded grid, returns the 1-row
    * (max_concurrent, at_ts = first instant the max is reached).
    */
  private[graft] def maxIntersections(iv: DataFrame): DataFrame = {
    val deltas = iv
      .select(explode(array(
        struct(col("st").as("d"), lit(1L).as("x")),
        struct(col("en").as("d"), lit(-1L).as("x")))).as("ev"))
      .select(col("ev.d").as("d"), col("ev.x").as("x"))
      .groupBy("d").agg(sum("x").as("dx"))
    val run = deltas
      .withColumn("conc", sum("dx").over(Window.orderBy("d")))
    run
      .join(broadcast(run.agg(max("conc").as("max_concurrent"))),
        col("conc") === col("max_concurrent"))
      .groupBy("max_concurrent")
      .agg(min("d").as("at_ts"))
  }

  /** Gaps-and-islands kernel over rows (key, tie, st, en): merges each
    * key's overlapping intervals, returns (key, n_islands,
    * covered_days). `tie` deterministically orders equal (st, en)
    * pairs in the running-max frame.
    */
  private[graft] def mergeIslands(iv: DataFrame, key: String,
      tie: String): DataFrame = {
    val wPrev = Window.partitionBy(key)
      .orderBy("st", "en", tie)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIsl = Window.partitionBy(key).orderBy("st", "en")
    iv
      .withColumn("new_island",
        when(col("st") > max("en").over(wPrev), 1L).otherwise(0L))
      .withColumn("island", sum("new_island").over(wIsl))
      .groupBy(key, "island")
      .agg(min("st").as("ms"), max("en").as("me"))
      .groupBy(key)
      .agg(count(lit(1)).as("n_islands"),
        sum(datediff(col("me"), col("ms"))).cast("long").as("covered_days"))
  }

  def entries: Map[String, QueryDef] = Map(

    // ClickHouse deltaSum ([CH]): per-counter sum of positive
    // increments in time order — the canonical monotone-counter rate
    // aggregation (resets contribute nothing). One window partitioned
    // by the counter key (lag needs the neighbor row), then a hash
    // aggregate; parallelism = counters, state = one row behind.
    // Tie-break on event_id: second-truncated timestamps collide.
    "q_agg_delta_sum" -> QueryDef(
      (s, dir) => deltaSum(
          Relational.eventsSec(s, dir)
            .select(col("user_id"), col("ts_s"), col("event_id"), col("value")),
          "user_id", Seq("ts_s", "event_id"), "value")
        .orderBy("user_id"),
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, value
             |  FROM events),
             |d AS (
             |  SELECT user_id,
             |    value - lag(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS dv
             |  FROM e)
             |SELECT user_id,
             |  round(sum(CASE WHEN dv > 0 THEN dv ELSE 0 END), 4) AS delta_sum,
             |  CAST(count(*) AS BIGINT) AS n_deltas
             |FROM d WHERE dv IS NOT NULL GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // OHLC bars ([CH] argMin/argMax over time buckets — the ClickHouse
    // finance staple: one open/high/low/close row per series per day).
    // ONE map-side-combined hash aggregate: open/close are
    // min_by/max_by on a zero-padded (ts, event_id) composite key (the
    // q_agg_argmax determinism move — second-truncated timestamps
    // collide, so a bare arg_min could return either tied row), high/
    // low are plain max/min. Shuffle carries one candidate per
    // (type, day) — never the tick history; grid-bounded output.
    "q_agg_ohlc" -> QueryDef(
      (s, dir) => {
        val ord = format_string("%020d|%020d",
          unix_timestamp(col("ts_s")), col("event_id"))
        Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            date_format(col("ts_s"), "yyyy-MM-dd").as("day"))
          .agg(
            round(min_by(col("value"), ord), 4).as("open"),
            round(max(col("value")), 4).as("high"),
            round(min(col("value")), 4).as("low"),
            round(max_by(col("value"), ord), 4).as("close"),
            count(lit(1)).as("n_ticks"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type,
             |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |  round(arg_min(value, printf('%020d|%020d',
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id)), 4) AS open,
             |  round(max(value), 4) AS high,
             |  round(min(value), 4) AS low,
             |  round(arg_max(value, printf('%020d|%020d',
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id)), 4) AS close,
             |  CAST(count(*) AS BIGINT) AS n_ticks
             |FROM events GROUP BY event_type, day
             |ORDER BY event_type, day""".stripMargin)),

    // ClickHouse maxIntersections/maxIntersectionsPosition ([CH]): the
    // maximum number of simultaneously-open intervals, and the first
    // instant it is reached. Sweep-line: each interval contributes
    // (+1 at start, −1 at end) — a row-local 2-element explode — then
    // a hash aggregate collapses the deltas to the DISTINCT-DATE grid
    // before the running-sum window. The global window therefore sees
    // O(distinct dates) rows (the time domain), not O(orders): at any
    // scale the sort input is a few thousand rows. The argmax is a
    // broadcast of the 1-row max back onto the grid.
    "q_agg_max_intersections" -> QueryDef(
      (s, dir) => maxIntersections(intervals(Tables(s, dir, "orders"))),
      Some("""WITH iv AS (
             |  SELECT o_orderdate AS s,
             |    o_orderdate + INTERVAL (CAST(o_orderkey % 30 AS INT) + 1) DAY AS e
             |  FROM orders),
             |deltas AS (
             |  SELECT d, sum(x) AS dx FROM (
             |    SELECT s AS d, 1 AS x FROM iv
             |    UNION ALL
             |    SELECT e AS d, -1 AS x FROM iv) u
             |  GROUP BY d),
             |run AS (
             |  SELECT d, sum(dx) OVER (ORDER BY d) AS conc FROM deltas)
             |SELECT CAST(max(conc) AS BIGINT) AS max_concurrent,
             |  min(d) FILTER (WHERE conc = (SELECT max(conc) FROM run)) AS at_ts
             |FROM run""".stripMargin)),

    // Interval coalescing ([NS] — the islands problem): merge each
    // customer's overlapping order intervals, report islands and
    // covered days. Classic gaps-and-islands: a running max of prior
    // interval ends (ROWS … 1 PRECEDING) flags island starts, a
    // running sum numbers them, one hash aggregate merges. Both
    // windows partition on the customer key — parallelism = customers,
    // and a customer's interval list is activity-bounded. First row's
    // flag: st > NULL is NULL → 0 on both engines (islands 0-based).
    "q_interval_merge" -> QueryDef(
      (s, dir) => mergeIslands(intervals(Tables(s, dir, "orders")),
          "o_custkey", "o_orderkey")
        .orderBy("o_custkey"),
      Some("""WITH iv AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate AS s,
             |    o_orderdate + INTERVAL (CAST(o_orderkey % 30 AS INT) + 1) DAY AS e
             |  FROM orders),
             |flag AS (
             |  SELECT o_custkey, s, e,
             |    CASE WHEN s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS new_island
             |  FROM iv),
             |isl AS (
             |  SELECT o_custkey, s, e,
             |    sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e) AS island
             |  FROM flag),
             |merged AS (
             |  SELECT o_custkey, island, min(s) AS ms, max(e) AS me
             |  FROM isl GROUP BY o_custkey, island)
             |SELECT o_custkey,
             |  CAST(count(*) AS BIGINT) AS n_islands,
             |  CAST(sum(date_diff('day', ms, me)) AS BIGINT) AS covered_days
             |FROM merged GROUP BY o_custkey
             |ORDER BY o_custkey""".stripMargin)),

    // ClickHouse `TTL … GROUP BY` ([CH]): age-based rollup — rows
    // older than the TTL collapse into per-(key, day) aggregates while
    // recent rows stay raw, in one dataset. The cutoff anchors on
    // max(ts) (deterministic from the data, the q_retention_filter
    // pattern) and broadcasts; the old side is one map-side-combined
    // hash aggregate; the recent side is a filter — at 100 TB this is
    // THE storage-bend: history shrinks to the key×day domain without
    // losing recent-row fidelity.
    // ClickHouse `sparkbar(8)` ([CH] viz aggregate — the monitoring
    // one-liner every ops dashboard runs): per event type, an 8-bin
    // Unicode sparkline of daily volume. The fact table collapses to
    // the (type × day) grid FIRST (one map-side-combined hash agg);
    // everything after — global extent broadcast, binning, the
    // (type × 8) densified grid, per-type max window, glyph mapping,
    // ordered string fold — runs over bounded grid rows, never events.
    // Integer arithmetic end-to-end (`div`), so both engines pick
    // identical glyphs: no FP rounding can flip a bar.
    "q_sparkbar" -> QueryDef(
      (s, dir) => {
        val nb = 8
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")), to_date(lit("2024-01-01")))
              .cast("long").as("d"))
          .agg(count(lit(1)).as("cnt"))
          // MATERIALIZED: (type, day) grid feeds ext + the binning —
          // un-checkpointed, events re-scanned per consumer (r15 plan
          // audit: 4 scans → 1). Day-grid scale.
          .localCheckpoint()
        val ext = ser.agg(min("d").as("d0"), max("d").as("d1"))
        val binned = ser.crossJoin(broadcast(ext))
          .select(col("event_type"),
            least(lit((nb - 1).toLong), expr(s"(d - d0) * $nb div (d1 - d0 + 1)")).as("bin"),
            col("cnt"))
          .groupBy("event_type", "bin").agg(sum("cnt").as("cnt"))
        val grid = binned.select("event_type").distinct()
          .select(col("event_type"),
            explode(sequence(lit(0L), lit((nb - 1).toLong))).as("bin"))
          .join(binned, Seq("event_type", "bin"), "left_outer")
          .na.fill(0L, Seq("cnt"))
        val chars = array(Seq("▁", "▂", "▃", "▄", "▅", "▆", "▇", "█").map(lit): _*)
        grid
          .withColumn("mx", max("cnt").over(Window.partitionBy("event_type")))
          .withColumn("ch", element_at(chars, (expr("cnt * 7 div mx") + 1).cast("int")))
          .groupBy("event_type")
          .agg(expr("array_join(transform(array_sort(collect_list(struct(bin, ch))), x -> x.ch), '')")
              .as("bar"),
            max("cnt").as("max_bin"),
            sum("cnt").as("n_events"))
          .orderBy("event_type")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |         date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS d,
             |         count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |ext AS (SELECT min(d) AS d0, max(d) AS d1 FROM ser),
             |binned AS (
             |  SELECT event_type, least(7, ((d - d0) * 8) // (d1 - d0 + 1)) AS bin,
             |         sum(cnt) AS cnt
             |  FROM ser, ext GROUP BY 1, 2),
             |grid AS (
             |  SELECT t.event_type, g.bin, coalesce(b.cnt, 0) AS cnt
             |  FROM (SELECT DISTINCT event_type FROM ser) t
             |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) g
             |  LEFT JOIN binned b ON b.event_type = t.event_type AND b.bin = g.bin),
             |lev AS (
             |  SELECT event_type, bin, cnt,
             |         max(cnt) OVER (PARTITION BY event_type) AS mx FROM grid)
             |SELECT event_type,
             |  string_agg(['▁','▂','▃','▄','▅','▆','▇','█'][CAST(cnt * 7 // mx AS INT) + 1],
             |             '' ORDER BY bin) AS bar,
             |  CAST(max(cnt) AS BIGINT) AS max_bin,
             |  CAST(sum(cnt) AS BIGINT) AS n_events
             |FROM lev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q_ttl_rollup" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_s"),
            col("event_id"), col("value"))
        val mx = e.agg(max("ts_s").as("m"))
        val withM = e.crossJoin(broadcast(mx))
        val recent = withM
          .filter(col("ts_s") > col("m") - expr("INTERVAL 7 DAYS"))
          .select(lit("raw").as("kind"), col("user_id"), col("event_type"),
            date_trunc("day", col("ts_s")).as("bucket_day"),
            col("event_id"), lit(1L).as("n_rows"),
            round(col("value"), 4).as("sum_value"))
        val rolled = withM
          .filter(col("ts_s") <= col("m") - expr("INTERVAL 7 DAYS"))
          .groupBy(col("user_id"), col("event_type"),
            date_trunc("day", col("ts_s")).as("bucket_day"))
          .agg(count(lit(1)).as("n_rows"), round(sum("value"), 4).as("sum_value"))
          .select(lit("rolled").as("kind"), col("user_id"), col("event_type"),
            col("bucket_day"), lit(null).cast("long").as("event_id"),
            col("n_rows"), col("sum_value"))
        recent.unionByName(rolled)
          .orderBy("kind", "user_id", "event_type", "bucket_day", "event_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s, event_id, value
             |  FROM events),
             |mx AS (SELECT max(ts_s) AS m FROM e),
             |recent AS (
             |  SELECT 'raw' AS kind, user_id, event_type,
             |    CAST(date_trunc('day', ts_s) AS TIMESTAMP) AS bucket_day,
             |    event_id, CAST(1 AS BIGINT) AS n_rows, round(value, 4) AS sum_value
             |  FROM e, mx WHERE ts_s > m - INTERVAL 7 DAY),
             |old AS (
             |  SELECT 'rolled' AS kind, user_id, event_type,
             |    CAST(date_trunc('day', ts_s) AS TIMESTAMP) AS bucket_day,
             |    CAST(NULL AS BIGINT) AS event_id, CAST(count(*) AS BIGINT) AS n_rows,
             |    round(sum(value), 4) AS sum_value
             |  FROM e, mx WHERE ts_s <= m - INTERVAL 7 DAY
             |  GROUP BY user_id, event_type, date_trunc('day', ts_s))
             |SELECT * FROM recent UNION ALL SELECT * FROM old
             |ORDER BY kind, user_id, event_type, bucket_day, event_id""".stripMargin)),

    // Largest-Triangle-Three-Buckets downsampling ([NS] — Steinarsson
    // 2013, the standard time-series visual-decimation algorithm;
    // ClickHouse ships it as largestTriangleThreeBuckets). This is the
    // FIXED-ANCHOR variant: each middle bucket keeps the point whose
    // triangle with the NEIGHBOR BUCKET AVERAGES is largest (canonical
    // LTTB anchors on the previously-selected point — a sequential
    // dependency no engine-parallel form can express; the fixed-anchor
    // variant is deterministic, order-free, and SQL-expressible, so
    // the oracle can replay it exactly). Series = daily event counts:
    // the fact table collapses to the day grid first; every window /
    // join after that runs over ≤ a few thousand grid rows (the time
    // domain), and the 8-row anchor table broadcasts. x and y are
    // integer-valued, so bucket averages are exact rationals —
    // identical doubles on both engines, no rounding hazard in the
    // argmax.
    "q_win_lttb" -> QueryDef(
      (s, dir) => {
        val nb = 8
        // ser is MATERIALIZED: the day-grid series (≤ a few hundred
        // rows at any scale) feeds ext, the bucket assignment, the
        // anchors union and the area join — un-checkpointed, Catalyst
        // replicated the full events scan+aggregate per consumer (r15
        // plan audit: 12 scans of events → 1). Guide §2.4.
        val ser = Relational.eventsSec(s, dir)
          .groupBy(datediff(date_trunc("day", col("ts_s")),
            to_date(lit("2024-01-01"))).cast("double").as("x"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint()
        val ext = ser.agg(min("x").as("x0"), max("x").as("x1"))
        val bkt = ser.crossJoin(broadcast(ext))
          .withColumn("b",
            when(col("x") === col("x0") || col("x") === col("x1"), lit(-1))
              .otherwise(least(
                floor((col("x") - col("x0")) / ((col("x1") - col("x0")) / nb.toDouble)),
                lit(nb - 1))).cast("int"))
        val mids = bkt.filter(col("b") >= 0)
        val ends = bkt.filter(col("b") === -1)
        val anchors = mids.groupBy("b")
          .agg(avg("x").as("ax"), avg("y").as("ay"))
          .unionByName(ends.select(
            when(col("x") === col("x0"), lit(-1)).otherwise(lit(nb)).as("b"),
            col("x").as("ax"), col("y").as("ay")))
        val prev = anchors.select((col("b") + 1).as("pb"), col("ax").as("px"), col("ay").as("py"))
        val nxt = anchors.select((col("b") - 1).as("qb"), col("ax").as("qx"), col("ay").as("qy"))
        val area = mids
          .join(broadcast(prev), col("b") === col("pb"))
          .join(broadcast(nxt), col("b") === col("qb"))
          .withColumn("a",
            abs((col("px") - col("qx")) * (col("y") - col("py"))
              - (col("px") - col("x")) * (col("qy") - col("py"))) / 2)
        val picked = area
          .withColumn("rn", row_number().over(
            Window.partitionBy("b").orderBy(col("a").desc, col("x"))))
          .filter(col("rn") === 1)
          .select(col("b").cast("long").as("bucket"),
            col("x").as("day_x"), col("y").as("n_events"))
        picked
          .unionByName(ends.select(lit(-1L).as("bucket"),
            col("x").as("day_x"), col("y").as("n_events")))
          .orderBy("day_x")
      },
      Some("""WITH ser AS (
             |  SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS DOUBLE) AS x,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1),
             |ext AS (SELECT min(x) AS x0, max(x) AS x1 FROM ser),
             |bkt AS (
             |  SELECT x, y, x0, x1,
             |    CASE WHEN x = x0 OR x = x1 THEN -1
             |      ELSE least(CAST(floor((x - x0) / ((x1 - x0) / 8.0)) AS INT), 7) END AS b
             |  FROM ser, ext),
             |anchors AS (
             |  SELECT b, avg(x) AS ax, avg(y) AS ay FROM bkt WHERE b >= 0 GROUP BY b
             |  UNION ALL
             |  SELECT CASE WHEN x = x0 THEN -1 ELSE 8 END, x, y FROM bkt WHERE b = -1),
             |area AS (
             |  SELECT k.b, k.x, k.y,
             |    abs((p.ax - n.ax) * (k.y - p.ay) - (p.ax - k.x) * (n.ay - p.ay)) / 2 AS a
             |  FROM bkt k
             |  JOIN anchors p ON p.b = k.b - 1
             |  JOIN anchors n ON n.b = k.b + 1
             |  WHERE k.b >= 0),
             |pick AS (
             |  SELECT b, x, y, row_number() OVER (PARTITION BY b ORDER BY a DESC, x) AS rn
             |  FROM area)
             |SELECT CAST(b AS BIGINT) AS bucket, x AS day_x, y AS n_events
             |FROM pick WHERE rn = 1
             |UNION ALL
             |SELECT -1, x, y FROM bkt WHERE b = -1
             |ORDER BY day_x""".stripMargin)),

    // Pareto / ABC cumulative-share report ([NS]): customers ranked by
    // revenue, bucketed by cumulative share (A: first 50 %, B: to
    // 80 %, C: tail), reported per class. The fact table collapses to
    // the one-row-per-customer revenue grid FIRST (map-side-combined
    // hash aggregate); the running share is then a DISTRIBUTED
    // two-pass cumsum over that grid (DistRank: range repartition on
    // (rev desc, custkey), per-partition running sums offset by the
    // per-partition totals) — an empty-partitionBy window would drag
    // every customer (hundreds of millions at 100×) through ONE task.
    // Revenue runs in integer CENTS end-to-end, so the running sum and
    // the 50 %/80 % class cuts (2·cum ≤ tot, 5·cum ≤ 4·tot) are exact
    // integer arithmetic on both engines — no float association
    // anywhere near a class boundary. Ties cannot occur in the
    // cumulative order: the key includes the unique customer key.
    "q_win_cum_share" -> QueryDef(
      (s, dir) => {
        val rev = Tables(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(round(sum("o_totalprice") * 100, 0).cast("long").as("cents"))
        val share = DistRank.withRunningSum(rev,
            Seq(col("cents").desc, col("o_custkey").asc), "pos",
            valueCol = "cents", cumCol = "cum", totalSumCol = Some("tot"))
          .withColumn("cls",
            when(col("cum") * 2 <= col("tot"), "A")
              .when(col("cum") * 5 <= col("tot") * 4, "B")
              .otherwise("C"))
        share.groupBy("cls")
          .agg(count(lit(1)).as("n_customers"),
            round(sum("cents") / 100.0, 2).as("class_rev"))
          .orderBy("cls")
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey,
             |    CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS cents
             |  FROM orders GROUP BY o_custkey),
             |rk AS (
             |  SELECT o_custkey, cents,
             |    sum(cents) OVER (ORDER BY cents DESC, o_custkey) AS cum,
             |    sum(cents) OVER () AS tot
             |  FROM rev)
             |SELECT CASE WHEN cum * 2 <= tot THEN 'A'
             |            WHEN cum * 5 <= tot * 4 THEN 'B' ELSE 'C' END AS cls,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  round(sum(cents) / 100.0, 2) AS class_rev
             |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Classical seasonal decomposition ([CH] `seriesDecomposeSTL`'s
    // job, in the Cleveland et al. 1990 moving-average form the
    // fixture's short series actually supports): per event type,
    // trend = centered 7-day moving average (RANGE frame over the
    // DAY INDEX, so calendar gaps don't slide the window), seasonal =
    // day-of-week mean of the detrended series (dow as pure d % 7
    // arithmetic — engine day-numbering conventions differ, integers
    // don't), residual = remainder. The fact table collapses to the
    // (type × day) grid FIRST (one map-side-combined aggregate); both
    // windows then run over the GRID, partitioned by type and bounded
    // by the calendar — never by data volume (the "window over the
    // grid" rule). Trend averages ≤7 exact integer counts (exact in
    // double); seasonal/residual carry the 1e-9 round nudge for
    // cross-engine float association.
    "q_series_decompose" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val wTrend = Window.partitionBy("event_type").orderBy("d")
          .rangeBetween(-3, 3)
        val wSeason = Window.partitionBy(col("event_type"),
          pmod(col("d"), lit(7)))
        ser
          .withColumn("trend", avg("y").over(wTrend))
          .withColumn("seasonal", avg(col("y") - col("trend")).over(wSeason))
          .select(col("event_type"), col("d"), col("y").cast("long").as("y"),
            round(col("trend") + 1e-9, 4).as("trend"),
            round(col("seasonal") + 1e-9, 4).as("seasonal"),
            round(col("y") - col("trend") - col("seasonal") + 1e-9, 4)
              .as("resid"))
          .orderBy("event_type", "d")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |tr AS (
             |  SELECT event_type, d, y,
             |    avg(y) OVER (PARTITION BY event_type ORDER BY d
             |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
             |  FROM ser),
             |se AS (
             |  SELECT event_type, d, y, trend,
             |    avg(y - trend) OVER (PARTITION BY event_type, (d % 7 + 7) % 7)
             |      AS seasonal
             |  FROM tr)
             |SELECT event_type, d, CAST(y AS BIGINT) AS y,
             |  round(trend + 1e-9, 4) AS trend,
             |  round(seasonal + 1e-9, 4) AS seasonal,
             |  round(y - trend - seasonal + 1e-9, 4) AS resid
             |FROM se ORDER BY event_type, d""".stripMargin)),

    // Autocorrelation function ([CH] — the period detector behind
    // `seriesPeriodDetectFFT`'s use cases, in the direct Pearson form
    // the series length supports): per event type, corr(y_t, y_{t−k})
    // for lags 1..7 over the daily-count series. A weekly cycle shows
    // up as an ACF peak at lag 7. The series collapses to the
    // (type × day) grid first; the lag alignment is a grid-to-grid
    // equi-join on (type, d−k) — 7 lag copies of a calendar-bounded
    // grid, never the raw events. Pearson corr is
    // normalization-invariant (population/sample cancels), so both
    // engines agree to float association, absorbed by the 1e-9 round.
    "q_autocorr" -> QueryDef(
      (s, dir) => {
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val lagged = ser.select(col("event_type"), col("d"), col("y"),
          explode(sequence(lit(1L), lit(7L))).as("lag"))
        val prior = ser.select(col("event_type").as("pt"),
          col("d").as("pd"), col("y").as("py"))
        lagged
          .join(prior, col("event_type") === col("pt") &&
            col("d") - col("lag") === col("pd"))
          .groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n_pairs"),
            round(corr("y", "py") + 1e-9, 4).as("acf"))
          .orderBy("event_type", "lag")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |lags AS (SELECT unnest(range(1, 8)) AS lag)
             |SELECT c.event_type, CAST(l.lag AS BIGINT) AS lag,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  round(corr(c.y, p.y) + 1e-9, 4) AS acf
             |FROM ser c CROSS JOIN lags l
             |JOIN ser p ON p.event_type = c.event_type AND p.d = c.d - l.lag
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Dominant-period detection via an exact DFT scan ([CH]
    // `seriesPeriodDetectFFT`): per event type, evaluate the discrete
    // Fourier magnitude at k = 1..12 cycles over the daily-count
    // series and report the arg-max frequency as N/k days. An FFT's
    // O(N log N) butterfly only matters when N is the data; here N is
    // the DAY GRID (the series length), so the O(N·K) direct sums are
    // grid×12 rows — and unlike a butterfly they are plain aggregates
    // Spark executes map-side-combined with no cross-row recursion.
    // Missing days contribute exactly 0 to every sum, so the observed
    // (d, y) rows ARE the full-grid DFT. Arg-max ranks the ROUNDED
    // magnitude (k ascending on ties) so libm cos/sin ulp drift can't
    // flip the winner between engines.
    "q_series_period" -> QueryDef(
      (s, dir) => {
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val n = ser.groupBy(col("event_type").as("nt"))
          .agg((max("d") + 1).cast("double").as("n_days"))
        val terms = ser
          .join(broadcast(n), col("event_type") === col("nt"))
          .select(col("event_type"), col("d"), col("y"), col("n_days"),
            explode(sequence(lit(1L), lit(12L))).as("k"))
          .withColumn("ang",
            lit(2.0 * math.Pi) * col("k") * col("d") / col("n_days"))
        val mags = terms
          .groupBy("event_type", "k")
          .agg(first("n_days").as("n_days"),
            sum(col("y") * cos(col("ang"))).as("re"),
            sum(col("y") * sin(col("ang"))).as("im"))
          .withColumn("mag", round(
            sqrt(col("re") * col("re") + col("im") * col("im")) + 1e-9, 4))
        val w = Window.partitionBy("event_type")
          .orderBy(col("mag").desc, col("k").asc)
        mags.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("k").as("best_k"),
            round(col("n_days") / col("k") + 1e-9, 4).as("period_days"),
            col("mag"), col("n_days").cast("long").as("n_days"))
          .orderBy("event_type")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01',
             |      date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |n AS (
             |  SELECT event_type, CAST(max(d) + 1 AS DOUBLE) AS n_days
             |  FROM ser GROUP BY event_type),
             |sums AS (
             |  SELECT ser.event_type, k, any_value(n_days) AS n_days,
             |    sum(y * cos(2 * pi() * k * d / n_days)) AS re,
             |    sum(y * sin(2 * pi() * k * d / n_days)) AS im
             |  FROM ser JOIN n USING (event_type)
             |  CROSS JOIN (SELECT unnest(range(1, 13)) AS k) ks
             |  GROUP BY ser.event_type, k),
             |mags AS (
             |  SELECT event_type, k, n_days,
             |    round(sqrt(re * re + im * im) + 1e-9, 4) AS mag
             |  FROM sums)
             |SELECT event_type, CAST(k AS BIGINT) AS best_k,
             |  round(n_days / k + 1e-9, 4) AS period_days, mag,
             |  CAST(n_days AS BIGINT) AS n_days
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY mag DESC, k ASC) AS rn
             |  FROM mags)
             |WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // Tukey-fence outlier detection over a series ([CH]
    // `seriesOutliersDetectTukey`): per event type, flag days whose
    // count falls outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. Quartiles are
    // the EXACT linear-interpolation kind (the q_agg_percentile
    // convention — Spark `percentile` ≡ DuckDB `quantile_cont`), so
    // over integer counts the fences land on exact 0.125-step doubles
    // and the strict comparisons agree bit-for-bit with no epsilon.
    // Every grid point is emitted with its flag (the CH function
    // returns a per-point score array) — a 1-row outlier set would
    // make the hash check nearly vacuous. Shape: collapse to the
    // (type × day) grid, ONE grid-bounded aggregate for the fences
    // per type (tiny — broadcast joins back), then a row-local flag
    // over the grid. Nothing data-scale crosses a window.
    "q_tukey_outliers" -> QueryDef(
      (s, dir) => {
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val fences = ser.groupBy("event_type")
          .agg(expr("percentile(y, 0.25)").as("q1"),
            expr("percentile(y, 0.75)").as("q3"))
          .select(col("event_type").as("ft"),
            (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
            (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
        ser.join(broadcast(fences), col("event_type") === col("ft"))
          .select(col("event_type"), col("d"), col("y").cast("long").as("y"),
            round(col("lo"), 4).as("fence_lo"),
            round(col("hi"), 4).as("fence_hi"),
            (col("y") < col("lo") || col("y") > col("hi")).as("is_outlier"))
          .orderBy("event_type", "d")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |f AS (
             |  SELECT event_type AS ft,
             |    quantile_cont(y, 0.25) - (quantile_cont(y, 0.75) - quantile_cont(y, 0.25)) * 1.5 AS lo,
             |    quantile_cont(y, 0.75) + (quantile_cont(y, 0.75) - quantile_cont(y, 0.25)) * 1.5 AS hi
             |  FROM ser GROUP BY 1)
             |SELECT event_type, d, CAST(y AS BIGINT) AS y,
             |  round(lo, 4) AS fence_lo, round(hi, 4) AS fence_hi,
             |  (y < lo OR y > hi) AS is_outlier
             |FROM ser JOIN f ON event_type = ft
             |ORDER BY event_type, d""".stripMargin)),

    // CUSUM change-point detection (Page 1954) — the sequential
    // drift monitor behind data-quality alerting: per event type, the
    // one-sided cumulative-sum statistic S_i = max(0, S_{i-1} + (x_i −
    // μ − slack)) with an alarm when S crosses h. The recurrence looks
    // inherently sequential, but S_i ≡ prefix_i − min(0, min_{j≤i}
    // prefix_j) (a running sum minus its running minimum), so the
    // whole detector is TWO shared-sort window passes per type — no
    // iteration, no state, one shuffle on the series key; at 100 TB
    // each series scans independently and only the 5-row per-type
    // summary crosses to the result. A deterministic level shift
    // (+25 from day 20, the q_pii_scrub injection discipline) gives
    // the detector a real change to find on both engines. Determinism:
    // everything after the rounded per-type mean runs in EXACT integer
    // cents — round((x − μ_r − slack)·100) is a 2-decimal-exact
    // integer, the window sums/mins are BIGINT, and the alarm
    // comparison cusum > h is integer-vs-integer, so the flag surface
    // is bit-identical across engines (no epsilon anywhere); the first
    // alarm is picked by the zero-padded (ts, id) composite-key min
    // (the q_agg_ohlc move).
    "q_changepoint" -> QueryDef(
      (s, dir) => {
        val shifted = Relational.eventsSec(s, dir)
          .select(col("event_type"), col("ts_s"), col("event_id"),
            (col("value") + when(datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))) >= 20, lit(25.0)).otherwise(lit(0.0)))
              .as("x"))
        val mu = shifted.groupBy(col("event_type").as("mt"))
          .agg(round(avg(col("x")) + lit(1e-9), 2).as("mu_r"))
        val w = Window.partitionBy("event_type").orderBy("ts_s", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dev = shifted.join(broadcast(mu), col("event_type") === col("mt"))
          .select(col("event_type"), col("ts_s"), col("event_id"),
            round((col("x") - col("mu_r") - lit(2.0)) * 100, 0).cast("long")
              .as("dev_c"))
        val cusum = dev
          .withColumn("prefix", sum(col("dev_c")).over(w))
          .withColumn("cusum_c",
            col("prefix") - least(lit(0L), min(col("prefix")).over(w)))
        cusum.groupBy("event_type")
          .agg(count(lit(1)).as("n_points"),
            sum(when(col("cusum_c") > 50000L, 1L).otherwise(0L)).as("n_alarm"),
            round(max(col("cusum_c")) / 100.0, 2).as("max_cusum"),
            min(when(col("cusum_c") > 50000L,
              format_string("%020d|%020d", unix_timestamp(col("ts_s")),
                col("event_id")))).as("fk"))
          .select(col("event_type"), col("n_points"), col("n_alarm"),
            col("max_cusum"),
            substring_index(col("fk"), "|", -1).cast("long").as("first_alarm_id"))
          .orderBy("event_type")
      },
      Some("""WITH sh AS (
             |  SELECT event_type, date_trunc('second', ts) AS ts_s, event_id,
             |    value + CASE WHEN date_diff('day', TIMESTAMP '2024-01-01',
             |      date_trunc('day', ts)) >= 20 THEN 25.0 ELSE 0.0 END AS x
             |  FROM events),
             |mu AS (
             |  SELECT event_type AS mt, round(avg(x) + 1e-9, 2) AS mu_r
             |  FROM sh GROUP BY 1),
             |dev AS (
             |  SELECT event_type, ts_s, event_id,
             |    CAST(round((x - mu_r - 2.0) * 100, 0) AS BIGINT) AS dev_c
             |  FROM sh JOIN mu ON event_type = mt),
             |pre AS (
             |  SELECT event_type, ts_s, event_id,
             |    CAST(sum(dev_c) OVER w AS BIGINT) AS prefix
             |  FROM dev
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_s, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |cs AS (
             |  SELECT event_type, ts_s, event_id,
             |    prefix - least(CAST(0 AS BIGINT), min(prefix) OVER w2) AS cusum_c
             |  FROM pre
             |  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts_s, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
             |  CAST(sum(CASE WHEN cusum_c > 50000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_alarm,
             |  round(max(cusum_c) / 100.0, 2) AS max_cusum,
             |  CAST(string_split(min(CASE WHEN cusum_c > 50000 THEN
             |      printf('%020d|%020d', CAST(epoch(ts_s) AS BIGINT), event_id)
             |    END), '|')[2] AS BIGINT) AS first_alarm_id
             |FROM cs GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Holt linear-trend exponential smoothing ([CH] — the forecasting
    // job behind `seriesDecomposeSTL`'s sibling use cases; Holt 1957):
    // per event type, fold level/trend state over the DAILY-COUNT
    // series (l' = α·y + (1−α)(l+b); b' = β(l'−l) + (1−β)b, α=0.3,
    // β=0.2, seeded l₁=y₁, b₁=0) and emit the fitted end state plus
    // 1- and 7-day-ahead forecasts. Shape: the fact table collapses
    // to the (type × day) grid FIRST (one map-side-combined
    // aggregate); the "inherently sequential" recurrence then runs as
    // a row-local `aggregate()` HOF fold over the calendar-bounded
    // per-type day array (≤ the calendar span, never O(rows)) — at
    // 100 TB each type's fold touches one array built from grid rows,
    // and only the 5-row summary leaves the workers. Determinism: the
    // series is exact integer counts in double, the fold is the SAME
    // written-out arithmetic on both engines (the recurrence
    // duplicates the l' expression inside b' rather than binding it,
    // so the operation sequence is textually identical), and DuckDB
    // replays it with list_reduce over [l, b] pairs (list_prepend
    // supplies the seed — the q_multimodal_content pattern); final
    // doubles carry the 1e-9 round nudge.
    "q_series_forecast" -> QueryDef(
      (s, dir) => {
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val st = aggregate(
          slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
          array(element_at(col("vs"), 1), lit(0.0)),
          (acc, x) => {
            val l = element_at(acc, 1)
            val b = element_at(acc, 2)
            array(lit(0.3) * x + lit(0.7) * (l + b),
              lit(0.2) * ((lit(0.3) * x + lit(0.7) * (l + b)) - l) +
                lit(0.8) * b)
          })
        ser.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sort_array(collect_list(struct(col("d"), col("y")))).as("sv"))
          .withColumn("vs", transform(col("sv"), p => p.getField("y")))
          .withColumn("st", st)
          .select(col("event_type"), col("n_days"),
            round(element_at(col("st"), 1) + 1e-9, 4).as("level"),
            round(element_at(col("st"), 2) + 1e-9, 4).as("trend"),
            round(element_at(col("st"), 1) +
              lit(1.0) * element_at(col("st"), 2) + 1e-9, 4).as("fc_1"),
            round(element_at(col("st"), 1) +
              lit(7.0) * element_at(col("st"), 2) + 1e-9, 4).as("fc_7"))
          .orderBy("event_type")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01',
             |      date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |arr AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |    list(y ORDER BY d) AS vs
             |  FROM ser GROUP BY 1),
             |fold AS (
             |  SELECT event_type, n_days,
             |    list_reduce(
             |      list_prepend([vs[1], 0.0],
             |        list_transform(vs[2:], x -> [x, 0.0])),
             |      (acc, e) -> [0.3 * e[1] + 0.7 * (acc[1] + acc[2]),
             |        0.2 * ((0.3 * e[1] + 0.7 * (acc[1] + acc[2])) - acc[1])
             |          + 0.8 * acc[2]]) AS st
             |  FROM arr)
             |SELECT event_type, n_days,
             |  round(st[1] + 1e-9, 4) AS level,
             |  round(st[2] + 1e-9, 4) AS trend,
             |  round(st[1] + 1.0 * st[2] + 1e-9, 4) AS fc_1,
             |  round(st[1] + 7.0 * st[2] + 1e-9, 4) AS fc_7
             |FROM fold ORDER BY event_type""".stripMargin)),

    // Winsorized statistics — clip to [p05, p95] then aggregate, the
    // robust-mean preprocessing step feature pipelines apply before
    // z-scoring (q_tukey_outliers FLAGS outliers; this REPLACES them).
    // Shape: everything runs on the per-type VALUE GRID (distinct
    // 2-decimal values + counts — the q_agg_percentile discipline), so
    // the percentile buffer, the broadcast fences, and the winsorized
    // re-aggregate are all value-domain-bounded, never O(rows).
    // Boundary safety: a clip comparison could only disagree across
    // engines if an interpolated fence collided with a grid value
    // within 1 ulp — but when the interpolation straddles two distinct
    // grid points the fence sits ≥0.01/2 away from both, and when the
    // adjacent order stats coincide both engines produce that exact
    // grid double, so `value < lo` is engine-stable either way.
    "q_winsorize" -> QueryDef(
      (s, dir) => {
        val grid = Relational.eventsSec(s, dir)
          .groupBy("event_type", "value").agg(count(lit(1)).as("c"))
        val fences = grid.groupBy("event_type")
          .agg(expr("percentile(value, 0.05D, c)").as("lo"),
            expr("percentile(value, 0.95D, c)").as("hi"))
          .select(col("event_type").as("ft"), col("lo"), col("hi"))
        grid.join(broadcast(fences), col("event_type") === col("ft"))
          .select(col("event_type"), col("c"), col("lo"), col("hi"),
            when(col("value") < col("lo"), col("lo"))
              .when(col("value") > col("hi"), col("hi"))
              .otherwise(col("value")).as("wv"),
            (col("value") < col("lo")).as("clip_lo"),
            (col("value") > col("hi")).as("clip_hi"))
          .groupBy("event_type")
          .agg(sum(col("c")).as("n"),
            round(sum(col("wv") * col("c")) / sum(col("c")) + lit(1e-9), 4)
              .as("wins_mean"),
            sum(when(col("clip_lo"), col("c")).otherwise(lit(0L))).as("n_clip_lo"),
            sum(when(col("clip_hi"), col("c")).otherwise(lit(0L))).as("n_clip_hi"),
            round(min(col("lo")), 4).as("p05"),
            round(min(col("hi")), 4).as("p95"))
          .orderBy("event_type")
      },
      Some("""WITH f AS (
             |  SELECT event_type AS ft,
             |    quantile_cont(value, 0.05) AS lo,
             |    quantile_cont(value, 0.95) AS hi
             |  FROM events GROUP BY 1),
             |w AS (
             |  SELECT event_type, lo, hi,
             |    CASE WHEN value < lo THEN lo WHEN value > hi THEN hi
             |      ELSE value END AS wv,
             |    (value < lo) AS clip_lo, (value > hi) AS clip_hi
             |  FROM events JOIN f ON event_type = ft)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(wv) / count(*) + 1e-9, 4) AS wins_mean,
             |  CAST(sum(CASE WHEN clip_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             |  CAST(sum(CASE WHEN clip_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
             |  round(min(lo), 4) AS p05, round(min(hi), 4) AS p95
             |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Rolling 7-day OLS trend of each type's daily count series — the
    // windowed regression slope monitoring dashboards plot (ClickHouse
    // `simpleLinearRegression` over a moving frame). Closed form from
    // five shared-frame window sums (n, Σd, Σy, Σdy, Σd²) on a RANGE
    // frame over the day index (calendar gaps don't slide the frame —
    // the q_series_decompose discipline). d and y are integers, so
    // every sum is EXACT integer arithmetic in doubles and the slope
    // is one identical division on both engines; n>1 on distinct day
    // keys guarantees a nonzero denominator. One shuffle on type; the
    // window runs over the (type × day) grid, never the events.
    "q_win_rolling_slope" -> QueryDef(
      (s, dir) => {
        val ser = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts_s")),
              to_date(lit("2024-01-01"))).cast("long").as("d"))
          .agg(count(lit(1)).cast("double").as("y"))
        val w = Window.partitionBy("event_type").orderBy("d")
          .rangeBetween(-6, 0)
        val dd = col("d").cast("double")
        ser
          .withColumn("n", count(lit(1)).over(w).cast("double"))
          .withColumn("sd", sum(dd).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sdy", sum(dd * col("y")).over(w))
          .withColumn("sd2", sum(dd * dd).over(w))
          .select(col("event_type"), col("d"), col("y").cast("long").as("y"),
            when(col("n") > 1,
              round((col("n") * col("sdy") - col("sd") * col("sy")) /
                (col("n") * col("sd2") - col("sd") * col("sd")) + lit(1e-9), 4))
              .as("slope_7d"))
          .orderBy("event_type", "d")
      },
      Some("""WITH ser AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS d,
             |    CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |f AS (
             |  SELECT event_type, d, y,
             |    CAST(count(*) OVER w AS DOUBLE) AS n,
             |    sum(CAST(d AS DOUBLE)) OVER w AS sd,
             |    sum(y) OVER w AS sy,
             |    sum(CAST(d AS DOUBLE) * y) OVER w AS sdy,
             |    sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) OVER w AS sd2
             |  FROM ser
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT event_type, d, CAST(y AS BIGINT) AS y,
             |  CASE WHEN n > 1 THEN
             |    round((n * sdy - sd * sy) / (n * sd2 - sd * sd) + 1e-9, 4)
             |  END AS slope_7d
             |FROM f ORDER BY event_type, d""".stripMargin)))
}
