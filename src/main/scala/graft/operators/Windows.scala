package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E (window functions) + §2.F (sorts/limits/top-k).
  *
  * [R] seeds: the per-(db, tier) "latest" pointer (backup.sh:99–115) is
  * rank-1-by-recency; retention is a keep-K-newest view of GC
  * (backup.sh:119–122).
  *
  * Scale notes: a window shuffles once on its partition keys; per-group
  * top-k (row_number ≤ k then filter) never materializes a global sort.
  * Global top-k uses orderBy+limit, which Spark plans as
  * TakeOrderedAndProject — per-partition heaps + driver merge of k
  * rows, O(k) driver memory at any input size. Ordering always uses the
  * second-truncated ts with an id tie-break so ranks are deterministic
  * and identical across engines (ns/µs hazard, SURVEY.md §5.3.3).
  */
object Windows extends QueryModule {

  def entries: Map[String, QueryDef] = Map(

    // Latest pointer per (db≈event_type, day bucket) — backup.sh:99–115.
    "q_retention_keep_last" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .withColumn("day_key", Retention.bucketDay(col("ts_s")))
        Retention.latest(e, Seq(col("event_type"), col("day_key")), col("ts_s"), col("event_id"))
          .select("event_type", "day_key", "event_id")
          .orderBy("event_type", "day_key")
      },
      Some("""SELECT event_type, strftime(date_trunc('second', ts), '%Y%m%d') AS day_key, event_id
             |FROM events
             |QUALIFY row_number() OVER (
             |  PARTITION BY event_type, strftime(date_trunc('second', ts), '%Y%m%d')
             |  ORDER BY date_trunc('second', ts) DESC, event_id DESC) = 1
             |ORDER BY event_type, day_key""".stripMargin)),

    // Rank snapshots per db by recency; top-3 (backup.sh:99–115 shape).
    "q_win_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts_s").desc, col("event_id").desc)
        Relational.eventsSec(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("event_type", "rn", "event_id")
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, rn, event_id FROM (
             |  SELECT event_type, event_id,
             |         row_number() OVER (PARTITION BY event_type
             |           ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin)),

    // Running total per user — cumulative frame. Same ORDER BY on both
    // engines ⇒ identical sequential summation order; round anyway.
    "q_win_running_sum" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Relational.eventsSec(s, dir)
          .withColumn("running_value", round(sum(col("value")).over(w), 4))
          .select("user_id", "event_id", "running_value")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |       round(sum(value) OVER (PARTITION BY user_id
             |         ORDER BY date_trunc('second', ts), event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // Inter-event gap per user (lag) and next-type preview (lead).
    "q_win_lag_lead" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
        Relational.eventsSec(s, dir)
          .withColumn("gap_sec",
            (unix_timestamp(col("ts_s")) - lag(unix_timestamp(col("ts_s")), 1).over(w)).cast("long"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select("user_id", "event_id", "gap_sec", "next_type")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  CAST(epoch(date_trunc('second', ts)) -
             |       lag(epoch(date_trunc('second', ts)), 1) OVER w AS BIGINT) AS gap_sec,
             |  lead(event_type, 1) OVER w AS next_type
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Moving average over a RANGE frame keyed on a numeric column.
    "q_win_frame_range" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("event_id"))
          .rangeBetween(-100L, 0L)
        Relational.eventsSec(s, dir)
          // sum+count, not avg: inputs are 2-decimal values, so the sum
          // stays on the 0.01 grid and round(…,4) never sits on a
          // half-way boundary (avg does, and flips the last digit
          // between engines).
          .withColumn("moving_sum", round(sum(col("value")).over(w), 4))
          .withColumn("moving_n", count(lit(1)).over(w))
          .select("event_type", "event_id", "moving_sum", "moving_n")
          .orderBy("event_type", "event_id")
      },
      Some("""SELECT event_type, event_id,
             |       round(sum(value) OVER w, 4) AS moving_sum,
             |       CAST(count(*) OVER w AS BIGINT) AS moving_n
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
             |ORDER BY event_type, event_id""".stripMargin)),

    // Distribution window family (ntile / percent_rank / cume_dist /
    // first_value / nth_value) — the quartile-bucketing and
    // rank-normalizing surface. The (value, event_id) ordering is
    // tie-free, so every function is deterministic and
    // engine-identical; percent_rank and cume_dist are single integer
    // divisions (bit-identical doubles on both engines). One shuffle,
    // one sort, all five functions share the frame.
    "q_win_distribution" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Relational.eventsSec(s, dir)
          .select(col("event_type"), col("event_id"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 4).as("pct_rank"),
            round(cume_dist().over(w), 4).as("cum_dist"),
            first_value(col("event_id")).over(w).as("smallest_id"),
            nth_value(col("event_id"), 3).over(w).as("third_id"))
          .orderBy("event_type", "event_id")
      },
      Some("""SELECT event_type, event_id,
             |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |       round(percent_rank() OVER w, 4) AS pct_rank,
             |       round(cume_dist() OVER w, 4) AS cum_dist,
             |       first_value(event_id) OVER w AS smallest_id,
             |       nth_value(event_id, 3) OVER w AS third_id
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_type, event_id""".stripMargin)),

    // ClickHouse groupArrayMovingAvg/MovingSum — the sliding ROWS
    // frame (last-k-rows smoothing), complementing q_win_frame_range's
    // RANGE frame: one shuffle on the partition key, one sort, both
    // measures share the frame. Deterministic because the (ts, id)
    // ordering key is unique.
    "q_win_moving" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("ts_s", "event_id")
          .rowsBetween(-4, Window.currentRow)
        Relational.eventsSec(s, dir)
          .select(col("user_id"), col("event_id"),
            round(avg(col("value")).over(w) + 1e-9, 4).as("mavg_5"),
            round(sum(col("value")).over(w) + 1e-9, 4).as("msum_5"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  round(avg(value) OVER w + 1e-9, 4) AS mavg_5,
             |  round(sum(value) OVER w + 1e-9, 4) AS msum_5
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |  ORDER BY date_trunc('second', ts), event_id
             |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ClickHouse exponentialMovingAverage — recency-weighted smoothing
    // over the last 8 rows per user: weights (1−α)^(rows-back),
    // normalized over the frame. The EMA recursion is unrolled into an
    // explicit weighted sum over the frame's value list (collect_list
    // respects frame order), so the whole computation is ONE window
    // pass (shuffle on user, one sort — same exchange q_win_moving
    // uses) + row-local higher-order functions; the 8-row frame bounds
    // the per-row list, so state is O(1) regardless of user activity.
    // Deterministic: the (ts, id) ordering key is unique, and both
    // engines fold the list left-to-right in frame order.
    "q_win_ema" -> QueryDef(
      (s, dir) => {
        // r15 rewrite: the frame list + two HOF folds
        // (collect_list over ROWS -7..0, then interpreted
        // aggregate(transform(...)) lambdas per row) ran outside
        // codegen and allocated an array per output row. Eight lag()
        // columns over the SAME window are one window pass and plain
        // codegen arithmetic. Bit-identical by construction: the fold
        // added oldest→newest, so summing j=7..0 with the same
        // Math.pow(0.7, j) weights reproduces the exact FP association
        // (a missing lag contributes +0.0, which is FP-exact; value
        // has no NULLs — with NULLs the old collect_list form already
        // diverged from the oracle's list()). Guide §4.
        val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        val lags = (7 to 0 by -1).map(j =>
          (if (j == 0) col("value") else lag(col("value"), j).over(w)).as(s"l$j"))
        val wsum = (7 to 0 by -1).foldLeft(lit(0.0)) { (acc, j) =>
          acc + coalesce(col(s"l$j") * lit(math.pow(0.7, j)), lit(0.0)) }
        val norm = (7 to 0 by -1).foldLeft(lit(0.0)) { (acc, j) =>
          acc + when(col(s"l$j").isNotNull, lit(math.pow(0.7, j))).otherwise(lit(0.0)) }
        Relational.eventsSec(s, dir)
          .select(Seq(col("user_id"), col("event_id")) ++ lags: _*)
          .select(col("user_id"), col("event_id"),
            round(wsum / norm + 1e-9, 4).as("ema_8"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH f AS (
             |  SELECT user_id, event_id,
             |    list(value) OVER (PARTITION BY user_id
             |      ORDER BY date_trunc('second', ts), event_id
             |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
             |  FROM events)
             |SELECT user_id, event_id,
             |  round(list_sum(list_transform(vs, (x, i) -> x * pow(0.7, len(vs) - i)))
             |    / list_sum(list_transform(vs, (x, i) -> pow(0.7, len(vs) - i)))
             |    + 1e-9, 4) AS ema_8
             |FROM f ORDER BY user_id, event_id""".stripMargin)),

    // Hampel filter (moving median + MAD) — the ROBUST outlier
    // detector over a sliding frame: per user, the median of the last
    // 9 values and the median absolute deviation around it; a point
    // is a spike when |x − med| > 3.5·MAD. The mean/stddev twin
    // (z-score) is famously poisoned by the very outliers it hunts;
    // the median pair is what production telemetry cleaning actually
    // uses. Shape: ONE window pass (shuffle on user, one sort — the
    // q_win_moving exchange) collects the 9-row frame list; median,
    // MAD, and the flag are row-local higher-order functions over
    // that bounded list (sort of ≤9 elements), so the whole filter
    // is codegen-friendly and O(1) state per row at any corpus size.
    // Determinism: the frame list is identical on both engines
    // (unique (ts, id) frame order), medians are ELEMENTS of it
    // (lower median — no even-count interpolation), and both engines
    // run the identical IEEE subtract/compare on identical doubles,
    // so the flag needs no epsilon.
    "q_win_hampel" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("ts_s", "event_id")
          .rowsBetween(-8, Window.currentRow)
        Relational.eventsSec(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            collect_list(col("value")).over(w).as("vs"))
          .withColumn("mmed",
            element_at(array_sort(col("vs")),
              ((size(col("vs")) + 1) / 2).cast("int")))
          .withColumn("mad",
            element_at(
              array_sort(transform(col("vs"), x => abs(x - col("mmed")))),
              ((size(col("vs")) + 1) / 2).cast("int")))
          .select(col("user_id"), col("event_id"),
            round(col("mmed"), 4).as("mmed"),
            round(col("mad"), 4).as("mad"),
            (abs(col("value") - col("mmed")) > col("mad") * 3.5).as("is_spike"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH f AS (
             |  SELECT user_id, event_id, value,
             |    list(value) OVER (PARTITION BY user_id
             |      ORDER BY date_trunc('second', ts), event_id
             |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vs
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, value, vs,
             |    list_sort(vs)[(len(vs) + 1) // 2] AS mmed
             |  FROM f),
             |d AS (
             |  SELECT user_id, event_id, value, mmed,
             |    list_sort(list_transform(vs, x -> abs(x - mmed)))
             |      [(len(vs) + 1) // 2] AS mad
             |  FROM m)
             |SELECT user_id, event_id,
             |  round(mmed, 4) AS mmed, round(mad, 4) AS mad,
             |  (abs(value - mmed) > mad * 3.5) AS is_spike
             |FROM d ORDER BY user_id, event_id""".stripMargin)),

    // ClickHouse `exponentialTimeDecayedSum/Count/Avg` — CONTINUOUS-
    // time decay (weight e^{−Δt/τ}, τ = 1 day), the wall-clock-aware
    // sibling of q_win_ema's row-count decay. Algebra: decayed_sum_i =
    // Σ_{j≤i} v_j·e^{−(t_i−t_j)/τ} = e^{−(t_i−a)/τ} · Σ v_j·e^{(t_j−a)/τ}
    // for ANY fixed anchor a — ONE cumulative window sum of pre-scaled
    // terms plus a row-local rescale, instead of a per-row re-walk of
    // history. A single per-user anchor overflows once the span
    // exceeds ~700τ (e^700 ≈ double max), so the anchor is re-based
    // every SEG=400τ: rows carry seg = ⌊(t−t0)/(SEG·τ)⌋ and the
    // within-segment exponent dtk ∈ [0, 400) (e^400 ≈ 5e173 — half of
    // double range left for the sum itself), and history restitches
    // through ONE previous-segment carry: contribution of segment p
    // into segment k is e^{−(k−p)·SEG}·B_p, which for k−p ≥ 2 is
    // < e^{−400} ≈ 1e−174 RELATIVE to the in-segment terms — below
    // double's 1e−16 resolution, so the single lag is exact-in-double
    // at ANY span (and the factor underflows to a clean 0.0, never
    // NaN, when the gap is huge). The segment frame adds one
    // segment-scale aggregate + lag + an equi-join back on
    // (user, seg) — O(users × span/400τ) rows, metadata-scale. The
    // avg form cancels the rescale entirely (ratio of two sums).
    // round(…,4) absorbs windowed-sum association drift (the
    // q_win_running_sum discipline).
    "q_win_decayed_avg" -> QueryDef(
      (s, dir) => decayedAvg(
        Relational.eventsSec(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            unix_timestamp(col("ts_s")).cast("double").as("t")),
        tau = 86400.0),
      Some("""WITH f AS (
             |  SELECT user_id, event_id, value,
             |    CAST(epoch(date_trunc('second', ts)) AS DOUBLE) AS t
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, value, t,
             |    (t - min(t) OVER (PARTITION BY user_id)) / 86400.0 AS dtt
             |  FROM f),
             |g2 AS (
             |  SELECT *, floor(dtt / 400.0) AS seg,
             |    dtt - floor(dtt / 400.0) * 400.0 AS dtk
             |  FROM g),
             |h AS (
             |  SELECT user_id, event_id, seg, dtk,
             |    sum(value * exp(dtk)) OVER w AS pnum,
             |    sum(exp(dtk)) OVER w AS pden
             |  FROM g2
             |  WINDOW w AS (PARTITION BY user_id, seg ORDER BY t, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |sa AS (
             |  SELECT user_id, seg,
             |    sum(value * exp(dtk)) AS segB, sum(exp(dtk)) AS segC
             |  FROM g2 GROUP BY user_id, seg),
             |sl AS (
             |  SELECT user_id, seg,
             |    lag(seg) OVER wl AS pseg,
             |    lag(segB) OVER wl AS pB,
             |    lag(segC) OVER wl AS pC
             |  FROM sa WINDOW wl AS (PARTITION BY user_id ORDER BY seg)),
             |j AS (
             |  SELECT h.user_id, h.event_id, h.dtk,
             |    h.pnum + CASE WHEN sl.pseg IS NULL THEN 0.0
             |      ELSE exp((sl.pseg - h.seg) * 400.0) END * coalesce(sl.pB, 0.0) AS num,
             |    h.pden + CASE WHEN sl.pseg IS NULL THEN 0.0
             |      ELSE exp((sl.pseg - h.seg) * 400.0) END * coalesce(sl.pC, 0.0) AS den
             |  FROM h JOIN sl USING (user_id, seg))
             |SELECT user_id, event_id,
             |  round(exp(-dtk) * num + 1e-9, 4) AS d_sum,
             |  round(exp(-dtk) * den + 1e-9, 4) AS d_cnt,
             |  round(num / den + 1e-9, 4) AS d_avg
             |FROM j ORDER BY user_id, event_id""".stripMargin)),

    // ClickHouse `ORDER BY … WITH FILL` — time-series gap filling:
    // densify each event type's daily counts over its own [min, max]
    // day span, missing days as explicit zero rows. Shape: the count
    // aggregate (one shuffle on (type, day)), a per-type span aggregate
    // whose OUTPUT is O(types) rows, a generator explode of the spans
    // into the calendar dimension (row-local — the dimension is
    // types × span-days, metadata-scale next to the fact table), and a
    // left join back on (type, day) against the ALREADY-AGGREGATED
    // counts. Nothing joins or explodes raw events.
    "q_gap_fill" -> QueryDef(
      (s, dir) => {
        val c = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"), date_trunc("day", col("ts_s")).as("day"))
          .agg(count(lit(1)).as("n"))
        val days = c.groupBy("event_type")
          .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(col("event_type"),
            explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
        days.join(c, Seq("event_type", "day"), "left")
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("event_type", "day")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, date_trunc('day', date_trunc('second', ts)) AS day
             |  FROM events),
             |c AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
             |b AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM c GROUP BY 1),
             |d AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
             |      FROM b)
             |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
             |       CAST(coalesce(c.n, 0) AS BIGINT) AS n
             |FROM d LEFT JOIN c ON d.event_type = c.event_type AND d.day = c.day
             |ORDER BY 1, 2""".stripMargin)),

    // ClickHouse `WITH FILL … INTERPOLATE (v AS v)` — gap filling
    // that CARRIES the previous known value across the filled rows
    // (CH's INTERPOLATE computes each filled row from the previous
    // row; `v AS v` is the carry-forward staple). Same densification
    // shape as q_gap_fill (aggregate first, explode the per-type day
    // span, left join back — nothing touches raw events), then ONE
    // more window pass: last-known-value with IGNORE NULLS. The
    // window partitions by event_type — bounded frames over the
    // (type × span-days) grid, never the fact table.
    "q_gap_interpolate" -> QueryDef(
      (s, dir) => {
        val c = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"), date_trunc("day", col("ts_s")).as("day"))
          .agg(round(sum("value"), 4).as("v"))
        val days = c.groupBy("event_type")
          .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(col("event_type"),
            explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        days.join(c, Seq("event_type", "day"), "left")
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("v").isNull.as("filled"),
            last(col("v"), ignoreNulls = true).over(w).as("v"))
          .orderBy("event_type", "day")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, date_trunc('day', date_trunc('second', ts)) AS day,
             |         value
             |  FROM events),
             |c AS (SELECT event_type, day, round(sum(value), 4) AS v
             |      FROM ev GROUP BY 1, 2),
             |b AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM c GROUP BY 1),
             |d AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
             |      FROM b)
             |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
             |       c.v IS NULL AS filled,
             |       last_value(c.v IGNORE NULLS) OVER (
             |         PARTITION BY d.event_type ORDER BY d.day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
             |FROM d LEFT JOIN c ON d.event_type = c.event_type AND d.day = c.day
             |ORDER BY 1, 2""".stripMargin)),

    // ClickHouse `LIMIT n BY key` — the first n rows per key in the
    // declared order (distinct from q_topk_per_group's rank-by-measure:
    // LIMIT BY is an ORDER-position cut, the dedup-to-n-exemplars
    // staple). One row_number window per key partition — each key's
    // frame cuts at n, no global sort; the unique (ts, event_id) order
    // key makes the cut deterministic.
    "q_limit_by" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts_s"), col("event_id"))
        Relational.eventsSec(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("event_type"), col("rn").cast("long").as("rn"),
            col("event_id"),
            date_format(col("ts_s"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id, ts_str FROM (
             |  SELECT event_type, event_id,
             |         strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_str,
             |         row_number() OVER (PARTITION BY event_type
             |           ORDER BY date_trunc('second', ts), event_id) AS rn
             |  FROM events)
             |WHERE rn <= 2 ORDER BY event_type, rn""".stripMargin)),

    // Global top-k by recency (keep-K-newest, backup.sh:119–122 view).
    // TakeOrderedAndProject: no global sort, O(k) per partition.
    "q_topk" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .orderBy(col("ts_s").desc, col("event_id").desc)
        .limit(20)
        .select(col("event_id"), col("event_type"),
          date_format(col("ts_s"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type, ts_str FROM (
             |  SELECT event_id, event_type,
             |         strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_str
             |  FROM events
             |  ORDER BY date_trunc('second', ts) DESC, event_id DESC LIMIT 20)
             |ORDER BY event_id""".stripMargin)),

    // Deterministic multi-key sort (limit keeps verify output bounded;
    // the (orderkey, linenumber) prefix of the sort key is unique so
    // the limit is deterministic).
    "q_sort_multi" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .orderBy(col("l_returnflag").asc, col("ship_day").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(1000),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
             |       strftime(l_shipdate, '%Y-%m-%d') AS ship_day
             |FROM lineitem
             |ORDER BY l_returnflag ASC, ship_day DESC, l_orderkey ASC, l_linenumber ASC
             |LIMIT 1000""".stripMargin)),

    // Top-k per group: window + filter, never a global sort.
    "q_topk_per_group" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY o_orderpriority
             |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    // Skyline / Pareto frontier (EDBT 2023 "Integration of Skyline
    // Queries into Spark SQL"): parts minimizing BOTH retail price and
    // size — no row in the result is dominated (≤ in both dims,
    // strict in one) by any part. Two-phase, the published
    // distributed shape: (1) collapse to the distinct (price, size)
    // grid — one hash aggregate that also carries the part count;
    // (2) LOCAL skyline per grid partition: sorted by (price, size),
    // a grid point survives iff no preceding point's size is ≤ its
    // own (on a distinct grid that inequality IS dominance — an
    // earlier point has smaller price, or equal price and strictly
    // smaller size); local pruning is sound because dominance within
    // any subset only removes dominated points, never frontier
    // points; (3) the SAME one-window rule globally over the local
    // survivors — the single-partition sort sees only
    // O(|frontier| × partitions) candidates, never the grid. The
    // oracle is deliberately a DIFFERENT algorithm (brute-force
    // NOT EXISTS dominance anti-join), so the check is semantic, not
    // a shape mirror.
    "q_skyline" -> QueryDef(
      (s, dir) => {
        def prune(df: org.apache.spark.sql.DataFrame, parts: Seq[String]) = {
          val w = Window.partitionBy(parts.map(col): _*)
            .orderBy(col("price").asc, col("size").asc)
            .rowsBetween(Window.unboundedPreceding, -1)
          df.withColumn("mprev", min("size").over(w))
            .filter(col("mprev").isNull || col("mprev") > col("size"))
            .drop("mprev")
        }
        val grid = Tables(s, dir, "part")
          .groupBy(col("p_retailprice").as("price"),
            col("p_size").cast("long").as("size"))
          .agg(count(lit(1)).as("n_parts"))
        val local = prune(grid.withColumn("pid", spark_partition_id()),
          Seq("pid")).drop("pid")
        prune(local, Seq.empty)
          .orderBy("price", "size")
      },
      Some("""WITH grid AS (
             |  SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS size,
             |    CAST(count(*) AS BIGINT) AS n_parts
             |  FROM part GROUP BY 1, 2)
             |SELECT price, size, n_parts FROM grid g
             |WHERE NOT EXISTS (SELECT 1 FROM grid d
             |  WHERE d.price <= g.price AND d.size <= g.size
             |    AND (d.price < g.price OR d.size < g.size))
             |ORDER BY price, size""".stripMargin))
  )

  /** The q_win_decayed_avg kernel on an arbitrary
    * (user_id, event_id, value, t) frame — factored out so the spec
    * can drive spans far beyond the fixture's (the >700τ overflow
    * regime) against a brute-force reference. See the q_win_decayed_avg
    * entry for the segment-anchored restitch derivation; `segLen` is
    * the re-anchor period in τ units (400 ⇒ e^400 ≈ 5e173 headroom,
    * one-lag carry exact to double precision).
    */
  private[graft] def decayedAvg(events: org.apache.spark.sql.DataFrame,
      tau: Double, segLen: Double = 400.0): org.apache.spark.sql.DataFrame = {
    val wAll = Window.partitionBy("user_id")
    val wSeg = Window.partitionBy("user_id", "seg")
      .orderBy("t", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy("user_id").orderBy("seg")
    val rows = events
      .withColumn("dtt", (col("t") - min(col("t")).over(wAll)) / tau)
      .withColumn("seg", floor(col("dtt") / segLen))
      .withColumn("dtk", col("dtt") - col("seg") * segLen)
      .withColumn("pnum", sum(col("value") * exp(col("dtk"))).over(wSeg))
      .withColumn("pden", sum(exp(col("dtk"))).over(wSeg))
    val segs = rows.groupBy("user_id", "seg")
      .agg(sum(col("value") * exp(col("dtk"))).as("segB"),
        sum(exp(col("dtk"))).as("segC"))
      .select(col("user_id"), col("seg"),
        lag("seg", 1).over(wLag).as("pseg"),
        lag("segB", 1).over(wLag).as("pB"),
        lag("segC", 1).over(wLag).as("pC"))
    val cf = when(col("pseg").isNotNull,
      exp((col("pseg") - col("seg")) * segLen)).otherwise(lit(0.0))
    rows.join(segs, Seq("user_id", "seg"))
      .withColumn("num", col("pnum") + cf * coalesce(col("pB"), lit(0.0)))
      .withColumn("den", col("pden") + cf * coalesce(col("pC"), lit(0.0)))
      .select(col("user_id"), col("event_id"),
        round(exp(-col("dtk")) * col("num") + lit(1e-9), 4).as("d_sum"),
        round(exp(-col("dtk")) * col("den") + lit(1e-9), 4).as("d_cnt"),
        round(col("num") / col("den") + lit(1e-9), 4).as("d_avg"))
      .orderBy("user_id", "event_id")
  }
}
