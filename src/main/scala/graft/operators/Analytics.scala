package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.L — round-4 analytics depth: ClickHouse statistical
  * aggregates and table-engine collapse semantics, all [CH] capability
  * of the engine the reference backs up (Dockerfile:2 pins ClickHouse
  * 24.8; `BACKUP DATABASE` at backup.sh:45 snapshots tables of any
  * engine, including Collapsing/VersionedCollapsingMergeTree, and any
  * aggregate state).
  *
  * Scale shapes: every query here is one or two stacked map-side-
  * combined hash aggregates over a bounded group space — the shuffle
  * carries O(groups) rows (statuses, segments × nations, users ×
  * event types), never the fact rows. The only join (`q_str_distance`)
  * broadcasts a 25-row dimension. Nothing windows over an unbounded
  * partition: the single-partition windows in the t-test/Cramér's-V
  * finals run over the already-collapsed grid (≤ a few hundred rows by
  * construction — the domain, not the data).
  */
object Analytics extends QueryModule {

  /** q_logreg_gd's fixed schedule: full-batch steps and learning rate.
    * 12 steps with η=4 visibly reduces the loss on the fixture (0.693
    * → 0.637; the scaled features are only weakly predictive of the
    * return flag, which is fine — the gate checks the arithmetic, not
    * the model) while keeping weights small enough that σ stays in
    * (0.05, 0.95) — no ln(1−σ) underflow on either engine.
    */
  private val LogRegIters = 12
  private val LogRegEta = 4.0

  /** The DuckDB twin of q_logreg_gd's driver loop: the SAME gradient
    * steps unrolled as chained CTEs (w1..wN each one aggregate over
    * the feature projection joined to the previous weights), generated
    * rather than hand-written so the two sides can never drift apart
    * on step count or learning rate.
    */
  private def logregOracle(iters: Int, eta: Double): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH d AS (
        |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
        |           AS DOUBLE) AS y,
        |         l_quantity / 50.0 AS x1,
        |         l_extendedprice / 100000.0 AS x2
        |  FROM lineitem),
        |w0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)""".stripMargin)
    for (i <- 1 to iters) sb.append(s""",
        |w$i AS (
        |  SELECT
        |    any_value(a) - $eta * avg(1.0/(1.0 + exp(-(a + b*x1 + c*x2))) - y) AS a,
        |    any_value(b) - $eta * avg((1.0/(1.0 + exp(-(a + b*x1 + c*x2))) - y) * x1) AS b,
        |    any_value(c) - $eta * avg((1.0/(1.0 + exp(-(a + b*x1 + c*x2))) - y) * x2) AS c
        |  FROM d CROSS JOIN w${i - 1})""".stripMargin)
    sb.append(s"""
        |SELECT round(a + 1e-9, 4) AS w0,
        |  round(b + 1e-9, 4) AS w_quantity,
        |  round(c + 1e-9, 4) AS w_price,
        |  round(avg(-(y * ln(1.0/(1.0 + exp(-(a + b*x1 + c*x2))))
        |    + (1.0 - y) * ln(1.0 - 1.0/(1.0 + exp(-(a + b*x1 + c*x2))))))
        |    + 1e-9, 4) AS log_loss,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM d CROSS JOIN w$iters
        |GROUP BY a, b, c""".stripMargin)
    sb.toString
  }

  /** Welch's t-statistic pieces from (mean, sample-variance, count)
    * pairs — the same arithmetic both engines run, so the oracle is a
    * formula-level check, not a library call.
    */
  private def welch(m1: Column, v1: Column, n1: Column,
      m2: Column, v2: Column, n2: Column): (Column, Column) = {
    val se1 = v1 / n1
    val se2 = v2 / n2
    val t = (m1 - m2) / sqrt(se1 + se2)
    val dof = pow(se1 + se2, 2) /
      (pow(se1, 2) / (n1 - 1) + pow(se2, 2) / (n2 - 1))
    (t, dof)
  }

  /** CollapsingMergeTree FINAL over (key, sign, value) rows: one hash
    * aggregate to the per-key net state, then the net>0 survivors.
    * Shared by q_collapse_sign and AnalyticsSpec's crafted cases.
    */
  private[graft] def collapse(rows: DataFrame, key: String, sign: Column,
      value: Column): DataFrame =
    rows
      .select(col(key), sign.as("sign"), value.as("v"))
      .groupBy(key)
      .agg(sum(col("sign")).as("net"),
        round(sum(col("sign") * col("v")), 4).as("net_value"),
        count(lit(1)).as("n_rows"))
      .filter(col("net") > 0)

  /** Welch's unequal-variance t-test between the rows where `inA` and
    * the rows where `inB`, over `x` — one conditional-moment pass.
    */
  private[graft] def welchTTest(df: DataFrame, inA: Column, inB: Column,
      x: Column): DataFrame = {
    val a = when(inA, x)
    val b = when(inB, x)
    val agg = df.agg(avg(a).as("m1"), var_samp(a).as("v1"), count(a).as("n1"),
      avg(b).as("m2"), var_samp(b).as("v2"), count(b).as("n2"))
    val (t, dof) = welch(col("m1"), col("v1"), col("n1").cast("double"),
      col("m2"), col("v2"), col("n2").cast("double"))
    agg.select(round(t, 4).as("t_stat"), round(dof, 4).as("dof"),
      col("n1"), col("n2"))
  }

  /** Cramér's V between two categorical columns via the observed-cells
    * χ² identity (see q_agg_cramers_v). Output: one row
    * (chi2, cramers_v, n_a, n_b).
    */
  private[graft] def cramersV(df: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(a, b).agg(count(lit(1)).cast("double").as("nij"))
    cells
      .withColumn("ri", sum(col("nij")).over(Window.partitionBy(a)))
      .withColumn("cj", sum(col("nij")).over(Window.partitionBy(b)))
      .agg(sum(col("nij")).as("n"),
        sum(col("nij") * col("nij") / (col("ri") * col("cj"))).as("srat"),
        countDistinct(col(a)).cast("double").as("r"),
        countDistinct(col(b)).cast("double").as("c"))
      .select(
        round(col("n") * (col("srat") - 1), 4).as("chi2"),
        round(sqrt((col("srat") - 1) / least(col("r") - 1, col("c") - 1)), 4)
          .as("cramers_v"),
        col("r").cast("long").as("n_a"),
        col("c").cast("long").as("n_b"))
  }

  /** sumMap canonical form over (key, mapKey, value) rows: two stacked
    * hash aggregates to a sorted `mapKey:scaled-int` string per key.
    */
  private[graft] def sumMap(df: DataFrame, key: String, mapKey: String,
      value: String): DataFrame =
    df.groupBy(key, mapKey)
      .agg(sum(col(value)).as("v"))
      .groupBy(key)
      .agg(
        array_join(sort_array(collect_list(
          concat(col(mapKey), lit(":"),
            round(col("v") * 10000, 0).cast("long").cast("string")))), "\u001f")
          .as("value_map"),
        count(lit(1)).as("n_keys"))

  /** Mann–Whitney U (tie-corrected normal approximation) between the
    * rows where `inA` and the rows where `inB`, over `x` — value-grid
    * ranking (see q_agg_mann_whitney). Output 1 row:
    * (u1, u2, z, n_f, n_o).
    */
  private[graft] def mannWhitneyU(df: DataFrame, inA: Column, inB: Column,
      x: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = df
      .filter(inA || inB)
      .groupBy(x.as("v"))
      .agg(
        count(when(inA, 1)).cast("double").as("n1v"),
        count(when(inB, 1)).cast("double").as("n2v"))
      .withColumn("tv", col("n1v") + col("n2v"))
    val ranked = grid.withColumn("below",
      sum("tv").over(Window.orderBy("v")) - col("tv"))
    ranked.agg(
        sum("n1v").as("n1"), sum("n2v").as("n2"), sum("tv").as("n"),
        sum(col("n1v") * (col("below") + (col("tv") + 1) / 2)).as("r1"),
        sum(col("tv") * col("tv") * col("tv") - col("tv")).as("ties"))
      .select(
        round(col("r1") - col("n1") * (col("n1") + 1) / 2, 4).as("u1"),
        round(col("n1") * col("n2")
          - (col("r1") - col("n1") * (col("n1") + 1) / 2), 4).as("u2"),
        round((col("r1") - col("n1") * (col("n1") + 1) / 2
            - col("n1") * col("n2") / 2)
          / sqrt(col("n1") * col("n2") / 12
            * ((col("n") + 1) - col("ties") / (col("n") * (col("n") - 1)))), 4)
          .as("z"),
        col("n1").cast("long").as("n_f"),
        col("n2").cast("long").as("n_o"))
  }

  /** ROC AUC of `score` as a predictor of `pos`, by trapezoid over the
    * tie-grouped curve (see q_agg_auc). Collapses to the distinct-score
    * grid first; the cumulative window runs over that grid. Output
    * 1 row: (auc, n_pos, n_neg).
    */
  private[graft] def rocAuc(df: DataFrame, pos: Column, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .select(score.as("score"), when(pos, 1L).otherwise(0L).as("pos"))
      .groupBy("score")
      .agg(sum("pos").as("np"), sum(lit(1L) - col("pos")).as("nn"))
    val w = Window.orderBy(col("score").desc)
    g.select(col("score"),
        sum("np").over(w).as("tp"), sum("nn").over(w).as("fp"))
      .select(col("tp"), col("fp"),
        coalesce(lag("tp", 1).over(w), lit(0L)).as("tp0"),
        coalesce(lag("fp", 1).over(w), lit(0L)).as("fp0"))
      .agg(
        // The trapezoid terms are cast to double BEFORE the sum: the
        // accumulated value approaches 2·P·N, which overflows LongType
        // (ANSI mode throws) once P·N nears 2^62 — reachable at 100 TB.
        round(sum(((col("fp") - col("fp0")) * (col("tp") + col("tp0")))
            .cast("double")) /
          (lit(2.0) * max("tp") * max("fp")) + 1e-9, 4).as("auc"),
        max("tp").as("n_pos"), max("fp").as("n_neg"))
  }

  /** One-way ANOVA F of `x` across `group`, from per-group
    * (n, mean, s²) moments — SSB via Σnm² − (Σnm)²/N so the grand mean
    * needs no second data pass (see q_agg_anova). Output 1 row:
    * (f_stat, df_between, df_within, n_groups, n_rows).
    */
  private[graft] def anovaF(df: DataFrame, group: Column, x: Column): DataFrame =
    df.groupBy(group)
      .agg(count(lit(1)).cast("double").as("n"),
        avg(x).as("m"), var_samp(x).as("v"))
      .agg(
        round(((sum(col("n") * col("m") * col("m")) -
            pow(sum(col("n") * col("m")), 2) / sum("n")) /
            (count(lit(1)) - 1)) /
          ((sum((col("n") - 1) * col("v"))) / (sum("n") - count(lit(1))))
          + 1e-9, 4).as("f_stat"),
        (count(lit(1)) - 1).cast("long").as("df_between"),
        (sum("n") - count(lit(1))).cast("long").as("df_within"),
        count(lit(1)).cast("long").as("n_groups"),
        sum("n").cast("long").as("n_rows"))

  /** Exact two-feature OLS via the centered normal equations (see
    * q_linreg_multi): means pass, centered-moments pass against the
    * broadcast 1-row means, 2×2 Cramer solve. Output 1 row:
    * (b1, b2, b0, n) — caller names the columns.
    */
  private[graft] def olsTwoFeature(df: DataFrame, x1: Column, x2: Column,
      y: Column): DataFrame = {
    val means = df.agg(avg(x1).as("m1"), avg(x2).as("m2"), avg(y).as("my"))
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val b1 = (col("s22") * col("s1y") - col("s12") * col("s2y")) / det
    val b2 = (col("s11") * col("s2y") - col("s12") * col("s1y")) / det
    df.crossJoin(broadcast(means))
      .select((x1 - col("m1")).as("d1"), (x2 - col("m2")).as("d2"),
        (y - col("my")).as("dy"), col("m1"), col("m2"), col("my"))
      .agg(sum(col("d1") * col("d1")).as("s11"),
        sum(col("d1") * col("d2")).as("s12"),
        sum(col("d2") * col("d2")).as("s22"),
        sum(col("d1") * col("dy")).as("s1y"),
        sum(col("d2") * col("dy")).as("s2y"),
        first("m1").as("m1"), first("m2").as("m2"), first("my").as("my"),
        count(lit(1)).as("n"))
      .select(round(b1 + 1e-9, 4), round(b2 + 1e-9, 4),
        round(col("my") - b1 * col("m1") - b2 * col("m2") + 1e-9, 4),
        col("n"))
  }

  /** Population skewness g₁ = m₃/m₂^1.5 and excess kurtosis
    * g₂ = m₄/m₂² − 3 per group, from explicit central moments (see
    * q_agg_moments). Two stacked aggregates: per-group means, then the
    * centered power sums against the broadcast means — the formula
    * route, because Spark's and DuckDB's built-in skewness/kurtosis
    * disagree on bias correction (population vs sample), and raw power
    * sums would cancel catastrophically at the 4-decimal grid.
    */
  private[graft] def momentsSkewKurt(df: DataFrame, group: Column,
      x: Column): DataFrame = {
    val means = df.groupBy(group.as("g")).agg(avg(x).as("m"))
    df.select(group.as("g"), x.as("x"))
      .join(broadcast(means), "g")
      .select(col("g"), (col("x") - col("m")).as("d"))
      .groupBy("g")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        sum(col("d") * col("d") * col("d") * col("d")).as("s4"))
      .select(col("g"),
        round((col("s3") / col("n")) /
          pow(col("s2") / col("n"), 1.5) + 1e-9, 4).as("skew_pop"),
        round((col("s4") / col("n")) /
          pow(col("s2") / col("n"), 2) - 3.0 + 1e-9, 4).as("kurt_excess"),
        col("n").cast("long").as("n"))
  }

  /** Theil's U (uncertainty coefficient), both directions, from the
    * observed contingency cells of categorical columns `a` × `b`.
    * Output 1 row: (u_a_given_b, u_b_given_a, h_a, h_b).
    */
  private[graft] def theilsU(df: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .groupBy(col(a).as("a"), col(b).as("b"))
      .agg(count(lit(1)).cast("double").as("nij"))
    val m = cells
      .withColumn("ri", sum("nij").over(Window.partitionBy("a")))
      .withColumn("cj", sum("nij").over(Window.partitionBy("b")))
      .withColumn("n", sum("nij").over(Window.partitionBy()))
    val cond = m.agg(
      (-sum((col("nij") / col("n")) * log(col("nij") / col("cj")))).as("hab"),
      (-sum((col("nij") / col("n")) * log(col("nij") / col("ri")))).as("hba"))
    val ha = m.select("a", "ri", "n").distinct()
      .agg((-sum((col("ri") / col("n")) * log(col("ri") / col("n")))).as("ha"))
    val hb = m.select("b", "cj", "n").distinct()
      .agg((-sum((col("cj") / col("n")) * log(col("cj") / col("n")))).as("hb"))
    cond.crossJoin(ha).crossJoin(hb).select(
      round((col("ha") - col("hab")) / col("ha"), 4).as("u_a_given_b"),
      round((col("hb") - col("hba")) / col("hb"), 4).as("u_b_given_a"),
      round(col("ha"), 4).as("h_a"),
      round(col("hb"), 4).as("h_b"))
  }

  /** Spearman rank correlation between numeric columns `x` and `y` —
    * midrank ties via cumulative-count windows over each column's
    * distinct-value grid (see q_agg_rank_corr). Output 1 row:
    * (spearman, n).
    */
  private[graft] def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranks(c: Column): DataFrame =
      df.groupBy(c.as("v"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("r",
          sum("cnt").over(Window.orderBy("v")) - col("cnt")
            + (col("cnt") + 1) / 2)
    val rq = ranks(x).select(col("v").as("qv"), col("r").as("rq"))
    val rd = ranks(y).select(col("v").as("dv"), col("r").as("rd"))
    df.join(broadcast(rq), x === col("qv"))
      .join(broadcast(rd), y === col("dv"))
      .agg(round(corr(col("rq"), col("rd")), 4).as("spearman"),
        count(lit(1)).as("n"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the rows where
    * `inA` and the rows where `inB`, over `x` — empirical CDFs from
    * one cumulative window over the distinct-value grid (see
    * q_agg_ks_test). Output 1 row: (d_stat, ks_stat, n_f, n_o).
    */
  private[graft] def ksTest(df: DataFrame, inA: Column, inB: Column,
      x: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = df
      .filter(inA || inB)
      .groupBy(x.as("v"))
      .agg(
        count(when(inA, 1)).cast("double").as("c1"),
        count(when(inB, 1)).cast("double").as("c2"))
    val cdf = grid.select(
      sum("c1").over(Window.orderBy("v")).as("f1"),
      sum("c2").over(Window.orderBy("v")).as("f2"),
      sum("c1").over(Window.partitionBy()).as("n1"),
      sum("c2").over(Window.partitionBy()).as("n2"))
    cdf.agg(
      round(max(abs(col("f1") / col("n1") - col("f2") / col("n2"))), 4)
        .as("d_stat"),
      round(sqrt(first("n1") * first("n2") / (first("n1") + first("n2")))
        * max(abs(col("f1") / col("n1") - col("f2") / col("n2"))), 4)
        .as("ks_stat"),
      first("n1").cast("long").as("n_f"),
      first("n2").cast("long").as("n_o"))
  }

  def entries: Map[String, QueryDef] = Map(

    // CollapsingMergeTree FINAL semantics ([CH]): every row carries a
    // sign (+1 insert / −1 cancel); the collapsed state of a key is the
    // sign-weighted net of its rows, and keys whose inserts and cancels
    // annul (net ≤ 0) vanish. Here `error` events cancel a unit of the
    // user's activity, everything else inserts one — the collapse is a
    // single map-side-combined hash aggregate on user_id (sign and the
    // weighted measures are row-local projections), then the net>0
    // residual filter. Shuffle = one row per user, however many events.
    "q_collapse_sign" -> QueryDef(
      (s, dir) => collapse(Tables(s, dir, "events"), "user_id",
          when(col("event_type") === "error", lit(-1L)).otherwise(lit(1L)),
          col("value"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS BIGINT) AS net,
             |  round(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END * value), 4) AS net_value,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM events GROUP BY user_id
             |HAVING sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) > 0
             |ORDER BY user_id""".stripMargin)),

    // VersionedCollapsingMergeTree FINAL semantics ([CH]): like the
    // plain collapse above, but a cancel (−1) annuls an insert (+1)
    // only at the SAME (key, version) — out-of-order cancels can never
    // eat a newer insert, which is the whole point of the versioned
    // engine. Two map-side-combined hash aggregates: (key, version) →
    // net sign (versions whose inserts and cancels annul vanish), then
    // key → the surviving-state summary (latest live version + nets) —
    // the canonical "current state" read off a versioned-collapsing
    // table. Shuffle = one row per (key, version), then one per key.
    "q_collapse_versioned" -> QueryDef(
      (s, dir) => Tables(s, dir, "events")
        .select(col("user_id"), (col("event_id") % 16).as("version"),
          when(col("event_type") === "error", lit(-1L)).otherwise(lit(1L)).as("sign"),
          col("value"))
        .groupBy("user_id", "version")
        .agg(sum("sign").as("net"),
          sum(col("sign") * col("value")).as("net_value"))
        .filter(col("net") > 0)
        .groupBy("user_id")
        .agg(max("version").as("last_version"),
          count(lit(1)).as("n_live_versions"),
          round(sum("net_value"), 4).as("net_value"),
          sum("net").as("net_rows"))
        .orderBy("user_id"),
      Some("""WITH v AS (
             |  SELECT user_id, event_id % 16 AS version,
             |         CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS sign, value
             |  FROM events),
             |n AS (
             |  SELECT user_id, version, sum(sign) AS net, sum(sign * value) AS net_value
             |  FROM v GROUP BY user_id, version HAVING sum(sign) > 0)
             |SELECT user_id, CAST(max(version) AS BIGINT) AS last_version,
             |  CAST(count(*) AS BIGINT) AS n_live_versions,
             |  round(sum(net_value), 4) AS net_value,
             |  CAST(sum(net) AS BIGINT) AS net_rows
             |FROM n GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Run-length collapse of the event stream — consecutive
    // same-type events per user fold into one row per run (first id,
    // length, value sum): ClickHouse's `neighbor`/DEDUPLICATE-
    // consecutive habit, and the stream compaction step session
    // pipelines apply before pattern matching. Shape: lag() marks run
    // starts, a cumulative sum stamps run ids (both over the SAME
    // user-partitioned sort — one shuffle, one sort), then one hash
    // aggregate per (user, run). No self-joins, nothing global.
    "q_collapse_runs" -> QueryDef(
      (s, dir) => {
        val wo = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        val wc = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Relational.eventsSec(s, dir)
          .withColumn("is_start",
            when(lag(col("event_type"), 1).over(wo).isNull ||
              lag(col("event_type"), 1).over(wo) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("run_id", sum(col("is_start")).over(wc))
          .groupBy("user_id", "run_id")
          .agg(min(col("event_id")).as("first_event_id"),
            first(col("event_type")).as("event_type"),
            count(lit(1)).as("run_len"),
            round(sum(col("value")), 4).as("run_value"))
          .orderBy("user_id", "run_id")
      },
      Some("""WITH m AS (
             |  SELECT user_id, event_id, event_type, value, ts,
             |    CASE WHEN lag(event_type, 1) OVER w IS NULL
             |           OR lag(event_type, 1) OVER w <> event_type
             |         THEN 1 ELSE 0 END AS is_start
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY date_trunc('second', ts), event_id)),
             |r AS (
             |  SELECT user_id, event_id, event_type, value,
             |    CAST(sum(is_start) OVER (PARTITION BY user_id
             |      ORDER BY date_trunc('second', ts), event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
             |  FROM m)
             |SELECT user_id, run_id,
             |  CAST(min(event_id) AS BIGINT) AS first_event_id,
             |  min(event_type) AS event_type,
             |  CAST(count(*) AS BIGINT) AS run_len,
             |  round(sum(value), 4) AS run_value
             |FROM r GROUP BY user_id, run_id
             |ORDER BY user_id, run_id""".stripMargin)),

    // ClickHouse groupBitmapAnd/Or/Xor ([CH] bitmap aggregates): EXACT
    // set algebra over the member-id sets of two segments. The bitmap
    // materializes as per-member FLAGS (one hash aggregate on the id:
    // two booleans of state per member — the roaring-bitmap payload
    // without the driver ever seeing ids), then one conditional-count
    // fold computes |A∩B| / |A∪B| / |AΔB| / |A∖B| in a single pass
    // over the flag rows. Exact twin of the approx q_agg_theta_sets;
    // shuffle = one row per distinct member at any scale.
    "q_agg_bitmap_sets" -> QueryDef(
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("a"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
        .agg(
          count(when(col("a") === 1 && col("b") === 1, 1)).as("n_and"),
          count(when(col("a") === 1 || col("b") === 1, 1)).as("n_or"),
          count(when(col("a") =!= col("b"), 1)).as("n_xor"),
          count(when(col("a") === 1 && col("b") === 0, 1)).as("n_andnot")),
      Some("""WITH f AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
             |  FROM events GROUP BY user_id)
             |SELECT
             |  CAST(count(CASE WHEN a = 1 AND b = 1 THEN 1 END) AS BIGINT) AS n_and,
             |  CAST(count(CASE WHEN a = 1 OR b = 1 THEN 1 END) AS BIGINT) AS n_or,
             |  CAST(count(CASE WHEN a <> b THEN 1 END) AS BIGINT) AS n_xor,
             |  CAST(count(CASE WHEN a = 1 AND b = 0 THEN 1 END) AS BIGINT) AS n_andnot
             |FROM f""".stripMargin)),

    // ReplacingMergeTree FINAL semantics ([CH]): each (user, type) key
    // keeps only its latest row by version — event_id, the monotone
    // insert id, is the version column. One max_by hash aggregate:
    // map-side combine reduces every partition to one candidate per
    // key before the exchange, so the shuffle carries keys, not
    // versions — FINAL over 100 TB is one aggregation, not a sort.
    // The streaming twin (streaming.StreamReplacing) maintains the
    // same winner per key incrementally; StreamingSpec pins stream ≡
    // batch.
    "q_replacing_final" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("user_id", "event_type")
        .agg(max("event_id").cast("long").as("last_event_id"),
          round(max_by(col("value"), col("event_id")), 4).as("last_value"),
          date_format(max_by(col("ts_s"), col("event_id")), "yyyy-MM-dd HH:mm:ss")
            .as("last_ts"),
          count(lit(1)).as("n_versions"))
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type,
             |  CAST(max(event_id) AS BIGINT) AS last_event_id,
             |  round(arg_max(value, event_id), 4) AS last_value,
             |  strftime(arg_max(date_trunc('second', ts), event_id), '%Y-%m-%d %H:%M:%S') AS last_ts,
             |  CAST(count(*) AS BIGINT) AS n_versions
             |FROM events GROUP BY user_id, event_type
             |ORDER BY user_id, event_type""".stripMargin)),

    // ClickHouse groupBitAnd/groupBitOr/groupBitXor ([CH]): bitwise
    // fold of an integer column per group. One hash aggregate; the
    // fold state is a single 64-bit word per group per partition —
    // the cheapest possible mergeable aggregate at any scale.
    "q_agg_bitwise" -> QueryDef(
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(expr("bit_and(o_orderkey)").as("keys_and"),
          expr("bit_or(o_orderkey)").as("keys_or"),
          expr("bit_xor(o_orderkey)").as("keys_xor"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  CAST(bit_and(o_orderkey) AS BIGINT) AS keys_and,
             |  CAST(bit_or(o_orderkey) AS BIGINT) AS keys_or,
             |  CAST(bit_xor(o_orderkey) AS BIGINT) AS keys_xor,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ClickHouse welchTTest ([CH]): unequal-variance two-sample t-test
    // — finished (F) vs open (O) order values. Built from conditional
    // moment aggregates (avg/var_samp/count over CASE projections), so
    // ONE pass over the fact table feeds both samples; the t and
    // Welch–Satterthwaite dof are row-local arithmetic on the 1-row
    // aggregate. Both engines run the identical formula — the oracle
    // checks the math, not a library.
    "q_agg_ttest" -> QueryDef(
      (s, dir) => welchTTest(Tables(s, dir, "orders"),
        col("o_orderstatus") === "F", col("o_orderstatus") === "O",
        col("o_totalprice")),
      Some("""WITH m AS (
             |  SELECT
             |    avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS m1,
             |    var_samp(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS v1,
             |    CAST(count(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS DOUBLE) AS n1,
             |    avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS m2,
             |    var_samp(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS v2,
             |    CAST(count(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS DOUBLE) AS n2
             |  FROM orders)
             |SELECT
             |  round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t_stat,
             |  round(pow(v1/n1 + v2/n2, 2)
             |    / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)), 4) AS dof,
             |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
             |FROM m""".stripMargin)),

    // ClickHouse cramersV ([CH]): association strength between two
    // categorical columns (market segment × nation). χ² is computed by
    // the observed-cells-only identity χ² = n·(Σ nᵢⱼ²/(rᵢ·cⱼ) − 1) —
    // zero cells contribute nothing to the sum and are accounted for
    // by the −1, so no dense cell grid is ever materialized. Plan:
    // one hash aggregate to the contingency cells (≤ segments ×
    // nations rows), two window sums over that bounded grid for the
    // margins, one global fold. Nothing touches the fact rows twice.
    // ClickHouse contingency / theilsU siblings ([CH]): Pearson's
    // contingency coefficient C = √(χ²/(χ²+n)) and Tschuprow's T =
    // √(χ²/(n·√((r−1)(c−1)))) — same observed-cells χ² identity and
    // the same bounded-grid plan as q_agg_cramers_v, different
    // normalizations (the full ClickHouse association family:
    // cramersV, contingency, theilsU, and T).
    "q_agg_contingency" -> QueryDef(
      (s, dir) => {
        val n = Tables(s, dir, "customer").count().toDouble
        cramersV(Tables(s, dir, "customer"), "c_mktsegment", "c_nationkey")
          .select(
            round(sqrt(col("chi2") / (col("chi2") + n)), 4).as("contingency_c"),
            round(sqrt(col("chi2")
              / (lit(n) * sqrt((col("n_a") - 1) * (col("n_b") - 1)))), 4)
              .as("tschuprow_t"),
            col("n_a").as("n_segments"), col("n_b").as("n_nations"))
      },
      Some("""WITH cells AS (
             |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS DOUBLE) AS nij
             |  FROM customer GROUP BY c_mktsegment, c_nationkey),
             |marg AS (
             |  SELECT nij,
             |    sum(nij) OVER (PARTITION BY c_mktsegment) AS ri,
             |    sum(nij) OVER (PARTITION BY c_nationkey) AS cj
             |  FROM cells),
             |fix AS (
             |  SELECT sum(nij) AS n, sum(nij*nij/(ri*cj)) AS srat FROM marg),
             |dims AS (
             |  SELECT CAST(count(DISTINCT c_mktsegment) AS DOUBLE) AS r,
             |    CAST(count(DISTINCT c_nationkey) AS DOUBLE) AS c FROM customer)
             |SELECT
             |  round(sqrt((n*(srat-1)) / (n*(srat-1) + n)), 4) AS contingency_c,
             |  round(sqrt((n*(srat-1)) / (n * sqrt((r-1)*(c-1)))), 4) AS tschuprow_t,
             |  CAST(r AS BIGINT) AS n_segments,
             |  CAST(c AS BIGINT) AS n_nations
             |FROM fix, dims""".stripMargin)),

    // ClickHouse `categoricalInformationValue` ([CH]): per-category
    // Weight of Evidence and Information Value of event_type against
    // a binary outcome (high-value event, value ≥ 50 — a ~35/65 split
    // on the fixture, never degenerate) — the credit-scoring /
    // feature-screening staple. Scale shape: the corpus collapses to
    // the (category × class) count grid in ONE map-side-combined
    // aggregate; the 1-row class totals broadcast back (the
    // q_ab_ztest anchor pattern); WoE/IV are row-local arithmetic on
    // exact integer counts through identical ln chains. NULL-guarded
    // at an empty class on either side (ln 0), mirrored in the oracle.
    "q_categorical_iv" -> QueryDef(
      (s, dir) => {
        val grid = Relational.eventsSec(s, dir)
          .groupBy("event_type")
          .agg(sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("value") < 50.0, 1L).otherwise(0L)).as("n_bad"))
        val tot = grid.agg(sum("n_good").as("g_tot"), sum("n_bad").as("b_tot"))
        val gr = col("n_good").cast("double") / col("g_tot")
        val br = col("n_bad").cast("double") / col("b_tot")
        grid.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n_good"), col("n_bad"),
            when(col("n_good") > 0 && col("n_bad") > 0,
              round(log(gr / br) + 1e-9, 4)).as("woe"),
            when(col("n_good") > 0 && col("n_bad") > 0,
              round((gr - br) * log(gr / br) + 1e-9, 4)).as("iv_term"))
          .orderBy("event_type")
      },
      Some("""WITH grid AS (
             |  SELECT event_type,
             |    CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_good,
             |    CAST(sum(CASE WHEN value < 50.0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_bad
             |  FROM events GROUP BY event_type),
             |tot AS (SELECT sum(n_good) AS g_tot, sum(n_bad) AS b_tot FROM grid)
             |SELECT event_type, n_good, n_bad,
             |  CASE WHEN n_good > 0 AND n_bad > 0 THEN
             |    round(ln((CAST(n_good AS DOUBLE) / g_tot) /
             |             (CAST(n_bad AS DOUBLE) / b_tot)) + 1e-9, 4) END AS woe,
             |  CASE WHEN n_good > 0 AND n_bad > 0 THEN
             |    round(((CAST(n_good AS DOUBLE) / g_tot) -
             |           (CAST(n_bad AS DOUBLE) / b_tot)) *
             |          ln((CAST(n_good AS DOUBLE) / g_tot) /
             |             (CAST(n_bad AS DOUBLE) / b_tot)) + 1e-9, 4) END AS iv_term
             |FROM grid, tot ORDER BY event_type""".stripMargin)),

    "q_agg_cramers_v" -> QueryDef(
      (s, dir) => cramersV(Tables(s, dir, "customer"),
          "c_mktsegment", "c_nationkey")
        .withColumnRenamed("n_a", "n_segments")
        .withColumnRenamed("n_b", "n_nations"),
      Some("""WITH cells AS (
             |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS DOUBLE) AS nij
             |  FROM customer GROUP BY c_mktsegment, c_nationkey),
             |marg AS (
             |  SELECT nij,
             |    sum(nij) OVER (PARTITION BY c_mktsegment) AS ri,
             |    sum(nij) OVER (PARTITION BY c_nationkey) AS cj,
             |    c_mktsegment, c_nationkey
             |  FROM cells),
             |agg AS (
             |  SELECT sum(nij) AS n, sum(nij*nij/(ri*cj)) AS srat,
             |    CAST(count(DISTINCT c_mktsegment) AS DOUBLE) AS r,
             |    CAST(count(DISTINCT c_nationkey) AS DOUBLE) AS c
             |  FROM marg)
             |SELECT round(n * (srat - 1), 4) AS chi2,
             |  round(sqrt((srat - 1) / least(r - 1, c - 1)), 4) AS cramers_v,
             |  CAST(r AS BIGINT) AS n_segments,
             |  CAST(c AS BIGINT) AS n_nations
             |FROM agg""".stripMargin)),

    // ClickHouse sumMap ([CH]): per-group map of key → summed value.
    // Two stacked hash aggregates — (user, type) sums collapse the
    // events first, then the per-user map assembles from the collapsed
    // grid, so the collect state is bounded by the event-type domain
    // (5 keys), not the user's event count. Sums are emitted as
    // 1e-4-scaled BIGINTs inside the canonical string: integer
    // rendering is identical on both engines, where double→string
    // formatting is not. Separator = ASCII unit separator, as in
    // q_agg_group_array (no text domain carries 0x1f).
    "q_agg_sum_map" -> QueryDef(
      (s, dir) => sumMap(Tables(s, dir, "events"),
          "user_id", "event_type", "value")
        .orderBy("user_id"),
      Some("""WITH g AS (
             |  SELECT user_id, event_type, sum(value) AS v
             |  FROM events GROUP BY user_id, event_type)
             |SELECT user_id,
             |  string_agg(event_type || ':' || CAST(CAST(round(v * 10000, 0) AS BIGINT) AS VARCHAR),
             |    chr(31) ORDER BY event_type) AS value_map,
             |  CAST(count(*) AS BIGINT) AS n_keys
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ClickHouse mannWhitneyUTest ([CH]): rank-sum test between
    // finished (F) and open (O) order values. Scale-safe ranking: the
    // fact table collapses to the DISTINCT-VALUE grid with per-group
    // counts first (one hash aggregate), average ranks come from a
    // cumulative-count window over that grid, and U / the tie-corrected
    // z are arithmetic on the 1-row fold. The sort input is the value
    // domain, never the order rows — the same collapse that makes the
    // weighted median scale.
    "q_agg_mann_whitney" -> QueryDef(
      (s, dir) => mannWhitneyU(Tables(s, dir, "orders"),
        col("o_orderstatus") === "F", col("o_orderstatus") === "O",
        col("o_totalprice")),
      Some("""WITH g AS (
             |  SELECT o_totalprice AS v,
             |    CAST(count(CASE WHEN o_orderstatus='F' THEN 1 END) AS DOUBLE) AS n1v,
             |    CAST(count(CASE WHEN o_orderstatus='O' THEN 1 END) AS DOUBLE) AS n2v
             |  FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY v),
             |r AS (
             |  SELECT v, n1v, n2v, n1v + n2v AS tv,
             |    sum(n1v + n2v) OVER (ORDER BY v) - (n1v + n2v) AS below
             |  FROM g),
             |s AS (
             |  SELECT sum(n1v) AS n1, sum(n2v) AS n2, sum(tv) AS n,
             |    sum(n1v * (below + (tv + 1) / 2)) AS r1,
             |    sum(tv*tv*tv - tv) AS ties
             |  FROM r)
             |SELECT round(r1 - n1*(n1+1)/2, 4) AS u1,
             |  round(n1*n2 - (r1 - n1*(n1+1)/2), 4) AS u2,
             |  round((r1 - n1*(n1+1)/2 - n1*n2/2)
             |    / sqrt(n1*n2/12 * ((n+1) - ties/(n*(n-1)))), 4) AS z,
             |  CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o
             |FROM s""".stripMargin)),

    // ClickHouse theilsU ([CH]): entropy-based association, both
    // directions (U(A|B) = (H(A)−H(A|B))/H(A) — unlike Cramér's V it
    // is asymmetric). Everything derives from the same observed
    // contingency cells as q_agg_cramers_v: one hash aggregate to the
    // cell grid (≤ segments × nations), margin windows over the grid,
    // two bounded distinct-margin folds. Zero cells never materialize
    // (they contribute 0·log0 = 0 by convention and are simply
    // absent).
    "q_agg_theils_u" -> QueryDef(
      (s, dir) => theilsU(Tables(s, dir, "customer"),
        "c_mktsegment", "c_nationkey"),
      Some("""WITH cells AS (
             |  SELECT c_mktsegment AS a, c_nationkey AS b, CAST(count(*) AS DOUBLE) AS nij
             |  FROM customer GROUP BY a, b),
             |m AS (
             |  SELECT a, b, nij,
             |    sum(nij) OVER (PARTITION BY a) AS ri,
             |    sum(nij) OVER (PARTITION BY b) AS cj,
             |    sum(nij) OVER () AS n
             |  FROM cells),
             |cond AS (
             |  SELECT -sum((nij/n) * ln(nij/cj)) AS hab,
             |         -sum((nij/n) * ln(nij/ri)) AS hba
             |  FROM m),
             |ha_t AS (
             |  SELECT -sum((ri/n) * ln(ri/n)) AS ha
             |  FROM (SELECT DISTINCT a, ri, n FROM m) t),
             |hb_t AS (
             |  SELECT -sum((cj/n) * ln(cj/n)) AS hb
             |  FROM (SELECT DISTINCT b, cj, n FROM m) t)
             |SELECT round((ha - hab)/ha, 4) AS u_a_given_b,
             |  round((hb - hba)/hb, 4) AS u_b_given_a,
             |  round(ha, 4) AS h_a, round(hb, 4) AS h_b
             |FROM cond, ha_t, hb_t""".stripMargin)),

    // ClickHouse avgWeighted ([CH]): Σwx/Σw per group — one map-side-
    // combined hash aggregate, two running sums of state per group.
    "q_agg_avg_weighted" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum(col("l_extendedprice") * col("l_quantity"))
            / sum(col("l_quantity")), 4).as("wavg_price"),
          round(sum(col("l_quantity")), 4).as("tot_w"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
             |  round(sum(l_quantity), 4) AS tot_w
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ClickHouse boundingRatio ([CH]): per-counter (max y − min y) /
    // (max x − min x) — the coarse average rate of a time series.
    // min/max pairs are O(1) mergeable state; single-point counters
    // yield NULL via the nullif guard (identical on both engines).
    "q_agg_bounding_ratio" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("user_id")
        .agg(
          round((max(col("value")) - min(col("value")))
            / expr("nullif(CAST(unix_timestamp(max(ts_s)) - unix_timestamp(min(ts_s)) AS DOUBLE), 0.0)"),
            8).as("brate"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  round((max(value) - min(value)) /
             |    nullif(CAST(date_diff('second', min(date_trunc('second', ts)),
             |      max(date_trunc('second', ts))) AS DOUBLE), 0), 8) AS brate,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ClickHouse corrMatrix ([CH] 23.x): all pairwise Pearson
    // correlations of four measures in ONE fact-table pass — six
    // corr() states side by side, each O(1) mergeable moments.
    "q_agg_corr_matrix" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("c_qty_price"),
          round(corr(col("l_quantity"), col("l_discount")), 4).as("c_qty_disc"),
          round(corr(col("l_quantity"), col("l_tax")), 4).as("c_qty_tax"),
          round(corr(col("l_extendedprice"), col("l_discount")), 4).as("c_price_disc"),
          round(corr(col("l_extendedprice"), col("l_tax")), 4).as("c_price_tax"),
          round(corr(col("l_discount"), col("l_tax")), 4).as("c_disc_tax")),
      Some("""SELECT
             |  round(corr(l_quantity, l_extendedprice), 4) AS c_qty_price,
             |  round(corr(l_quantity, l_discount), 4) AS c_qty_disc,
             |  round(corr(l_quantity, l_tax), 4) AS c_qty_tax,
             |  round(corr(l_extendedprice, l_discount), 4) AS c_price_disc,
             |  round(corr(l_extendedprice, l_tax), 4) AS c_price_tax,
             |  round(corr(l_discount, l_tax), 4) AS c_disc_tax
             |FROM lineitem""".stripMargin)),

    // ClickHouse studentTTest ([CH]): pooled-variance two-sample t —
    // the equal-variance companion of q_agg_ttest (Welch). Same
    // one-pass conditional-moment shape; dof is exact (n1+n2−2).
    "q_agg_student_ttest" -> QueryDef(
      (s, dir) => {
        val agg = Tables(s, dir, "orders").agg(
          avg(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("m1"),
          var_samp(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("v1"),
          count(when(col("o_orderstatus") === "F", col("o_totalprice")))
            .cast("double").as("n1"),
          avg(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("m2"),
          var_samp(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("v2"),
          count(when(col("o_orderstatus") === "O", col("o_totalprice")))
            .cast("double").as("n2"))
        agg.select(
          round((col("m1") - col("m2"))
            / sqrt(((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2"))
              / (col("n1") + col("n2") - 2)
              * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 4).as("t_stat"),
          (col("n1") + col("n2") - 2).cast("long").as("dof"))
      },
      Some("""WITH m AS (
             |  SELECT
             |    avg(CASE WHEN o_orderstatus='F' THEN o_totalprice END) AS m1,
             |    var_samp(CASE WHEN o_orderstatus='F' THEN o_totalprice END) AS v1,
             |    CAST(count(CASE WHEN o_orderstatus='F' THEN o_totalprice END) AS DOUBLE) AS n1,
             |    avg(CASE WHEN o_orderstatus='O' THEN o_totalprice END) AS m2,
             |    var_samp(CASE WHEN o_orderstatus='O' THEN o_totalprice END) AS v2,
             |    CAST(count(CASE WHEN o_orderstatus='O' THEN o_totalprice END) AS DOUBLE) AS n2
             |  FROM orders)
             |SELECT round((m1-m2)/sqrt(((n1-1)*v1+(n2-1)*v2)/(n1+n2-2)*(1/n1+1/n2)), 4) AS t_stat,
             |  CAST(n1+n2-2 AS BIGINT) AS dof FROM m""".stripMargin)),

    // ClickHouse minMap/maxMap ([CH]): per-group map of key →
    // min/max value. Same two-stacked-aggregate shape as sumMap —
    // collect state bounded by the key domain, canonical 0x1f-joined
    // `k:min:max` scaled-int string on both engines.
    "q_agg_minmax_map" -> QueryDef(
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        .groupBy("user_id")
        .agg(
          array_join(sort_array(collect_list(
            concat(col("event_type"), lit(":"),
              round(col("mn") * 10000, 0).cast("long").cast("string"), lit(":"),
              round(col("mx") * 10000, 0).cast("long").cast("string")))), "")
            .as("minmax_map"),
          count(lit(1)).as("n_keys"))
        .orderBy("user_id"),
      Some("""WITH g AS (
             |  SELECT user_id, event_type, min(value) AS mn, max(value) AS mx
             |  FROM events GROUP BY user_id, event_type)
             |SELECT user_id,
             |  string_agg(event_type || ':'
             |      || CAST(CAST(round(mn*10000,0) AS BIGINT) AS VARCHAR) || ':'
             |      || CAST(CAST(round(mx*10000,0) AS BIGINT) AS VARCHAR),
             |    chr(31) ORDER BY event_type) AS minmax_map,
             |  CAST(count(*) AS BIGINT) AS n_keys
             |FROM g GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // ClickHouse simpleLinearRegression ([CH]): per-group OLS of price
    // on quantity — slope/intercept/R² from one pass of mergeable
    // moment state per group (regr_* are covariance-moment folds).
    "q_agg_linreg_group" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("r2"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ClickHouse stochasticLinearRegression ([CH]) — here solved
    // EXACTLY: two-feature OLS (price ~ quantity + discount) via the
    // centered normal equations. Two map-side-combined scans: means
    // first, then the five centered second moments against the
    // broadcast 1-row means (centering kills the Σx² − (Σx)²/n
    // cancellation that would eat the 4-decimal oracle grid); the
    // 2×2 Cramer solve is a 1-row formula both engines evaluate on
    // the same moment doubles. ClickHouse's SGD variant trades this
    // exactness for one pass — at 100 TB both are two cheap
    // aggregates vs one, same shuffle shape (zero: scan-local
    // partials, 1-row exchange).
    // Two-proportion z-test ([CH] `proportionsZTest`) — the A/B-test
    // readout: users split into arms by the classic hash-mod bucket
    // (user_id % 2, exactly how experiment assignment works), each
    // arm's conversion = "heavy buyer": purchase count STRICTLY ABOVE
    // the population median purchase count, with the median DERIVED
    // IN THE QUERY on both engines (r6 hard-coded the fixture's
    // median of 14; a driver fixture regeneration could silently
    // saturate an arm — "≥ 1" converts 100%/100% and the z
    // denominator collapses; deriving it pins rates near 50% at any
    // SF by construction). The median is exact but GRID-BOUNDED: the
    // per-user counts collapse to a (purchase-count → n_users)
    // frequency grid first and the percentile runs frequency-weighted
    // over that — the aggregation buffer is the count domain (tens of
    // values), not O(users), the q_agg_percentile discipline. z from
    // the pooled-variance normal approximation, NULL-guarded at the
    // degenerate pool on both engines (ANSI Spark would otherwise
    // throw on the 0-variance divide). Scale shape: corpus → one
    // count per user (one map-side-combined aggregate) → value grid →
    // broadcast 1-row median onto the user grid → 2-row arm grid.
    "q_ab_ztest" -> QueryDef(
      (s, dir) => {
        // users is MATERIALIZED: the median grid and the arm split both
        // consume it — un-checkpointed, the events aggregate ran twice
        // (r15 plan audit). One row per user; guide §2.4.
        val users = Relational.eventsSec(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purch"))
          .localCheckpoint()
        val med = users.groupBy("purch").agg(count(lit(1)).as("freq"))
          .agg(percentile(col("purch"), lit(0.5), col("freq")).as("med"))
        val arms = users.crossJoin(broadcast(med))
          .select(col("user_id"),
            (col("purch").cast("double") > col("med")).cast("long").as("converted"))
          .groupBy((col("user_id") % 2).as("arm"))
          .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
        val g = arms.agg(
          min(when(col("arm") === 0, col("n"))).as("n0"),
          min(when(col("arm") === 0, col("conv"))).as("c0"),
          min(when(col("arm") === 1, col("n"))).as("n1"),
          min(when(col("arm") === 1, col("conv"))).as("c1"))
        val p0 = col("c0").cast("double") / col("n0")
        val p1 = col("c1").cast("double") / col("n1")
        val pPool = (col("c0") + col("c1")).cast("double") /
          (col("n0") + col("n1"))
        g.select(col("n0"), col("c0"), round(p0 + 1e-9, 4).as("rate0"),
            col("n1"), col("c1"), round(p1 + 1e-9, 4).as("rate1"),
            when(pPool > 0 && pPool < 1,
              round((p0 - p1) /
                sqrt(pPool * (lit(1.0) - pPool) *
                  (lit(1.0) / col("n0") + lit(1.0) / col("n1"))) + 1e-9, 4))
              .as("z"))
          .orderBy("n0")
      },
      Some("""WITH p AS (
             |  SELECT user_id,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS purch
             |  FROM events GROUP BY user_id),
             |m AS (SELECT quantile_cont(CAST(purch AS DOUBLE), 0.5) AS med
             |      FROM p),
             |u AS (
             |  SELECT user_id,
             |    CASE WHEN CAST(purch AS DOUBLE) > (SELECT med FROM m)
             |      THEN 1 ELSE 0 END AS converted
             |  FROM p),
             |arms AS (
             |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(converted) AS BIGINT) AS conv
             |  FROM u GROUP BY arm),
             |g AS (
             |  SELECT
             |    min(CASE WHEN arm = 0 THEN n END) AS n0,
             |    min(CASE WHEN arm = 0 THEN conv END) AS c0,
             |    min(CASE WHEN arm = 1 THEN n END) AS n1,
             |    min(CASE WHEN arm = 1 THEN conv END) AS c1
             |  FROM arms)
             |SELECT n0, c0,
             |  round(CAST(c0 AS DOUBLE) / n0 + 1e-9, 4) AS rate0,
             |  n1, c1,
             |  round(CAST(c1 AS DOUBLE) / n1 + 1e-9, 4) AS rate1,
             |  CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
             |    round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
             |      sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
             |           (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
             |           (1.0 / n0 + 1.0 / n1)) + 1e-9, 4) END AS z
             |FROM g""".stripMargin)),

    // Logistic regression by FULL-BATCH gradient descent — the
    // deterministic analog of ClickHouse's stochasticLogisticRegression
    // (reference layer [CH]; SGD's per-row update order is
    // executor-scheduling-dependent, so the reproducible distributed
    // form is the batch gradient: same fixed point, same API shape).
    // Each of the 12 iterations is ONE map-side-combined aggregate
    // over the cached feature projection (3 doubles/row); only the
    // 3-double gradient crosses to the driver per step — model-scale,
    // like the k-means centroid loop. Features are scaled by fixture
    // constants (not standardized) to keep the pass count at 1.
    // The oracle unrolls the identical 12 steps as chained CTEs —
    // generated by [[logregOracle]], not hand-written. Cross-engine
    // drift (sum order + libm exp ulps) compounds only linearly over
    // 12 iterations (~1e-12), far under the shared 1e-9 nudge.
    "q_logreg_gd" -> QueryDef(
      (s, dir) => {
        val feats = Tables(s, dir, "lineitem")
          .select(
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"),
            (col("l_quantity") / 50.0).as("x1"),
            (col("l_extendedprice") / 100000.0).as("x2"))
          .persist()
        def sig(a: Double, b: Double, c: Double) =
          lit(1.0) / (lit(1.0) +
            exp(-(lit(a) + lit(b) * col("x1") + lit(c) * col("x2"))))
        // Weights flow as a broadcast ONE-ROW relation, not literals:
        // embedding (a, b, c) as literals gave every iteration a
        // textually different generated-code body, so all 12 rounds
        // paid a fresh whole-stage-codegen compile (r15 profile: task
        // time ~0.9 s of a ~2.9 s query — the rest was per-iteration
        // planning/compile). With the weights as columns the 12 plans
        // are codegen-identical and the compile cache hits after round
        // one. Same expression tree over the same doubles → identical
        // gradients. Guide §1.2 step 2 / §4 (expression choice).
        val sigW =
          lit(1.0) / (lit(1.0) +
            exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2"))))
        var (a, b, c) = (0.0, 0.0, 0.0)
        (1 to LogRegIters).foreach { _ =>
          import s.implicits._
          val w = Seq((a, b, c)).toDF("w0", "w1", "w2")
          val g = feats.crossJoin(broadcast(w)).agg(
            avg(sigW - col("y")).as("g0"),
            avg((sigW - col("y")) * col("x1")).as("g1"),
            avg((sigW - col("y")) * col("x2")).as("g2")).head()
          a -= LogRegEta * g.getDouble(0)
          b -= LogRegEta * g.getDouble(1)
          c -= LogRegEta * g.getDouble(2)
        }
        val p = sig(a, b, c)
        val out = feats.agg(
            round(avg(-(col("y") * log(p) +
              (lit(1.0) - col("y")) * log(lit(1.0) - p))) + 1e-9, 4)
              .as("log_loss"),
            count(lit(1)).as("n"))
          .select(
            round(lit(a) + 1e-9, 4).as("w0"),
            round(lit(b) + 1e-9, 4).as("w_quantity"),
            round(lit(c) + 1e-9, 4).as("w_price"),
            col("log_loss"), col("n"))
        feats.unpersist(blocking = false)
        out
      },
      Some(logregOracle(LogRegIters, LogRegEta))),

    "q_linreg_multi" -> QueryDef(
      (s, dir) => olsTwoFeature(Tables(s, dir, "lineitem"),
        col("l_quantity"), col("l_discount"), col("l_extendedprice"))
        .toDF("b_quantity", "b_discount", "b0", "n"),
      Some("""WITH m AS (
             |  SELECT avg(l_quantity) AS m1, avg(l_discount) AS m2,
             |    avg(l_extendedprice) AS my
             |  FROM lineitem),
             |s AS (
             |  SELECT
             |    sum((l_quantity - m1) * (l_quantity - m1)) AS s11,
             |    sum((l_quantity - m1) * (l_discount - m2)) AS s12,
             |    sum((l_discount - m2) * (l_discount - m2)) AS s22,
             |    sum((l_quantity - m1) * (l_extendedprice - my)) AS s1y,
             |    sum((l_discount - m2) * (l_extendedprice - my)) AS s2y,
             |    any_value(m1) AS m1, any_value(m2) AS m2, any_value(my) AS my,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem CROSS JOIN m)
             |SELECT
             |  round((s22*s1y - s12*s2y) / (s11*s22 - s12*s12) + 1e-9, 4)
             |    AS b_quantity,
             |  round((s11*s2y - s12*s1y) / (s11*s22 - s12*s12) + 1e-9, 4)
             |    AS b_discount,
             |  round(my - ((s22*s1y - s12*s2y) / (s11*s22 - s12*s12)) * m1
             |           - ((s11*s2y - s12*s1y) / (s11*s22 - s12*s12)) * m2
             |    + 1e-9, 4) AS b0,
             |  n
             |FROM s""".stripMargin)),

    // ClickHouse rankCorr ([CH]): Spearman rank correlation between
    // two numeric columns. Average ranks (midrank ties) come from
    // cumulative-count windows over each column's DISTINCT-VALUE grid
    // — quantity has ~50 distinct values and discount ~11, so both
    // rank tables are broadcast-sized at any corpus scale; the fact
    // table joins them map-side and folds through one corr() pass.
    // Spearman = Pearson on the midranks (the textbook definition
    // with ties).
    "q_agg_rank_corr" -> QueryDef(
      (s, dir) => spearman(Tables(s, dir, "lineitem"),
        col("l_quantity"), col("l_discount")),
      Some("""WITH gq AS (
             |  SELECT l_quantity AS v, CAST(count(*) AS DOUBLE) AS c FROM lineitem GROUP BY v),
             |rq AS (
             |  SELECT v, sum(c) OVER (ORDER BY v) - c + (c + 1)/2 AS r FROM gq),
             |gd AS (
             |  SELECT l_discount AS v, CAST(count(*) AS DOUBLE) AS c FROM lineitem GROUP BY v),
             |rd AS (
             |  SELECT v, sum(c) OVER (ORDER BY v) - c + (c + 1)/2 AS r FROM gd)
             |SELECT round(corr(rq.r, rd.r), 4) AS spearman,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem l
             |JOIN rq ON l.l_quantity = rq.v
             |JOIN rd ON l.l_discount = rd.v""".stripMargin)),

    // ClickHouse kolmogorovSmirnovTest ([CH]): two-sample KS between
    // finished (F) and open (O) order values — D = sup |F̂₁ − F̂₂| plus
    // the scaled statistic √(n₁n₂/(n₁+n₂))·D. Same value-grid
    // collapse as the Mann–Whitney: one hash aggregate to distinct
    // values with per-group counts, both empirical CDFs from ONE
    // cumulative window over that grid, a 1-row max fold. The sort
    // input is the value domain, never the order rows.
    "q_agg_ks_test" -> QueryDef(
      (s, dir) => ksTest(Tables(s, dir, "orders"),
        col("o_orderstatus") === "F", col("o_orderstatus") === "O",
        col("o_totalprice")),
      Some("""WITH g AS (
             |  SELECT o_totalprice AS v,
             |    CAST(count(CASE WHEN o_orderstatus='F' THEN 1 END) AS DOUBLE) AS c1,
             |    CAST(count(CASE WHEN o_orderstatus='O' THEN 1 END) AS DOUBLE) AS c2
             |  FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY v),
             |c AS (
             |  SELECT sum(c1) OVER (ORDER BY v) AS f1, sum(c2) OVER (ORDER BY v) AS f2,
             |    sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
             |  FROM g)
             |SELECT round(max(abs(f1/n1 - f2/n2)), 4) AS d_stat,
             |  round(sqrt(any_value(n1)*any_value(n2)/(any_value(n1)+any_value(n2)))
             |    * max(abs(f1/n1 - f2/n2)), 4) AS ks_stat,
             |  CAST(any_value(n1) AS BIGINT) AS n_f,
             |  CAST(any_value(n2) AS BIGINT) AS n_o
             |FROM c""".stripMargin)),

    // ClickHouse arrayAUC ([CH] — the ML-eval staple): area under the
    // ROC curve of `value` as a score for purchase/signup events, by
    // trapezoid over the tie-grouped curve (ClickHouse's own
    // algorithm: sort by score desc, cumulative TP/FP, Σ ΔFP·(TP+TP₋₁)/2,
    // normalized by P·N). Scale shape: the fact rows collapse FIRST to
    // the distinct-score grid (scores binned to 2 decimals — the
    // production "binned ROC" move that bounds the grid by the score
    // domain, not the data); the cumulative window and the 1-row final
    // fold run over that bounded grid, the mann_whitney/ks_test
    // posture. Integer TP/FP counts end-to-end — the only doubles are
    // the final normalization, nudged past the rounding boundary on
    // both engines.
    "q_agg_auc" -> QueryDef(
      (s, dir) => rocAuc(Tables(s, dir, "events"),
        col("event_type").isin("purchase", "signup"),
        round(col("value") + 1e-9, 2)),
      Some("""WITH g AS (
             |  SELECT round(value + 1e-9, 2) AS score,
             |    sum(CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END) AS np,
             |    sum(CASE WHEN event_type IN ('purchase','signup') THEN 0 ELSE 1 END) AS nn
             |  FROM events GROUP BY score),
             |c AS (
             |  SELECT score,
             |    sum(np) OVER (ORDER BY score DESC) AS tp,
             |    sum(nn) OVER (ORDER BY score DESC) AS fp
             |  FROM g),
             |p AS (
             |  SELECT tp, fp,
             |    coalesce(lag(tp) OVER (ORDER BY score DESC), 0) AS tp0,
             |    coalesce(lag(fp) OVER (ORDER BY score DESC), 0) AS fp0
             |  FROM c)
             |SELECT round(sum(CAST((fp - fp0) * (tp + tp0) AS DOUBLE))
             |    / (2.0 * max(tp) * max(fp)) + 1e-9, 4) AS auc,
             |  CAST(max(tp) AS BIGINT) AS n_pos,
             |  CAST(max(fp) AS BIGINT) AS n_neg
             |FROM p""".stripMargin)),

    // ClickHouse analysisOfVariance / anova ([CH] 23.11+): one-way
    // F-test of `value` across the event-type groups. Two stacked
    // hash aggregates: fact rows → per-group (n, mean, s²) — map-side
    // combined, O(groups) through the exchange — then the 1-row
    // between/within decomposition (SSB/(k−1)) / (SSW/(N−k)). The
    // grand mean is recomputed from the group moments (Σnᵢmᵢ/N), so no
    // second pass over the data. Same formula arithmetic on both
    // engines (var_samp), rounded past the boundary.
    "q_agg_anova" -> QueryDef(
      (s, dir) => anovaF(Tables(s, dir, "events"),
        col("event_type"), col("value")),
      Some("""WITH g AS (
             |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             |    avg(value) AS m, var_samp(value) AS v
             |  FROM events GROUP BY event_type)
             |SELECT
             |  round(((sum(n*m*m) - pow(sum(n*m), 2) / sum(n)) / (count(*) - 1))
             |    / (sum((n-1)*v) / (sum(n) - count(*))) + 1e-9, 4) AS f_stat,
             |  CAST(count(*) - 1 AS BIGINT) AS df_between,
             |  CAST(sum(n) - count(*) AS BIGINT) AS df_within,
             |  CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(n) AS BIGINT) AS n_rows
             |FROM g""".stripMargin)),

    // ClickHouse skewPop/kurtPop ([CH]): population skewness and
    // excess kurtosis of order values per status, via explicit
    // central moments (see momentsSkewKurt — the built-ins disagree
    // on bias correction between engines, the formula is portable).
    // Group-means pass, broadcast join for centering, one grid-keyed
    // power-sum aggregate, O(groups) everywhere past the scans.
    "q_agg_moments" -> QueryDef(
      (s, dir) => momentsSkewKurt(Tables(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"))
        .withColumnRenamed("g", "o_orderstatus")
        .orderBy("o_orderstatus"),
      Some("""WITH m AS (
             |  SELECT o_orderstatus AS g, avg(o_totalprice) AS m
             |  FROM orders GROUP BY 1),
             |s AS (
             |  SELECT g, CAST(count(*) AS DOUBLE) AS n,
             |    sum((o_totalprice - m) * (o_totalprice - m)) AS s2,
             |    sum((o_totalprice - m) * (o_totalprice - m) * (o_totalprice - m)) AS s3,
             |    sum((o_totalprice - m) * (o_totalprice - m) * (o_totalprice - m)
             |        * (o_totalprice - m)) AS s4
             |  FROM orders JOIN m ON o_orderstatus = g GROUP BY g)
             |SELECT g AS o_orderstatus,
             |  round((s3 / n) / pow(s2 / n, 1.5) + 1e-9, 4) AS skew_pop,
             |  round((s4 / n) / pow(s2 / n, 2) - 3.0 + 1e-9, 4) AS kurt_excess,
             |  CAST(n AS BIGINT) AS n
             |FROM s ORDER BY o_orderstatus""".stripMargin)),

    // ClickHouse editDistance/stringDistance family ([CH]): classic
    // Levenshtein between each customer's name and its nation's name,
    // plus the length-normalized similarity. The 25-row nation
    // dimension broadcasts (dictGet shape); the distance itself is a
    // row-local codegen'd function — zero shuffle beyond the
    // broadcast exchange.
    "q_str_distance" -> QueryDef(
      (s, dir) => {
        val nation = Tables(s, dir, "nation")
          .select(col("n_nationkey"), upper(col("n_name")).as("nname"))
        Tables(s, dir, "customer")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"),
            levenshtein(upper(col("c_name")), col("nname")).cast("long").as("lev"),
            round(lit(1.0) - levenshtein(upper(col("c_name")), col("nname")) /
              greatest(length(col("c_name")), length(col("nname"))).cast("double"), 4)
              .as("name_sim"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CAST(levenshtein(upper(c_name), upper(n_name)) AS BIGINT) AS lev,
             |  round(1.0 - levenshtein(upper(c_name), upper(n_name))
             |    / CAST(greatest(length(c_name), length(n_name)) AS DOUBLE), 4) AS name_sim
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    // Mutual-information feature screening ([LLM] — the filter-method
    // feature selector curation pipelines run before training a
    // quality classifier: rank candidate features by MI with the
    // label). Three derived features (event hour, user id mod 7,
    // floor(value) mod 10) are screened against the event-type label:
    // MI(L;F) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), the marginal
    // entropies via the same cell grid (Σ_x n_xy = n_y makes
    // H(L) = Σ_cells (n_xy/N)·(−ln(n_y/N)) — no second aggregate),
    // and normalized MI = MI/√(H(L)·H(F)). Shape: ONE scan fans each
    // row into 3 (feature, value) pairs row-locally; the only shuffle
    // is the hash aggregate onto the (feature × fval × label) CELL
    // GRID (≤ 3·24·|labels| cells — the domain, not the data);
    // marginals are windows OVER THE GRID and the final per-feature
    // summary is 3 rows. At 100 TB this is a map-side-combined count
    // whose shuffle carries cells only. Determinism: every count is
    // an exact integer, both engines evaluate the identical
    // written-out double expressions per cell, and the ≤360-term sum
    // reassociation is absorbed by the 1e-9 round nudge.
    "q_mutual_info" -> QueryDef(
      (s, dir) => {
        val cells = Relational.eventsSec(s, dir)
          .select(col("event_type"),
            explode(array(
              struct(lit("hour_of_day").as("fname"),
                hour(col("ts_s")).cast("long").as("fval")),
              struct(lit("user_mod7").as("fname"),
                pmod(col("user_id"), lit(7L)).as("fval")),
              struct(lit("value_mod10").as("fname"),
                pmod(floor(col("value")).cast("long"), lit(10L)).as("fval"))))
              .as("f"))
          .groupBy(col("f.fname").as("fname"), col("f.fval").as("fval"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val g = cells
          .withColumn("nxy", col("c").cast("double"))
          .withColumn("n",
            sum(col("c")).over(Window.partitionBy("fname")).cast("double"))
          .withColumn("nx",
            sum(col("c")).over(Window.partitionBy("fname", "fval"))
              .cast("double"))
          .withColumn("ny",
            sum(col("c")).over(Window.partitionBy("fname", "event_type"))
              .cast("double"))
        g.groupBy("fname")
          .agg(count(lit(1)).as("n_cells"),
            sum(col("nxy") / col("n") *
              log(col("nxy") * col("n") / (col("nx") * col("ny"))))
              .as("mi_r"),
            sum(col("nxy") / col("n") * -log(col("ny") / col("n")))
              .as("hl_r"),
            sum(col("nxy") / col("n") * -log(col("nx") / col("n")))
              .as("hf_r"))
          .select(col("fname"), col("n_cells"),
            round(col("mi_r") + 1e-9, 4).as("mi"),
            round(col("hl_r") + 1e-9, 4).as("h_label"),
            round(col("hf_r") + 1e-9, 4).as("h_feat"),
            round(col("mi_r") / sqrt(col("hl_r") * col("hf_r")) + 1e-9, 4)
              .as("nmi"))
          .orderBy("fname")
      },
      Some("""WITH base AS (
             |  SELECT event_type, date_trunc('second', ts) AS ts_s,
             |    user_id, value
             |  FROM events),
             |feats AS (
             |  SELECT event_type, 'hour_of_day' AS fname,
             |    CAST(extract('hour' FROM ts_s) AS BIGINT) AS fval FROM base
             |  UNION ALL
             |  SELECT event_type, 'user_mod7', ((user_id % 7) + 7) % 7
             |  FROM base
             |  UNION ALL
             |  SELECT event_type, 'value_mod10',
             |    ((CAST(floor(value) AS BIGINT) % 10) + 10) % 10 FROM base),
             |cells AS (
             |  SELECT fname, fval, event_type, count(*) AS c
             |  FROM feats GROUP BY 1, 2, 3),
             |m AS (
             |  SELECT fname, fval, event_type,
             |    CAST(c AS DOUBLE) AS nxy,
             |    CAST(sum(c) OVER (PARTITION BY fname) AS DOUBLE) AS n,
             |    CAST(sum(c) OVER (PARTITION BY fname, fval) AS DOUBLE)
             |      AS nx,
             |    CAST(sum(c) OVER (PARTITION BY fname, event_type)
             |      AS DOUBLE) AS ny
             |  FROM cells)
             |SELECT fname, CAST(count(*) AS BIGINT) AS n_cells,
             |  round(sum(nxy / n * ln(nxy * n / (nx * ny))) + 1e-9, 4) AS mi,
             |  round(sum(nxy / n * -ln(ny / n)) + 1e-9, 4) AS h_label,
             |  round(sum(nxy / n * -ln(nx / n)) + 1e-9, 4) AS h_feat,
             |  round(sum(nxy / n * ln(nxy * n / (nx * ny)))
             |    / sqrt(sum(nxy / n * -ln(ny / n))
             |      * sum(nxy / n * -ln(nx / n))) + 1e-9, 4) AS nmi
             |FROM m GROUP BY fname ORDER BY fname""".stripMargin)))
}
