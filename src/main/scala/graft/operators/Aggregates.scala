package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.D — aggregations. [R] seed: retention arithmetic
  * (env.sh:26–29) and per-tier snapshot grouping (backup.sh:21–34) are
  * group-by-bucket semantics; the multi-dimensional forms are [CH].
  *
  * All shapes are HashAggregate with map-side partial aggregation — one
  * shuffle of the (small) group space, not the rows. ROLLUP/CUBE expand
  * each input row into its grouping-set combinations BEFORE the partial
  * aggregate, so the shuffle stays proportional to groups × sets.
  * Doubles rounded to 4 on both sides (SURVEY.md §5.3.2); NULL group
  * markers coalesced to sentinels on both sides because Spark and
  * DuckDB order NULLs differently.
  */
object Aggregates extends QueryModule {

  /** Coarse bucket width for the weighted-median crossing search —
    * price-scaled so the fixture's ~100 k-wide price domain yields
    * ~100 buckets; the two window inputs are then O(100) and
    * O(grid/100) rows per group.
    */
  private val MedianBucketWidth = 1000.0

  /** q_agg_histogram_fold's grid (one bin per ⌊price/100⌋ mod 53
    * residue) and target bin count — 53 is prime so the residues mix
    * price mass, and every residue is populated at both fixture SFs
    * (HistogramSpec pins the precondition the 43-stage oracle needs).
    */
  private[graft] val HistFoldGrid = 53
  private[graft] val HistFoldBins = 10

  /** The canonical BHTT compaction as one row-local `aggregate()` HOF
    * over the sorted (lo, hi, s, w) bin array `bs`: G − n iterations,
    * each locating the first closest-mean adjacent pair (strict <, so
    * the LOWEST index wins ties — HistogramAgg.compact's exact rule)
    * and splicing in the merged bin. SQL lambdas have no let-binding,
    * so the argmin subexpression is interpolated at each use — same
    * arithmetic, evaluated on a ≤53-element array on ONE row.
    */
  private[graft] def histFoldExpr: String = {
    def mean(i: String) = s"element_at(acc, $i).s / element_at(acc, $i).w"
    val pick =
      s"""aggregate(sequence(1, size(acc) - 1),
         |  named_struct('i', 0, 'g', CAST('Infinity' AS DOUBLE)),
         |  (st, i) -> CASE WHEN ${mean("i + 1")} - ${mean("i")} < st.g
         |    THEN named_struct('i', i, 'g', ${mean("i + 1")} - ${mean("i")})
         |    ELSE st END).i""".stripMargin
    // total over ANY grid size: with ≤ HistFoldBins populated bins
    // there is nothing to merge, and a bare sequence(1, size - bins)
    // would default to step -1 (sequence(1,0) = [1,0]) and run
    // spurious merges — the CASE makes the no-op explicit instead of
    // relying on the fixture precondition alone (r9 ADVICE item 1)
    s"""CASE WHEN size(bs) > $HistFoldBins THEN
       |  aggregate(sequence(1, size(bs) - $HistFoldBins), bs, (acc, k) ->
       |    concat(
       |      slice(acc, 1, ($pick) - 1),
       |      array(named_struct(
       |        'lo', least(element_at(acc, $pick).lo,
       |                    element_at(acc, ($pick) + 1).lo),
       |        'hi', greatest(element_at(acc, $pick).hi,
       |                       element_at(acc, ($pick) + 1).hi),
       |        's', element_at(acc, $pick).s + element_at(acc, ($pick) + 1).s,
       |        'w', element_at(acc, $pick).w + element_at(acc, ($pick) + 1).w)),
       |      slice(acc, ($pick) + 2, size(acc) - ($pick) - 1)))
       |ELSE bs END""".stripMargin
  }

  /** The generated DuckDB oracle: the IDENTICAL 43-merge walk as
    * chained materialized CTEs — stage k picks the first closest-mean
    * adjacent pair of s_k (ORDER BY gap, idx ≡ the kernel's strict-<
    * first-index tie rule) and renumbers after the splice. Every
    * number in the walk is an exact-integer-valued double or the same
    * written-out division/subtraction, so the replay is epsilon-free
    * (the q_sim_pq_codes generated-oracle pattern).
    */
  private[graft] def histFoldOracle: String = {
    val stages = (0 until (HistFoldGrid - HistFoldBins)).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT a.idx AS i FROM s$k a JOIN s$k b ON b.idx = a.idx + 1
         |  ORDER BY b.s / b.w - a.s / a.w, a.idx LIMIT 1),
         |s${k + 1} AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY oi) AS idx, s, w, lo, hi FROM (
         |    SELECT t.idx AS oi, t.s, t.w, t.lo, t.hi
         |    FROM s$k t, p$k p WHERE t.idx <> p.i AND t.idx <> p.i + 1
         |    UNION ALL
         |    SELECT a.idx, a.s + b.s, a.w + b.w,
         |           least(a.lo, b.lo), greatest(a.hi, b.hi)
         |    FROM s$k a JOIN s$k b ON b.idx = a.idx + 1, p$k p
         |    WHERE a.idx = p.i))""".stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY v) AS idx,
       |         CAST(v AS DOUBLE) * w AS s, w,
       |         CAST(v AS DOUBLE) AS lo, CAST(v AS DOUBLE) AS hi
       |  FROM (SELECT (CAST(floor(o_totalprice / 100) AS BIGINT) % $HistFoldGrid) AS v,
       |               CAST(count(*) AS BIGINT) AS w
       |        FROM orders GROUP BY 1)),
       |$stages
       |SELECT CAST(idx - 1 AS BIGINT) AS bin_idx,
       |       round(lo, 4) AS bin_lower, round(hi, 4) AS bin_upper,
       |       CAST(w AS BIGINT) AS n
       |FROM s${HistFoldGrid - HistFoldBins} ORDER BY bin_idx""".stripMargin
  }

  /** q_agg_percentile's quantile points, shared by the DataFrame and
    * SQL-text forms and by the rewrite-equivalence spec.
    */
  private[graft] val PercentileQs = Seq(0.5, 0.9, 0.99)

  /** Exact interpolated percentiles via ONE cumulative-count window —
    * the r15 rewrite of the `percentile(value, qs, freq)` aggregate
    * form ([[exactPercentilesAgg]], kept as the spec reference).
    *
    * Why (r15 profile, sf0.1): l_extendedprice is ~99% distinct
    * (594,330 grid rows / 600,000 rows), so the (group, value) grid
    * collapse bought NO state reduction — it just paid one extra
    * exchange — and the `percentile` TypedImperativeAggregate then
    * shuffled 5.4 MB of serialized OpenHashMap buffers per partial and
    * spent ~1.3 s single-threaded in its final merge+sort, outside
    * whole-stage codegen. This form: one exchange on the group key,
    * one sort (the window), and plain min/max DeclarativeAggregates —
    * codegen end to end (guide §2.3 shuffle fewer bytes, §2.4 one less
    * exchange, §4 prefer built-in/codegen expressions).
    *
    * Exactness: `cum` uses the default RANGE frame (ties included), so
    * for every row `cum` = #rows with value ≤ this value — the
    * inclusive cumulative count of the distinct value. The value at
    * 0-based expanded index i is the FIRST value with cum > i, i.e.
    * min(value | cum > i) since values ascend with cum. Interpolation
    * reproduces Percentile.getPercentile literally:
    * position = q·(N−1); lower/higher = floor/ceil;
    * v = v_lo·(higher − position) + v_hi·(position − lower), v_lo when
    * the position is integral — same doubles, same operation order,
    * bit-identical to the aggregate form (PercentileRewriteSpec pins
    * it).
    */
  private[graft] def exactPercentilesWindow(lineitem: DataFrame): DataFrame = {
    val byVal = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val all = Window.partitionBy("l_returnflag")
    val cum = lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("cum", count(lit(1)).over(byVal))
      .withColumn("n", count(lit(1)).over(all))
    def pos(q: Double) = lit(q) * (col("n") - 1).cast("double")
    val aggs = PercentileQs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        min(when(col("cum") > floor(pos(q)), col("l_extendedprice"))).as(s"vlo_$i"),
        min(when(col("cum") > ceil(pos(q)), col("l_extendedprice"))).as(s"vhi_$i"))
    } ++ Seq(
      max(col("n")).as("n"),
      round(min(col("l_extendedprice")), 4).as("p_min"),
      round(max(col("l_extendedprice")), 4).as("p_max"))
    val a = cum.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    def interp(q: Double, i: Int) = {
      val p = pos(q)
      val lo = floor(p)
      val hi = ceil(p)
      round(when(lo === hi, col(s"vlo_$i"))
        .otherwise(col(s"vlo_$i") * (hi.cast("double") - p) +
          col(s"vhi_$i") * (p - lo.cast("double"))), 4)
    }
    a.select(col("l_returnflag"),
        interp(0.5, 0).as("p50"), interp(0.9, 1).as("p90"),
        interp(0.99, 2).as("p99"), col("p_min"), col("p_max"))
      .orderBy("l_returnflag")
  }

  /** The `percentile(value, array(qs), freq)` aggregate form over the
    * (group, value) grid — the pre-r15 declared plan, kept as the
    * reference [[exactPercentilesWindow]] is spec-pinned against.
    */
  private[graft] def exactPercentilesAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("c"))
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), c)").as("ps"),
        round(min(col("l_extendedprice")), 4).as("p_min"),
        round(max(col("l_extendedprice")), 4).as("p_max"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p50"),
        round(element_at(col("ps"), 2), 4).as("p90"),
        round(element_at(col("ps"), 3), 4).as("p99"),
        col("p_min"), col("p_max"))
      .orderBy("l_returnflag")

  /** Exact weighted median, two-phase (see the q_agg_weighted_median
    * comment). Phase 1 windows over bucket subtotals, phase 2 over the
    * crossing bucket's grid rows only; the crossing row is identical
    * to the one-window form because weights are integral (exact double
    * sums) and bucket subtotal order ≡ price order.
    */
  private[graft] def weightedMedianTwoPhase(lineitem: DataFrame): DataFrame = {
    // ONE scan+aggregate for the (group, value) grid, materialized —
    // the coarse-bucket branch and the fine in-bucket branch both read
    // it, and WITHOUT materialization Catalyst plans two full
    // scan+grid-aggregate subtrees (exchange reuse can't fire: the
    // join branch pushes an extra IsNotNull(l_returnflag) into its
    // scan, so the subtrees never canonicalize equal — r15 profile:
    // two 560 ms / 7.2 MB-shuffle map stages for one logical grid).
    // Guide §2.4 (remove shuffles outright) / §3.3 (materialize to
    // stop duplicate subtrees); grid-scale rows, never raw rows.
    val grid = lineitem
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("bkt", floor(col("l_extendedprice") / MedianBucketWidth))
      .localCheckpoint()
    val byBkt = Window.partitionBy("l_returnflag").orderBy("bkt")
    val allB = Window.partitionBy("l_returnflag")
    val coarse = grid.groupBy("l_returnflag", "bkt")
      .agg(sum(col("w")).as("wb"))
      .select(col("l_returnflag"), col("bkt"), col("wb"),
        sum(col("wb")).over(byBkt).as("cumb"),
        sum(col("wb")).over(allB).as("tot"))
    // the crossing bucket per group, with the cumulative weight carried
    // into it (min(struct) picks the lowest bucket's row atomically)
    val star = coarse.filter(col("cumb") >= col("tot") * 0.5)
      .groupBy("l_returnflag")
      .agg(min(struct(col("bkt"), (col("cumb") - col("wb")).as("carry"),
        col("tot"))).as("s"))
      .select(col("l_returnflag"), col("s.bkt").as("bstar"),
        col("s.carry").as("carry"), col("s.tot").as("tot"))
    val byVal = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    grid.join(broadcast(star), Seq("l_returnflag"))
      .filter(col("bkt") === col("bstar"))
      .withColumn("cum", sum(col("w")).over(byVal))
      .filter(col("carry") + col("cum") >= col("tot") * 0.5)
      .groupBy("l_returnflag")
      .agg(round(min(col("l_extendedprice")), 4).as("weighted_median"))
      .orderBy("l_returnflag")
  }

  /** Per-user time-ordered event-initial string (s c p e v — initials
    * are unique in the fixture's event alphabet), shared by the
    * sequenceMatch/sequenceCount pair. Ordered by (ts, event_id) so
    * the string is deterministic under ties on any engine.
    */
  private def userEventSeq(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Relational.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"),
        substring(col("event_type"), 1, 1).as("ch"))
      .groupBy("user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_s"), col("event_id"), col("ch")))),
          x => x.getField("ch")), "").as("seq"))

  /** The one-window reference form of the weighted median — the
    * direct transcription of the oracle SQL; WeightedMedianSpec pins
    * the two-phase rewrite against it.
    */
  private[graft] def weightedMedianOneWindow(lineitem: DataFrame): DataFrame = {
    val byVal = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val all = Window.partitionBy("l_returnflag")
    lineitem
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(sum(col("l_quantity")).as("w"))
      .select(col("l_returnflag"), col("l_extendedprice"),
        sum(col("w")).over(byVal).as("cumw"),
        sum(col("w")).over(all).as("tot"))
      .filter(col("cumw") >= col("tot") * 0.5)
      .groupBy("l_returnflag")
      .agg(round(min(col("l_extendedprice")), 4).as("weighted_median"))
      .orderBy("l_returnflag")
  }

  def entries: Map[String, QueryDef] = Map(

    // TPC-H Q1 shape: the canonical partial+final hash aggregate.
    "q_agg_hash" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  round(sum(l_extendedprice), 4) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Exact distinct: Spark expands to a two-phase aggregate
    // (distinct-key partial, then count) — no driver materialization.
    "q_agg_distinct" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |       CAST(count(*) AS BIGINT) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ClickHouse `retention(cond1, …, condN)`: per user, flag i is
    // cond_i AND cond_1; the summed flags give the classic
    // did-X-after-entering funnel counts. Two stacked hash aggregates
    // — per-user bool flags (map-side-combined on user_id), then a
    // single-row global sum; no window, no join, no ordering
    // dependence.
    "q_retention_flags" -> QueryDef(
      (s, dir) => {
        def did(t: String) = max(when(col("event_type") === t, 1L).otherwise(0L))
        Relational.eventsSec(s, dir)
          .groupBy("user_id")
          .agg(did("signup").as("c1"), did("view").as("c2"), did("purchase").as("c3"))
          .agg(sum(col("c1")).as("n_entered"),
            sum(col("c1") * col("c2")).as("n_viewed"),
            sum(col("c1") * col("c3")).as("n_purchased"))
          // single row, but every declared query ends ordered (README
          // invariant; generic tooling may rely on it)
          .orderBy("n_entered")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c1,
             |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
             |  FROM events GROUP BY user_id)
             |SELECT CAST(sum(c1) AS BIGINT) AS n_entered,
             |       CAST(sum(c1 * c2) AS BIGINT) AS n_viewed,
             |       CAST(sum(c1 * c3) AS BIGINT) AS n_purchased
             |FROM u ORDER BY n_entered""".stripMargin)),

    // ClickHouse -If combinators (sumIf/countIf/avgIf): conditional
    // aggregation without a pre-filter, so one pass computes every
    // branch. `agg(when(cond, x))` compiles to the same partial+final
    // hash aggregate as the unconditional form — the condition is a
    // row-local projection, no extra scan or shuffle per branch.
    "q_agg_conditional" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 4)
            .as("sum_discounted"),
          count(when(col("l_tax") > 0.04, lit(1))).as("n_taxed"),
          round(avg(when(col("l_quantity") < 10, col("l_extendedprice"))), 4)
            .as("avg_small"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4) AS sum_discounted,
             |  CAST(count(*) FILTER (WHERE l_tax > 0.04) AS BIGINT) AS n_taxed,
             |  round(avg(l_extendedprice) FILTER (WHERE l_quantity < 10), 4) AS avg_small
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ClickHouse uniqUpTo(N): exact distinct count saturating at N+1 —
    // "more than N" without paying for exactness beyond the threshold.
    // The typed UniqUpToAgg aggregator caps the PER-GROUP STATE at N+1
    // entries too (a bare least(countDistinct, N+1) shuffles the full
    // distinct set of every group — unbounded state for a saturated
    // answer); UniqUpToSpec pins value-equivalence with the exact form.
    "q_agg_uniq_upto" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.UniqUpToAgg(col("user_id"), 100).as("uniq_upto_100"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(least(count(DISTINCT user_id), 101) AS BIGINT) AS uniq_upto_100
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ClickHouse quantileExactWeighted(0.5): the weight-aware median
    // Spark has no built-in for. Two-phase exact crossing search — the
    // group key has cardinality 3, so ANY per-group cumulative window
    // funnels its whole input through 3 reducer sorts; the fix is to
    // keep that input tiny twice over:
    //  1. collapse the fact table to the (group, value) weight grid
    //     (map-side-combined hash aggregate — ties collapse, so ROWS
    //     ≡ RANGE cumsum), then to a COARSE grid of value buckets;
    //     the per-group cumulative window runs over O(buckets) rows
    //     and finds each group's crossing bucket + the cumulative
    //     weight carried into it;
    //  2. re-filter the grid to the crossing bucket only (a 3-row
    //     broadcast join) and run the fine cumulative window over
    //     those few rows: carry + in-bucket cumsum crosses tot/2 at
    //     exactly the price the single global window would find.
    // The windows now sort O(buckets) + O(grid/buckets) rows instead
    // of the full grid — no executor-sized sort at any scale. Weights
    // are integral quantities, so every cumsum is exact in double and
    // the two-phase split cannot move the crossing (WeightedMedianSpec
    // pins ≡ the one-window reference form).
    "q_agg_weighted_median" -> QueryDef(
      (s, dir) => weightedMedianTwoPhase(Tables(s, dir, "lineitem")),
      Some("""WITH c AS (
             |  SELECT l_returnflag, l_extendedprice,
             |    sum(l_quantity) OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice) AS cumw,
             |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
             |  FROM lineitem)
             |SELECT l_returnflag, round(min(l_extendedprice), 4) AS weighted_median
             |FROM c WHERE cumw >= tot * 0.5
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ClickHouse statistical moments (stddevPop/varPop/corr/covarPop/
    // skewPop/kurtPop): one-pass mergeable moment states — the shuffle
    // carries O(1) moments per group, never rows. Kurtosis pairs with
    // DuckDB's kurtosis_pop (Spark's is the population excess form);
    // DuckDB's skewness is the sample-corrected g1, but the correction
    // is ~1e-7 absolute at these group sizes — invisible on the
    // 4-decimal oracle grid. The shared 1e-9 nudge keeps the multi-op
    // moment arithmetic off round-half boundaries (hazard H1).
    "q_agg_stats" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_pop(col("l_discount")) + 1e-9, 4).as("sd_disc"),
          round(var_pop(col("l_discount")) + 1e-9, 4).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")) + 1e-9, 4).as("corr_qty_price"),
          // + 0.0 after the round: the near-zero covariance rounds to
          // IEEE -0.0 on one engine only (same as q_array_funcs)
          (round(covar_pop(col("l_discount"), col("l_tax")) + 1e-9, 4) + 0.0)
            .as("covar_disc_tax"),
          // + 0.0: skewness of the uniform discount hovers near zero —
          // same -0.0 exposure as the covariance. Spark's skewness is
          // the POPULATION moment m3/m2^1.5; DuckDB's is the SAMPLE
          // (bias-corrected) form, a factor sqrt(n(n-1))/(n-2) apart —
          // ~1.5/n relative, invisible at 4 decimals on large groups
          // but a real boundary-crosser on small ones (r15: the
          // regenerated sf0.001 fixture rounded -0.04953 vs -0.04957
          // apart), so the oracle un-corrects back to the population
          // definition explicitly.
          (round(skewness(col("l_discount")) + 1e-9, 4) + 0.0).as("skew_disc"),
          round(kurtosis(col("l_discount")) + 1e-9, 4).as("kurt_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(stddev_pop(l_discount) + 1e-9, 4) AS sd_disc,
             |  round(var_pop(l_discount) + 1e-9, 4) AS var_disc,
             |  round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS corr_qty_price,
             |  round(covar_pop(l_discount, l_tax) + 1e-9, 4) + 0.0 AS covar_disc_tax,
             |  round(skewness(l_discount) * (count(*) - 2)
             |    / sqrt(count(*) * (count(*) - 1.0)) + 1e-9, 4) + 0.0 AS skew_disc,
             |  round(kurtosis_pop(l_discount) + 1e-9, 4) AS kurt_disc
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ClickHouse `entropy()`: Shannon entropy of each user's event-type
    // distribution. Algebraic identity −Σ(c/T)·log₂(c/T) =
    // log₂T − (Σ c·log₂c)/T turns it into two stacked hash aggregates
    // over the (user, type) count grid — no per-group value buffering,
    // O(1) merge state, map-side combined; the identical formula runs
    // on both engines (engine-native entropy() aggregates differ in
    // log base and sample correction across engines — the explicit
    // form is the portable one).
    "q_agg_entropy" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).cast("long").as("n_events"),
          round(log2(sum(col("c"))) -
            sum(col("c") * log2(col("c"))) / sum(col("c")) + 1e-9, 4)
            .as("entropy"))
        .orderBy("user_id"),
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM events GROUP BY user_id, event_type)
             |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             |       round(log2(sum(c)) - sum(c * log2(c)) / sum(c) + 1e-9, 4) AS entropy
             |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Fixed-bin histogram (the deterministic core of ClickHouse
    // `histogram`): bin id is a pure row-local function of the value,
    // so the whole thing is one hash aggregate — at 100 TB the bins
    // arrive pre-reduced from every executor (map-side combine).
    "q_agg_histogram" -> QueryDef(
      (s, dir) => Tables(s, dir, "orders")
        .select(floor(col("o_totalprice") / 60000.0).cast("long").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("bin"),
      Some("""SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT) AS bin,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM orders GROUP BY bin ORDER BY bin""".stripMargin)),

    // ClickHouse histogram(n) proper: ADAPTIVE variable-width bins via
    // the mergeable Ben-Haim–Tom-Tov streaming histogram (see
    // HistogramAgg) — bounded state per partial, map-side combined,
    // exactly n bins out. Bin boundaries depend on merge order ⇒
    // rows-only (the fixed-bin form above is the oracle-checked
    // reference; HistogramSpec pins cluster recovery + weight
    // conservation). Rows are keyed/ordered by the bin INDEX (bins are
    // mean-ordered by construction); [lo, hi] spans of adjacent bins
    // may overlap — BHTT bounds are honest per-bin min/max, not a
    // partition of the axis — so bin_lower is not a sort key.
    "q_agg_histogram_adaptive" -> QueryDef(
      (s, dir) => Tables(s, dir, "orders")
        .agg(graft.functions.HistogramAgg(col("o_totalprice"), 10).as("bins"))
        .select(posexplode(col("bins")).as(Seq("bin_idx", "b")))
        .select(col("bin_idx").cast("long").as("bin_idx"),
          round(col("b.lower"), 4).as("bin_lower"),
          round(col("b.upper"), 4).as("bin_upper"),
          col("b.count").as("n"))
        .orderBy("bin_idx"),
      None),

    // The CANONICAL-FOLD twin of the adaptive histogram (r8 verdict
    // item 7, the q_agg_group_array stringified-twin move): the SAME
    // Ben-Haim–Tom-Tov compaction kernel — merge the closest-mean
    // adjacent pair, first index wins ties — run in ONE deterministic
    // order (all bins built, then compacted 53 → 10), so the bin
    // VALUES are oracle-checkable. Input is the value grid
    // ⌊price/100⌋ mod 53 (all 53 residues populated at every fixture
    // SF — HistogramSpec pins the precondition), each residue one
    // weighted bin with sum = v·w: every mean, gap, and merged sum is
    // an exact-integer-valued double or one correctly-rounded
    // division/subtraction evaluated textually identically on both
    // engines, so the argmin walk cannot drift and the check needs no
    // epsilon. Shape: one hash aggregate to the bounded grid, one
    // grid-scale collect_list row, then the whole 43-merge fold is a
    // row-local `aggregate()` HOF (the q_series_forecast recurrence
    // pattern — never O(rows)). The distributed merge-order form
    // above stays rows-only; HistogramSpec pins this fold against the
    // kernel's own in-process compact().
    "q_agg_histogram_fold" -> QueryDef(
      (s, dir) => {
        val grid = Tables(s, dir, "orders")
          .select((floor(col("o_totalprice") / 100).cast("long") % HistFoldGrid)
            .as("v"))
          .groupBy("v").agg(count(lit(1)).as("w"))
          .agg(sort_array(collect_list(struct(
            col("v").cast("double").as("lo"),
            col("v").cast("double").as("hi"),
            (col("v").cast("double") * col("w")).as("s"),
            col("w").as("w")))).as("bs"))
        grid.select(posexplode(expr(histFoldExpr)).as(Seq("bin_idx", "b")))
          .select(col("bin_idx").cast("long").as("bin_idx"),
            round(col("b.lo"), 4).as("bin_lower"),
            round(col("b.hi"), 4).as("bin_upper"),
            col("b.w").as("n"))
          .orderBy("bin_idx")
      },
      Some(histFoldOracle)),

    // ClickHouse argMax/argMin: the value of one column at the extremum
    // of another, as a single hash aggregate (no self-join, no window).
    // Extremum ties are real in the data (two orders share a price
    // within a priority), so the ordering key is a zero-padded
    // fixed-width composite string — (price, orderkey) lexicographic —
    // making the winner deterministic on any engine at any
    // parallelism; a bare max_by(key, price) would be free to return
    // either tied row.
    "q_agg_argmax" -> QueryDef(
      // fanOut: the string-keyed max_by/min_by partial SortAggregate
      // (plus two format_string keys per row) sorted the whole input
      // in ONE task on the single-split scan (r15 profile);
      // scale-adaptive (see Tables.fanOut)
      (s, dir) => Tables.fanOut(Tables(s, dir, "orders"), col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          max_by(col("o_orderkey"),
            format_string("%020.4f|%020d", col("o_totalprice"), col("o_orderkey")))
            .as("max_price_order"),
          min_by(col("o_orderkey"),
            format_string("%020.4f|%020d", col("o_totalprice"), col("o_orderkey")))
            .as("min_price_order"),
          round(max(col("o_totalprice")), 4).as("max_price"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  arg_max(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey)) AS max_price_order,
             |  arg_min(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey)) AS min_price_order,
             |  round(max(o_totalprice), 4) AS max_price
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ClickHouse groupUniqArray: the group's distinct values AS an
    // array column (sorted ⇒ deterministic). collect_set is
    // map-side-combined; array size is bounded by the domain (market
    // segments), not the row count, so the state stays O(1) per group
    // at any scale. The set is emitted as a canonical joined string on
    // both engines — the oracle's comparison layer can't hash array
    // cells. The separator is the ASCII unit separator (0x1f), a
    // control char no text domain carries, so the join can't alias two
    // distinct sets the way a comma could if a value ever contained
    // one; GroupArraySepSpec additionally pins the no-separator
    // invariant on the live domain.
    "q_agg_group_array" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), "\u001f")
            .as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
             |  array_to_string(array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment), chr(31)) AS segments,
             |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
             |FROM customer GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // The array-typed twin of q_agg_group_array: the SAME distinct-set
    // aggregate carrying the actual ARRAY column through the plan
    // (GroupArraySepSpec pins the ArrayType inside the analyzed plan),
    // with a FINAL projection to its JSON form — the driver's pandas
    // comparison layer cannot sort/hash ndarray cells, so the emitted
    // surface is the canonical `["a","b"]` string both engines agree
    // on while the plan itself still exercises array-typed aggregation
    // end-to-end.
    "q_agg_group_array_typed" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(sort_array(collect_set(col("c_mktsegment"))).as("segments_arr"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .select(col("c_nationkey"),
          to_json(col("segments_arr")).as("segments_json"),
          col("n_segments"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
             |  CAST(to_json(list_sort(array_agg(DISTINCT c_mktsegment))) AS VARCHAR) AS segments_json,
             |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
             |FROM customer GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // Per-group fixed-size sample — ClickHouse's `groupArraySample`
    // ([CH]), with its RNG replaced by a key-derived md5 order (the
    // repo-wide determinism move): ranking by a hash of the row key
    // IS uniform sampling, and both engines derive the identical
    // sample. The rank-≤-k filter compiles to WindowGroupLimit
    // (Spark ≥3.5): each map task keeps only its local top-k per
    // group BEFORE the exchange, so the shuffle carries
    // O(groups × k × tasks) candidate rows, never the table — the
    // same physics that makes q_topk_per_group scale. Emitted as the
    // joined-string form (driver's pandas layer can't hash ndarray
    // cells).
    "q_agg_group_sample" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(md5(concat(col("o_orderkey").cast("string"), lit(":gs"))),
            col("o_orderkey"))
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .groupBy("o_orderpriority")
          .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",")
              .as("sample_keys"),
            count(lit(1)).as("n_sampled"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH rk AS (
             |  SELECT o_orderpriority, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':gs'),
             |        o_orderkey) AS rn
             |  FROM orders)
             |SELECT o_orderpriority,
             |  array_to_string(list_sort(list(o_orderkey)), ',') AS sample_keys,
             |  CAST(count(*) AS BIGINT) AS n_sampled
             |FROM rk WHERE rn <= 3
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // HLL sketch cardinality — approx ⇒ declared without oracle
    // (SURVEY.md §5.3.4); driver records a rows-only check.
    "q_agg_approx_distinct" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
        .orderBy("event_type"),
      None),

    // Quantiles — the ClickHouse-staple aggregate ([CH]). Exact linear
    // interpolation (same semantics as DuckDB's quantile_cont) so the
    // query is oracle-checkable. r15: re-planned from the
    // `percentile(value, qs, count)` frequency-grid aggregate onto the
    // cumulative-count window form ([[exactPercentilesWindow]] — the
    // grid bought no collapse on this ~99%-distinct value column and
    // the TypedImperativeAggregate shuffled multi-MB opaque buffers;
    // the window form is one exchange + codegen min/max, bit-identical
    // results, PercentileRewriteSpec pins it against the old plan).
    // At 100 TB the production form is still `approx_percentile`
    // (mergeable Greenwald–Khanna, O(1/accuracy) state) — this exact
    // form doubles as its correctness reference.
    "q_agg_percentile" -> QueryDef(
      (s, dir) => exactPercentilesWindow(Tables(s, dir, "lineitem")),
      Some("""SELECT l_returnflag,
             |  round(ps[1], 4) AS p50,
             |  round(ps[2], 4) AS p90,
             |  round(ps[3], 4) AS p99,
             |  p_min, p_max
             |FROM (SELECT l_returnflag,
             |        quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS ps,
             |        round(min(l_extendedprice), 4) AS p_min,
             |        round(max(l_extendedprice), 4) AS p_max
             |      FROM lineitem GROUP BY l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // The 100 TB form of q_agg_percentile: approx_percentile keeps an
    // O(1/accuracy)-sized mergeable Greenwald–Khanna summary per group
    // (map-side partials, bounded state, additive rank error) instead
    // of buffering every value. Approx ⇒ rows-only check; the exact
    // query above is its correctness reference.
    "q_agg_approx_percentile" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 1000)").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"),
          round(element_at(col("ps"), 3), 4).as("p99"))
        .orderBy("l_returnflag"),
      None),

    // Hierarchy totals (tier → db → grand total, backup.sh:21 shape).
    "q_agg_rollup" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |       coalesce(l_linestatus, 'ALL') AS linestatus,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(sum(l_quantity), 4) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // All bucket combinations.
    "q_agg_cube" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .cube("event_type", "user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("user_id"), lit(-1L)).as("uid"),
          col("n"), col("sum_value"))
        .orderBy("etype", "uid"),
      Some("""SELECT coalesce(event_type, 'ALL') AS etype,
             |       coalesce(user_id, -1) AS uid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(sum(value), 4) AS sum_value
             |FROM events GROUP BY CUBE (event_type, user_id)
             |ORDER BY etype, uid""".stripMargin)),

    // Cohort retention — ClickHouse's retention() ([CH]): users
    // cohorted by signup week; per cohort, how many were active again
    // in the next week and the week after. One distinct-activity
    // aggregate + one cohort join, both keyed on user_id; the output
    // is O(#weeks) rows. The retention flags are conditional
    // max-aggregates over the (user, week) activity set — no per-user
    // event arrays (ClickHouse's retention() builds a per-user bitmask;
    // the relational form streams).
    "q_cohort_retention" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
        val cohort = e.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(date_trunc("week", min(col("ts_s"))).as("cohort_week"))
        val activity = e.select(col("user_id"),
          date_trunc("week", col("ts_s")).as("act_week")).distinct()
        cohort.join(activity, Seq("user_id"))
          .groupBy("cohort_week")
          .agg(countDistinct(col("user_id")).as("n_users"),
            sum((col("act_week") === col("cohort_week") + expr("INTERVAL 7 DAYS"))
              .cast("long")).as("wk1_retained"),
            sum((col("act_week") === col("cohort_week") + expr("INTERVAL 14 DAYS"))
              .cast("long")).as("wk2_retained"))
          .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
            col("n_users"), col("wk1_retained"), col("wk2_retained"))
          .orderBy("cohort_week")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s FROM events),
             |cohort AS (
             |  SELECT user_id, date_trunc('week', min(ts_s)) AS cohort_week
             |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
             |activity AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts_s) AS act_week FROM ev)
             |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
             |       CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users,
             |       CAST(sum(CASE WHEN a.act_week = c.cohort_week + INTERVAL 7 DAY
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS wk1_retained,
             |       CAST(sum(CASE WHEN a.act_week = c.cohort_week + INTERVAL 14 DAY
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS wk2_retained
             |FROM cohort c JOIN activity a ON c.user_id = a.user_id
             |GROUP BY c.cohort_week ORDER BY cohort_week""".stripMargin)),

    // The full retention TRIANGLE — q_cohort_retention generalized
    // from two fixed columns to the (cohort week × week offset) grid,
    // the standard product-analytics heat-map view: for every cohort,
    // how many of its users were active 0, 1, 2, … weeks later, as a
    // count and a rate against the cohort size. Shape: cohort anchor
    // is one min-aggregate per user; the activity join is
    // user-co-partitioned; everything after collapses to the bounded
    // (weeks × offsets) grid. The rate divides two exact integers and
    // week arithmetic is pure date math — no float enters a key.
    "q_retention_matrix" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
        val cohort = e.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(date_trunc("week", min(col("ts_s"))).as("cohort_week"))
        val sizes = cohort.groupBy("cohort_week")
          .agg(countDistinct("user_id").as("n_users"))
        val activity = e.select(col("user_id"),
          date_trunc("week", col("ts_s")).as("act_week")).distinct()
        cohort.join(activity, Seq("user_id"))
          .filter(col("act_week") >= col("cohort_week"))
          .select(col("cohort_week"),
            (datediff(col("act_week"), col("cohort_week")) / 7)
              .cast("long").as("offset_weeks"),
            col("user_id"))
          .groupBy("cohort_week", "offset_weeks")
          .agg(countDistinct("user_id").as("active_users"))
          .join(sizes, "cohort_week")
          .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
            col("offset_weeks"), col("active_users"), col("n_users"),
            round(col("active_users").cast("double") / col("n_users") + 1e-9, 4)
              .as("retention"))
          .orderBy("cohort_week", "offset_weeks")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s
             |  FROM events),
             |cohort AS (
             |  SELECT user_id, date_trunc('week', min(ts_s)) AS cohort_week
             |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
             |sizes AS (
             |  SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM cohort GROUP BY cohort_week),
             |activity AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts_s) AS act_week FROM ev),
             |grid AS (
             |  SELECT c.cohort_week,
             |    CAST(floor(date_diff('day', c.cohort_week, a.act_week) / 7.0)
             |      AS BIGINT) AS offset_weeks,
             |    CAST(count(DISTINCT c.user_id) AS BIGINT) AS active_users
             |  FROM cohort c JOIN activity a ON c.user_id = a.user_id
             |  WHERE a.act_week >= c.cohort_week
             |  GROUP BY 1, 2)
             |SELECT strftime(g.cohort_week, '%Y-%m-%d') AS cohort_week,
             |  g.offset_weeks, g.active_users, s.n_users,
             |  round(CAST(g.active_users AS DOUBLE) / s.n_users + 1e-9, 4)
             |    AS retention
             |FROM grid g JOIN sizes s USING (cohort_week)
             |ORDER BY cohort_week, offset_weeks""".stripMargin)),

    // Sequential conversion funnel — ClickHouse's windowFunnel ([CH]):
    // per user, the earliest signup, the earliest click AFTER it, the
    // earliest purchase after THAT, all within 7 days of the signup;
    // output is users per funnel depth. Expressed as chained
    // conditional aggregates: every stage shuffles on user_id — the
    // SAME key each time, so at scale the exchanges after the first
    // reuse the partitioning; nothing is quadratic and no per-user
    // event array is ever materialized (ClickHouse's implementation
    // buffers per-user event lists; this shape streams).
    "q_funnel" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir).select("user_id", "event_type", "ts_s")
        // NOT checkpointed (unlike q_funnel_strict): SqlSurfaceSpec pins
        // q_sql_funnel's physical strategy vector ≡ this plan, and the
        // parser route cannot materialize — the r15 A/B measured the
        // checkpoint at only −0.18 s here (3 stages vs strict's 5), the
        // wrong trade for losing the route-equivalence pin.
        val u1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
        val u2 = e.filter(col("event_type") === "click")
          .join(u1, Seq("user_id"))
          .filter(col("ts_s") > col("t1") &&
            col("ts_s") <= col("t1") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min(col("ts_s")).as("t2"), first(col("t1")).as("t1b"))
        val u3 = e.filter(col("event_type") === "purchase")
          .join(u2, Seq("user_id"))
          .filter(col("ts_s") > col("t2") &&
            col("ts_s") <= col("t1b") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min(col("ts_s")).as("t3"))
        u1.join(u2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(u3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .select(col("user_id"),
            (lit(1) + col("t2").isNotNull.cast("int") + col("t3").isNotNull.cast("int"))
              .cast("long").as("level"))
          .groupBy("level").agg(count(lit(1)).as("n_users"))
          .orderBy("level")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s FROM events),
             |u1 AS (SELECT user_id, min(ts_s) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |u2 AS (SELECT e.user_id, min(e.ts_s) AS t2, min(u1.t1) AS t1b
             |       FROM ev e JOIN u1 ON e.user_id = u1.user_id
             |       WHERE e.event_type = 'click' AND e.ts_s > u1.t1
             |         AND e.ts_s <= u1.t1 + INTERVAL 7 DAY
             |       GROUP BY e.user_id),
             |u3 AS (SELECT e.user_id, min(e.ts_s) AS t3
             |       FROM ev e JOIN u2 ON e.user_id = u2.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts_s > u2.t2
             |         AND e.ts_s <= u2.t1b + INTERVAL 7 DAY
             |       GROUP BY e.user_id)
             |SELECT level, CAST(count(*) AS BIGINT) AS n_users FROM (
             |  SELECT u1.user_id,
             |         CAST(1 + CASE WHEN u2.user_id IS NOT NULL THEN 1 ELSE 0 END
             |                + CASE WHEN u3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level
             |  FROM u1
             |  LEFT JOIN u2 ON u1.user_id = u2.user_id
             |  LEFT JOIN u3 ON u1.user_id = u3.user_id)
             |GROUP BY level ORDER BY level""".stripMargin)),

    // ClickHouse `windowFunnel(…, 'strict_order')` — the chain BREAKS
    // if any other event interleaves: step k+1 must be the user's very
    // NEXT event after step k, not merely the next matching one. Same
    // streaming shape as q_funnel plus one aggregate per step over ALL
    // events (min ts > t_k — the "what came next" probe); a step
    // qualifies iff its matched timestamp IS that minimum. Nothing
    // buffers per-user event lists.
    "q_funnel_strict" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir).select("user_id", "event_type", "ts_s")
        // u1/u2 are MATERIALIZED (one row per user): u1 feeds n1, u2
        // and the final chain; u2 feeds n2, u3 and the final chain —
        // un-checkpointed, Catalyst replicated each stage's whole
        // upstream pipeline per consumer and the chain compounded
        // exponentially (r15 plan audit: 15 scans of events → 5).
        // Guide §2.4 (remove shuffles outright).
        val u1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
          .localCheckpoint()
        // the user's next event of ANY type after t1 (the strictness probe)
        val n1 = e.join(u1, Seq("user_id"))
          .filter(col("ts_s") > col("t1"))
          .groupBy("user_id").agg(min(col("ts_s")).as("tn1"))
        val u2 = e.filter(col("event_type") === "click")
          .join(u1, Seq("user_id"))
          .filter(col("ts_s") > col("t1") &&
            col("ts_s") <= col("t1") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min(col("ts_s")).as("t2"), first(col("t1")).as("t1b"))
          // strict: the matched click IS the next event after signup
          .join(n1, Seq("user_id"))
          .filter(col("t2") === col("tn1"))
          .localCheckpoint()
        val n2 = e.join(u2.select("user_id", "t2"), Seq("user_id"))
          .filter(col("ts_s") > col("t2"))
          .groupBy("user_id").agg(min(col("ts_s")).as("tn2"))
        val u3 = e.filter(col("event_type") === "purchase")
          .join(u2, Seq("user_id"))
          .filter(col("ts_s") > col("t2") &&
            col("ts_s") <= col("t1b") + expr("INTERVAL 7 DAYS"))
          .groupBy("user_id").agg(min(col("ts_s")).as("t3"))
          .join(n2, Seq("user_id"))
          .filter(col("t3") === col("tn2"))
        u1.join(u2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(u3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .select(col("user_id"),
            (lit(1) + col("t2").isNotNull.cast("int") + col("t3").isNotNull.cast("int"))
              .cast("long").as("level"))
          .groupBy("level").agg(count(lit(1)).as("n_users"))
          .orderBy("level")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s FROM events),
             |u1 AS (SELECT user_id, min(ts_s) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |n1 AS (SELECT e.user_id, min(e.ts_s) AS tn1
             |       FROM ev e JOIN u1 ON e.user_id = u1.user_id
             |       WHERE e.ts_s > u1.t1 GROUP BY e.user_id),
             |u2 AS (SELECT x.user_id, x.t2, x.t1b FROM (
             |         SELECT e.user_id, min(e.ts_s) AS t2, min(u1.t1) AS t1b
             |         FROM ev e JOIN u1 ON e.user_id = u1.user_id
             |         WHERE e.event_type = 'click' AND e.ts_s > u1.t1
             |           AND e.ts_s <= u1.t1 + INTERVAL 7 DAY
             |         GROUP BY e.user_id) x
             |       JOIN n1 ON x.user_id = n1.user_id AND x.t2 = n1.tn1),
             |n2 AS (SELECT e.user_id, min(e.ts_s) AS tn2
             |       FROM ev e JOIN u2 ON e.user_id = u2.user_id
             |       WHERE e.ts_s > u2.t2 GROUP BY e.user_id),
             |u3 AS (SELECT y.user_id, y.t3 FROM (
             |         SELECT e.user_id, min(e.ts_s) AS t3
             |         FROM ev e JOIN u2 ON e.user_id = u2.user_id
             |         WHERE e.event_type = 'purchase' AND e.ts_s > u2.t2
             |           AND e.ts_s <= u2.t1b + INTERVAL 7 DAY
             |         GROUP BY e.user_id) y
             |       JOIN n2 ON y.user_id = n2.user_id AND y.t3 = n2.tn2)
             |SELECT level, CAST(count(*) AS BIGINT) AS n_users FROM (
             |  SELECT u1.user_id,
             |         CAST(1 + CASE WHEN u2.user_id IS NOT NULL THEN 1 ELSE 0 END
             |                + CASE WHEN u3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level
             |  FROM u1
             |  LEFT JOIN u2 ON u1.user_id = u2.user_id
             |  LEFT JOIN u3 ON u1.user_id = u3.user_id)
             |GROUP BY level ORDER BY level""".stripMargin)),

    // sequenceMatch('(?1).*(?2).*(?3)') — ClickHouse event-pattern
    // matching: per user, did signup → click → purchase occur in time
    // order (no window bound — that's what distinguishes it from
    // windowFunnel above). The per-user event string (one char per
    // event, ordered by (ts, event_id)) is matched by the regex engine
    // itself, which IS the ClickHouse semantics: the pattern is a
    // regex over the event alphabet. Scale note: the per-user string
    // is bounded by per-user activity; for unbounded activity the
    // funnel's min-ts-chain shape is the streaming-safe form of the
    // same predicate — this form exists for arbitrary patterns.
    // ClickHouse sequenceNextNode ([CH]): the event that FOLLOWS each
    // user's first anchor event (head direction, first_match base) —
    // "what do users do right after signing up". Two ranked windows,
    // both partitioned on the user key: the first-signup anchor per
    // user, then the first event strictly after it ((ts, id)
    // lexicographic — deterministic under second-truncated ties).
    // The anchor table is one row per user and joins back on the
    // user key (co-partitioned with the window shuffle).
    "q_seq_next_node" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), col("ts_s"), col("event_id"), col("event_type"))
        val wU = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        val anchor = e.filter(col("event_type") === "signup")
          .withColumn("rn", row_number().over(wU))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("ts_s").as("a_ts"), col("event_id").as("a_id"))
        e.join(anchor, Seq("user_id"))
          .filter(col("ts_s") > col("a_ts")
            || (col("ts_s") === col("a_ts") && col("event_id") > col("a_id")))
          .withColumn("rn", row_number().over(wU))
          .withColumn("n_after", count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("next_type"),
            col("n_after").cast("long").as("n_after"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
             |  FROM events),
             |a AS (
             |  SELECT user_id, ts_s AS a_ts, event_id AS a_id FROM (
             |    SELECT user_id, ts_s, event_id,
             |      row_number() OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS rn
             |    FROM e WHERE event_type = 'signup') t WHERE rn = 1),
             |nxt AS (
             |  SELECT e.user_id, e.event_type, e.ts_s, e.event_id,
             |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts_s, e.event_id) AS rn,
             |    count(*) OVER (PARTITION BY e.user_id) AS n_after
             |  FROM e JOIN a ON e.user_id = a.user_id
             |  WHERE e.ts_s > a.a_ts OR (e.ts_s = a.a_ts AND e.event_id > a.a_id))
             |SELECT user_id, event_type AS next_type, CAST(n_after AS BIGINT) AS n_after
             |FROM nxt WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // First-order Markov transition matrix over each user's event
    // stream — the behavioral-model summary (where does a `view` lead?)
    // that sequenceMatch/sequenceNextNode answer only pointwise. One
    // per-user lag window (partitioned — parallelism is the user
    // domain, frames are bounded by per-user activity) emits
    // (prev → next) pairs; everything after is grid-sized: the 5×5
    // transition-count matrix plus a per-prev row-share window over
    // ≤|event types| rows. Deterministic ordering under second ties
    // via the (ts_s, event_id) lexicographic key.
    "q_markov_transition" -> QueryDef(
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        Relational.eventsSec(s, dir)
          .select(col("user_id"), col("ts_s"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag("event_type", 1).over(wU))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("c"))
          .withColumn("p", round(col("c").cast("double") /
            sum("c").over(Window.partitionBy("prev_type")) + 1e-9, 4))
          .select(col("prev_type"), col("next_type"), col("c"), col("p"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
             |  FROM events),
             |pairs AS (
             |  SELECT lag(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_type,
             |    event_type AS next_type
             |  FROM e),
             |m AS (
             |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS c
             |  FROM pairs WHERE prev_type IS NOT NULL
             |  GROUP BY prev_type, next_type)
             |SELECT prev_type, next_type, c,
             |  round(CAST(c AS DOUBLE) /
             |    CAST(sum(c) OVER (PARTITION BY prev_type) AS DOUBLE) + 1e-9, 4) AS p
             |FROM m ORDER BY prev_type, next_type""".stripMargin)),

    // Top user paths — the most common 3-step event-type sequences
    // across all user streams (the "how do users actually move"
    // product-analytics view; ClickHouse users build it from
    // groupArray + arraySlice). Two bounded lags over the partitioned
    // per-user window emit each consecutive trigram; the path domain
    // is |types|³ ≤ 125 cells, so everything after the lag projection
    // is grid-sized. Top-20 via TakeOrderedAndProject on the exact
    // integer count (no float ordering anywhere); path string ties
    // break lexicographically.
    "q_session_paths" -> QueryDef(
      (s, dir) => {
        val wU = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        Relational.eventsSec(s, dir)
          .select(col("user_id"), col("ts_s"), col("event_id"), col("event_type"))
          .withColumn("t2", lag("event_type", 1).over(wU))
          .withColumn("t1", lag("event_type", 2).over(wU))
          .filter(col("t1").isNotNull)
          .select(concat_ws(">", col("t1"), col("t2"), col("event_type"))
            .as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path").asc)
          .limit(20)
          .orderBy("path")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
             |  FROM events),
             |tri AS (
             |  SELECT lag(event_type, 2) OVER w AS t1,
             |         lag(event_type, 1) OVER w AS t2,
             |         event_type AS t3
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
             |SELECT path, n FROM (
             |  SELECT t1 || '>' || t2 || '>' || t3 AS path,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM tri WHERE t1 IS NOT NULL
             |  GROUP BY path ORDER BY n DESC, path ASC LIMIT 20)
             |ORDER BY path""".stripMargin)),

    // Conversion-latency distribution — hours from each user's first
    // signup to their first subsequent purchase, summarized as exact
    // quartiles + p90 + mean (the "time to convert" product metric;
    // quantile family per §2.D). Both anchors are min_by-style
    // aggregates on the zero-padded (ts, id) key (no windows); the
    // per-user latency table is one row per converting user, and the
    // exact percentile buffers only that user-domain grid. Latency in
    // whole hours (integer floor on both engines) so the percentile
    // interpolation arithmetic is exact-integer-fed.
    "q_time_to_convert" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), col("ts_s"), col("event_id"), col("event_type"))
        def firstOf(t: String, out: String) =
          e.filter(col("event_type") === t)
            .groupBy("user_id")
            .agg(min(struct(col("ts_s"), col("event_id"))).as("s"))
            .select(col("user_id"), col("s.ts_s").as(out),
              col("s.event_id").as(out + "_id"))
        val lat = firstOf("signup", "t_signup")
          .join(firstOf("purchase", "t_purchase"), "user_id")
          .filter(col("t_purchase") > col("t_signup")
            || (col("t_purchase") === col("t_signup")
                && col("t_purchase_id") > col("t_signup_id")))
          .select(floor((unix_timestamp(col("t_purchase")) -
            unix_timestamp(col("t_signup"))) / 3600).as("h"))
        // collapse to the (hour, count) GRID before the percentile:
        // exact `percentile` buffers its input per group, and one
        // group over raw per-user rows is an O(users) single buffer at
        // corpus scale; the frequency-weighted form buffers only the
        // distinct-hour domain, which the retention horizon bounds
        // (the q_agg_percentile discipline).
        lat.groupBy("h").agg(count(lit(1)).as("c"))
          .agg(
            sum("c").as("n_converted"),
            expr("percentile(h, array(0.25D, 0.5D, 0.75D, 0.9D), c)").as("ps"),
            round(sum(col("h") * col("c")) / sum("c").cast("double") + 1e-9, 4)
              .as("mean_hours"))
          .select(col("n_converted"),
            round(element_at(col("ps"), 1), 4).as("p25"),
            round(element_at(col("ps"), 2), 4).as("p50"),
            round(element_at(col("ps"), 3), 4).as("p75"),
            round(element_at(col("ps"), 4), 4).as("p90"),
            col("mean_hours"))
          .orderBy("n_converted")
      },
      Some("""WITH e AS (
             |  SELECT user_id, date_trunc('second', ts) AS ts_s, event_id, event_type
             |  FROM events),
             |su AS (
             |  SELECT user_id, min(ts_s) AS t_signup,
             |    arg_min(event_id, printf('%020d|%020d',
             |      CAST(epoch(ts_s) AS BIGINT), event_id)) AS sid
             |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
             |pu AS (
             |  SELECT user_id, min(ts_s) AS t_purchase,
             |    arg_min(event_id, printf('%020d|%020d',
             |      CAST(epoch(ts_s) AS BIGINT), event_id)) AS pid
             |  FROM e WHERE event_type = 'purchase' GROUP BY user_id),
             |lat AS (
             |  SELECT CAST(floor((epoch(t_purchase) - epoch(t_signup)) / 3600)
             |    AS BIGINT) AS h
             |  FROM su JOIN pu USING (user_id)
             |  WHERE t_purchase > t_signup
             |     OR (t_purchase = t_signup AND pid > sid))
             |SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |  round(quantile_cont(h, 0.25), 4) AS p25,
             |  round(quantile_cont(h, 0.5), 4) AS p50,
             |  round(quantile_cont(h, 0.75), 4) AS p75,
             |  round(quantile_cont(h, 0.9), 4) AS p90,
             |  round(avg(h) + 1e-9, 4) AS mean_hours
             |FROM lat""".stripMargin)),

    // First/last-touch conversion attribution — the marketing-funnel
    // credit split: for each user's FIRST purchase, which channel
    // (event type) touched them first, and which touched them last
    // before converting? Scale shape: the purchase anchor is one row
    // per converting user (min_by on the zero-padded (ts, id) key —
    // ONE map-side-combined aggregate, no window); pre-conversion
    // touches filter on the co-partitioned user join and collapse via
    // min_by/max_by per user; the final credit matrix is
    // O(|event types|). Ties under second truncation stay
    // deterministic through the composite key everywhere.
    "q_attribution" -> QueryDef(
      (s, dir) => {
        val ord = format_string("%020d|%020d",
          unix_timestamp(col("ts_s")), col("event_id"))
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), col("ts_s"), col("event_id"), col("event_type"))
        val conv = e.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(min(ord).as("conv_key"))
        val touches = e.filter(col("event_type") =!= "purchase")
          .join(conv, "user_id")
          .filter(ord < col("conv_key"))
          .groupBy("user_id")
          .agg(min_by(col("event_type"), ord).as("first_touch"),
            max_by(col("event_type"), ord).as("last_touch"))
          // MATERIALIZED: the first-credit and last-credit rollups both
          // consume it — un-checkpointed, the whole join+argmin/argmax
          // aggregate ran twice (r15 plan audit: 4 scans of events → 2).
          // One row per converting user.
          .localCheckpoint()
        touches.groupBy(col("first_touch").as("channel"))
          .agg(count(lit(1)).as("first_credit"))
          .join(
            touches.groupBy(col("last_touch").as("channel"))
              .agg(count(lit(1)).as("last_credit")),
            Seq("channel"), "full_outer")
          .na.fill(0L, Seq("first_credit", "last_credit"))
          .orderBy("channel")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    printf('%020d|%020d',
             |      CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id) AS k
             |  FROM events),
             |conv AS (
             |  SELECT user_id, min(k) AS conv_key
             |  FROM e WHERE event_type = 'purchase' GROUP BY user_id),
             |touch AS (
             |  SELECT e.user_id,
             |    arg_min(e.event_type, e.k) AS first_touch,
             |    arg_max(e.event_type, e.k) AS last_touch
             |  FROM e JOIN conv USING (user_id)
             |  WHERE e.event_type <> 'purchase' AND e.k < conv.conv_key
             |  GROUP BY e.user_id),
             |f AS (SELECT first_touch AS channel,
             |        CAST(count(*) AS BIGINT) AS first_credit
             |      FROM touch GROUP BY first_touch),
             |l AS (SELECT last_touch AS channel,
             |        CAST(count(*) AS BIGINT) AS last_credit
             |      FROM touch GROUP BY last_touch)
             |SELECT channel,
             |  coalesce(first_credit, 0) AS first_credit,
             |  coalesce(last_credit, 0) AS last_credit
             |FROM f FULL OUTER JOIN l USING (channel)
             |ORDER BY channel""".stripMargin)),

    "q_seq_match" -> QueryDef(
      (s, dir) => userEventSeq(s, dir)
        .select(col("user_id"),
          col("seq").rlike("s.*c.*p").as("matched"),
          length(col("seq")).cast("long").as("n_events"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  regexp_matches(seq, 's.*c.*p') AS matched,
             |  CAST(length(seq) AS BIGINT) AS n_events
             |FROM (SELECT user_id,
             |        string_agg(substr(event_type, 1, 1), ''
             |          ORDER BY date_trunc('second', ts), event_id) AS seq
             |      FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // sequenceCount — the counting twin of sequenceMatch: how many
    // NON-OVERLAPPING signup → click → purchase chains each user
    // completed. Lazy quantifiers make the regex engine's
    // leftmost-shortest scan exactly the greedy chain-consumption
    // semantics, and both engines (Java regex, RE2) agree on
    // leftmost non-overlapping counting with lazy patterns.
    "q_seq_count" -> QueryDef(
      (s, dir) => userEventSeq(s, dir)
        .select(col("user_id"),
          regexp_count(col("seq"), lit("s.*?c.*?p")).cast("long").as("n_chains"),
          length(col("seq")).cast("long").as("n_events"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(len(regexp_extract_all(seq, 's.*?c.*?p')) AS BIGINT) AS n_chains,
             |  CAST(length(seq) AS BIGINT) AS n_events
             |FROM (SELECT user_id,
             |        string_agg(substr(event_type, 1, 1), ''
             |          ORDER BY date_trunc('second', ts), event_id) AS seq
             |      FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // AggregatingMergeTree analog: mergeable per-day partial states
    // (sum/count per (event_type, day)) re-aggregated into per-type
    // totals, with avg DERIVED from the merged sums — the
    // partial-merge identity the ClickHouse engine family is built on.
    // At 100 TB this is the incremental materialized-view shape: new
    // days append partial rows; the merge never re-reads history, and
    // both levels are map-side-combined hash aggregates.
    "q_merge_partials" -> QueryDef(
      (s, dir) => {
        val partials = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"), Retention.bucketDay(col("ts_s")).as("day"))
          .agg(sum(col("value")).as("s"), count(lit(1)).as("c"))
        partials.groupBy("event_type")
          .agg(round(sum(col("s")), 4).as("sum_value"),
            sum(col("c")).cast("long").as("n"),
            round(sum(col("s")) / sum(col("c")), 4).as("avg_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, round(sum(s), 4) AS sum_value,
             |  CAST(sum(c) AS BIGINT) AS n,
             |  round(sum(s) / sum(c), 4) AS avg_value
             |FROM (SELECT event_type,
             |        strftime(date_trunc('second', ts), '%Y%m%d') AS day,
             |        sum(value) AS s, count(*) AS c
             |      FROM events GROUP BY 1, 2)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // The sketch-state twin of q_merge_partials — ClickHouse's
    // `uniqState`/`uniqMerge` over AggregatingMergeTree: per-day HLL
    // sketches of the user set (Spark's native Apache DataSketches
    // HllSketch aggregate), merged across days per event type. THE
    // materialized-view shape for distinct counts at 100 TB: a day's
    // partial is O(sketch) bytes however many users it saw, history is
    // never re-read (new days append sketch rows; the union re-merges
    // sketches, not users), and unlike exact distinct the merge state
    // never grows with cardinality. Approx ⇒ rows-only; SketchAggSpec
    // pins the estimate within HLL error of the exact distinct.
    "q_agg_hll_merge" -> QueryDef(
      (s, dir) => {
        val partials = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"), Retention.bucketDay(col("ts_s")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        partials.groupBy("event_type")
          .agg(count(lit(1)).as("n_day_partials"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
          .orderBy("event_type")
      },
      None),

    // ClickHouse uniqTheta + set algebra ([CH]): theta sketches are
    // the one cardinality sketch closed under INTERSECTION and
    // DIFFERENCE, so "users who signed up AND purchased but never
    // errored" is computable from three mergeable per-segment states
    // without ever shuffling user ids to one place — the per-type
    // sketches build in ONE conditional-aggregate pass over events
    // (map-side-combined; the exchange carries 3 sketches, not rows),
    // and the set algebra runs on the 1-row result. ORACLE-CHECKED:
    // a theta sketch is EXACT below its 2^lgK-unique exact-mode
    // threshold (4096 at the default lgK=12), and the fixture's user
    // domain sits far under it at every SF (150 at sf0.01, 1500 at
    // sf0.1) — so the estimates equal the exact distinct set algebra
    // and the driver hash-compares them; SketchAggSpec guards the
    // exact-mode precondition and the intersect ≤ min ≤ union
    // sandwich for the general case.
    "q_agg_theta_sets" -> QueryDef(
      (s, dir) => Tables(s, dir, "events")
        .agg(
          expr("theta_sketch_agg(CASE WHEN event_type = 'signup' THEN user_id END)")
            .as("sk_s"),
          expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)")
            .as("sk_p"),
          expr("theta_sketch_agg(CASE WHEN event_type = 'error' THEN user_id END)")
            .as("sk_e"))
        .select(
          expr("theta_sketch_estimate(sk_s)").cast("long").as("signup_users"),
          expr("theta_sketch_estimate(sk_p)").cast("long").as("purchase_users"),
          expr("theta_sketch_estimate(theta_intersection(sk_s, sk_p))")
            .cast("long").as("both_users"),
          expr("theta_sketch_estimate(theta_difference(theta_intersection(sk_s, sk_p), sk_e))")
            .cast("long").as("both_no_error_users")),
      Some("""WITH s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
             |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
             |SELECT
             |  CAST((SELECT count(*) FROM s) AS BIGINT) AS signup_users,
             |  CAST((SELECT count(*) FROM p) AS BIGINT) AS purchase_users,
             |  CAST((SELECT count(*) FROM s JOIN p USING (user_id)) AS BIGINT) AS both_users,
             |  CAST((SELECT count(*) FROM s JOIN p USING (user_id)
             |        WHERE user_id NOT IN (SELECT user_id FROM e)) AS BIGINT)
             |    AS both_no_error_users""".stripMargin)),

    // ClickHouse quantileTDigest's MV shape ([CH]): mergeable quantile
    // sketch partials — per-day KLL states re-merged to per-type
    // quantiles, mirroring q_agg_hll_merge for ORDER statistics. Each
    // day holds O(sketch) state however many rows it saw; history is
    // never re-read when a day closes — the incremental-quantile
    // pattern a 100 TB daily pipeline actually runs. Approximate ⇒ no
    // oracle; SketchAggSpec pins merged-quantile rank error vs the
    // exact percentile and partial-merge ≡ single-pass sketch.
    "q_agg_kll_merge" -> QueryDef(
      (s, dir) => {
        val partials = Relational.eventsSec(s, dir)
          .groupBy(col("event_type"), Retention.bucketDay(col("ts_s")).as("day"))
          .agg(expr("kll_sketch_agg_double(value)").as("sk"))
        // kll_sketch_merge_double is a BINARY merge (unlike
        // hll_union_agg there is no aggregate form), so the per-day
        // partials fold through the `aggregate` higher-order function
        // — the collected list is bounded by the day count per type
        // (metadata scale), not by rows.
        partials.groupBy("event_type")
          .agg(count(lit(1)).as("n_day_partials"),
            collect_list(col("sk")).as("sks"))
          .select(col("event_type"), col("n_day_partials"),
            expr("""kll_sketch_get_quantile_double(
                      aggregate(slice(sks, 2, size(sks)), element_at(sks, 1),
                                (acc, x) -> kll_sketch_merge_double(acc, x)),
                      0.5D)""").as("p50_approx"),
            expr("""kll_sketch_get_quantile_double(
                      aggregate(slice(sks, 2, size(sks)), element_at(sks, 1),
                                (acc, x) -> kll_sketch_merge_double(acc, x)),
                      0.9D)""").as("p90_approx"))
          .orderBy("event_type")
      },
      None),

    // Pivot: rows-to-columns restructuring (the OLAP cross-tab).
    // Values are declared explicitly — with an inferred value set the
    // plan needs a distinct-collect to the driver BEFORE planning,
    // which is both a scale hazard and nondeterministic schema; the
    // declared form is one hash aggregate. DuckDB side: conditional
    // aggregation (the engine-portable pivot encoding).
    "q_pivot" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .select(col("l_returnflag"),
          round(col("F"), 4).as("qty_f"),
          round(col("O"), 4).as("qty_o"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_f,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_o
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Unpivot/melt: columns-to-rows — the inverse restructuring, a
    // zero-shuffle Expand (each input row emits one row per measure).
    // Measures share a type by casting to double up front.
    "q_unpivot" -> QueryDef(
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice").cast("double").as("l_extendedprice"),
          col("l_discount").cast("double").as("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .withColumn("val", round(col("val"), 4))
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""SELECT l_orderkey, l_linenumber, measure, round(val, 4) AS val FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             |         CAST(l_quantity AS DOUBLE) AS val FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
             |         CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount',
             |         CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey < 100)
             |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin)),

    // Recursive CTE ([CH] 24.4+ `WITH RECURSIVE`; Spark 4 UnionLoop):
    // hierarchy walk — every supplier's chain to the root under the
    // deterministic parent function ⌊id/2⌋, reporting depth, chain
    // length, and the chain's id sum. The recursion is a LINEAR
    // self-union (each step joins only the frontier, O(log id) steps
    // here) — Spark executes it as an iterative UnionLoop, exactly
    // the hash-to-min CC iteration shape q_dedup_cluster hand-rolls;
    // both engines run the IDENTICAL statement text.
    "q_recursive_cte" -> QueryDef(
      (s, dir) => {
        Tables(s, dir, "supplier").createOrReplaceTempView("supplier_rc")
        s.sql("""WITH RECURSIVE chain AS (
                |  SELECT s_suppkey AS leaf, CAST(s_suppkey AS BIGINT) AS node, 0 AS depth
                |  FROM supplier_rc
                |  UNION ALL
                |  SELECT leaf, CAST(floor(node / 2.0) AS BIGINT), depth + 1
                |  FROM chain WHERE node > 0)
                |SELECT leaf, CAST(max(depth) AS BIGINT) AS depth_to_root,
                |  CAST(count(*) AS BIGINT) AS chain_len,
                |  CAST(sum(node) AS BIGINT) AS chain_sum
                |FROM chain GROUP BY leaf ORDER BY leaf""".stripMargin)
      },
      Some("""WITH RECURSIVE chain AS (
             |  SELECT s_suppkey AS leaf, CAST(s_suppkey AS BIGINT) AS node, 0 AS depth
             |  FROM supplier
             |  UNION ALL
             |  SELECT leaf, CAST(floor(node / 2.0) AS BIGINT), depth + 1
             |  FROM chain WHERE node > 0)
             |SELECT leaf, CAST(max(depth) AS BIGINT) AS depth_to_root,
             |  CAST(count(*) AS BIGINT) AS chain_len,
             |  CAST(sum(node) AS BIGINT) AS chain_sum
             |FROM chain GROUP BY leaf ORDER BY leaf""".stripMargin)),

    // Explicit grouping sets — SQL-only surface, via spark.sql.
    "q_agg_grouping_sets" -> QueryDef(
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events_gs")
        s.sql("""SELECT coalesce(event_type, 'ALL') AS etype,
                |       coalesce(CAST(user_id AS STRING), 'ALL') AS uid,
                |       count(1) AS n,
                |       round(sum(value), 4) AS sum_value
                |FROM events_gs
                |GROUP BY GROUPING SETS ((event_type), (user_id), ())
                |ORDER BY etype, uid""".stripMargin)
      },
      Some("""SELECT coalesce(event_type, 'ALL') AS etype,
             |       coalesce(CAST(user_id AS VARCHAR), 'ALL') AS uid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(sum(value), 4) AS sum_value
             |FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
             |ORDER BY etype, uid""".stripMargin))
  )
}
