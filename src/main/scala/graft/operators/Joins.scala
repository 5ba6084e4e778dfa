package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C — joins. The reference's only join-like act is the
  * per-DB filename match during GC (backup.sh:119–122), an anti-join by
  * name prefix; the rest is [CH]/[NS] capability.
  *
  * Scale posture per join:
  *  - hash/multiway: shuffle on the join key; AQE re-plans to broadcast
  *    when a side is small, and splits skewed partitions.
  *  - broadcast: explicit `broadcast()` hint on dims that are small at
  *    ANY scale factor (region/nation/customer are TPC-H dims, they
  *    grow far slower than facts).
  *  - semi/anti: `left_semi`/`left_anti` never materialize right-side
  *    payload columns.
  *  - range: banded — the interval is exploded into day-bucket keys so
  *    the theta predicate becomes an equi join + residual filter. A raw
  *    theta join is a BroadcastNestedLoop (O(n·m)); the band version
  *    shuffles on the day key, which survives 100×.
  *  - as-of: single-pass union trick — one shuffle on (user), one sort,
  *    `last(ignoreNulls)` carries the most recent left-side match
  *    forward. No per-row subquery, no cross product, no skew blowup.
  */
object Joins extends QueryModule {

  /** Distributed positional rank for [[pasteJoin]] — the shared
    * [[DistRank]] primitive (range repartition + in-partition sort +
    * offset stamping): distributed ranking is the one primitive the
    * DataFrame API lacks — a `row_number` over an empty `partitionBy`
    * computes the same thing by dragging the WHOLE table through a
    * single task.
    */
  private[graft] def pastePos(df: org.apache.spark.sql.DataFrame,
      order: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame =
    DistRank.withPos(df, order, "pos")

  /** ClickHouse PASTE JOIN: row-by-row concatenation of two ordered
    * sides; the inner join on position truncates to the shorter side
    * (each side's order is explicit — positional semantics over an
    * unordered source would be non-deterministic by definition).
    */
  def pasteJoin(left: org.apache.spark.sql.DataFrame,
      leftOrder: Seq[org.apache.spark.sql.Column],
      right: org.apache.spark.sql.DataFrame,
      rightOrder: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame =
    pastePos(left, leftOrder).join(pastePos(right, rightOrder), Seq("pos"))

  def entries: Map[String, QueryDef] = Map(

    // Equi inner join fact⋈dim, aggregated. Spark picks SMJ/shuffled
    // hash; AQE converts to broadcast at small SF.
    "q_join_hash" -> QueryDef(
      (s, dir) => Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total_price"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             |       round(sum(o_totalprice), 4) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ClickHouse dictGetOrDefault ([CH] dictionaries): the nation
    // table restricted to keys < 20 plays the dictionary, so the top
    // nationkeys MISS and must surface the default, not drop or null.
    // Broadcast left join + coalesce (operators/Dictionary.scala) —
    // the fact side never shuffles, the dict ships once per executor.
    "q_dict_get" -> QueryDef(
      (s, dir) => Dictionary.dictGetOrDefault(
          Tables(s, dir, "customer"),
          Tables(s, dir, "nation").filter(col("n_nationkey") < 20),
          col("c_nationkey"), "n_nationkey", "n_name",
          lit("UNKNOWN"), "nation_name")
        .select("c_custkey", "c_nationkey", "nation_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_nationkey,
             |  coalesce(n_name, 'UNKNOWN') AS nation_name
             |FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) d
             |  ON c_nationkey = d.n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    // RANGE_HASHED dictionary ([CH] range dictionaries): the rates dim
    // is keyed on a segment AND a month-index validity interval —
    // dictGet(key, point) returns the attribute of the interval
    // containing the point, default on no cover. The dim derives from
    // spark.range as ONE projection (no join builds it), 280 rows ×
    // 20 covered segments; segments 20–24 and out-of-range months MISS
    // and must surface rate 1.0. The oracle computes the same rate
    // arithmetically — a different route to the same semantics, so the
    // check is semantic, not an implementation echo.
    "q_dict_range" -> QueryDef(
      (s, dir) => {
        val dim = s.range(0, 350)
          .select(expr("id div 14").cast("int").as("seg"),
            (col("id") % 14).cast("int").as("h"))
          .filter(col("seg") < 20)
          .select(col("seg"), (col("h") * 6).cast("int").as("r0"),
            (col("h") * 6 + 5).cast("int").as("r1"),
            (((col("seg") * 31 + col("h")) % 97) / lit(10.0)).as("rate"))
        val fact = Tables(s, dir, "orders")
          .withColumn("seg", (col("o_custkey") % 25).cast("int"))
          .withColumn("midx", ((year(col("o_orderdate")) - 1992) * 12
            + month(col("o_orderdate")) - 1).cast("int"))
        Dictionary.dictGetRange(fact, dim, col("seg"), col("midx"),
            "seg", "r0", "r1", "rate", lit(1.0), "fx_rate")
          .groupBy("seg")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice") * col("fx_rate")), 4).as("converted"))
          .orderBy("seg")
      },
      Some("""SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sum(o_totalprice * rate), 4) AS converted
             |FROM (
             |  SELECT o_custkey % 25 AS seg, o_totalprice,
             |    CASE WHEN o_custkey % 25 < 20
             |          AND ((year(o_orderdate)-1992)*12 + month(o_orderdate)-1) BETWEEN 0 AND 83
             |      THEN (((o_custkey % 25) * 31
             |             + ((year(o_orderdate)-1992)*12 + month(o_orderdate)-1) // 6) % 97) / 10.0
             |      ELSE 1.0 END AS rate
             |  FROM orders)
             |GROUP BY seg ORDER BY seg""".stripMargin)),

    // Small-dim broadcast join: no shuffle of the probe side at all.
    "q_join_broadcast" -> QueryDef(
      (s, dir) => Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name, r_name
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY n_nationkey""".stripMargin)),

    // 3-table star join (TPC-H Q3 shape): Catalyst reorders; the dim
    // chain (customer) broadcasts, the fact⋈fact (orders⋈lineitem)
    // shuffles on the shared key once.
    "q_join_multiway" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy("c_mktsegment", "o_orderpriority"),
      Some("""SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_mktsegment, o_orderpriority
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    // EXISTS: customers with at least one high-value order. The [R]
    // seed is "keep files that belong to a live DB" (backup.sh:119).
    "q_join_semi" -> QueryDef(
      (s, dir) => {
        val bigOrders = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        Tables(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // NOT EXISTS: the GC delete set (backup.sh:119–122).
    "q_join_anti" -> QueryDef(
      (s, dir) => {
        val bigOrders = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        Tables(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // FULL OUTER join: customers with their order rollup, keeping
    // customers who never ordered AND any orphan orders (the fixture
    // has the former; the operator handles both). Null-extension
    // happens inside the same shuffled hash join — no extra pass; the
    // small pre-aggregated side still partitions on the key. At scale
    // the hazard is the null-extended rows all carrying a null key —
    // they are ALREADY partitioned by the surviving side's key here,
    // so no null-key hotspot forms.
    "q_join_outer" -> QueryDef(
      (s, dir) => {
        val perCust = Tables(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 4).as("spend"))
        Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_mktsegment"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
          .orderBy("custkey")
      },
      Some("""WITH pc AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             |         round(sum(o_totalprice), 4) AS spend
             |  FROM orders GROUP BY o_custkey)
             |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
             |       coalesce(n_orders, 0) AS n_orders,
             |       coalesce(spend, 0.0) AS spend
             |FROM customer FULL OUTER JOIN pc ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin)),

    // Interval join, banded: lineitems shipped within [o_orderdate,
    // o_orderdate + 3 days). Two scale tricks compose here:
    //  1. band the interval into day buckets so the theta predicate
    //     becomes an equi join (a naive theta join is a nested loop
    //     that dies at 100×);
    //  2. the probe side is aggregable BEFORE the join — the count per
    //     order only needs per-day lineitem counts (both sides are
    //     date-granular), so 600k lineitems collapse to ~2.5k day rows
    //     that broadcast. The join output equals the row-level banded
    //     join but the intermediate drops from ~10⁸ pairs to |orders|·3.
    "q_join_range" -> QueryDef(
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
          .withColumn("off", explode(sequence(lit(0), lit(2))))
          .withColumn("day_key", date_add(to_date(col("o_orderdate")), col("off")))
        val dayCounts = Tables(s, dir, "lineitem")
          .groupBy(to_date(col("l_shipdate")).as("day_key"))
          .agg(count(lit(1)).as("day_n"))
        orders.join(broadcast(dayCounts), Seq("day_key"), "inner")
          .groupBy("o_orderkey")
          .agg(sum(col("day_n")).as("n_shipped"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
             |FROM orders JOIN lineitem
             |  ON l_shipdate >= o_orderdate
             | AND l_shipdate < o_orderdate + INTERVAL 3 DAY
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // As-of join: each purchase matched to the latest prior click of
    // the same user. Composite per SURVEY.md §2.C: single shuffle on
    // user, one sort, `last(ignoreNulls)` carries the match forward —
    // the sort-merge as-of shape, no per-key cross product.
    "q_join_asof" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Relational.eventsSec(s, dir)
          .withColumn("click_id",
            when(col("event_type") === "click", col("event_id")))
          .withColumn("prior_click_id", last(col("click_id"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "prior_click_id")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, prior_click_id FROM (
             |  SELECT event_id, user_id, event_type,
             |         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |           OVER (PARTITION BY user_id
             |                 ORDER BY date_trunc('second', ts), event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click_id
             |  FROM events)
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // As-of join WITH TOLERANCE (pandas merge_asof(tolerance=…) /
    // QuestDB ASOF … TOLERANCE): the q_join_asof union-window shape —
    // one shuffle on user, zero self-joins — but the matched prior
    // click is DISCARDED when its gap exceeds 10 minutes (a stale
    // attribution). Carrying (click_ts, click_id) through one
    // ignore-nulls last() keeps the gap computation row-local;
    // integer-second arithmetic so the cut cannot sit on a float
    // boundary.
    "q_join_asof_near" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Relational.eventsSec(s, dir)
          .withColumn("t", unix_timestamp(col("ts_s")))
          .withColumn("click",
            when(col("event_type") === "click",
              struct(col("t").as("ct"), col("event_id").as("cid"))))
          .withColumn("prior", last(col("click"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .withColumn("gap_sec", col("t") - col("prior.ct"))
          .select(col("event_id"), col("user_id"),
            when(col("gap_sec") <= 600, col("prior.cid")).as("near_click_id"),
            when(col("gap_sec") <= 600, col("gap_sec")).as("gap_sec"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN gap_sec <= 600 THEN prior_cid END AS near_click_id,
             |  CASE WHEN gap_sec <= 600 THEN gap_sec END AS gap_sec
             |FROM (
             |  SELECT event_id, user_id, event_type,
             |    CAST(epoch(date_trunc('second', ts)) -
             |      last_value(CASE WHEN event_type = 'click'
             |          THEN epoch(date_trunc('second', ts)) END IGNORE NULLS)
             |        OVER w AS BIGINT) AS gap_sec,
             |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |      OVER w AS prior_cid
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY date_trunc('second', ts), event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // Correlated LATERAL join (SQL-only surface, like
    // q_agg_grouping_sets): per outer row, a dependent subquery — here
    // each nation's top-2 customers by balance. Catalyst DECORRELATES
    // the per-row subquery: the plan is WindowGroupLimit (partial+final
    // per-group top-k, map-side pruned before the exchange) feeding a
    // broadcast join with the outer side — NOT a nested loop per
    // nation, which is what a naive lateral executor would run and
    // what would never survive 100 TB.
    "q_join_lateral" -> QueryDef(
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation_lat")
        Tables(s, dir, "customer").createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 4) AS acctbal
                |FROM nation_lat n,
                |LATERAL (SELECT c_custkey, c_acctbal FROM customer_lat
                |         WHERE c_nationkey = n.n_nationkey
                |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
                |ORDER BY n_name, c_custkey""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 4) AS acctbal
             |FROM nation n,
             |LATERAL (SELECT c_custkey, c_acctbal FROM customer
             |         WHERE c_nationkey = n.n_nationkey
             |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
             |ORDER BY n_name, c_custkey""".stripMargin)),

    // Salted skew join ([NS] 100 TB posture, SURVEY.md §4): the
    // orders⋈customer join run through Skew.saltedJoin — the big side
    // spread over 8 deterministic sub-keys, the small side replicated
    // once per salt — then aggregated per segment. Salting is
    // semantics-neutral (SnapshotSpec pins salted ≡ unsalted row-for-
    // row), so the oracle is the PLAIN join: the query verifies the
    // mitigation changes nothing but the partitioning. This is the
    // manual fallback for skew AQE can't fix — e.g. when the hot key
    // also feeds a same-key groupBy, where pre-salting fixes the join
    // AND the partial aggregate together.
    // ClickHouse dictGetHierarchy ([CH] dictionaries): walk the
    // customer → nation → region chain, surfacing each level. The
    // nation dict is again restricted (< 20) so top nationkeys MISS —
    // the chain must null both levels for them, never drop the row.
    // N broadcast hops, zero fact shuffles at any depth.
    "q_dict_hierarchy" -> QueryDef(
      (s, dir) => Dictionary.dictGetHierarchy(
          Tables(s, dir, "customer"),
          Seq(
            Dictionary.DictLevel(
              Tables(s, dir, "nation").filter(col("n_nationkey") < 20),
              "n_nationkey", "n_name", Some("n_regionkey")),
            Dictionary.DictLevel(
              Tables(s, dir, "region"), "r_regionkey", "r_name", None)),
          col("c_nationkey"), Seq("nation_name", "region_name"))
        .select("c_custkey", "nation_name", "region_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, n_name AS nation_name, r_name AS region_name
             |FROM customer
             |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
             |  ON c_nationkey = n_nationkey
             |LEFT JOIN region ON n_regionkey = r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    // ClickHouse PASTE JOIN ([CH] SQL surface, 23.12+): concatenate
    // two deterministically-ordered sides row-by-row — rank-aligned
    // series comparison (here: the acctbal distribution of customers
    // vs suppliers, rank by rank). The global position is computed by
    // DISTRIBUTED ranking (`pastePos`): range-repartition + sort
    // within partitions, then zipWithIndex stamps offsets from
    // per-partition counts — one small counting job, NO empty-
    // partitionBy Window (which would drag the whole table through a
    // single task — the classic positional-join scale killer). The
    // inner equi-join on position truncates to the shorter side,
    // and at sf the supplier side is 100× smaller ⇒ AQE broadcasts.
    "q_join_paste" -> QueryDef(
      (s, dir) => {
        val left = Tables(s, dir, "customer").select("c_custkey", "c_acctbal")
        val right = Tables(s, dir, "supplier").select("s_suppkey", "s_acctbal")
        pasteJoin(
            left, Seq(col("c_acctbal").desc, col("c_custkey").asc),
            right, Seq(col("s_acctbal").desc, col("s_suppkey").asc))
          .select((col("pos") + 1).as("rank"),
            col("c_custkey"), round(col("c_acctbal"), 4).as("c_bal"),
            col("s_suppkey"), round(col("s_acctbal"), 4).as("s_bal"))
          .orderBy("rank")
      },
      Some("""WITH l AS (
             |  SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rank,
             |         c_custkey, round(c_acctbal, 4) AS c_bal
             |  FROM customer),
             |r AS (
             |  SELECT row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rank,
             |         s_suppkey, round(s_acctbal, 4) AS s_bal
             |  FROM supplier)
             |SELECT CAST(l.rank AS BIGINT) AS rank, c_custkey, c_bal, s_suppkey, s_bal
             |FROM l JOIN r USING (rank) ORDER BY rank""".stripMargin)),

    "q_join_skew" -> QueryDef(
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        Skew.saltedJoin(Tables(s, dir, "orders"), cust,
            key = "o_custkey", idCol = "o_orderkey", salts = 8)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 4).as("total"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sum(o_totalprice), 4) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Correlated scalar subquery ([CH] SQL surface): customers above
    // their own nation's average balance, with that average projected.
    // Catalyst DECORRELATES both subqueries into one per-nation
    // aggregate joined back to the outer side — the nation-average
    // grid is 25 rows, so the join broadcasts; nothing evaluates a
    // subquery per row (the naive interpretation that would never
    // survive scale). Same decorrelation story as q_join_lateral, for
    // the scalar-subquery shape instead of the LIMIT-k one.
    "q_subquery_scalar" -> QueryDef(
      (s, dir) => {
        Tables(s, dir, "customer").createOrReplaceTempView("customer_sq")
        s.sql("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal,
                |  round((SELECT avg(c2.c_acctbal) FROM customer_sq c2
                |         WHERE c2.c_nationkey = c.c_nationkey), 4) AS nation_avg
                |FROM customer_sq c
                |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_sq c2
                |                   WHERE c2.c_nationkey = c.c_nationkey)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, round(c_acctbal, 4) AS acctbal,
             |  round((SELECT avg(c2.c_acctbal) FROM customer c2
             |         WHERE c2.c_nationkey = c.c_nationkey), 4) AS nation_avg
             |FROM customer c
             |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
             |                   WHERE c2.c_nationkey = c.c_nationkey)
             |ORDER BY c_custkey""".stripMargin))
  )
}
