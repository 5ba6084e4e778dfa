package graft

import graft.plans.{ChDialect, Dialect}
import org.apache.spark.sql.execution.ExplainMode

/** The ClickHouse-dialect translator ([[plans.Dialect]]): exact
  * translation strings per construct, byte-identity on ANSI/Spark
  * text, fail-fast on the constructs that cannot translate exactly,
  * and — the part that matters at 100 TB — proof that the translated
  * text produces the SAME optimized Catalyst plan as the hand-written
  * Spark twin (translation is submit-time; the executed plan owes it
  * nothing).
  */
class DialectSpec extends SparkSpec {

  private val reg = Dialect.Registry(
    finals = Map("evf" -> (Seq("user_id", "event_type"), Seq("event_id"))),
    samples = Map("orders_chv" -> "o_orderkey"))

  private def t(sql: String): String = Dialect.translate(sql, reg)

  // ── translation strings ────────────────────────────────────────────

  test("PREWHERE merges into WHERE; SETTINGS and FORMAT strip") {
    assert(t("SELECT a FROM t PREWHERE x > 1 WHERE y < 2 SETTINGS max_threads = 8")
      == "SELECT a FROM t WHERE(x > 1) AND(y < 2)")
    assert(t("SELECT a FROM t PREWHERE x > 1 GROUP BY a FORMAT JSONEachRow")
      == "SELECT a FROM t WHERE x > 1 GROUP BY a")
  }

  test("FINAL becomes one max_by(struct(*)) aggregate on the registered key/version") {
    assert(t("SELECT * FROM evf FINAL") ==
      "SELECT * FROM (SELECT __graft_row.* FROM (SELECT max_by(struct(*), " +
        "struct(event_id)) AS __graft_row FROM evf GROUP BY user_id, event_type)) evf")
  }

  test("SAMPLE f becomes the deterministic md5-bucket filter on the registered key") {
    assert(t("SELECT count() FROM orders_chv SAMPLE 0.25") ==
      "SELECT count(*) FROM (SELECT * FROM orders_chv WHERE " +
        "substr(md5(CAST(o_orderkey AS STRING)), 1, 4) < '4000') orders_chv")
  }

  test("LIMIT n BY becomes the per-group row_number window") {
    assert(t("SELECT k, v FROM t ORDER BY k, v LIMIT 2 BY k") ==
      "SELECT k, v FROM (SELECT k, v, row_number() OVER (PARTITION BY k " +
        "ORDER BY k, v) AS __graft_rn FROM t) WHERE __graft_rn <= 2 ORDER BY k, v")
    // trailing LIMIT m survives after the window filter
    assert(t("SELECT k, v AS w FROM t ORDER BY v LIMIT 1 BY k LIMIT 10")
      .endsWith("ORDER BY v LIMIT 10"))
  }

  test("combinators, parametrics, renames, ARRAY JOIN, WITH TOTALS, GLOBAL") {
    assert(t("SELECT countIf(x > 1), sumIf(v, x = 2) FROM t") ==
      "SELECT count(*) FILTER (WHERE x > 1), sum(v) FILTER (WHERE x = 2) FROM t")
    assert(t("SELECT quantile(0.5)(v), uniqUpTo(3)(k) FROM t") ==
      "SELECT percentile(v, 0.5), least(count(DISTINCT k), CAST(3 AS BIGINT) + 1) FROM t")
    assert(t("SELECT argMax(a, b), uniqExact(k), groupArray(v) FROM t") ==
      "SELECT max_by(a, b), count(DISTINCT k), sort_array(collect_list(v)) FROM t")
    assert(t("SELECT x FROM t ARRAY JOIN splitByChar(',', s) AS x") ==
      "SELECT x FROM t LATERAL VIEW explode(split(s, ',')) __graft_aj AS x")
    // regex metachar separators arrive escaped for Spark's regex split
    assert(t("SELECT splitByChar('.', s) FROM t") ==
      "SELECT split(s, '\\\\.') FROM t")
    assert(t("SELECT k, count() FROM t GROUP BY k WITH TOTALS") ==
      "SELECT k, count(*) FROM t GROUP BY GROUPING SETS ((k), ())")
    assert(t("SELECT a FROM t1 GLOBAL JOIN t2 ON t1.k = t2.k") ==
      "SELECT a FROM t1 JOIN t2 ON t1.k = t2.k")
    assert(t("SELECT multiIf(a > 1, 'x', a > 0, 'y', 'z') FROM t") ==
      "SELECT CASE WHEN a > 1 THEN 'x' WHEN a > 0 THEN 'y' ELSE 'z' END FROM t")
    assert(t("SELECT arrayMap(x -> x * 2, a), has(a, 1) FROM t") ==
      "SELECT transform(a, x -> x * 2), array_contains(a, 1) FROM t")
    assert(t("SELECT toStartOfMonth(d), toDayOfWeek(d), dateDiff('day', a, b) FROM t") ==
      "SELECT to_date(date_trunc('MONTH', d)), CAST(pmod(dayofweek(d) + 5, 7) + 1 " +
        "AS INT), timestampdiff(DAY, a, b) FROM t")
  }

  // ── identity and collision safety ──────────────────────────────────

  test("ANSI/Spark text passes through byte-identical") {
    val stmts = Seq(
      "SELECT a, count(*) FROM t WHERE x LIKE '%FINAL%' GROUP BY a",
      "SELECT position('ab' IN x), any(flag), length(s) FROM t",
      "SELECT * FROM t WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'",
      "SELECT extract(DAY FROM ts), substring(s FROM 1 FOR 2) FROM t",
      // a column NAMED global / sample / final outside its clause position
      "SELECT global, sample FROM t WHERE final = 1")
    stmts.foreach(s => assert(t(s) eq s, s"not byte-identical: $s"))
  }

  test("string literals are never rewritten") {
    val s = "SELECT 'countIf(x) FINAL PREWHERE toDate' AS lit, countIf(x > 0) FROM t"
    assert(t(s) ==
      "SELECT 'countIf(x) FINAL PREWHERE toDate' AS lit, count(*) FILTER (WHERE x > 0) FROM t")
  }

  // ── fail-fast on inexact constructs ────────────────────────────────

  test("inexact constructs refuse with the construct named") {
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT a FROM t1 ASOF JOIN t2 ON t1.k = t2.k AND t1.ts >= t2.ts")
      .contains("ASOF"))
    assert(err("SELECT a FROM t1 ANY RIGHT JOIN t2 ON t1.k = t2.k")
      .contains("ANY RIGHT"))
    assert(err("SELECT a FROM orders_chv SAMPLE 1000").contains("SAMPLE"))
    assert(err("SELECT a FROM unregistered FINAL").contains("no key/version registered"))
    assert(err("SELECT a FROM unregistered2 SAMPLE 0.5").contains("no sample key"))
    assert(err("SELECT a FROM t LIMIT 2 BY a").contains("ORDER BY"))
    assert(err("SELECT a + 1 FROM t ORDER BY a LIMIT 2 BY a").contains("alias"))
  }

  // ── plan identity: translated text == hand-written Spark twin ─────

  private def optimized(sql: String) =
    spark.sql(sql).queryExecution.optimizedPlan.canonicalized

  test("translated PREWHERE and LIMIT BY produce the hand-written twin's optimized plan") {
    Tables(spark, sf, "lineitem").createOrReplaceTempView("li_dsp")
    assert(optimized(t(
      "SELECT l_returnflag, count() AS n FROM li_dsp PREWHERE l_discount > 0.03 " +
        "WHERE l_quantity < 10 GROUP BY l_returnflag")) ==
      optimized(
        "SELECT l_returnflag, count(*) AS n FROM li_dsp " +
          "WHERE l_discount > 0.03 AND l_quantity < 10 GROUP BY l_returnflag"),
      "PREWHERE translation must optimize to the twin's plan")
    assert(optimized(t(
      "SELECT l_returnflag, l_orderkey FROM li_dsp ORDER BY l_returnflag, l_orderkey " +
        "LIMIT 2 BY l_returnflag")) ==
      optimized(
        "SELECT l_returnflag, l_orderkey FROM (SELECT l_returnflag, l_orderkey, " +
          "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_returnflag, " +
          "l_orderkey) AS rn FROM li_dsp) WHERE rn <= 2 " +
          "ORDER BY l_returnflag, l_orderkey"),
      "LIMIT BY translation must optimize to the twin's window plan")
  }

  test("PREWHERE predicates reach the parquet scan as pushed filters") {
    val df = ChDialect.entries("q_ch_prewhere").fn(spark, sf)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_discount"),
      "the WHERE conjunct must push into the scan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      "the PREWHERE conjunct must push into the scan")
  }

  test("GLOBAL JOIN dissolves into a broadcast hash join") {
    val df = ChDialect.entries("q_ch_global_join").fn(spark, sf)
    df.collect() // finalize AQE
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the 25-row nation side must broadcast")
  }

  test("FINAL is one map-side-combined aggregate — no per-row window, one shuffle") {
    val df = ChDialect.entries("q_ch_final").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "FINAL must not plan a window")
    // the struct-valued max_by plans as SortAggregate (struct agg
    // buffers are not hash-aggregable), but the property that matters
    // at scale holds: a PARTIAL aggregate runs before the exchange, so
    // the shuffle carries one candidate row per (key, partition), not
    // every version
    assert(plan.contains("partial_max_by"),
      "FINAL must partial-aggregate map-side before the exchange")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"FINAL must add exactly one key shuffle, saw $shuffles")
  }

  test("dialect FINAL ≡ the engine's replacingFinal collapse, row for row") {
    import org.apache.spark.sql.functions._
    val viaDialect = ChDialect.entries("q_ch_final").fn(spark, sf)
      .select("user_id", "event_type", "last_event_id", "last_value")
    val viaBuilder = operators.Relational.eventsSec(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(max("event_id").as("last_event_id"),
        round(max_by(col("value"), col("event_id")), 4).as("last_value"))
      .orderBy("user_id", "event_type")
    assert(viaDialect.collect().toSeq == viaBuilder.collect().toSeq)
  }

  // ── ASOF JOIN ──────────────────────────────────────────────────────

  private def asofFixtures(): Unit = {
    import spark.implicits._
    Seq((1L, 5L, "a"), (1L, 10L, "b"), (2L, 3L, "c"))
      .toDF("k", "t", "v").createOrReplaceTempView("asof_l_dsp")
    Seq((1L, 5L, "x"), (1L, 7L, "y"), (2L, 9L, "z"))
      .toDF("k", "t", "p").createOrReplaceTempView("asof_r_dsp")
  }

  private def asofRows(sql: String): Seq[String] = {
    val out = Dialect.translate(spark, sql)
    spark.sql(out).collect().toSeq.map(_.toString)
  }

  test("ASOF LEFT JOIN: latest right row at-or-before, per key, NULL when none") {
    asofFixtures()
    assert(asofRows(
      "SELECT a.k, a.t, a.v, b.p FROM asof_l_dsp AS a ASOF LEFT JOIN asof_r_dsp AS b " +
        "ON a.k = b.k AND a.t >= b.t ORDER BY a.k, a.t") ==
      Seq("[1,5,a,x]", "[1,10,b,y]", "[2,3,c,null]"))
  }

  test("ASOF inner join drops unmatched; strict > excludes the equal-time row") {
    asofFixtures()
    assert(asofRows(
      "SELECT a.k, a.t, b.p FROM asof_l_dsp AS a ASOF JOIN asof_r_dsp AS b " +
        "ON a.k = b.k AND a.t >= b.t ORDER BY a.k, a.t") ==
      Seq("[1,5,x]", "[1,10,y]"))
    assert(asofRows(
      "SELECT a.k, a.t, b.p FROM asof_l_dsp AS a ASOF LEFT JOIN asof_r_dsp AS b " +
        "ON a.k = b.k AND a.t > b.t ORDER BY a.k, a.t") ==
      Seq("[1,5,null]", "[1,10,y]", "[2,3,null]"))
  }

  test("forward-looking ASOF (<=) finds the earliest right row at-or-after") {
    asofFixtures()
    assert(asofRows(
      "SELECT a.k, a.t, b.p FROM asof_l_dsp AS a ASOF LEFT JOIN asof_r_dsp AS b " +
        "ON a.k = b.k AND a.t <= b.t ORDER BY a.k, a.t") ==
      Seq("[1,5,x]", "[1,10,null]", "[2,3,z]"))
  }

  test("ASOF translation: one key shuffle + windows, no range/nested-loop join") {
    asofFixtures()
    val out = Dialect.translate(spark,
      "SELECT a.k, b.p FROM asof_l_dsp AS a ASOF LEFT JOIN asof_r_dsp AS b " +
        "ON a.k = b.k AND a.t >= b.t")
    val plan = spark.sql(out).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "ASOF must not plan a join operator at all")
    // flipped spellings normalize (r.t <= l.t ≡ l.t >= r.t)
    val flipped = Dialect.translate(spark,
      "SELECT a.k, b.p FROM asof_l_dsp AS a ASOF LEFT JOIN asof_r_dsp AS b " +
        "ON b.k = a.k AND b.t <= a.t")
    assert(flipped == out, "flipped condition spelling must normalize identically")
  }

  test("ASOF refuses what it cannot translate, with the defect named") {
    asofFixtures()
    def err(sql: String): String =
      intercept[Dialect.DialectException](Dialect.translate(spark, sql)).getMessage
    assert(err("SELECT 1 FROM asof_l_dsp a ASOF JOIN asof_r_dsp b ON a.t >= b.t")
      .contains("equi-key"))
    assert(err("SELECT 1 FROM asof_l_dsp a ASOF JOIN asof_r_dsp b ON a.k = b.k")
      .contains("inequality"))
    assert(err("SELECT 1 FROM nonexistent_dsp a ASOF JOIN asof_r_dsp b " +
      "ON a.k = b.k AND a.t >= b.t").contains("schema"))
  }

  // ── WITH FILL ──────────────────────────────────────────────────────

  test("WITH FILL densifies the grid; INTERPOLATE carries the last value forward") {
    import spark.implicits._
    Seq((0L, 1.5), (2L, 2.5), (5L, 3.5))
      .toDF("b", "v").createOrReplaceTempView("fill_dsp")
    val out = Dialect.translate(spark,
      "SELECT b, round(sum(v), 4) AS sv FROM fill_dsp GROUP BY b " +
        "ORDER BY b WITH FILL FROM 0 TO 7 INTERPOLATE (sv AS sv)")
    val rows = spark.sql(out).collect().toSeq.map(_.toString)
    assert(rows == Seq("[0,1.5]", "[1,1.5]", "[2,2.5]", "[3,2.5]", "[4,2.5]",
      "[5,3.5]", "[6,3.5]"))
    // without INTERPOLATE the filled rows carry NULL payloads, and rows
    // OUTSIDE the grid survive (full-outer semantics, as in ClickHouse)
    val plain = Dialect.translate(spark,
      "SELECT b, round(sum(v), 4) AS sv FROM fill_dsp GROUP BY b " +
        "ORDER BY b WITH FILL FROM 0 TO 3")
    assert(spark.sql(plain).collect().toSeq.map(_.toString) ==
      Seq("[0,1.5]", "[1,null]", "[2,2.5]", "[5,3.5]"))
  }

  test("WITH FILL without FROM/TO infers the span from the result's min/max") {
    import spark.implicits._
    Seq((2L, 1.5), (5L, 3.5)).toDF("b", "v").createOrReplaceTempView("fill3_dsp")
    val out = Dialect.translate(spark,
      "SELECT b, round(sum(v), 4) AS sv FROM fill3_dsp GROUP BY b " +
        "ORDER BY b WITH FILL")
    // inferred bounds are TO-inclusive: [min, max] = [2, 5]
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[2,1.5]", "[3,null]", "[4,null]", "[5,3.5]"))
  }

  test("WITH FILL densifies DATE spans with INTERVAL steps") {
    import spark.implicits._
    Seq(("2024-01-02", 5L), ("2024-01-05", 7L))
      .toDF("ds", "n").selectExpr("to_date(ds) AS d", "n")
      .createOrReplaceTempView("filld_dsp")
    val out = Dialect.translate(spark,
      "SELECT d, sum(n) AS sn FROM filld_dsp GROUP BY d ORDER BY d " +
        "WITH FILL FROM toDate('2024-01-01') TO toDate('2024-01-07') " +
        "STEP INTERVAL 1 DAY")
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[2024-01-01,null]", "[2024-01-02,5]", "[2024-01-03,null]",
        "[2024-01-04,null]", "[2024-01-05,7]", "[2024-01-06,null]"))
  }

  test("WITH FILL refuses TO-only spans and non-output keys") {
    import spark.implicits._
    Seq((1L, 1.0)).toDF("b", "v").createOrReplaceTempView("fill2_dsp")
    def err(sql: String): String =
      intercept[Dialect.DialectException](Dialect.translate(spark, sql)).getMessage
    assert(err("SELECT b FROM fill2_dsp ORDER BY b WITH FILL TO 3")
      .contains("FROM"))
    assert(err("SELECT v FROM fill2_dsp ORDER BY b WITH FILL FROM 0 TO 3")
      .contains("select outputs"))
  }

  test("ASOF carries the MATCHED row whole: its NULL payload stays NULL") {
    import spark.implicits._
    // right row (1, 7) has a NULL payload; per-column carry would
    // back-fill it from the older (1, 5, "x") row — the matched row's
    // own NULL must survive (ClickHouse returns the matched row verbatim)
    Seq((1L, 10L, "l")).toDF("k", "t", "v")
      .createOrReplaceTempView("asofn_l_dsp")
    Seq((1L, 5L, Some("x")), (1L, 7L, None))
      .toDF("k", "t", "p").createOrReplaceTempView("asofn_r_dsp")
    assert(asofRows(
      "SELECT a.k, a.t, b.t AS rt, b.p FROM asofn_l_dsp AS a " +
        "ASOF LEFT JOIN asofn_r_dsp AS b ON a.k = b.k AND a.t >= b.t") ==
      Seq("[1,10,7,null]"))
  }

  // ── round-12 translator hardening ──────────────────────────────────

  test("PREWHERE never crosses a UNION branch boundary") {
    assert(t("SELECT a FROM t1 PREWHERE p > 1 UNION ALL SELECT a FROM t2 WHERE w < 2")
      == "SELECT a FROM t1 WHERE p > 1 UNION ALL SELECT a FROM t2 WHERE w < 2")
    // each branch merges with ITS OWN WHERE only
    assert(t("SELECT a FROM t1 PREWHERE p = 1 WHERE q = 2 UNION ALL " +
      "SELECT a FROM t2 PREWHERE r = 3")
      == "SELECT a FROM t1 WHERE(p = 1) AND(q = 2) UNION ALL " +
        "SELECT a FROM t2 WHERE r = 3")
  }

  test("optimizer-hint comments survive a firing rewrite") {
    assert(t("SELECT /*+ BROADCAST(t2) */ a, countIf(x > 0) FROM t1 " +
      "JOIN t2 ON t1.k = t2.k")
      == "SELECT /*+ BROADCAST(t2) */ a, count(*) FILTER (WHERE x > 0) " +
        "FROM t1 JOIN t2 ON t1.k = t2.k")
    // plain comments are still discarded; LIMIT BY's re-projection
    // tolerates a hint ahead of the first select item
    assert(t("SELECT /*+ REPARTITION(8) */ k, v FROM t ORDER BY k, v LIMIT 1 BY k")
      .startsWith("SELECT k, v FROM"))
  }

  test("ClickHouse hash families refuse instead of renaming to different values") {
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT cityHash64(x) FROM t").contains("hash"))
    assert(err("SELECT sipHash64(x) FROM t").contains("DIFFERENT values"))
  }

  test("ambiguous byte-vs-char names refuse once the text is proven dialect") {
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT length(s), countIf(x > 0) FROM t").contains("ambiguous"))
    assert(err("SELECT any(v) FROM t PREWHERE x = 1").contains("ambiguous"))
    // pure-ANSI statements keep byte-identical pass-through
    val ansi = "SELECT length(s), any(v), position('a' IN s) FROM t"
    assert(t(ansi) eq ansi)
  }

  test("SAMPLE f that rounds to the whole keyspace keeps everything") {
    // f ≥ 0.9999924 rounds cut to 65536 — 5 hex chars, which the 4-char
    // compare would read as '1000…' and keep only ~6% of rows
    assert(t("SELECT count() FROM orders_chv SAMPLE 0.999999") ==
      "SELECT count(*) FROM orders_chv")
    // integer SAMPLE 1 is ClickHouse's COEFFICIENT form (k ∈ [0, 1] is
    // a fraction; only k > 1 is a row target): keep everything, never
    // a silent 1-row answer
    assert(t("SELECT count() FROM orders_chv SAMPLE 1") ==
      "SELECT count(*) FROM orders_chv")
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT a FROM orders_chv SAMPLE 1/10").contains("ratio"))
  }

  test("integer SAMPLE n: deterministic md5-rank rows, map-side pruned") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_si_dsp")
    Dialect.registerSample(spark, "orders_si_dsp", "o_orderkey")
    val out = Dialect.translate(spark,
      "SELECT o_orderkey FROM orders_si_dsp SAMPLE 100")
    val df = spark.sql(out)
    val got = df.collect().map(_.getLong(0)).toSet
    val want = spark.sql(
      "SELECT o_orderkey FROM (SELECT o_orderkey, row_number() OVER (ORDER BY " +
        "md5(CAST(o_orderkey AS STRING)), o_orderkey) AS rn FROM orders_si_dsp) " +
        "WHERE rn <= 100").collect().map(_.getLong(0)).toSet
    assert(got.size == 100 && got == want)
    // the rank filter must prune map-side BEFORE the single-partition
    // window: either WindowGroupLimit or (better) the rank-limit
    // pushdown to TakeOrderedAndProject — each map task forwards at
    // most n candidate rows, never the table
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"),
      s"integer SAMPLE must prune map-side, saw:\n$plan")
    // the rank column must not leak into the sampled relation's *
    assert(spark.sql(Dialect.translate(spark,
      "SELECT * FROM orders_si_dsp SAMPLE 5")).columns.toSeq ==
      Tables(spark, sf, "orders").columns.toSeq)
  }

  test("multi-array ARRAY JOIN zips positionally, NULL-padding the shorter") {
    import spark.implicits._
    Seq((1L, Seq(1, 2, 3), Seq("a", "b", "c")), (2L, Seq(7, 8), Seq("z")))
      .toDF("id", "xs", "ys").createOrReplaceTempView("ajm_dsp")
    val out = Dialect.translate(spark,
      "SELECT id, x, y FROM ajm_dsp ARRAY JOIN xs AS x, ys AS y ORDER BY id, x")
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[1,1,a]", "[1,2,b]", "[1,3,c]", "[2,7,z]", "[2,8,null]"))
    // still one per-partition pipeline: no shuffle added by the zip
    assert(!spark.sql(out.replaceAll("ORDER BY id, x$", ""))
      .queryExecution.executedPlan.toString.contains("Exchange"),
      "multi-array ARRAY JOIN must not shuffle")
  }

  test("multi-array and bare ARRAY JOIN keep internal columns out of SELECT *") {
    import spark.implicits._
    Seq((1L, Seq(1, 2), Seq("a", "b"))).toDF("id", "xs", "ys")
      .createOrReplaceTempView("ajw_dsp")
    // the r12 leak: __graft_pos/__graft_arrN must NOT surface — the
    // schema-projected wrap exposes exactly source columns + aliases
    val multi = spark.sql(Dialect.translate(spark,
      "SELECT * FROM ajw_dsp ARRAY JOIN xs AS x, ys AS y"))
    assert(multi.columns.toSeq == Seq("id", "xs", "ys", "x", "y"),
      s"SELECT * leaked internals: ${multi.columns.mkString(",")}")
    // bare form: the array column itself is REPLACED by its elements
    val bare = spark.sql(Dialect.translate(spark,
      "SELECT * FROM ajw_dsp ARRAY JOIN xs"))
    assert(bare.columns.toSeq == Seq("id", "xs", "ys"))
    assert(bare.select("xs").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("bare ARRAY JOIN shadows the source column, including inside expressions") {
    import spark.implicits._
    Seq((1L, Seq(1, 2, 3)), (2L, Seq(10, 20))).toDF("id", "xs")
      .createOrReplaceTempView("ajb_dsp")
    val out = Dialect.translate(spark,
      "SELECT id, xs, xs * 2 AS dbl FROM ajb_dsp ARRAY JOIN xs ORDER BY id, xs")
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[1,1,2]", "[1,2,4]", "[1,3,6]", "[2,10,20]", "[2,20,40]"))
    // WHERE and GROUP BY see the element too (ClickHouse's shadowing)
    val agg = Dialect.translate(spark,
      "SELECT id, count() AS n FROM ajb_dsp ARRAY JOIN xs WHERE xs > 1 " +
        "GROUP BY id ORDER BY id")
    assert(spark.sql(agg).collect().toSeq.map(_.toString) == Seq("[1,2]", "[2,2]"))
    // over a subquery FROM item the shadowing projection resolves from
    // the ANALYZED subquery schema (r15 — previously a named refusal)
    val sub = Dialect.translate(spark,
      "SELECT xs FROM (SELECT xs FROM ajb_dsp) q ARRAY JOIN xs")
    assert(spark.sql(sub).collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3, 10, 20))
    // a bare derived expression cannot shadow anything → named refusal
    val err2 = intercept[Dialect.DialectException](Dialect.translate(spark,
      "SELECT id FROM ajb_dsp ARRAY JOIN arrayMap(x -> x + 1, xs)")).getMessage
    assert(err2.contains("AS"))
  }

  test("ANY JOIN pre-collapses the right side to one deterministic row per key") {
    assert(t("SELECT a FROM t1 ANY LEFT JOIN t2 AS r ON t1.k = r.k") ==
      "SELECT a FROM t1 LEFT JOIN (SELECT __graft_row.* FROM (SELECT " +
        "max(struct(*)) AS __graft_row FROM t2 GROUP BY k)) r ON t1.k = r.k")
    // bare ANY JOIN = ANY INNER; multi-key conditions group by all keys
    assert(t("SELECT a FROM t1 ANY JOIN t2 ON t1.k = t2.k AND t1.j = t2.j")
      .contains("GROUP BY k, j"))
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT a FROM t1 ANY LEFT JOIN t2 ON t1.k > t2.k")
      .contains("equi-key"))
  }

  test("ANY LEFT JOIN executes as one right-side aggregate + one join") {
    import spark.implicits._
    Seq((1L, 10L, "x"), (1L, 11L, "y"), (2L, 20L, "z"))
      .toDF("k", "eid", "tag").createOrReplaceTempView("anyr_dsp")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "nm")
      .createOrReplaceTempView("anyl_dsp")
    val df = spark.sql(Dialect.translate(spark,
      "SELECT l.k, l.nm, r.eid, r.tag FROM anyl_dsp AS l ANY LEFT JOIN " +
        "anyr_dsp AS r ON l.k = r.k ORDER BY l.k"))
    // the deterministic pick: greatest right row in whole-struct order
    assert(df.collect().toSeq.map(_.toString) ==
      Seq("[1,a,11,y]", "[2,b,20,z]", "[3,c,null,null]"))
    val plan = df.queryExecution.executedPlan.toString
    // one join (broadcast at this size), NEVER a nested-loop product,
    // and the right side collapsed by an aggregate before it
    assert("(?i)join".r.findAllIn(plan).size >= 1 &&
      !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join strategy:\n$plan")
    assert(plan.contains("Aggregate"), "right side must pre-collapse")
  }

  test("sumArray resolves the element type from the catalog; avgArray is DOUBLE") {
    val sreg = Dialect.Registry(schemaOf = n => if (n == "arr_t")
      Some(Seq(("g", "BIGINT"), ("ia", "ARRAY<INT>"),
        ("fa", "ARRAY<FLOAT>"))) else None)
    // integral elements sum INTEGRAL (BIGINT, ClickHouse's own widening)
    assert(Dialect.translate("SELECT g, sumArray(ia) FROM arr_t GROUP BY g", sreg)
      .contains("CAST(0 AS BIGINT)"))
    assert(Dialect.translate("SELECT sumArray(fa) FROM arr_t", sreg)
      .contains("CAST(0 AS DOUBLE)"))
    assert(Dialect.translate("SELECT avgArray(fa) FROM arr_t", sreg)
      .contains("IS NOT NULL"))
    def err(sql: String): String =
      intercept[Dialect.DialectException](Dialect.translate(sql, sreg)).getMessage
    assert(err("SELECT sumArray(g) FROM arr_t").contains("not an array"))
    assert(err("SELECT sumArray(nope) FROM arr_t").contains("no such column"))
    assert(err("SELECT sumArray(ia) FROM (SELECT ia FROM arr_t) q")
      .contains("FROM table resolvable"))
    // executed: integral stays integral end-to-end
    import spark.implicits._
    Seq((1L, Seq(1, 2), Seq(0.5f)), (1L, Seq(3), Seq(1.5f)))
      .toDF("g", "ia", "fa").createOrReplaceTempView("sumarr_dsp")
    val row = spark.sql(Dialect.translate(spark,
      "SELECT g, sumArray(ia) AS si, avgArray(fa) AS af FROM sumarr_dsp " +
        "GROUP BY g")).collect()(0)
    assert(row.getLong(1) == 6L && math.abs(row.getDouble(2) - 1.0) < 1e-9)
    // NULL elements skip on BOTH sides (r13 ADVICE): the sum keeps the
    // row's non-null elements (an unfiltered reduce NULLed them all),
    // and the avg denominator counts only the non-null elements
    spark.sql("SELECT CAST(1 AS BIGINT) AS g, " +
        "array(1, CAST(NULL AS INT), 3) AS ia, " +
        "array(CAST(2.0 AS FLOAT), CAST(NULL AS FLOAT)) AS fa")
      .createOrReplaceTempView("sumarr_null_dsp")
    val nrow = spark.sql(Dialect.translate(spark,
      "SELECT g, sumArray(ia) AS si, avgArray(fa) AS af " +
        "FROM sumarr_null_dsp GROUP BY g")).collect()(0)
    assert(nrow.getLong(1) == 4L, s"NULL element must skip, not poison: $nrow")
    assert(math.abs(nrow.getDouble(2) - 2.0) < 1e-9,
      s"avg denominator must count only non-null elements: $nrow")
  }

  test("groupArray(n) and topK(k) parametrics translate deterministically") {
    assert(t("SELECT k, groupArray(2)(v) FROM t GROUP BY k") ==
      "SELECT k, ch_least_k(v, 2) FROM t GROUP BY k")
    assert(t("SELECT topK(3)(v) FROM t") ==
      "SELECT ch_topk_exact(v, 3) FROM t")
    // non-parametric groupArray canonicalizes to the SORTED spelling —
    // a bare collect_list's element order is partition/scheduling-
    // dependent, the determinism gap the r14 verdict named (#1); the
    // value-order divergence is documented at the rewrite
    assert(t("SELECT groupArray(v), countIf(x) FROM t")
      .startsWith("SELECT sort_array(collect_list(v))"))
    assert(t("SELECT groupUniqArray(v) FROM t") ==
      "SELECT sort_array(collect_set(v)) FROM t")
    // groupArrayIf keeps the FILTER inside the sort (one aggregate)
    assert(t("SELECT groupArrayIf(v, v > 2) FROM t") ==
      "SELECT sort_array(collect_list(v) FILTER (WHERE v > 2)) FROM t")
    // anyLast[If] have NO deterministic canonical form without an
    // ordering key — refuse by name with the pinned spelling
    val alErr = intercept[graft.plans.Dialect.DialectException] {
      t("SELECT anyLast(v) FROM t")
    }
    assert(alErr.getMessage.contains("max_by"))
    val alIfErr = intercept[graft.plans.Dialect.DialectException] {
      t("SELECT anyLastIf(v, v > 0) FROM t")
    }
    assert(alIfErr.getMessage.contains("max_by"))
    // run-stability: over an 8-partition input the canonical spelling
    // returns ONE array — ascending, identical across runs — where the
    // old collect_list rename's element order depended on which split
    // finished first
    spark.range(0, 1000, 1, 8)
      .selectExpr("CAST(id % 3 AS INT) AS g", "CAST((id * 37) % 11 AS INT) AS v")
      .createOrReplaceTempView("ga_stab_dsp")
    val stabQ = Dialect.translate(spark,
      "SELECT g, groupArray(v) AS ga FROM ga_stab_dsp GROUP BY g ORDER BY g")
    val stab1 = spark.sql(stabQ).collect().map(_.toString).toSeq
    val stab2 = spark.sql(stabQ).collect().map(_.toString).toSeq
    assert(stab1 == stab2, "canonical groupArray must be run-stable")
    val ga0 = spark.sql(stabQ).collect()(0).getSeq[Int](1)
    assert(ga0.length == 334 && ga0 == ga0.sorted,
      s"expected the full group in ascending value order: $ga0")
    import spark.implicits._
    Seq(("a", 3), ("a", 1), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
      .createOrReplaceTempView("topk_dsp")
    val out = Dialect.translate(spark,
      "SELECT g, groupArray(2)(v) AS ga, topK(2)(v) AS tk FROM topk_dsp " +
        "GROUP BY g ORDER BY g")
    // groupArray(2): two smallest in value order (documented
    // divergence from insertion order); topK(2): exact frequencies
    // 1→2, 2→1, 3→1 — ties by value ascending
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[a,ArraySeq(1, 1),ArraySeq(1, 2)]", "[b,ArraySeq(9),ArraySeq(9)]"))
    // SCALE PIN (r13 verdict #2): the optimized plan carries the
    // bounded-state kernels, never a whole-group collect_list — one
    // skewed group must cost the n/k-grid bound, not its row count
    val plan = spark.sql(out).queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"),
      s"whole-group collect_list back in the parametric plan:\n$plan")
    assert(plan.contains("ch_least_k") && plan.contains("ch_topk_exact"))
    // merge-path exercised: many partitions, values spread across them
    val wide = spark.range(0, 1000, 1, 8)
      .selectExpr("CAST(id % 7 AS INT) AS g", "CAST(id % 97 AS INT) AS v")
    wide.createOrReplaceTempView("topk_wide_dsp")
    val wideRow = spark.sql(Dialect.translate(spark,
      "SELECT groupArray(3)(v) AS ga, topK(2)(v) AS tk FROM topk_wide_dsp " +
        "WHERE g = 0")).collect()(0)
    // ids 0 and 679 are the two multiples of lcm(7,97) below 1000 →
    // v=0 twice; v=1 at ids 98 and 777 → third-smallest is 1
    assert(wideRow.getSeq[Int](0) == Seq(0, 0, 1))
    // 0..96 each appear ~10-11 times; ties by value ascending → 0, 1
    assert(wideRow.getSeq[Int](1) == Seq(0, 1))
    // strings order lexicographically through the same kernels
    Seq("b", "a", "a", "c").toDF("s").createOrReplaceTempView("topk_str_dsp")
    val strRow = spark.sql(Dialect.translate(spark,
      "SELECT groupArray(2)(s) AS ga, topK(1)(s) AS tk FROM topk_str_dsp"))
      .collect()(0)
    assert(strRow.getSeq[String](0) == Seq("a", "a") &&
      strRow.getSeq[String](1) == Seq("a"))
  }

  test("ARRAY JOIN over a subquery FROM item derives the wrap schema from analysis") {
    import spark.implicits._
    Seq((1L, Seq(1, 2), Seq("x", "y")), (2L, Seq(5), Seq("z")))
      .toDF("k", "xs", "ts").createOrReplaceTempView("ajsub_dsp")
    // bare item (no AS) SHADOWS the column — over a subquery FROM this
    // was a named refusal through r14; the analyzed subquery schema now
    // feeds the same projected wrap, and SELECT * exposes EXACTLY the
    // subquery's columns (r13 §V residual, r14 verdict next-item 7)
    val q1 = Dialect.translate(spark,
      "SELECT * FROM (SELECT k, xs FROM ajsub_dsp) s ARRAY JOIN xs " +
        "ORDER BY k, xs")
    val df1 = spark.sql(q1)
    assert(df1.columns.toSeq == Seq("k", "xs"))
    assert(df1.collect().map(_.toString).toSeq ==
      Seq("[1,1]", "[1,2]", "[2,5]"))
    // multi-array positional zip: __graft_pos/__graft_arrN stay OUT of
    // the bare * over a subquery source too
    val q2 = Dialect.translate(spark,
      "SELECT * FROM (SELECT xs, ts FROM ajsub_dsp WHERE k = 1) s " +
        "ARRAY JOIN xs AS x, ts AS t ORDER BY x")
    val df2 = spark.sql(q2)
    assert(df2.columns.toSeq == Seq("xs", "ts", "x", "t"),
      s"internal columns leaked: ${df2.columns.toSeq}")
    assert(df2.collect().map(r => (r.getInt(2), r.getString(3))).toSeq ==
      Seq((1, "x"), (2, "y")))
    // a schemaless FROM shape still refuses the bare item by name
    val e = intercept[graft.plans.Dialect.DialectException] {
      Dialect.translate("SELECT * FROM (t1 JOIN t2 ON t1.k = t2.k) " +
        "ARRAY JOIN xs", graft.plans.Dialect.Registry())
    }
    assert(e.getMessage.contains("analyzable"))
  }

  test("topK kernels cap open-domain buffers; kernel counts bounds-check") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.LongType
    import graft.expressions.{ChBoundedAggBase, ChTopKExact, ChTopKWeighted}
    // the exact count-grid state is right for BOUNDED domains only; an
    // open-domain column must refuse by name (a TypedImperativeAggregate
    // buffer cannot spill), pointing at the SpaceSaving sketch — r14
    // verdict #2. The buffer seeds directly to the cap (2^21 update
    // calls through interpreted eval would dominate the suite).
    val agg = ChTopKExact(BoundReference(0, LongType, nullable = false), 3)
    val buf = agg.createAggregationBuffer()
    var i = 0L
    while (buf.size < ChBoundedAggBase.MaxDistinct) {
      buf.update(java.lang.Long.valueOf(i), 1L); i += 1
    }
    // an EXISTING value still updates fine at the cap …
    agg.update(buf, InternalRow(0L))
    assert(buf(java.lang.Long.valueOf(0L)) == 2L)
    // … a NEW one refuses with the sketch sibling named
    val capErr = intercept[IllegalStateException] {
      agg.update(buf, InternalRow(i))
    }
    assert(capErr.getMessage.contains("q_topk_sketch") &&
      capErr.getMessage.contains("GROUP BY (keys, v)"))
    // the merge path enforces the same bound
    val wagg = ChTopKWeighted(BoundReference(0, LongType, nullable = false),
      BoundReference(1, LongType, nullable = false), 3)
    val mergeErr = intercept[IllegalStateException] {
      val one = wagg.createAggregationBuffer()
      one.update(java.lang.Long.valueOf(i), 7L)
      wagg.merge(buf, one)
    }
    assert(mergeErr.getMessage.contains("ch_topk_weighted"))
    // litCount (r14 ADVICE): a BIGINT count above Int.MaxValue refuses
    // explicitly instead of wrapping (4294967297.toInt == 1 — a
    // silently 1-element answer)
    val wrapErr = intercept[IllegalArgumentException] {
      graft.expressions.ChAggExprs.functions
        .find(_._1.funcName == "ch_least_k").get._3(
          Seq(BoundReference(0, LongType, nullable = false),
            Literal(4294967297L)))
    }
    assert(wrapErr.getMessage.contains("out of range"))
  }

  test("round-14 scalar pack: OrZero twins, float-class predicates, token/array scalars") {
    assert(t("SELECT intDivOrZero(a, b) FROM t") ==
      "SELECT IF((b) = 0, CAST(0 AS BIGINT), CAST(a AS BIGINT) DIV CAST(b AS BIGINT)) FROM t")
    assert(t("SELECT moduloOrZero(a, b) FROM t") ==
      "SELECT IF((b) = 0, 0, (a) % (b)) FROM t")
    assert(t("SELECT isFinite(x), isInfinite(x) FROM t").contains("isnan"))
    assert(t("SELECT ifNotFinite(x, y) FROM t").startsWith("SELECT IF(isnan(x)"))
    assert(t("SELECT splitByWhitespace(s) FROM t") ==
      "SELECT filter(split(s, '\\\\s+'), __graft_x -> __graft_x != '') FROM t")
    assert(t("SELECT countSubstrings(h, n) FROM t").contains("replace(h, n, '')"))
    assert(t("SELECT hasAny(a, b), hasAll(a, b) FROM t") ==
      "SELECT arrays_overlap(a, b), forall(b, __graft_x -> array_contains(a, __graft_x)) FROM t")
    assert(t("SELECT arrayFirst(x -> x > 1, a) FROM t") ==
      "SELECT get(filter(a, x -> x > 1), 0) FROM t")
    assert(t("SELECT arrayFirstIndex(x -> x > 1, a) FROM t")
      .contains("array_position"))
    assert(t("SELECT arraySum(x -> x * 2, a) FROM t")
      .contains("aggregate(transform(a, x -> x * 2)"))
    assert(t("SELECT trimLeft(s), trimRight(s), base64Encode(s), base64Decode(s) FROM t") ==
      "SELECT ltrim(s), rtrim(s), base64(s), CAST(unbase64(s) AS STRING) FROM t")
    // the block-local family refuses with the window spelling named
    def err(sql: String): String =
      intercept[Dialect.DialectException](t(sql)).getMessage
    assert(err("SELECT neighbor(x, 1) FROM t").contains("block-local"))
    assert(err("SELECT runningDifference(x) FROM t").contains("lag/lead"))
    assert(err("SELECT runningAccumulate(x) FROM t").contains("OVER"))
    // executed: ANSI-mode division by zero is exactly what OrZero guards
    import spark.implicits._
    Seq((10L, 0L), (10L, 3L)).toDF("a", "b").createOrReplaceTempView("orzero_dsp")
    val rows = spark.sql(Dialect.translate(spark,
      "SELECT intDivOrZero(a, b) AS d, moduloOrZero(a, b) AS m " +
        "FROM orzero_dsp ORDER BY d")).collect().toSeq.map(_.toString)
    assert(rows == Seq("[0,0]", "[3,1]"), rows)
    // arrayFirst's no-match case is NULL (get() is OOB-safe under ANSI)
    val fr = spark.sql(Dialect.translate(spark,
      "SELECT arrayFirst(x -> x > 9, array(1, 2)) AS f, " +
        "arrayFirstIndex(x -> x = 2, array(1, 2)) AS i")).collect()(0)
    assert(fr.isNullAt(0) && fr.getLong(1) == 2L, fr)
  }

  test("topKWeighted(k) and groupUniqArray(n) ride the bounded kernels") {
    assert(t("SELECT topKWeighted(2)(v, w) FROM t") ==
      "SELECT ch_topk_weighted(v, CAST(w AS BIGINT), 2) FROM t")
    assert(t("SELECT groupUniqArray(3)(v) FROM t") ==
      "SELECT ch_least_k(DISTINCT v, 3) FROM t")
    // non-parametric groupUniqArray canonicalizes to the SORTED
    // spelling (r15 — collect_set's element order is run-dependent)
    assert(t("SELECT groupUniqArray(v) FROM t") ==
      "SELECT sort_array(collect_set(v)) FROM t")
    import spark.implicits._
    // weights: value 1 carries 10, value 3 carries 7, value 2 carries 5
    Seq((1, 10L), (2, 5L), (3, 3L), (3, 4L), (1, 0L)).toDF("v", "w")
      .createOrReplaceTempView("topkw_dsp")
    val row = spark.sql(Dialect.translate(spark,
      "SELECT topKWeighted(2)(v, w) AS tw, groupUniqArray(2)(v) AS gu " +
        "FROM topkw_dsp")).collect()(0)
    assert(row.getSeq[Int](0) == Seq(1, 3), row)
    assert(row.getSeq[Int](1) == Seq(1, 2), row)
    // ClickHouse's UInt64 weight contract: negatives fail fast rather
    // than returning a confidently wrong top-k
    Seq((1, -2L)).toDF("v", "w").createOrReplaceTempView("topkw_neg_dsp")
    val e = intercept[Exception](spark.sql(Dialect.translate(spark,
      "SELECT topKWeighted(1)(v, w) FROM topkw_neg_dsp")).collect())
    assert(e.getMessage != null)
  }

  test("dictGet resolves the registered dictionary; declared DEFAULT on miss") {
    import spark.implicits._
    Seq((0L, "alpha"), (1L, "beta")).toDF("k", "nm")
      .createOrReplaceTempView("dict_src_dsp")
    Seq((10L, 0L), (11L, 1L), (12L, 9L)).toDF("id", "fk")
      .createOrReplaceTempView("dict_fact_dsp")
    Graft.sql(spark,
      "CREATE DICTIONARY d_dsp (k Int64, nm String DEFAULT 'UNKNOWN') " +
        "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'dict_src_dsp')) LAYOUT(FLAT())")
    val rows = Graft.sql(spark,
      "SELECT id, dictGet('d_dsp', 'nm', fk) AS nm FROM dict_fact_dsp ORDER BY id")
      .collect().toSeq.map(_.toString)
    assert(rows == Seq("[10,alpha]", "[11,beta]", "[12,UNKNOWN]"))
    // explicit-default form overrides the declared one
    val rows2 = Graft.sql(spark,
      "SELECT id, dictGetOrDefault('d_dsp', 'nm', fk, 'N/A') AS nm " +
        "FROM dict_fact_dsp ORDER BY id").collect().toSeq.map(_.toString)
    assert(rows2 == Seq("[10,alpha]", "[11,beta]", "[12,N/A]"))
    def err(sql: String): String =
      intercept[Dialect.DialectException](Dialect.translate(spark, sql)).getMessage
    assert(err("SELECT dictGet('nope', 'a', k) FROM t").contains("unregistered"))
  }

  test("dictGet executes as a broadcast hash join — no nested loop, no cartesian") {
    val df = ChDialect.entries("q_ch_dict_get").fn(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the aggregated dictionary side must broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "dictGet must never plan a per-row nested loop")
  }

  test("LIMIT offset, n BY skips each group's first o rows; bare INTERPOLATE (col)") {
    import spark.implicits._
    assert(t("SELECT k, v FROM t ORDER BY k, v LIMIT 1, 2 BY k") ==
      "SELECT k, v FROM (SELECT k, v, row_number() OVER (PARTITION BY k " +
        "ORDER BY k, v) AS __graft_rn FROM t) WHERE __graft_rn > 1 AND " +
        "__graft_rn <= (1) + (2) ORDER BY k, v")
    Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1)).toDF("g", "x")
      .createOrReplaceTempView("lob_dsp")
    val out = Dialect.translate(spark,
      "SELECT g, x FROM lob_dsp ORDER BY g, x LIMIT 1, 2 BY g")
    assert(spark.sql(out).collect().toSeq.map(_.toString) == Seq("[a,2]", "[a,3]"))
    // INTERPOLATE (col) — ClickHouse's shorthand for (col AS col)
    Seq((0L, 1.0), (3L, 2.0)).toDF("b", "v").createOrReplaceTempView("interp_dsp")
    val fill = Dialect.translate(spark,
      "SELECT b, round(sum(v), 4) AS sv FROM interp_dsp GROUP BY b " +
        "ORDER BY b WITH FILL INTERPOLATE (sv)")
    assert(spark.sql(fill).collect().toSeq.map(_.toString) ==
      Seq("[0,1.0]", "[1,1.0]", "[2,1.0]", "[3,2.0]"))
  }

  test("array position/count scalars map exactly and empty-safely") {
    import spark.implicits._
    assert(t("SELECT arrayEnumerate(a), arrayCount(x -> x > 1, a), " +
      "arrayCount(a), countEqual(a, 2), bitCount(m) FROM t") ==
      "SELECT transform(a, (__graft_x, __graft_i) -> __graft_i + 1), " +
        "size(filter(a, x -> x > 1)), " +
        "size(filter(a, __graft_x -> __graft_x != 0)), " +
        "size(filter(a, __graft_x -> __graft_x = (2))), bit_count(m) FROM t")
    Seq((Seq(2, 0, 2, 5), 7L), (Seq.empty[Int], 0L)).toDF("a", "m")
      .createOrReplaceTempView("arrp_dsp")
    val out = Dialect.translate(spark,
      "SELECT arrayEnumerate(a) AS e, arrayCount(a) AS nz, " +
        "countEqual(a, 2) AS eq2, bitCount(m) AS bc FROM arrp_dsp")
    assert(spark.sql(out).collect().toSeq.map(_.toString) ==
      Seq("[ArraySeq(1, 2, 3, 4),3,2,3]", "[ArraySeq(),0,0,0]"))
  }

  test("-Array combinators with exact mappings") {
    import spark.implicits._
    assert(t("SELECT maxArray(a), minArray(a), countArray(a) FROM t") ==
      "SELECT max(array_max(a)), min(array_min(a)), sum(size(a)) FROM t")
    Seq((Seq(1, 5), 1), (Seq(7, 2), 1)).toDF("a", "g")
      .createOrReplaceTempView("arrc_dsp")
    val out = Dialect.translate(spark,
      "SELECT g, maxArray(a) AS mx, minArray(a) AS mn, countArray(a) AS n " +
        "FROM arrc_dsp GROUP BY g")
    assert(spark.sql(out).collect()(0).toString == "[1,7,1,4]")
    // sumArray — whose result type follows the element type — resolves
    // the element type from the catalog at clause level: with no
    // schema in scope it refuses with the contract named (the
    // dedicated sumArray arm covers the mapped forms)
    val err = intercept[Dialect.DialectException](
      t("SELECT sumArray(a) FROM t")).getMessage
    assert(err.contains("ELEMENT"))
  }

  test("scalar WITH bindings substitute; standard CTEs pass through byte-identical") {
    import spark.implicits._
    assert(t("WITH 0.03 AS cut, 2 AS lo SELECT countIf(x > cut) FROM t WHERE y >= lo")
      == "SELECT count(*) FILTER (WHERE x >(0.03)) FROM t WHERE y >=(2)")
    // the standard CTE form is Spark SQL — untouched, byte-identical
    val cte = "WITH q AS (SELECT a FROM t) SELECT a, count(*) FROM q GROUP BY a"
    assert(t(cte) eq cte)
    // qualified and call positions never substitute; shadowing matches
    // ClickHouse (the binding wins over a same-named column)
    assert(t("WITH 7 AS v SELECT s.v, v FROM s WHERE v > 1")
      == "SELECT s.v,(7) FROM s WHERE(7) > 1")
    // executes end-to-end through the session translate
    Seq((1L, 10.0), (2L, 50.0)).toDF("k", "x")
      .createOrReplaceTempView("withs_dsp")
    val out = Dialect.translate(spark,
      "WITH 20 AS cut SELECT k FROM withs_dsp WHERE x > cut ORDER BY k")
    assert(spark.sql(out).collect().toSeq.map(_.toString) == Seq("[2]"))
  }

  test("SummingMergeTree FINAL collapses to one sum aggregate per key") {
    val sreg = Dialect.Registry(
      sumFinals = Map("evs" -> (Seq("k"), Nil)),
      schemaOf = n => if (n == "evs")
        Some(Seq(("k", "BIGINT"), ("v", "DOUBLE"), ("n", "BIGINT"))) else None)
    assert(Dialect.translate("SELECT * FROM evs FINAL", sreg) ==
      "SELECT * FROM (SELECT k, sum(v) AS v, sum(n) AS n FROM evs GROUP BY k " +
        "HAVING NOT (coalesce(sum(v), 0) = 0 AND coalesce(sum(n), 0) = 0)) evs")
    // a non-key non-summed column refuses WITH the column named:
    // ClickHouse keeps an arbitrary merged value there
    val bad = Dialect.Registry(
      sumFinals = Map("evs" -> (Seq("k"), Seq("v"))),
      schemaOf = _ => Some(Seq(("k", "BIGINT"), ("v", "DOUBLE"), ("tag", "STRING"))))
    val err = intercept[Dialect.DialectException](
      Dialect.translate("SELECT * FROM evs FINAL", bad)).getMessage
    assert(err.contains("tag"))
  }

  test("AggregatingMergeTree FINAL applies each SimpleAggregateFunction per key") {
    val areg = Dialect.Registry(
      aggFinals = Map("eva" -> (Seq("k"),
        Seq(("lo", "min"), ("hi", "max"), ("n", "sum")))),
      schemaOf = n => if (n == "eva") Some(Seq(("k", "BIGINT"),
        ("lo", "DOUBLE"), ("hi", "DOUBLE"), ("n", "BIGINT"))) else None)
    assert(Dialect.translate("SELECT * FROM eva FINAL", areg) ==
      "SELECT * FROM (SELECT k, min(lo) AS lo, max(hi) AS hi, sum(n) AS n " +
        "FROM eva GROUP BY k) eva")
    // a column with no registered function refuses WITH the column
    // named (ClickHouse keeps an arbitrary merged value there)
    val bad = Dialect.Registry(
      aggFinals = Map("eva" -> (Seq("k"), Seq(("lo", "min")))),
      schemaOf = _ => Some(Seq(("k", "BIGINT"), ("lo", "DOUBLE"),
        ("stray", "STRING"))))
    val err = intercept[Dialect.DialectException](
      Dialect.translate("SELECT * FROM eva FINAL", bad)).getMessage
    assert(err.contains("stray"))
  }

  test("summing FINAL executes map-side-combined: partial_sum, one key shuffle") {
    val df = ChDialect.entries("q_ch_summing_final").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      "summing FINAL must partial-aggregate map-side before the exchange")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"summing FINAL must add exactly one key shuffle, saw $shuffles")
    assert(!plan.contains("Window"), "summing FINAL must not plan a window")
  }

  // ── EXPLAIN family through the router ──────────────────────────────

  test("EXPLAIN SYNTAX shows the translation; PLAN/ESTIMATE hit Introspect") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_exp_dsp")
    val syn = Graft.sql(spark,
      "EXPLAIN SYNTAX SELECT countIf(o_orderstatus = 'F') FROM orders_exp_dsp " +
        "PREWHERE o_totalprice > 1000").collect()(0).getString(0)
    assert(syn == "SELECT count(*) FILTER (WHERE o_orderstatus = 'F') FROM " +
      "orders_exp_dsp WHERE o_totalprice > 1000")
    val plan = Graft.sql(spark,
      "EXPLAIN PLAN SELECT o_orderkey FROM orders_exp_dsp PREWHERE o_totalprice > 1000")
      .collect()
    assert(plan.exists(r => r.getAs[String]("facet") == "scan" &&
      r.getAs[String]("detail").contains("GreaterThan(o_totalprice")),
      "EXPLAIN PLAN must show the pushed PREWHERE predicate on the scan")
    val est = Graft.sql(spark,
      "EXPLAIN ESTIMATE SELECT count(*) FROM orders_exp_dsp").collect()(0)
    assert(est.getAs[Long]("n_scans") >= 1L)
    // Spark's own EXPLAIN verbs fall through to spark.sql untouched
    val native = Graft.sql(spark, "EXPLAIN SELECT 1").collect()(0).getString(0)
    assert(native.contains("== Physical Plan =="))
  }

  test("CREATE VIEW and INSERT ... SELECT accept dialect-text bodies") {
    import org.apache.spark.sql.functions.col
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_cv_dsp")
    // a ClickHouse user's view definitions are written in the dialect —
    // the level rewriter translates the SELECT body under the CREATE
    // prefix, so the registered view holds the translated plan
    Graft.sql(spark,
      """CREATE OR REPLACE TEMPORARY VIEW f_rev_dsp AS
        |SELECT o_orderpriority, count() AS n,
        |       round(sum(o_totalprice), 4) AS rev
        |FROM orders_cv_dsp
        |PREWHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin)
    val got = spark.table("f_rev_dsp").orderBy("o_orderpriority")
      .collect().toSeq.map(_.toString)
    val want = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("o_totalprice"), 4).as("rev"))
      .orderBy("o_orderpriority").collect().toSeq.map(_.toString)
    assert(got == want)
    // INSERT INTO … <dialect SELECT> rides the same fallthrough
    spark.sql("DROP TABLE IF EXISTS ins_dialect_dsp")
    val wh = java.nio.file.Files.createTempDirectory("ins_dsp").toString
    spark.sql(s"CREATE TABLE ins_dialect_dsp (p STRING, n BIGINT) " +
      s"USING parquet LOCATION '$wh/t'")
    Graft.sql(spark,
      """INSERT INTO ins_dialect_dsp
        |SELECT o_orderpriority, countIf(o_orderstatus = 'F')
        |FROM orders_cv_dsp GROUP BY o_orderpriority""".stripMargin)
    val inserted = spark.table("ins_dialect_dsp")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    val expected = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(inserted == expected)
    spark.sql("DROP TABLE ins_dialect_dsp")
  }

  test("Graft.sql end-to-end: dialect text runs through the router fallthrough") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_dsp")
    val n = Graft.sql(spark,
      "SELECT countIf(o_orderstatus = 'F') AS n FROM orders_dsp").collect()(0)
      .getAs[Long]("n")
    val expected = Tables(spark, sf, "orders")
      .filter("o_orderstatus = 'F'").count()
    assert(n == expected)
  }
}
