package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A (scans/sources) + §2.B (projections/filters) — the
  * reference's literal dataflow as relational operators.
  *
  * Oracle hygiene used throughout every module (SURVEY.md §5.3):
  *  - every query ends in ORDER BY over a unique key subset of the
  *    output columns;
  *  - `events.ts` is nanosecond parquet — Spark truncates to µs on
  *    read, DuckDB keeps ns, so both sides `date_trunc('second', ts)`
  *    before any comparison/ordering/output (helper [[Relational.eventsSec]]);
  *  - computed integers are cast to BIGINT on both sides (Spark and
  *    DuckDB widen differently);
  *  - doubles produced by arithmetic are rounded to 4 decimals on both
  *    sides.
  */
object Relational extends QueryModule {

  /** q_profile_table's engine: per-column (name, kind) → one
    * multi-distinct aggregate pass over `t`, inlined to per-column
    * rows. Kind "num" profiles typed numeric extrema + mean; anything
    * else profiles string-cast extrema. Exposed for the null-path
    * spec (the fixture tables carry no NULLs, so the n_nulls arm is
    * pinned against a constructed frame).
    *
    * Distinct counts are EXACT so the driver can hash-compare them —
    * the expensive arm of the profile (the Expand × n_cols rows carry
    * key-distinct partials through the exchange; growth measured 6.3×
    * at 10× data — linear, gate-clean). The 100 TB scale swap is
    * [[profileTableApprox]] — `approx_count_distinct` per column
    * collapses that arm to constant-size mergeable HLL partials (no
    * Expand at all: one ordinary aggregate) — spec'd against this
    * exact form within HLL error (ProfileTableSpec); the DECLARED
    * query stays exact because an approx count has no oracle
    * (SURVEY §5.3 rule 4).
    */
  private[graft] def profileTable(t: DataFrame,
      cols: Seq[(String, String)]): DataFrame =
    profileWith(t, cols, c => countDistinct(col(c)))

  /** The 100 TB form of [[profileTable]]: identical surface, but
    * n_distinct is `approx_count_distinct` (relative sd `rsd`) — the
    * per-column distinct partials become constant-size HLL sketches,
    * so profiling a table costs one scan + O(n_cols) state at any
    * size, and the multi-distinct Expand disappears from the plan.
    */
  private[graft] def profileTableApprox(t: DataFrame,
      cols: Seq[(String, String)], rsd: Double = 0.05): DataFrame =
    profileWith(t, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(t: DataFrame, cols: Seq[(String, String)],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    // TWO aggregates over the scan, not one: the multi-distinct path
    // (Expand × n_cols) must stay hash-aggregated, and mixing
    // min/max(string) into the same aggregate forces the WHOLE thing
    // onto SortAggregate (string agg buffers are not UnsafeRow-mutable,
    // HashAggregateExec refuses) — the r15 profile showed the combined
    // form sorting the 7×-expanded row set in one task (2.3 s stage).
    // Split, the distinct aggregate's buffers are all longs → Expand →
    // HashAggregate end to end, and the plain aggregate (string
    // min/max included) is a single grouping-free fold over unexpanded
    // rows — SortAggregate WITHOUT a Sort. Same one-pass-per-aggregate
    // I/O (two column-pruned scans of one parquet), same output.
    // Guide §1.2 step 2 (per-task work: operator choice).
    val plainAggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, k) =>
      Seq(count(col(c)).as(s"${c}_nn")) ++ (k match {
        case "num" => Seq(
          min(col(c)).cast("double").as(s"${c}_mn"),
          max(col(c)).cast("double").as(s"${c}_mx"),
          round(avg(col(c)) + lit(1e-9), 4).as(s"${c}_av"))
        case _ => Seq(
          min(col(c)).cast("string").as(s"${c}_mn"),
          max(col(c)).cast("string").as(s"${c}_mx"))
      })
    }
    // The two one-row aggregates combine via crossJoin — a
    // 1-row × 1-row BroadcastNestedLoopJoin by construction (an
    // equi-join on a literal key folds back to the same plan), so
    // q_profile_table sits on PlanSpec's intendedNestedLoop allowlist.
    val distinctAggs = cols.map { case (c, _) => distinctAgg(c).as(s"${c}_nd") }
    val one = t.agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(broadcast(t.agg(distinctAggs.head, distinctAggs.tail: _*)))
    val rows = array(cols.map { case (c, k) =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"${c}_nn")).cast("long").as("n_nulls"),
        col(s"${c}_nd").cast("long").as("n_distinct"),
        (if (k == "str") col(s"${c}_mn") else lit(null).cast("string"))
          .as("min_str"),
        (if (k == "str") col(s"${c}_mx") else lit(null).cast("string"))
          .as("max_str"),
        (if (k == "num") col(s"${c}_mn") else lit(null).cast("double"))
          .as("min_num"),
        (if (k == "num") col(s"${c}_mx") else lit(null).cast("double"))
          .as("max_num"),
        (if (k == "num") col(s"${c}_av") else lit(null).cast("double"))
          .as("avg_num"))
    }: _*)
    one.select(inline(rows)).orderBy("col_name")
  }

  /** events with a second-truncated timestamp — the only safe form of
    * `events.ts` for oracle-checked queries (FIXTURES.md hazards).
    *
    * The driver has shipped `events.ts` in two physical shapes across
    * rounds, so this adapts to whatever the scan yields:
    *  - TIMESTAMP(NANOS) parquet → LongType epoch-nanos under
    *    `spark.sql.legacy.parquet.nanosAsLong` (session default in
    *    [[graft.Graft.builder]]): ns → µs (integer floor division —
    *    all values post-1970) → timestamp → second truncation;
    *  - TIMESTAMP(MICROS) parquet → TimestampNTZ (or LTZ): cast to
    *    session-UTC timestamp, then second truncation.
    * DuckDB (oracle side) reads the same values natively and applies
    * `date_trunc('second', ts)` — identical results either way.
    */
  def eventsSec(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val sec = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        date_trunc("second", timestamp_micros(expr("ts div 1000")))
      case _ =>
        date_trunc("second", col("ts").cast("timestamp"))
    }
    e.withColumn("ts_s", sec)
  }

  def entries: Map[String, QueryDef] = Map(

    // Full-table export: BACKUP DATABASE reads every table whole
    // (backup.sh:45). Pure scan→sink; Catalyst maps it to a vectorized
    // parquet read with no shuffle at any scale.
    "q_snapshot_scan" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Catalog enumeration: the per-database loop of backup.sh:24 /
    // env.sh:24 as a manifest of (table, row_count). Each count is a
    // map-side-partial aggregate; the union is metadata-only.
    "q_catalog_enum" -> QueryDef(
      (s, dir) =>
        Tables.names.map { n =>
          Tables(s, dir, n).agg(count(lit(1)).as("row_count"))
            .select(lit(n).as("table_name"), col("row_count"))
        }.reduce(_ unionByName _).orderBy("table_name"),
      Some(Tables.names.map(n =>
          s"SELECT '$n' AS table_name, CAST(count(*) AS BIGINT) AS row_count FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY table_name"))),

    // GC name predicate (backup.sh:119–122): prefix match on the
    // constructed snapshot filename. The startsWith filter is
    // pushdown-eligible once the name is materialized; here it runs
    // post-projection as the reference does.
    // The GC name match is `${DB}-*` glob semantics (backup.sh:119). A
    // predicate on the derived concat alone cannot push down (full scan
    // at 100 TB), so a provably-implied prefix filter on the STORED
    // column is added: `filename LIKE 'purchase-%'` forces event_type
    // to start with "purchase" (a shorter event_type would need the
    // literal '-' inside "purchase", which has none), so the extra
    // filter is a pure relaxation — same result set, but it reaches the
    // parquet reader as a pushed StartsWith. PlanSpec pins the pushdown.
    "q_filter_pred" -> QueryDef(
      (s, dir) => eventsSec(s, dir)
        .filter(col("event_type").startsWith("purchase"))
        .select(col("event_id"), col("event_type"),
          Retention.filename(col("event_type"), Retention.bucketDay(col("ts_s"))).as("filename"))
        .filter(col("filename").startsWith("purchase-"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type, filename FROM (
             |  SELECT event_id, event_type,
             |         event_type || '-' || strftime(date_trunc('second', ts), '%Y%m%d') || '.zip' AS filename
             |  FROM events WHERE event_type LIKE 'purchase%')
             |WHERE filename LIKE 'purchase-%' ORDER BY event_id""".stripMargin)),

    // Age-based retention filter (backup.sh:119–122; windows from
    // env.sh:26–29), cutoff anchored to max(ts) for determinism. The
    // cutoff is a broadcast 1-row join — no shuffle of the fact side.
    "q_retention_filter" -> QueryDef(
      (s, dir) => Retention.gcCandidates(
          eventsSec(s, dir).select(col("event_id"), col("user_id"), col("ts_s")),
          col("ts_s"), "INTERVAL 7 DAYS")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts_s"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
             |       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_str
             |FROM events
             |WHERE date_trunc('second', ts) <
             |      (SELECT max(date_trunc('second', ts)) FROM events) - INTERVAL 7 DAY
             |ORDER BY event_id""".stripMargin)),

    // Deterministic consistent-hash sampling — ClickHouse's SAMPLE
    // clause ([CH]): the same rows are selected on every run, on every
    // engine, at any parallelism, because membership is a pure
    // function of the sampling key (md5 — the one keyed hash Spark and
    // DuckDB share bit-for-bit). ~1/16 of rows: first hex nibble = '0'.
    // At scale this is a scan-side filter (no shuffle), and a fixed
    // key samples CONSISTENTLY across tables/snapshots — joins of two
    // samples on the key still line up, which `rand()` sampling and
    // TABLESAMPLE cannot give.
    "q_sample" -> QueryDef(
      (s, dir) => Tables(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
             |ORDER BY o_orderkey""".stripMargin)),

    // Filename construction (backup.sh:26–34): projection of (db, ts)
    // into the four tier names. Narrow map, codegen'd end-to-end.
    "q_project_rename" -> QueryDef(
      (s, dir) => {
        // fanOut: four date_format buckets per row on a single-split
        // scan ran in ONE task (r15); scale-adaptive
        val e = graft.Tables.fanOut(eventsSec(s, dir), col("event_id"))
        Retention.withBuckets(e, col("ts_s"), col("event_type"))
          .select("event_id", "f_last", "f_daily", "f_weekly", "f_monthly")
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  event_type || '-' || strftime(date_trunc('second', ts), '%Y%m%d-%H%M%S') || '.zip' AS f_last,
             |  event_type || '-' || strftime(date_trunc('second', ts), '%Y%m%d') || '.zip' AS f_daily,
             |  event_type || '-' || strftime(date_trunc('week', ts), '%Y%m%d') || '.zip' AS f_weekly,
             |  event_type || '-' || strftime(date_trunc('second', ts), '%Y%m') || '.zip' AS f_monthly
             |FROM events ORDER BY event_id""".stripMargin)),

    // Column-level data profiling — the ClickHouse system.columns /
    // ANALYZE surface ([CH]/[NS]): per column, null count, exact
    // distinct count, typed min/max, numeric mean. The shape that
    // matters at 100 TB: ONE scan computes every column's profile
    // (the multi-distinct aggregate — Catalyst plans one Expand ×
    // n_cols feeding map-side partial aggs, never n_cols scans), the
    // result is ONE row of aggregates turned into per-column rows by a
    // row-local inline() — no re-reads, no driver loop. Determinism:
    // exact integer counts; numeric extrema as doubles; string/time
    // extrema as strings (ASCII byte order, midnight-clean
    // timestamps — both engines render 'YYYY-MM-DD HH:MM:SS');
    // means rounded on the repo grid.
    "q_profile_table" -> QueryDef(
      (s, dir) => profileTable(Tables(s, dir, "orders"), Seq(
        ("o_orderkey", "num"), ("o_custkey", "num"),
        ("o_orderdate", "str"), ("o_orderpriority", "str"),
        ("o_orderstatus", "str"), ("o_totalprice", "num"))),
      Some {
        val branches = Seq(
          ("o_orderkey", "num"), ("o_custkey", "num"),
          ("o_orderdate", "str"), ("o_orderpriority", "str"),
          ("o_orderstatus", "str"), ("o_totalprice", "num")).map { case (c, k) =>
          val (mns, mxs, mnn, mxn, av) =
            if (k == "num")
              ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)",
                s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
                s"round(avg($c) + 1e-9, 4)")
            else
              (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)",
                "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
                "CAST(NULL AS DOUBLE)")
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  $mns AS min_str, $mxs AS max_str,
             |  $mnn AS min_num, $mxn AS max_num, $av AS avg_num
             |FROM orders""".stripMargin
        }
        branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      })
  )
}
