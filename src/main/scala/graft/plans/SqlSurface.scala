package graft.plans

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-TEXT entry surface ([CH] capability layer): a ClickHouse
  * operator's native mode is typed SQL, so the engine's user surface
  * must be reachable as parsed SQL text, not only as Scala DataFrame
  * builders. These queries are AUTHORED as `spark.sql(...)` strings
  * over temp views of the fixture tables and the snapshot catalog —
  * the full path a SQL user exercises: parse → analyze (resolving
  * graft's `GraftExtensions`-registered functions by name) → the SAME
  * Catalyst plan the DataFrame twin produces (SqlSurfaceSpec pins
  * result equality against the builder forms; Catalyst does not care
  * which front end authored the plan, so the scale posture is
  * inherited unchanged).
  *
  * View names carry a `_sqlv` suffix — the session catalog is global,
  * and an unsuffixed `documents` view would reroute every other
  * query's `Tables` scan (the q_projection_agg copy-isolation lesson).
  */
object SqlSurface extends QueryModule {

  /** Register the fixture tables this module's SQL text reads. Idempotent
    * (createOrReplace) and cheap: a temp view is a name → logical-plan
    * binding, no data movement at any scale factor.
    */
  private def registerViews(s: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "documents").foreach { t =>
      Tables(s, dir, t).createOrReplaceTempView(s"${t}_sqlv")
    }

  def entries: Map[String, QueryDef] = Map(

    // SQL-text twin of q_join_multiway (operators/Joins.scala) — the
    // TPC-H Q3 star-join shape authored as SQL text. Catalyst plans
    // it identically to the DataFrame form (spec'd): the customer dim
    // broadcasts, orders⋈lineitem shuffles once on the shared key.
    "q_sql_join_multiway" -> QueryDef(
      (s, dir) => {
        registerViews(s, dir)
        s.sql("""SELECT c_mktsegment, o_orderpriority,
                |       count(*) AS n_items,
                |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
                |FROM customer_sqlv
                |JOIN orders_sqlv ON c_custkey = o_custkey
                |JOIN lineitem_sqlv ON o_orderkey = l_orderkey
                |GROUP BY c_mktsegment, o_orderpriority
                |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)
      },
      Some("""SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_mktsegment, o_orderpriority
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    // A graft CUSTOM EXPRESSION reached through the SQL parser:
    // `simhash60_words` resolves by NAME via the GraftExtensions
    // function registry — the codegen'd kernel, not a UDF — proving
    // the registered-function path end-to-end. Hash-checked because
    // the 60-bit MD5 simhash is engine-replicable (the q_dedup_simhash
    // oracle construction, here per-document): DuckDB rebuilds the
    // identical hash from md5 + bit ops.
    "q_sql_simhash60" -> QueryDef(
      (s, dir) => {
        registerViews(s, dir)
        s.sql("""SELECT doc_id,
                |       simhash60_words(split(text, ' ')) AS sh,
                |       CAST(bit_count(simhash60_words(split(text, ' '))) AS BIGINT)
                |         AS n_bits
                |FROM documents_sqlv
                |WHERE doc_id < 100
                |ORDER BY doc_id""".stripMargin)
      },
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents WHERE doc_id < 100),
             |h AS (
             |  SELECT doc_id,
             |    ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
             |  FROM w),
             |v AS (
             |  SELECT doc_id, b,
             |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
             |  FROM h, LATERAL (SELECT unnest(generate_series(0, 59)) AS b) u
             |  GROUP BY doc_id, b)
             |SELECT doc_id,
             |  CAST(sum(CASE WHEN votes > 0
             |    THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh,
             |  CAST(sum(CASE WHEN votes > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_bits
             |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // The snapshot catalog as a SQL-visible view: `system.parts`
    // surfaced the way a ClickHouse operator reads it — SQL text over
    // a registered view of the part inventory (manifest metadata only,
    // zero data footers; Snapshot.parts' scale posture is inherited).
    // Same oracle route as q_snapshot_parts: DuckDB recomputes the
    // per-day inventory from the raw fixture.
    "q_sql_snapshot_parts" -> QueryDef(
      (s, dir) => {
        graft.operators.Snapshot
          .parts(s, graft.operators.Lifecycle.cleanDest(s, dir))
          .createOrReplaceTempView("snapshot_parts_sqlv")
        s.sql("""SELECT bucket_day, n_rows, source
                |FROM snapshot_parts_sqlv
                |WHERE n_rows > 0
                |ORDER BY bucket_day""".stripMargin)
      },
      Some("""SELECT strftime(ts, '%Y%m%d') AS bucket_day,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  'full' AS source
             |FROM events
             |GROUP BY 1 HAVING count(*) > 0 ORDER BY 1""".stripMargin)),

    // The WINDOW-FUNCTION path through the SQL parser — the rank-1
    // latest-pointer shape (q_win_rank's semantics) authored as SQL
    // text over the second-truncated events view. The view binds
    // `Relational.eventsSec`'s ns/µs-proof projection, so SQL users
    // inherit the timestamp discipline instead of re-solving it.
    // SqlSurfaceSpec pins result equality against the DataFrame twin.
    "q_sql_window" -> QueryDef(
      (s, dir) => {
        graft.operators.Relational.eventsSec(s, dir)
          .createOrReplaceTempView("events_sec_sqlv")
        s.sql("""SELECT event_type, rn, event_id FROM (
                |  SELECT event_type, event_id,
                |         CAST(row_number() OVER (PARTITION BY event_type
                |           ORDER BY ts_s DESC, event_id DESC) AS BIGINT) AS rn
                |  FROM events_sec_sqlv)
                |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin)
      },
      Some("""SELECT event_type, rn, event_id FROM (
             |  SELECT event_type, event_id,
             |         row_number() OVER (PARTITION BY event_type
             |           ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin))
  )
}
