package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.I — streaming window shapes, declared in BATCH form so
  * they are oracle-checkable (the reference's daily tier IS a tumbling
  * 1-day window, backup.sh:27; the cron loop at init.sh:14 is the
  * micro-batch trigger). The actual Structured Streaming runtime —
  * watermarks, foreachBatch snapshot writer, listener hooks — lives in
  * [[SnapshotStream]] and is integration-tested, not oracle-checked
  * (SURVEY.md §5, hazard H6).
  *
  * The same `groupBy(window(...))` plans run unchanged on a streaming
  * DataFrame — that is the point of declaring them with the built-in
  * window()/session_window() operators rather than hand-rolled buckets.
  */
object Shapes extends QueryModule {

  def entries: Map[String, QueryDef] = Map(

    // Tumbling 1-day windows (the `%Y%m%d` daily tier, backup.sh:27).
    "q_stream_tumbling" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy(window(col("ts_s"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(date_format(col("win.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("day", "event_type"),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY day, event_type
             |ORDER BY day, event_type""".stripMargin)),

    // Sliding 1-hour windows every 15 minutes: each event lands in 4
    // overlapping windows. The DuckDB unroll reproduces Spark's
    // epoch-aligned bucket starts via integer epoch arithmetic (no
    // engine-specific bucket-origin semantics involved).
    "q_stream_sliding" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .groupBy(window(col("ts_s"), "1 hour", "15 minutes").as("win"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm").as("win_start"), col("n"))
        .orderBy("win_start"),
      Some("""SELECT strftime(make_timestamp(
             |         ((CAST(floor(epoch(date_trunc('second', ts)) / 900) AS BIGINT) - i.i) * 900) * 1000000),
             |         '%Y-%m-%d %H:%M') AS win_start,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
             |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Sessionization, 30-minute inactivity gap — batch form: a new
    // session starts where the gap from the previous event of the same
    // user exceeds the gap; the session id is the running count of
    // session starts. One shuffle on user, one sort — the exact state
    // layout session_window() maintains incrementally.
    "q_stream_session" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s"), col("event_id"))
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Relational.eventsSec(s, dir)
          .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts_s")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(cum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts_s")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max(col("ts_s")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some("""SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
             |       strftime(min(ts_s), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       strftime(max(ts_s), '%Y-%m-%d %H:%M:%S') AS session_end
             |FROM (
             |  SELECT user_id, event_id, ts_s,
             |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, event_id, date_trunc('second', ts) AS ts_s,
             |           CASE WHEN lag(date_trunc('second', ts), 1) OVER (
             |                  PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id) IS NULL
             |                  OR epoch(date_trunc('second', ts)) - epoch(lag(date_trunc('second', ts), 1) OVER (
             |                  PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)) > 1800
             |                THEN 1 ELSE 0 END AS new_session
             |    FROM events))
             |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin))
  )
}
