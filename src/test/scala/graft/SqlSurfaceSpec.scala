package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** The SQL-text entry surface (plans/SqlSurface.scala): parse →
  * GraftExtensions function resolution → the same plan the DataFrame
  * builders produce. Pins result equality against the builder twins
  * and physical-strategy equality through the Introspect API.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("SQL-text multiway join ≡ the DataFrame form, rows and join strategies") {
    val sql = SparkEntry.queries("q_sql_join_multiway")(spark, sf)
    val df = SparkEntry.queries("q_join_multiway")(spark, sf)
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq,
      "SQL-text twin returned different rows than the DataFrame form")
    // same physical posture: Catalyst does not care which front end
    // authored the plan — broadcast/shuffle join counts must match
    def strat(d: org.apache.spark.sql.DataFrame) = plans.Introspect.summary(d)
      .select("n_broadcast_joins", "n_shuffle_joins", "n_cartesian",
        "n_nested_loop_joins").collect()(0)
    assert(strat(sql) == strat(df),
      "SQL-text twin planned different join strategies than the DataFrame form")
  }

  test("graft custom expression resolves by name through the SQL parser") {
    val sql = SparkEntry.queries("q_sql_simhash60")(spark, sf)
      .select("doc_id", "sh").collect().map(r => (r.getLong(0), r.getLong(1)))
    val df = Tables(spark, sf, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), TextFns.simhash60(col("text")).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sql.toSeq == df.toSeq,
      "SQL-parsed simhash60_words differs from the Column-API kernel")
    assert(sql.nonEmpty)
  }

  test("SQL-text window query ≡ the DataFrame form, rows and window count") {
    val sql = SparkEntry.queries("q_sql_window")(spark, sf)
    val df = SparkEntry.queries("q_win_rank")(spark, sf)
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq,
      "SQL-text window twin returned different rows than q_win_rank")
    // same physical posture: one partitioned window, zero global ones
    val s = plans.Introspect.summary(sql).collect()(0)
    assert(s.getAs[Long]("n_global_windows") == 0L)
  }

  test("snapshot catalog reads as a SQL view with manifest-only cost") {
    val out = SparkEntry.queries("q_sql_snapshot_parts")(spark, sf)
    val direct = operators.Snapshot
      .parts(spark, operators.Lifecycle.cleanDest(spark, sf))
      .filter(col("n_rows") > 0)
      .orderBy("bucket_day")
    assert(out.collect().toSeq == direct.collect().toSeq,
      "SQL view over the snapshot catalog differs from the direct API")
  }
}
