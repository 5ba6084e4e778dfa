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

  /** The round-9 sweep: every SQL-text twin must return the DataFrame
    * form's exact rows AND plan the same physical posture — join
    * strategies, exchanges, global windows — because Catalyst does not
    * care which front end authored the plan. The strategy vector runs
    * through the user-facing Introspect API, not ad-hoc string checks.
    */
  private val twins: Seq[(String, String)] = Seq(
    "q_sql_replacing_final" -> "q_replacing_final",
    "q_sql_agg_percentile" -> "q_agg_percentile",
    "q_sql_dict_get" -> "q_dict_get",
    "q_sql_funnel" -> "q_funnel",
    "q_sql_dedup_docs" -> "q_dedup_docs",
    "q_sql_retention_keep_last" -> "q_retention_keep_last",
    "q_sql_limit_by" -> "q_limit_by",
    "q_sql_topk_per_group" -> "q_topk_per_group",
    "q_sql_agg_entropy" -> "q_agg_entropy",
    "q_sql_join_asof" -> "q_join_asof",
    "q_sql_agg_rollup" -> "q_agg_rollup",
    "q_sql_sim_topk" -> "q_sim_topk")

  private def strategyVector(df: org.apache.spark.sql.DataFrame) =
    plans.Introspect.summary(df)
      .select("n_broadcast_joins", "n_shuffle_joins", "n_cartesian",
        "n_nested_loop_joins", "n_global_windows", "n_hash_exchanges",
        "n_range_exchanges")
      .collect()(0)

  twins.foreach { case (sqlName, dfName) =>
    test(s"$sqlName ≡ $dfName: rows, columns, and physical strategy") {
      val sql = SparkEntry.queries(sqlName)(spark, sf)
      val df = SparkEntry.queries(dfName)(spark, sf)
      assert(sql.columns.toSeq == df.columns.toSeq,
        s"$sqlName column names drifted from $dfName")
      assert(sql.collect().toSeq == df.collect().toSeq,
        s"$sqlName returned different rows than $dfName")
      assert(strategyVector(sql) == strategyVector(df),
        s"$sqlName planned a different physical strategy than $dfName")
    }
  }

  test("q_sql_dedup_minhash ≡ q_dedup_minhash rows; plan stays banded") {
    // Result equality only for the kernel route: the builder form
    // materializes signatures via localCheckpoint (not expressible in
    // SQL text), so the plans differ structurally on purpose. The
    // red-flag posture is still pinned: banded equi-joins only.
    val sql = SparkEntry.queries("q_sql_dedup_minhash")(spark, sf)
    val df = SparkEntry.queries("q_dedup_minhash")(spark, sf)
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq,
      "SQL-text minhash pipeline returned different verified pairs")
    val s = plans.Introspect.summary(sql).collect()(0)
    assert(s.getAs[Long]("n_cartesian") == 0L)
    assert(s.getAs[Long]("n_nested_loop_joins") == 0L)
    assert(s.getAs[Long]("n_global_windows") == 0L)
  }

  test("minhash_words resolves by name through the SQL parser") {
    // The kernel route's registry proof, independent of the pipeline:
    // SQL-parsed minhash_words ≡ the Column-API kernel, value-exact.
    val sql = spark.sql(
      s"""SELECT doc_id, minhash_words(split(text, ' '), 3, 16) AS sig
         |FROM parquet.`$sf/documents.parquet` WHERE doc_id < 50
         |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val df = Tables(spark, sf, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        functions.TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(sql.toSeq == df.toSeq,
      "SQL-parsed minhash_words differs from the Column-API kernel")
    assert(sql.nonEmpty)
  }
}
