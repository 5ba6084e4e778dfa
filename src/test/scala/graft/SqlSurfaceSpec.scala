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

  test("q_sql_dedup_minhash ≡ q_dedup_minhash rows; strategy vector pinned") {
    // Result equality against the kernel route, plus the FULL
    // Introspect strategy vector pinned as an expected constant (the
    // builder form materializes signatures via localCheckpoint — not
    // expressible in SQL text — so there is no plan-equal twin to
    // diff against; the pinned vector is the drift tripwire instead,
    // closing the r9 verdict's result-only caveat). The SQL plan:
    // 4 broadcast joins (gram/group sides of verify + expansion), no
    // shuffle joins, no cartesian/BNLJ/global windows, 8 hash
    // exchanges (fingerprint collapse, band buckets, distinct pair
    // dedup, union agg), 1 range exchange (final ORDER BY).
    val sql = SparkEntry.queries("q_sql_dedup_minhash")(spark, sf)
    // pin the COMPILED plan's vector (before any action): post-execution
    // AQE folds duplicate exchanges into ReusedExchange, so the executed
    // plan's count depends on runtime reuse, not on what was authored
    assert(strategyVector(sql).toSeq == Seq(4L, 0L, 0L, 0L, 0L, 8L, 1L),
      s"q_sql_dedup_minhash strategy vector drifted: ${strategyVector(sql)}")
    val df = SparkEntry.queries("q_dedup_minhash")(spark, sf)
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq,
      "SQL-text minhash pipeline returned different verified pairs")
  }

  test("q_sql_mutation_delete ≡ q_mutation_delete: independently staged routes agree") {
    // the SQL-text command route (BACKUP + ALTER … DELETE as parsed
    // statements) and the Scala-API route stage SEPARATE snapshots;
    // equal aggregates prove the router mutates exactly what the API
    // does — and both rows share one oracle string by reference
    val sql = SparkEntry.queries("q_sql_mutation_delete")(spark, sf)
    val df = SparkEntry.queries("q_mutation_delete")(spark, sf)
    assert(sql.columns.toSeq == df.columns.toSeq)
    assert(sql.collect().toSeq == df.collect().toSeq,
      "SQL-text mutation route diverged from the Scala-API route")
  }

  test("round-11 SQL command routes ≡ their Scala-API twins: independently staged routes agree") {
    // each pair stages SEPARATE snapshots (the SQL one entirely through
    // Graft.sql statements); equal aggregates prove the router lands
    // the identical post-command state — and each pair shares ONE
    // oracle string by reference, so the driver holds both to the same
    // hash
    Seq(
      ("q_sql_mutation_update", "q_mutation_update"),
      ("q_sql_optimize_dedup", "q_optimize_dedup"),
      ("q_sql_partition_detach", "q_partition_detach")).foreach {
      case (sqlName, apiName) =>
        val sql = SparkEntry.queries(sqlName)(spark, sf)
        val df = SparkEntry.queries(apiName)(spark, sf)
        assert(sql.columns.toSeq == df.columns.toSeq, s"$sqlName: column drift")
        assert(sql.collect().toSeq == df.collect().toSeq,
          s"$sqlName diverged from $apiName")
    }
  }

  test("detached-parts view shows exactly the detached day, attach-ready") {
    val out = SparkEntry.queries("q_sql_detached_parts")(spark, sf).collect()
    val e = operators.Relational.eventsSec(spark, sf)
    val first = e.select(min(date_format(col("ts_s"), "yyyyMMdd"))).head.getString(0)
    val n = e.filter(date_format(col("ts_s"), "yyyyMMdd") === first).count()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((first, n)),
      "the detached inventory must be exactly the oldest day with its full row count")
  }

  test("q_sql_backup_restore round-trips every row and the day bucketing") {
    val out = SparkEntry.queries("q_sql_backup_restore")(spark, sf).collect()
    val want = operators.Relational.eventsSec(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"),
        countDistinct(operators.Retention.bucketDay(col("ts_s")))
          .as("n_days"))
      .orderBy("event_type").collect()
    assert(out.length == want.length && out.nonEmpty)
    out.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1), s"${g.getString(0)}: row count drifted")
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-9)
      assert(g.getLong(3) == w.getLong(3), s"${g.getString(0)}: day buckets drifted")
    }
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
