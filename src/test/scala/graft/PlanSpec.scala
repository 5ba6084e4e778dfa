package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan discipline (SURVEY.md §4): the 100 TB posture is a
  * property of the PLAN, not the result, so it gets spec'd like one.
  * Catches regressions where a query still returns correct rows but
  * silently degrades to a nested loop, loses a broadcast, or stops
  * pushing filters into the scan.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** The AQE FINAL plan: run the query, then render the executed plan —
    * initial formatted plans show `isFinalPlan=false` without codegen
    * spans or runtime broadcast decisions.
    */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // drives THIS QueryExecution so AQE finalizes it
    df.queryExecution.executedPlan.toString
  }

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
    * an intentionally unconditioned join against a broadcast side that
    * is O(1)-sized BY CONSTRUCTION at any scale factor —
    * q_sim_topk/q_sim_ann fan a ≤10-row query/probe set across the
    * corpus, q_retention_filter joins the 1-row GC cutoff aggregate.
    */
  private val intendedNestedLoop =
    Set("q_sim_topk", "q_sim_ann", "q_retention_filter")

  test("no declared query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!formatted(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins appear only where a bounded side is broadcast on purpose") {
    SparkEntry.queries.keys.filterNot(intendedNestedLoop).foreach { name =>
      assert(!formatted(name).contains("BroadcastNestedLoopJoin"),
        s"$name plans an unintended nested-loop join")
    }
  }

  test("dim joins broadcast; fact joins hash or sort-merge") {
    assert(formatted("q_join_broadcast").contains("BroadcastHashJoin"))
    val multiway = formatted("q_join_multiway")
    assert(multiway.contains("Join"), "multiway plan lost its joins")
    assert(!multiway.contains("BroadcastNestedLoopJoin"))
  }

  test("filters reach the parquet scan as pushed filters") {
    val f = formatted("q_filter_pred")
    assert(f.contains("PushedFilters") && f.contains("StringStartsWith(event_type,purchase)"),
      "the DB-name prefix predicate must push into the parquet reader")
    val r = formatted("q_join_semi")
    assert(r.contains("PushedFilters") && r.contains("GreaterThan(o_totalprice"),
      "o_totalprice threshold must push into the orders scan")
  }

  test("scans prune columns to the projection") {
    val s = formatted("q_snapshot_scan")
    // 5 of customer's 7 columns are projected; the scan must not read
    // the remaining payload columns
    assert(s.contains("ReadSchema"))
    assert(!s.contains("c_phone") && !s.contains("c_comment"),
      "unprojected customer columns must not reach the scan")
  }

  test("hot relational shapes stay inside whole-stage codegen") {
    Seq("q_agg_hash", "q_join_hash", "q_win_rank", "q_dedup_docs").foreach { name =>
      // codegen stages render as `*(n) Operator` in the final AQE plan
      assert(executedPlan(name).contains("*("),
        s"$name fell out of whole-stage codegen")
    }
  }
}
