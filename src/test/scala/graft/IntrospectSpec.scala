package graft

import org.apache.spark.sql.functions._

/** The user-facing `EXPLAIN` surface ([[plans.Introspect]]): the same
  * plan-shape invariants PlanSpec pins in CI, asserted THROUGH the
  * introspection API on flagship queries — so the discipline is a
  * queryable feature, not just a test suite.
  */
class IntrospectSpec extends SparkSpec {

  import spark.implicits._

  private def summaryRow(name: String) =
    plans.Introspect.summarizeQuery(spark, sf, name).collect()(0)

  test("q_join_multiway: real joins, dims broadcast, no degenerate strategies") {
    val s = summaryRow("q_join_multiway")
    assert(s.getAs[Long]("n_cartesian") == 0, "multiway must not plan a cartesian")
    assert(s.getAs[Long]("n_nested_loop_joins") == 0,
      "multiway must not fall back to a nested loop")
    val joins = s.getAs[Long]("n_broadcast_joins") + s.getAs[Long]("n_shuffle_joins")
    assert(joins >= 2, s"multiway must keep its join chain, saw $joins")
    assert(s.getAs[Long]("n_broadcast_joins") >= 1,
      "at least one dim side must broadcast in the multiway chain")
  }

  test("q_skip_scan: the range predicate reaches the reader as pushed filters") {
    val s = summaryRow("q_skip_scan")
    assert(s.getAs[Boolean]("has_pushed_filters"),
      "skip-scan must push its value range into the parquet reader")
    val scans = plans.Introspect.explainQuery(spark, sf, "q_skip_scan")
      .filter(col("facet") === "scan").select("detail").as[String].collect()
    assert(scans.exists(d => d.contains("GreaterThanOrEqual(value,10.0)")
        && d.contains("LessThanOrEqual(value,50.0)")),
      s"both range bounds must appear as pushed filters: ${scans.mkString("; ")}")
  }

  test("q_replacing_final: exactly one hash exchange (the keyed max_by)") {
    val s = summaryRow("q_replacing_final")
    assert(s.getAs[Long]("n_hash_exchanges") == 1,
      s"FINAL must shuffle exactly once, saw ${s.getAs[Long]("n_hash_exchanges")}")
    assert(s.getAs[Long]("n_cartesian") == 0 &&
      s.getAs[Long]("n_nested_loop_joins") == 0)
  }

  test("the pipeline view orders facets and reports window partitioning") {
    val rows = plans.Introspect.explainQuery(spark, sf, "q_win_rank")
      .orderBy("ord").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("ord")).toSeq == rows.indices.map(_.toLong),
      "ord must be a dense 0-based sequence")
    val windows = rows.filter(_.getAs[String]("facet") == "window")
    assert(windows.nonEmpty && windows.forall(_.getAs[String]("detail") == "partitioned"),
      "q_win_rank windows must be partitioned, never global")
  }
}
