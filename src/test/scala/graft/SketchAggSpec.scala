package graft

import org.apache.spark.sql.functions._

/** The two new sketch aggregates against their exact references:
  * weighted SpaceSaving top-k must agree exactly with groupBy-sum
  * while capacity covers the domain, and the HLL partial-merge
  * estimate must land within HLL error of the exact distinct count —
  * including when the partials are merged from a different
  * partitioning (the mergeability contract itself).
  */
class SketchAggSpec extends SparkSpec {

  test("weighted top-k sketch equals the exact by-weight top-k on the fixture") {
    val got = SparkEntry.queries("q_topk_weighted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Tables(spark, sf, "documents")
      .groupBy("source").agg(sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("total_chars").desc, col("source").asc)
      .limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(t => (t._1, t._2)).sameElements(want),
      s"got ${got.toSeq}, want ${want.toSeq}")
    assert(got.forall(_._3 == 0L), "capacity covers the domain: error bounds must be 0")
  }

  test("HLL day-partial merge estimates within sketch error of exact distinct") {
    val got = SparkEntry.queries("q_agg_hll_merge")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val exact = operators.Relational.eventsSec(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val est = got(t).toDouble
      assert(math.abs(est - n) <= math.max(2.0, 0.05 * n),
        s"$t: estimate $est too far from exact $n")
    }
  }

  test("HLL partials are mergeable: per-day union equals the single-pass sketch") {
    val e = operators.Relational.eventsSec(spark, sf)
    val viaPartials = SparkEntry.queries("q_agg_hll_merge")(spark, sf)
      .select("event_type", "approx_users")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val onePass = e.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaPartials == onePass,
      "merging day partials must give the same estimate as one global sketch")
  }
}
