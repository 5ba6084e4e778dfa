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

  test("theta set algebra equals exact set counts below the exact-mode threshold") {
    // theta sketches are exact below 2^lgK uniques (default lgK=12 =
    // 4096); the sf0.001 user domain is far under that, so estimates
    // must EQUAL the exact intersection/difference counts.
    val e = Tables(spark, sf, "events")
    def users(t: String): Set[Long] =
      e.filter(col("event_type") === t).select("user_id")
        .collect().map(_.getLong(0)).toSet
    val (s, p, err) = (users("signup"), users("purchase"), users("error"))
    val got = SparkEntry.queries("q_agg_theta_sets")(spark, sf).collect()(0)
    assert(got.getLong(0) == s.size && got.getLong(1) == p.size)
    assert(got.getLong(2) == (s & p).size,
      s"intersection: got ${got.getLong(2)}, want ${(s & p).size}")
    assert(got.getLong(3) == ((s & p) -- err).size,
      s"difference: got ${got.getLong(3)}, want ${((s & p) -- err).size}")
  }

  test("KLL day-partial merge lands within rank error of the exact quantiles") {
    val got = SparkEntry.queries("q_agg_kll_merge")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toList
    val exact = operators.Relational.eventsSec(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.35D, 0.65D, 0.85D, 0.95D))").as("ps"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toMap
    assert(got.nonEmpty)
    got.foreach { case (t, p50, p90) =>
      // KLL default k gives ~1.7% rank error at 99% confidence — the
      // p50 estimate must sit far inside the exact [p35, p65] band, and
      // p90 inside [p85, p95].
      val Seq(p35, p65, p85, p95) = exact(t)
      assert(p50 >= p35 && p50 <= p65, s"$t: p50 $p50 outside [$p35, $p65]")
      assert(p90 >= p85 && p90 <= p95, s"$t: p90 $p90 outside [$p85, $p95]")
    }
  }
}
