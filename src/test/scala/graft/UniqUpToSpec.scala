package graft

import graft.functions.UniqUpToAgg
import org.apache.spark.sql.functions._

/** The capped uniqUpTo aggregator ≡ the exact saturated form
  * (`least(countDistinct, N+1)`), plus the bounded-state contract:
  * saturated groups answer N+1 no matter how far past the threshold
  * they run, and the merge is partitioning-invariant.
  */
class UniqUpToSpec extends SparkSpec {

  test("capped aggregator equals least(countDistinct, N+1) on the live fixture") {
    val e = operators.Relational.eventsSec(spark, sf)
    val got = e.groupBy("event_type")
      .agg(UniqUpToAgg(col("user_id"), 100).as("u"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = e.groupBy("event_type")
      .agg(least(countDistinct(col("user_id")), lit(101L)).as("u"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("saturates at N+1, stays exact below N, invariant to partitioning") {
    import spark.implicits._
    // group "big": 500 distinct values (far past the threshold);
    // group "small": 5 distinct values, each duplicated
    val rows = (1 to 500).map(i => ("big", i.toLong)) ++
      (1 to 10).map(i => ("small", (i % 5).toLong))
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(UniqUpToAgg(col("v"), 100).as("u"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("big" -> 101L, "small" -> 5L), s"parts=$parts")
    }
  }
}
