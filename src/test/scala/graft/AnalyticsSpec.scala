package graft

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Independent semantic checks for the ClickHouse-analytics aggregates
  * (`q_funnel`, `q_cohort_retention`, `q_sample`). The DuckDB oracle
  * mirrors each query's relational SHAPE, so these specs pin the
  * SEMANTICS on hand-crafted inputs with known ground truth — ordering
  * constraints, window cutoffs, cohort boundaries.
  */
class AnalyticsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel counts only in-order, in-window progressions") {
    val rows = Seq(
      // u1: full in-order conversion within 7 days -> level 3
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE click -> purchase doesn't count, level 2
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // u3: click after the 7-day window -> level 1
      (3L, "signup", ts(1)), (3L, "click", ts(9)),
      // u4: signup only -> level 1
      (4L, "signup", ts(1)),
      // u5: click+purchase but never signed up -> not in the funnel
      (5L, "click", ts(1)), (5L, "purchase", ts(2)))
    val e = spark.createDataFrame(rows).toDF("user_id", "event_type", "ts_s")

    // same pipeline as q_funnel, applied to the synthetic events
    val u1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
    val u2 = e.filter(col("event_type") === "click")
      .join(u1, Seq("user_id"))
      .filter(col("ts_s") > col("t1") &&
        col("ts_s") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts_s")).as("t2"), first(col("t1")).as("t1b"))
    val u3 = e.filter(col("event_type") === "purchase")
      .join(u2, Seq("user_id"))
      .filter(col("ts_s") > col("t2") &&
        col("ts_s") <= col("t1b") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts_s")).as("t3"))
    val levels = u1
      .join(u2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(u3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + col("t2").isNotNull.cast("int") + col("t3").isNotNull.cast("int"))
          .as("level"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(levels == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1),
      s"got $levels")
  }

  test("fixture funnel is monotone: level counts exist and users are partitioned") {
    val got = SparkEntry.queries("q_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every signup user lands in exactly one level
    val signups = operators.Relational.eventsSec(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(got.values.sum == signups, s"levels $got must partition $signups users")
    assert(got.keySet.subsetOf(Set(1L, 2L, 3L)))
  }

  test("cohort retention flags exact week offsets only") {
    val rows = Seq(
      // u1 signs up week of Jan 1 (Mon), active again exactly next week
      (1L, "signup", ts(1)), (1L, "click", ts(8)),
      // u2 signs up same week, next activity 2 weeks out only
      (2L, "signup", ts(2)), (2L, "click", ts(16)),
      // u3 signs up same week, never returns
      (3L, "signup", ts(3)))
    val e = spark.createDataFrame(rows).toDF("user_id", "event_type", "ts_s")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min(col("ts_s"))).as("cohort_week"))
    val activity = e.select(col("user_id"),
      date_trunc("week", col("ts_s")).as("act_week")).distinct()
    val r = cohort.join(activity, Seq("user_id"))
      .groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum((col("act_week") === col("cohort_week") + expr("INTERVAL 7 DAYS"))
          .cast("long")).as("wk1"),
        sum((col("act_week") === col("cohort_week") + expr("INTERVAL 14 DAYS"))
          .cast("long")).as("wk2"))
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1 && r(0).getLong(3) == 1)
  }

  test("consistent-hash sample is stable and joins line up across tables") {
    val q = SparkEntry.queries("q_sample")
    val a = q(spark, sf).collect().map(_.getLong(0)).toSet
    val b = q(spark, sf).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty, "sample must be identical across runs")
    // sampling lineitem on the SAME key keeps exactly the sampled orders
    val li = Tables(spark, sf, "lineitem")
      .filter(substring(md5(col("l_orderkey").cast("string")), 1, 1) === "0")
      .select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(li.nonEmpty && li.subsetOf(a),
      "lineitem sampled on the same key must align with the orders sample")
  }
}
