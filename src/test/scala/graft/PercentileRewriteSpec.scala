package graft

import org.apache.spark.sql.functions._

/** The r15 cumulative-window exact-percentile rewrite against the
  * `percentile(value, qs, freq)` aggregate reference: bit-identical
  * rows on the live fixtures and on adversarial tie/integral-position
  * data (the interpolation reproduces Percentile.getPercentile's
  * arithmetic literally, so equality is on raw doubles, not rounded).
  */
class PercentileRewriteSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  test("window form equals the aggregate form on sf0.001") {
    val li = Tables(spark, sf, "lineitem")
    val got = rows(operators.Aggregates.exactPercentilesWindow(li))
    val want = rows(operators.Aggregates.exactPercentilesAgg(li))
    assert(got == want, s"got $got, want $want")
  }

  test("window form equals the aggregate form on sf0.01") {
    val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val got = rows(operators.Aggregates.exactPercentilesWindow(li))
    val want = rows(operators.Aggregates.exactPercentilesAgg(li))
    assert(got == want, s"got $got, want $want")
  }

  test("ties and integral positions cannot move a quantile") {
    import spark.implicits._
    // 11 rows per group → q·(N−1) lands on integral positions for
    // q=0.5/0.9; heavy ties around the p50/p90 crossings; one group
    // with a single distinct value (every quantile = that value).
    val df = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 2.0), ("A", 3.0),
      ("A", 3.0), ("A", 7.5), ("A", 7.5), ("A", 7.5), ("A", 9.0),
      ("A", 9.0),
      ("B", 4.25), ("B", 4.25), ("B", 4.25), ("B", 4.25), ("B", 4.25))
      .toDF("l_returnflag", "l_extendedprice")
    val got = rows(operators.Aggregates.exactPercentilesWindow(df))
    val want = rows(operators.Aggregates.exactPercentilesAgg(df))
    assert(got == want, s"got $got, want $want")
  }
}
