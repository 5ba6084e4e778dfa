package graft

import org.apache.spark.sql.functions._

/** The two-phase weighted-median rewrite against its one-window
  * reference: identical results on the live fixture and on adversarial
  * boundary data (crossing exactly on a bucket edge, single-bucket
  * groups, ties on the crossing value).
  */
class WeightedMedianSpec extends SparkSpec {

  test("two-phase crossing equals the one-window reference on the fixture") {
    val li = Tables(spark, sf, "lineitem")
    val got = operators.Aggregates.weightedMedianTwoPhase(li)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = operators.Aggregates.weightedMedianOneWindow(li)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.sameElements(want), s"got ${got.toSeq}, want ${want.toSeq}")
  }

  test("the refinement join broadcasts the 3-row crossing side") {
    val plan = operators.Aggregates
      .weightedMedianTwoPhase(Tables(spark, sf, "lineitem"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the crossing-bucket side must broadcast, plan was:\n$plan")
  }

  test("bucket-boundary and tie cases cannot move the crossing") {
    import spark.implicits._
    // group A: crossing lands exactly on a bucket boundary value
    // (cum at 999.0 = 5 of tot 10 ⇒ >= half at the FIRST value);
    // group B: all weight in one bucket, heavy tie at the crossing;
    // group C: crossing value is the first value of a later bucket
    val rows = Seq(
      ("A", 999.0, 5.0), ("A", 1000.0, 3.0), ("A", 2500.0, 2.0),
      ("B", 10.0, 1.0), ("B", 20.0, 1.0), ("B", 20.5, 6.0), ("B", 30.0, 1.0),
      ("C", 500.0, 2.0), ("C", 3000.0, 1.0), ("C", 3001.0, 9.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val got = operators.Aggregates.weightedMedianTwoPhase(rows)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = operators.Aggregates.weightedMedianOneWindow(rows)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.sameElements(want), s"got ${got.toSeq}, want ${want.toSeq}")
    assert(want.toSeq == Seq(("A", 999.0), ("B", 20.5), ("C", 3001.0)))
  }
}
