package graft

import org.apache.spark.sql.functions._

/** q_agg_group_array joins the distinct set with the ASCII unit
  * separator (0x1f) on both engines. The join is lossless only while no
  * value contains the separator — this spec pins that invariant on the
  * live domain (turning the comment's assumption into a failing test if
  * the data ever changes) and checks the stringified query agrees with
  * its array-typed twin.
  */
class GroupArraySepSpec extends SparkSpec {

  private val Sep = "\u001f"

  test("no c_mktsegment value contains the unit separator") {
    val n = Tables(spark, sf, "customer")
      .filter(col("c_mktsegment").contains(Sep)).count()
    assert(n == 0L, "a segment value contains 0x1f — the group-array join would alias")
  }

  test("stringified query ≡ array-typed twin joined with the separator") {
    val s = SparkEntry.queries("q_agg_group_array")(spark, sf)
      .select("c_nationkey", "segments")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
    // the twin's emitted surface is JSON; parse it back to the array
    val t = SparkEntry.queries("q_agg_group_array_typed")(spark, sf)
      .select(col("c_nationkey"),
        array_join(from_json(col("segments_json"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), Sep).as("j"))
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
    assert(s.sameElements(t))
  }

  test("the typed twin still carries an ArrayType column inside its plan") {
    val q = SparkEntry.queries("q_agg_group_array_typed")(spark, sf)
    // the aggregate output (below the final JSON projection) must be a
    // real array — the twin exists to exercise array-typed aggregation
    val hasArray = q.queryExecution.analyzed.collectFirst {
      case p if p.output.exists(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) => p
    }.isDefined
    assert(hasArray, "the plan must aggregate into an ArrayType column")
    // and the emitted surface must be scalar (driver-hashable)
    assert(q.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
  }
}
