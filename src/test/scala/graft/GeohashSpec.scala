package graft

import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** q_geohash's bit pipeline against EXTERNAL anchors: the two
  * published geohash examples (the oracle only proves Spark ≡ DuckDB
  * on the same formula; these prove the formula is the standard), and
  * the quantization round trip on fixture coordinates.
  */
class GeohashSpec extends SparkSpec {

  test("geohash known values match the published standard") {
    val (clat1, clon1) = Scalars.geohashCells(lit(42.605), lit(-5.603))
    val (clat2, clon2) = Scalars.geohashCells(lit(57.64911), lit(10.40744))
    val r = spark.range(1).select(
      Scalars.geohash8(clat1, clon1).as("a"),
      Scalars.geohash8(clat2, clon2).as("b")).head()
    // geohash.org / Wikipedia: (42.605, -5.603) -> ezs42...,
    // (57.64911, 10.40744) -> u4pruydq at exactly 8 characters
    assert(r.getString(0).startsWith("ezs42"),
      s"expected ezs42* for (42.605, -5.603), got ${r.getString(0)}")
    assert(r.getString(1) == "u4pruydq",
      s"expected u4pruydq for (57.64911, 10.40744), got ${r.getString(1)}")
  }

  test("re-encoding the decoded cell center reproduces every fixture geohash") {
    val declared = SparkEntry.queries("q_geohash")(spark, sf)
    val (clatC, clonC) = Scalars.geohashCells(col("lat_dec"), col("lon_dec"))
    val mismatches = declared
      .withColumn("gh2", Scalars.geohash8(clatC, clonC))
      .filter(col("gh2") =!= col("geohash"))
      .count()
    assert(mismatches == 0,
      s"$mismatches decoded centers re-encode to a different geohash")
  }
}
