package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over `ArrayType(FloatType)` columns, built entirely
  * from higher-order functions — codegen-friendly, no UDF serialization
  * boundary, usable inside any Catalyst plan (SURVEY.md §2.J).
  *
  * Elements are cast to double BEFORE arithmetic so Spark and DuckDB
  * (oracle side) accumulate identically; the fold is sequential, so the
  * summation order is deterministic.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance — cheaper than cosine when vectors are
    * pre-normalized (monotonic in cosine).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)
}
