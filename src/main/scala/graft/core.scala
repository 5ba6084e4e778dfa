package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark-side plan builder plus (when the
  * semantics are exactly expressible in ANSI SQL) the DuckDB oracle
  * statement the driver hash-compares against. Oracle determinism
  * rules (SURVEY.md §5.3): ORDER BY all output columns, round doubles
  * to 4 decimals on both sides, second-truncate `events.ts` (ns vs µs
  * hazard), cast computed integers to BIGINT on both sides.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related queries (one per SURVEY.md §2 section). */
trait QueryModule {
  def entries: Map[String, QueryDef]
}

/** Fixture tables (TESTDATA.md): one parquet per table under the
  * scale-factor dir the driver passes in. Reads are lazy scans —
  * Catalyst prunes columns and pushes filters into the parquet reader,
  * so "load" costs nothing until an action runs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
