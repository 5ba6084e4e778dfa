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

  /** Resolved-scan memo, keyed by the exact session instance: a real
    * catalog resolves a table once per session, not once per query —
    * `spark.read.parquet` re-lists the directory and re-reads footers
    * for schema inference on every call, pure fixed overhead across a
    * many-query workload. Keying by session (not just path) matters
    * for correctness: split-size confs (`files.maxPartitionBytes`) are
    * captured per session, and a sibling session with different ones
    * must resolve its own scan (DeterminismSpec relies on this). The
    * plan is immutable and the fixture dirs are read-only, so reuse is
    * safe; entries die with their session reference.
    */
  private val resolved = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved
      .computeIfAbsent(spark, _ => scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))
}
