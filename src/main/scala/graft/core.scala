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
    * must resolve its own scan (DeterminismSpec relies on this).
    *
    * Bounded LRU, NOT a weak map: a cached DataFrame strongly
    * references its session, so weak session keys would never be
    * collectible (the value-refers-to-key pitfall) — a hard bound on
    * retained sessions is the honest lifecycle. The plan is immutable
    * and the fixture dirs are read-only, so reuse is safe.
    */
  private val MaxSessions = 8
  private val resolved = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[(String, String), DataFrame]](
        MaxSessions, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.concurrent.TrieMap[(String, String), DataFrame]]): Boolean =
        size() > MaxSessions
    })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved
      .computeIfAbsent(spark, _ => scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))

  /** Scale-adaptive fan-out for expression-heavy MAP pipelines (r15,
    * guide §2 "make partitioning scale-adaptive — derive from input
    * size"): the fixture parquets are single-row-group files, so a scan
    * can never split and every per-row-expensive projection (regex,
    * string formatting, tokenization) runs in ONE task regardless of
    * core count. When — and only when — the plan's natural scan
    * parallelism is below the session's core count, redistribute on a
    * stable key before the expensive map work; at production scale the
    * scan already yields >= cores splits and this is the IDENTITY (no
    * extra exchange ships). Hash partitioning on an explicit key keeps
    * the row→partition mapping deterministic (no round-robin
    * order-sensitivity), and every declared query is
    * partitioning-invariant by the determinism doctrine (the driver
    * already benches the same queries at different core counts).
    * Query-path only: NEVER use under a snapshot/backup write — part
    * counts are observable results there.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, key) else df
  }
}
