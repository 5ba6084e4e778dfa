package graft.operators

import graft.Config
import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-database source — the JDBC analog of the reference's
  * actual data path, which is `clickhouse-client --host --port --user
  * --password` over native TCP (backup.sh:38–44, connection env
  * Dockerfile:13–19). The engine's queries stay parquet-backed; this
  * is the connector boundary for pulling a live database into the
  * snapshot pipeline (`Sources.jdbc(...)` → `Snapshot.backup(...)`).
  *
  * Scale shape: a plain JDBC read is ONE cursor on one executor — fine
  * for control/dimension tables, a wall at fact scale. The partitioned
  * variant opens `numPartitions` concurrent range-sliced cursors, which
  * is the only way a JDBC pull parallelizes; the slicing predicate is
  * pushed into each cursor's WHERE clause by Spark's JDBC relation.
  */
object Sources {

  /** Single-cursor read of one table (or a `(SELECT …) t` pushdown
    * subquery). `props` passes through driver-specific options
    * (`driver`, `fetchsize`, …).
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** The config-wired form: connection settings from the validated
    * [[graft.Config.Connection]] (the reference's host/port/user/
    * password env), closing the loop between the config layer and a
    * live source.
    */
  def jdbc(spark: SparkSession, conn: Config.Connection, subprotocol: String,
      table: String): DataFrame =
    jdbc(spark, conn.url(subprotocol), table,
      Map("user" -> conn.user, "password" -> conn.password))

  /** Range-partitioned parallel read — the 100 TB shape. Spark issues
    * `numPartitions` queries, each with a `partitionColumn` range
    * predicate, so the fetch parallelizes across executors instead of
    * serializing through one cursor. Bounds only shape the split
    * points: rows outside [lower, upper] are still read (into the edge
    * partitions), so the result is exactly the full table.
    */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partitionColumn)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Bucketed catalog table — the co-located-join lever at 100 TB:
    * when two fact tables are bucketed on their join key with the
    * same bucket count, their join runs with ZERO exchanges; the
    * shuffle is paid once at write time and amortized over every
    * subsequent join/agg on that key (the MergeTree ORDER BY analog: ClickHouse's pre-sorted
    * parts play exactly this role for its local joins). The input is
    * pre-partitioned on the key so each bucket lands as ONE file
    * (bucketed writes otherwise emit one file per task per bucket —
    * a small-file explosion at fleet scale). In-bucket `sortBy` keeps
    * files merge-friendly; the in-join sorts themselves remain (a
    * sorted-bucket scan stopped advertising its ordering in Spark 3,
    * and re-sorting within a bucket is spill-free) — the expensive
    * thing the buckets remove is the exchange, which SourcesSpec
    * pins. Bucket metadata lives in the table catalog, not parquet
    * footers — hence `saveAsTable`, not `parquet(path)`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
