package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The backup/restore loop itself (layer [R]): `BACKUP DATABASE … TO
  * Disk` (backup.sh:45) with the post-write validation of
  * backup.sh:47–65, and the restore direction the ClickHouse BACKUP
  * feature implies.
  *
  * Scale shape: the snapshot is ONE physical parquet dataset
  * partitioned by day bucket ([[Retention.writeSnapshot]]); the four
  * retention tiers are zero-copy views (filters on bucket columns —
  * the hardlink fan-out of backup.sh:67–97 without the copies), and
  * reads that filter a bucket prune partitions at the scan.
  */
object Snapshot {

  /** Snapshot write + the reference's fail-fast post-write checks
    * (backup.sh:47–65: file must exist and be non-trivial, else exit
    * 1): write day-partitioned, read back, verify row count matches.
    * Returns the verified row count.
    */
  def backup(df: DataFrame, ts: Column, dest: String): Long = {
    val expected = df.count()
    Retention.writeSnapshot(df, ts, dest)
    // an empty write leaves no readable footers — that IS the failure
    // mode the reference's [ -f FILE ] check catches (backup.sh:47–52)
    val actual =
      try restore(df.sparkSession, dest).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    require(actual == expected,
      s"snapshot validation failed: wrote $expected rows, read back $actual (dest=$dest)")
    require(actual > 0, s"snapshot validation failed: empty snapshot at $dest")
    actual
  }

  /** RESTORE analog: read the snapshot back (schema from parquet
    * footers — the engine is schema-dynamic like the reference, which
    * backs up whatever schema the DB has). Partition-column type
    * inference is disabled DURING the read (and restored after — the
    * read resolves its schema eagerly) so `bucket_day` comes back as
    * the string it was written as without perturbing the caller's
    * session for unrelated reads.
    */
  def restore(spark: SparkSession, dest: String): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try spark.read.parquet(dest)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Format-parametric export — the `BACKUP_SUFFIX` axis of the
    * reference (Dockerfile:23: the archive format is a config choice,
    * not a semantic one). Parquet is the engine's native snapshot
    * format (columnar, typed, partition-prunable); ORC matches it
    * feature-for-feature; JSON/CSV are interchange sinks whose
    * read-back needs the schema re-applied (text formats erase types —
    * import requires the original schema for a lossless round trip,
    * which [[importFrom]] enforces by taking it explicitly).
    */
  val Formats: Set[String] = Set("parquet", "orc", "json", "csv")

  def exportAs(df: DataFrame, dest: String, format: String): Unit = {
    require(Formats(format), s"unsupported snapshot format '$format' (one of $Formats)")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(dest)
  }

  /** Schema-explicit import: text formats come back string-typed
    * without it, and even parquet/ORC benefit from the assert-early
    * contract (a drifted snapshot fails at read, not mid-query).
    */
  def importFrom(spark: SparkSession, dest: String, format: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(Formats(format), s"unsupported snapshot format '$format' (one of $Formats)")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(dest)
  }

  /** A retention-tier view over the snapshot: day-bucket prefix length
    * selects the tier granularity (day=8, month=6 via prefix). Filters
    * on `bucket_day` are partition predicates — the scan prunes whole
    * directories, which is the point of partitioning by the bucket.
    */
  def dayView(snap: DataFrame, day: String): DataFrame =
    snap.filter(col("bucket_day") === day)

  def monthView(snap: DataFrame, month: String): DataFrame =
    snap.filter(col("bucket_day").startsWith(month))
}
