package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `system.tables` / `system.columns` analogs ([CH] observability
  * surface, the polling companions of `system.mutations` /
  * `system.query_log` / `system.detached_parts` — SqlSurface
  * registers all of them as SQL-queryable views). ClickHouse's
  * versions are pure server metadata; graft's catalog is the Spark
  * session catalog plus the snapshot registry (`graft.snapshot.*`
  * session conf), so:
  *
  *  - [[tables]] unions the session catalog listing with the snapshot
  *    registrations. `total_rows` comes from the snapshot MANIFEST
  *    (one row per day — metadata-scale, zero data footers, the same
  *    read RESTORE reports from); an un-snapshotted relation reports
  *    NULL rather than paying a count scan — exactly ClickHouse's
  *    behavior for engines without row metadata.
  *  - [[columns]] is pure schema metadata (position/name/type/
  *    nullability) by default — constant-time at any data size. The
  *    optional `withCounts` arm adds exact per-column non-null counts
  *    in ONE scan / ONE aggregate (a single pass computing every
  *    count(col) together — never a scan per column, and no Expand);
  *    it is the operator's explicit opt-in, priced like
  *    `q_profile_table`, with [[Relational.profileTableApprox]] as the
  *    100 TB swap for the full-profile need.
  */
object SystemCatalog {

  /** One row per session-catalog relation and per registered snapshot:
    * (name, is_temporary, snapshot_dest, total_rows). Cost: a catalog
    * listing + one manifest read per REGISTERED snapshot — bounded by
    * operator actions, never data size.
    */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // both sides key by SIMPLE name — the convention every other
    // graft.* registry uses — so a snapshotted catalog table surfaces
    // as ONE joined row whether its snapshot was registered under
    // `db.t` (BACKUP DATABASE's spelling) or `t`
    val cat = spark.catalog.listTables().collect().map { t =>
      t.name -> t.isTemporary
    }.toMap
    val snaps = spark.conf.getAll.collect {
      case (k, v) if k.startsWith("graft.snapshot.") =>
        k.stripPrefix("graft.snapshot.").split('.').last -> v
    }
    val names = (cat.keySet ++ snaps.keySet).toSeq.sorted
    names.map { name =>
      val dest = snaps.get(name)
      val totalRows = dest.filterNot(_.endsWith(".zip")).flatMap { d =>
        scala.util.Try(
          Snapshot.parts(spark, d).agg(sum("n_rows")).head.getLong(0)).toOption
      }
      (name, cat.getOrElse(name, false), dest, totalRows)
    }.toDF("name", "is_temporary", "snapshot_dest", "total_rows")
  }

  /** `system.dictionaries` analog: one row per registered dictionary —
    * (name, source, key, n_attr_defaults). Pure conf metadata,
    * constant-time at any data size.
    */
  def dictionaries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith("graft.dict.") =>
        val parts = v.split("\\|", 3)
        val nDefaults = parts.lift(2).filter(_.nonEmpty)
          .fold(0L)(_.split(';').length.toLong)
        (k.stripPrefix("graft.dict."), parts(0), parts(1), nDefaults)
    }.toSeq.sortBy(_._1)
      .toDF("name", "source", "key", "n_attr_defaults")
  }

  /** One row per column of the named relation: (table, name, position,
    * type, [n_nonnull]). Metadata-only by default; `withCounts` adds
    * the exact non-null counts in one single-pass aggregate.
    */
  def columns(spark: SparkSession, table: String,
      withCounts: Boolean = false): DataFrame = {
    import spark.implicits._
    val df = spark.table(table)
    val fields = df.schema.fields.toSeq
    if (!withCounts)
      fields.zipWithIndex.map { case (f, i) =>
        (table, f.name, (i + 1).toLong, f.dataType.sql, f.nullable)
      }.toDF("table", "name", "position", "type", "is_nullable")
    else {
      val aggs = fields.map(f => count(col(f.name)).as(s"__c_${f.name}"))
      val counts = df.agg(aggs.head, aggs.tail: _*).head
      fields.zipWithIndex.map { case (f, i) =>
        (table, f.name, (i + 1).toLong, f.dataType.sql, counts.getLong(i))
      }.toDF("table", "name", "position", "type", "n_nonnull")
    }
  }
}
