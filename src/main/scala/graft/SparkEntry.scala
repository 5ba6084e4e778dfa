package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2 is declared once in a QueryModule;
  * this object is only the aggregation point the driver calls into.
  */
object SparkEntry {

  /** All declared query modules, in SURVEY.md §2 section order. */
  def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Joins,
    operators.Aggregates,
    operators.Analytics,
    operators.TimeSeries,
    operators.Windows,
    operators.Lifecycle,
    plans.ProjectionQueries,
    plans.SqlSurface,
    plans.ChDialect,
    operators.SetOps,
    functions.Scalars,
    streaming.Shapes,
    pipeline.TextOps,
    pipeline.Bpe,
    pipeline.QualityOps,
    pipeline.Curate,
    pipeline.Dedup,
    pipeline.Cluster,
    pipeline.Mixing,
    pipeline.Similarity,
    pipeline.Multimodal)

  private lazy val all: Map[String, QueryDef] =
    modules.flatMap(_.entries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The snapshot-manifest query (SURVEY.md §7 slice 0): bucket every
    * event into the reference's tier keys (backup.sh:26–29), take the
    * per-(event_type, day) latest pointer (backup.sh:99–115), order
    * deterministically. Exercises scan → projection → date functions →
    * window → filter → sort, i.e. every layer of the reference's EP2.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = operators.Relational.eventsSec(spark, dir)
    val bucketed = operators.Retention.withBuckets(e, col("ts_s"), col("event_type"))
    operators.Retention.latest(
        bucketed, Seq(col("event_type"), col("bucket_day")), col("ts_s"), col("event_id"))
      .select("event_type", "bucket_day", "bucket_week", "bucket_month",
        "f_daily", "event_id")
      .orderBy("event_type", "bucket_day")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, map type) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
