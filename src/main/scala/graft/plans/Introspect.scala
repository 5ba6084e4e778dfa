package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `EXPLAIN`-level plan introspection as a first-class query surface —
  * the ClickHouse user's `EXPLAIN PLAN` / `EXPLAIN PIPELINE` habit
  * ([CH] capability layer; the reference engine version, Dockerfile:2,
  * ships both). Spark-first: the facts come straight from the
  * physical `SparkPlan` tree (descending through AQE wrappers), so
  * what this reports is exactly what executes — scan pushdown,
  * join strategies, exchanges, window partitioning, codegen spans.
  *
  * Two granularities:
  *  - [[explain]]: one row per plan node of interest (the PIPELINE
  *    view) — facet, detail, with scans carrying pushed filters and
  *    the pruned read schema.
  *  - [[summary]]: one row per query (the dashboard view) — counts of
  *    scans/joins/exchanges/global windows plus boolean red flags
  *    (cartesian product, un-broadcast nested loop), the exact
  *    invariants PlanSpec pins in CI, queryable at runtime by users.
  *
  * Scale shape: pure driver-side metadata — the plan tree, never the
  * data. Safe to call on any query at any scale factor.
  */
object Introspect {

  final case class Facet(facet: String, detail: String)

  /** Descend through AQE wrappers to the concrete node tree. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: QueryStageExec => walk(q.plan)
    case w: WholeStageCodegenExec => p +: walk(w.child)
    case i: InputAdapter => walk(i.child)
    case other => other +: other.children.flatMap(walk)
  }

  private def facetsOf(plan: SparkPlan): Seq[Facet] = walk(plan).collect {
    case s: FileSourceScanExec =>
      val pushed = s.metadata.getOrElse("PushedFilters", "[]")
      val schema = s.metadata.getOrElse("ReadSchema", "")
      val loc = s.metadata.getOrElse("Location", "")
        .replaceAll("^[A-Za-z]+\\[", "").stripSuffix("]")
      Facet("scan", s"parquet $loc pushed=$pushed read=$schema")
    case j: BroadcastHashJoinExec => Facet("join", s"broadcast_hash ${j.joinType}")
    case j: ShuffledHashJoinExec => Facet("join", s"shuffled_hash ${j.joinType}")
    case j: SortMergeJoinExec => Facet("join", s"sort_merge ${j.joinType}")
    case j: BroadcastNestedLoopJoinExec => Facet("join", s"nested_loop ${j.joinType}")
    case _: CartesianProductExec => Facet("join", "cartesian Inner")
    case e: ShuffleExchangeExec => Facet("exchange", e.outputPartitioning.toString)
    case _: BroadcastExchangeExec => Facet("exchange", "broadcast")
    case w: WindowExec =>
      Facet("window", if (w.partitionSpec.isEmpty) "global" else "partitioned")
    case a: HashAggregateExec => Facet("aggregate", s"hash ${a.aggregateExpressions.map(_.mode).distinct.mkString(",")}")
    case a: ObjectHashAggregateExec => Facet("aggregate", s"object_hash ${a.aggregateExpressions.map(_.mode).distinct.mkString(",")}")
    case a: SortAggregateExec => Facet("aggregate", s"sort ${a.aggregateExpressions.map(_.mode).distinct.mkString(",")}")
    case c: WholeStageCodegenExec => Facet("codegen", s"stage ${c.codegenStageId}")
  }

  /** The PIPELINE view: one ordered row per interesting physical node.
    * Pass a collected/executed DataFrame to see the AQE-final plan;
    * an un-run one shows the initial static plan.
    */
  def explain(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = facetsOf(df.queryExecution.executedPlan).zipWithIndex.map {
      case (f, i) => Row(i.toLong, f.facet, f.detail)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("ord", LongType, nullable = false),
        StructField("facet", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))))
  }

  /** The dashboard view: plan-shape counts + red flags, one row. */
  def summary(df: DataFrame): DataFrame = {
    val fs = facetsOf(df.queryExecution.executedPlan)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((
      fs.count(_.facet == "scan").toLong,
      fs.count(f => f.facet == "join" && f.detail.startsWith("broadcast_hash")).toLong,
      fs.count(f => f.facet == "join" &&
        (f.detail.startsWith("sort_merge") || f.detail.startsWith("shuffled_hash"))).toLong,
      fs.count(f => f.facet == "join" && f.detail.startsWith("nested_loop")).toLong,
      fs.count(f => f.facet == "join" && f.detail.startsWith("cartesian")).toLong,
      fs.count(f => f.facet == "exchange" && f.detail.startsWith("hashpartitioning")).toLong,
      fs.count(f => f.facet == "exchange" && f.detail.startsWith("rangepartitioning")).toLong,
      fs.count(f => f.facet == "window" && f.detail == "global").toLong,
      fs.count(_.facet == "codegen").toLong,
      fs.exists(f => f.facet == "scan" && f.detail.contains("pushed=[") &&
        !f.detail.contains("pushed=[]"))))
      .toDF("n_scans", "n_broadcast_joins", "n_shuffle_joins",
        "n_nested_loop_joins", "n_cartesian", "n_hash_exchanges",
        "n_range_exchanges", "n_global_windows", "n_codegen_stages",
        "has_pushed_filters")
  }

  /** Introspect a DECLARED query by name — `EXPLAIN <saved query>` for
    * the engine's own surface.
    */
  def explainQuery(spark: SparkSession, sfDir: String, name: String): DataFrame =
    explain(graft.SparkEntry.queries(name)(spark, sfDir))

  def summarizeQuery(spark: SparkSession, sfDir: String, name: String): DataFrame =
    summary(graft.SparkEntry.queries(name)(spark, sfDir))
}
