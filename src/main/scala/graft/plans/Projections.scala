package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** ClickHouse projections, Spark-first — `ALTER TABLE t ADD PROJECTION
  * p (SELECT keys…, aggs… GROUP BY keys…)` (reference engine
  * capability: Dockerfile:2 pins ClickHouse 24.8, whose MergeTree
  * parts carry aggregate projections that the planner substitutes
  * automatically; `BACKUP DATABASE` at backup.sh:45 snapshots them
  * with the table).
  *
  * Architecture: the projection is a pre-aggregated parquet of
  * MERGEABLE partial states (count / per-measure sum, min, max,
  * non-null count) per key combination, and a `Rule[LogicalPlan]`
  * injected through `SparkSessionExtensions` rewrites any matching
  * `Aggregate` over the base scan into a re-aggregation of those
  * partials — sums of sums, mins of mins — over the projection scan.
  * The query itself never changes; registration is the only opt-in.
  *
  * Scale shape: this is THE pre-aggregation play at 100 TB — a
  * dashboard query that groups a fact table by low-cardinality keys
  * re-aggregates a key-domain-sized parquet instead of re-scanning
  * the corpus. Rewrites are sound for any key SUBSET of the
  * projection keys because every stored aggregate is mergeable;
  * non-decomposable aggregates (avg, distinct, percentiles) simply
  * don't match and fall through to the base scan untouched.
  */
object Projections {

  final case class ProjectionMeta(projPath: String, keys: Seq[String],
      measures: Seq[String])

  /** Registered projections: normalized base path → metas. Session-
    * global on purpose (the rule consults it on every optimization);
    * empty ⇒ the rule is a guaranteed no-op. A base may carry several
    * projections (ClickHouse tables routinely do); the rule tries the
    * NARROWEST covering one first — fewer keys ⇒ fewer pre-aggregated
    * rows to re-merge.
    */
  private val catalog =
    scala.collection.concurrent.TrieMap.empty[String, List[ProjectionMeta]]

  private def normalize(p: String): String = {
    // raw Hadoop path strings are not guaranteed URI-legal (spaces,
    // brackets); a parse failure must mean "no projection", never an
    // optimizer-time exception
    val path =
      try {
        val u = new org.apache.hadoop.fs.Path(p).toUri
        if (u.getScheme == null) p else u.getPath
      } catch { case _: Exception => p }
    path.stripSuffix("/")
  }

  private[plans] def isEmpty: Boolean = catalog.isEmpty

  def register(basePath: String, meta: ProjectionMeta): Unit =
    catalog.updateWith(normalize(basePath)) {
      case Some(ms) => Some(meta :: ms.filterNot(_.projPath == meta.projPath))
      case None => Some(List(meta))
    }

  def unregister(basePath: String): Unit = catalog.remove(normalize(basePath))

  /** Projections covering ALL of `paths`. A multi-root scan (e.g.
    * `spark.read.parquet(base, extra)`) may only substitute when every
    * root normalizes to the SAME registered base — rewriting on a
    * partial match would silently drop the unregistered roots' rows.
    * In practice that means: single root, or duplicates of one root.
    */
  private[plans] def lookup(paths: Seq[String]): Seq[ProjectionMeta] = {
    val bases = paths.map(normalize).distinct
    if (bases.size != 1) Nil
    else catalog.getOrElse(bases.head, Nil).sortBy(_.keys.size)
  }

  /** Build + write the projection parquet for `base`: one row per key
    * combination carrying every mergeable partial the rewrite can
    * serve. Call `register` afterwards to activate it.
    */
  def materialize(base: DataFrame, keys: Seq[String], measures: Seq[String],
      dest: String): Unit = {
    val aggs = count(lit(1)).as("_cnt") +: measures.flatMap { m =>
      Seq(sum(col(m)).as(s"_sum_$m"), min(col(m)).as(s"_min_$m"),
        max(col(m)).as(s"_max_$m"), count(col(m)).as(s"_cnt_$m"))
    }
    base.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(dest)
  }
}

/** The auto-substitution rule. Matches
  * `Aggregate(groupKeys ⊆ projection keys, decomposable aggs over
  * projected measures, scan(base))` and swaps the child for the
  * projection scan with each aggregate re-expressed over the partial
  * columns. Output attribute ids are preserved via aliases, so parent
  * operators resolve unchanged; if the rewritten schema would differ
  * in any way, the rule backs off to the original plan.
  */
class ProjectionRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import Projections._

  /** Peels attribute-only Projects (column pruning interleaves them
    * within the same fixed-point batch) and collects deterministic
    * Filters down to the scan. Returns (combined filter condition,
    * scan root paths).
    */
  private def destructure(plan: LogicalPlan): Option[(Option[Expression], Seq[String])] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((None, fs.location.rootPaths.map(_.toString)))
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        destructure(p.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.deterministic =>
        destructure(f.child).map { case (cond, paths) =>
          val merged = cond
            .map(c => org.apache.spark.sql.catalyst.expressions.And(c, f.condition))
            .getOrElse(f.condition)
          (Some(merged), paths)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (Projections.isEmpty) plan // guaranteed no-op: don't touch any plan
    else plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        destructure(child).map { case (cond, paths) =>
          // narrowest covering projection wins (lookup pre-sorts)
          lookup(paths).iterator.flatMap { meta =>
            // a filter is sound iff it references only projection KEYS
            // — key predicates commute with the pre-aggregation (every
            // base row of a key combination satisfies or fails
            // together)
            if (cond.forall(_.references.forall(a => meta.keys.contains(a.name))))
              rewrite(agg, grouping, aggExprs, cond, meta)
            else None
          }.nextOption().getOrElse(agg)
        }.getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression], keyFilter: Option[Expression],
      meta: ProjectionMeta): Option[LogicalPlan] = {
    // grouping must be plain columns, all of them projection keys
    val groupNames = grouping.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (!groupNames.forall(meta.keys.contains)) return None

    // fresh attribute ids per rewrite — reusing one analyzed plan
    // across two rewrites in a single query would collide ids
    val projPlan = spark.read.parquet(meta.projPath).queryExecution.analyzed
    val byName = projPlan.output.map(a => a.name -> a).toMap

    def measureCol(prefix: String, a: Attribute): Option[Attribute] =
      if (meta.measures.contains(a.name)) byName.get(s"${prefix}_${a.name}")
      else None

    def complete(m: AggregateFunction): Expression =
      AggregateExpression(m, Complete, isDistinct = false)

    def mergedFor(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(a: AttributeReference, _) =>
        measureCol("_sum", a).map(c => complete(Sum(c)))
      case Min(a: AttributeReference) =>
        measureCol("_min", a).map(c => complete(Min(c)))
      case Max(a: AttributeReference) =>
        measureCol("_max", a).map(c => complete(Max(c)))
      // count(<non-null literal>) ≡ count(*) ≡ Σ _cnt; count(NULL
      // literal) counts zero rows and must NOT take this arm
      case Count(children)
          if children.forall(c => c.foldable && c.eval() != null) =>
        byName.get("_cnt").map(c => complete(Sum(c)))
      case Count(Seq(a: AttributeReference)) =>
        measureCol("_cnt", a).map(c => complete(Sum(c)))
      // avg = Σ(partial sums) / Σ(partial non-null counts) — the
      // textbook mergeable decomposition
      case Average(a: AttributeReference, _) =>
        for {
          s <- measureCol("_sum", a)
          c <- measureCol("_cnt", a)
        } yield org.apache.spark.sql.catalyst.expressions.Divide(
          org.apache.spark.sql.catalyst.expressions.Cast(
            complete(Sum(s)), org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            complete(Sum(c)), org.apache.spark.sql.types.DoubleType))
      case _ => None
    }

    // map an output expression TREE: aggregates swap for their merged
    // forms without descending into their (base-attr) children; bare
    // attributes outside aggregates must be group keys; everything
    // else (round, arithmetic, casts over aggregates) maps child-wise
    def mapExpr(e: Expression): Option[Expression] = e match {
      case AggregateExpression(fn, _, false, None, _) => mergedFor(fn)
      // DISTINCT over projection KEYS is exact: every key combination
      // appears exactly once in the partials, so count(DISTINCT k) /
      // sum(DISTINCT k) re-run unchanged over the projection rows
      case AggregateExpression(fn, _, true, None, _)
          if fn.references.nonEmpty
            && fn.references.forall(a => meta.keys.contains(a.name)) =>
        var ok = true
        val remapped = fn.transformUp {
          case a: AttributeReference =>
            byName.get(a.name) match {
              case Some(p) => p
              case None => ok = false; a
            }
        }.asInstanceOf[AggregateFunction]
        if (ok) Some(AggregateExpression(remapped, Complete, isDistinct = true))
        else None
      case a: AttributeReference if groupNames.contains(a.name) => byName.get(a.name)
      case _: AttributeReference => None
      case _: AggregateExpression => None // distinct over measures / filtered
      case other =>
        val kids = other.children.map(mapExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val rewritten = aggExprs.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(byName(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(e, name) =>
        mapExpr(e) match {
          case Some(m) => Alias(m, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }

    val newGrouping = groupNames.map(byName(_))
    val newChild = keyFilter match {
      case Some(cond) =>
        // remap the key attributes in the predicate to the projection's
        val remapped = cond.transform {
          case a: AttributeReference => byName.getOrElse(a.name, return None)
        }
        org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, projPlan)
      case None => projPlan
    }
    val out = Aggregate(newGrouping, rewritten, newChild)
    // schema must be IDENTICAL (names, types, nullability can widen on
    // sums of partials — back off on any mismatch)
    if (out.schema.fields.map(f => (f.name, f.dataType)).sameElements(
        agg.schema.fields.map(f => (f.name, f.dataType)))) Some(out)
    else None
  }
}
