package graft.plans

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked surface for the projection substitution: the query
  * aggregates a base table whose registered projection MUST serve it
  * (ProjectionSpec pins the plan), and the DuckDB oracle runs the
  * plain SQL on the raw rows — identical answers prove the partial
  * re-aggregation is semantics-preserving end-to-end.
  *
  * The base is a 3-column COPY of lineitem in the session temp dir,
  * not the fixture path itself: the projection catalog is session-
  * global, and registering the shared fixture would silently reroute
  * every other lineitem aggregate in the suite. The copy + partials
  * materialize once per (tmpdir, sf) and are reused.
  */
object ProjectionQueries extends QueryModule {

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity")

  /** Copy-once + materialize-once, keyed by the sf dir. */
  private def ensure(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val base = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_proj_base_" + Integer.toHexString(dir.hashCode)).toString
    val proj = base + "_partials"
    if (!new java.io.File(base).exists()) {
      Tables(s, dir, "lineitem")
        .select((keys ++ measures).map(col): _*)
        .write.mode("overwrite").parquet(base)
      Projections.materialize(s.read.parquet(base), keys, measures, proj)
    }
    Projections.register(base, Projections.ProjectionMeta(proj, keys, measures))
    base
  }

  def entries: Map[String, QueryDef] = Map(

    // ClickHouse `ADD PROJECTION` end-to-end ([CH]): a key-filtered
    // multi-aggregate (sum/count/avg/min/max) that the ProjectionRewrite
    // serves from the per-key partials — the scan reads the key-domain
    // parquet, never the fact rows, and the oracle's raw-row answer
    // must match bit-for-bit after the standard 4-decimal rounding.
    // l_quantity is integer-valued, so partial sums are exact doubles
    // and avg = Σsums/Σcounts is the same division on both engines.
    "q_projection_agg" -> QueryDef(
      (s, dir) => {
        val base = ensure(s, dir)
        s.read.parquet(base)
          .filter(col("l_linestatus") === "F")
          .groupBy("l_returnflag")
          .agg(
            round(sum("l_quantity"), 4).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty
             |FROM lineitem WHERE l_linestatus = 'F'
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)))
}
