package graft

import org.apache.spark.sql.functions._

/** The ClickHouse-projection substitution (plans.Projections): a
  * registered pre-aggregate must answer matching queries from the
  * projection parquet — silently, with identical results — and must
  * back off for anything it cannot serve exactly.
  */
class ProjectionSpec extends SparkSpec {

  private def liPath = s"$sf/lineitem.parquet"

  /** Root paths of every parquet relation in the optimized plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten

  private def withProjection[A](keys: Seq[String], measures: Seq[String])(
      body: String => A): A = {
    val dest = java.nio.file.Files.createTempDirectory("graft_proj").toString
    try {
      plans.Projections.materialize(
        spark.read.parquet(liPath), keys, measures, dest)
      plans.Projections.register(liPath,
        plans.Projections.ProjectionMeta(dest, keys, measures))
      body(dest)
    } finally {
      plans.Projections.unregister(liPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dest))
    }
  }

  test("matching aggregates are answered from the projection, identically") {
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity", "l_extendedprice")
    // ground truth BEFORE registration — guaranteed base-scan numbers
    val want = spark.read.parquet(liPath)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"),
        count(col("l_quantity")).as("nq"))
      .orderBy("l_returnflag").collect().toSeq
    withProjection(keys, measures) { dest =>
      val q = spark.read.parquet(liPath)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"),
          min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"),
          count(col("l_quantity")).as("nq"))
        .orderBy("l_returnflag")
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(dest)),
        s"query must scan the projection, not the base: $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"base scan must be fully substituted: $paths")
      assert(q.collect().toSeq == want,
        "projection answer must equal the base-scan answer")
    }
  }

  test("grouping by a key subset re-merges the partials correctly") {
    // projection keyed by (flag, status); query groups by status only
    val want = spark.read.parquet(liPath)
      .groupBy("l_linestatus").agg(sum("l_quantity").as("s"))
      .orderBy("l_linestatus").collect().toSeq
    withProjection(Seq("l_returnflag", "l_linestatus"), Seq("l_quantity")) { _ =>
      val got = spark.read.parquet(liPath)
        .groupBy("l_linestatus").agg(sum("l_quantity").as("s"))
        .orderBy("l_linestatus")
      assert(got.collect().toSeq == want)
    }
  }

  test("non-decomposable or non-covered queries fall through to the base scan") {
    withProjection(Seq("l_returnflag"), Seq("l_quantity")) { dest =>
      // avg is not stored as a partial -> no rewrite
      val avgQ = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(avg("l_quantity").as("a"))
      assert(!scanPaths(avgQ).exists(_.contains(dest)),
        "avg must not be served by the projection")
      // grouping key not in the projection -> no rewrite
      val otherKey = spark.read.parquet(liPath)
        .groupBy("l_linestatus").agg(sum("l_quantity").as("s"))
      assert(!scanPaths(otherKey).exists(_.contains(dest)),
        "uncovered grouping key must not be served by the projection")
      // measure not projected -> no rewrite
      val otherMeasure = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(sum("l_tax").as("s"))
      assert(!scanPaths(otherMeasure).exists(_.contains(dest)),
        "unprojected measure must not be served by the projection")
      // filtered query -> no rewrite (v1 matches bare aggregates only)
      val filtered = spark.read.parquet(liPath)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(!scanPaths(filtered).exists(_.contains(dest)),
        "filtered aggregate must not be served by the projection")
    }
    val q = spark.read.parquet(liPath)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
    assert(scanPaths(q).exists(_.contains("lineitem.parquet")),
      "after unregister the base scan returns")
  }
}
