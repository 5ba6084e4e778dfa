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
    val wantGlobal = spark.read.parquet(liPath)
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n")).collect().toSeq
    val wantDistinct = spark.read.parquet(liPath)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("d"))
      .orderBy("l_returnflag").collect().toSeq
    withProjection(Seq("l_returnflag", "l_linestatus"), Seq("l_quantity")) { dest =>
      val got = spark.read.parquet(liPath)
        .groupBy("l_linestatus").agg(sum("l_quantity").as("s"))
        .orderBy("l_linestatus")
      assert(got.collect().toSeq == want)
      // empty grouping (global aggregate) re-merges too
      val global = spark.read.parquet(liPath)
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      assert(scanPaths(global).exists(_.contains(dest)),
        "global aggregate must be served by the projection")
      assert(global.collect().toSeq == wantGlobal)
      // DISTINCT over projection KEYS is exact on the partials
      val dist = spark.read.parquet(liPath)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_linestatus")).as("d"))
        .orderBy("l_returnflag")
      assert(scanPaths(dist).exists(_.contains(dest)),
        "count distinct over keys must be served by the projection")
      assert(dist.collect().toSeq == wantDistinct)
    }
  }

  test("avg and key-filtered aggregates are served from the partials") {
    val keys = Seq("l_returnflag", "l_linestatus")
    val wantAvg = spark.read.parquet(liPath)
      .groupBy("l_returnflag").agg(avg("l_quantity").as("a"))
      .orderBy("l_returnflag").collect().toSeq
    val wantFiltered = spark.read.parquet(liPath)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect().toSeq
    withProjection(keys, Seq("l_quantity")) { dest =>
      // avg = Σ(partial sums)/Σ(partial non-null counts)
      val avgQ = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(avg("l_quantity").as("a"))
        .orderBy("l_returnflag")
      assert(scanPaths(avgQ).exists(_.contains(dest)),
        "avg over a projected measure must be served by the projection")
      assert(avgQ.collect().toSeq == wantAvg)
      // a filter on projection KEYS commutes with the pre-aggregation
      val filteredQ = spark.read.parquet(liPath)
        .filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
        .orderBy("l_returnflag")
      assert(scanPaths(filteredQ).exists(_.contains(dest)),
        "key-filtered aggregate must be served by the projection")
      assert(filteredQ.collect().toSeq == wantFiltered)
      // but a filter on a MEASURE must not be
      val measureFiltered = spark.read.parquet(liPath)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(!scanPaths(measureFiltered).exists(_.contains(dest)),
        "measure-filtered aggregate must fall through to the base scan")
    }
  }

  test("q_projection_agg is served from its partials, not the base copy") {
    val q = SparkEntry.queries("q_projection_agg")(spark, sf)
    val paths = scanPaths(q)
    assert(paths.nonEmpty && paths.forall(_.contains("_partials")),
      s"the declared projection query must scan the partials: $paths")
    assert(q.count() > 0)
  }

  test("with several projections registered, the narrowest covering one is chosen") {
    val wide = java.nio.file.Files.createTempDirectory("graft_pw").toString
    val narrow = java.nio.file.Files.createTempDirectory("graft_pn").toString
    try {
      plans.Projections.materialize(spark.read.parquet(liPath),
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"), wide)
      plans.Projections.materialize(spark.read.parquet(liPath),
        Seq("l_returnflag"), Seq("l_quantity"), narrow)
      plans.Projections.register(liPath, plans.Projections.ProjectionMeta(
        wide, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity")))
      plans.Projections.register(liPath, plans.Projections.ProjectionMeta(
        narrow, Seq("l_returnflag"), Seq("l_quantity")))
      // covered by both -> the 1-key projection must win
      val q1 = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scanPaths(q1).exists(_.contains(narrow)), s"narrow wins: ${scanPaths(q1)}")
      // needs the status key -> only the wide one covers
      val q2 = spark.read.parquet(liPath)
        .groupBy("l_linestatus").agg(sum("l_quantity").as("s"))
      assert(scanPaths(q2).exists(_.contains(wide)), s"wide covers: ${scanPaths(q2)}")
      // results identical to base either way
      val want = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
        .orderBy("l_returnflag")
      plans.Projections.unregister(liPath)
      assert(q1.orderBy("l_returnflag").collect().toSeq == want.collect().toSeq)
    } finally {
      plans.Projections.unregister(liPath)
      Seq(wide, narrow).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("property: served answers equal base answers across random tables and query shapes") {
    import org.scalacheck.Gen
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rowGen = Gen.listOfN(200, for {
      k1 <- Gen.oneOf("a", "b", "c")
      k2 <- Gen.oneOf("x", "y")
      v1 <- Gen.choose(-50, 50)
      v2 <- Gen.oneOf(Gen.const(Option.empty[Double]),
        Gen.choose(-10.0, 10.0).map(Some(_)))
    } yield (k1, k2, v1.toLong, v2))
    (1 to 5).foreach { trial =>
      val rows = rowGen.apply(org.scalacheck.Gen.Parameters.default
        .withSize(200), org.scalacheck.rng.Seed(trial.toLong)).get
      val baseDir = java.nio.file.Files.createTempDirectory(s"graft_prop$trial").toString + "/t"
      val projDir = baseDir + "_p"
      try {
        rows.toDF("k1", "k2", "v1", "v2").write.parquet(baseDir)
        plans.Projections.materialize(spark.read.parquet(baseDir),
          Seq("k1", "k2"), Seq("v1", "v2"), projDir)
        // ground truth computed from the raw rows in Scala
        def query() = spark.read.parquet(baseDir)
          .groupBy("k1")
          .agg(sum("v1").as("s1"), count(lit(1)).as("n"), avg("v2").as("a2"),
            min("v1").as("m1"), max("v2").as("x2"), count(col("v2")).as("n2"))
          .orderBy("k1")
        val want = query().collect().toSeq
        plans.Projections.register(baseDir,
          plans.Projections.ProjectionMeta(projDir, Seq("k1", "k2"), Seq("v1", "v2")))
        val served = query()
        assert(scanPaths(served).exists(_.contains(projDir)),
          s"trial $trial must be served from the projection")
        val got = served.collect().toSeq
        // avg of doubles reassociates across partials — compare with tolerance
        want.zip(got).foreach { case (w, g) =>
          assert(w.getString(0) == g.getString(0))
          assert(w.getLong(1) == g.getLong(1) && w.getLong(2) == g.getLong(2))
          assert(w.getLong(4) == g.getLong(4) && w.getLong(6) == g.getLong(6))
          (Option(w.get(3)), Option(g.get(3))) match {
            case (Some(a), Some(b)) =>
              assert(math.abs(a.asInstanceOf[Double] - b.asInstanceOf[Double]) < 1e-9,
                s"trial $trial avg: $a vs $b")
            case (a, b) => assert(a == b, s"trial $trial avg nullness: $a vs $b")
          }
          (Option(w.get(5)), Option(g.get(5))) match {
            case (Some(a), Some(b)) => assert(a == b)
            case (a, b) => assert(a == b)
          }
        }
      } finally {
        plans.Projections.unregister(baseDir)
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(baseDir).getParentFile)
      }
    }
  }

  test("a multi-root scan is never rewritten from one root's projection") {
    import spark.implicits._
    // second dataset with the same schema, NOT covered by the projection
    val extra = java.nio.file.Files.createTempDirectory("graft_extra").toString + "/t"
    try {
      spark.read.parquet(liPath).limit(7).write.parquet(extra)
      val want = spark.read.parquet(liPath, extra)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().toSeq
      withProjection(Seq("l_returnflag"), Seq("l_quantity")) { dest =>
        val q = spark.read.parquet(liPath, extra)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
        assert(!scanPaths(q).exists(_.contains(dest)),
          "a scan with an unregistered extra root must not substitute")
        assert(q.collect().toSeq == want,
          "the extra root's rows must be counted")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(extra).getParentFile)
  }

  test("URI-illegal paths and count(NULL) never break or mis-serve") {
    import spark.implicits._
    // a path with a space is not URI-parseable — the rule must not
    // throw from inside the optimizer, registered or not
    val spaced = java.nio.file.Files.createTempDirectory("graft sp").toString + "/a b"
    try {
      Seq(("k", 1L)).toDF("k", "v").write.parquet(spaced)
      val n = spark.read.parquet(spaced).groupBy("k").agg(sum("v")).count()
      assert(n == 1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(spaced).getParentFile)
    // count(<null literal>) counts ZERO rows — must not take the
    // count(*) ≡ Σ _cnt arm
    val want = spark.read.parquet(liPath)
      .groupBy("l_returnflag").agg(count(lit(null)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    withProjection(Seq("l_returnflag"), Seq("l_quantity")) { dest =>
      val q = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(count(lit(null)).as("n"))
        .orderBy("l_returnflag")
      assert(q.collect().toSeq == want, "count(null) must stay zero")
      assert(want.forall(_.getLong(1) == 0L))
    }
  }

  test("non-decomposable or non-covered queries fall through to the base scan") {
    withProjection(Seq("l_returnflag"), Seq("l_quantity")) { dest =>
      // avg over an UNPROJECTED measure -> no rewrite
      val avgQ = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(avg("l_tax").as("a"))
      assert(!scanPaths(avgQ).exists(_.contains(dest)),
        "avg over an unprojected measure must not be served")
      // count(DISTINCT …) is not decomposable from these partials
      val dist = spark.read.parquet(liPath)
        .groupBy("l_returnflag").agg(countDistinct(col("l_quantity")).as("d"))
      assert(!scanPaths(dist).exists(_.contains(dest)),
        "count distinct must not be served by the projection")
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
