package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming MV loop: partials folded per micro-batch must equal
  * the one-shot batch materialization, and the maintained projection
  * must be servable by the ProjectionRewrite rule end-to-end.
  */
class ProjectionStreamSpec extends SparkSpec {

  private def liPath = s"$sf/lineitem.parquet"
  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity")

  test("stream-maintained covariance moments equal the one-shot pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dest = java.nio.file.Files.createTempDirectory("graft_mom").toString + "/m"
    try {
      val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("embedding").as[Seq[Float]].collect().toSeq
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      val mem = MemoryStream[Seq[Float]]
      val q = streaming.MomentsStream.maintain(
          mem.toDF().toDF("embedding"), dest).start()
      try {
        mem.addData(b1); q.processAllAvailable()
        mem.addData(b2); q.processAllAvailable()
        mem.addData(Seq.empty[Seq[Float]]); q.processAllAvailable() // empty batch no-op
      } finally q.stop()
      val got = streaming.MomentsStream.moments(spark, dest).get
      val want = pipeline.Similarity.embedPcaMoments(spark, sf)
      assert(got.length == want.length)
      // merged raw moments reassociate across the batch split
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
          s"moment drifted: $g vs $w")
      }
      // the live principal axis from the stream matches the batch one
      val (_, _, cg) = functions.CovAgg.covarianceOf(got)
      val (_, _, cw) = functions.CovAgg.covarianceOf(want)
      val (lg, vg) = functions.CovAgg.topEigen(cg)
      val (lw, vw) = functions.CovAgg.topEigen(cw)
      assert(math.abs(lg - lw) < 1e-6 * math.max(1.0, lw))
      vg.zip(vw).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dest).getParentFile)
  }

  test("a replayed batch id is a no-op — sums never double-count") {
    import spark.implicits._
    val dest = java.nio.file.Files.createTempDirectory("graft_psr").toString + "/proj"
    try {
      val b1 = Seq(("A", "x", 1.0), ("A", "x", 2.0), ("B", "y", 3.0))
        .toDF("l_returnflag", "l_linestatus", "l_quantity")
      val b2 = Seq(("A", "x", 10.0)).toDF("l_returnflag", "l_linestatus", "l_quantity")
      streaming.ProjectionStream.mergeBatch(b1, keys, measures, dest, batchId = 0)
      streaming.ProjectionStream.mergeBatch(b1, keys, measures, dest, batchId = 0) // replay
      streaming.ProjectionStream.mergeBatch(b2, keys, measures, dest, batchId = 1)
      streaming.ProjectionStream.mergeBatch(b2, keys, measures, dest, batchId = 1) // replay
      val got = spark.read.parquet(dest)
        .select("l_returnflag", "_cnt", "_sum_l_quantity")
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == Seq(("A", 3L, 13.0), ("B", 1L, 3.0)),
        s"replays must not double-count: $got")
      assert(streaming.ProjectionStream.mergedBatchId(dest) == 1L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dest).getParentFile)
  }

  test("stream-maintained partials equal the one-shot materialization and serve queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dest = java.nio.file.Files.createTempDirectory("graft_psd").toString + "/proj"
    val oneShot = java.nio.file.Files.createTempDirectory("graft_pso").toString
    try {
      val rows = spark.read.parquet(liPath)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .as[(String, String, Double)].collect().toSeq
      val (b1, b2) = rows.splitAt(rows.length / 2)

      val mem = MemoryStream[(String, String, Double)]
      val q = streaming.ProjectionStream.maintain(
          mem.toDF().toDF("l_returnflag", "l_linestatus", "l_quantity"),
          keys, measures, dest)
        .start()
      try {
        mem.addData(b1); q.processAllAvailable()
        mem.addData(b2); q.processAllAvailable()
      } finally q.stop()

      plans.Projections.materialize(
        spark.read.parquet(liPath), keys, measures, oneShot)
      val got = spark.read.parquet(dest)
        .orderBy(keys.map(col): _*).collect().toSeq
      val want = spark.read.parquet(oneShot)
        .select(spark.read.parquet(dest).columns.map(col): _*)
        .orderBy(keys.map(col): _*).collect().toSeq
      assert(got.length == want.length, s"${got.length} vs ${want.length} key rows")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) == w.getString(0) && g.getString(1) == w.getString(1))
        assert(g.getLong(g.fieldIndex("_cnt")) == w.getLong(w.fieldIndex("_cnt")))
        assert(g.getLong(g.fieldIndex("_cnt_l_quantity"))
          == w.getLong(w.fieldIndex("_cnt_l_quantity")))
        assert(g.getDouble(g.fieldIndex("_min_l_quantity"))
          == w.getDouble(w.fieldIndex("_min_l_quantity")))
        assert(g.getDouble(g.fieldIndex("_max_l_quantity"))
          == w.getDouble(w.fieldIndex("_max_l_quantity")))
        // partial sums associate differently across batch splits —
        // equal to within fp reassociation
        assert(math.abs(g.getDouble(g.fieldIndex("_sum_l_quantity"))
          - w.getDouble(w.fieldIndex("_sum_l_quantity"))) < 1e-6)
      }

      // the maintained projection is immediately servable: register it
      // and a base-table aggregate silently re-aggregates the partials
      plans.Projections.register(liPath,
        plans.Projections.ProjectionMeta(dest, keys, measures))
      try {
        val served = spark.read.parquet(liPath)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
        val scans = served.queryExecution.optimizedPlan.collect {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
              fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
              _, _, _, _) => fs.location.rootPaths.map(_.toString)
        }.flatten
        assert(scans.exists(_.contains(dest)),
          s"query must scan the stream-maintained projection: $scans")
        val wantCounts = spark.read.parquet(liPath)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
        plans.Projections.unregister(liPath)
        assert(served.collect().toSeq == wantCounts.collect().toSeq)
      } finally plans.Projections.unregister(liPath)
    } finally {
      Seq(new java.io.File(dest).getParentFile, new java.io.File(oneShot))
        .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
    }
  }
}
