package graft

import graft.functions.HistogramAgg
import org.apache.spark.sql.functions._

/** The adaptive histogram against its exact reference: on data whose
  * modes are well separated, the n-bin adaptive result must recover
  * each mode's exact count and bounds (the fixed-bin groupBy is the
  * ground truth), conserve total weight, and do so under any
  * partitioning of the input.
  */
class HistogramSpec extends SparkSpec {

  test("recovers well-separated clusters exactly, under any partitioning") {
    import spark.implicits._
    // three tight clusters around 10, 500, 9000 — gaps far exceed
    // intra-cluster spread, so compaction can only merge within modes
    val vals = (1 to 40).map(i => 10.0 + (i % 5) * 0.1) ++
      (1 to 25).map(i => 500.0 + (i % 7) * 0.2) ++
      (1 to 35).map(i => 9000.0 + (i % 3) * 0.5)
    val want = Map( // exact per-cluster (count, lo, hi)
      0 -> ((40L, 10.0, 10.4)),
      1 -> ((25L, 500.0, 501.2)),
      2 -> ((35L, 9000.0, 9001.0)))
    for (parts <- Seq(1, 8)) {
      val bins = vals.toDF("v").repartition(parts)
        .agg(HistogramAgg(col("v"), 3).as("bins"))
        .select(explode(col("bins")).as("b"))
        .select("b.lower", "b.upper", "b.count")
        .orderBy("lower")
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
      assert(bins.length == 3, s"parts=$parts: ${bins.toSeq}")
      want.foreach { case (i, (n, lo, hi)) =>
        assert(bins(i)._3 == n && bins(i)._1 == lo && bins(i)._2 == hi,
          s"parts=$parts bin $i: got ${bins(i)}, want ($lo,$hi,$n)")
      }
    }
  }

  test("conserves total weight and emits exactly n bins on the live fixture") {
    val orders = Tables(spark, sf, "orders")
    val total = orders.count()
    val bins = SparkEntry.queries("q_agg_histogram_adaptive")(spark, sf).collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(3)).sum == total, "merges must never lose weight")
    // rows come out in bin-index order (mean order by construction);
    // [lo, hi] spans of adjacent bins may legitimately overlap, so the
    // index — not bin_lower — is the ordering contract
    assert(bins.map(_.getLong(0)).sameElements(0L until 10L))
    // every bound sits inside the global value range
    val (mn, mx) = (bins.map(_.getDouble(1)).min, bins.map(_.getDouble(2)).max)
    val range = orders.agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
    assert(mn >= range.getDouble(0) - 1e-4 && mx <= range.getDouble(1) + 1e-4)
  }

  test("agrees with the exact fixed-bin histogram when modes sit in distinct fixed bins") {
    import spark.implicits._
    // clusters inside fixed bins [0,100) and [300,400): the adaptive
    // 2-bin result must reproduce the exact fixed-bin counts
    val vals = (1 to 30).map(i => 40.0 + i % 3) ++ (1 to 50).map(i => 350.0 + i % 4)
    val df = vals.toDF("v")
    val exact = df.select(floor(col("v") / 100.0).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin").collect().map(_.getLong(1))
    val adaptive = df.agg(HistogramAgg(col("v"), 2).as("bins"))
      .select(explode(col("bins")).as("b")).select("b.count")
      .collect().map(_.getLong(0))
    assert(adaptive.sameElements(exact), s"adaptive ${adaptive.toSeq} vs exact ${exact.toSeq}")
  }

  test("fold-twin grid precondition: all 53 residues populated at both fixture SFs") {
    // the generated 43-stage oracle hardcodes G = 53 initial bins; an
    // empty residue would shift every stage
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val g = Tables(spark, dir, "orders")
        .select((floor(col("o_totalprice") / 100).cast("long")
          % operators.Aggregates.HistFoldGrid).as("v"))
        .distinct().count()
      assert(g == operators.Aggregates.HistFoldGrid.toLong,
        s"$dir populates $g of ${operators.Aggregates.HistFoldGrid} residues")
    }
  }

  test("declared HOF fold ≡ the kernel's own canonical compact()") {
    // q_agg_histogram_fold's SQL-lambda walk must be the SAME
    // arithmetic as HistogramAgg.compact run once in sorted order —
    // pinned against the in-process kernel, unrounded
    val grid = Tables(spark, sf, "orders")
      .select((floor(col("o_totalprice") / 100).cast("long")
        % operators.Aggregates.HistFoldGrid).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1))).toSeq
    // HALF_UP like Spark's round(), not math.rint's half-even: on the
    // mod-53 grid every lo/hi is an exact integer so they agree, but
    // the kernel side must not mask a .00005-boundary divergence if
    // the grid ever changes (r9 ADVICE item 2)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kernel = HistogramAgg
      .canonicalCompact(grid, operators.Aggregates.HistFoldBins)
      .zipWithIndex.map { case (b, i) =>
        (i.toLong, r4(b.lower), r4(b.upper), b.count)
      }
    val declared = SparkEntry.queries("q_agg_histogram_fold")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(declared == kernel,
      s"declared fold ${declared.take(3)}… diverged from the kernel ${kernel.take(3)}…")
  }
}
