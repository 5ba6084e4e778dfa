package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-interleave kernel identities, and the
  * clustering-quality claim itself — per-file min/max spans contract
  * in BOTH clustered dimensions, where a linear sort leaves the
  * second dimension at (near) full range in every file.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleave: known values, bounds, quadrant locality") {
    val df = spark.range(1).select(
      ZOrder.zValue(Seq(lit(0L), lit(0L)), 8).as("z00"),
      ZOrder.zValue(Seq(lit(1L), lit(0L)), 8).as("z10"),
      ZOrder.zValue(Seq(lit(0L), lit(1L)), 8).as("z01"),
      ZOrder.zValue(Seq(lit(3L), lit(3L)), 8).as("z33"),
      ZOrder.zValue(Seq(lit(255L), lit(255L)), 8).as("zmax"))
    val r = df.head()
    assert(r.getLong(0) == 0L)
    // dim 0 takes even z-bits, dim 1 odd
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 15L)
    assert(r.getLong(4) == (1L << 16) - 1)
    // locality: both coordinates' high bits dominate the z-value, so
    // the four 128-wide quadrants occupy disjoint z-ranges
    val q = spark.range(1).select(
      ZOrder.zValue(Seq(lit(127L), lit(127L)), 8).as("lo"),
      ZOrder.zValue(Seq(lit(128L), lit(128L)), 8).as("hi")).head()
    assert(q.getLong(0) < (1L << 14) && q.getLong(1) >= (3L << 14))
  }

  test("morton interleave is a bijection: de-interleaving recovers every rank pair") {
    import org.scalacheck.Gen
    val pairs = Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L))).sample.get.distinct
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zValue(Seq(col("a"), col("b")), 8).as("z"))
    df.collect().foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      def deinter(off: Int): Long =
        (0 until 8).map(i => ((z >>> (2 * i + off)) & 1L) << i).sum
      assert(deinter(0) == a && deinter(1) == b,
        s"z=$z must de-interleave back to ($a, $b)")
    }
  }

  test("z-order write contracts per-file spans in BOTH dims; linear sort does not") {
    val e = operators.Relational.eventsSec(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "ts_s")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zspec_z").toString
    val lDir = java.nio.file.Files.createTempDirectory("graft_zspec_l").toString
    ZOrder.clusteredWrite(e, zDir, Seq("user_id", "value"), numFiles = 8)
    // the strawman: same file count, linear sort on value only
    e.repartitionByRange(8, col("value")).sortWithinPartitions("value")
      .write.mode("overwrite").parquet(lDir)

    // semantics-neutral: identical row multiset
    val zCnt = spark.read.parquet(zDir).count()
    assert(zCnt == e.count())

    def spans(dir: String): Seq[(Double, Double)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(files.length > 4, s"want several files in $dir")
      files.toSeq.map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(max("user_id") - min("user_id"), max("value") - min("value")).head()
        (r.getLong(0).toDouble, r.getDouble(1))
      }
    }
    val ext = e.agg(
      (max("user_id") - min("user_id")).cast("double"),
      max("value") - min("value")).head()
    val (uidRange, valRange) = (ext.getDouble(0), ext.getDouble(1))

    val z = spans(zDir)
    val l = spans(lDir)
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size
    val zUid = mean(z.map(_._1)) / uidRange
    val zVal = mean(z.map(_._2)) / valRange
    val lUid = mean(l.map(_._1)) / uidRange
    val lVal = mean(l.map(_._2)) / valRange
    info(f"normalized mean file spans — zorder: uid=$zUid%.2f value=$zVal%.2f; " +
      f"linear(value): uid=$lUid%.2f value=$lVal%.2f")
    // z-order: both dims materially narrower than full range
    assert(zUid < 0.7 && zVal < 0.7,
      f"z-order should contract both dims, got uid=$zUid%.2f value=$zVal%.2f")
    // linear sort: its sorted dim is tight but the OTHER dim spans
    // (near) everything — the gap z-ordering exists to close
    assert(lUid > 0.85, f"value-sorted files should span ~all user_ids, got $lUid%.2f")
    assert(zUid < lUid - 0.2, "z-order must beat linear sort on the unsorted dim")
  }
}
