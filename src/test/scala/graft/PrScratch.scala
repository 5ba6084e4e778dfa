package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the r8 verdict's PageRank item 5: does
  * pre-bucketing the persisted edge list on `src`
  * (Sources.writeBucketed) beat the in-memory persisted edge cache
  * across the 8 iterations? Run manually:
  *
  *   sbt -batch "Test/runMain graft.PrScratch [reps]"
  *
  * A = the declared q_pagerank (persisted edge cache).
  * B = bucketed-edge variant, bucket-table WRITE INCLUDED (the
  *     honest-cold per-invocation cost the declared query would pay).
  * C = bucketed-edge variant, read-only (the amortized steady state —
  *     what a standing corpus snapshot with a maintained edge index
  *     would see).
  * Alternating reps in one warmed JVM; compare medians (the playbook
  * discipline: never conclude from one-shot timings).
  */
object PrScratch {

  private val sf = "/root/testdata/sf0.1"

  private def edgesWithDeg(s: SparkSession): DataFrame = {
    val li = Tables(s, sf, "lineitem")
      .select(col("l_orderkey").as("ok"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
    val ord = Tables(s, sf, "orders")
      .select(col("o_orderkey").as("ok"),
        (col("o_custkey") * 2).cast("long").as("a"))
    val e0 = li.join(ord, "ok")
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
    edges.join(deg, "src")
  }

  /** The 8-iteration body over whichever edge relation is handed in,
    * with the declared query's 2-round persist stride.
    */
  private def iterate(s: SparkSession, edgesW: DataFrame): Long = {
    var ranks = edgesW.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("r"))
    var prevCache: Option[DataFrame] = None
    (1 to 8).foreach { i =>
      ranks = edgesW
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg((lit(0.15) + lit(0.85) * sum(col("r") / col("deg"))).as("r"))
        .withColumnRenamed("dst", "node")
      if (i % 2 == 0) {
        val c = ranks.persist(); c.count()
        prevCache.foreach(_.unpersist(blocking = false))
        prevCache = Some(c); ranks = c
      }
    }
    val n = ranks.orderBy(col("r").desc).limit(20).collect().length.toLong
    prevCache.foreach(_.unpersist(blocking = false))
    n
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val s = Graft.builder("pr-scratch", Some("local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("pr_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // warmup: one full declared run
    SparkEntry.queries("q_pagerank")(s, sf).collect()

    def runA(): Double = timed {
      SparkEntry.queries("q_pagerank")(s, sf).collect()
    }
    def runB(): Double = timed {
      operators.Sources.writeBucketed(edgesWithDeg(s), "pr_edges_ab", "src", 32)
      iterate(s, s.table("pr_edges_ab"))
    }
    def runC(): Double = timed { iterate(s, s.table("pr_edges_ab")) }

    val (as, bs, cs) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double]())
    (1 to reps).foreach { r =>
      as += runA(); bs += runB(); cs += runC()
      println(f"rep $r: A=${as.last}%.2f B=${bs.last}%.2f C=${cs.last}%.2f " +
        s"load=${java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0)}")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.length / 2)
    println(f"MEDIANS A(declared)=${med(as.toSeq)}%.2f " +
      f"B(bucketed+write)=${med(bs.toSeq)}%.2f C(bucketed read-only)=${med(cs.toSeq)}%.2f")
    s.stop()
  }
}
