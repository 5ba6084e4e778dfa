package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Adversarial convergence test for q_dedup_cluster: the fixture's
  * duplicate clusters have diameter ≤ 2, so the oracle never exercises
  * deep propagation. A 12-doc chain — consecutive docs alternately
  * sharing a 10-word prefix or suffix — has diameter 11, forcing ~11
  * hash-to-min rounds before the fixpoint: the loop's convergence
  * detection, per-round checkpointing, and label correctness all have
  * to hold well past the shapes the oracle covers.
  */
class ClusterChainSpec extends SparkSpec {

  test("label propagation resolves a diameter-11 prefix/suffix chain to one cluster") {
    import spark.implicits._
    def block(tag: String): String = (1 to 10).map(i => s"$tag-$i").mkString(" ")
    val n = 12
    // docs 2k and 2k+1 share prefix p(k); docs 2k+1 and 2k+2 share
    // suffix s(k+1) — a path, never a clique
    val chain = (0 until n).map { i =>
      (i.toLong, s"${block(s"p${i / 2}")} ${block(s"m$i")} ${block(s"s${(i + 1) / 2}")}",
        "en", "src0", 0L)
    }
    val isolated = Seq((100L, s"${block("x")} ${block("y")} ${block("z")}", "en", "src1", 0L))
    val dir = Files.createTempDirectory("graft-chain").toString
    (chain ++ isolated).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    val inChain = got.filter(_._1 < 100L)
    assert(inChain.length == n)
    assert(inChain.forall(_._2 == 0L), s"all chain labels must reach doc 0: ${inChain.toSeq}")
    assert(inChain.forall(_._3 == n.toLong))
    assert(inChain.filter(_._4).map(_._1).toSeq == Seq(0L), "exactly one keeper, the minimum")
    assert(got.find(_._1 == 100L).contains((100L, 100L, 1L, true)),
      "an unconnected doc must be its own singleton cluster")
  }
}
