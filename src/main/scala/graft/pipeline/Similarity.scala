package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.J):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * two-stage search as the 100 TB path.
  *
  * Brute force is O(|queries| · |corpus|) — correct, and fine when the
  * query set is small and broadcastable, but it scans the whole corpus
  * per batch. The IVF variant prunes: a [[KMeans]] coarse quantizer
  * (fit once per corpus snapshot — the index build) assigns the corpus
  * to cells, each query probes only its nProbe nearest centroids, and
  * only those cells are scanned — at scale the cell assignment is the
  * partition key, so pruning skips whole partitions at the scan, not
  * rows after it.
  */
object Similarity extends QueryModule {

  /** IVF cell count for the declared queries; the all-cells probe
    * (`nProbe = AnnCells`) must reproduce exact brute force, which the
    * PipelineSpec asserts.
    */
  val AnnCells = 10

  /** "Fit once per corpus snapshot" made literal: the quantizer model
    * is memoized per corpus dir, so repeated query construction (plan
    * dumps, test suites, repeated searches) reuses the index instead of
    * refitting — and building the DataFrame stays cheap after the
    * first call.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, KMeans.Model]()

  private def fittedModel(emb: DataFrame, dir: String): KMeans.Model =
    modelCache.computeIfAbsent(s"$dir#$AnnCells",
      _ => KMeans.fit(emb, "embedding", "vec_id", AnnCells, iters = 3))

  /** Two-stage IVF search: fit the coarse quantizer, rank cells by
    * query↔centroid similarity, scan only the nProbe best cells for
    * the true top-k. In production the model is fit once per corpus
    * snapshot and the corpus is written partitioned by `cluster_id`;
    * here the fit (a few small Lloyd rounds) runs inline, memoized per
    * corpus dir.
    */
  def annTopK(s: SparkSession, dir: String, nProbe: Int, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val model = fittedModel(emb, dir)
    val cents = model.toDf(emb)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cluster_id").asc)
    val probes = queries.join(broadcast(cents))
      .withColumn("c_sim", round(Vectors.cosine(col("q_emb"), col("centroid")), 6))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), Vectors.norm(col("q_emb")).as("q_nrm"),
        col("cluster_id"))
    // corpus norm + cell id below the join: once per vector, not per
    // (q, vector) — the assignment is k native dot products per row
    val scored = emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm"),
        model.assignCol(col("embedding")).as("cluster_id"))
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", round(
        Vectors.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 4))
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        col("cluster_id").cast("long").as("cell"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    // Rank on the rounded score with an id tie-break so ranks are
    // deterministic (and engine-independent for the oracle variant).
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  def entries: Map[String, QueryDef] = Map(

    // Exact brute-force cosine top-5 for 10 query vectors. The query
    // side is tiny → Spark broadcasts it; the corpus is scanned once,
    // scored in codegen, and reduced via per-group top-k (window +
    // filter, no global sort).
    "q_sim_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            Vectors.norm(col("embedding")).as("q_nrm"))
        val scored = emb.select(col("vec_id"), col("embedding"),
            Vectors.norm(col("embedding")).as("c_nrm"))
          .join(broadcast(queries))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos_sim", round(
            Vectors.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 4))
        rankTopK(scored, 5)
          .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH scored AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
             |SELECT q_id, rank, vec_id, cos_sim FROM (
             |  SELECT q_id, vec_id, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id ASC) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // IVF-style ANN, nProbe=2 of 10 cells. Approximate (recall < 1
    // when the true neighbor lives in a pruned cell) ⇒ no oracle; the
    // ScalaTest spec checks that probing ALL cells reproduces the
    // exact brute-force result, plus a recall floor at nProbe=2.
    "q_sim_ann" -> QueryDef(
      (s, dir) => annTopK(s, dir, nProbe = 2, k = 5), None)
  )
}
