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
  * per batch. The IVF variant prunes: assign the corpus to coarse
  * cells (here the fixture's own cluster labels; a production build
  * runs k-means once), pick the nProbe nearest centroids per query,
  * and scan only those cells — at scale the cell assignment is the
  * partition key, so pruning happens at the shuffle/scan level.
  */
object Similarity extends QueryModule {

  /** Per-label centroids: posexplode → per-(label, dim) mean →
    * re-assemble ordered arrays. Two small shuffles, output = one row
    * per label — broadcastable at any corpus size.
    */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v")).as("mean_v"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v")))).as("pm"))
      .select(col("label"), transform(col("pm"), p => p.getField("mean_v")).as("centroid"))

  /** Two-stage IVF search: rank cells by query↔centroid similarity,
    * scan only the nProbe best cells for the true top-k. The cell
    * assignment (label) is the partition key at scale — pruning skips
    * whole partitions, not just rows.
    */
  def annTopK(s: SparkSession, dir: String, nProbe: Int, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val cents = centroids(emb)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("label").asc)
    val probes = queries.join(broadcast(cents))
      .withColumn("c_sim", round(Vectors.cosine(col("q_emb"), col("centroid")), 6))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), Vectors.norm(col("q_emb")).as("q_nrm"), col("label"))
    // corpus norm below the join: once per vector, not per (q, vector)
    val scored = emb.select(col("vec_id"), col("label"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm"))
      .join(broadcast(probes), Seq("label"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", round(
        Vectors.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 4))
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("label"), col("cos_sim"))
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
