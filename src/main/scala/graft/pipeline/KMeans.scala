package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the coarse
  * quantizer for IVF-style ANN (SURVEY.md §2.J `q_sim_ann`).
  *
  * Scale shape (the same as Spark MLlib's implementation, re-expressed
  * relationally):
  *  - the MODEL (k × dim doubles) lives on the driver and is broadcast
  *    into each assignment pass as literals — model state, not data;
  *  - ASSIGNMENT is one narrow projection per pass: argmin over k
  *    native dot products ([[Vectors.dot]], codegen'd), no shuffle, no
  *    UDF. `argmin_j |v - c_j|²` reduces to `argmin_j (|c_j|² - 2v·c_j)`
  *    — `|v|²` is constant per row, and `|c_j|²` is precomputed on the
  *    driver, so each row costs exactly k dot products;
  *  - the UPDATE step is two small shuffles (explode → per-(cluster,
  *    dim) mean), output k × dim rows — collected to the driver as the
  *    next model. Nothing row-scale ever reaches the driver.
  *
  * Iteration count is a fixed small budget (Lloyd's converges fast for
  * coarse quantization; IVF needs balanced-ish cells, not optimality).
  * Determinism: init picks the k rows with the smallest xxhash64(id)
  * (seeded, stable), ties in assignment break toward the lower cluster
  * id via the struct ordering of `array_min`.
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length

    /** The argmin-assignment column: nearest centroid id for `vec`, as
      * one native kernel call per row ([[graft.expressions.NearestCentroid]]).
      * The model rides along as a codegen reference object, so Lloyd
      * iterations reuse the cached generated code and the plan stays
      * O(1) size at any cell count.
      */
    def assignCol(vec: Column): Column =
      graft.expressions.VectorExprs.nearestCentroid(vec, centroids)

    /** Centroids as a DataFrame (cluster_id, centroid) for plan-side
      * joins (probe ranking); k rows — always broadcastable.
      */
    def toDf(df: DataFrame): DataFrame = {
      val rows = centroids.zipWithIndex.map { case (c, j) => (j, c.toSeq) }
      df.sparkSession.createDataFrame(rows).toDF("cluster_id", "centroid")
    }
  }

  /** Deterministic init: the k vectors with the smallest hash of their
    * id — a stable pseudo-random sample, no RNG state. The hash is the
    * repo's cross-engine one (first 60 md5 bits as an integer — the
    * q_sim_lsh/winnow discipline, exactly `('0x' ||
    * substring(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT` in DuckDB),
    * NOT xxhash64: since r8 the PQ code oracle re-derives the whole
    * Lloyd fit in SQL, and the init ordering must be derivable there
    * too.
    */
  private[pipeline] def initHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  private def init(emb: DataFrame, vecCol: String, idCol: String, k: Int): Model =
    Model(emb
      .orderBy(initHash(col(idCol)), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray))

  /** Fit by `iters` Lloyd rounds. Empty clusters keep their previous
    * centroid (they can re-acquire members as others move).
    *
    * The update step is ONE map-side-combined aggregation via the
    * typed vector-mean Aggregator ([[graft.functions.VecMeanAgg]]):
    * the shuffle carries k × (dim+1) doubles of partial state total —
    * not the 64-rows-per-vector a posexplode formulation pushes
    * through the exchange.
    */
  def fit(emb: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int): Model = {
    var model = init(emb, vecCol, idCol, k)
    var it = 0
    while (it < iters) {
      val means = emb
        .select(model.assignCol(col(vecCol)).as("cluster_id"), col(vecCol))
        .groupBy("cluster_id")
        .agg(graft.functions.VecMeanAgg(col(vecCol)).as("centroid"))
        .collect()
      val next = model.centroids.map(_.clone())
      means.foreach { r =>
        val c = r.getSeq[Double](1)
        if (c.nonEmpty) next(r.getInt(0)) = c.toArray
      }
      model = Model(next)
      it += 1
    }
    model
  }
}
