package graft.streaming

import graft.pipeline.{KMeans, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental vector-index maintenance — the streaming half of the
  * ANN story (batch build: `Similarity.buildIvfIndex` / `pqCodes`):
  * vectors arriving on a stream are assigned their IVF cell and
  * PQ-encoded with FROZEN models, so new data becomes searchable
  * without refitting anything and without touching the existing
  * index. This is how a 100 TB corpus actually operates: codebooks
  * and the coarse quantizer are fit once per index generation (model
  * state, a few KB), then ingestion is a pure append of
  * (vec_id, cluster_id, code) rows partitioned by cell — the search
  * path (`annTopKIndexed` partition pruning, ADC over codes) reads
  * stream-appended and batch-built rows identically.
  *
  * Scale shape: stateless per-row projection — the models ride as
  * codegen reference objects (no join, no state store, no shuffle
  * before the partitioned sink). Drift is the operational caveat:
  * when the arriving distribution walks away from the frozen
  * centroids, cells skew; the moments drift monitor
  * ([[MomentsStream]]) is the alarm that triggers a re-fit, which
  * writes the NEXT index generation while this one keeps serving.
  */
object StreamIndexer {

  /** Encode a (micro-)batch or stream of (vec_id, embedding) rows
    * with frozen models. Pure projection — works identically on a
    * static DataFrame and a streaming one (the spec pins stream ≡
    * batch on the fixture corpus).
    */
  def encoded(vecs: DataFrame, coarse: KMeans.Model,
      books: Array[KMeans.Model]): DataFrame =
    vecs.select(col("vec_id"),
      coarse.assignCol(col("embedding")).as("cluster_id"),
      Similarity.pqPacked(books,
        Similarity.pqNormalizedCol(col("embedding"))).as("code"))
}
