package graft.streaming

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Ingestion-time NEAR-duplicate detection — the streaming form of
  * `q_dedup_minhash`, completing the dedup story's streaming half
  * (exact streaming dedup is `SnapshotStream.dedupedEvents`):
  * documents arriving on a stream are checked against every
  * previously-admitted document that shares a MinHash LSH band, and
  * collisions are emitted as a candidate-pair stream for downstream
  * verification (exact re-rank / Jaccard check — same contract as the
  * batch LSH: candidates, not verdicts).
  *
  * Scale shape: the per-key state is ONE representative doc_id per
  * band bucket — O(1), no signature, no member list — so total state
  * is bounded by the number of distinct band keys inside the watermark
  * horizon, evicted by event-time timeout. The shuffle is on the band
  * key, exactly the batch plan's partitioning. A doc colliding in
  * several bands emits one candidate per band (buckets are independent
  * state partitions); consumers dedup pairs, as the batch plan does
  * with `distinct()`.
  */
object StreamDedup {

  final case class BandHit(band_key: Long, doc_id: Long, ts: Timestamp)

  /** Bucket state: the first-admitted doc is the representative every
    * later collider pairs with (the streaming analog of the batch star
    * edge to the bucket minimum — same connectivity, linear pairs).
    */
  final case class Rep(doc_id: Long)

  final case class Candidate(doc_id: Long, dup_of: Long)

  /** LSH candidate pairs for a document stream with columns
    * (doc_id long, ts timestamp, text string). Same signature
    * parameters as the batch `q_dedup_minhash` (16 hashes, 4 bands × 4
    * rows), so a doc pair colliding here is exactly a pair the batch
    * plan would bucket together.
    */
  def nearDupCandidates(
      docs: DataFrame,
      watermarkDelay: String = "1 day",
      horizonMs: Long = 86400000L): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(TextFns.bandKeys(TextFns.minhashSignature(col("text"), 3, 16), 4, 4))
          .as("band_key"))
      .as[BandHit]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[Rep, Candidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[BandHit], state: GroupState[Rep]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // batch arrival order is arbitrary; admit deterministically
            // in (ts, doc_id) order so the representative is stable
            // under any partitioning/scheduling
            val sorted = it.toArray.sortBy(h => (h.ts.getTime, h.doc_id))
            val out = ArrayBuffer.empty[Candidate]
            var rep = state.getOption
            var lastTs = 0L
            sorted.foreach { h =>
              rep match {
                case None =>
                  rep = Some(Rep(h.doc_id))
                case Some(r) if r.doc_id != h.doc_id =>
                  out += Candidate(h.doc_id, r.doc_id)
                case _ => ()
              }
              lastTs = math.max(lastTs, h.ts.getTime)
            }
            state.update(rep.get)
            // evict the representative once the watermark passes the
            // bucket's last activity + the horizon (clamped strictly
            // ahead of the watermark — at-or-behind is rejected)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, lastTs + horizonMs))
            out.iterator
          }
      }
  }
}
