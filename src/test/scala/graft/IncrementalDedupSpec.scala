package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The daily-ingest dedup shape: new documents deduped against a
  * materialized signature index. Bucket construction is shared with
  * the batch query, so the contract is exact — the incremental result
  * IS the batch result restricted to pairs whose newer side is in the
  * batch, with the standing corpus's text never re-read.
  */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental candidates equal the batch query restricted to new-side pairs") {
    val indexDir = Files.createTempDirectory("graft-sigidx").toString + "/sigs"
    pipeline.Dedup.buildSigIndex(spark, sf, indexDir)
    val split = 250L // fixture doc_ids run 0..499: a half-corpus "day"
    val inc = pipeline.Dedup.incrementalCandidates(spark, sf, indexDir, split)
    val full = pipeline.Dedup.batchCandidates(spark, sf)
      .filter(col("doc_b") >= split)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental pairs must equal the batch pairs with a new-side doc")
    assert(inc.count() == full.count())
    assert(inc.filter(col("doc_b") < split).isEmpty,
      "no corpus-by-corpus pair may be recomputed")
  }
}
