package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks (SURVEY.md §2.J, [NS]): tokenization,
  * shingling, MinHash signatures, SimHash — all as higher-order-function
  * compositions over built-ins. No UDFs: every transform here stays
  * inside whole-stage codegen and is usable at 100 TB without a
  * serialization boundary.
  */
object TextFns {

  /** Whitespace tokens (the fixture `documents.text` is space-separated). */
  def words(text: Column): Column = split(text, " ")

  /** Lowercase, collapse whitespace, strip non-alphanumerics — the
    * canonical form used for content fingerprints and exact dedup.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint: md5 of the normalized text (md5 produces the
    * same lowercase hex in Spark and DuckDB — oracle-safe).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** n-word shingles. Docs shorter than n shingle into their full text
    * so no document maps to an empty set.
    */
  def shingles(ws: Column, n: Int): Column = {
    val joined = array(array_join(ws, " "))
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(joined)
  }

  /** 64-bit hashes of the distinct shingles of a document. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(array_distinct(shingles(words(text), n)), s => xxhash64(s))

  /** MinHash signature over a document's n-word shingles, as one native
    * fused kernel per row ([[graft.expressions.MinHashWords]]). The HOF
    * formulation ([[minhashSignatureHof]]) evaluates |shingles|·k
    * interpreted lambda calls per row — the kernel is the same hashes
    * (seeded xxhash64, permutation i = xxhash64(i, shingleHash)) in one
    * primitive loop, bit-identical (PipelineSpec cross-checks).
    */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    graft.expressions.TextExprs.minhashWords(words(text), n, k)

  /** HOF-only formulation of [[minhashSignature]] (same values,
    * interpreted): permutation i is the seeded rehash
    * xxhash64(i, shingleHash) (a linear a·x+b (mod p) family overflows
    * under ANSI arithmetic; seeded xxhash64 is overflow-free and at
    * least as well-mixed). Computed entirely per-row (the shingle set
    * is an array column) — no aggregation state, trivially parallel.
    *
    * ONE fold over the hashes, not k independent array_min passes:
    * Catalyst's project-collapse inlines a referenced column expression
    * at every use site, so k passes would rebuild the shingle array k
    * times (measured 100× slowdown at sf0.1).
    */
  def minhashSignatureHof(hashes: Column, k: Int): Column =
    aggregate(
      hashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(i, h)),
        (a, b) => least(a, b)))

  /** LSH band keys: the signature split into `bands` contiguous rows of
    * equal size, each band hashed to one bucket key. Two docs collide in
    * a band iff that slice of their signatures is identical.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, concat_ws(",",
        (1 to rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r)): _*)))

  /** Winnowed rolling-hash fingerprint set (MOSS winnowing — see
    * [[graft.expressions.TextKernels.winnow]]): any shared substring of
    * length ≥ k+w−1 guarantees a shared fingerprint, so equality on an
    * exploded fingerprint is a complete candidate generator for
    * substring-level near-duplication (vs MinHash's set-level Jaccard).
    */
  def winnowFingerprints(text: Column, k: Int = 16, w: Int = 8): Column =
    graft.expressions.TextExprs.winnowFp(text, k, w)

  /** 64-bit SimHash over the word multiset, as one native fused kernel
    * per row ([[graft.expressions.SimHashWords]]) — bit-identical to
    * the HOF form [[simhashExpr]], which costs 64·|words| interpreted
    * lambda calls per row.
    */
  def simhash(text: Column): Column =
    graft.expressions.TextExprs.simhashWords(words(text))

  /** HOF-only formulation of [[simhash]] (same values, interpreted).
    * Bit arithmetic with a
    * variable shift needs the SQL form (`functions.shiftright` takes a
    * literal only), hence `expr` over a fixed input column name `wh`
    * (array of word hashes).
    *
    * Single fold over `wh` building the 64 bit-votes at once, then one
    * pass packing votes into bits — referencing `wh` inside a per-bit
    * aggregate would inline (and recompute) the word-hash array 64×.
    */
  val simhashExpr: String =
    """aggregate(
      |  aggregate(
      |    wh,
      |    array_repeat(CAST(0 AS BIGINT), 64),
      |    (acc, h) -> zip_with(acc,
      |      transform(sequence(0, 63), i -> IF((h >> i) & 1 = 1, 1, -1)),
      |      (a, b) -> a + b)),
      |  named_struct('i', 0, 'sh', CAST(0 AS BIGINT)),
      |  (st, v) -> named_struct(
      |    'i', st.i + 1,
      |    'sh', st.sh + IF(v > 0, shiftleft(CAST(1 AS BIGINT), st.i), CAST(0 AS BIGINT))),
      |  st -> st.sh)""".stripMargin

  /** The 4 × 16-bit chunks of a SimHash — pigeonhole LSH: two hashes
    * within Hamming distance 3 share at least one identical chunk.
    * SQL form (variable shift); input column must be named `sh`.
    */
  val simhashChunksExpr: String =
    "transform(sequence(0, 3), j -> (sh >> (j * 16)) & 65535)"

  /** 60-bit MD5 SimHash ([[graft.expressions.SimHash60Words]]) — the
    * engine-replicable variant: the word hash is the top 60 bits of
    * md5(word), so an independent SQL engine rebuilds the identical
    * value from `md5` + bit ops and the Hamming-pair query becomes
    * hash-checkable ([[graft.pipeline.Dedup]] q_dedup_simhash).
    */
  def simhash60(text: Column): Column =
    graft.expressions.TextExprs.simhash60Words(words(text))

  /** The 4 × 15-bit chunks of a 60-bit SimHash — same pigeonhole LSH
    * guarantee as [[simhashChunksExpr]]: Hamming ≤ 3 ⇒ ≥1 identical
    * chunk. Input column must be named `sh`.
    */
  val simhash60ChunksExpr: String =
    "transform(sequence(0, 3), j -> (sh >> (j * 15)) & 32767)"
}
