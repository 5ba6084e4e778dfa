package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{TextFns, Vectors}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` / `embeddings` (SURVEY.md
  * §2.J + the training-data-pipeline mandate): exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * The 100 TB shape for every approximate variant is the same:
  * per-row signature (narrow, codegen'd) → explode into O(1) bucket
  * keys → self-join on the bucket key (one shuffle, key-partitioned) →
  * verify candidates pairwise. Nothing is quadratic in the corpus; the
  * only quadratic step is within a bucket, which the signature design
  * keeps tiny (and a production run would salt/cap oversized buckets).
  * The exact-Jaccard query is the verification baseline and is
  * deliberately restricted to a sample — that restriction is what the
  * LSH variants exist to remove.
  */
object Dedup extends QueryModule {

  /** MinHash signatures (k=16) per doc, materialized once: the
    * signature table is referenced three times in the LSH plan (banding
    * + two pair join-backs) and Spark executes each branch's subtree
    * independently — materializing trades 50k tiny rows of memory for
    * 3× the signature compute. `localCheckpoint` (not `persist`): the
    * blocks live at the RDD layer, so the ContextCleaner reclaims them
    * as soon as the query's plan is unreachable — a `persist()` here
    * would pin a CacheManager entry for the session's lifetime on every
    * invocation (a leak in a 64-query loop or a long-lived service).
    * The 100 TB analog is materializing signatures to a real table once
    * per corpus snapshot.
    */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
      .localCheckpoint()

  /** Oversized-bucket cap: an LSH bucket with hundreds of members is
    * non-discriminative boilerplate (and quadratic in the join) — the
    * standard production mitigation is to drop buckets above a cap.
    */
  private[graft] val BucketCap = 64

  /** q_dedup_bloom's hash count (k). The bit width m lives inline —
    * deliberately small (2048) so the fixture exhibits false
    * positives and the verify step is visibly load-bearing.
    */
  private[graft] val BloomHashes = 3

  /** The (chunk, chunk_val) buckets that feed the SimHash candidate
    * expansion: each bucket's (doc_id, sh) members collected sorted,
    * kept only at 2..BucketCap members. Package-private so
    * PipelineSpec can assert the cap on the exact production plan, not
    * a replica. One shuffle; the cap bounds every downstream in-row
    * pair expansion at BucketCap²/2.
    *
    * Uses the 60-bit MD5 simhash in 4 × 15-bit chunks (not the
    * xxhash64 64-bit variant): same pigeonhole guarantee, and an
    * independent engine can rebuild the hash exactly — which is what
    * lets q_dedup_simhash be hash-checked (see the query's Scaladoc).
    */
  private[graft] def simhashBuckets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextFns.simhash60(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"),
        posexplode(expr(TextFns.simhash60ChunksExpr)).as(Seq("chunk", "chunk_val")))
      .groupBy("chunk", "chunk_val")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh")))).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= BucketCap)

  /** In-row ordered-pair expansion of a collected bucket — the shared
    * kernel of the capped dedup family: the array column `arr` is
    * size-bounded by BucketCap BEFORE any pair exists, so the
    * quadratic step is O(1) per bucket by construction (an uncapped
    * HOF blow-up would not be safe). Sorted input ⇒ every emitted pair
    * has a < b.
    */
  private[graft] def pairExpansion(arr: String, fields: String): String =
    s"""flatten(transform($arr, (a, i) ->
       |  transform(slice($arr, i + 2, size($arr) - i - 1),
       |    b -> struct($fields))))""".stripMargin

  /** Materialize the MinHash signature index for a corpus snapshot —
    * the expensive half of dedup (reading + hashing every document's
    * text) done ONCE per snapshot, like `Similarity.buildIvfIndex`.
    * Band keys are derived from the signature at query time (4
    * xxhash64 calls over a 16-long array — noise next to re-minhashing
    * the text).
    */
  def buildSigIndex(s: SparkSession, dir: String, indexDir: String): Unit =
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
      .write.mode("overwrite").parquet(indexDir)

  /** The daily-ingest dedup shape: near-dup pairs for documents with
    * `doc_id >= newMinId` (the day's batch) against the indexed
    * standing corpus AND each other — never corpus × corpus. Bucket
    * construction (banding, census, cap, expansion) is identical to
    * `q_dedup_minhash` over the full union, so the result is exactly
    * that query's output restricted to pairs whose newer side is in
    * the batch (doc_a < doc_b ⇒ doc_b ≥ newMinId) — IncrementalSpec
    * pins the equality. What the index buys at 100 TB: the corpus
    * side's text is never re-read or re-hashed, so the daily cost is
    * O(|batch| text) + one bucket shuffle, not O(|corpus| text).
    */
  def incrementalCandidates(
      s: SparkSession, dir: String, indexDir: String, newMinId: Long): DataFrame = {
    val standing = s.read.parquet(indexDir).filter(col("doc_id") < newMinId)
    val batch = Tables(s, dir, "documents")
      .filter(col("doc_id") >= newMinId)
      .select(col("doc_id"), TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
    // the two prunes make the daily cost honest: a standing-only
    // bucket (sorted ids ⇒ max is last) can emit no new-side pair, so
    // it is dropped BEFORE the quadratic expansion; old×old pairs from
    // mixed buckets are dropped before the distinct shuffle
    candidatePairs(standing.union(batch).localCheckpoint(),
      bucketKeep = element_at(col("ids"), -1) >= newMinId,
      pairKeep = col("doc_b") >= newMinId)
  }

  /** The one banded-LSH candidate pipeline — bucket census, cap,
    * in-row pair expansion, signature join-backs, Jaccard estimate —
    * shared by the batch query and the incremental path, so their
    * restricted-equality contract is structural, not a convention
    * maintained across two copies. `bucketKeep` sees the sorted `ids`
    * array of each surviving bucket; `pairKeep` sees (doc_a, doc_b)
    * BEFORE the distinct shuffle.
    */
  private def candidatePairs(
      sigs: DataFrame, bucketKeep: Column, pairKeep: Column): DataFrame =
    rawPairs(sigs, bucketKeep, pairKeep)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")

  /** The id-only half of the pipeline: banded bucket census, cap,
    * in-row pair expansion — no signature join-backs, for callers
    * (the verified batch query) that re-derive similarity exactly and
    * would otherwise pay two dead joins per pair.
    */
  private def rawPairs(
      sigs: DataFrame, bucketKeep: Column, pairKeep: Column): DataFrame =
    sigs.select(col("doc_id"),
        posexplode(TextFns.bandKeys(col("sig"), 4, 4)).as(Seq("band", "band_key")))
      .groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= BucketCap)
      .filter(bucketKeep)
      .select(explode(expr(
        pairExpansion("ids", "a AS doc_a, b AS doc_b"))).as("p"))
      .select("p.doc_a", "p.doc_b")
      .filter(pairKeep)
      .distinct()

  /** The batch LSH candidate surface (doc_a, doc_b, est_jaccard) —
    * the unverified half of `q_dedup_minhash`, shared with the
    * incremental path's restricted-equality contract
    * (IncrementalDedupSpec).
    */
  private[graft] def batchCandidates(s: SparkSession, dir: String): DataFrame =
    candidatePairs(signatures(s, dir), lit(true), lit(true))

  /** Jaccard estimate from two k=16 MinHash signatures: matching-slot
    * fraction (the standard unbiased estimator).
    */
  private def estJaccard(a: Column, b: Column): Column =
    round(aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x) / 16.0, 4)

  def entries: Map[String, QueryDef] = Map(

    // Exact doc-level dedup on the normalized-content fingerprint: one
    // survivor (min doc_id) per content hash. groupBy on the hash is a
    // single shuffle on a high-cardinality key — the canonical exact
    // dedup at any scale.
    // Incremental dedup against a HISTORICAL corpus through a Bloom
    // prefilter — the 100 TB pattern for "is today's batch already in
    // yesterday's trillions": the filter is FIXED-SIZE regardless of
    // history (m bits), probes are row-local hash arithmetic, and the
    // exact fingerprint join runs ONLY on bloom candidates. Declared
    // at a deliberately small m (2048 bits / k=3 over 250 historical
    // fps ⇒ a few false positives on this fixture) so the artifact
    // SHOWS the verify step earning its keep: bloom_candidate ⊃
    // is_dup, never the reverse (no false negatives by construction).
    // The id windows OVERLAP (history ≤300, batch >250) to model
    // re-ingestion — the re-crawled 50 are byte-identical dups, so
    // both flag paths are populated on the fixture.
    // Hash-checked: positions derive from md5 (engine-replicable, the
    // q_dedup_simhash construction), so the oracle rebuilds the exact
    // bit set, the exact candidate flags, and the exact verified join.
    // Here the "filter" is a distinct-position DataFrame joined on
    // position (≤ m rows — bounded by the bit width, never by
    // history), so nothing collects to the driver at any scale.
    "q_dedup_bloom" -> QueryDef(
      (s, dir) => {
        val m = 2048
        def posArr(fp: org.apache.spark.sql.Column) =
          transform(sequence(lit(0), lit(BloomHashes - 1)),
            j => conv(substring(md5(concat(fp, lit("#"), j.cast("string"))), 1, 15),
              16, 10).cast("long") % m)
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val hist = docs.filter(col("doc_id") <= 300)
        val batch = docs.filter(col("doc_id") > 250)
        val bloom = hist.select(explode(posArr(col("fp"))).as("pos")).distinct()
          .withColumn("hit", lit(1L))
        val cand = batch
          .select(col("doc_id"), col("fp"), explode(posArr(col("fp"))).as("pos"))
          .join(bloom, Seq("pos"), "left_outer")
          .groupBy("doc_id", "fp")
          .agg((sum(coalesce(col("hit"), lit(0L))) === BloomHashes)
            .as("bloom_candidate"))
        val dup = cand.filter(col("bloom_candidate"))
          .join(hist.select(col("fp")).distinct(), Seq("fp"), "left_semi")
          .select(col("doc_id"), lit(true).as("dup"))
        cand.join(dup, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("bloom_candidate"),
            coalesce(col("dup"), lit(false)).as("is_dup"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
              |hist AS (SELECT * FROM d WHERE doc_id <= 300),
              |batch AS (SELECT * FROM d WHERE doc_id > 250),
              |hpos AS (
              |  SELECT DISTINCT
              |    ('0x' || substring(md5(fp || '#' || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT
              |      % 2048 AS pos
              |  FROM hist, (SELECT unnest(range(0, $BloomHashes)) AS j) j),
              |probe AS (
              |  SELECT b.doc_id, b.fp,
              |    (sum(CASE WHEN h.pos IS NOT NULL THEN 1 ELSE 0 END) = $BloomHashes)
              |      AS bloom_candidate
              |  FROM (SELECT doc_id, fp,
              |          ('0x' || substring(md5(fp || '#' || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT
              |            % 2048 AS pos
              |        FROM batch, (SELECT unnest(range(0, $BloomHashes)) AS j) j) b
              |  LEFT JOIN hpos h USING (pos)
              |  GROUP BY b.doc_id, b.fp),
              |dup AS (
              |  SELECT DISTINCT p.doc_id FROM probe p
              |  JOIN hist h ON p.fp = h.fp WHERE p.bloom_candidate)
              |SELECT p.doc_id, p.bloom_candidate,
              |  (p.doc_id IN (SELECT doc_id FROM dup)) AS is_dup
              |FROM probe p ORDER BY doc_id""".stripMargin)),

    "q_dedup_docs" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), TextFns.fingerprint(col("text")).as("norm_fp"))
        .groupBy("norm_fp")
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("n_copies"))
        .orderBy("norm_fp"),
      Some("""SELECT norm_fp, CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
             |       CAST(count(*) AS BIGINT) AS n_copies
             |FROM (SELECT doc_id,
             |        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |            ' +', ' ', 'g'))) AS norm_fp
             |      FROM documents)
             |GROUP BY norm_fp ORDER BY norm_fp""".stripMargin)),

    // URL-canonicalization dedup ([LLM] — the FIRST dedup pass of
    // every web-crawl pipeline: CommonCrawl/C4 collapse re-crawls of
    // the same page whose URLs differ only in case, scheme, tracking
    // parameters, fragments, or a trailing slash, BEFORE any content
    // is fetched or compared). The fixtures carry no URLs, so — the
    // q_url_funcs/q_pii_scrub injection discipline — a messy URL is
    // synthesized deterministically from event fields identically on
    // both engines, with the mess (upper-cased host, http:// scheme,
    // utm_* query, #fragment, trailing slash) keyed off event_id so
    // many raw variants share one canonical page. What the hash check
    // then verifies is the canonicalizer itself: lower → strip
    // fragment → strip query → unify scheme → strip trailing slash,
    // as anchored regexes in the Java ∩ RE2 dialect. Shape: the
    // canonicalizer is a zero-shuffle codegen'd projection; the dedup
    // is ONE hash aggregate on the canonical key carrying counts and
    // the min-id keeper — never the variant strings.
    "q_dedup_url" -> QueryDef(
      (s, dir) => {
        val host0 = concat(lit("shop"),
          pmod(col("user_id"), lit(10L)).cast("string"), lit(".example.com"))
        val raw = concat(
          when(pmod(col("event_id"), lit(5L)) === 0, lit("http://"))
            .otherwise(lit("https://")),
          when(pmod(col("event_id"), lit(3L)) === 0, upper(host0)).otherwise(host0),
          lit("/"), col("event_type"),
          lit("/p"), pmod(col("event_id"), lit(50L)).cast("string"),
          when(pmod(col("event_id"), lit(4L)) === 2, lit("/")).otherwise(lit("")),
          when(pmod(col("event_id"), lit(2L)) === 1,
            concat(lit("?utm_source=u"), pmod(col("event_id"), lit(4L)).cast("string"),
              lit("&utm_campaign=c"))).otherwise(lit("")),
          when(pmod(col("event_id"), lit(7L)) === 0,
            concat(lit("#sec"), pmod(col("event_id"), lit(3L)).cast("string")))
            .otherwise(lit("")))
        val canon = regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(raw), "#.*$", ""),
              "\\?.*$", ""),
            "^http://", "https://"),
          "/$", "")
        Tables(s, dir, "events")
          .select(col("event_id"), raw.as("raw_url"), canon.as("url"))
          .groupBy("url")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("raw_url")).as("n_variants"),
            min(col("event_id")).as("keeper_event_id"))
          .orderBy("url")
      },
      Some("""WITH u AS (
             |  SELECT event_id,
             |    (CASE WHEN event_id % 5 = 0 THEN 'http://' ELSE 'https://' END)
             |    || (CASE WHEN event_id % 3 = 0
             |          THEN upper('shop' || CAST(user_id % 10 AS VARCHAR) || '.example.com')
             |          ELSE 'shop' || CAST(user_id % 10 AS VARCHAR) || '.example.com' END)
             |    || '/' || event_type || '/p' || CAST(event_id % 50 AS VARCHAR)
             |    || (CASE WHEN event_id % 4 = 2 THEN '/' ELSE '' END)
             |    || (CASE WHEN event_id % 2 = 1
             |          THEN '?utm_source=u' || CAST(event_id % 4 AS VARCHAR) || '&utm_campaign=c'
             |          ELSE '' END)
             |    || (CASE WHEN event_id % 7 = 0
             |          THEN '#sec' || CAST(event_id % 3 AS VARCHAR) ELSE '' END)
             |      AS raw_url
             |  FROM events),
             |c AS (
             |  SELECT event_id, raw_url,
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(lower(raw_url), '#.*$', ''),
             |          '\?.*$', ''),
             |        '^http://', 'https://'),
             |      '/$', '') AS url
             |  FROM u)
             |SELECT url, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT raw_url) AS BIGINT) AS n_variants,
             |  CAST(min(event_id) AS BIGINT) AS keeper_event_id
             |FROM c GROUP BY url ORDER BY url""".stripMargin)),

    // Keep-best-copy dedup ([LLM] — the provenance-aware variant of
    // q_dedup_docs every multi-crawl pipeline runs: Dolma/The Pile
    // keep ONE copy per content group, chosen by a quality rule, not
    // min-id): per normalized-content fingerprint keep the LONGEST
    // raw copy (most complete crawl of the page; normalization
    // collapses case/punctuation differences, so raw n_chars ranks
    // completeness), ties to the smallest doc_id. One max_by hash
    // aggregate on the composite (n_chars, −doc_id) key — the
    // q_agg_argmax determinism move — so ONE shuffle carries one
    // candidate struct per fingerprint, never the copies.
    "q_dedup_keep_best" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextFns.fingerprint(col("text")).as("fp"))
        .groupBy("fp")
        .agg(
          max_by(struct(col("doc_id"), col("source"), col("n_chars")),
            struct(col("n_chars"), -col("doc_id"))).as("best"),
          count(lit(1)).as("n_copies"))
        .select(col("best.doc_id").as("doc_id"),
          col("best.source").as("source"),
          col("best.n_chars").as("n_chars"), col("n_copies"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, source, n_chars,
             |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |        ' +', ' ', 'g'))) AS fp
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, source, n_chars,
             |    row_number() OVER (PARTITION BY fp
             |      ORDER BY n_chars DESC, doc_id ASC) AS rn,
             |    count(*) OVER (PARTITION BY fp) AS n_copies
             |  FROM d)
             |SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             |       CAST(n_copies AS BIGINT) AS n_copies
             |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // CCNet-style corpus-level boilerplate-line removal ([LLM] — the
    // paragraph-dedup pass of Wenzek et al. 2019 / the line-dedup pass
    // of C4: a line repeated across many documents is boilerplate, and
    // every training pipeline strips it BEFORE doc-level dedup). The
    // fixture's texts have no newlines, so "line" = positional 3-word
    // chunk, carved zero-shuffle with slice() on the split array (no
    // groupBy-collect to reassemble chunks). Corpus document-frequency
    // per chunk runs on the chunk's xxhash64 — 8 bytes through the
    // exchange instead of the chunk text — and the boilerplate set
    // (df ≥ 5 docs) is broadcast back: by definition it's the tiny
    // high-frequency head of the chunk distribution, the exact shape a
    // broadcast wants at any corpus size. Output = per-doc kept/dropped
    // word accounting, the audit a cleaning pass ships with.
    "q_line_dedup" -> QueryDef(
      (s, dir) => {
        val chunks = Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) > 0)
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(0L),
              (ceil(size(col("ws")) / 3.0) - 1).cast("long"))).as("ci"))
          .select(col("doc_id"), col("ci"),
            slice(col("ws"), (col("ci") * 3 + 1).cast("int"), lit(3)).as("chunk"))
          .select(col("doc_id"), col("ci"),
            size(col("chunk")).cast("long").as("n_words"),
            xxhash64(array_join(col("chunk"), " ")).as("chunk_h"))
        val boiler = chunks.groupBy("chunk_h")
          .agg(countDistinct("doc_id").as("nd"))
          .filter(col("nd") >= 5)
          .select("chunk_h", "nd")
        chunks.join(broadcast(boiler), Seq("chunk_h"), "left_outer")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            count(col("nd")).as("n_boiler_chunks"),
            sum(when(col("nd").isNull, col("n_words")).otherwise(0L)).as("kept_words"),
            sum(when(col("nd").isNotNull, col("n_words")).otherwise(0L)).as("dropped_words"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |c AS (
             |  SELECT doc_id, u.ci,
             |    len(ws[(u.ci * 3 + 1):(u.ci * 3 + 3)]) AS n_words,
             |    array_to_string(ws[(u.ci * 3 + 1):(u.ci * 3 + 3)], ' ') AS chunk
             |  FROM d, LATERAL (SELECT unnest(generate_series(0,
             |    CAST(ceil(len(ws) / 3.0) - 1 AS BIGINT))) AS ci) AS u
             |  WHERE len(ws) > 0),
             |f AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM c
             |      GROUP BY chunk HAVING count(DISTINCT doc_id) >= 5)
             |SELECT c.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(count(f.nd) AS BIGINT) AS n_boiler_chunks,
             |  CAST(sum(CASE WHEN f.nd IS NULL THEN c.n_words ELSE 0 END) AS BIGINT) AS kept_words,
             |  CAST(sum(CASE WHEN f.nd IS NOT NULL THEN c.n_words ELSE 0 END) AS BIGINT) AS dropped_words
             |FROM c LEFT JOIN f ON c.chunk = f.chunk
             |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin)),

    // MinHash + LSH banding, declared in its VERIFIED form — the full
    // production loop, with the production pre-step: EXACT-DUP
    // COLLAPSE FIRST (the SlimPajama/RefinedWeb ordering). Identical
    // texts are grouped by fingerprint and ONE representative per
    // group runs the expensive path — signatures, banded buckets
    // (capped at BucketCap before any pair exists), exact
    // 3-gram-shingle Jaccard per candidate rep pair (row-local set
    // intersection; O(rep candidates), never O(corpus²)), kept at
    // τ ≥ 0.5. Doc-level pairs are then pure id expansion: within a
    // dup group every pair is Jaccard 1 by identity; across verified
    // rep pairs every member combination inherits the reps' J (their
    // texts are the reps' texts). Why it matters at scale: duplicate
    // multiplicity m inflates bucket membership m× and candidate
    // pairs m² — the sf1 rehearsal (10 copies of every text) measured
    // 250k gram-array verifications; collapsed, the verify set is
    // copy-count-invariant and only bounded id arrays expand. It also
    // makes the bucket CAP robust: dup multiplicity can no longer
    // evict a bucket (70 copies of 7 texts ≠ 70 distinct texts).
    // ORACLE-CHECKED: the driver hash-compares against brute-force
    // all-pairs shingle Jaccard ≥ τ, which is equal as long as LSH
    // recall at τ is 1 on the corpus — PipelineSpec pins that
    // containment (every exact pair collides in ≥1 band), and the
    // fixture's similarity distribution is sharply bimodal (true dups
    // ≥ 0.9, everything else < 0.5), far inside the 4×4-band S-curve's
    // high-recall region. The unverified estimate path stays live via
    // [[batchCandidates]] (est_jaccard) and the incremental query.
    "q_dedup_minhash" -> QueryDef(
      (s, dir) => {
        // One fingerprint shuffle carries each distinct text once;
        // the checkpoint is reused by sigs, grams, and both
        // expansions (100 TB analog: the materialized exact-dedup
        // table q_optimize_dedup already produces).
        val groups = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
          .groupBy("fp")
          .agg(min("doc_id").as("rep_id"),
            first("text").as("text"), // group members share one text
            sort_array(collect_list(col("doc_id"))).as("members"))
          .localCheckpoint()
        val sigs = groups.select(col("rep_id").as("doc_id"),
          TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
        val repPairs = rawPairs(sigs, lit(true), lit(true))
        // ws is projected ONCE before the gram lambda (an inlined
        // split would re-tokenize per gram); reps only.
        val grams = groups
          .select(col("rep_id").as("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"),
            array_distinct(expr(
              """transform(sequence(1, greatest(1, size(ws) - 2)),
                |  g -> array_join(slice(ws, g, 3), ' '))""".stripMargin))
              .as("grams"))
        // ONE gram pass, not one per join side: the candidate rep
        // pairs explode to (pair, role, doc_id) rows that BROADCAST
        // onto the gram scan, so gram sets travel only for candidates.
        val roles = repPairs
          .select(col("doc_a"), col("doc_b"),
            explode(array(
              struct(lit("a").as("role"), col("doc_a").as("doc_id")),
              struct(lit("b").as("role"), col("doc_b").as("doc_id")))).as("r"))
          .select(col("doc_a"), col("doc_b"), col("r.role"), col("r.doc_id"))
        val verified = grams.join(broadcast(roles), Seq("doc_id"))
          .groupBy("doc_a", "doc_b")
          .agg(
            first(when(col("role") === "a", col("grams")), ignoreNulls = true).as("ga"),
            first(when(col("role") === "b", col("grams")), ignoreNulls = true).as("gb"))
          .withColumn("c", size(array_intersect(col("ga"), col("gb"))).cast("double"))
          .withColumn("j", col("c") /
            (size(col("ga")) + size(col("gb")) - col("c")))
          .filter(col("j") >= 0.5)
          .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b"), col("j"))
        val within = groups.filter(size(col("members")) > 1)
          .select(explode(expr(
            pairExpansion("members", "a AS doc_a, b AS doc_b"))).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"), lit(1.0).as("j"))
        val cross = verified
          .join(groups.select(col("rep_id").as("rep_a"), col("members").as("ma")),
            Seq("rep_a"))
          .join(groups.select(col("rep_id").as("rep_b"), col("members").as("mb")),
            Seq("rep_b"))
          .select(explode(col("ma")).as("x"), col("mb"), col("j"))
          .select(col("x"), explode(col("mb")).as("y"), col("j"))
          .select(least(col("x"), col("y")).as("doc_a"),
            greatest(col("x"), col("y")).as("doc_b"), col("j"))
        within.unionByName(cross)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS gram
             |  FROM d, LATERAL (SELECT unnest(generate_series(1,
             |    greatest(1, len(ws) - 2))) AS g) u),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
             |  FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
             |FROM common
             |JOIN sizes sa ON sa.doc_id = doc_a
             |JOIN sizes sb ON sb.doc_id = doc_b
             |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // SimHash near-dup, declared in its EXACT form — all pairs at
    // Hamming distance ≤ 3 on the 60-bit MD5 simhash, found by
    // pigeonhole LSH: candidates share one of the 4 15-bit chunks,
    // which catches EVERY pair within Hamming 3 by construction (4
    // chunks, ≤3 differing bits ⇒ ≥1 untouched chunk) — recall 1 is a
    // THEOREM here, not a fixture property. ORACLE-CHECKED (r6 was
    // rows-only): the simhash itself is engine-replicable — the word
    // hash is the top 60 bits of md5(word), sign-of-votes per bit —
    // so DuckDB rebuilds the identical hash from `md5` + bit ops and
    // brute-forces the complete Hamming-≤3 pair set; the LSH result
    // must hash-match it exactly. (The r6 declared form reported
    // Hamming < 16, where pigeonhole recall genuinely fails and no
    // oracle equality can hold; ≤3 is the radius this chunk scheme
    // serves exactly. Wider radii remain the honest-approx territory
    // of the minhash family.)
    //
    // The chunk key space is only 2^15, so at corpus scale EVERY chunk
    // bucket fills (~N/32768 docs) and an uncapped pairing is quadratic
    // within each — the same non-discriminative-bucket problem
    // minhash/winnow already guard against. Same mitigation: drop
    // buckets above BucketCap before any pair exists (oversized chunk
    // buckets are near-zero-entropy chunks — boilerplate — whose pairs
    // the other three chunks still recover for genuinely similar docs;
    // dropping them is the standard recall/cost trade; PipelineSpec
    // pins that no fixture bucket is dropped, preserving the oracle
    // equality at the gate). Each bucket carries its members'
    // (doc_id, sh) structs, so the Hamming distance is computed in-row
    // during expansion — no join-backs, no checkpoint, ONE shuffle
    // end-to-end.
    "q_dedup_simhash" -> QueryDef(
      (s, dir) => simhashBuckets(s, dir)
        .select(explode(expr(pairExpansion("ms",
          "a.doc_id AS doc_a, a.sh AS sh_a, b.doc_id AS doc_b, b.sh AS sh_b"))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
          bit_count(col("p.sh_a").bitwiseXOR(col("p.sh_b"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b"),
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
             |  FROM w),
             |v AS (
             |  SELECT doc_id, b,
             |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
             |  FROM h, LATERAL (SELECT unnest(generate_series(0, 59)) AS b) u
             |  GROUP BY doc_id, b),
             |s AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN votes > 0
             |      THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
             |  FROM v GROUP BY doc_id)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh, b.sh)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Winnowing fingerprints (rolling-hash document fingerprinting):
    // docs sharing ≥5 selected k-gram hashes are substring-level
    // near-dup candidates — the complement of MinHash (which measures
    // set-level Jaccard and misses short verbatim overlaps). Same
    // LSH-style scale shape: explode a bounded fingerprint set, drop
    // non-discriminative hot fingerprints, equi-join on the hash.
    // Parameters measured on the fixture: k=8 flags 63% of ALL doc
    // pairs (8-byte grams collide on common words); k=16/w=8 with the
    // ≥5 co-occurrence floor isolates the stable true near-dup set.
    //
    // ORACLE-CHECKED (r6 was rows-only), by the minhash promotion
    // pattern: each winnow candidate is VERIFIED with an exact,
    // engine-replicable measure — the count of shared distinct
    // 16-char grams (the same k the fingerprints hash, so a candidate
    // flagged by shared fingerprints is re-measured on the underlying
    // grams themselves) — and kept at ≥ 30. The oracle brute-forces
    // all pairs on that measure; equality holds iff every pair with
    // ≥ 30 shared grams is a winnow candidate, which the MOSS window
    // guarantee makes near-structural (every shared run ≥ k+w−1 = 23
    // chars forces a shared fingerprint; 30 shared 16-grams implies
    // many such runs) and PipelineSpec pins exactly on the fixture.
    // The 30 floor sits in a wide empirical gap: the densest
    // non-candidate pair shares 25 grams, the sparsest brute pair
    // above it 44, the true near-dup mass ≥ 113.
    "q_dedup_winnow" -> QueryDef(
      (s, dir) => {
        val gramExpr =
          """array_distinct(transform(sequence(1, greatest(1, length(text) - 15)),
            |  p -> substring(text, p, 16)))""".stripMargin
        // EXACT-DUP COLLAPSE FIRST — the minhash ordering, adopted
        // after the 10× rehearsal measured 26× growth without it:
        // duplicate multiplicity m inflates every fingerprint bucket
        // m× and candidate pairs m², so at 10× data (10 copies of
        // each text) the verification set exploded ~100×. Collapsed,
        // ONE representative per distinct text runs fingerprints +
        // exact verification (copy-count-invariant), and doc-level
        // pairs are pure id expansion: within a dup group every pair
        // shares ALL grams (n = the rep's gram count, floor-checked);
        // across verified rep pairs every member combination inherits
        // the reps' overlap — the texts ARE the reps' texts.
        val groups = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), md5(col("text")).as("fp"))
          .groupBy("fp")
          .agg(min("doc_id").as("rep_id"), first("text").as("text"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          .localCheckpoint()
        // One shuffle to the fingerprint bucket: collect each
        // fingerprint's rep list (BucketCap filter BEFORE any pair
        // exists), expand ordered pairs in-row (≤ BucketCap²/2 per
        // bucket — O(1) by construction).
        // fanOut: the checkpointed rep table carries the (AQE-coalesced)
        // 1–3 partitions of its build, so the per-char winnowing kernel
        // and the 16-gram transform below ran near-serially (r15
        // profile); scale-adaptive redistribution on the rep key —
        // identity once the rep table is ≥ cores partitions
        val groupsW = Tables.fanOut(groups, col("rep_id"))
        val fps = groupsW
          .select(col("rep_id").as("doc_id"),
            explode(TextFns.winnowFingerprints(col("text"), 16, 8)).as("fp"))
        val cands = fps
          .groupBy("fp").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .filter(size(col("ids")) > 1 && size(col("ids")) <= BucketCap)
          .select(explode(expr(
            pairExpansion("ids", "a AS rep_a, b AS rep_b"))).as("p"))
          .select(col("p.rep_a"), col("p.rep_b"))
          .groupBy("rep_a", "rep_b")
          .agg(count(lit(1)).as("n_fp"))
          .filter(col("n_fp") >= 5)
          .select(col("rep_a"), col("rep_b"))
          // pair-scale result reused twice below (id pruning + roles);
          // checkpointing runs the fingerprint pipeline once
          .localCheckpoint()
        val roles = cands
          .select(col("rep_a"), col("rep_b"),
            explode(array(
              struct(lit("a").as("role"), col("rep_a").as("doc_id")),
              struct(lit("b").as("role"), col("rep_b").as("doc_id")))).as("r"))
          .select(col("rep_a"), col("rep_b"), col("r.role"), col("r.doc_id"))
        // Gram arrays ONLY for candidate reps: the broadcast semi-join
        // prunes BEFORE the expensive per-char transform (corpus-wide
        // gram building measured 3.2 s vs 2.1 s at sf0.1), then the
        // roles broadcast carries each rep's grams once per pair side
        // (the minhash pattern — never corpus×corpus).
        val candIds = roles.select(col("doc_id")).distinct()
        val grams16 = groupsW
          .select(col("rep_id").as("doc_id"), col("text"))
          .join(broadcast(candIds), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), expr(gramExpr).as("g16"))
        val verified = grams16.join(broadcast(roles), Seq("doc_id"))
          .groupBy("rep_a", "rep_b")
          .agg(
            first(when(col("role") === "a", col("g16")), ignoreNulls = true).as("ga"),
            first(when(col("role") === "b", col("g16")), ignoreNulls = true).as("gb"))
          .select(col("rep_a"), col("rep_b"),
            size(array_intersect(col("ga"), col("gb"))).cast("long").as("n"))
          .filter(col("n") >= 30)
        val within = groups.filter(size(col("members")) > 1)
          .select(col("members"), size(expr(gramExpr)).cast("long").as("n"))
          .filter(col("n") >= 30) // a tiny dup'd doc can be under-floor
          .select(explode(expr(
            pairExpansion("members", "a AS doc_a, b AS doc_b"))).as("p"), col("n"))
          .select(col("p.doc_a"), col("p.doc_b"), col("n"))
        val cross = verified
          .join(groups.select(col("rep_id").as("rep_a"), col("members").as("ma")),
            Seq("rep_a"))
          .join(groups.select(col("rep_id").as("rep_b"), col("members").as("mb")),
            Seq("rep_b"))
          .select(explode(col("ma")).as("x"), col("mb"), col("n"))
          .select(col("x"), explode(col("mb")).as("y"), col("n"))
          .select(least(col("x"), col("y")).as("doc_a"),
            greatest(col("x"), col("y")).as("doc_b"), col("n"))
        within.unionByName(cross)
          .select(col("doc_a"), col("doc_b"), col("n").as("n_shared_grams"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, substring(text, p, 16) AS gram
             |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
             |    greatest(1, length(text) - 15))) AS p) u),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    CAST(count(*) AS BIGINT) AS n_shared_grams
             |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, n_shared_grams
             |FROM common WHERE n_shared_grams >= 30
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Exact word-level Jaccard over a bounded sample — the correctness
    // baseline the LSH variants approximate. Explode distinct words,
    // self-join on the word (shuffle on word key), count intersections,
    // Jaccard from the inclusion–exclusion identity.
    "q_dedup_ngram_jaccard" -> QueryDef(
      (s, dir) => {
        val docs = Tables(s, dir, "documents").filter(col("doc_id") < 200)
        val toks = docs.select(col("doc_id"),
            explode(array_distinct(TextFns.words(col("text")))).as("w"))
        val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_words"))
        val common = toks.select(col("doc_id").as("doc_a"), col("w"))
          .join(toks.select(col("doc_id").as("doc_b"), col("w")), Seq("w"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
        common
          .join(sizes.select(col("doc_id").as("doc_a"), col("n_words").as("na")), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"), col("n_words").as("nb")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            round(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")), 4).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
             |  FROM documents WHERE doc_id < 200),
             |sizes AS (SELECT doc_id, count(*) AS n_words FROM toks GROUP BY doc_id),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
             |  FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |       round(CAST(n_common AS DOUBLE) / (sa.n_words + sb.n_words - n_common), 4) AS jaccard
             |FROM common
             |JOIN sizes sa ON sa.doc_id = doc_a
             |JOIN sizes sb ON sb.doc_id = doc_b
             |WHERE CAST(n_common AS DOUBLE) / (sa.n_words + sb.n_words - n_common) >= 0.5
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Asymmetric n-gram CONTAINMENT (Broder 1997's "roughly contained
    // in", the quote/boilerplate detector Jaccard misses: a short doc
    // embedded verbatim in a long one scores near-zero Jaccard but
    // containment ≈ 1). Directed pairs over distinct word 3-grams:
    // C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| ≥ 0.8, i.e. doc_a
    // is mostly inside doc_b. The 0.8 cut is exact INTEGER arithmetic
    // (5·common ≥ 4·|a|) on both engines — no float boundary can
    // disagree (the jaccard query's rounded-threshold hazard). Same
    // bounded-sample + gram-equi-join shape as its Jaccard twin: cost
    // is Σ per-gram bucket², the corpus never crosses as pairs.
    "q_dedup_containment" -> QueryDef(
      (s, dir) => {
        val docs = Tables(s, dir, "documents").filter(col("doc_id") < 200)
        val grams = docs.select(col("doc_id"),
          explode(array_distinct(
            TextFns.shingles(TextFns.words(col("text")), 3))).as("g"))
        val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val common = grams.select(col("doc_id").as("doc_a"), col("g"))
          .join(grams.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
          .filter(col("doc_a") =!= col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
        common
          .join(sizes.select(col("doc_id").as("doc_a"),
            col("n_grams").as("na")), Seq("doc_a"))
          .filter(col("n_common") * 5 >= col("na") * 4)
          .select(col("doc_a"), col("doc_b"), col("n_common"), col("na"),
            round(col("n_common").cast("double") / col("na"), 4)
              .as("containment"))
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH grams AS (
             |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
             |    THEN list_distinct(list_transform(range(1, len(ws) - 1),
             |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             |    ELSE [array_to_string(ws, ' ')] END) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
             |        FROM documents WHERE doc_id < 200)),
             |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
             |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |  CAST(n_common AS BIGINT) AS n_common,
             |  CAST(sa.n_grams AS BIGINT) AS na,
             |  round(CAST(n_common AS DOUBLE) / sa.n_grams, 4) AS containment
             |FROM common JOIN sizes sa ON sa.doc_id = doc_a
             |WHERE n_common * 5 >= sa.n_grams * 4
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Embedding near-dup: pairs within the same coarse cluster (label)
    // with cosine ≥ 0.35. The label equi-join IS the IVF trick: only
    // within-cluster pairs are compared, so cost is Σ|cluster|², not
    // |corpus|². Bounded sample (vec_id < 2000) keeps verify/bench
    // output stable across scale factors.
    "q_dedup_embed_cosine" -> QueryDef(
      (s, dir) => {
        // norms are computed per VECTOR below the join (once per row),
        // not per pair — only the dot product is pairwise work.
        val e = Tables(s, dir, "embeddings").filter(col("vec_id") < 2000)
          .select(col("label"), col("vec_id"), col("embedding"),
            Vectors.norm(col("embedding")).as("nrm"))
        val l = e.select(col("label"), col("vec_id").as("vec_a"),
          col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
        val r = e.select(col("label"), col("vec_id").as("vec_b"),
          col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
        l.join(r, Seq("label"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cos_sim", round(
            Vectors.dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 4))
          .filter(col("cos_sim") >= 0.35)
          .select(col("label"), col("vec_a"), col("vec_b"), col("cos_sim"))
          .orderBy("vec_a", "vec_b")
      },
      Some("""SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
             |  round(
             |    list_sum(list_transform(range(1, 65),
             |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(range(1, 65),
             |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(range(1, 65),
             |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE a.vec_id < 2000 AND b.vec_id < 2000
             |  AND round(
             |    list_sum(list_transform(range(1, 65),
             |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(range(1, 65),
             |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(range(1, 65),
             |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 4) >= 0.35
             |ORDER BY vec_a, vec_b""".stripMargin))
  )
}
