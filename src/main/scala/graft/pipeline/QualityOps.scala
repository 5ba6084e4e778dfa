package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a large-scale training-data pipeline runs
  * between ingestion and dedup (the training-data mandate, extending
  * [[TextOps]]): PII redaction, corpus vocabulary, unigram-LM document
  * scoring, and Gopher-style repetition signals (Rae et al. 2021,
  * "Scaling Language Models" §A1.1 — the repetition filters).
  *
  * All four are oracle-checked. The fixture text is synthetic word
  * soup with no real PII, so `q_pii_scrub` INJECTS deterministic
  * entities (from `doc_id`) identically on both engines — what the
  * hash check then verifies is exactly the part that can diverge: the
  * regex dialect semantics (Java regex vs RE2) over the same bytes.
  */
object QualityOps extends QueryModule {

  /** Redaction patterns, restricted to the dialect intersection of
    * Java regex and RE2 (character classes + bounded repetition; no
    * lookaround, no backreferences) so Spark and DuckDB agree
    * byte-for-byte.
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+[0-9]+(-[0-9]+)+"
  private val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def entries: Map[String, QueryDef] = Map(

    // PII scrubbing: inject a deterministic email/phone/SSN per doc,
    // count and redact each class. Narrow codegen'd projection — the
    // 100 TB shape is a zero-shuffle map over the corpus, exactly like
    // q_fingerprint.
    // k-anonymity / l-diversity audit — the re-identification screen
    // run before releasing any person-keyed table (the measurement
    // side of the GDPR story whose enforcement side is q_pii_scrub +
    // the mutation surface): group by the quasi-identifier columns,
    // flag equivalence classes smaller than k (linkable individuals)
    // and classes whose SENSITIVE attribute shows fewer than l
    // distinct values (attribute disclosure even at size ≥ k). ONE
    // hash aggregate over the QI grid — bounded by the QI domain
    // (nations × segments), never customers; the distinct-count runs
    // inside the same aggregate (Spark plans the standard two-phase
    // distinct expand over the grid keys).
    "q_kanon" -> QueryDef(
      (s, dir) => Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          countDistinct(floor(col("c_acctbal") / 1000.0).cast("long"))
            .as("l_sensitive"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("l_sensitive"),
          (col("n") < 5).as("k_risk"),
          (col("l_sensitive") < 3).as("l_risk"))
        .orderBy("c_nationkey", "c_mktsegment"),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
             |    AS BIGINT) AS l_sensitive,
             |  count(*) < 5 AS k_risk,
             |  count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 3 AS l_risk
             |FROM customer GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    "q_pii_scrub" -> QueryDef(
      (s, dir) => {
        val pii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        // fanOut: six regex passes per doc on a single-split scan ran
        // in ONE task (r15 profile: 6 s of 32-core wall on one core);
        // scale-adaptive — identity at production split counts
        Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), pii.as("pii_text"))
          .select(col("doc_id"),
            regexp_count(col("pii_text"), lit(EmailRe)).cast("long").as("n_emails"),
            regexp_count(col("pii_text"), lit(PhoneRe)).cast("long").as("n_phones"),
            regexp_count(col("pii_text"), lit(SsnRe)).cast("long").as("n_ssns"),
            regexp_replace(regexp_replace(regexp_replace(col("pii_text"),
              EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), SsnRe, "<SSN>").as("scrubbed"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             |  CAST(len(regexp_extract_all(pii_text, '$EmailRe')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(pii_text, '\\+[0-9]+(-[0-9]+)+')) AS BIGINT) AS n_phones,
             |  CAST(len(regexp_extract_all(pii_text, '$SsnRe')) AS BIGINT) AS n_ssns,
             |  regexp_replace(regexp_replace(regexp_replace(pii_text,
             |    '$EmailRe', '<EMAIL>', 'g'),
             |    '\\+[0-9]+(-[0-9]+)+', '<PHONE>', 'g'),
             |    '$SsnRe', '<SSN>', 'g') AS scrubbed
             |FROM (
             |  SELECT doc_id,
             |    text || ' contact user' || doc_id || '@mail.example.com or +1-555-01' ||
             |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
             |    ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Gopher quality rules (Rae et al. 2021 §A1.1) as a document
    // FILTER verdict — q_quality_score is a continuous score; this is
    // the published threshold battery a production pipeline actually
    // gates on: word count in [50, 100k], mean word length in [3, 10],
    // ≥80% of words containing a letter, ≥2 stop words. Each rule is a
    // boolean column + the conjunction verdict, so downstream can both
    // filter and audit WHICH rule rejected a document. Zero-shuffle
    // codegen'd projection, like the rest of the hygiene battery.
    "q_gopher_filter" -> QueryDef(
      (s, dir) => {
        val ws = TextFns.words(col("text"))
        val nWords = size(ws).cast("double")
        val meanWl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
        val alphaFrac = size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nWords
        val stopHits = size(filter(ws, w =>
          w.isin("the", "a", "of", "to", "and", "in", "is", "that")))
        val r1 = nWords >= 50 && nWords <= 100000
        val r2 = meanWl >= 3 && meanWl <= 10
        val r3 = alphaFrac >= 0.8
        val r4 = stopHits >= 2
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            r1.as("ok_word_count"), r2.as("ok_mean_word_len"),
            r3.as("ok_alpha_frac"), r4.as("ok_stop_words"),
            (r1 && r2 && r3 && r4).as("keep"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  n_words >= 50 AND n_words <= 100000 AS ok_word_count,
             |  mean_wl >= 3 AND mean_wl <= 10 AS ok_mean_word_len,
             |  alpha_frac >= 0.8 AS ok_alpha_frac,
             |  stop_hits >= 2 AS ok_stop_words,
             |  (n_words >= 50 AND n_words <= 100000) AND (mean_wl >= 3 AND mean_wl <= 10)
             |    AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
             |FROM (
             |  SELECT doc_id,
             |    CAST(len(ws) AS DOUBLE) AS n_words,
             |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) AS mean_wl,
             |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
             |      / len(ws) AS alpha_frac,
             |    len(list_filter(ws, w -> w IN ('the','a','of','to','and','in','is','that')))
             |      AS stop_hits
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // Corpus vocabulary: global top-50 tokens. Explode → hash-agg on
    // the word key (map-side partials absorb the heavy hitters) →
    // TakeOrderedAndProject. No global sort of the vocabulary.
    "q_vocab_topk" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(explode(TextFns.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)
        .limit(50),
      Some("""SELECT w, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |GROUP BY w ORDER BY n DESC, w ASC LIMIT 50""".stripMargin)),

    // topK(k) — the sketch form of q_vocab_topk (ClickHouse's topK
    // aggregate): SpaceSaving heavy hitters with a bounded counter
    // table, map-side-combined, so the shuffle carries
    // partitions × capacity counters however large the vocabulary.
    // ORACLE-CHECKED (the q_topk_weighted argument, r8): SpaceSaving
    // is EXACT (err = 0, counts = true counts) whenever its counter
    // table covers the key domain — with capacity ≥ |vocab| no
    // insert ever evicts, in ANY partition layout or merge order —
    // and the fixture vocabulary is generator-fixed (31 words at
    // every SF) under the 8·k = 80 default capacity. The declared
    // output therefore equals the exact top-k and the driver
    // hash-compares it; SketchAggSpec guards the capacity-covers-
    // vocabulary precondition and keeps the eviction path honest on
    // an over-capacity synthetic stream.
    "q_topk_sketch" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(explode(TextFns.words(col("text"))).as("w"))
        .agg(graft.functions.TopKAgg(col("w"), 10).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.item").as("w"), col("t.count").as("n"), col("t.err").as("err"))
        .orderBy(col("n").desc, col("w").asc),
      Some("""SELECT w, CAST(count(*) AS BIGINT) AS n,
             |  CAST(0 AS BIGINT) AS err
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |GROUP BY w ORDER BY n DESC, w ASC LIMIT 10""".stripMargin)),

    // topKWeighted(k) — which sources contribute the most BYTES (the
    // curation question behind training-mix decisions): each document
    // adds its char count, not 1, to its source's counter. Same
    // bounded SpaceSaving table and shuffle shape as q_topk_sketch.
    // ORACLE-CHECKED: SpaceSaving is EXACT (err = 0, true totals)
    // whenever its counter table covers the key domain, and the
    // source domain here is fixed by construction (20 sources at
    // every SF) — so the declared output equals the groupBy-sum
    // top-k and the driver hash-compares it; SketchAggSpec guards
    // the capacity-covers-domain precondition.
    "q_topk_weighted" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .agg(graft.functions.TopKAgg.weighted(
          col("source"), col("n_chars").cast("long"), 5).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.item").as("source"), col("t.count").as("total_chars"),
          col("t.err").as("err"))
        .orderBy(col("total_chars").desc, col("source").asc),
      Some("""SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(0 AS BIGINT) AS err
             |FROM documents GROUP BY source
             |ORDER BY total_chars DESC, source ASC LIMIT 5""".stripMargin)),

    // Unigram-LM document scoring: bits/token of each document under
    // the corpus's own unigram distribution — the classic perplexity
    // quality signal (high = off-distribution / junk). Two shuffles
    // (vocab count on word; token↔prob join on word) + one doc-keyed
    // aggregate; the corpus total is a broadcast 1-row join.
    // Interpolated BIGRAM LM scoring — the CCNet-style upgrade of the
    // unigram q_doc_lm_score: P(w|prev) = 0.7·c₂(prev,w)/c₁(prev) +
    // 0.3·c₁(w)/T, first token of each doc backs off to the unigram.
    // Scale shape: the corpus collapses to the unigram and bigram
    // GRIDS (two hash aggregates, map-side combined); scoring is
    // grid-keyed joins (bigram left join for unseen pairs) + ONE
    // per-doc lag window (bounded frames, partitioned by doc) + one
    // doc-keyed re-aggregation. No per-doc token list materializes.
    "q_doc_lm_bigram" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Tokens and the lagged sequence are each MATERIALIZED once:
        // without the checkpoints Catalyst planned FIVE independent
        // Scan+Generate subtrees of documents (uni built three times —
        // for the join, for tot, for uniPrev — and the per-doc lag
        // window twice), re-tokenizing the whole corpus per subtree
        // (r15 plan audit: 5 scans → 1 scan + 1 window). Token-scale
        // rows, the same rows every branch needs anyway; guide §2.4 /
        // §3.3 (materialize to stop duplicate subtrees).
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), posexplode(TextFns.words(col("text"))))
          .toDF("doc_id", "pos", "w")
        val seq = toks.withColumn("prev",
            lag("w", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
          .localCheckpoint()
        val uni = seq.groupBy("w").agg(count(lit(1)).as("c1"))
          .localCheckpoint()
        val tot = uni.agg(sum("c1").as("t"))
        val bi = seq.filter(col("prev").isNotNull)
          .groupBy("prev", "w").agg(count(lit(1)).as("c2"))
        val uniPrev = uni.select(col("w").as("prev"), col("c1").as("c1p"))
        val p = when(col("prev").isNull,
            col("c1").cast("double") / col("t"))
          .otherwise(
            lit(0.7) * coalesce(col("c2"), lit(0L)).cast("double") / col("c1p") +
            lit(0.3) * col("c1").cast("double") / col("t"))
        seq.join(uni, Seq("w"))
          .join(broadcast(tot))
          .join(bi, Seq("prev", "w"), "left")
          .join(uniPrev, Seq("prev"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            round(avg(-log2(p)) + 1e-9, 4).as("bits_per_token"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, i AS pos, ws[i] AS w
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |       UNNEST(generate_series(1, len(ws))) AS u(i)),
             |seq AS (
             |  SELECT doc_id, w,
             |         lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             |  FROM toks),
             |uni AS (SELECT w, count(*) AS c1 FROM toks GROUP BY w),
             |tot AS (SELECT sum(c1) AS t FROM uni),
             |bi AS (SELECT prev, w, count(*) AS c2 FROM seq
             |       WHERE prev IS NOT NULL GROUP BY prev, w)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  round(avg(-log2(
             |    CASE WHEN seq.prev IS NULL THEN CAST(uni.c1 AS DOUBLE) / tot.t
             |         ELSE 0.7 * CAST(coalesce(bi.c2, 0) AS DOUBLE) / up.c1 +
             |              0.3 * CAST(uni.c1 AS DOUBLE) / tot.t END)) + 1e-9, 4)
             |    AS bits_per_token
             |FROM seq
             |JOIN uni USING (w)
             |CROSS JOIN tot
             |LEFT JOIN bi ON seq.prev = bi.prev AND seq.w = bi.w
             |LEFT JOIN uni up ON seq.prev = up.w
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "q_doc_lm_score" -> QueryDef(
      (s, dir) => {
        // One tokenization, one vocab count: un-materialized, the
        // token subtree planned 3× (wc, tot-via-wc, join input) —
        // same duplicate-subtree fix as q_doc_lm_bigram (guide §2.4).
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("w"))
          .localCheckpoint()
        val wc = toks.groupBy("w").agg(count(lit(1)).as("c")).localCheckpoint()
        val tot = wc.agg(sum("c").as("t"))
        toks.join(wc, Seq("w")).join(broadcast(tot))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            round(avg(-log2(col("c").cast("double") / col("t"))), 4).as("bits_per_token"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
             |tot AS (SELECT sum(c) AS t FROM wc)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |       round(avg(-log2(CAST(c AS DOUBLE) / t)), 4) AS bits_per_token
             |FROM toks JOIN wc USING (w) CROSS JOIN tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data"): partition the corpus into head/middle/tail thirds by
    // LM bits-per-token — the canonical quality triage every CC-style
    // pipeline ships. Scale shape: bucket THRESHOLDS come from the
    // rounded-score VALUE GRID (distinct 4-decimal scores — a bounded
    // domain, the q_agg_percentile trick), so the only window runs
    // over grid rows, never documents; each doc then picks its bucket
    // through an equi-join on its grid value. A doc-scale
    // ntile()-over-everything would funnel the corpus through one
    // task. Ties share a bucket by construction (same rounded score ⇒
    // same bucket), which is also what makes the split deterministic
    // and engine-portable.
    "q_ccnet_buckets" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
        // toks / wc / perDoc are MATERIALIZED: toks feeds the vocab
        // count and the scoring join, wc feeds tot and the join,
        // perDoc feeds the threshold grid and the final bucket join —
        // un-checkpointed, Catalyst re-tokenized the corpus per
        // consumer (r15 plan audit: 6 scans of documents → 1).
        // Token-/vocab-/doc-scale respectively; guide §2.4.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("w"))
          .localCheckpoint()
        val wc = toks.groupBy("w").agg(count(lit(1)).as("c")).localCheckpoint()
        val tot = wc.agg(sum("c").as("t"))
        val perDoc = toks.join(wc, Seq("w")).join(broadcast(tot))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            round(avg(-log2(col("c").cast("double") / col("t"))), 4).as("bits"))
          .localCheckpoint()
        val grid = perDoc.groupBy("bits").agg(count(lit(1)).as("gc"))
        val cumW = w.orderBy("bits")
          .rowsBetween(w.unboundedPreceding, -1)
        val totW = w.partitionBy()
          .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
        val bucketed = grid
          .withColumn("cum_before", coalesce(sum("gc").over(cumW), lit(0L)))
          .withColumn("total", sum("gc").over(totW))
          .withColumn("bucket",
            when(col("cum_before") < col("total") / 3.0, "head")
              .when(col("cum_before") < col("total") * 2 / 3.0, "middle")
              .otherwise("tail"))
          .select("bits", "bucket")
        perDoc.join(bucketed, Seq("bits"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").cast("long").as("n_tokens"),
            min("bits").as("min_bits"), max("bits").as("max_bits"))
          .orderBy("bucket")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
             |tot AS (SELECT sum(c) AS t FROM wc),
             |per_doc AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |         round(avg(-log2(CAST(c AS DOUBLE) / t)), 4) AS bits
             |  FROM toks JOIN wc USING (w) CROSS JOIN tot GROUP BY doc_id),
             |grid AS (SELECT bits, count(*) AS gc FROM per_doc GROUP BY bits),
             |marked AS (
             |  SELECT bits,
             |    coalesce(sum(gc) OVER (ORDER BY bits
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
             |    sum(gc) OVER () AS total
             |  FROM grid),
             |bucketed AS (
             |  SELECT bits, CASE WHEN cum_before < total / 3.0 THEN 'head'
             |                    WHEN cum_before < 2 * total / 3.0 THEN 'middle'
             |                    ELSE 'tail' END AS bucket
             |  FROM marked)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |       min(bits) AS min_bits, max(bits) AS max_bits
             |FROM per_doc JOIN bucketed USING (bits)
             |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Benchmark decontamination: flag training documents sharing word
    // 5-grams with a held-out benchmark slice (doc_id % 97 == 0 — a
    // deterministic stand-in for an eval set). The canonical
    // train-on-test guard every serious pretraining pipeline runs.
    // Shape: 5-grams from one window pass (4 leads over the positional
    // explode, codegen'd), benchmark grams deduplicated, one equi-join
    // on the gram string keyed by gram — at real scale the benchmark
    // side is small and broadcasts; nothing is quadratic.
    "q_decontaminate" -> QueryDef(
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextFns.words(col("text"))).as(Seq("pos", "w")))
        val nw = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        val grams = toks.select(col("doc_id"),
            concat(col("w"),
              lit(" "), lead("w", 1).over(nw), lit(" "), lead("w", 2).over(nw),
              lit(" "), lead("w", 3).over(nw), lit(" "), lead("w", 4).over(nw)).as("g"))
          .filter(col("g").isNotNull)
          // MATERIALIZED: the bench side and the candidate side both
          // consume it — un-checkpointed, the corpus was re-tokenized
          // and re-windowed per side (r15 plan audit: 2 scans → 1).
          .localCheckpoint()
        val bench = grams.filter(col("doc_id") % 97 === 0)
          .select("g").distinct().withColumn("hit", lit(1L))
        grams.filter(col("doc_id") % 97 =!= 0)
          .join(bench, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_grams"),
            sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hit"))
          .select(col("doc_id"), col("n_grams"), col("n_hit"),
            round(col("n_hit").cast("double") / col("n_grams"), 4).as("overlap_frac"),
            (col("n_hit").cast("double") / col("n_grams") >= 0.05).as("contaminated"))
          .orderBy("doc_id")
      },
      Some("""WITH grams AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
             |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
             |         ws[i+3] || ' ' || ws[i+4])) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
             |SELECT t.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  round(CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
             |        count(*), 4) AS overlap_frac,
             |  CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
             |        count(*) >= 0.05 AS contaminated
             |FROM grams t LEFT JOIN bench b USING (g)
             |WHERE t.doc_id % 97 <> 0
             |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // Sequence packing: assign documents to fixed token-budget bins
    // (2048 tokens), greedy in doc_id order per source — the layout
    // step between curation and tokenization that turns a corpus into
    // training sequences. One window pass per source key; bin_id is a
    // pure function of the running total, so the packing is
    // deterministic at any parallelism.
    "q_pack_sequences" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextFns.words(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / 2048.0).cast("long").as("bin_id"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_tokens,
             |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id
             |FROM (SELECT doc_id, source,
             |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |        CAST(sum(len(string_split(text, ' '))) OVER (
             |          PARTITION BY source ORDER BY doc_id
             |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic MLM mask construction — the BERT-style training
    // example builder, with the usual RNG replaced by a position-keyed
    // hash (the q_epoch_shuffle move): token (doc, pos) is masked iff
    // the first hex digit of md5(doc:pos) is 0 or 1 — an exact 1/8
    // rate, reproducible across engines, restarts, and shards (a
    // failed shard rebuilds ITS examples bit-identically; no mask
    // state is ever stored). Zero-shuffle explode + one doc-keyed
    // re-aggregation; the emitted (token count, mask count, masked
    // position checksum) hash-pins the mask pattern itself.
    "q_mlm_mask" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextFns.words(col("text"))).as(Seq("pos", "word")))
        .withColumn("masked",
          substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string"))), 1, 1).isin("0", "1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
          sum(when(col("masked"), col("pos").cast("long")).otherwise(0L))
            .as("masked_pos_sum"))
        .orderBy("doc_id"),
      Some("""WITH w AS (
             |  SELECT doc_id, i - 1 AS pos
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |       UNNEST(generate_series(1, len(ws))) AS u(i)),
             |m AS (
             |  SELECT doc_id, pos,
             |    substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1)
             |      IN ('0', '1') AS masked
             |  FROM w)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
             |  CAST(sum(CASE WHEN masked THEN pos ELSE 0 END) AS BIGINT) AS masked_pos_sum
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Deterministic T5-style span corruption (Raffel et al. 2020) —
    // q_mlm_mask's sibling for encoder-decoder training: contiguous
    // 3-token spans are corrupted instead of independent positions. A
    // position SEEDS a span iff the first hex digit of md5(doc#pos) is
    // 0 (1/16 rate); a position is corrupted iff a seed sits at
    // pos, pos-1, or pos-2 (overlapping spans merge; spans truncate at
    // the doc end by construction); a span STARTS where a position is
    // corrupted but its predecessor is not — all of which evaluates
    // ROW-LOCALLY from ≤4 hash probes per token, so the whole mask is
    // a zero-shuffle posexplode + one doc-keyed re-aggregation: no
    // window, no self-join, reproducible across engines/restarts/
    // shards exactly like the MLM mask. The emitted (token, corrupted,
    // span counts, position checksum) hash-pin the span pattern.
    "q_span_corruption" -> QueryDef(
      (s, dir) => {
        def seed(p: org.apache.spark.sql.Column) =
          substring(md5(concat(col("doc_id").cast("string"), lit("#"),
            p.cast("string"))), 1, 1) === "0"
        val s0 = seed(col("pos"))
        val s1 = col("pos") >= 1 && seed(col("pos") - 1)
        val s2 = col("pos") >= 2 && seed(col("pos") - 2)
        val s3 = col("pos") >= 3 && seed(col("pos") - 3)
        Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
            posexplode(TextFns.words(col("text"))).as(Seq("pos", "word")))
          .withColumn("corrupted", s0 || s1 || s2)
          .withColumn("span_start", (s0 || s1 || s2) && !(s1 || s2 || s3))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("corrupted"), 1L).otherwise(0L)).as("n_corrupted"),
            sum(when(col("span_start"), 1L).otherwise(0L)).as("n_spans"),
            sum(when(col("corrupted"), col("pos").cast("long")).otherwise(0L))
              .as("corrupted_pos_sum"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, i - 1 AS pos
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |       UNNEST(generate_series(1, len(ws))) AS u(i)),
             |s AS (
             |  SELECT doc_id, pos,
             |    substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(pos AS VARCHAR)), 1, 1) = '0' AS s0,
             |    pos >= 1 AND substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(pos - 1 AS VARCHAR)), 1, 1) = '0' AS s1,
             |    pos >= 2 AND substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(pos - 2 AS VARCHAR)), 1, 1) = '0' AS s2,
             |    pos >= 3 AND substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(pos - 3 AS VARCHAR)), 1, 1) = '0' AS s3
             |  FROM w)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN s0 OR s1 OR s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
             |  CAST(sum(CASE WHEN (s0 OR s1 OR s2) AND NOT (s1 OR s2 OR s3) THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
             |  CAST(sum(CASE WHEN s0 OR s1 OR s2 THEN pos ELSE 0 END) AS BIGINT) AS corrupted_pos_sum
             |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    // Training of Language Models to Fill in the Middle") — the
    // autoregressive-infilling data augmentation: half the corpus is
    // split prefix|middle|suffix at document-keyed pseudo-random cut
    // points and re-serialized sentinel-first (PSM) or suffix-first
    // (SPM, 50/50), the rest passes through. RNG is replaced by md5
    // digits of the doc id (the q_span_corruption discipline), so
    // both engines derive identical cuts — Spark converts the hex
    // via conv(_,16,10), the oracle via a strpos digit lookup: two
    // independent routes to the same integers. Cut arithmetic is
    // exact integer div; every selected doc gets non-empty P/M/S
    // (p ≤ n−2, m ≤ n−p−1 by construction). The emitted md5 of the
    // re-serialized string hash-pins the whole transform without
    // shipping corpus text through the compare. Zero-shuffle
    // codegen'd projection — the 100 TB shape is a pure scan-side
    // map, same cost class as q_pii_scrub.
    "q_fim_transform" -> QueryDef(
      (s, dir) => {
        val h = md5(concat(col("doc_id").cast("string"), lit(":fim")))
        def hexAt(p: Int, len: Int) =
          conv(substring(h, p, len), 16, 10).cast("long")
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("n"),
            hexAt(1, 1).as("d0"), hexAt(2, 1).as("d1"),
            hexAt(3, 2).as("c1"), hexAt(5, 2).as("c2"))
          .withColumn("mode",
            when(col("d0") >= 8 || col("n") < 3, "none")
              .when(col("d1") < 8, "psm").otherwise("spm"))
          .withColumn("p_len",
            when(col("mode") === "none", col("n"))
              .otherwise(lit(1) + expr("c1 * (n - 2) div 256")))
          .withColumn("m_len",
            when(col("mode") === "none", 0L)
              .otherwise(lit(1) + expr("c2 * (n - p_len - 1) div 256")))
          .withColumn("s_len", col("n") - col("p_len") - col("m_len"))
          .withColumn("fim_md5", md5(
            when(col("mode") === "none", col("text"))
              .when(col("mode") === "psm", concat(
                lit("<P>"), col("text").substr(lit(1), col("p_len")),
                lit("<S>"), col("text").substr(
                  col("p_len") + col("m_len") + 1, col("s_len")),
                lit("<M>"), col("text").substr(
                  col("p_len") + 1, col("m_len"))))
              .otherwise(concat(
                lit("<S>"), col("text").substr(
                  col("p_len") + col("m_len") + 1, col("s_len")),
                lit("<P>"), col("text").substr(lit(1), col("p_len")),
                lit("<M>"), col("text").substr(
                  col("p_len") + 1, col("m_len"))))))
          .select("doc_id", "mode", "p_len", "m_len", "s_len", "fim_md5")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
             |    md5(CAST(doc_id AS VARCHAR) || ':fim') AS h
             |  FROM documents),
             |hx AS (
             |  SELECT doc_id, text, n,
             |    strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS d0,
             |    strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS d1,
             |    (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
             |      + strpos('0123456789abcdef', substr(h, 4, 1)) - 1 AS c1,
             |    (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
             |      + strpos('0123456789abcdef', substr(h, 6, 1)) - 1 AS c2
             |  FROM d),
             |m AS (
             |  SELECT doc_id, text, n, c2,
             |    CASE WHEN d0 >= 8 OR n < 3 THEN 'none'
             |         WHEN d1 < 8 THEN 'psm' ELSE 'spm' END AS mode,
             |    CASE WHEN d0 >= 8 OR n < 3 THEN n
             |         ELSE 1 + c1 * (n - 2) // 256 END AS p_len
             |  FROM hx),
             |mm AS (
             |  SELECT doc_id, text, n, mode, p_len,
             |    CASE WHEN mode = 'none' THEN 0
             |         ELSE 1 + c2 * (n - p_len - 1) // 256 END AS m_len
             |  FROM m)
             |SELECT doc_id, mode,
             |  CAST(p_len AS BIGINT) AS p_len, CAST(m_len AS BIGINT) AS m_len,
             |  CAST(n - p_len - m_len AS BIGINT) AS s_len,
             |  md5(CASE mode WHEN 'none' THEN text
             |    WHEN 'psm' THEN '<P>' || substr(text, 1, CAST(p_len AS INT))
             |      || '<S>' || substr(text, CAST(p_len + m_len + 1 AS INT), CAST(n - p_len - m_len AS INT))
             |      || '<M>' || substr(text, CAST(p_len + 1 AS INT), CAST(m_len AS INT))
             |    ELSE '<S>' || substr(text, CAST(p_len + m_len + 1 AS INT), CAST(n - p_len - m_len AS INT))
             |      || '<P>' || substr(text, 1, CAST(p_len AS INT))
             |      || '<M>' || substr(text, CAST(p_len + 1 AS INT), CAST(m_len AS INT))
             |  END) AS fim_md5
             |FROM mm ORDER BY doc_id""".stripMargin)),

    // Context-window chunking — packing's sibling (q_pack_sequences
    // concatenates SHORT docs into bins; this splits LONG docs into
    // overlapping max-length windows, the other half of every
    // training-data layout): 64-token chunks on a 48-token stride
    // (16-token overlap carries context across boundaries). Chunk
    // starts are pure arithmetic over the token COUNT — zero-shuffle
    // scan, explode bounded by ⌈tokens/stride⌉ per doc, each chunk's
    // stats fold row-locally over the slice (the corpus text never
    // shuffles). The emitted surface (count, char mass, boundary
    // tokens) hash-pins the slice content without materializing
    // chunk text through the driver compare.
    "q_chunk_docs" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
        .withColumn("n", size(col("ws")))
        .select(col("doc_id"), col("ws"), col("n"),
          // greatest(0, …) pins the n=0 edge: Spark's sequence(0, -1)
          // yields a DESCENDING [0, -1] while DuckDB's generate_series
          // is empty — unreachable today (split gives [""] for empty
          // text) but defined if tokenization ever changes.
          explode(sequence(lit(0),
            greatest(lit(0), floor((col("n") - 1) / 48.0)).cast("int")))
            .as("chunk_id"))
        .withColumn("st", col("chunk_id") * 48)
        .withColumn("chunk", expr("slice(ws, st + 1, least(64, n - st))"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          expr("aggregate(chunk, 0L, (a, x) -> a + length(x))")
            .as("chunk_chars"),
          expr("element_at(chunk, 1)").as("first_tok"),
          expr("element_at(chunk, -1)").as("last_tok"))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws,
             |    len(string_split(text, ' ')) AS n
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, ws, n,
             |    unnest(generate_series(0, CAST(greatest(0, floor((n - 1) / 48.0)) AS INT))) AS chunk_id
             |  FROM d),
             |sliced AS (
             |  SELECT doc_id, chunk_id,
             |    list_slice(ws, chunk_id * 48 + 1, least(chunk_id * 48 + 64, n)) AS chunk
             |  FROM c)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
             |  CAST(list_sum(list_transform(chunk, x -> length(x))) AS BIGINT)
             |    AS chunk_chars,
             |  chunk[1] AS first_tok,
             |  chunk[-1] AS last_tok
             |FROM sliced ORDER BY doc_id, chunk_id""".stripMargin)),

    // Length-bucketed batching: the alternative layout to greedy
    // packing (q_pack_sequences) — group documents into power-of-two
    // token-length buckets and measure the padding bill per bucket
    // (the dynamic-batching shape every trainer's dataloader wants).
    // One map-side-combined hash aggregate over a scan-side CASE
    // ladder; the result is the bucket grid (sources × ~8 buckets),
    // never rows. Docs over the top bucket truncate (pad 0), so
    // waste_pct isolates padding, not truncation.
    "q_length_buckets" -> QueryDef(
      (s, dir) => {
        val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
        val nTok = size(TextFns.words(col("text"))).cast("long")
        val bucket = caps.tail
          .foldLeft(when(nTok <= caps.head, caps.head)) {
            case (acc, c) => acc.when(nTok <= c, c)
          }.otherwise(2048L)
        Tables(s, dir, "documents")
          .select(col("source"), nTok.as("n_tokens"), bucket.as("bucket"))
          .groupBy("source", "bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("sum_tokens"),
            sum(col("bucket") - least(col("n_tokens"), col("bucket"))).as("pad_tokens"))
          .withColumn("waste_pct",
            round(col("pad_tokens").cast("double") /
              (col("n_docs") * col("bucket")) + lit(1e-9), 4))
          .select("source", "bucket", "n_docs", "sum_tokens", "pad_tokens", "waste_pct")
          .orderBy("source", "bucket")
      },
      Some("""WITH t AS (
             |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |b AS (
             |  SELECT source, n_tokens,
             |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
             |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
             |         WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
             |         WHEN n_tokens <= 1024 THEN 1024 ELSE 2048 END AS bucket
             |  FROM t)
             |SELECT source, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             |  CAST(sum(bucket - least(n_tokens, bucket)) AS BIGINT) AS pad_tokens,
             |  round(CAST(sum(bucket - least(n_tokens, bucket)) AS DOUBLE) /
             |        (count(*) * bucket) + 1e-9, 4) AS waste_pct
             |FROM b GROUP BY source, bucket
             |ORDER BY source, bucket""".stripMargin)),

    // Gopher-style repetition signals: duplicate-word fraction, top
    // word's frequency share, duplicate-2-gram fraction, and the keep
    // decision at the paper's thresholds-in-spirit. 2-grams come from a
    // window `lead` over the positional explode — fully codegen'd,
    // where the per-row `transform(sequence, element_at)` HOF build is
    // an interpreted lambda and measured 5× slower on the same data.
    // Everything shuffles on the doc key only. (The oracle builds its
    // gram list with DuckDB's list_transform — different construction,
    // identical grams, which IS the point of the hash check.)
    "q_repetition" -> QueryDef(
      (s, dir) => {
        // toks is MATERIALIZED: the word-stats and bigram-stats branches
        // otherwise each re-tokenize the corpus (r15 plan audit: 2
        // scans+Generates of documents → 1). Token-scale; guide §2.4.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextFns.words(col("text"))).as(Seq("pos", "w")))
          .localCheckpoint()
        val wordStats = toks
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as("n_words"), max("c").as("top_c"), count(lit(1)).as("n_distinct"))
        val nextW = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        val gramStats = toks
          // concat (not concat_ws) so the final position's missing lead
          // nulls the gram out instead of truncating it to one word
          .select(col("doc_id"),
            concat(col("w"), lit(" "), lead("w", 1).over(nextW)).as("g"))
          .filter(col("g").isNotNull)
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as("n_grams"), count(lit(1)).as("n_distinct_grams"))
        wordStats.join(gramStats, Seq("doc_id"))
          .select(col("doc_id"),
            round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 4)
              .as("dup_word_frac"),
            round(col("top_c").cast("double") / col("n_words"), 4).as("top_word_frac"),
            round(lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"), 4)
              .as("dup_2gram_frac"),
            (col("top_c").cast("double") / col("n_words") <= 0.2).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws,
             |         list_transform(range(1, len(string_split(text, ' '))),
             |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]) AS gs
             |  FROM documents),
             |wstats AS (
             |  SELECT doc_id, sum(c) AS n_words, max(c) AS top_c, count(*) AS n_distinct
             |  FROM (SELECT doc_id, w, count(*) AS c
             |        FROM (SELECT doc_id, unnest(ws) AS w FROM docs) GROUP BY doc_id, w)
             |  GROUP BY doc_id),
             |gstats AS (
             |  SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct_grams
             |  FROM (SELECT doc_id, g, count(*) AS c
             |        FROM (SELECT doc_id, unnest(gs) AS g FROM docs) GROUP BY doc_id, g)
             |  GROUP BY doc_id)
             |SELECT doc_id,
             |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_word_frac,
             |  round(CAST(top_c AS DOUBLE) / n_words, 4) AS top_word_frac,
             |  round(1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams, 4) AS dup_2gram_frac,
             |  CAST(top_c AS DOUBLE) / n_words <= 0.2 AS keep
             |FROM wstats JOIN gstats USING (doc_id)
             |ORDER BY doc_id""".stripMargin))
  )
}
