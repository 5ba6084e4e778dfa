package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly — the operations between "curated documents" and
  * "tensors on a trainer": stratified downsampling to a target language
  * mix, weighted epoch repetition per source (data mixing), and the
  * deterministic global shuffle into training shards.
  *
  * All three are pure functions of stored keys (md5 — the one keyed
  * hash Spark and DuckDB share bit-for-bit, same rationale as
  * `q_sample`), so every run, every engine, and every retry of a failed
  * shard produces the identical corpus — reproducibility is the whole
  * point of hash-based sampling over `rand()`.
  */
object Mixing extends QueryModule {

  /** Per-language keep rates as hex thresholds on the first two md5
    * nibbles (256ths): en 25/256 ≈ 10 %, zh 51/256 ≈ 20 %, es 76/256 ≈
    * 30 %, de 128/256 = 50 %, fr 204/256 ≈ 80 % — the shape of a
    * rebalancing pass that downsamples an English-heavy crawl.
    */
  private val LangThresholds: Seq[(String, String)] =
    Seq("en" -> "19", "zh" -> "33", "es" -> "4c", "de" -> "80", "fr" -> "cc")

  /** Epoch repeat factor per source: sources cycle through weights
    * 1..4 (substr of the source id keeps the oracle trivially
    * expressible; a real run would join a curated weights table).
    */
  private val MixCycle = 4

  /** Temperature exponent for q_mix_temperature (α = 1/T; 0.5 ≈ the
    * mT5 paper's α=0.3–0.7 band) and the fixed sampling budget the
    * per-language targets are sized out of.
    */
  private val MixAlpha = 0.5
  private val MixBudget = 100000

  def entries: Map[String, QueryDef] = Map(

    // Stratified consistent-hash sampling: each language keeps a
    // different deterministic fraction. At 100 TB this is a SCAN-SIDE
    // residual filter — no shuffle, no per-group pass, no driver state;
    // and because membership is a pure function of doc_id, two tables
    // sampled with the same key still join (rand()/TABLESAMPLE cannot
    // give either property).
    "q_sample_stratified" -> QueryDef(
      (s, dir) => {
        val thr = LangThresholds.tail
          .foldLeft(when(col("lang") === LangThresholds.head._1, LangThresholds.head._2)) {
            case (acc, (l, t)) => acc.when(col("lang") === l, t)
          }.otherwise("00")
        Tables(s, dir, "documents")
          .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, source
              |FROM documents
              |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              |      CASE lang ${LangThresholds.map { case (l, t) => s"WHEN '$l' THEN '$t'" }.mkString(" ")} ELSE '00' END
              |ORDER BY doc_id""".stripMargin)),

    // Weighted data mixing: repeat each document `weight` times
    // (epochs 1..weight), the standard up-sampling of high-quality
    // sources in a training mix. A generator flat-map — row-local, no
    // shuffle, output size = Σ weights; at 100 TB the repeat factor is
    // metadata (epoch column), not copied bytes, until the final
    // materialization.
    "q_mix_weighted" -> QueryDef(
      (s, dir) => {
        // 2-arg substring (the whole suffix) — the 3-arg form would
        // silently truncate a >4-digit source id where the oracle's
        // substr(source, 4) would not
        val w = expr("substring(source, 4)").cast("long") % MixCycle + 1
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(sequence(lit(1L), w)).as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some(s"""SELECT doc_id, source,
              |       unnest(generate_series(1, CAST(substr(source, 4) AS BIGINT) % $MixCycle + 1)) AS epoch
              |FROM documents
              |ORDER BY doc_id, epoch""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis–Spirakis
    // A-ES): per source, keep the k docs with the largest
    // ln(u)/weight where u is a DETERMINISTIC md5-derived uniform —
    // the length-weighted pick every curation pass runs ("sample k
    // docs per source, longer docs proportionally more likely"),
    // reproducible across runs/engines/retries like every sampler
    // here (rand() gives none of that). The first 13 md5 hex digits
    // are 52 bits — exact in a double on both engines — and ties are
    // broken on doc_id, so the ranking is engine-stable. Scale shape:
    // a scan-side key projection + the per-source top-k window
    // (q_topk_per_group's shape) — no global sort, no driver state.
    "q_sample_weighted" -> QueryDef(
      (s, dir) => {
        val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double") + 0.5) / pow(lit(2.0), lit(52))
        val w = Window.partitionBy("source")
          .orderBy(col("es_key").desc, col("doc_id"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            (log(u) / col("n_chars")).as("es_key"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("source"), col("rank"), col("doc_id"),
            round(col("es_key") + lit(1e-9), 6).as("es_key"))
          .orderBy("source", "rank")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, source, n_chars,
             |    ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 0.5)
             |       / power(2, 52)) / n_chars AS es_key
             |  FROM documents)
             |SELECT source, rank, doc_id, round(es_key + 1e-9, 6) AS es_key
             |FROM (SELECT source, doc_id, es_key,
             |        CAST(row_number() OVER (PARTITION BY source
             |          ORDER BY es_key DESC, doc_id) AS BIGINT) AS rank
             |      FROM k)
             |WHERE rank <= 3
             |ORDER BY source, rank""".stripMargin)),

    // Deterministic global shuffle + shard assignment: training order
    // is ORDER BY md5(doc_id) — a reproducible pseudo-random
    // permutation — and the shard is the hash's first nibble range (8
    // shards here), so a failed shard re-derives exactly. Scale shape:
    // the permutation is NEVER a global sort — each shard is one window
    // partition (shuffle on shard, sort within), and production sizes
    // the shard count to the corpus (e.g. ~1 shard/GB), so partitions
    // stay bounded as data grows; a global row_number would serialize
    // on one task.
    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling" — [LLM]): score every
    // document by how target-like it is under two unigram LMs over
    // HASHED n-gram buckets (the paper's trick: a 10k-bucket hashed
    // feature space stands in for the intractable n-gram vocabulary).
    // Features = word bigrams hashed into 1024 buckets (md5-derived —
    // the engine-portable keyed hash, q_sample's rationale); target =
    // the `en` slice, raw = the whole corpus; per-doc log-weight =
    // Σ ln p̂_target(b)/p̂_raw(b) with Laplace smoothing. Scale shape:
    // the corpus collapses to the BOUNDED bucket grid (two counts per
    // bucket, map-side combined), the model is a 1024-row broadcast,
    // and scoring is one broadcast join + a doc-keyed re-aggregation —
    // the model never shuffles with the data. Resampling the weights
    // is q_sample_weighted's A-ES machinery downstream.
    "q_dsir_weights" -> QueryDef(
      (s, dir) => {
        // bigrams by zipping the words array against itself shifted by
        // one — a zero-shuffle scan (a lag window here would shuffle
        // the full token explosion on doc_id for nothing: adjacency is
        // already explicit in the array)
        // fanOut: tokenize + per-bigram md5 on a single-split scan ran
        // in ONE task feeding the checkpoint (r15 profile);
        // scale-adaptive (see Tables.fanOut)
        val bi = Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), col("lang"),
            graft.functions.TextFns.words(col("text")).as("ws"))
          .withColumn("prevs", slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))))
          .withColumn("nexts", slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))))
          .select(col("doc_id"), col("lang"),
            explode(arrays_zip(col("prevs"), col("nexts"))).as("p"))
          .select(col("doc_id"), col("lang"),
            (conv(substring(md5(concat_ws(" ", col("p.prevs"), col("p.nexts"))), 1, 8), 16, 10)
              .cast("long") % 1024).as("b"))
          // referenced twice (bucket counts + scoring join) — materialize
          // so the explode+md5 subtree runs once (signatures' rationale:
          // localCheckpoint, so the ContextCleaner reclaims the blocks)
          .localCheckpoint()
        val cnt = bi.groupBy("b").agg(
          count(lit(1)).as("c_r"),
          count(when(col("lang") === "en", 1)).as("c_t"))
        val tot = cnt.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
        val lw = cnt.join(broadcast(tot))
          .select(col("b"),
            (log((col("c_t") + 1).cast("double") / (col("n_t") + 1024)) -
             log((col("c_r") + 1).cast("double") / (col("n_r") + 1024))).as("lw"))
        bi.join(broadcast(lw), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_grams"),
            round(sum("lw") + lit(1e-9), 4).as("log_weight"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, i AS pos, ws[i] AS w
             |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
             |       UNNEST(generate_series(1, len(ws))) AS u(i)),
             |bi AS (
             |  SELECT doc_id, lang,
             |    CAST('0x' || substr(md5(prev || ' ' || w), 1, 8) AS BIGINT) % 1024 AS b
             |  FROM (SELECT doc_id, lang, w,
             |          lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             |        FROM toks)
             |  WHERE prev IS NOT NULL),
             |cnt AS (
             |  SELECT b, count(*) AS c_r,
             |         count(*) FILTER (WHERE lang = 'en') AS c_t
             |  FROM bi GROUP BY b),
             |tot AS (SELECT sum(c_r) AS n_r, sum(c_t) AS n_t FROM cnt),
             |lw AS (
             |  SELECT b,
             |    ln(CAST(c_t + 1 AS DOUBLE) / (n_t + 1024)) -
             |    ln(CAST(c_r + 1 AS DOUBLE) / (n_r + 1024)) AS w
             |  FROM cnt, tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  round(sum(lw.w) + 1e-9, 4) AS log_weight
             |FROM bi JOIN lw USING (b)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Epoch-keyed deterministic shuffle: the training loop needs a
    // DIFFERENT but reproducible corpus order every epoch. Keying the
    // hash by (epoch, doc_id) gives each epoch an independent
    // permutation computed AT READ TIME from the stored corpus — no
    // per-epoch re-shuffle of the data, no state, and a failed shard
    // re-reads its exact slice. Same scale shape as q_shard_assign:
    // scan-side hash, shard-local window, never a global sort.
    "q_epoch_shuffle" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(2))).as("epoch"))
        .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
          md5(concat(col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))).as("h"))
        .withColumn("shard", expr(
          "CAST(floor((instr('0123456789abcdef', substring(h, 1, 1)) - 1) / 2.0) AS BIGINT)"))
        .withColumn("pos", row_number()
          .over(Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")).cast("long"))
        .select("epoch", "doc_id", "shard", "pos")
        .orderBy("epoch", "shard", "pos"),
      Some("""WITH e AS (
             |  SELECT doc_id, unnest(generate_series(0, 2)) AS epoch FROM documents),
             |h AS (
             |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
             |         md5(epoch || ':' || CAST(doc_id AS VARCHAR)) AS h
             |  FROM e),
             |a AS (
             |  SELECT epoch, doc_id, h,
             |         CAST(floor((instr('0123456789abcdef', substr(h, 1, 1)) - 1) / 2.0) AS BIGINT) AS shard
             |  FROM h)
             |SELECT epoch, doc_id, shard,
             |       CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM a
             |ORDER BY epoch, shard, pos""".stripMargin)),

    // Curriculum phasing — order the corpus easy→hard (the classic
    // length curriculum: short documents first) and cut it into 4
    // equal training phases with ntile semantics. The phase assignment
    // is computed DISTRIBUTED: DistRank stamps each doc's global rank
    // in (n_chars, doc_id) order (range repartition + offset stamping
    // — never a single-task global window), and the exact ntile bucket
    // falls out arithmetically from (rank, n): the first n mod 4
    // buckets take ⌈n/4⌉ rows, the rest ⌊n/4⌋ — identical to both
    // engines' ntile. The sorted payload is (n_chars, doc_id) pairs —
    // 16 bytes/doc, never text; the emitted surface is the 4-row phase
    // summary. min_doc_id reports the smallest id per phase (a content
    // fingerprint — the curriculum-FIRST doc is argmin(n_chars, doc_id),
    // a different row).
    "q_curriculum" -> QueryDef(
      (s, dir) => {
        val ranked = graft.operators.DistRank.withPos(
          Tables(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars").asc, col("doc_id").asc), "pos",
          totalCol = Some("n_total"))
        ranked
          .withColumn("q", expr("n_total div 4"))
          .withColumn("r", col("n_total") % 4)
          .withColumn("phase",
            when(col("pos") < col("r") * (col("q") + 1),
              expr("pos div (q + 1)") + 1)
              .otherwise(expr("(pos - r * (q + 1)) div greatest(q, 1L)")
                + col("r") + 1))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            round(avg("n_chars") + 1e-9, 4).as("avg_chars"),
            min("doc_id").as("min_doc_id"))
          .orderBy("phase")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, n_chars,
             |    CAST(ntile(4) OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS phase
             |  FROM documents)
             |SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |  round(avg(n_chars) + 1e-9, 4) AS avg_chars,
             |  min(doc_id) AS min_doc_id
             |FROM p GROUP BY phase ORDER BY phase""".stripMargin)),

    "q_shard_assign" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .withColumn("shard", expr(
          "CAST(floor((instr('0123456789abcdef', substring(h, 1, 1)) - 1) / 2.0) AS BIGINT)"))
        .withColumn("pos", row_number()
          .over(Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos"),
      Some("""WITH s AS (
             |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |a AS (
             |  SELECT doc_id, h,
             |         CAST(floor((instr('0123456789abcdef', substr(h, 1, 1)) - 1) / 2.0) AS BIGINT) AS shard
             |  FROM s)
             |SELECT doc_id, shard,
             |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM a
             |ORDER BY shard, pos""".stripMargin)),

    // Temperature-scaled source mixing (the multilingual-LM sampling
    // rule, e.g. mT5's α-scaling): raise each language's share to the
    // power α < 1, renormalize, and size each language's target draw
    // out of a fixed budget — up-weighting tail languages without
    // flattening the head. Scale shape: the fact table collapses to
    // the per-language count grid FIRST (one map-side-combined hash
    // aggregate); the normalization window runs over that grid, whose
    // size is the language domain (dozens), not the corpus — a
    // single-partition window over bounded metadata, not data.
    "q_mix_temperature" -> QueryDef(
      (s, dir) => {
        val wAll = Window.partitionBy()
        Tables(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", pow(col("n_docs").cast("double"), MixAlpha))
          .withColumn("p", col("w") / sum(col("w")).over(wAll))
          .select(col("lang"), col("n_docs"),
            round(col("p"), 4).as("p"),
            round(col("p") * MixBudget, 0).cast("long").as("target_docs"))
          .orderBy("lang")
      },
      Some(s"""WITH g AS (
              |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              |         pow(CAST(count(*) AS DOUBLE), $MixAlpha) AS w
              |  FROM documents GROUP BY lang)
              |SELECT lang, n_docs,
              |  round(w / sum(w) OVER (), 4) AS p,
              |  CAST(round(w / sum(w) OVER () * $MixBudget, 0) AS BIGINT) AS target_docs
              |FROM g ORDER BY lang""".stripMargin)),

    // Corpus-mixture diversity audit — the data-mixture health check a
    // training pipeline runs before (and after) sampling: per language,
    // how concentrated is the source distribution? Shannon entropy
    // H = −Σ p·ln p (nats, plus the evenness ratio H/ln k), Simpson
    // concentration Σ p² (the probability two random docs share a
    // source — 1/k when perfectly even), and the single largest source
    // share (a head-domain dominance alarm: one crawl swamping a
    // language). Scale shape: the corpus collapses to the (lang ×
    // source) count grid in ONE map-side-combined hash aggregate —
    // O(langs·sources) rows ever after — and the per-lang reduction is
    // a second grid-sized aggregate; no windows, no joins, nothing
    // unbounded past the first exchange.
    "q_source_mix" -> QueryDef(
      (s, dir) => {
        val grid = Tables(s, dir, "documents")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("c"))
        grid
          .groupBy("lang")
          .agg(sum("c").as("n_docs"), count(lit(1)).as("n_sources"),
            // squares in double BEFORE the sum: c² overflows LongType
            // (ANSI throws) once a (lang, source) cell nears 2^31.5
            // docs — reachable at 100 TB. The doubles stay exact (and
            // therefore engine-identical) while every c² < 2^53.
            sum(col("c").cast("double") * col("c")).as("c2"),
            sum(col("c").cast("double") * log(col("c").cast("double")))
              .as("clogc"),
            max("c").as("c_top"))
          // H = ln N − (Σ c·ln c)/N: one pass, no per-row p division —
          // the identity keeps the double chain short and identical on
          // both engines.
          .select(col("lang"), col("n_docs"), col("n_sources"),
            round((log(col("n_docs").cast("double")) -
              col("clogc") / col("n_docs")) + 1e-9, 4).as("shannon"),
            // Degenerate guard: a single-source language has
            // ln(n_sources)=0 and the numerator is a ±1-ulp residual,
            // so the unguarded ratio is ±Inf/NaN. Evenness is
            // undefined at k=1 — emit NULL (mirrored CASE WHEN in the
            // oracle), same discipline as q_ab_ztest's degenerate pool.
            when(col("n_sources") > 1,
              round((log(col("n_docs").cast("double")) -
                col("clogc") / col("n_docs")) /
                log(col("n_sources").cast("double")) + 1e-9, 4)).as("evenness"),
            round(col("c2") /
              (col("n_docs").cast("double") * col("n_docs")) + 1e-9, 4)
              .as("simpson"),
            round(col("c_top").cast("double") / col("n_docs") + 1e-9, 4)
              .as("top_share"))
          .orderBy("lang")
      },
      Some("""WITH grid AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY lang, source),
             |r AS (
             |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
             |    CAST(count(*) AS BIGINT) AS n_sources,
             |    sum(CAST(c AS DOUBLE) * c) AS c2,
             |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc,
             |    CAST(max(c) AS BIGINT) AS c_top
             |  FROM grid GROUP BY lang)
             |SELECT lang, n_docs, n_sources,
             |  round((ln(CAST(n_docs AS DOUBLE)) - clogc / n_docs) + 1e-9, 4)
             |    AS shannon,
             |  CASE WHEN n_sources > 1 THEN
             |    round((ln(CAST(n_docs AS DOUBLE)) - clogc / n_docs) /
             |          ln(CAST(n_sources AS DOUBLE)) + 1e-9, 4) END AS evenness,
             |  round(c2 / (CAST(n_docs AS DOUBLE) * n_docs) + 1e-9, 4) AS simpson,
             |  round(CAST(c_top AS DOUBLE) / n_docs + 1e-9, 4) AS top_share
             |FROM r ORDER BY lang""".stripMargin)),

    // Per-source token-distribution divergence ([LLM] — the mixing
    // diagnostic behind DoReMi/DSIR-style reweighting: HOW FAR each
    // source's unigram distribution sits from the corpus mixture
    // decides whether its weight needs adjusting; KL in nats, plus
    // the entropy/cross-entropy split KL = H× − H so the three
    // numbers are internally checkable). No smoothing needed:
    // KL(P_s ‖ P_corpus) is finite by construction because the corpus
    // CONTAINS every source (p_c(w) > 0 wherever p_s(w) > 0), and
    // absent-from-source words contribute exactly 0. Shape: ONE
    // explode → hash aggregate onto the (source × word) cell grid —
    // the vocabulary domain, not the token stream; per-source totals
    // are a window OVER THE GRID; corpus word totals broadcast
    // (vocab-scale dim join, the dictGet shape) and the grand total
    // rides a 1-row broadcast crossJoin (the anchor-constant idiom).
    // At 100 TB the only row-scale pass is the map-side-combined
    // token count. Determinism: exact integer counts, identical
    // written-out double terms, vocab-bounded sum reassociation
    // absorbed by the 1e-9 round nudge.
    "q_source_kl" -> QueryDef(
      (s, dir) => {
        // cells is MATERIALIZED: the (source, word) grid feeds wtot,
        // tot and the per-source window+join — un-checkpointed,
        // Catalyst re-tokenized the corpus per consumer (r15 plan
        // audit: 3 scans of documents -> 1). Vocab-grid scale; §2.4.
        val cells = Tables(s, dir, "documents")
          .select(col("source"),
            explode(graft.functions.TextFns.words(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val wtot = cells.groupBy(col("w").as("ww"))
          .agg(sum(col("c")).cast("double").as("nw"))
        val tot = cells.agg(sum(col("c")).cast("double").as("n"))
        val g = cells
          .withColumn("cd", col("c").cast("double"))
          .withColumn("ns",
            sum(col("c")).over(Window.partitionBy("source")).cast("double"))
          .join(broadcast(wtot), col("w") === col("ww"))
          .crossJoin(broadcast(tot))
        g.groupBy("source")
          .agg(count(lit(1)).as("n_vocab"),
            sum(col("c")).as("n_tokens"),
            sum(col("cd") / col("ns") *
              log((col("cd") / col("ns")) / (col("nw") / col("n"))))
              .as("kl_r"),
            sum(col("cd") / col("ns") * -log(col("cd") / col("ns")))
              .as("h_r"),
            sum(col("cd") / col("ns") * -log(col("nw") / col("n")))
              .as("x_r"))
          .select(col("source"), col("n_vocab"), col("n_tokens"),
            round(col("kl_r") + 1e-9, 4).as("kl"),
            round(col("h_r") + 1e-9, 4).as("h_source"),
            round(col("x_r") + 1e-9, 4).as("h_cross"))
          .orderBy("source")
      },
      Some("""WITH cells AS (
             |  SELECT source, w, count(*) AS c
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2),
             |g AS (
             |  SELECT source, w, CAST(c AS DOUBLE) AS cd, c,
             |    CAST(sum(c) OVER (PARTITION BY source) AS DOUBLE) AS ns,
             |    CAST(sum(c) OVER (PARTITION BY w) AS DOUBLE) AS nw,
             |    CAST(sum(c) OVER () AS DOUBLE) AS n
             |  FROM cells)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,
             |  CAST(sum(c) AS BIGINT) AS n_tokens,
             |  round(sum(cd / ns * ln((cd / ns) / (nw / n))) + 1e-9, 4) AS kl,
             |  round(sum(cd / ns * -ln(cd / ns)) + 1e-9, 4) AS h_source,
             |  round(sum(cd / ns * -ln(nw / n)) + 1e-9, 4) AS h_cross
             |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    // One DoReMi exponentiated-gradient step (Xie et al. 2023, "DoReMi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    // Algorithm 1's domain-weight update, run as a diagnostic): each
    // source's EXCESS LOSS over the corpus baseline (bits/token under
    // the corpus unigram LM — the q_doc_lm_score proxy at source
    // granularity — minus corpus entropy; the reference-model role)
    // drives a multiplicative weight update from the uniform prior,
    //   α_s ∝ exp(η·max(0, loss_s − H)),  w_s = 0.99·α_s + 0.01/D,
    // the published smoothing shape with η = 1. Scale: everything
    // after the one token-explode hash-aggregate runs on the
    // (source × word) CELL GRID (the q_source_kl discipline — the
    // vocabulary domain, never the token stream); the softmax
    // normalizer and baseline are 1-row broadcasts (q_tfidf scalar
    // pattern). Determinism: exact integer cell counts, the identical
    // written-out double expressions on both engines, grid-bounded
    // sums absorbed by the repo-wide round+1e-9 nudge.
    "q_mix_doremi" -> QueryDef(
      (s, dir) => {
        // cells is MATERIALIZED: the (source, word) grid feeds wtot,
        // tot and the per-source loss join — un-checkpointed, Catalyst
        // re-tokenized the whole corpus per consumer (r15 plan audit:
        // 10 scans of documents -> 1). Vocab-grid scale. Guide §2.4.
        val cells = Tables(s, dir, "documents")
          .select(col("source"),
            explode(graft.functions.TextFns.words(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val wtot = cells.groupBy(col("w").as("ww"))
          .agg(sum(col("c")).cast("double").as("nw"))
        val tot = cells.agg(sum(col("c")).cast("double").as("n"))
        val g = cells
          .withColumn("cd", col("c").cast("double"))
          .withColumn("ns",
            sum(col("c")).over(Window.partitionBy("source")).cast("double"))
          .join(broadcast(wtot), col("w") === col("ww"))
          .crossJoin(broadcast(tot))
        val perSrc = g.groupBy("source")
          .agg(sum(col("c")).as("n_tokens"),
            (sum(col("cd") * -log2(col("nw") / col("n"))) / max(col("ns")))
              .as("loss"))
        val base = wtot.crossJoin(broadcast(tot))
          .agg((sum(col("nw") * -log2(col("nw") / col("n"))) / max(col("n")))
            .as("h"))
        val ex = perSrc.crossJoin(broadcast(base))
          .withColumn("excess", greatest(col("loss") - col("h"), lit(0.0)))
          .withColumn("e", exp(col("excess")))
        val z = ex.agg(sum(col("e")).as("z"),
          count(lit(1)).cast("double").as("d"))
        ex.crossJoin(broadcast(z))
          .select(col("source"), col("n_tokens"),
            round(col("loss") + lit(1e-9), 4).as("loss_bits"),
            round(col("excess") + lit(1e-9), 4).as("excess_bits"),
            round(lit(0.99) * col("e") / col("z") + lit(0.01) / col("d")
              + lit(1e-9), 6).as("weight"))
          .orderBy("source")
      },
      Some("""WITH cells AS (
             |  SELECT source, w, count(*) AS c
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2),
             |g AS (
             |  SELECT source, w, CAST(c AS DOUBLE) AS cd, c,
             |    CAST(sum(c) OVER (PARTITION BY source) AS DOUBLE) AS ns,
             |    CAST(sum(c) OVER (PARTITION BY w) AS DOUBLE) AS nw,
             |    CAST(sum(c) OVER () AS DOUBLE) AS n
             |  FROM cells),
             |src AS (
             |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    sum(cd * -log2(nw / n)) / max(ns) AS loss
             |  FROM g GROUP BY source),
             |base AS (
             |  SELECT sum(nw * -log2(nw / n)) / max(n) AS h
             |  FROM (SELECT DISTINCT w, nw, n FROM g)),
             |ex AS (
             |  SELECT source, n_tokens, loss,
             |    greatest(loss - h, 0.0) AS excess,
             |    exp(greatest(loss - h, 0.0)) AS e
             |  FROM src CROSS JOIN base),
             |z AS (SELECT sum(e) AS z, CAST(count(*) AS DOUBLE) AS d FROM ex)
             |SELECT source, n_tokens,
             |  round(loss + 1e-9, 4) AS loss_bits,
             |  round(excess + 1e-9, 4) AS excess_bits,
             |  round(0.99 * e / z + 0.01 / d + 1e-9, 6) AS weight
             |FROM ex CROSS JOIN z ORDER BY source""".stripMargin)))
}
