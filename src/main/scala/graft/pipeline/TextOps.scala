package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table (SURVEY.md §2.J + the
  * training-data-pipeline mandate): per-document stats, token counting,
  * heuristic language ID, quality scoring, content fingerprinting.
  * Everything is a narrow, codegen'd projection — embarrassingly
  * parallel, zero shuffle except the final deterministic ORDER BY
  * (which only the verify harness needs).
  */
object TextOps extends QueryModule {

  def entries: Map[String, QueryDef] = Map(

    // Per-doc structural stats.
    "q_text_stats" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars"),
          size(TextFns.words(col("text"))).cast("long").as("n_words"),
          round(length(regexp_replace(col("text"), " ", "")).cast("double") /
            size(TextFns.words(col("text"))), 4).as("avg_word_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
             |  CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
             |        len(string_split(text, ' ')), 4) AS avg_word_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Lexical TextTiling (Hearst, CL'97) — topic-shift segmentation
    // for long-document chunking: the doc is carved into 8-word
    // tiles, adjacent tiles score word-set Jaccard, and a boundary
    // falls wherever similarity drops under 0.1 (a lexical valley =
    // a topic shift). The RAG-ingestion alternative to fixed-stride
    // q_chunk_docs: segments follow content, not offsets. Shape:
    // ENTIRELY row-local higher-order functions over the split array
    // (slice → distinct → intersect per adjacent pair) — a
    // zero-shuffle projection at any corpus size. Determinism: every
    // similarity is a small-integer ratio evaluated in the same
    // left-to-right list order on both engines.
    "q_text_tiling" -> QueryDef(
      (s, dir) => {
        val tile = 8
        // fanOut: per-doc tile similarity HOFs on a single-split
        // scan ran in ONE task (r15); scale-adaptive
        val d = Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
          .filter(size(col("ws")) > tile)
          .withColumn("nt", ceil(size(col("ws")).cast("double") / tile).cast("int"))
          .withColumn("tiles", expr(
            s"transform(sequence(0, nt - 1), i -> array_distinct(slice(ws, i * $tile + 1, $tile)))"))
          .withColumn("sims", expr(
            """transform(sequence(0, nt - 2), i ->
              |  size(array_intersect(tiles[i], tiles[i + 1])) /
              |  CAST(size(tiles[i]) + size(tiles[i + 1])
              |       - size(array_intersect(tiles[i], tiles[i + 1])) AS DOUBLE))"""
              .stripMargin))
        d.select(col("doc_id"),
            col("nt").cast("long").as("n_tiles"),
            size(expr("filter(sims, s -> s < 0.1)")).cast("long").as("n_boundaries"),
            (size(expr("filter(sims, s -> s < 0.1)")) + 1).cast("long").as("n_segments"),
            round(expr("aggregate(sims, 0D, (a, x) -> a + x)") / size(col("sims")) +
              lit(1e-9), 4).as("avg_adj_sim"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws,
             |    CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INTEGER) AS nt
             |  FROM documents WHERE len(string_split(text, ' ')) > 8),
             |t AS (
             |  SELECT doc_id, nt,
             |    list_transform(range(0, nt),
             |      i -> list_distinct(ws[(i * 8 + 1):(i * 8 + 8)])) AS tiles
             |  FROM d),
             |s AS (
             |  SELECT doc_id, nt,
             |    list_transform(range(0, nt - 1), i ->
             |      len(list_intersect(tiles[i + 1], tiles[i + 2])) /
             |      CAST(len(tiles[i + 1]) + len(tiles[i + 2])
             |           - len(list_intersect(tiles[i + 1], tiles[i + 2])) AS DOUBLE)) AS sims
             |  FROM t)
             |SELECT doc_id, CAST(nt AS BIGINT) AS n_tiles,
             |  CAST(len(list_filter(sims, x -> x < 0.1)) AS BIGINT) AS n_boundaries,
             |  CAST(len(list_filter(sims, x -> x < 0.1)) + 1 AS BIGINT) AS n_segments,
             |  round(list_sum(sims) / len(sims) + 1e-9, 4) AS avg_adj_sim
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens + a regex sub-word pass
    // (the BPE-ish approximation: alnum runs capped at 4 chars).
    "q_token_count" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(TextFns.words(col("text"))).cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit("[a-z0-9]{1,4}")).cast("long").as("sub_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS BIGINT) AS sub_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Per-document lexical-diversity profile ([LLM] quality signal —
    // low unigram entropy / type-token ratio flags keyword-stuffed
    // and template text the repetition filter's fixed n-grams miss):
    // word-distribution Shannon entropy in nats via the one-pass
    // H = ln n − (Σ c·ln c)/n identity (the q_source_mix discipline —
    // no per-row p division, short identical double chains on both
    // engines) and TTR = types/tokens. Scale shape: ONE shuffle to
    // the (doc, word) tf grid (the q_tfidf shape — word text never
    // travels past the map-side combine), then a doc-keyed grid
    // aggregate; nothing unbounded after the first exchange.
    "q_token_entropy" -> QueryDef(
      (s, dir) => {
        val tf = Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        tf.groupBy("doc_id")
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
            sum(col("c").cast("double") * log(col("c").cast("double")))
              .as("clogc"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            round((log(col("n_tokens").cast("double")) -
              col("clogc") / col("n_tokens")) + 1e-9, 4).as("entropy"),
            round(col("n_types").cast("double") / col("n_tokens") + 1e-9, 4)
              .as("ttr"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY doc_id, w)
             |SELECT doc_id,
             |  CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  round((ln(CAST(sum(c) AS DOUBLE)) -
             |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c))
             |    + 1e-9, 4) AS entropy,
             |  round(CAST(count(*) AS DOUBLE) / sum(c) + 1e-9, 4) AS ttr
             |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Heuristic n-gram/stopword language ID. The CASE ladder is the
    // model; the oracle runs the identical ladder, so the check
    // verifies the Spark plumbing, not linguistic truth.
    "q_lang_id" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          when(col("text").rlike("(^| )(the|a|of|and)( |$)"), "en")
            .when(col("text").rlike("(^| )(el|la|de|que)( |$)"), "es")
            .when(col("text").rlike("(^| )(le|la|et|les)( |$)"), "fr")
            .otherwise("unk").as("pred_lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
             |  CASE WHEN regexp_matches(text, '(^| )(the|a|of|and)( |$)') THEN 'en'
             |       WHEN regexp_matches(text, '(^| )(el|la|de|que)( |$)') THEN 'es'
             |       WHEN regexp_matches(text, '(^| )(le|la|et|les)( |$)') THEN 'fr'
             |       ELSE 'unk' END AS pred_lang
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Vocabulary dictionary-encoding — ClickHouse LowCardinality /
    // the tokenize-to-ids shape every training pipeline ends in: a
    // corpus-wide token→id dictionary (dense ids, deterministic:
    // lexicographic rank), then each document encoded as its id
    // sequence. Scale shape: the dictionary is the VOCABULARY domain
    // (a grid, not the corpus) — its ranking window sorts only
    // distinct tokens; encoding is a broadcast-dict join on the
    // exploded tokens (the Dictionary.dictGet shape) followed by one
    // doc-keyed re-aggregation. The emitted surface is per-doc
    // (token count, Σids, max id) — scalar, hash-checkable — while
    // the id ARRAY itself is exercised by the spec's decode
    // round trip.
    "q_vocab_encode" -> QueryDef(
      (s, dir) => {
        // words is MATERIALIZED: the vocab distinct and the encoding
        // join both consume it — un-checkpointed, the corpus was
        // re-tokenized per consumer (r15 plan audit: 2 scans → 1).
        val words = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("word"))
          .localCheckpoint()
        // dense ids = 1 + distributed global rank over the distinct
        // token domain (DistRank: range-repartition + offset stamping) —
        // a row_number() over an empty partitionBy would sort the whole
        // vocabulary (hundreds of millions of types web-scale) in ONE
        // task; this keeps the ranking spread across the cluster.
        val vocab = graft.operators.DistRank
          .withPos(words.select("word").distinct(),
            Seq(col("word").asc), "pos")
          .withColumn("id", col("pos") + 1L)
          .drop("pos")
        words.join(broadcast(vocab), "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum("id").as("id_sum"),
            max("id").as("id_max"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |v AS (
             |  SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS id
             |  FROM (SELECT DISTINCT word FROM w))
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(id) AS BIGINT) AS id_sum,
             |  CAST(max(id) AS BIGINT) AS id_max
             |FROM w JOIN v USING (word)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // TF-IDF keyword extraction — the retrieval/relevance staple every
    // corpus-analysis pipeline runs (and the deterministic cousin of
    // embedding relevance scoring): per document, the top-3 terms by
    // tf·ln(N/df), ties broken lexicographically. Scale shape: term
    // frequencies are ONE (doc, word) hash aggregate over the exploded
    // tokens; document frequencies re-aggregate that tf grid by word —
    // O(vocab) through the second exchange, the corpus text never
    // moves twice; the per-doc top-3 window partitions on doc_id
    // (parallelism = documents, input = each doc's distinct words).
    // N is a 1-row scalar broadcast. The score double is the product
    // of an exact integer tf and one ln() both engines evaluate on the
    // identical double — no re-association anywhere.
    "q_tfidf" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents")
        // tf is MATERIALIZED: used by both the df aggregation and the
        // scoring join, un-checkpointed it planned two full
        // tokenize+group subtrees (r15 duplicate-subtree audit,
        // guide §2.4). (doc, word) grid scale.
        val tf = docs
          .select(col("doc_id"), explode(TextFns.words(col("text"))).as("word"))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val df = tf.groupBy("word").agg(count(lit(1)).cast("double").as("df"))
        val n = docs.select(countDistinct("doc_id").cast("double").as("n_docs"))
        val scored = tf.join(df, "word").crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf") * log(col("n_docs") / col("df")) + 1e-9, 4))
        scored
          .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("word").asc)).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("word"), col("score"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
             |df AS (
             |  SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY word),
             |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, word,
             |    round(tf * ln(n_docs / df) + 1e-9, 4) AS score
             |  FROM tf JOIN df USING (word) CROSS JOIN n)
             |SELECT doc_id, rank, word, score FROM (
             |  SELECT doc_id, word, score,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score DESC, word ASC) AS BIGINT) AS rank
             |  FROM scored)
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Quality score: length saturation + lexical diversity + symbol
    // cleanliness, each in [0,1], fixed weights.
    "q_quality_score" -> QueryDef(
      (s, dir) => {
        val ws = TextFns.words(col("text"))
        val nWords = size(ws).cast("double")
        val uniqRatio = size(array_distinct(ws)).cast("double") / nWords
        val alnumLen = length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast("double")
        val cleanRatio = alnumLen / length(col("text")).cast("double")
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            round(least(nWords / 100.0, lit(1.0)), 4).as("len_score"),
            round(uniqRatio, 4).as("uniq_ratio"),
            round(cleanRatio, 4).as("clean_ratio"),
            // + 1e-9 before rounding: the three-term weighted sum can
            // differ from DuckDB's by 1 ulp (re-association), and at
            // sf0.1 five docs land exactly on a round-half boundary
            // where that ulp flips the 4th decimal (hazard H1). The
            // shared nudge is 10⁷× an ulp and 10⁻⁵× the rounding grid,
            // so it moves both engines to the same side of the
            // boundary and nothing else.
            round(least(nWords / 100.0, lit(1.0)) * 0.4 + uniqRatio * 0.3 + cleanRatio * 0.3
              + 1e-9, 4).as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  round(least(len(string_split(text, ' ')) / 100.0, 1.0), 4) AS len_score,
             |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
             |        len(string_split(text, ' ')), 4) AS uniq_ratio,
             |  round(CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) /
             |        length(text), 4) AS clean_ratio,
             |  round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4 +
             |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
             |          len(string_split(text, ' ')) * 0.3 +
             |        CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) /
             |          length(text) * 0.3 + 1e-9, 4) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Readability scoring ([LLM] — Flesch reading ease + LIX, the
    // curriculum/difficulty signals text-complexity routing uses:
    // WeLM/Dolma-style pipelines bucket documents by readability to
    // schedule easy→hard training mixes). The fixture text carries no
    // sentence punctuation, so sentence boundaries are injected
    // deterministically (one sentence per doc_id%5+8 words — the
    // q_pii_scrub discipline); what the hash check exercises is the
    // linguistic machinery both engines must agree on: vowel-group
    // syllable estimation as a regex count, long-word detection over
    // the split array, and the two classic formulas on exact integer
    // counts. Zero-shuffle codegen'd projection — at 100 TB this is a
    // free column stamped during any corpus pass.
    "q_readability" -> QueryDef(
      (s, dir) => {
        val ws = TextFns.words(col("text"))
        val nw = size(ws).cast("long")
        val sentLen = (pmod(col("doc_id"), lit(5L)) + 8L).cast("long")
        val nSent = floor((nw + sentLen - 1) / sentLen).cast("long")
        val syl = regexp_count(col("text"), lit("[aeiouy]+")).cast("long")
        val longW = size(filter(ws, w => length(w) > 6)).cast("long")
        Tables(s, dir, "documents")
          .select(col("doc_id"), nw.as("n_words"), nSent.as("n_sentences"),
            syl.as("n_syllables"), longW.as("n_long_words"),
            round(lit(206.835) - lit(1.015) * (nw / nSent.cast("double"))
              - lit(84.6) * (syl / nw.cast("double")) + 1e-9, 4).as("flesch"),
            round(nw / nSent.cast("double")
              + lit(100.0) * longW / nw.cast("double") + 1e-9, 4).as("lix"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
             |    doc_id % 5 + 8 AS sent_len,
             |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syl,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      w -> length(w) > 6)) AS BIGINT) AS long_w
             |  FROM documents)
             |SELECT doc_id, nw AS n_words,
             |  CAST((nw + sent_len - 1) // sent_len AS BIGINT) AS n_sentences,
             |  syl AS n_syllables, long_w AS n_long_words,
             |  round(206.835 - 1.015 * (nw / CAST((nw + sent_len - 1) // sent_len AS DOUBLE))
             |    - 84.6 * (syl / CAST(nw AS DOUBLE)) + 1e-9, 4) AS flesch,
             |  round(nw / CAST((nw + sent_len - 1) // sent_len AS DOUBLE)
             |    + 100.0 * long_w / CAST(nw AS DOUBLE) + 1e-9, 4) AS lix
             |FROM d ORDER BY doc_id""".stripMargin)),

    // ClickHouse normalizeUTF8NFC family ([CH]) / the Unicode-
    // normalization cleaning step before tokenization ([LLM]):
    // decomposed accent sequences (e + U+0301) must collapse to their
    // composed forms (U+00E9) or identical surface text tokenizes
    // differently. The fixture text is ASCII, so each row appends a
    // deterministic decomposed+composed probe suffix; the native
    // codegen'd `unicode_normalize` expression (already-normalized
    // fast path: zero allocation) NFC-normalizes, and the codepoint
    // counts prove exactly the decomposed pairs merged. Zero-shuffle
    // projection; NFKC/NFKD compatibility folding is spec'd
    // (PipelineSpec: ﬁ → fi, ² → 2).
    "q_text_normalize" -> QueryDef(
      (s, dir) => {
        import graft.expressions.TextExprs
        val raw = concat(substring(col("text"), 1, 16), lit(" café café"))
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            length(raw).cast("long").as("raw_cps"),
            length(TextExprs.unicodeNormalize(raw, "NFC")).cast("long").as("nfc_cps"),
            (TextExprs.unicodeNormalize(lit("café"), "NFC") === lit("café"))
              .as("composed_eq"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(length(raw) AS BIGINT) AS raw_cps,
             |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_cps,
             |  nfc_normalize('cafe' || chr(769)) = ('caf' || chr(233)) AS composed_eq
             |FROM (SELECT doc_id,
             |        substr(text, 1, 16) || ' cafe' || chr(769) || ' caf' || chr(233) AS raw
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ClickHouse multiSearchAny / multiSearchFirstIndex /
    // multiSearchFirstPosition ([CH] string-search family; [LLM]
    // blocklist/badwords filtering, the C4/RefinedWeb screen): probe
    // every document against a fixed needle list in ONE codegen'd
    // projection — no explode, no join, no regex alternation; each
    // needle is a plain `locate` (a vectorized substring scan, the
    // Volnitsky-scan analog). First-hit = the (position, needle-order)
    // lexicographic minimum over the live hits — struct array_min
    // gives ClickHouse's leftmost-match-lowest-index tie-break for
    // free. Zero shuffle except the final deterministic sort; at
    // 100 TB this is a pure scan whose needle list rides in the
    // generated code, never a join side.
    "q_multi_search" -> QueryDef(
      (s, dir) => {
        val needles = Seq("slow merge", "fast spark", "big batch", "key agg")
        val hits = array(needles.zipWithIndex.map { case (t, i) =>
          struct(locate(t, col("text")).as("pos"), lit(i + 1).as("idx")) }: _*)
        val live = filter(hits, h => h("pos") > 0)
        Tables(s, dir, "documents")
          .select(col("doc_id"), live.as("live"))
          .select(col("doc_id"),
            (size(col("live")) > 0).as("any_hit"),
            coalesce(array_min(col("live")).getField("idx"), lit(0)).cast("long").as("first_idx"),
            coalesce(array_min(col("live")).getField("pos"), lit(0)).cast("long").as("first_pos"),
            size(col("live")).cast("long").as("n_hits"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    instr(text, 'slow merge') AS p1, instr(text, 'fast spark') AS p2,
             |    instr(text, 'big batch') AS p3, instr(text, 'key agg') AS p4
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, p1, p2, p3, p4,
             |    coalesce(least(nullif(p1, 0), nullif(p2, 0), nullif(p3, 0), nullif(p4, 0)), 0) AS fp
             |  FROM p)
             |SELECT doc_id,
             |  (p1 > 0 OR p2 > 0 OR p3 > 0 OR p4 > 0) AS any_hit,
             |  CAST(CASE WHEN fp = 0 THEN 0
             |            WHEN p1 = fp THEN 1 WHEN p2 = fp THEN 2
             |            WHEN p3 = fp THEN 3 ELSE 4 END AS BIGINT) AS first_idx,
             |  CAST(fp AS BIGINT) AS first_pos,
             |  CAST((p1 > 0)::int + (p2 > 0)::int + (p3 > 0)::int + (p4 > 0)::int AS BIGINT) AS n_hits
             |FROM f ORDER BY doc_id""".stripMargin)),

    // Content fingerprints: raw and normalized md5 (identical hex in
    // both engines → oracle-safe).
    "q_fingerprint" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text")).as("raw_fp"),
          TextFns.fingerprint(col("text")).as("norm_fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(text) AS raw_fp,
             |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |      ' +', ' ', 'g'))) AS norm_fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Zipf's-law fit over the corpus vocabulary ([NS] — the standard
    // corpus-health diagnostic: natural text shows log(freq) ≈
    // intercept + slope·log(rank) with slope ≈ −1; a collapsed or
    // templated corpus bends away from it). One explode + hash
    // aggregate collapses the corpus to the vocabulary grid; ranks are
    // a row_number over the top-100 of that bounded grid (ties broken
    // by token so both engines rank identically); the OLS fit is
    // `regr_slope`/`regr_intercept` — population-moment formulas
    // identical in Spark and DuckDB — over 100 rows. Nothing after
    // the first aggregate ever touches a document again.
    "q_zipf_fit" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cnt = Tables(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok")
          .agg(count(lit(1)).cast("double").as("c"))
        val top = cnt
          .withColumn("rk",
            row_number().over(Window.orderBy(col("c").desc, col("tok"))))
          .filter(col("rk") <= 100)
        top.agg(
          round(expr("regr_slope(ln(c), ln(CAST(rk AS DOUBLE)))"), 4)
            .as("zipf_slope"),
          round(expr("regr_intercept(ln(c), ln(CAST(rk AS DOUBLE)))"), 4)
            .as("zipf_intercept"),
          count(lit(1)).as("n_ranks"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
             |  FROM documents),
             |cnt AS (
             |  SELECT tok, CAST(count(*) AS DOUBLE) AS c
             |  FROM toks WHERE tok <> '' GROUP BY tok),
             |top AS (
             |  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
             |  FROM cnt QUALIFY rk <= 100)
             |SELECT round(regr_slope(ln(c), ln(CAST(rk AS DOUBLE))), 4) AS zipf_slope,
             |  round(regr_intercept(ln(c), ln(CAST(rk AS DOUBLE))), 4) AS zipf_intercept,
             |  CAST(count(*) AS BIGINT) AS n_ranks
             |FROM top""".stripMargin)),

    // Per-language character-class profile ([LLM] corpus QA — the
    // script/encoding screen run before language-specific filtering:
    // a "de" shard full of CJK bytes or NUL-ridden mojibake shows up
    // here first; Dolma and CCNet both gate on exactly these ratios).
    // Class counts are length-deltas of class-stripped text — one
    // codegen'd projection, no explode, no per-character rows; the
    // aggregate is a map-side-combined sum over the tiny lang domain.
    // Classes are spelled as explicit ASCII ranges (the Java-regex ∩
    // RE2 dialect intersection, the q_pii_scrub rule) — [^ -~] is
    // "outside printable ASCII", i.e. multibyte + control. Both
    // engines count CHARACTERS (Spark length = DuckDB length), so
    // multibyte text agrees; DuckDB needs the explicit 'g' flag
    // (its regexp_replace defaults to first-match-only, Spark's to
    // global — a silent 1-vs-N divergence if unflagged).
    "q_unicode_stats" -> QueryDef(
      (s, dir) => {
        def stripped(re: String) =
          length(regexp_replace(col("text"), re, "")).cast("long")
        val n = length(col("text")).cast("long")
        Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))
          .select(col("lang"), n.as("n"),
            (n - stripped("[A-Za-z]")).as("letters"),
            (n - stripped("[0-9]")).as("digits"),
            (n - stripped(" ")).as("spaces"),
            (n - stripped("[!-/:-@\\[-`{-~]")).as("punct"),
            (n - stripped("[^ -~]")).as("non_ascii"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n").as("n_chars"),
            sum("letters").as("letters"),
            sum("digits").as("digits"),
            sum("spaces").as("spaces"),
            sum("punct").as("punct"),
            sum("non_ascii").as("non_ascii"),
            round(sum("non_ascii") / sum("n").cast("double") + 1e-9, 4)
              .as("non_ascii_ratio"))
          .orderBy("lang")
      },
      Some("""WITH c AS (
             |  SELECT lang, CAST(length(text) AS BIGINT) AS n,
             |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS letters,
             |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digits,
             |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS spaces,
             |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS BIGINT) AS punct,
             |    CAST(length(text) - length(regexp_replace(text, '[^ -~]', '', 'g')) AS BIGINT) AS non_ascii
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n) AS BIGINT) AS n_chars,
             |  CAST(sum(letters) AS BIGINT) AS letters,
             |  CAST(sum(digits) AS BIGINT) AS digits,
             |  CAST(sum(spaces) AS BIGINT) AS spaces,
             |  CAST(sum(punct) AS BIGINT) AS punct,
             |  CAST(sum(non_ascii) AS BIGINT) AS non_ascii,
             |  round(sum(non_ascii) / CAST(sum(n) AS DOUBLE) + 1e-9, 4) AS non_ascii_ratio
             |FROM c GROUP BY lang ORDER BY lang""".stripMargin)),

    // Tokenizer fertility ([LLM] tokenizer QA — Rust et al. 2021,
    // "How Good is Your Tokenizer?": bytes-per-token and
    // tokens-per-character by language are THE cross-lingual
    // tokenizer-cost metrics; a language whose fertility blows up is
    // being shredded into sub-word confetti and will train badly).
    // Reuses q_token_count's BPE-ish sub-token regex as the
    // tokenizer stand-in; byte mass via octet_length (bytes ≠ chars
    // exactly where fertility matters — multibyte scripts). One
    // zero-shuffle projection + a lang-domain hash aggregate; ratio
    // of sums (corpus-level fertility), not mean-of-ratios.
    "q_token_fertility" -> QueryDef(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("lang"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          length(col("text")).cast("long").as("n_chars"),
          regexp_count(col("text"), lit("[a-z0-9]{1,4}")).cast("long")
            .as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bytes").as("total_bytes"),
          sum("n_tokens").as("total_tokens"),
          round(sum("n_bytes") / sum("n_tokens").cast("double") + 1e-9, 4)
            .as("bytes_per_token"),
          round(sum("n_tokens") * 100 / sum("n_chars").cast("double") + 1e-9, 4)
            .as("tokens_per_100chars"))
        .orderBy("lang"),
      Some("""WITH t AS (
             |  SELECT lang, CAST(strlen(text) AS BIGINT) AS n_bytes,
             |    CAST(length(text) AS BIGINT) AS n_chars,
             |    CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  round(sum(n_bytes) / CAST(sum(n_tokens) AS DOUBLE) + 1e-9, 4) AS bytes_per_token,
             |  round(sum(n_tokens) * 100 / CAST(sum(n_chars) AS DOUBLE) + 1e-9, 4) AS tokens_per_100chars
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)),

    // Stopword identification by DOCUMENT frequency — the corpus-side
    // complement of q_vocab_topk's term-frequency ranking (stopword
    // lists are built from document coverage, not raw counts: a word
    // in 95% of documents carries no signal even at modest total
    // count; CH's groupArrayIntersect answers the degenerate 100%
    // case, which a real corpus never hits). Per language: the top-10
    // words by share of documents containing them. Scale shape: one
    // (doc, word)-distinct explode collapses to the (lang, word) df
    // grid; docs-per-lang broadcasts; the top-10 window partitions on
    // lang over its vocab slice. Rank compares the exact INTEGER df
    // (word asc on ties) — coverage is monotone in df within a
    // language, so no float enters the ordering.
    "q_stopword_df" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val dw = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(TextFns.words(col("text")))).as("word"))
        val df = dw.groupBy("lang", "word").agg(count(lit(1)).as("df_docs"))
        val nd = dw.groupBy(col("lang").as("nl"))
          .agg(countDistinct("doc_id").cast("double").as("n_docs"))
        val w = Window.partitionBy("lang")
          .orderBy(col("df_docs").desc, col("word").asc)
        df.join(broadcast(nd), col("lang") === col("nl"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .select(col("lang"), col("rank"), col("word"), col("df_docs"),
            round(col("df_docs") / col("n_docs") + 1e-9, 4).as("coverage"))
          .orderBy("lang", "rank")
      },
      Some("""WITH dw AS (
             |  SELECT DISTINCT doc_id, lang, word FROM (
             |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
             |    FROM documents)),
             |df AS (
             |  SELECT lang, word, CAST(count(*) AS BIGINT) AS df_docs
             |  FROM dw GROUP BY lang, word),
             |nd AS (
             |  SELECT lang, CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
             |  FROM dw GROUP BY lang)
             |SELECT lang, rank, word, df_docs,
             |  round(df_docs / n_docs + 1e-9, 4) AS coverage
             |FROM (
             |  SELECT df.lang, word, df_docs, n_docs,
             |    CAST(row_number() OVER (PARTITION BY df.lang
             |      ORDER BY df_docs DESC, word ASC) AS BIGINT) AS rank
             |  FROM df JOIN nd USING (lang))
             |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin)),

    // BM25 ranked retrieval (Robertson–Spärck Jones; the Lucene/CH
    // full-text scoring staple and TF-IDF's saturating successor):
    // top-20 documents for a fixed 3-term query, k1=1.2, b=0.75,
    // idf = ln(1 + (N − df + ½)/(df + ½)). Scale shape: the corpus
    // text is tokenized ONCE — per-doc length and the query-term tf
    // come out of the same projection, so only the O(matching docs ×
    // |query|) tf grid reaches the exchange; N/avgdl are a 1-row
    // scalar broadcast and df is an O(|query|) broadcast. The rank
    // windows over the ROUNDED score (both engines round first), so
    // cross-engine ulp drift in the ln()/division chain cannot flip
    // an ordering the 4-decimal grid doesn't see; doc_id breaks ties.
    "q_bm25" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val terms = Seq("vector", "stream", "merge")
        // ONE tokenize pass: dl rides along with the exploded words so
        // the corpus text is never split twice.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
          .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
            explode(col("ws")).as("word"))
          // materialized: the corpus-scalars branch and the tf branch
          // otherwise each re-tokenize (r15 duplicate-subtree audit)
          .localCheckpoint()
        val scalars = toks.groupBy("doc_id").agg(first("dl").as("dl"))
          .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
        val tf = toks.filter(col("word").isInCollection(terms))
          .groupBy("doc_id", "word")
          .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
        val df = tf.groupBy("word")
          .agg(countDistinct("doc_id").cast("double").as("df"))
        val scored = tf
          .join(broadcast(df), "word")
          .crossJoin(broadcast(scalars))
          .withColumn("idf", log(lit(1.0) +
            (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
          .withColumn("term_score", col("idf") * col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms_hit"),
            round(sum("term_score") + 1e-9, 4).as("bm25"))
        // TakeOrderedAndProject (O(k) per partition, no global sort)
        // bounds the result to 20 rows BEFORE the rank stamp, so the
        // empty-partitionBy rank window runs over a constant-size input.
        scored
          .orderBy(col("bm25").desc, col("doc_id").asc)
          .limit(20)
          .withColumn("rank", row_number().over(Window.orderBy(
            col("bm25").desc, col("doc_id").asc)).cast("long"))
          .select(col("rank"), col("doc_id"), col("n_terms_hit"), col("bm25"))
          .orderBy("rank")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |corpus AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             |         avg(CAST(len(ws) AS DOUBLE)) AS avgdl FROM d),
             |tf AS (
             |  SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf,
             |         CAST(any_value(dl) AS DOUBLE) AS dl
             |  FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM d)
             |  WHERE word IN ('vector', 'stream', 'merge')
             |  GROUP BY doc_id, word),
             |df AS (
             |  SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
             |  FROM tf GROUP BY word),
             |scored AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
             |    round(sum(
             |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
             |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) + 1e-9, 4) AS bm25
             |  FROM tf JOIN df USING (word) CROSS JOIN corpus
             |  GROUP BY doc_id)
             |SELECT rank, doc_id, n_terms_hit, bm25 FROM (
             |  SELECT doc_id, n_terms_hit, bm25,
             |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
             |      AS rank
             |  FROM scored)
             |WHERE rank <= 20 ORDER BY rank""".stripMargin))
  )
}
