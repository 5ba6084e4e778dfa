package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** The composed training-data curation flow — what the individual
  * text/dedup operators exist FOR, as one end-to-end oracle-checked
  * query: exact-dedup on the normalized content fingerprint (keep the
  * lowest doc_id per duplicate group), score quality, predict language,
  * budget tokens, and emit the curated corpus manifest.
  *
  * Every stage is exact/deterministic built-ins, so the whole pipeline
  * is DuckDB-expressible and hash-checked — the approximate variants
  * (MinHash/SimHash/winnow/embedding) remain separate queries.
  *
  * Scale shape: one narrow projection computes all per-doc signals in a
  * single pass (shared subexpressions collapse in codegen), the dedup
  * is one shuffle on the fingerprint, the filters are residual — at
  * 100 TB this is scan → project → 1 shuffle → filter, nothing
  * quadratic, nothing driver-side.
  */
object Curate extends QueryModule {

  def entries: Map[String, QueryDef] = Map(

    "q_pipeline_curate" -> QueryDef(
      (s, dir) => {
        val ws = TextFns.words(col("text"))
        val nWords = size(ws).cast("double")
        // + 1e-9 before rounding — same boundary nudge as
        // q_quality_score (hazard H1): the 3-term sum can differ from
        // DuckDB by 1 ulp, which flips the 4th decimal exactly on a
        // round-half boundary (observed at sf0.1)
        val quality =
          least(nWords / 100.0, lit(1.0)) * 0.4 +
            (size(array_distinct(ws)).cast("double") / nWords) * 0.3 +
            (length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast("double") /
              length(col("text")).cast("double")) * 0.3 + 1e-9
        val predLang = when(col("text").rlike("(^| )(the|a|of|and)( |$)"), "en")
          .when(col("text").rlike("(^| )(el|la|de|que)( |$)"), "es")
          .when(col("text").rlike("(^| )(le|la|et|les)( |$)"), "fr")
          .otherwise("unk")
        val scored = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextFns.fingerprint(col("text")).as("norm_fp"),
            size(ws).cast("long").as("n_tokens"),
            round(quality, 4).as("quality"),
            predLang.as("pred_lang"))
        // dedup: lowest doc_id survives its duplicate group. A window
        // rank-1 on the fingerprint, NOT a groupBy + semi-join: the
        // join form consumes the scored subtree twice, so every per-row
        // regex (fingerprint normalization, 3 language probes, quality
        // cleanup) runs twice — measured ~2× the whole query. Same
        // single shuffle on the fingerprint either way.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("norm_fp").orderBy("doc_id")
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .filter(col("quality") >= 0.5 && col("pred_lang") =!= "unk" &&
            col("n_tokens").between(5, 1000))
          .select("doc_id", "lang", "pred_lang", "n_tokens", "quality")
          .orderBy("doc_id")
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, lang,
             |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |        ' +', ' ', 'g'))) AS norm_fp,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4 +
             |          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
             |            len(string_split(text, ' ')) * 0.3 +
             |          CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) /
             |            length(text) * 0.3 + 1e-9, 4) AS quality,
             |    CASE WHEN regexp_matches(text, '(^| )(the|a|of|and)( |$)') THEN 'en'
             |         WHEN regexp_matches(text, '(^| )(el|la|de|que)( |$)') THEN 'es'
             |         WHEN regexp_matches(text, '(^| )(le|la|et|les)( |$)') THEN 'fr'
             |         ELSE 'unk' END AS pred_lang
             |  FROM documents),
             |survivors AS (
             |  SELECT norm_fp, min(doc_id) AS doc_id FROM scored GROUP BY norm_fp)
             |SELECT s.doc_id, s.lang, s.pred_lang, s.n_tokens, s.quality
             |FROM scored s
             |WHERE EXISTS (SELECT 1 FROM survivors k
             |              WHERE k.norm_fp = s.norm_fp AND k.doc_id = s.doc_id)
             |  AND s.quality >= 0.5 AND s.pred_lang <> 'unk'
             |  AND s.n_tokens BETWEEN 5 AND 1000
             |ORDER BY s.doc_id""".stripMargin))
  )
}
