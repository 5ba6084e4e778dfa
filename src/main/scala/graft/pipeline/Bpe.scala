package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over the corpus — the
  * tokenizer-training step every LLM data pipeline runs before the
  * tokenize-to-ids pass ([[TextOps]]'s `q_vocab_encode` is the word-
  * level form; this learns the SUB-word vocabulary). Algorithm is the
  * public Sennrich et al. 2016 formulation: iteratively merge the most
  * frequent adjacent symbol pair.
  *
  * Scale shape — the classic map-reduce factoring: BPE statistics are
  * a function of the WORD-TYPE frequency table, not the corpus. ONE
  * corpus pass builds the (word, count) grid (a hash aggregate — the
  * vocabulary domain, millions of types at 100 TB, never the tokens);
  * every merge iteration then runs on that grid alone: one pair-count
  * aggregate (weighted by type frequency) + one argmax row to the
  * driver + one narrow map applying the merge. Per-iteration cost is
  * O(grid), independent of corpus size; `localCheckpoint` every few
  * rounds truncates the growing map lineage (the Cluster.scala
  * discipline). The driver holds only the learned merge list — model
  * scale, like the KMeans centroids.
  */
object Bpe extends QueryModule {

  /** Ordered merge rules; applying them in order tokenizes any word. */
  final case class Model(merges: Seq[(String, String)]) {
    /** Tokenize one word by replaying the merges in learned order —
      * plain Scala on a char-level symbol sequence ending in the
      * end-of-word marker (so "low" and "lower" learn different ends).
      */
    def encodeWord(word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString) :+ Model.Eow
      merges.foreach { case (a, b) =>
        if (syms.length > 1) {
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
  }
  object Model { val Eow = "</w>" }

  /** One word type as its current symbol sequence (not private: the
    * Dataset encoder's generated code must reach the constructor).
    */
  final case class TypeRow(syms: Seq[String], cnt: Long)

  /** Apply one merge to one symbol sequence — shared by both training
    * paths and [[Model.encodeWord]]'s replay.
    */
  private def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] =
    if (syms.length < 2) syms
    else {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

  /** Learn `numMerges` merge rules from a (word, count) word-type
    * grid. Ties on pair frequency break lexicographically — training
    * is deterministic whatever the partitioning or path.
    *
    * Two identical-result paths (spec'd equivalent), chosen by grid
    * size — the KMeans discipline applied to tokenizer training:
    * the word-TYPE grid is usually model-scale (a few million types
    * even at web-corpus size), so when it fits under `maxLocalTypes`
    * the driver pulls it ONCE and iterates in memory (50 merges in
    * milliseconds, zero extra jobs). A grid too big to pull runs the
    * distributed loop: per merge, one pair-count aggregate + a one-row
    * argmax + one narrow map, `localCheckpoint` every 8 rounds to
    * truncate lineage.
    */
  def train(wordTypes: DataFrame, numMerges: Int,
      maxLocalTypes: Long = 1L << 21): Model = {
    val spark = wordTypes.sparkSession
    import spark.implicits._
    val src = wordTypes.select(col("word").cast("string"), col("cnt").cast("long"))
    if (src.limit(math.min(maxLocalTypes + 1, Int.MaxValue.toLong).toInt).count() <= maxLocalTypes)
      trainLocal(src.as[(String, Long)].collect(), numMerges)
    else {
      var grid: Dataset[TypeRow] = src.as[(String, Long)]
        .map { case (w, c) => TypeRow(w.map(_.toString) :+ Model.Eow, c) }
        .localCheckpoint()
      val merges = Seq.newBuilder[(String, String)]
      var done = false
      var it = 0
      while (it < numMerges && !done) {
        // pair counts over the grid, weighted by type frequency: one
        // map-side-combinable hash aggregate, vocabulary-domain rows
        val best = grid.flatMap { t =>
          t.syms.iterator.zip(t.syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), t.cnt) }.toSeq
        }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((a, b), n) => (n, a, b) }
          // argmax with a total deterministic order: count desc, pair asc
          .orderBy(desc("_1"), asc("_2"), asc("_3"))
          .head(1)
        if (best.isEmpty || best.head._1 < 2) done = true // nothing left to merge
        else {
          val (_, a, b) = best.head
          merges += ((a, b))
          grid = grid.map(t => TypeRow(applyMerge(t.syms, a, b), t.cnt))
          it += 1
          // truncate lineage so the plan never accretes `numMerges` maps
          if (it % 8 == 0) grid = grid.localCheckpoint()
        }
      }
      Model(merges.result())
    }
  }

  /** The in-memory twin of the distributed loop: same statistics, same
    * tie-break, same stopping rule, on the collected grid.
    */
  private def trainLocal(types: Array[(String, Long)], numMerges: Int): Model = {
    var grid: Array[(Seq[String], Long)] =
      types.map { case (w, c) => (w.map(_.toString) :+ Model.Eow, c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      grid.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // count desc, pair asc — identical order to the distributed sort
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < 2) done = true
        else {
          merges += ((a, b))
          grid = grid.map { case (syms, c) => (applyMerge(syms, a, b), c) }
          it += 1
        }
      }
    }
    Model(merges.result())
  }

  /** The corpus → word-type grid pass: normalize, split, hash-count.
    * This is the ONLY corpus-sized read training needs.
    */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.words(TextFns.normalize(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Tokenize the corpus with a learned model: per-partition replay of
    * the broadcast merge list (genuinely imperative inner loop — the
    * mapPartitions case). Emits one row per document with its BPE
    * token sequence.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), TextFns.normalize(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        // memoize per word TYPE: token occurrences are Zipf-heavy, so
        // the merge replay runs once per distinct word per partition,
        // not once per occurrence (a ~30× cut on natural text)
        val memo = new scala.collection.mutable.HashMap[String, Seq[String]]()
        it.map { case (id, text) =>
          (id, text.split(' ').toSeq.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, m.encodeWord(w))))
        }
      }.toDF(idCol, "tokens")
  }

  /** One trained model per (sfDir) — training is iterative (50 small
    * jobs); the declared query must measure the ENCODE path, like the
    * Lifecycle staging memos. Deterministic, so memoization is safe.
    */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private def modelFor(s: SparkSession, dir: String): Model =
    modelCache.computeIfAbsent(dir, _ =>
      train(wordTypes(Tables(s, dir, "documents"), "text"), numMerges = 50))

  /** Generated oracle: re-derives the ENTIRE training loop + encode in
    * SQL (the pagerank chained-CTE discipline — no data-dependent
    * literals). Key identity making this tractable: the training grid
    * after merge i IS every word type with merges 1..i replayed in
    * learned order, so the final grid g50 doubles as the word→tokens
    * encode table — no separate replay pass.
    *
    * Symbol sequences ride as '|'-delimited cells, each symbol wrapped
    * in its OWN pair ("low" → `|l||o||w||</w>|`): applying merge (a,b)
    * is then `replace(symstr, '|a||b|', '|ab|')`, and because every
    * cell carries both its delimiters, leftmost non-overlapping
    * replace consumes exactly the cells the i+=2 loop in
    * [[applyMerge]] consumes ("aaaa" merges to [aa,aa], not [aa,a,a] —
    * a shared-separator encoding gets this wrong). '|' can never
    * appear inside a symbol: [[graft.functions.TextFns.normalize]]
    * leaves only [a-z0-9 ] and the only non-alphanumeric symbol is the
    * `</w>` marker. Tie-break parity: ORDER BY n DESC, a, b on ASCII
    * strings ≡ the Scala (-n, a, b) minBy; the `n >= 2` guard mirrors
    * the stopping rule (an exhausted grid passes through unchanged —
    * `~~` is a never-occurring pattern, so the guarded replace is a
    * no-op). MATERIALIZED pins linear CTE evaluation (g(i-1) is
    * referenced twice per stage; inlining would be exponential).
    */
  private def bpeOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents),
        |wt AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(norm, ' ')) AS word FROM norm) t
        |  WHERE length(word) > 0 GROUP BY word),
        |g0 AS MATERIALIZED (
        |  SELECT word, regexp_replace(word, '(.)', '|\1|', 'g') || '|</w>|' AS symstr, cnt
        |  FROM wt)""".stripMargin)
    for (i <- 1 to iters) sb.append(s""",
        |p$i AS MATERIALIZED (
        |  SELECT s[j] AS a, s[j+1] AS b, sum(cnt) AS n
        |  FROM (SELECT string_split(substr(symstr, 2, length(symstr)-2), '||') AS s, cnt FROM g${i - 1}) t,
        |       UNNEST(generate_series(1, len(s)-1)) AS u(j)
        |  GROUP BY 1, 2),
        |m$i AS (SELECT a, b FROM p$i WHERE n >= 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |g$i AS MATERIALIZED (
        |  SELECT word,
        |         replace(symstr,
        |                 coalesce((SELECT '|'||a||'||'||b||'|' FROM m$i), '~~'),
        |                 coalesce((SELECT '|'||a||b||'|' FROM m$i), '~~')) AS symstr,
        |         cnt
        |  FROM g${i - 1})""".stripMargin)
    sb.append(s""",
        |toks AS (
        |  SELECT word, string_split(substr(symstr, 2, length(symstr)-2), '||') AS toks
        |  FROM g$iters),
        |docw AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM norm) t
        |  WHERE length(word) > 0),
        |dt AS (
        |  SELECT d.doc_id, u.tok
        |  FROM docw d JOIN toks g USING (word), UNNEST(g.toks) AS u(tok)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe_tokens,
        |         CAST(count(DISTINCT tok) AS BIGINT) AS n_bpe_types
        |  FROM dt GROUP BY doc_id)
        |SELECT d.doc_id,
        |       coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
        |       coalesce(a.n_bpe_types, 0) AS n_bpe_types
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)
    sb.toString
  }

  def entries: Map[String, QueryDef] = Map(

    // BPE tokenization declared end-to-end: train on the corpus' own
    // word-type grid (memoized — iterative model fit, like KMeans),
    // encode every document, emit the per-doc scalar surface
    // (token/type counts + compression vs whitespace tokens).
    // Hash-checked since r8: [[bpeOracle]] re-derives the 50-merge
    // training loop AND the encode replay as a chained SQL CTE — the
    // "iterative model ⇒ rows-only" assumption retired, like pagerank.
    // BpeSpec still pins the algorithm against a hand-computed
    // reference and the encode round trip.
    "q_bpe_encode" -> QueryDef(
      (s, dir) => {
        val m = modelFor(s, dir)
        encode(Tables(s, dir, "documents"), "text", "doc_id", m)
          .select(col("doc_id"),
            size(col("tokens")).cast("long").as("n_bpe_tokens"),
            size(array_distinct(col("tokens"))).cast("long").as("n_bpe_types"))
          .orderBy("doc_id")
      },
      Some(bpeOracle(50)))
  )
}
