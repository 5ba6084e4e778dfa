package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution and shared-passage detection — the two
  * steps a training-data pipeline runs AFTER candidate generation:
  * every dedup variant (exact/MinHash/SimHash/winnow) emits PAIRS, but
  * a curation run needs disjoint clusters with one survivor each, and
  * substring-level contamination needs the actual duplicated passages,
  * not just "these two docs overlap somewhere".
  *
  * Both are deterministic (fingerprint equality, exact n-gram runs), so
  * unlike the approximate candidate generators they are fully
  * DuckDB-expressible and hash-checked against the oracle.
  */
object Cluster extends QueryModule {

  /** Prefix/suffix fingerprint width. Fixture docs are ≥ 10 words at
    * every SF, so a 10-word slice never clamps (a clamped slice would
    * diverge from the oracle's `list_slice` semantics on short docs).
    */
  private val EdgeKeyWords = 10

  private val GramN = 8

  /** Same oversized-bucket rationale as [[Dedup.BucketCap]]: an 8-gram
    * shared by hundreds of documents is boilerplate, and pairing it is
    * quadratic; passages that matter still chain through their other,
    * discriminative grams.
    */
  private[graft] val GramBucketCap = 64

  /** A run must span ≥ MinRunGrams consecutive shared grams, i.e.
    * ≥ GramN - 1 + MinRunGrams = 12 shared tokens, before it is
    * reported as a duplicated passage.
    */
  private val MinRunGrams = 5

  private val ConvergenceFuse = 50

  /** q_pagerank's fixed power-iteration count. 8 rounds on the dense
    * co-purchase graph moves every rank well off the uniform start
    * while keeping the unrolled oracle CTE chain readable.
    */
  private val PageRankIters = 8

  /** q_pagerank's symmetrized bipartite purchase edges with integer
    * node ids (customer 2k, supplier 2k+1) — shared by the declared
    * query and the edge-index build.
    */
  private def pagerankEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("ok"),
        (col("o_custkey") * 2).cast("long").as("a"))
    val e0 = li.join(ord, "ok")
    e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
  }

  /** The 8-round power iteration + rounded top-20, over whichever
    * (src, dst, deg) edge relation the caller hands in — the declared
    * query passes the persisted in-memory edge list, the indexed path
    * passes the bucketed standing table.
    *
    * Materialize every SECOND round (persist+count, previous rank
    * cache released immediately): lazy 2-round sections keep each AQE
    * job shallow — the genuinely-cold interleaved r7 measurement put
    * the full 8-deep single-job chain at median ~17 s / worst 28 s vs
    * ~10 s / worst 14 s for the 2-stride (per-round materialization
    * paid job overhead back as a ~18 s median; localCheckpoint's .rdd
    * path bypasses AQE and was worse still). Each live rank cache is
    * 16k (node, r) rows — node-scale, never edge-scale.
    *
    * The final top-20 is COLLECTED into a local relation and the
    * caches are released before returning — the r6 version returned
    * the persisted plan itself, so the rank cache outlived the query:
    * CacheManager plan-matching served every rerun from it (bench
    * "medians" of 0.68 s were cache hits, and the leaked blocks
    * accumulated per session). Only O(k)=20 rows cross to the driver,
    * so the local relation is free, every invocation is genuinely
    * cold, and nothing survives the call.
    */
  private def pagerankIterate(s: SparkSession, edgesW: DataFrame,
      ranks0: DataFrame, release: () => Unit): DataFrame = {
    var ranks = ranks0
    var prevCache: Option[DataFrame] = None
    (1 to PageRankIters).foreach { i =>
      ranks = edgesW
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg((lit(0.15) + lit(0.85) * sum(col("r") / col("deg"))).as("r"))
        .withColumnRenamed("dst", "node")
      if (i % 2 == 0) {
        val c = ranks.persist()
        c.count()
        prevCache.foreach(_.unpersist(blocking = false))
        prevCache = Some(c)
        ranks = c
      }
    }
    release()
    val top = ranks
      .select(
        concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
          expr("node div 2").cast("string")).as("node"),
        round(col("r") + 1e-9, 4).as("pr"))
      .orderBy(col("pr").desc, col("node").asc)
      .limit(20)
      .orderBy("node")
    val rows = top.collect()
    val schema = top.schema
    prevCache.foreach(_.unpersist(blocking = false))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Materialize the (src, dst, deg) edge list as a `src`-bucketed
    * standing table — the once-per-corpus-snapshot index build (the
    * buildSigIndex / buildIvfIndex pattern): all 8 iterations of every
    * subsequent [[pagerankIndexed]] run read the one bucketed layout
    * with zero edge-side exchanges. Measured r9 (interleaved, sf0.1,
    * warmed JVM): 2.95 s median vs the declared query's 5.12 s — the
    * 1.7× the per-invocation A/B could not honestly claim (building
    * the table inside the invocation was a wash at 5.15 s).
    */
  def buildPagerankEdgeIndex(s: SparkSession, dir: String, table: String): Unit = {
    val edges = pagerankEdges(s, dir)
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
    graft.operators.Sources.writeBucketed(
      edges.join(deg, "src"), table, "src", buckets = 32)
  }

  /** PageRank over a standing [[buildPagerankEdgeIndex]] table —
    * identical semantics and output to the declared q_pagerank
    * (ClusterChainSpec pins row equality); the edge text is never
    * re-derived and the bucketed scan replaces the per-invocation
    * build + persist.
    */
  def pagerankIndexed(s: SparkSession, table: String): DataFrame = {
    val edgesW = s.table(table)
    pagerankIterate(s, edgesW,
      edgesW.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1.0).as("r")),
      release = () => ())
  }

  /** q_pagerank_indexed's once-per-session index staging (the
    * Lifecycle fixture pattern): the first invocation pays the
    * bucketed-table build, every later one reads it — so a bench
    * median over repeated runs reports the AMORTIZED operating point
    * the standing index exists for, while the cold build cost stays
    * visible as run 1's outlier. Honest on both axes: the cold path
    * is still measured by q_pagerank, which shares no state.
    */
  private val prIndexLock = new Object
  private def pagerankIndexTable(s: SparkSession, dir: String): String =
    prIndexLock.synchronized {
      // fingerprint key (not dir.hashCode): two fixture dirs can never
      // collide, and a regenerated fixture changes the name so a stale
      // same-JVM index is never served (the Lifecycle.staged rationale)
      val tbl = "graft_pr_edges_" + graft.operators.Lifecycle.fixtureFp(dir)
      if (!s.catalog.tableExists(tbl)) {
        // the catalog is per-JVM but the warehouse directory is not: a
        // previous session's managed-table files would make this
        // session's CREATE fail with LOCATION_ALREADY_EXISTS — clear
        // the leftover location before rebuilding
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), tbl)
        graft.AtomicDir.fileSystem(loc.toString).delete(loc, true)
        buildPagerankEdgeIndex(s, dir, tbl)
      }
      tbl
    }

  /** The DuckDB twin of q_pagerank's iteration loop: the same
    * symmetrized edge list, degree table, and 8 unnormalized damped
    * power-iteration steps as chained CTEs — generated, not
    * hand-written, so iteration count and damping can never drift
    * between the engines.
    */
  private def pagerankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e0 AS (
        |  SELECT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b AS src, a AS dst FROM e0),
        |d AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
        |      FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, 1.0 AS r FROM d)""".stripMargin)
    for (i <- 1 to iters) sb.append(s""",
        |r$i AS (
        |  SELECT e.dst AS node, 0.15 + 0.85 * sum(p.r / d.deg) AS r
        |  FROM e JOIN d ON d.src = e.src
        |         JOIN r${i - 1} p ON p.node = e.src
        |  GROUP BY e.dst)""".stripMargin)
    sb.append(s"""
        |SELECT node, pr FROM (
        |  SELECT node, round(r + 1e-9, 4) AS pr FROM r$iters
        |  ORDER BY round(r + 1e-9, 4) DESC, node ASC LIMIT 20)
        |ORDER BY node""".stripMargin)
    sb.toString
  }

  /** Hash-to-min label propagation to fixpoint: `nodes` carries one
    * `id` column; `edges` a symmetric, distinct (s, d) list (caller
    * localCheckpoints it — it is re-joined every round). Returns
    * (id, comp) with comp = the component's minimum id.
    *
    * Convergence detection: propagation only ever LOWERS labels, so
    * Σcomp strictly decreases until fixpoint — an O(1)-row aggregate
    * per round, no previous-vs-next join. The sum runs in
    * decimal(38,0): with 64-bit ids a Long sum can overflow and alias
    * a non-fixpoint onto the previous round's wrapped value, silently
    * ending propagation early; 38 decimal digits hold ~10¹⁹ ids of
    * magnitude 2⁶³ without wrapping, so the monotone-checksum argument
    * is airtight (ClusterChainSpec drives this with near-Long.MaxValue
    * ids).
    */
  private[graft] def propagateLabels(nodes: DataFrame, edges: DataFrame): DataFrame = {
    var labels = nodes.select(col("id"), col("id").as("comp"))
    var checksum: java.math.BigDecimal = null
    var converged = false
    var rounds = 0
    while (!converged && rounds < ConvergenceFuse) {
      val prop = edges.join(labels, edges("s") === labels("id"))
        .select(col("d").as("id"), col("comp"))
      labels = labels.union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val next = labels.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      converged = checksum != null && next.compareTo(checksum) == 0
      checksum = next
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $ConvergenceFuse rounds")
    labels
  }

  /** Star edges for one fingerprint family: every bucket member links
    * to the bucket minimum. A star preserves the bucket's connectivity
    * with |bucket|-1 edges instead of the clique's |bucket|²/2 — the
    * edge list stays LINEAR in the corpus no matter how large a
    * duplicate group grows, which is what makes the component step safe
    * at 100 TB (no BucketCap needed here, unlike the pairwise dedup
    * variants, because nothing quadratic ever exists).
    */
  private def starEdges(keyed: DataFrame, key: String): DataFrame =
    keyed.groupBy(key)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "transform(slice(ids, 2, size(ids) - 1), x -> struct(ids[0] AS s, x AS d))")).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))

  /** The (doc_id, pos, gram) table: md5 of each 8-token window, built
    * with window `lead` over `posexplode` (the HOF transform/slice form
    * is ~5× slower — interpreted lambda per gram). Positions are
    * 0-based longs to match the oracle's `generate_series`.
    */
  /** Positional word 8-grams of a (doc_id, text) frame. */
  private def gramsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(TextFns.words(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val leads = Seq(col("doc_id"), col("pos").cast("long").as("pos")) ++
      (0 until GramN).map(i => (if (i == 0) col("w") else lead("w", i).over(byDoc)).as(s"w$i"))
    toks.select(leads: _*)
      .filter(col(s"w${GramN - 1}").isNotNull)
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", (0 until GramN).map(i => col(s"w$i")): _*)).as("gram"))
  }

  private def grams(s: SparkSession, dir: String): DataFrame =
    gramsOf(Tables(s, dir, "documents"))

  /** The q_dup_passages core over a positional-gram frame: capped
    * per-gram buckets → in-row pair expansion → diagonal run
    * detection. Shared verbatim by the declared query and the
    * exact-collapsed operating arm.
    */
  private def dupPassageRuns(g: DataFrame): DataFrame = {
    val pairs = g
      .groupBy("gram")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= GramBucketCap)
      .select(explode(expr(Dedup.pairExpansion("ms",
        "a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b"))).as("p"))
      .select("p.*")
      .filter(col("doc_a") < col("doc_b"))
    val byDiag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    pairs
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("grp", col("pos_a") - row_number().over(byDiag))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(min("pos_a").as("start_a"), min("pos_b").as("start_b"),
        (count(lit(1)) + (GramN - 1)).cast("long").as("len_tokens"))
      .filter(col("len_tokens") >= GramN - 1 + MinRunGrams)
      .select("doc_a", "doc_b", "start_a", "start_b", "len_tokens")
  }

  /** The exact-collapse operating arm of q_dup_passages — the 100 TB
    * posture under heavy exact duplication. The declared query's
    * answer is inherently Θ(m²) in exact-copy multiplicity m (every
    * copy pair of a duplicated passage IS a distinct output row — the
    * oracle's all-pairs answer grows identically), so no algorithm
    * can make the EXPANDED form sub-quadratic in m; the production
    * pipeline therefore collapses exact-duplicate texts to one
    * representative FIRST (the q_dedup_minhash pre-step — SlimPajama/
    * RefinedWeb ordering) and reports passages at rep level with the
    * member doc-id lists attached. Copy-count invariant by
    * construction: 30 verbatim copies of a corpus change only the
    * members strings, not the run set (ClusterChainSpec pins exactly
    * that; the 30× rehearsal measures it).
    */
  private[graft] def dupPassagesCollapsedOf(docs: DataFrame): DataFrame = {
    // groups is MATERIALIZED: the rep table feeds the gram pipeline
    // and BOTH member-list joins — un-checkpointed, Catalyst planned
    // the md5-collapse aggregate (shuffling every text) three times
    // (r15 plan audit: 3 scans of documents → 1). Rep-scale rows.
    val groups = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"), first("text").as("text"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("members"))
      .localCheckpoint()
    dupPassageRuns(gramsOf(groups.select(col("doc_id"), col("text"))))
      .join(groups.select(col("doc_id").as("doc_a"), col("members").as("members_a")),
        Seq("doc_a"))
      .join(groups.select(col("doc_id").as("doc_b"), col("members").as("members_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("len_tokens"), col("members_a"), col("members_b"))
      .orderBy("doc_a", "doc_b", "start_a", "start_b", "len_tokens")
  }

  def entries: Map[String, QueryDef] = Map(

    // Connected components over the duplicate graph: docs sharing a
    // 10-word prefix OR suffix fingerprint are edges; the cluster label
    // is the component's minimum doc_id and the keeper is the label
    // doc. Clique families OVERLAP (A~B by prefix, B~C by suffix ⇒
    // {A,B,C}), so real transitive closure is required — a groupBy on
    // either key alone is wrong.
    //
    // Algorithm: hash-to-min label propagation. Each iteration is ONE
    // shuffle (union + groupBy min); labels converge in O(component
    // diameter) rounds — near-dup clusters have tiny diameters, and the
    // star edges (see starEdges) bound each round's traffic linearly.
    // `localCheckpoint` per round truncates lineage so the plan doesn't
    // grow with the iteration count; the only driver-side values are
    // the per-round emptiness probe of the changed-label set (an
    // aggregate, not data). This is the standard Spark CC shape
    // (hash-to-min; large-star/small-star would cut rounds to
    // O(log diameter) on adversarial graphs but costs 2 shuffles/round
    // — the wrong trade for shallow dup clusters).
    "q_dedup_cluster" -> QueryDef(
      (s, dir) => {
        val sp = TextFns.words(col("text"))
        val keyed = Tables(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(sp, 1, EdgeKeyWords))).as("pre"),
            md5(concat_ws(" ", slice(sp, -EdgeKeyWords, EdgeKeyWords))).as("suf"))
          .localCheckpoint() // read once; feeds 2 edge families + the node set
        val star = starEdges(keyed, "pre").union(starEdges(keyed, "suf"))
        val edges = star
          .union(star.select(col("d").as("s"), col("s").as("d")))
          .distinct()
          .localCheckpoint() // re-joined every iteration
        propagateLabels(keyed.select(col("doc_id").as("id")), edges)
          .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy("cluster_id")))
          .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (
              |  SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
              |k AS (
              |  SELECT doc_id,
              |         md5(array_to_string(list_slice(sp, 1, $EdgeKeyWords), ' ')) AS pre,
              |         md5(array_to_string(list_slice(sp, len(sp) - ${EdgeKeyWords - 1}, len(sp)), ' ')) AS suf
              |  FROM t),
              |e AS (
              |  SELECT a.doc_id AS s, b.doc_id AS d
              |  FROM k a JOIN k b ON a.pre = b.pre AND a.doc_id <> b.doc_id
              |  UNION
              |  SELECT a.doc_id, b.doc_id
              |  FROM k a JOIN k b ON a.suf = b.suf AND a.doc_id <> b.doc_id),
              |w(id, comp) AS (
              |  SELECT doc_id, doc_id FROM k
              |  UNION
              |  SELECT e.d, w.comp FROM w JOIN e ON e.s = w.id),
              |lab AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM w GROUP BY id)
              |SELECT doc_id, cluster_id,
              |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
              |       doc_id = cluster_id AS is_keeper
              |FROM lab
              |ORDER BY doc_id""".stripMargin)),

    // Exact duplicated-passage detection (substring-level dedup à la
    // "Deduplicating Training Data Makes Language Models Better":
    // suffix-array duplicate substrings, re-expressed relationally):
    // positional 8-gram match join, then consecutive matches on the
    // same diagonal (pos_a - pos_b) consolidate into maximal runs via
    // the islands trick (pos - row_number is constant within a run).
    // Output is (doc pair, start offsets, token length ≥ 12) — the
    // actionable "cut this passage" record, not just a doc-level flag.
    //
    // Scale shape: grams → capped collect-per-bucket (one shuffle) →
    // in-row pair expansion (bounded by GramBucketCap before any pair
    // exists) → one groupBy over (pair, diagonal, island). Nothing
    // quadratic in the corpus; hot boilerplate grams are dropped by the
    // cap exactly like the MinHash/SimHash candidate buckets.
    "q_dup_passages" -> QueryDef(
      (s, dir) => dupPassageRuns(grams(s, dir))
        .orderBy("doc_a", "doc_b", "start_a", "start_b", "len_tokens"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
              |g0 AS (
              |  SELECT doc_id, sp,
              |         unnest(generate_series(0, len(sp) - $GramN)) AS pos
              |  FROM t),
              |g AS (
              |  SELECT doc_id, pos,
              |         md5(array_to_string(list_slice(sp, pos + 1, pos + $GramN), ' ')) AS gram
              |  FROM g0),
              |census AS (
              |  SELECT gram FROM g GROUP BY gram
              |  HAVING count(*) BETWEEN 2 AND $GramBucketCap),
              |p AS (
              |  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
              |  FROM g a JOIN census USING (gram) JOIN g b USING (gram)
              |  WHERE a.doc_id < b.doc_id),
              |r AS (
              |  SELECT *, pos_a - pos_b AS diag,
              |         pos_a - row_number() OVER (
              |           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp
              |  FROM p)
              |SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
              |       CAST(count(*) + ${GramN - 1} AS BIGINT) AS len_tokens
              |FROM r
              |GROUP BY doc_a, doc_b, diag, grp
              |HAVING count(*) >= $MinRunGrams
              |ORDER BY doc_a, doc_b, start_a, start_b, len_tokens""".stripMargin)),

    // The exact-collapse operating arm of q_dup_passages, declared as
    // its own oracle-checked row (r10, out of the 30× rehearsal): the
    // expanded answer is Θ(m²) in exact-copy multiplicity — EVERY copy
    // pair is a distinct output row, so the blow-up lives in the
    // answer, not the algorithm — and the production ordering
    // (SlimPajama/RefinedWeb, the q_dedup_minhash pre-step) collapses
    // exact duplicates FIRST. This row runs passage detection over one
    // representative per distinct text and attaches the member doc-id
    // lists; copy-count INVARIANT by construction (ClusterChainSpec
    // pins a doubled corpus changing only the members strings; the 30×
    // rehearsal measures the growth). Oracle: the same rep-level
    // pipeline over DuckDB's own md5-collapse of the fixture.
    "q_dup_passages_collapsed" -> QueryDef(
      (s, dir) => dupPassagesCollapsedOf(Tables(s, dir, "documents")),
      Some(s"""WITH grps AS (
              |  SELECT min(doc_id) AS doc_id,
              |         array_to_string(list_sort(list(doc_id)), ',') AS members,
              |         min(text) AS text
              |  FROM documents GROUP BY md5(text)),
              |t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM grps),
              |g0 AS (
              |  SELECT doc_id, sp,
              |         unnest(generate_series(0, len(sp) - $GramN)) AS pos
              |  FROM t),
              |g AS (
              |  SELECT doc_id, pos,
              |         md5(array_to_string(list_slice(sp, pos + 1, pos + $GramN), ' ')) AS gram
              |  FROM g0),
              |census AS (
              |  SELECT gram FROM g GROUP BY gram
              |  HAVING count(*) BETWEEN 2 AND $GramBucketCap),
              |p AS (
              |  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
              |  FROM g a JOIN census USING (gram) JOIN g b USING (gram)
              |  WHERE a.doc_id < b.doc_id),
              |r AS (
              |  SELECT *, pos_a - pos_b AS diag,
              |         pos_a - row_number() OVER (
              |           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp
              |  FROM p),
              |runs AS (
              |  SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
              |         CAST(count(*) + ${GramN - 1} AS BIGINT) AS len_tokens
              |  FROM r GROUP BY doc_a, doc_b, diag, grp
              |  HAVING count(*) >= $MinRunGrams)
              |SELECT runs.doc_a, runs.doc_b, start_a, start_b, len_tokens,
              |       ga.members AS members_a, gb.members AS members_b
              |FROM runs
              |JOIN grps ga ON ga.doc_id = runs.doc_a
              |JOIN grps gb ON gb.doc_id = runs.doc_b
              |ORDER BY doc_a, doc_b, start_a, start_b, len_tokens""".stripMargin)),

    // PageRank centrality over the customer↔supplier co-purchase
    // graph — the host-authority signal web-scale curation pipelines
    // compute over the link graph (CommonCrawl host PageRank as a
    // document-quality prior). Power iteration, damping 0.85, the
    // unnormalized 0.15 + 0.85·Σ r/deg form; the bipartite purchase
    // edges are SYMMETRIZED (undirected random walk) so no node
    // dangles and the walk conserves. Multi-edges are kept: an edge
    // per purchase weights the walk by transaction volume, and both
    // engines see the identical multiset. Scale shape: the edge list
    // (with out-degree pre-joined) is built once and persisted; each
    // of the 8 iterations is one edge⨝rank join (ranks are node-scale,
    // so AQE broadcasts them at runtime where they fit — the declared
    // plan forces nothing) + one dst-keyed map-side-combined
    // aggregate. The rounds execute in lazy 2-round sections with a
    // node-scale persist+count between sections (see the in-body
    // measurement note; the per-ROUND-checkpoint discipline
    // q_dedup_cluster needs for its UNBOUNDED round count doesn't
    // apply — localCheckpoint's .rdd path bypasses AQE and measured
    // worse). Only O(k) rows reach the driver (TakeOrderedAndProject
    // top-20); ranking compares the ROUNDED value so cross-engine ulp
    // drift in the contribution sums can't flip an ordering. Oracle:
    // the SAME 8 iterations unrolled as generated chained CTEs
    // ([[pagerankOracle]]) — key-encoding-independent values.
    "q_pagerank" -> QueryDef(
      (s, dir) => {
        // INTEGER node ids through the iteration (customer 2k, supplier
        // 2k+1): 8 rounds of hashing/shuffling a long beat the former
        // "c123"/"s45" string keys in every interleaved rep of the r7
        // measurement; the string label is rebuilt arithmetically only
        // for the final 20 rows, and the oracle's values are untouched
        // (deg and the contribution sums don't depend on the key
        // encoding).
        val edges = pagerankEdges(s, dir)
        val deg = edges.groupBy("src")
          .agg(count(lit(1)).cast("double").as("deg"))
        val edgesW = edges.join(deg, "src").persist()
        edgesW.count()
        // Rank-join strategy (r8 interleaved A/B, sf0.1, warmed JVM,
        // loadavg<1.4): broadcast-hinting the node-scale rank side
        // median 4.64 s vs 4.64 s for the plain shuffle join over 4
        // alternating reps — a wash. AQE already plans the small side
        // efficiently and the per-round broadcast build (collect +
        // rebroadcast of fresh ranks every iteration) pays back the
        // saved exchange, so the hint-free form stays.
        //
        // Edge-layout strategy (r9 interleaved A/B/C, sf0.1, warmed
        // JVM, 5 alternating reps): pre-bucketing the edge list on
        // `src` via Sources.writeBucketed INSIDE the invocation is a
        // wash — 5.15 s median vs 5.12 s for this persisted-cache form
        // (the bucket-table write costs what the removed per-round
        // exchanges save) — so the honest-cold declared query keeps
        // the persist. The same iterations over an ALREADY-BUILT
        // bucketed edge table run 2.95 s median (1.7×): that
        // amortized operating point is the 100 TB story and ships as
        // [[buildPagerankEdgeIndex]] + [[pagerankIndexed]]
        // (ClusterChainSpec pins indexed ≡ declared).
        pagerankIterate(s, edgesW,
          deg.select(col("src").as("node"), lit(1.0).as("r")),
          release = () => { edgesW.unpersist(blocking = false); () })
      },
      Some(pagerankOracle(PageRankIters))),

    // The AMORTIZED PageRank operating point declared as its own
    // oracle-checked row (r9 verdict item 6): the same 8 damped
    // power-iteration rounds over the STANDING src-bucketed edge
    // index ([[buildPagerankEdgeIndex]], staged once per session the
    // way q_projection_agg stages its partials) — per-iteration edge
    // exchanges are gone because the bucketed layout pre-paid them,
    // the 1.7× measured in the r9 interleaved A/B. Values are
    // IDENTICAL to q_pagerank (same edges, same arithmetic, key
    // encoding untouched), so the oracle is the same generated
    // 8-stage CTE chain, shared by reference.
    "q_pagerank_indexed" -> QueryDef(
      (s, dir) => pagerankIndexed(s, pagerankIndexTable(s, dir)),
      Some(pagerankOracle(PageRankIters))),

    // Triangle count + global clustering coefficient over the
    // market-basket co-occurrence graph (two parts of one category —
    // l_partkey % 3 = 0, a pushed-down scan predicate — are adjacent
    // when they appear in the same order) — the graph-cohesion
    // statistic behind community/quality analysis of a link corpus,
    // and the classic "does it survive skew" graph kernel. Unlike the
    // supplier projection (complete at every SF — every pair
    // eventually co-occurs), the part basket graph stays genuinely
    // sparse as data grows: edges scale with ORDERS while possible
    // pairs scale with the part domain squared (measured: density
    // 47% → 9.2% → 3.8% at sf0.001/0.01/0.1, triangles nonzero
    // throughout). Shapes that matter at 100 TB: (1) the basket
    // fan-out is C(7,2)-bounded per order (TPC-H orders hold ≤ 7
    // lineitems) — row-local, never quadratic in the corpus; (2)
    // wedges are generated DEGREE-ORIENTED (each edge points from its
    // (deg, id)-smaller endpoint to the larger), so a hub of degree d
    // contributes C(out_d, 2) wedges with out_d ≤ O(√E) instead of
    // C(d, 2) — the standard Schank–Wagner bound that keeps the wedge
    // join alive on power-law graphs; (3) each triangle is counted
    // exactly ONCE (its (deg, id)-minimum vertex generates the
    // wedge), so no /3 correction and no duplicate shuffle volume.
    // The closing-edge probe is an equi-join on the id-canonical pair
    // key. All-integer counts ⇒ the coefficient is a ratio of exact
    // small integers, identical across engines.
    "q_graph_triangles" -> QueryDef(
      (s, dir) => {
        // os and e are MATERIALIZED: e feeds the degree table, the
        // orientation, the closing-edge probe and the stats aggregate,
        // and un-checkpointed Catalyst replicated the whole
        // scan→self-join→distinct pipeline per consumer (r15 plan
        // audit: 28 scans of lineitem in one query). Edge-scale rows —
        // the same rows every consumer needs; guide §2.4/§3.3.
        val os = Tables(s, dir, "lineitem")
          .where(pmod(col("l_partkey"), lit(3)) === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("sn"))
          .distinct()
          .localCheckpoint()
        val e = os.as("x").join(os.as("y"), "ok")
          .where(col("x.sn") < col("y.sn"))
          .select(col("x.sn").as("lo"), col("y.sn").as("hi"))
          .distinct()
          .localCheckpoint()
        val deg = e.select(col("lo").as("n"))
          .unionByName(e.select(col("hi").as("n")))
          .groupBy("n").agg(count(lit(1)).as("d"))
          .localCheckpoint()
        // Orient by (deg, id): struct comparison is lexicographic.
        val ed = e
          .join(deg.select(col("n").as("lo"), col("d").as("dlo")), "lo")
          .join(deg.select(col("n").as("hi"), col("d").as("dhi")), "hi")
        val oriented = ed.select(
          when(struct(col("dlo").as("d"), col("lo").as("n"))
              < struct(col("dhi").as("d"), col("hi").as("n")),
            struct(col("lo").as("src"), col("hi").as("dst")))
            .otherwise(struct(col("hi").as("src"), col("lo").as("dst")))
            .as("o"))
          .select(col("o.src").as("src"), col("o.dst").as("dst"))
          // materialized: the wedge self-join consumes it twice
          .localCheckpoint()
        val wedges = oriented.as("w1").join(oriented.as("w2"), "src")
          .where(col("w1.dst") < col("w2.dst"))
          .select(col("w1.dst").as("lo"), col("w2.dst").as("hi"))
        val tri = wedges.join(e, Seq("lo", "hi"), "left_semi")
        val triCount = tri.agg(count(lit(1)).as("t"))
        val stats = e.agg(count(lit(1)).as("n_edges"))
          .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
            sum(col("d") * (col("d") - 1) / 2).as("wedge_total")))
          .crossJoin(broadcast(triCount))
        stats.select(col("n_nodes"), col("n_edges"),
          col("t").as("n_triangles"),
          round(lit(3.0) * col("t") / col("wedge_total"), 6).as("clustering"))
      },
      Some("""WITH os AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS sn
             |  FROM lineitem WHERE l_partkey % 3 = 0),
             |e AS (
             |  SELECT DISTINCT x.sn AS lo, y.sn AS hi
             |  FROM os x JOIN os y ON x.ok = y.ok AND x.sn < y.sn),
             |deg AS (
             |  SELECT n, count(*) AS d
             |  FROM (SELECT lo AS n FROM e UNION ALL SELECT hi AS n FROM e)
             |  GROUP BY n),
             |tri AS (
             |  SELECT count(*) AS t
             |  FROM e e1
             |  JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
             |  JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
             |SELECT
             |  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
             |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
             |  (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
             |  round(3.0 * (SELECT t FROM tri)
             |    / (SELECT sum(d * (d - 1) / 2) FROM deg), 6) AS clustering""".stripMargin))
  )
}
