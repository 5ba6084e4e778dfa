package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.J):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * two-stage search as the 100 TB path.
  *
  * Brute force is O(|queries| · |corpus|) — correct, and fine when the
  * query set is small and broadcastable, but it scans the whole corpus
  * per batch. The IVF variant prunes: a [[KMeans]] coarse quantizer
  * (fit once per corpus snapshot — the index build) assigns the corpus
  * to cells, each query probes only its nProbe nearest centroids, and
  * only those cells are scanned — at scale the cell assignment is the
  * partition key, so pruning skips whole partitions at the scan, not
  * rows after it.
  */
object Similarity extends QueryModule {

  /** IVF cell count for the declared queries; the all-cells probe
    * (`nProbe = AnnCells`) must reproduce exact brute force, which the
    * PipelineSpec asserts.
    */
  val AnnCells = 10

  /** q_ann_recall's operating point: the PRUNED probe breadth the
    * recall evaluation measures, and the cut-off of both rankings.
    */
  val AnnRecallProbe = 2
  val AnnRecallK = 10

  /** q_sim_mmr's shortlist size, pick count, and relevance/diversity
    * trade-off. C=15 candidates per query bounds the greedy input to
    * O(|queries|·C) rows at any corpus size.
    */
  val MmrCand = 15
  val MmrK = 5
  val MmrLambda = 0.7
  /** The diversity weight as an explicit literal (NOT `1 − λ`, whose
    * IEEE value is 0.30000000000000004 — both engines must parse the
    * same decimal literal for bit-identical scores).
    */
  val MmrGamma = 0.3

  /** The DuckDB twin of q_sim_mmr's greedy loop: one chained CTE per
    * pick (the q_pagerank generated-oracle pattern — the step count
    * cannot drift between engines), over the same rounded cosine grid
    * as q_sim_topk's oracle.
    */
  private def mmrOracle: String = {
    def cos(a: String, b: String): String =
      s"""round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))) /
         |      (sqrt(list_sum(list_transform(range(1, 65),
         |        i -> CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE)))) *
         |       sqrt(list_sum(list_transform(range(1, 65),
         |        i -> CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))))), 4)""".stripMargin
    val steps = (2 to MmrK).map { t =>
      s"""sel$t AS (
         |  SELECT q_id, vec_id, rel, mmr, CAST($t AS BIGINT) AS pick_rank FROM (
         |    SELECT q_id, vec_id, rel, mmr,
         |      row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, vec_id ASC) AS rn
         |    FROM (
         |      SELECT c.q_id, c.vec_id, c.rel,
         |        round($MmrLambda * c.rel - $MmrGamma * max(p.psim) + 1e-9, 4) AS mmr
         |      FROM cand c
         |      JOIN pairs p ON p.q_id = c.q_id AND p.v1 = c.vec_id
         |      JOIN selu${t - 1} s ON s.q_id = p.q_id AND s.vec_id = p.v2
         |      WHERE NOT EXISTS (SELECT 1 FROM selu${t - 1} x
         |                        WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
         |      GROUP BY c.q_id, c.vec_id, c.rel) z0) z1
         |  WHERE rn = 1),
         |selu$t AS (SELECT * FROM selu${t - 1} UNION ALL SELECT * FROM sel$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.embedding,
       |    ${cos("q", "c")} AS rel
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT q_id, vec_id, embedding, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY rel DESC, vec_id ASC) AS rnk
       |    FROM scored) WHERE rnk <= $MmrCand),
       |pairs AS (
       |  SELECT a.q_id, a.vec_id AS v1, b.vec_id AS v2,
       |    ${cos("a", "b")} AS psim
       |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
       |sel1 AS (
       |  SELECT q_id, vec_id, rel,
       |    round($MmrLambda * rel + 1e-9, 4) AS mmr, CAST(1 AS BIGINT) AS pick_rank
       |  FROM (SELECT q_id, vec_id, rel,
       |          row_number() OVER (PARTITION BY q_id
       |            ORDER BY round($MmrLambda * rel + 1e-9, 4) DESC, vec_id ASC) AS rn
       |        FROM cand) WHERE rn = 1),
       |selu1 AS (SELECT * FROM sel1),
       |$steps
       |SELECT q_id, pick_rank, vec_id, rel, mmr
       |FROM selu$MmrK ORDER BY q_id, pick_rank""".stripMargin
  }

  /** The DuckDB twin of q_sim_lsh: the hyperplane sign matrix embedded
    * as literals, then the same bucket/probe/verify pipeline in SQL.
    * Nothing is approximated away — the oracle reproduces the exact
    * candidate set the LSH tables produce, then scores it exactly.
    */
  private def lshOracle: String = {
    val m = graft.expressions.RpKernels.signs(LshTables * LshBits, EmbDim)
    val rows = m.zipWithIndex.map { case (row, b) =>
      s"($b, [${row.map(v => if (v > 0) "1.0" else "-1.0").mkString(",")}])"
    }.mkString(",\n    ")
    s"""WITH signs(b, s) AS (VALUES
       |    $rows),
       |bits AS (
       |  SELECT e.vec_id, g.b,
       |    CASE WHEN list_sum(list_transform(range(1, ${EmbDim + 1}),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * g.s[i])) >= 0
       |      THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN signs g),
       |keys AS (
       |  SELECT vec_id, b // $LshBits AS tbl,
       |    CAST(sum(bit << (b % $LshBits)) AS BIGINT) AS key
       |  FROM bits GROUP BY vec_id, b // $LshBits),
       |buckets AS (
       |  SELECT vec_id, (tbl << $LshBits) | key AS bucket FROM keys),
       |probes AS (
       |  SELECT vec_id AS q_id, bucket FROM buckets WHERE vec_id < 10
       |  UNION
       |  SELECT b.vec_id AS q_id, xor(b.bucket, 1 << f.f) AS bucket
       |  FROM buckets b CROSS JOIN
       |    (SELECT unnest(range(0, $LshBits)) AS f) f
       |  WHERE b.vec_id < 10),
       |pairs AS (
       |  SELECT DISTINCT p.q_id, c.vec_id
       |  FROM buckets c JOIN probes p USING (bucket)
       |  WHERE c.vec_id <> p.q_id),
       |scored AS (
       |  SELECT p.q_id, p.vec_id,
       |    round(
       |      list_sum(list_transform(range(1, ${EmbDim + 1}),
       |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
       |      (sqrt(list_sum(list_transform(range(1, ${EmbDim + 1}),
       |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
       |       sqrt(list_sum(list_transform(range(1, ${EmbDim + 1}),
       |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
       |  FROM pairs p
       |  JOIN embeddings q ON q.vec_id = p.q_id
       |  JOIN embeddings c ON c.vec_id = p.vec_id)
       |SELECT q_id, rank, vec_id, cos_sim FROM (
       |  SELECT q_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Multi-table hyperplane LSH: L=8 independent tables of b=8 bits,
    * all 64 hyperplane signs computed by ONE `rp_bits` call per row
    * (same cost as a SimHash). The fixture's true neighbours are weak
    * (cos ≈ 0.32 ⇒ per-bit agreement ≈ 0.60), so a single table is
    * hopeless (0.6^8 ≈ 2%); with Hamming-≤1 multi-probe per table the
    * per-table hit rate is ≈ 0.11 and 8 independent tables lift
    * recall to 1 − 0.89^8 ≈ 0.6 — the classic b/L trade
    * (Indyk–Motwani; Gionis et al., VLDB'99).
    */
  val LshBits = 8
  val LshTables = 8

  /** Embedding dimensionality of the fixture corpus (TESTDATA.md). */
  val EmbDim = 64

  /** "Fit once per corpus snapshot" made literal: the quantizer model
    * is memoized per corpus dir, so repeated query construction (plan
    * dumps, test suites, repeated searches) reuses the index instead of
    * refitting — and building the DataFrame stays cheap after the
    * first call.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, KMeans.Model]()

  private[graft] def fittedModel(emb: DataFrame, dir: String): KMeans.Model =
    modelCache.computeIfAbsent(s"$dir#$AnnCells",
      _ => KMeans.fit(emb, "embedding", "vec_id", AnnCells, iters = 3))

  /** SemDeDup's cluster count: scale k with the corpus so the MEAN
    * cluster size stays ~[[SemDedupTarget]] — the within-cluster
    * pairing is quadratic in cluster size, so a FIXED k would grow
    * per-cluster cost with the square of the corpus (the classic
    * silent scale-killer; the paper runs k ∝ n for exactly this
    * reason). The ANN queries keep their own small fixed cell count —
    * probe semantics, not pairing, bound their clusters.
    */
  private[graft] val SemDedupTarget = 200
  private[graft] def semDedupK(n: Long): Int =
    math.max(AnnCells, math.ceil(n.toDouble / SemDedupTarget).toInt)

  private[graft] def semDedupModel(emb: DataFrame, dir: String): KMeans.Model = {
    val k = semDedupK(emb.count())
    modelCache.computeIfAbsent(s"$dir#semdedup#$k",
      _ => KMeans.fit(emb, "embedding", "vec_id", k, iters = 3))
  }

  /** Generated oracle for q_semdedup (r8): the clustering that made it
    * "rows-only by design" is re-derived in SQL with the same
    * machinery as [[pqCodesOracle]] — md5-ordered init (k itself is
    * computed in SQL: GREATEST(AnnCells, ⌈n/200⌉), so nothing is a
    * data-dependent literal), 3 Lloyd rounds over the raw 64-dim
    * float embeddings in the kernel's exact arithmetic, final
    * assignment, then the SemDeDup rule verbatim: same-cluster pairs
    * with round(cos, 4) ≥ τ mark the higher id. The pairwise cosines
    * are bit-identical across engines (sequential float-to-double
    * dots, no aggregation-order dependence); only the cluster-mean
    * sums can drift by ulps, and the assignment-margin spec pins that
    * no argmin sits within that noise on the fixtures.
    */
  private def semDedupOracle(iters: Int, tau: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        |kk AS (SELECT GREATEST($AnnCells,
        |         CAST(ceil(count(*) / $SemDedupTarget.0) AS INTEGER)) AS k FROM e),
        |init AS MATERIALIZED (
        |  SELECT vec_id, CAST(rn - 1 AS INTEGER) AS j FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      vec_id) AS rn
        |    FROM e) WHERE rn <= (SELECT k FROM kk)),
        |c0 AS MATERIALIZED (
        |  SELECT i.j, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS c
        |  FROM e JOIN init i USING (vec_id))""".stripMargin)
    for (r <- 1 to iters) sb.append(s""",
        |a$r AS MATERIALIZED (
        |  SELECT vec_id, j FROM (
        |    SELECT e.vec_id, c.j,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${EmbDim + 1}),
        |              i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM e CROSS JOIN c${r - 1} c) WHERE rk = 1),
        |c$r AS MATERIALIZED (
        |  SELECT p.j, coalesce(n.c, p.c) AS c
        |  FROM c${r - 1} p LEFT JOIN (
        |    SELECT j, list(sm / cnt ORDER BY i) AS c FROM (
        |      SELECT a.j, u.i,
        |        sum(CAST(e.embedding[u.i] AS DOUBLE)) AS sm, count(*) AS cnt
        |      FROM a$r a JOIN e USING (vec_id),
        |           UNNEST(range(1, ${EmbDim + 1})) AS u(i)
        |      GROUP BY a.j, u.i)
        |    GROUP BY j) n USING (j))""".stripMargin)
    sb.append(s""",
        |enc AS MATERIALIZED (
        |  SELECT vec_id, j FROM (
        |    SELECT e.vec_id, c.j,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${EmbDim + 1}),
        |              i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM e CROSS JOIN c$iters c) WHERE rk = 1),
        |nr AS MATERIALIZED (
        |  SELECT vec_id, sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM e),
        |dups AS (
        |  SELECT DISTINCT a.j AS j, b.vec_id AS vec_id
        |  FROM enc a JOIN enc b ON a.j = b.j AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  JOIN nr na ON na.vec_id = a.vec_id
        |  JOIN nr nb ON nb.vec_id = b.vec_id
        |  WHERE round(list_sum(list_transform(range(1, ${EmbDim + 1}),
        |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
        |      / (na.nrm * nb.nrm), 4) >= $tau)
        |SELECT CAST(a.j AS BIGINT) AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(count(d.vec_id) AS BIGINT) AS n_dups
        |FROM enc a LEFT JOIN dups d ON d.j = a.j AND d.vec_id = a.vec_id
        |GROUP BY a.j ORDER BY cluster_id""".stripMargin)
    sb.toString
  }

  /** Generated oracle for q_ann_recall: the PRUNED IVF operating point
    * made driver-verifiable. The exhaustive-probe q_sim_ann bypasses
    * cell assignment entirely (all cells probed ⇒ provably brute
    * force), so until r8 the approximate operating point was spec-only.
    * This oracle re-derives the ENTIRE pruned search in SQL — the
    * [[semDedupOracle]] Lloyd machinery at the fixed ANN cell count,
    * the per-query probe ranking (round-6 centroid cosine, cell-id
    * ties), the candidate join against the probed cells, the exact
    * cosine top-k over candidates — and scores it against the brute
    * top-k re-derived the q_sim_ann way. Margin preconditions
    * (assignment argmin gaps and probe-cosine distance from the
    * round-6 grid vs the ulp drift of cluster-mean sums) are pinned in
    * PipelineSpec, the same discipline as the pq-codes oracle.
    */
  private def annRecallOracle(iters: Int, nProbe: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        |init AS MATERIALIZED (
        |  SELECT vec_id, CAST(rn - 1 AS INTEGER) AS j FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      vec_id) AS rn
        |    FROM e) WHERE rn <= $AnnCells),
        |c0 AS MATERIALIZED (
        |  SELECT i.j, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS c
        |  FROM e JOIN init i USING (vec_id))""".stripMargin)
    for (r <- 1 to iters) sb.append(s""",
        |a$r AS MATERIALIZED (
        |  SELECT vec_id, j FROM (
        |    SELECT e.vec_id, c.j,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${EmbDim + 1}),
        |              i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM e CROSS JOIN c${r - 1} c) WHERE rk = 1),
        |c$r AS MATERIALIZED (
        |  SELECT p.j, coalesce(n.c, p.c) AS c
        |  FROM c${r - 1} p LEFT JOIN (
        |    SELECT j, list(sm / cnt ORDER BY i) AS c FROM (
        |      SELECT a.j, u.i,
        |        sum(CAST(e.embedding[u.i] AS DOUBLE)) AS sm, count(*) AS cnt
        |      FROM a$r a JOIN e USING (vec_id),
        |           UNNEST(range(1, ${EmbDim + 1})) AS u(i)
        |      GROUP BY a.j, u.i)
        |    GROUP BY j) n USING (j))""".stripMargin)
    sb.append(s""",
        |enc AS MATERIALIZED (
        |  SELECT vec_id, j FROM (
        |    SELECT e.vec_id, c.j,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${EmbDim + 1}),
        |              i -> CAST(e.embedding[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM e CROSS JOIN c$iters c) WHERE rk = 1),
        |nr AS MATERIALIZED (
        |  SELECT vec_id, sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM e),
        |probes AS MATERIALIZED (
        |  SELECT q_id, j FROM (
        |    SELECT q.vec_id AS q_id, c.j,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_sum(list_transform(range(1, ${EmbDim + 1}),
        |            i -> CAST(q.embedding[i] AS DOUBLE) * c.c[i]))
        |          / (nq.nrm * sqrt(list_sum(list_transform(c.c, x -> x * x)))), 6)
        |          DESC,
        |        c.j ASC) AS rk
        |    FROM e q JOIN nr nq ON nq.vec_id = q.vec_id CROSS JOIN c$iters c
        |    WHERE q.vec_id < 10) WHERE rk <= $nProbe),
        |cand AS (
        |  SELECT p.q_id, v.vec_id,
        |    round(list_sum(list_transform(range(1, ${EmbDim + 1}),
        |        i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ev.embedding[i] AS DOUBLE)))
        |      / (nq.nrm * nv.nrm), 4) AS cos_sim
        |  FROM probes p
        |  JOIN enc v ON v.j = p.j AND v.vec_id <> p.q_id
        |  JOIN e eq ON eq.vec_id = p.q_id
        |  JOIN e ev ON ev.vec_id = v.vec_id
        |  JOIN nr nq ON nq.vec_id = p.q_id
        |  JOIN nr nv ON nv.vec_id = v.vec_id),
        |pruned AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, vec_id ASC) AS rk FROM cand)
        |  WHERE rk <= $k),
        |bscored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_sum(list_transform(range(1, ${EmbDim + 1}),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |      / (nq.nrm * nc.nrm), 4) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |  JOIN nr nq ON nq.vec_id = q.vec_id
        |  JOIN nr nc ON nc.vec_id = c.vec_id),
        |brute AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, vec_id ASC) AS rk FROM bscored)
        |  WHERE rk <= $k)
        |SELECT b.q_id,
        |  CAST(count(p.vec_id) AS BIGINT) AS n_hits,
        |  round(count(p.vec_id) / $k.0 + 1e-9, 4) AS recall
        |FROM brute b LEFT JOIN pruned p USING (q_id, vec_id)
        |GROUP BY b.q_id ORDER BY q_id""".stripMargin)
    sb.toString
  }

  /** Product-quantization geometry (Jégou, Douze, Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the
    * normalized vector is split into [[PqM]] contiguous subvectors of
    * `EmbDim / PqM` dims; each subspace gets its own [[PqK]]-centroid
    * codebook ([[KMeans]] per subspace). K=16 ⇒ 4 bits per code ⇒ the
    * whole M=8 code word PACKS INTO ONE LONG — the searchable
    * representation of a 64-dim float vector is 8 nibbles, a 64×
    * compression of the 256-byte embedding.
    */
  val PqM = 8
  val PqK = 16
  private val PqSubDim = EmbDim / PqM

  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[KMeans.Model]]()

  /** L2-normalize in place (float-to-float, so the codebook fit and
    * the native assignment kernel keep their array<float> input): on
    * normalized vectors inner product IS cosine, which lets the ADC
    * scan rank by a pure additive lookup.
    */
  /** The normalized-embedding column as an expression (shared with the
    * streaming indexer, which applies it to arriving rows).
    */
  private[graft] def pqNormalizedCol(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nrm = Vectors.norm(emb)
    transform(emb, x => (x.cast("double") / nrm).cast("float"))
  }

  private def pqNormalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), pqNormalizedCol(col("embedding")).as("nemb"))

  /** One codebook per subspace, fit on the normalized subvector slice.
    * Training cost is M small k-means fits over the corpus; at 100 TB
    * the fit runs on a sample (codebooks are model state — a few
    * hundred doubles — not data), then one encode pass writes the
    * packed codes. Memoized per corpus dir like the IVF quantizer.
    */
  private[graft] def pqModels(emb: DataFrame, dir: String): Array[KMeans.Model] =
    pqCache.computeIfAbsent(dir, _ => {
      val n = pqNormalized(emb).localCheckpoint()
      (0 until PqM).map { m =>
        KMeans.fit(
          n.select(col("vec_id"),
            slice(col("nemb"), m * PqSubDim + 1, PqSubDim).as("sub")),
          "sub", "vec_id", PqK, iters = 3)
      }.toArray
    })

  /** The encode pass: M native nearest-centroid kernels over the
    * slices, nibble-packed into one long. This is the PQ index build
    * — at scale it is written once per corpus snapshot and the float
    * embeddings never travel again.
    */
  /** The nibble-packed code over a NORMALIZED embedding column — M
    * native nearest-centroid kernels over the slices, OR-folded.
    */
  private[graft] def pqPacked(models: Array[KMeans.Model],
      nemb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    models.zipWithIndex.map { case (mdl, m) =>
      shiftleft(mdl.assignCol(
        slice(nemb, m * PqSubDim + 1, PqSubDim)).cast("long"), 4 * m)
    }.reduce(_.bitwiseOR(_))

  private[graft] def pqCodes(emb: DataFrame, models: Array[KMeans.Model]): DataFrame =
    pqNormalized(emb).select(col("vec_id"),
      pqPacked(models, col("nemb")).as("code"))

  /** Generated oracle for q_sim_pq_codes: the whole PQ index build
    * re-derived in SQL (pagerank/bpe/pca discipline — zero
    * data-dependent literals). Stage by stage it mirrors the engine
    * exactly: float L2-normalization (double math, float cast — IEEE
    * round-to-nearest on both engines), subvector slicing, the
    * md5-ordered 16-row init sample ([[KMeans.initHash]]'s
    * `('0x' || substring(md5(id), 1, 15))::BIGINT` twin), then per
    * Lloyd round one argmin assignment in the native kernel's exact
    * arithmetic (d = Σc² − 2·Σ sub_i·c_i, both sums sequential,
    * strict-< ties to the lowest j) and one per-(subspace, cluster,
    * dim) mean with empty clusters keeping their previous centroid
    * (the LEFT JOIN + coalesce), and finally the nibble-packed
    * encode. Cross-engine drift exists only in the cluster-mean sums
    * (partition order vs DuckDB's), ~1 ulp on O(30)-row sums — an
    * assignment flips only if two centroid distances agree to
    * ~1e-15, which the spec-pinned separation of the fixture
    * codebooks rules out.
    */
  private def pqCodesOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH nemb AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS FLOAT)) AS ne
        |  FROM embeddings),
        |subs AS MATERIALIZED (
        |  SELECT vec_id, u.m,
        |    list_slice(ne, u.m * $PqSubDim + 1, u.m * $PqSubDim + $PqSubDim) AS sub
        |  FROM nemb, UNNEST(range(0, $PqM)) AS u(m)),
        |init16 AS MATERIALIZED (
        |  SELECT vec_id, CAST(rn - 1 AS INTEGER) AS j FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      vec_id) AS rn
        |    FROM embeddings) WHERE rn <= $PqK),
        |c0 AS MATERIALIZED (
        |  SELECT s.m, i.j, list_transform(s.sub, x -> CAST(x AS DOUBLE)) AS c
        |  FROM subs s JOIN init16 i USING (vec_id))""".stripMargin)
    for (r <- 1 to iters) sb.append(s""",
        |a$r AS MATERIALIZED (
        |  SELECT vec_id, m, j FROM (
        |    SELECT s.vec_id, s.m, c.j,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${PqSubDim + 1}),
        |              i -> CAST(s.sub[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM subs s JOIN c${r - 1} c USING (m)) WHERE rk = 1),
        |c$r AS MATERIALIZED (
        |  SELECT p.m, p.j, coalesce(n.c, p.c) AS c
        |  FROM c${r - 1} p LEFT JOIN (
        |    SELECT m, j, list(sm / cnt ORDER BY i) AS c FROM (
        |      SELECT a.m, a.j, u.i,
        |        sum(CAST(s.sub[u.i] AS DOUBLE)) AS sm, count(*) AS cnt
        |      FROM a$r a JOIN subs s USING (vec_id, m),
        |           UNNEST(range(1, ${PqSubDim + 1})) AS u(i)
        |      GROUP BY a.m, a.j, u.i)
        |    GROUP BY m, j) n USING (m, j))""".stripMargin)
    sb.append(s""",
        |enc AS (
        |  SELECT vec_id, m, j FROM (
        |    SELECT s.vec_id, s.m, c.j,
        |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        |        list_sum(list_transform(c.c, x -> x * x))
        |          - 2.0 * list_sum(list_transform(range(1, ${PqSubDim + 1}),
        |              i -> CAST(s.sub[i] AS DOUBLE) * c.c[i])) ASC,
        |        c.j ASC) AS rk
        |    FROM subs s JOIN c$iters c USING (m)) WHERE rk = 1)
        |SELECT vec_id,
        |  CAST(sum(CAST(j AS BIGINT) << (4 * m)) AS BIGINT) AS pq_code
        |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin)
    sb.toString
  }

  /** Asymmetric-distance (ADC) top-k: the QUERY stays un-quantized —
    * its per-subspace dot products against every codebook centroid
    * are precomputed on the driver (M×K doubles per query, model
    * scale) and broadcast as a lookup array; each corpus vector is
    * then scored by M nibble-indexed lookups over its packed code.
    * The scan reads (vec_id, code) — 12 bytes a row at ANY dimension
    * — and the ranking is the same windowed top-k as brute force.
    * Returns the ADC shortlist (top `shortlist` per query by
    * quantized score); [[pqTopK]] re-ranks it exactly.
    */
  private[graft] def pqAdc(s: SparkSession, dir: String, shortlist: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val models = pqModels(emb, dir)
    val codes = pqCodes(emb, models)
    // bounded query set (vec_id < 10, as every variant): collected at
    // model scale, turned into per-query LUT rows
    val qvecs = pqNormalized(emb).filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val luts = qvecs.map { case (qid, q) =>
      val lut = Array.ofDim[Double](PqM * PqK)
      for (m <- 0 until PqM; j <- 0 until PqK) {
        val c = models(m).centroids(j)
        var acc = 0.0
        var i = 0
        while (i < PqSubDim) { acc += q(m * PqSubDim + i) * c(i); i += 1 }
        lut(m * PqK + j) = acc
      }
      (qid, lut.toSeq)
    }.toSeq
    val probes = s.createDataFrame(luts).toDF("q_id", "lut")
    val scored = codes.join(broadcast(probes))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc_sim", round(expr(
        s"""aggregate(transform(sequence(0, ${PqM - 1}),
           |  m -> element_at(lut, m * $PqK
           |       + int(shiftrightunsigned(code, 4 * m) & ${PqK - 1}) + 1)),
           |  0.0D, (acc, x) -> acc + x)""".stripMargin), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
    scored.withColumn("adc_rank", row_number().over(w).cast("long"))
      .filter(col("adc_rank") <= shortlist)
      .select(col("q_id"), col("adc_rank"), col("vec_id"), col("adc_sim"))
  }

  /** PQ search as deployed (Jégou et al. §VII: ADC shortlist + exact
    * re-rank): the quantized scan ranks the WHOLE corpus from codes
    * alone, the float embeddings are re-attached only for the
    * shortlist×queries surviving rows, and the final top-k is exact
    * cosine over that shortlist. Quantization error now costs recall
    * only when a true neighbor falls outside the shortlist entirely —
    * the (shortlist/k)× headroom is the tunable accuracy/IO dial.
    */
  def pqTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val shortlisted = pqAdc(s, dir, shortlist = 10 * k)
      .select("q_id", "vec_id")
    val scored = shortlisted
      .join(emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm")), Seq("vec_id"))
      .join(broadcast(querySide(emb)), Seq("q_id"))
      .withColumn("cos_sim", cosScore)
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** Two-stage IVF search: fit the coarse quantizer, rank cells by
    * query↔centroid similarity, scan only the nProbe best cells for
    * the true top-k. In production the model is fit once per corpus
    * snapshot and the corpus is written partitioned by `cluster_id`;
    * here the fit (a few small Lloyd rounds) runs inline, memoized per
    * corpus dir.
    */
  def annTopK(s: SparkSession, dir: String, nProbe: Int, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val model = fittedModel(emb, dir)
    val cents = model.toDf(emb)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cluster_id").asc)
    val probes = querySide(emb).join(broadcast(cents))
      .withColumn("c_sim", round(Vectors.cosine(col("q_emb"), col("centroid")), 6))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cluster_id"))
    // corpus norm + cell id below the join: once per vector, not per
    // (q, vector) — the assignment is k native dot products per row
    val scored = emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm"),
        model.assignCol(col("embedding")).as("cluster_id"))
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosScore)
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        col("cluster_id").cast("long").as("cell"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** The IVF index build, made literal: the corpus written partitioned
    * by `cluster_id`, with the per-vector norm precomputed — once per
    * corpus snapshot, like the quantizer fit. [[annTopKIndexed]] then
    * turns probe-pruning into PARTITION pruning: un-probed cells are
    * never read, where [[annTopK]] (the index-less form) still scans
    * every row to assign its cell before filtering.
    */
  def buildIvfIndex(s: SparkSession, dir: String, indexDir: String): KMeans.Model = {
    val emb = Tables(s, dir, "embeddings")
    val model = fittedModel(emb, dir)
    emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm"),
        model.assignCol(col("embedding")).as("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(indexDir)
    model
  }

  /** ANN over the materialized index. The probed cell set is collected
    * to the driver — |queries| × nProbe cell ids, model scale — and
    * applied as a LITERAL `cluster_id IN (…)` predicate, so pruning is
    * static at planning time: the scan lists only the probed partition
    * directories (PlanSpec pins this). Everything after the scan is
    * identical to [[annTopK]], and with every cell probed the results
    * coincide.
    */
  def annTopKIndexed(s: SparkSession, dir: String, indexDir: String,
      nProbe: Int, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val model = fittedModel(emb, dir)
    val cents = model.toDf(emb)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cluster_id").asc)
    val probes = querySide(emb).join(broadcast(cents))
      .withColumn("c_sim", round(Vectors.cosine(col("q_emb"), col("centroid")), 6))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cluster_id"))
    val probedCells = probes.select("cluster_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val scored = s.read.parquet(indexDir)
      .filter(col("cluster_id").isin(probedCells.map(Integer.valueOf): _*))
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosScore)
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        col("cluster_id").cast("long").as("cell"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed ANN (the non-learned alternative to [[annTopK]]'s
    * IVF): every vector gets 64 sign-random-projection bits (native
    * `rp_bits`), carved into `LshTables` bucket keys of `LshBits`
    * bits; each query probes, per table, its home bucket plus all
    * Hamming-1 neighbours. Only colliding (query, candidate) pairs —
    * deduplicated ids-first, like the MinHash pipeline — are scored
    * with the exact cosine. No index fit at all: the bucket key is a
    * pure per-row function, which is the operational advantage over
    * IVF (no training pass over the corpus, stable keys under
    * appends).
    *
    * 100 TB shape: the corpus bucket table (vec_id, bucket — ids
    * only, L rows per vector) is written partitioned by `bucket`; the
    * probe set (|queries| × L × (b+1) rows) broadcasts; the bucket
    * equi-join prunes whole partitions at the scan; embeddings are
    * re-attached once per *surviving distinct pair*, never dragged
    * through the bucket explosion.
    */
  def lshTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val mask = (1L << LshBits) - 1
    // (table << b) | tableKey — one composite bucket id per table
    val buckets = emb.select(col("vec_id"),
        graft.expressions.VectorExprs.rpBits(
          col("embedding"), LshTables * LshBits, EmbDim).as("bits"))
      .select(col("vec_id"), explode(expr(
        s"""transform(sequence(0, ${LshTables - 1}),
           |  t -> shiftleft(bigint(t), $LshBits)
           |       | (shiftrightunsigned(bits, t * $LshBits) & $mask))""".stripMargin))
        .as("bucket"))
    // per table: home bucket + every Hamming-1 neighbour (bit flips
    // stay inside the low b key bits, so the table tag is preserved)
    val probes = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), explode(concat(
        array(col("bucket")),
        expr(s"transform(sequence(0, ${LshBits - 1}), f -> bucket ^ shiftleft(1L, f))")))
        .as("bucket"))
    val pairs = buckets.join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id").distinct()
    val scored = pairs
      .join(emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm")), Seq("vec_id"))
      .join(broadcast(querySide(emb)), Seq("q_id"))
      .withColumn("cos_sim", cosScore)
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** The bounded query set every variant shares: vec_id < 10, with
    * the norm precomputed once per query vector. O(1)-sized by
    * construction ⇒ always broadcastable.
    */
  /** Exact brute-force cosine top-k for the shared bounded query set —
    * the baseline every ANN variant's recall is measured against, and
    * q_sim_topk itself. Broadcast query side, window top-k, no global
    * sort. Output: (q_id, rank, vec_id, cos_sim).
    */
  private[graft] def bruteTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val scored = emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("c_nrm"))
      .join(broadcast(querySide(emb)))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosScore)
    rankTopK(scored, k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  private def querySide(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        Vectors.norm(col("embedding")).as("q_nrm"))

  /** Exact cosine over the (q_emb, q_nrm) × (embedding, c_nrm)
    * columns, rounded to the oracle grid — the single scoring formula
    * all three variants (brute force, IVF, LSH) rank by, so the
    * spec'd recall comparisons stay apples-to-apples.
    */
  private def cosScore: org.apache.spark.sql.Column =
    round(Vectors.dot(col("q_emb"), col("embedding")) /
      (col("q_nrm") * col("c_nrm")), 4)

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    // Rank on the rounded score with an id tie-break so ranks are
    // deterministic (and engine-independent for the oracle variant).
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One-pass covariance moments + deterministic driver-side power
    * iteration → the corpus's top principal component (see
    * q_embed_pca). Exposed for the spec.
    */
  /** The flat (n, d, μ, upper-triangle cov) moment vector — one
    * aggregate pass over the corpus.
    */
  private[graft] def embedPcaMoments(s: SparkSession, dir: String): Seq[Double] =
    Tables(s, dir, "embeddings")
      .agg(graft.functions.CovAgg(col("embedding")).as("m"))
      .collect()(0).getSeq[Double](0)

  private[graft] def embedPca(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CovAgg
    val flat = embedPcaMoments(s, dir)
    val (n, mean, cov) = CovAgg.covarianceOf(flat)
    val (lambda, pc1) = CovAgg.topEigen(cov)
    import s.implicits._
    // + 1e-9 before the grid, + 0.0 after (hazard H1: tie nudge and
    // the IEEE −0.0 that a tiny negative mean would round to on one
    // engine only) — mirrored in [[pcaOracle]]
    mean.indices.map(i => (i.toLong,
        math.rint((mean(i) + 1e-9) * 1e6) / 1e6 + 0.0,
        math.rint((pc1(i) + 1e-9) * 1e6) / 1e6 + 0.0,
        math.rint((lambda + 1e-9) * 1e4) / 1e4, n))
      .toDF("dim", "mean", "pc1_loading", "top_eigenvalue", "n_vectors")
      .orderBy("dim")
  }

  /** Generated oracle for q_embed_pca: the ENTIRE pipeline — moment
    * pass, covariance assembly, and all `iters` rounds of the
    * [[graft.functions.CovAgg.topEigen]] power iteration — re-derived
    * as a chained SQL CTE (the pagerank/bpe discipline: no
    * data-dependent literals). Per round: one 64-row mat-vec
    * (cov ⨝ u → group), one scalar norm, one normalize; the sign
    * canonicalization (first |loading| > 1e-12 positive) mirrors the
    * Scala step on the RAW converged vector. The oracle replays only
    * the FIRST start vector (sin(i+1)); topEigen prefers a start
    * whose Rayleigh residual beats 1e-8·scale·d but falls back to the
    * FIRST start when none does, so oracle ≡ query unless the second
    * start alone passes — PipelineSpec replicates the selection and
    * pins that it lands on the first-start iterate on the fixtures
    * (the same pinned-precondition discipline as the multimodal
    * ASCII guard). Engine drift through
    * 200 contraction rounds stays ~1e-14 (the iteration is
    * continuous, never threshold-based), absorbed by the 6-decimal
    * grid + 1e-9 nudge.
    */
  private def pcaOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH flat AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |              CAST(count(*) AS BIGINT) AS nl FROM embeddings),
        |mu AS MATERIALIZED (
        |  SELECT i, sum(v) / (SELECT n FROM nn) AS mu FROM flat GROUP BY i),
        |cov AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j,
        |         sum(a.v * b.v) / (SELECT n FROM nn)
        |           - (SELECT mu FROM mu WHERE mu.i = a.i)
        |           * (SELECT mu FROM mu WHERE mu.i = b.i) AS c
        |  FROM flat a JOIN flat b USING (vec_id)
        |  GROUP BY a.i, b.i),
        |v0 AS MATERIALIZED (
        |  SELECT i, sin(CAST(i AS DOUBLE)) AS x FROM (SELECT DISTINCT i FROM flat)),
        |n0 AS (SELECT sqrt(sum(x * x)) AS nrm FROM v0),
        |u0 AS MATERIALIZED (SELECT i, x / (SELECT nrm FROM n0) AS x FROM v0)""".stripMargin)
    for (k <- 1 to iters) sb.append(s""",
        |w$k AS MATERIALIZED (
        |  SELECT cov.i AS i, sum(cov.c * u${k - 1}.x) AS x
        |  FROM cov JOIN u${k - 1} ON u${k - 1}.i = cov.j
        |  GROUP BY cov.i),
        |l$k AS (SELECT sqrt(sum(x * x)) AS nrm FROM w$k),
        |u$k AS MATERIALIZED (SELECT i, x / (SELECT nrm FROM l$k) AS x FROM w$k)""".stripMargin)
    sb.append(s""",
        |sgn AS (
        |  SELECT CASE WHEN (SELECT x FROM u$iters
        |                    WHERE abs(x) > 1e-12 ORDER BY i LIMIT 1) < 0
        |         THEN -1.0 ELSE 1.0 END AS s)
        |SELECT CAST(m.i - 1 AS BIGINT) AS dim,
        |       round(m.mu + 1e-9, 6) + 0.0 AS mean,
        |       round(u.x * (SELECT s FROM sgn) + 1e-9, 6) + 0.0 AS pc1_loading,
        |       round((SELECT nrm FROM l$iters) + 1e-9, 4) AS top_eigenvalue,
        |       (SELECT nl FROM nn) AS n_vectors
        |FROM mu m JOIN u$iters u USING (i)
        |ORDER BY dim""".stripMargin)
    sb.toString
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): cluster the corpus
    * with the coarse quantizer, then mark every vector that has a
    * LOWER-id same-cluster neighbor at cosine ≥ τ as a semantic
    * duplicate. The clustering is the paper's scalability trick — the
    * quadratic pairing runs per CLUSTER (self-join keyed on
    * cluster_id), never corpus-wide, so 100 TB shards by cluster and
    * each cluster's pairing is independent work. Norms are computed
    * once per vector below the join; the dedup rule is deterministic
    * (min-id keeper), and survivors are provably pairwise < τ within
    * a cluster (any ≥ τ pair marks its higher id — PipelineSpec
    * asserts the invariant brute-force).
    */
  private[graft] def semDedup(s: SparkSession, dir: String, tau: Double): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val model = semDedupModel(emb, dir)
    val assigned = emb.select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("nrm"),
        model.assignCol(col("embedding")).as("cluster_id"))
      .localCheckpoint()
    val a = assigned.select(col("cluster_id"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    val dups = a.join(b, Seq("cluster_id"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(Vectors.dot(col("emb_a"), col("emb_b")) /
        (col("nrm_a") * col("nrm_b")), 4) >= tau)
      .select(col("cluster_id"), col("vec_b").as("vec_id")).distinct()
    assigned.select("cluster_id", "vec_id")
      .join(dups.withColumn("is_dup", lit(1L)), Seq("cluster_id", "vec_id"), "left_outer")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dups"))
      .select(col("cluster_id").cast("long").as("cluster_id"),
        col("n_vectors"), col("n_dups"))
      .orderBy("cluster_id")
  }

  def entries: Map[String, QueryDef] = Map(

    // SemDeDup declared as a query ([LLM]): per-cluster corpus size
    // and semantic-duplicate count at τ=0.35 (the fixture's
    // embedding-similarity band — the same threshold the pairwise
    // `q_dedup_embed_cosine` uses). Hash-checked since r8:
    // [[semDedupOracle]] re-derives the k-means (k computed in SQL,
    // md5 init, 3 Lloyd rounds) AND the dedup rule; PipelineSpec
    // still pins the survivors-pairwise-below-τ invariant, keeper
    // preservation, τ-monotonicity, and the assignment margins the
    // oracle's validity rests on.
    "q_semdedup" -> QueryDef(
      (s, dir) => semDedup(s, dir, 0.35),
      Some(semDedupOracle(iters = 3, tau = "0.35"))),

    // Embedding outlier screen ([NS] — the hygiene step before ANN
    // indexing / near-dup: vectors whose per-dimension z-scores blow
    // up are encoder failures or corrupt rows). Score = diagonal
    // Mahalanobis Σ((xᵢ−μᵢ)/σᵢ)². μ/σ come from ONE CovAgg moment
    // pass (no explode — the shuffle carries the moment buffer, not
    // d rows per vector) and broadcast as literals; the score is a
    // row-local codegen'd zip_with/aggregate fold; top-20 is a
    // TakeOrdered, never a global sort. The oracle recomputes via
    // explode + stddev_pop — same population formula.
    "q_embed_outliers" -> QueryDef(
      (s, dir) => {
        import graft.functions.CovAgg
        val (_, mean, cov) = CovAgg.covarianceOf(embedPcaMoments(s, dir))
        val muLit = array(mean.map(lit).toSeq: _*)
        val sdLit = array(mean.indices.map(i => lit(math.sqrt(cov(i)(i)))): _*)
        Tables(s, dir, "embeddings")
          .select(col("vec_id"),
            aggregate(
              zip_with(
                zip_with(col("embedding").cast("array<double>"), muLit, (a, b) => a - b),
                sdLit, (c, sd) => pow(c / sd, 2)),
              lit(0.0), (acc, x) => acc + x).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(20)
          .select(col("vec_id"), round(col("score"), 4).as("m2"))
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
             |  FROM embeddings),
             |stats AS (
             |  SELECT dim, avg(v) AS mu, stddev_pop(v) AS sd FROM flat GROUP BY dim),
             |scores AS (
             |  SELECT vec_id, sum(pow((v - mu) / sd, 2)) AS score
             |  FROM flat JOIN stats USING (dim) GROUP BY vec_id)
             |SELECT vec_id, round(score, 4) AS m2
             |FROM scores ORDER BY score DESC, vec_id LIMIT 20""".stripMargin)),

    // Embedding-corpus PCA ([NS] — drift monitoring / whitening / the
    // quality screen before ANN indexing): per-dimension mean and the
    // top principal component of the embedding distribution. ONE
    // aggregate pass folds (Σv, upper-triangle Σv·vᵀ, n) via the
    // mergeable CovAgg buffer — the shuffle carries d(d+3)/2+1
    // doubles per partition, never a row multiplication — and the
    // d×d eigen step is a deterministic driver-side power iteration
    // (model-scale, the k-means-centroid collect budget). Hash-checked
    // since r8: [[pcaOracle]] replays the moment pass AND all 200
    // power-iteration rounds as a chained SQL CTE — "eigenvectors
    // aren't SQL-expressible" retired the way bpe/pagerank were; the
    // spec still pins Av = λv, unit norm, and a known-axis corpus.
    "q_embed_pca" -> QueryDef((s, dir) => embedPca(s, dir),
      Some(pcaOracle(200))),

    // Per-label centroid — the distributed vector mean behind every
    // IVF/k-means build, surfaced as a query. VecMeanAgg keeps ONE
    // (sums, count) state per label per partition (the shuffle carries
    // labels × (dim+1) doubles however large the corpus; a
    // posexplode→avg plan would push dim rows per vector through the
    // exchange instead). The oracle unnests per-dimension — output is
    // (label, n_vecs, pos, mean) rows, doubles rounded on the shared
    // 4-decimal grid with the 1e-9 nudge (float-sum ordering, hazard
    // H1).
    "q_embed_centroid" -> QueryDef(
      (s, dir) => graft.Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(graft.functions.VecMeanAgg(col("embedding")).as("c"),
          count(lit(1)).as("n_vecs"))
        .select(col("label").cast("long").as("label"), col("n_vecs"),
          posexplode(col("c")).as(Seq("pos", "v")))
        .select(col("label"), col("n_vecs"),
          (col("pos") + 1).cast("long").as("pos"),
          // + 0.0 after the round: near-zero means round to IEEE -0.0
          // on one engine only (hazard H1, same as q_agg_stats)
          (round(col("v") + 1e-9, 4) + 0.0).as("mv"))
        .orderBy("label", "pos"),
      Some("""WITH e AS (
             |  SELECT label, unnest(embedding) AS v,
             |         unnest(generate_series(1, len(embedding))) AS pos
             |  FROM embeddings),
             |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
             |SELECT CAST(e.label AS BIGINT) AS label,
             |       CAST(n.n_vecs AS BIGINT) AS n_vecs,
             |       CAST(pos AS BIGINT) AS pos,
             |       round(avg(CAST(v AS DOUBLE)) + 1e-9, 4) + 0.0 AS mv
             |FROM e JOIN n USING (label)
             |GROUP BY e.label, n.n_vecs, pos
             |ORDER BY label, pos""".stripMargin)),

    // Exact brute-force cosine top-5 for 10 query vectors. The query
    // side is tiny → Spark broadcasts it; the corpus is scanned once,
    // scored in codegen, and reduced via per-group top-k (window +
    // filter, no global sort).
    "q_sim_topk" -> QueryDef(
      (s, dir) => bruteTopK(s, dir, 5),
      Some("""WITH scored AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
             |SELECT q_id, rank, vec_id, cos_sim FROM (
             |  SELECT q_id, vec_id, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id ASC) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Hard-negative mining — the contrastive-training data op (train a
    // retriever/embedder on "most similar items with a DIFFERENT
    // label"): per query vector, the top-5 nearest neighbors whose
    // cluster label differs from the query's. Same broadcast-query /
    // window-top-k shape as q_sim_topk with the label-mismatch
    // predicate applied BEFORE ranking (a codegen'd filter on the
    // scored stream — no extra shuffle). 100 TB path: swap the brute
    // scored stream for the IVF/LSH candidate stream (annTopK /
    // lshTopK) and keep the same filter + rank tail — mining rides
    // whatever ANN index already exists.
    "q_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("q_emb"),
            Vectors.norm(col("embedding")).as("q_nrm"))
        val scored = emb.select(col("vec_id"), col("label"), col("embedding"),
            Vectors.norm(col("embedding")).as("c_nrm"))
          .join(broadcast(q))
          .filter(col("label") =!= col("q_label"))
          .withColumn("cos_sim", cosScore)
        rankTopK(scored, 5)
          .select(col("q_id"), col("rank"), col("vec_id"),
            col("label").cast("long").as("neg_label"), col("cos_sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH scored AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             |    CAST(c.label AS BIGINT) AS neg_label,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c
             |    ON q.vec_id < 10 AND c.label <> q.label)
             |SELECT q_id, rank, vec_id, neg_label, cos_sim FROM (
             |  SELECT q_id, vec_id, neg_label, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id ASC) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // IVF-style ANN, declared in its EXHAUSTIVE-PROBE form (nProbe =
    // all cells): the full two-stage machinery runs — coarse-quantizer
    // fit, centroid ranking, per-cell candidate join — and probing
    // every cell makes the result provably equal to exact brute-force
    // cosine top-k, so the driver hash-compares it against the brute
    // SQL oracle (any regression in cell assignment, probe ranking, or
    // the candidate join breaks the hash). The PRUNED operating point
    // (nProbe=2 — approximate, recall < 1) stays exercised by the
    // ScalaTest recall-floor spec and the partition-pruning PlanSpec.
    "q_sim_ann" -> QueryDef(
      (s, dir) => annTopK(s, dir, nProbe = AnnCells, k = 5)
        .select("q_id", "rank", "vec_id", "cos_sim"),
      Some("""WITH scored AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
             |SELECT q_id, rank, vec_id, cos_sim FROM (
             |  SELECT q_id, vec_id, cos_sim,
             |         row_number() OVER (PARTITION BY q_id
             |           ORDER BY cos_sim DESC, vec_id ASC) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Hyperplane-LSH ANN: 8 tables × 8 bits, Hamming-≤1 multi-probe
    // per table. Approximate (a neighbour missing every probed bucket
    // in every table is lost) ⇒ no oracle; the ScalaTest spec checks
    // a recall floor against exact brute force and key determinism.
    // PROMOTED r7 from rows-only to hash-checked: the Rademacher
    // hyperplane matrix is a deterministic CONSTANT (hash-derived, see
    // RpKernels.signs), so the oracle EMBEDS all 64×64 signs as SQL
    // literals and rebuilds the entire pipeline — per-bit projection
    // signs (identical IEEE accumulation order ⇒ identical sign at
    // the >= 0 cut), per-table key packing, composite buckets,
    // Hamming-≤1 probes, distinct candidate pairs, exact cosine
    // re-rank — the generated-oracle pattern (q_pagerank, q_sim_mmr).
    // The spec'd recall floor vs brute force stays in PipelineSpec.
    "q_sim_lsh" -> QueryDef(
      (s, dir) => lshTopK(s, dir, k = 5), Some(lshOracle)),

    // Product-quantization ADC top-5 ([LLM] — the memory-bound ANN
    // path: the searchable corpus is one packed long per vector, a
    // 64× compression, so a 100 TB float corpus scans as ~1.5 TB of
    // codes). k-means codebooks + genuinely lossy 4-bit quantization
    // ⇒ rows-only (SURVEY §5.3.4): on this near-isotropic fixture
    // (neighbor cos ≈ 0.32) the true top-5 sits as deep as ~25 % of
    // the corpus in ADC order at every SF (measured r6), so no honest
    // shortlist makes the re-ranked output equal brute force — an
    // oracle would only hold by re-ranking the whole corpus.
    // PipelineSpec pins ADC ≡ exact-dot-on-reconstruction (the
    // defining identity), nibble-range sanity, and a recall floor vs
    // exact brute force.
    "q_sim_pq" -> QueryDef(
      (s, dir) => pqTopK(s, dir, k = 5), None),

    // The PQ INDEX ARTIFACT itself, hash-checked (r8): one packed
    // 8-nibble long per vector — the memory-bound scan representation
    // q_sim_pq's ADC pass reads. The generated oracle re-derives the
    // ENTIRE build in SQL ([[pqCodesOracle]]): float normalization,
    // the md5-ordered init sample, all 3 Lloyd rounds of all 8
    // subspace codebooks (argmin with the kernel's exact
    // |c|²−2·v·c form and lowest-j ties, empty clusters keeping
    // their centroid), and the final nibble-packed encode — so the
    // lossy-codes layer that made q_sim_pq's shortlist un-oracle-able
    // is itself value-checked end to end.
    "q_sim_pq_codes" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        pqCodes(emb, pqModels(emb, dir))
          .select(col("vec_id"), col("code").as("pq_code"))
          .orderBy("vec_id")
      },
      Some(pqCodesOracle(iters = 3))),

    // Embedding L2-normalization + symmetric int8 quantization — the
    // storage-side half of every vector index (a quantized corpus is
    // 4× smaller on the wire and in cache; IVF/LSH probes re-rank the
    // int8 codes and only fetch floats for survivors). Row-local
    // higher-order functions end to end: zero shuffle, scales as a
    // pure scan. Per-vector outputs (norm + code-vector summary stats)
    // keep the oracle row count at one per vector instead of one per
    // dimension; all math in double on both engines (hazard H1), and
    // the quantized codes are exact integers so their sum/extrema
    // compare without rounding grids.
    // MMR (maximal marginal relevance) diversified top-k: the
    // RAG-retrieval re-rank that trades relevance against redundancy —
    // score λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s), greedy over K
    // picks. Structure at scale: the EXPENSIVE part (corpus scan +
    // per-query top-C shortlist) is the distributed q_sim_topk shape
    // (broadcast query side, windowed top-C); the greedy re-rank then
    // runs on the O(|queries|·C) shortlist — model-scale by
    // construction (the k-means-centroid collect discipline), with
    // all pair sims computed in the same IEEE order DuckDB uses so
    // the oracle's unrolled greedy (one chained CTE per pick, the
    // q_pagerank generated-oracle pattern) hash-matches exactly.
    "q_sim_mmr" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val scored = emb.select(col("vec_id"), col("embedding"),
            Vectors.norm(col("embedding")).as("c_nrm"))
          .join(broadcast(querySide(emb)))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos_sim", cosScore)
        val cand = rankTopK(scored, MmrCand)
          .select(col("q_id"), col("vec_id"),
            col("cos_sim").as("rel"), col("embedding"))
        def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        // identical accumulation order to the oracle's list_sum
        def cosLocal(a: Array[Float], b: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            val x = a(i).toDouble; val y = b(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          r4(dot / (math.sqrt(na) * math.sqrt(nb)))
        }
        val picks = cand.collect().groupBy(_.getLong(0)).toSeq.flatMap {
          case (q, rs) =>
            val cs = rs.map(r => (r.getLong(1), r.getDouble(2),
              r.getSeq[Float](3).toArray)).sortBy(_._1).toVector
            val psim = cs.flatMap(a => cs.collect {
              case b if a._1 != b._1 => (a._1, b._1) -> cosLocal(a._3, b._3)
            }).toMap
            var selected = Vector.empty[(Long, Double, Double)]
            var remaining = cs
            (1 to MmrK).foreach { _ =>
              val best = remaining.map { c =>
                val maxSim =
                  if (selected.isEmpty) 0.0
                  else selected.map(sel => psim((c._1, sel._1))).max
                (c, r4(MmrLambda * c._2 - MmrGamma * maxSim + 1e-9))
              }.minBy { case (c, m) => (-m, c._1) }
              selected :+= ((best._1._1, best._1._2, best._2))
              remaining = remaining.filterNot(_._1 == best._1._1)
            }
            selected.zipWithIndex.map { case ((id, rel, mmr), i) =>
              (q, (i + 1).toLong, id, rel, mmr) }
        }
        import s.implicits._
        picks.sortBy(p => (p._1, p._2)).toSeq
          .toDF("q_id", "pick_rank", "vec_id", "rel", "mmr")
      },
      Some(mmrOracle)),

    // Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et
    // al. SIGIR'09 — the fusion every hybrid RAG stack ships): for
    // each query document, a LEXICAL more-like-this ranking
    // (IDF-weighted shared-word score over the (doc, word) grid — the
    // Lucene MLT form) and a DENSE cosine ranking (the q_sim_topk
    // broadcast-query shape over the aligned embedding row) each
    // produce a top-20 list; fused score = Σ 1/(60 + rank) over the
    // lists a document appears in, top-10 kept. Scale: one token-grid
    // shuffle + one corpus scan; the fusion join runs on O(queries·20)
    // rows. Determinism: both ranks come off rounded scores with id
    // tie-breaks, and the fused score is a sum of exact rationals in
    // a fixed expression order — bit-identical across engines.
    "q_hybrid_rrf" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val eScored = emb.select(col("vec_id"), col("embedding"),
            Vectors.norm(col("embedding")).as("c_nrm"))
          .join(broadcast(emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              Vectors.norm(col("embedding")).as("q_nrm"))))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos_sim", cosScore)
        val eRank = rankTopK(eScored, 20)
          .select(col("q_id"), col("vec_id").as("doc_id"),
            col("rank").as("e_rank"))
        // toks is MATERIALIZED: it feeds the df count, the query-side
        // filter and the scoring join — un-checkpointed, Catalyst
        // re-tokenized the corpus per consumer (r15 plan audit: 3
        // scans+Generates of documents → 1). Token-scale; guide §2.4.
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            explode(array_distinct(graft.functions.TextFns.words(col("text"))))
              .as("word"))
          .localCheckpoint()
        val nDocs = Tables(s, dir, "documents")
          .agg(count(lit(1)).cast("double").as("n_docs"))
        val dfw = toks.groupBy("word")
          .agg(count(lit(1)).cast("double").as("df"))
        val qToks = toks.filter(col("doc_id") < 5)
          .select(col("doc_id").as("q_id"), col("word"))
        val lScored = toks.join(dfw, "word")
          .join(broadcast(qToks), "word")
          .filter(col("q_id") =!= col("doc_id"))
          .crossJoin(broadcast(nDocs))
          .groupBy("q_id", "doc_id")
          .agg(round(sum(log(col("n_docs") / col("df"))) + lit(1e-9), 4)
            .as("mlt"))
        val wl = Window.partitionBy(col("q_id"))
          .orderBy(col("mlt").desc, col("doc_id").asc)
        val lRank = lScored
          .withColumn("l_rank", row_number().over(wl).cast("long"))
          .filter(col("l_rank") <= 20)
          .select(col("q_id"), col("doc_id"), col("l_rank"))
        val wf = Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)
        eRank.join(lRank, Seq("q_id", "doc_id"), "full_outer")
          // + 1e-9 before the 6-decimal round: the repo-wide tie nudge
          // (hazard H1) — reciprocal-rank sums land near but provably
          // never ON the grid, and the nudge makes that irrelevant
          .withColumn("rrf", round(
            coalesce(lit(1.0) / (lit(60) + col("e_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("l_rank")), lit(0.0)) +
              lit(1e-9), 6))
          .withColumn("rank", row_number().over(wf).cast("long"))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank"), col("doc_id"), col("rrf"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH esc AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c
             |    ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
             |erank AS (
             |  SELECT q_id, doc_id, rank AS e_rank FROM (
             |    SELECT q_id, doc_id,
             |      row_number() OVER (PARTITION BY q_id
             |        ORDER BY cos_sim DESC, doc_id ASC) AS rank
             |    FROM esc) WHERE rank <= 20),
             |toks AS (
             |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
             |  FROM documents),
             |dfw AS (
             |  SELECT word, CAST(count(*) AS DOUBLE) AS df FROM toks GROUP BY word),
             |corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
             |lsc AS (
             |  SELECT q.doc_id AS q_id, t.doc_id,
             |    round(sum(ln(n_docs / df)) + 1e-9, 4) AS mlt
             |  FROM toks t
             |  JOIN dfw USING (word)
             |  JOIN toks q ON q.word = t.word AND q.doc_id < 5
             |    AND q.doc_id <> t.doc_id
             |  CROSS JOIN corpus
             |  GROUP BY q.doc_id, t.doc_id),
             |lrank AS (
             |  SELECT q_id, doc_id, rank AS l_rank FROM (
             |    SELECT q_id, doc_id,
             |      row_number() OVER (PARTITION BY q_id
             |        ORDER BY mlt DESC, doc_id ASC) AS rank
             |    FROM lsc) WHERE rank <= 20),
             |fused AS (
             |  SELECT coalesce(e.q_id, l.q_id) AS q_id,
             |    coalesce(e.doc_id, l.doc_id) AS doc_id,
             |    round(coalesce(1.0 / (60 + e.e_rank), 0.0) +
             |          coalesce(1.0 / (60 + l.l_rank), 0.0) + 1e-9, 6) AS rrf
             |  FROM erank e FULL OUTER JOIN lrank l
             |    ON e.q_id = l.q_id AND e.doc_id = l.doc_id)
             |SELECT q_id, rank, doc_id, rrf FROM (
             |  SELECT q_id, doc_id, rrf,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY rrf DESC, doc_id ASC) AS rank
             |  FROM fused)
             |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)),

    "q_embed_normalize" -> QueryDef(
      (s, dir) => {
        val sq = aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), sqrt(sq).as("nrm"))
          .withColumn("q", transform(col("embedding"),
            x => round(x.cast("double") * 127.0 / col("nrm"), 0).cast("long")))
          .select(col("vec_id"), round(col("nrm"), 4).as("l2_norm"),
            aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
            array_min(col("q")).as("q_min"),
            array_max(col("q")).as("q_max"))
          .orderBy("vec_id")
      },
      Some("""WITH n AS (
             |  SELECT vec_id, embedding,
             |    sqrt(list_sum(list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, nrm,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / nrm, 0) AS BIGINT)) AS qv
             |  FROM n)
             |SELECT vec_id, round(nrm, 4) AS l2_norm,
             |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
             |  CAST(list_min(qv) AS BIGINT) AS q_min,
             |  CAST(list_max(qv) AS BIGINT) AS q_max
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Retrieval quality evaluation ([LLM] — the metric loop every
    // retrieval/embedding pipeline closes with: NDCG@10, DCG, and
    // precision@10 of the brute-force cosine ranking against the
    // fixture's class labels as binary relevance). The eval rides the
    // SAME distributed shape as q_sim_topk (broadcast query side,
    // windowed top-k shortlist — the expensive pass); the metric
    // arithmetic is shortlist-scale. IDCG folds 1/log₂(r+1) over
    // sequence(1, min(R,10)) as a row-local HOF (R = class size − 1
    // from a vocab-scale label-count broadcast, ≥43 on the fixture so
    // the guard never bites but the form is total). Determinism: the
    // shortlist ranking is on ROUNDED scores (q_sim_topk's
    // cross-engine rank identity), relevance is exact integer label
    // equality, and the ≤10-term log₂ sums carry the 1e-9 nudge.
    "q_rank_ndcg" -> QueryDef(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val qlbl = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qq"), col("label").as("qlbl"))
        val clbl = emb.select(col("vec_id").as("cc"), col("label").as("clbl"))
        val ccnt = emb.groupBy(col("label").as("nl"))
          .agg(count(lit(1)).as("ncls"))
        val scored = bruteTopK(s, dir, 10)
          .join(broadcast(qlbl), col("q_id") === col("qq"))
          .join(broadcast(clbl), col("vec_id") === col("cc"))
          .withColumn("rel",
            when(col("qlbl") === col("clbl"), 1L).otherwise(0L))
        val perQ = scored.groupBy(col("q_id"), col("qlbl"))
          .agg(sum(col("rel")).as("hits"),
            sum(col("rel").cast("double") /
              log2(col("rank").cast("double") + lit(1.0))).as("dcg_r"))
        perQ
          .join(broadcast(ccnt), col("qlbl") === col("nl"))
          .withColumn("n_rel", col("ncls") - 1L)
          .withColumn("idcg_r", aggregate(
            sequence(lit(1L), greatest(least(col("n_rel"), lit(10L)), lit(1L))),
            lit(0.0),
            (acc, r) => acc + lit(1.0) / log2(r.cast("double") + lit(1.0))))
          .select(col("q_id"), col("n_rel"), col("hits"),
            round(col("hits").cast("double") / lit(10.0) + 1e-9, 4)
              .as("p_at_10"),
            round(col("dcg_r") + 1e-9, 4).as("dcg"),
            round(col("dcg_r") / col("idcg_r") + 1e-9, 4).as("ndcg"))
          .orderBy("q_id")
      },
      Some("""WITH scored AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             |    q.label AS qlbl, c.label AS clbl,
             |    round(
             |      list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(range(1, 65),
             |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4) AS cos_sim
             |  FROM embeddings q JOIN embeddings c
             |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
             |ranked AS (
             |  SELECT q_id, qlbl,
             |    CASE WHEN qlbl = clbl THEN 1 ELSE 0 END AS rel,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
             |  FROM scored),
             |perq AS (
             |  SELECT q_id, qlbl,
             |    CAST(sum(rel) AS BIGINT) AS hits,
             |    sum(CAST(rel AS DOUBLE) /
             |      log2(CAST(rank AS DOUBLE) + 1.0)) AS dcg_r
             |  FROM ranked WHERE rank <= 10 GROUP BY 1, 2),
             |cnt AS (
             |  SELECT label AS nl, CAST(count(*) AS BIGINT) AS ncls
             |  FROM embeddings GROUP BY 1)
             |SELECT q_id, ncls - 1 AS n_rel, hits,
             |  round(CAST(hits AS DOUBLE) / 10.0 + 1e-9, 4) AS p_at_10,
             |  round(dcg_r + 1e-9, 4) AS dcg,
             |  round(dcg_r / list_sum(list_transform(
             |    range(1, CAST(greatest(least(ncls - 1, 10), 1) AS INTEGER) + 1),
             |    r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))) + 1e-9, 4) AS ndcg
             |FROM perq JOIN cnt ON qlbl = nl ORDER BY q_id""".stripMargin)),

    // IVF recall@k at the PRUNED operating point (nProbe=2) — the
    // acceptance test every production ANN index passes before it
    // serves traffic: how much of the true top-10 does the probe-
    // pruned search retain? q_rank_ndcg scores the ranking against
    // LABELS; this scores the APPROXIMATION against exact brute force.
    // Both sides are the established distributed shapes (broadcast
    // query side + windowed top-k; the coarse quantizer is model
    // state), and the comparison join runs on O(|queries|·k) rows —
    // model scale. The oracle re-derives the whole pruned search in
    // SQL ([[annRecallOracle]]): until r8 the approximate operating
    // point was spec-only, because the exhaustive-probe form q_sim_ann
    // hash-checks never exercises cell assignment or probe ranking —
    // this query makes the driver verify BOTH (any drift in the Lloyd
    // fit, the assignment argmin, or the round-6 probe ranking breaks
    // the hash).
    "q_ann_recall" -> QueryDef(
      (s, dir) => {
        val brute = bruteTopK(s, dir, AnnRecallK)
          .select(col("q_id"), col("vec_id"))
        val pruned = annTopK(s, dir, nProbe = AnnRecallProbe, k = AnnRecallK)
          .select(col("q_id"), col("vec_id"))
        val hits = brute.join(pruned, Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("h"))
        brute.select(col("q_id")).distinct()
          .join(hits, Seq("q_id"), "left")
          .select(col("q_id"),
            coalesce(col("h"), lit(0L)).cast("long").as("n_hits"),
            round(coalesce(col("h"), lit(0L)).cast("double")
              / lit(AnnRecallK.toDouble) + lit(1e-9), 4).as("recall"))
          .orderBy("q_id")
      },
      Some(annRecallOracle(iters = 3, nProbe = AnnRecallProbe, k = AnnRecallK)))
  )
}
