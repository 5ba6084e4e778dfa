package graft

import graft.functions.{TextFns, Vectors}
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** LLM-pipeline operators: signature properties and ANN recall against
  * the exact brute-force baseline.
  */
class PipelineSpec extends SparkSpec {

  test("minhash signature has k entries and is permutation-stable") {
    val sig = Tables(spark, sf, "documents")
      .select(TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
    assert(sig.filter(size(col("sig")) =!= 16).isEmpty)
    // deterministic across evaluations
    val a = sig.limit(5).collect().map(_.getSeq[Long](0))
    val b = sig.limit(5).collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("identical docs collide in every band; est_jaccard = 1") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val sig = df.select(col("doc_id"),
      TextFns.minhashSignature(col("text"), 3, 16).as("sig"))
    val sigs = sig.collect().map(_.getSeq[Long](1))
    assert(sigs(0) == sigs(1))
  }

  test("native minhash kernel matches the HOF formulation bit-for-bit") {
    // short docs (< n words) exercise the whole-text fallback branch
    val extra = spark.createDataFrame(Seq((900001L, "ab"), (900002L, "a b")))
      .toDF("doc_id", "text")
    val both = Tables(spark, sf, "documents").select("doc_id", "text")
      .unionByName(extra)
      .select(
        TextFns.minhashSignature(col("text"), 3, 16).as("native"),
        TextFns.minhashSignatureHof(TextFns.shingleHashes(col("text"), 3), 16).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("native simhash kernel matches the HOF formulation bit-for-bit") {
    val both = Tables(spark, sf, "documents")
      .withColumn("wh", transform(TextFns.words(col("text")), w => xxhash64(w)))
      .select(
        TextFns.simhash(col("text")).as("native"),
        expr(TextFns.simhashExpr).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("winnowing: deterministic, sorted-distinct, and guarantees shared fp on long overlaps") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // identical
      (3L, s"PREFIX EDIT $base TRAILING EDIT"),    // long shared substring
      (4L, "zz"),                                  // shorter than k -> whole-text fallback
      (5L, "completely unrelated content xyzw"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.winnowFingerprints(col("text"), 8, 4).as("fps"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1) == rows(2), "identical docs must fingerprint identically")
    assert(rows(1).sorted == rows(1) && rows(1).distinct == rows(1),
      "fingerprint set must be sorted distinct")
    assert(rows(1).toSet.intersect(rows(3).toSet).nonEmpty,
      "a shared substring of length >= k+w-1 must share a fingerprint")
    assert(rows(4).length == 1, "sub-k documents fingerprint as their whole text")
    assert(rows(1).toSet.intersect(rows(5).toSet).isEmpty)
  }

  test("winnow guarantee holds on random documents (property)") {
    import org.scalacheck.Gen
    import org.apache.spark.unsafe.types.UTF8String
    val k = 16; val w = 8
    val charGen = Gen.frequency((9, Gen.alphaNumChar), (2, Gen.const(' ')))
    def str(n: Int) = Gen.listOfN(n, charGen).map(_.mkString)
    val cases = Gen.listOfN(100, for {
      shared <- str(k + w - 1) // minimal guaranteed-match length
      a1 <- str(40); a2 <- str(40)
      b1 <- str(40); b2 <- str(40)
    } yield (a1 + shared + a2, b1 + shared + b2)).sample.get
    cases.foreach { case (d1, d2) =>
      val f1 = graft.expressions.TextKernels
        .winnow(UTF8String.fromString(d1), k, w).toSet
      val f2 = graft.expressions.TextKernels
        .winnow(UTF8String.fromString(d2), k, w).toSet
      assert(f1.intersect(f2).nonEmpty,
        s"winnow guarantee violated for:\n  $d1\n  $d2")
    }
  }

  test("pairExpansion emits exactly the ordered pairs of any array (property)") {
    import org.scalacheck.Gen
    import spark.implicits._
    // the shared kernel behind minhash/winnow/simhash/passages bucket
    // expansion: for ANY sorted array it must emit each unordered pair
    // exactly once, as (a, b) with a < b, and nothing else
    val arrays = Gen.listOfN(30, Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 20L)).map(_.distinct.sorted))).sample.get
    val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("row_id", "ids")
    val got = df.select(col("row_id"), explode(expr(
        pipeline.Dedup.pairExpansion("ids", "a AS x, b AS y"))).as("p"))
      .select("row_id", "p.x", "p.y")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = arrays.zipWithIndex.flatMap { case (a, i) =>
      for (j <- a.indices; k <- j + 1 until a.length) yield (i, a(j), a(k))
    }.toSet
    assert(got == want)
  }

  test("native vec_dot matches the HOF formulation bit-for-bit") {
    val emb = Tables(spark, sf, "embeddings")
    val both = emb.join(emb.select(col("vec_id").as("v2"), col("embedding").as("e2")),
        col("vec_id") === col("v2") - 1)
      .select(Vectors.dot(col("embedding"), col("e2")).as("native"),
        Vectors.dotHof(col("embedding"), col("e2")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("vec_dot yields null on dimension mismatch, like the HOF form") {
    val df = spark.createDataFrame(Seq(
        (Seq(1.0f, 2.0f), Seq(3.0f)),
        (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))))
      .toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("native"),
        Vectors.dotHof(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "ragged vectors must yield null in both formulations")
    assert(rows(1).getDouble(0) == 11.0 && rows(1).getDouble(1) == 11.0)
  }

  test("VecMeanAgg fails fast on ragged input instead of truncating") {
    val df = spark.createDataFrame(Seq(
        (0, Seq(1.0f, 2.0f, 3.0f)), (0, Seq(1.0f, 2.0f))))
      .toDF("g", "v")
    intercept[org.apache.spark.SparkException] {
      df.groupBy("g").agg(functions.VecMeanAgg(col("v"))).collect()
    }
  }

  test("vec_dot is callable from SQL via GraftExtensions function registration") {
    graft.expressions.VectorExprs.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT vec_id, round(vec_dot(embedding, embedding), 4) AS sq FROM emb_sql LIMIT 5")
    assert(r.count() == 5 && r.filter(col("sq") <= 0).isEmpty)
  }

  test("cosine of a vector with itself is 1") {
    val one = Tables(spark, sf, "embeddings").limit(10)
      .select(round(Vectors.cosine(col("embedding"), col("embedding")), 6).as("c"))
    assert(one.filter(col("c") =!= 1.0).isEmpty)
  }

  test("VecMeanAgg computes the element-wise mean with map-side partials") {
    val rows = Seq(
      (0, Seq(1.0f, 2.0f, 3.0f)),
      (0, Seq(3.0f, 2.0f, 1.0f)),
      (1, Seq(10.0f, 0.0f, 0.0f)))
    val got = spark.createDataFrame(rows).toDF("g", "v")
      .repartition(3) // force cross-partition merge of partial buffers
      .groupBy("g").agg(functions.VecMeanAgg(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) == Seq(2.0, 2.0, 2.0))
    assert(got(1) == Seq(10.0, 0.0, 0.0))
  }

  test("kmeans quantizer assignment is total and in-range") {
    val emb = Tables(spark, sf, "embeddings")
    val m = pipeline.KMeans.fit(emb, "embedding", "vec_id", k = 10, iters = 3)
    assert(m.k == 10 && m.centroids.forall(_.length == 64))
    val assigned = emb.select(m.assignCol(col("embedding")).as("c"))
    assert(assigned.filter(col("c").isNull || col("c") < 0 || col("c") >= 10).isEmpty)
    assert(assigned.count() == emb.count())
  }

  test("ANN with all cells probed equals exact brute force; nProbe=2 has sane recall") {
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.annTopK(spark, sf, nProbe = Similarity.AnnCells, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "probing every cell must reproduce the exact top-k")
    val ann = SparkEntry.queries("q_sim_ann")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // loose floor on the tiny sample
  }

  test("rp_bits keys are in-range, deterministic, and match the kernel") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val emb = Tables(spark, sf, "embeddings")
    val keyed = emb.select(col("vec_id"),
      expressions.VectorExprs.rpBits(col("embedding"), 8, 64).as("b"))
    assert(keyed.filter(col("b").isNull || col("b") < 0 || col("b") >= 256).isEmpty)
    // codegen'd DataFrame path vs a direct kernel call on the raw
    // floats — same filter on both sides (an unordered limit could
    // cover a different id set)
    val signs = expressions.RpKernels.signs(8, 64)
    val rows = emb.filter(col("vec_id") < 20).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        expressions.RpKernels.rpBits(
          new GenericArrayData(r.getSeq[Float](1).toArray), signs)).toMap
    val got = keyed.filter(col("vec_id") < 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, b) => assert(b == rows(id), s"vec $id") }
  }

  test("LSH ANN recall floor vs exact brute force; no double-scored pairs") {
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRows = SparkEntry.queries("q_sim_lsh")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lsh = lshRows.toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    // 8 tables × Hamming-≤1 probing ⇒ expected ≈ 0.6 on the weak
    // fixture neighbours (cos ≈ 0.32); floor leaves generous margin
    assert(recall >= 0.3, s"recall=$recall")
    // multi-table collisions are deduplicated before scoring (checked
    // on the already-collected rows — no second run of the pipeline)
    assert(lshRows.size == lsh.size, "a candidate pair must be scored exactly once")
  }

  test("PQ codes pack in-range nibbles; ADC equals dot-on-reconstruction; recall floor") {
    val emb = Tables(spark, sf, "embeddings")
    val models = Similarity.pqModels(emb, sf)
    assert(models.length == Similarity.PqM &&
      models.forall(_.centroids.length == Similarity.PqK))
    val codes = Similarity.pqCodes(emb, models).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes.size == emb.count())
    // nothing may leak above the M×4 packed bits
    assert(codes.values.forall(c => (c >>> (4 * Similarity.PqM)) == 0L))

    // driver-side replica of the normalize→slice→LUT path, same
    // float-quantization and summation order as the plan
    val subDim = 64 / Similarity.PqM
    val nvecs = emb.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      var ss = 0.0
      v.foreach(x => ss += x.toDouble * x.toDouble)
      val nrm = math.sqrt(ss)
      r.getLong(0) -> v.map(x => (x.toDouble / nrm).toFloat)
    }.toMap
    def adc(qid: Long, vid: Long): Double = {
      val q = nvecs(qid); val code = codes(vid)
      (0 until Similarity.PqM).map { m =>
        val cent = models(m).centroids(((code >>> (4 * m)) & 15).toInt)
        (0 until subDim).map(i => q(m * subDim + i).toDouble * cent(i)).sum
      }.sum
    }
    val adcRows = Similarity.pqAdc(spark, sf, shortlist = 50).collect()
    assert(adcRows.nonEmpty)
    adcRows.foreach { r =>
      val expect = adc(r.getLong(0), r.getLong(2))
      assert(math.abs(r.getDouble(3) - expect) < 5e-5 + 1e-9,
        s"q=${r.getLong(0)} v=${r.getLong(2)}: adc=${r.getDouble(3)} recon=$expect")
    }
    // the declared query re-ranks the ADC shortlist exactly; recall
    // vs the exact brute-force top-5 only loses a true neighbor that
    // fell outside the whole 50-deep shortlist
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_sim_pq")(spark, sf).collect()
    val pq = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall")
    assert(recall >= 0.5, s"recall=$recall")
    // re-ranked scores are the EXACT cosine — identical to the brute
    // force score for every overlapping pair
    val exactScores = SparkEntry.queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    got.foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(2))).foreach { e =>
        assert(r.getDouble(3) == e, s"re-rank must score with the exact cosine")
      }
    }
  }

  test("pq codes oracle precondition: assignment margins dwarf cross-engine fp drift") {
    // the generated q_sim_pq_codes oracle recomputes the Lloyd fit in
    // DuckDB; its cluster-mean sums can differ from VecMeanAgg's by
    // ~1 ulp (summation order), so the oracle equals the query only
    // while every argmin decision has a margin far above that noise.
    // Pin the margin on the fixtures: best vs second-best distance per
    // (vector, subspace) under the kernel's exact arithmetic.
    val subDim = 64 / Similarity.PqM
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val emb = Tables(spark, dir, "embeddings")
      val models = Similarity.pqModels(emb, dir)
      var minMargin = Double.MaxValue
      emb.select("vec_id", "embedding").collect().foreach { r =>
        val v = r.getSeq[Float](1).toArray
        var ss = 0.0
        v.foreach(x => ss += x.toDouble * x.toDouble)
        val nrm = math.sqrt(ss)
        val nv = v.map(x => (x.toDouble / nrm).toFloat)
        (0 until Similarity.PqM).foreach { m =>
          val ds = models(m).centroids.map { c =>
            var dot = 0.0
            var i = 0
            while (i < subDim) { dot += nv(m * subDim + i).toDouble * c(i); i += 1 }
            c.map(x => x * x).sum - 2.0 * dot
          }.sorted
          minMargin = math.min(minMargin, ds(1) - ds(0))
        }
      }
      assert(minMargin > 1e-9,
        s"$dir: tightest assignment margin $minMargin is within fp-drift range " +
          "— the generated pq-codes oracle can no longer be trusted to match")
      // same precondition for the semdedup clustering (full-dim model,
      // raw float embeddings) whose oracle replays the same Lloyd fit
      val sModel = Similarity.semDedupModel(emb, dir)
      var sMargin = Double.MaxValue
      emb.select("vec_id", "embedding").collect().foreach { r =>
        val v = r.getSeq[Float](1).toArray
        val ds = sModel.centroids.map { c =>
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += v(i).toDouble * c(i); i += 1 }
          c.map(x => x * x).sum - 2.0 * dot
        }.sorted
        sMargin = math.min(sMargin, ds(1) - ds(0))
      }
      assert(sMargin > 1e-9,
        s"$dir: tightest semdedup assignment margin $sMargin is within fp-drift range")
      // q_ann_recall's oracle replays the ANN coarse quantizer (the
      // fixed k = AnnCells fit) the same way, plus the per-query PROBE
      // ranking on round-6 centroid cosines: pin (a) the assignment
      // argmin margin and (b) every probe cosine's distance from its
      // nearest round-6 boundary (a boundary-straddling value could
      // round differently under the engines' ulp-level centroid
      // drift and reorder the probed-cell set).
      val aModel = Similarity.fittedModel(emb, dir)
      var aMargin = Double.MaxValue
      val vecs = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      vecs.foreach { case (_, v) =>
        val ds = aModel.centroids.map { c =>
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += v(i).toDouble * c(i); i += 1 }
          c.map(x => x * x).sum - 2.0 * dot
        }.sorted
        aMargin = math.min(aMargin, ds(1) - ds(0))
      }
      assert(aMargin > 1e-9,
        s"$dir: tightest ANN-quantizer assignment margin $aMargin is within fp-drift range")
      var bMargin = Double.MaxValue
      vecs.filter(_._1 < 10).foreach { case (_, q) =>
        var qq = 0.0
        q.foreach(x => qq += x.toDouble * x.toDouble)
        aModel.centroids.foreach { c =>
          var dot = 0.0
          var cc = 0.0
          var i = 0
          while (i < q.length) {
            dot += q(i).toDouble * c(i); cc += c(i) * c(i); i += 1
          }
          val cos = dot / (math.sqrt(qq) * math.sqrt(cc))
          val scaled = cos * 1e6
          val frac = scaled - math.floor(scaled)
          bMargin = math.min(bMargin, math.abs(frac - 0.5))
        }
      }
      assert(bMargin > 1e-4,
        s"$dir: a probe cosine sits $bMargin from the round-6 boundary — " +
          "the ann-recall oracle's probe ranking can no longer be trusted")
      // and the measured operating point is genuinely PRUNED: if the
      // fixture ever degenerates to recall ≡ 1 at nProbe=2, the
      // oracle would no longer exercise the approximate path it
      // exists to verify (and 0 would mean the probe ranking is
      // broken outright)
      val recalls = SparkEntry.queries("q_ann_recall")(spark, dir)
        .collect().map(_.getDouble(2))
      assert(recalls.exists(_ < 1.0 - 1e-9),
        s"$dir: every query has recall 1.0 at nProbe=2 — nothing is pruned")
      assert(recalls.exists(_ > 0.0),
        s"$dir: zero recall everywhere at nProbe=2 — probe ranking broken")
    }
  }

  test("index generations: rebuild+search exact, idempotent republish, crash recovery") {
    import graft.pipeline.IndexLifecycle
    val root = java.nio.file.Files.createTempDirectory("graft_idxgen").toString
    IndexLifecycle.rebuild(spark, sf, root)
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def served: Set[(Long, Long)] =
      IndexLifecycle.search(spark, sf, root, nProbe = pipeline.Similarity.AnnCells, k = 5)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == exact, "all-cells probe over the generation must be exact")
    // republish: a second generation replaces the first cleanly
    IndexLifecycle.rebuild(spark, sf, root)
    assert(served == exact, "the republished generation must serve identically")
    assert(!new java.io.File(s"$root/current.tmp").exists() &&
      !new java.io.File(s"$root/current.old").exists(),
      "no swap debris may survive a completed rebuild")
    // crash between swap steps 1 and 2: current was set aside, the new
    // generation never landed — recovery must restore the old one
    assert(new java.io.File(s"$root/current")
      .renameTo(new java.io.File(s"$root/current.old")))
    assert(served == exact, "search must recover the set-aside generation")
  }

  test("index-aware dispatch: brute before a generation exists, probe after") {
    import graft.pipeline.IndexLifecycle
    val root = java.nio.file.Files.createTempDirectory("graft_dispatch").toString
    def serveDf = IndexLifecycle.serveOrScan(
      spark, sf, root, nProbe = pipeline.Similarity.AnnCells, k = 5)
    val brute = SparkEntry.queries("q_sim_topk")(spark, sf).collect()
    // cold start: no generation published — must answer EXACTLY via
    // the brute scan, not fail or serve nothing
    assert(serveDf.collect().map(_.toString).toSeq ==
      brute.map(_.toString).toSeq, "cold-start dispatch must be exact")
    assert(!serveDf.queryExecution.executedPlan.toString.contains(root),
      "cold start must not touch the (absent) index directory")
    // published: dispatch flips to the generation scan (plan reads the
    // index path) and, at all-cells probing, stays exact
    IndexLifecycle.rebuild(spark, sf, root)
    val servedPlan = serveDf.queryExecution.executedPlan.toString
    assert(servedPlan.contains("current"),
      s"dispatch must read the published generation")
    assert(serveDf.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      brute.map(r => (r.getLong(0), r.getLong(2))).toSet,
      "all-cells dispatch must reproduce the exact neighbor set")
  }

  test("simhash candidate expansion admits no bucket above BucketCap") {
    // the exact production input to the pair expansion (not a replica)
    val census = pipeline.Dedup.simhashBuckets(spark, sf)
      .select(size(col("ms")).as("count"))
    assert(census.filter(col("count") > pipeline.Dedup.BucketCap).isEmpty,
      "an oversized bucket entered the simhash pair expansion")
    assert(census.filter(col("count") < 2).isEmpty,
      "singleton buckets must be dropped before expansion (they yield no pairs)")
  }

  test("minhash LSH recall at the declared τ is 1: verified candidates ≡ exact all-pairs") {
    // the oracle-equality precondition of q_dedup_minhash: every pair
    // with exact 3-gram-shingle Jaccard ≥ τ must collide in ≥1 band
    // (brute-force all-pairs here is O(n²) — spec scale only)
    val gramsExpr = expr(
      """array_distinct(transform(sequence(1, greatest(1, size(split(text, ' ')) - 2)),
        |  g -> array_join(slice(split(text, ' '), g, 3), ' ')))""".stripMargin)
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), gramsExpr.as("g"))
    val exact = docs.as("a")
      .join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("c", size(array_intersect(col("a.g"), col("b.g"))).cast("double"))
      .withColumn("j", col("c") / (size(col("a.g")) + size(col("b.g")) - col("c")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val got = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b")
    assert(exact.exceptAll(got).isEmpty,
      "an exact near-dup pair escaped the LSH candidates (recall < 1 — oracle equality broken)")
    assert(got.exceptAll(exact).isEmpty,
      "a verified candidate is not an exact near-dup (verification filter broken)")
  }

  test("dedup + iterative queries leave the session CacheManager empty (no persist leak)") {
    // q_pagerank is in the list because its r6 form persisted the
    // final rank vector and never released it — CacheManager
    // plan-matching then served every rerun from the leaked cache, so
    // bench "medians" measured a cache hit, not the query.
    spark.sharedState.cacheManager.clearCache()
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_winnow",
        "q_pagerank", "q_logreg_gd", "q_dedup_cluster").foreach { q =>
      SparkEntry.queries(q)(spark, sf).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q left a CacheManager entry pinned for the session lifetime")
    }
  }

  test("simhash LSH emits the COMPLETE Hamming-<=3 pair set (pigeonhole recall, no cap drop)") {
    // the oracle-equality precondition of q_dedup_simhash: the chunk
    // buckets must surface every pair at Hamming <= 3 (pigeonhole
    // guarantees it unless BucketCap drops a bucket — this pins that
    // no fixture bucket is dropped), and nothing else survives the
    // exact in-row Hamming filter. Brute force is O(n²) — spec scale.
    val hs = Tables(spark, sf, "documents")
      .select(col("doc_id"), TextFns.simhash60(col("text")).as("sh"))
    val brute = hs.as("a")
      .join(hs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
    // set compare on collected rows: exceptAll over the dropDuplicates
    // + aggregated-bucket plan trips a Spark attribute-binding bug
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) — and the pair sets are
    // spec-scale anyway
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotSet = toSet(SparkEntry.queries("q_dedup_simhash")(spark, sf))
    assert(toSet(brute) == gotSet,
      "LSH Hamming-<=3 set differs from brute force — oracle equality broken")
    assert(gotSet.nonEmpty, "fixture should contain Hamming-<=3 pairs")
  }

  test("winnow verified candidates ≡ exact all-pairs shared-16-gram floor") {
    // the oracle-equality precondition of q_dedup_winnow: every pair
    // sharing >= 30 distinct 16-char grams must be a winnow candidate
    // (>= 5 shared selected fingerprints). MOSS makes this
    // near-structural — every shared run >= k+w-1 = 23 chars forces a
    // shared fingerprint — and this pins it exactly on the fixture.
    val g16 = Tables(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(expr(
        """transform(sequence(1, greatest(1, length(text) - 15)),
          |  p -> substring(text, p, 16))""".stripMargin)).as("g"))
    val brute = g16.as("a")
      .join(g16.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("c", size(array_intersect(col("a.g"), col("b.g"))).cast("long"))
      .filter(col("c") >= 30)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("c"))
    val got = SparkEntry.queries("q_dedup_winnow")(spark, sf)
    assert(brute.exceptAll(got).isEmpty,
      "a high-overlap pair escaped the winnow candidates (recall < 1 — oracle equality broken)")
    assert(got.exceptAll(brute).isEmpty,
      "a verified candidate is below the exact floor (verification filter broken)")
    assert(got.count() > 0, "fixture should contain winnow near-dups")
  }

  test("topK sketch equals the exact vocabulary top-k when capacity covers the vocab") {
    // The r8 oracle promotion rests on this precondition: with
    // capacity (8·k = 80) >= |vocab|, NO insert ever evicts in any
    // partition layout, so the sketch output is deterministically the
    // exact top-k. Pin |vocab| <= capacity on the fixtures the driver
    // and the bench actually run (the generator fixes the vocabulary,
    // so this holds at every SF — but pin it, don't assume it).
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val vocab = Tables(spark, dir, "documents")
        .select(explode(TextFns.words(col("text"))).as("w"))
        .agg(countDistinct(col("w"))).collect()(0).getLong(0)
      assert(vocab <= 80,
        s"$dir: vocabulary $vocab exceeds sketch capacity 80 — " +
          "the q_topk_sketch oracle promotion precondition is broken")
    }
    val sketch = SparkEntry.queries("q_topk_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = SparkEntry.queries("q_vocab_topk")(spark, sf)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.map(t => (t._1, t._2)).toSeq == exact.toSeq,
      "with capacity >= |vocab| the sketch must be exact")
    assert(sketch.forall(_._3 == 0L), "no eviction => zero error bounds")
  }

  test("topK sketch eviction keeps heavy hitters with honest error bounds") {
    import spark.implicits._
    // 1000 hot + 50 singletons through a capacity-8 sketch: the hot
    // item's true count (1000) far exceeds N/m (1050/8), so SpaceSaving
    // guarantees it survives; counts may only overestimate, by <= err
    val rows = (Seq.fill(1000)("hot") ++ (1 to 50).map(i => s"cold$i")).toDF("w")
      .repartition(8) // force cross-partition buffer merges
    val top = rows.agg(graft.functions.TopKAgg(col("w"), 3, capacity = 8).as("t"))
      .select(explode(col("t")).as("t"))
      .select(col("t.item"), col("t.count"), col("t.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hot = top.find(_._1 == "hot")
    assert(hot.isDefined, s"heavy hitter evicted: $top")
    val (_, c, e) = hot.get
    assert(c >= 1000 && c - e <= 1000,
      s"count must overestimate by at most err: count=$c err=$e")
  }

  test("simhash of identical word multisets is identical") {
    val docs = Seq((1L, "x y z w"), (2L, "x y z w"), (3L, "totally different words here"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("wh", transform(TextFns.words(col("text")), w => xxhash64(w)))
      .withColumn("sh", expr(TextFns.simhashExpr))
    val sh = df.select("sh").collect().map(_.getLong(0))
    assert(sh(0) == sh(1) && sh(0) != sh(2))
  }

  test("multimodal oracle preconditions hold on the fixture, and violations fail loudly") {
    // the closed-form q_multimodal_audio/pixels/frames oracles index
    // document text per CHAR (ascii(substring(text, i % L + 1, 1)))
    // while the generator cycles UTF-8 BYTES — they agree iff every
    // document is non-empty pure ASCII. Pin that on the fixture…
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val bad = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNull || length(col("text")) === 0 ||
          length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(bad == 0, s"$dir: $bad documents break the ASCII/non-empty precondition")
    }
    // …and pin that a violating document fails the generator loudly
    // instead of silently diverging from the oracle
    assertThrows[IllegalArgumentException](
      pipeline.Multimodal.makePayload("image", "", 10L))
    assertThrows[IllegalArgumentException](
      pipeline.Multimodal.makePayload("audio", "café", 10L))
  }

  test("multimodal resize decodes, resamples, and re-encodes real BMPs deterministically") {
    val a = pipeline.Multimodal.assets(spark, sf)
    val nImages = a.filter(_.kind == "image").count()
    val r1 = pipeline.Multimodal.resizeAssets(a, 32, 32).collect().sortBy(_.asset_id)
    val r2 = pipeline.Multimodal.resizeAssets(a, 32, 32).collect().sortBy(_.asset_id)
    assert(r1.length == nImages && nImages >= 100)
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
    // every output is a VALID BMP at the target geometry — re-decodable
    r1.foreach { x =>
      val img = pipeline.MediaCodec.decodeBmp(x.payload)
      assert(img.width == 32 && img.height == 32 &&
        img.pixels.length == 32 * 32 * 3)
    }
  }

  test("CovAgg moments equal the brute-force covariance") {
    import spark.implicits._
    val vecs = Seq(
      Seq(1.0f, 2.0f, 3.0f), Seq(2.0f, 1.0f, 5.0f),
      Seq(0.0f, 4.0f, 1.0f), Seq(3.0f, 3.0f, 3.0f))
    val flat = vecs.toDF("v")
      .agg(functions.CovAgg(org.apache.spark.sql.functions.col("v")))
      .collect()(0).getSeq[Double](0)
    val (n, mean, cov) = functions.CovAgg.covarianceOf(flat)
    assert(n == 4L)
    val d = 3
    val raw = vecs.map(_.map(_.toDouble))
    (0 until d).foreach { i =>
      val mi = raw.map(_(i)).sum / 4
      assert(math.abs(mean(i) - mi) < 1e-12)
      (0 until d).foreach { j =>
        val mj = raw.map(_(j)).sum / 4
        val cij = raw.map(r => (r(i) - mi) * (r(j) - mj)).sum / 4
        assert(math.abs(cov(i)(j) - cij) < 1e-9, s"cov($i,$j)")
      }
    }
  }

  test("power iteration recovers a known principal axis; the fixture PCA is an eigenpair") {
    // crafted: points spread along (0.6, 0.8) with small orthogonal noise
    val axis = Array(0.6, 0.8)
    val pts = (-10 to 10).map { t =>
      val noise = (t % 3) * 0.01
      Array(axis(0) * t + noise * axis(1), axis(1) * t - noise * axis(0))
    }
    val means = Array(0, 1).map(i => pts.map(_(i)).sum / pts.length)
    val cov = Array.tabulate(2, 2)((i, j) =>
      pts.map(p => (p(i) - means(i)) * (p(j) - means(j))).sum / pts.length)
    val (lambda, v) = functions.CovAgg.topEigen(cov)
    assert(math.abs(math.abs(v(0)) - 0.6) < 0.01 && math.abs(math.abs(v(1)) - 0.8) < 0.01,
      s"axis: ${v.toSeq}")
    assert(lambda > 0)
    // fixture corpus: (λ, v) from the query must satisfy cov·v = λ·v
    val rows = SparkEntry.queries("q_embed_pca")(spark, sf).collect()
    assert(rows.length == 64 && rows.map(_.getLong(0)).toSeq == (0L until 64L))
    val flat = pipeline.Similarity.embedPcaMoments(spark, sf)
    val (_, _, fcov) = functions.CovAgg.covarianceOf(flat)
    val pc = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    val lam = rows(0).getDouble(3)
    assert(math.abs(math.sqrt(pc.map(x => x * x).sum) - 1.0) < 1e-3, "unit norm")
    val av = fcov.map(row => row.zip(pc).map { case (a, b) => a * b }.sum)
    av.zip(pc).foreach { case (a, p) =>
      assert(math.abs(a - lam * p) < 1e-2, s"Av=λv violated: $a vs ${lam * p}")
    }
  }

  test("pca oracle precondition: topEigen selects the FIRST-start iterate on the fixtures") {
    // the generated q_embed_pca oracle replays only the sin(i+1)
    // start. topEigen picks the first start whose Rayleigh residual
    // beats 1e-8·scale·d and falls back to the FIRST start when none
    // does — so oracle ≡ query unless the first start fails the
    // threshold while the cos-perturbed one passes it. Replicate the
    // selection verbatim and pin that the selected vector IS the
    // first-start iterate on the fixture corpora (the
    // pinned-precondition discipline)
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val flat = pipeline.Similarity.embedPcaMoments(spark, dir)
      val (_, _, cov) = functions.CovAgg.covarianceOf(flat)
      val d = cov.length
      def iterate(start: Array[Double]): (Double, Array[Double]) = {
        val nrm0 = math.sqrt(start.map(x => x * x).sum)
        var v = start.map(_ / nrm0)
        var lambda = 0.0
        (1 to 200).foreach { _ =>
          val w = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
          lambda = math.sqrt(w.map(x => x * x).sum)
          v = w.map(_ / lambda)
        }
        (lambda, v)
      }
      def residual(lambda: Double, v: Array[Double]): Double = {
        val av = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
        math.sqrt(av.indices.map(i => {
          val r = av(i) - lambda * v(i); r * r }).sum)
      }
      val scale = math.max(1.0, cov.indices.map(i => math.abs(cov(i)(i))).max)
      val first = iterate(Array.tabulate(d)(i => math.sin((i + 1).toDouble)))
      val second = iterate(Array.tabulate(d)(i => math.cos((2 * i + 1).toDouble) + 0.5))
      val firstPasses = residual(first._1, first._2) <= 1e-8 * scale * d
      val secondPasses = residual(second._1, second._2) <= 1e-8 * scale * d
      assert(firstPasses || !secondPasses,
        s"$dir: topEigen would select the SECOND start " +
          "— the generated oracle no longer matches the query")
      // and the query's loadings are indeed the first-start iterate
      val want = first._2
      val sign = want.find(math.abs(_) > 1e-12).map(x => if (x < 0) -1.0 else 1.0).getOrElse(1.0)
      val got = SparkEntry.queries("q_embed_pca")(spark, dir)
        .collect().sortBy(_.getLong(0)).map(_.getDouble(2))
      got.zip(want.map(_ * sign)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-5, s"$dir: loading $g vs first-start $w")
      }
    }
  }

  test("power iteration finds a constant-loading dominant axis at even d") {
    // cov = I + J: dominant eigenpair is (d+1, 1/√d·1) — a constant
    // axis an alternating-sign start vector is exactly orthogonal to
    // (the ±1 start is itself an eigenvector at λ=1, so a bad start
    // never escapes it except by rounding noise)
    val d = 4
    val cov = Array.tabulate(d, d)((i, j) => if (i == j) 2.0 else 1.0)
    val (lambda, v) = functions.CovAgg.topEigen(cov)
    assert(math.abs(lambda - (d + 1.0)) < 1e-9, s"lambda: $lambda")
    v.foreach(x => assert(math.abs(x - 1.0 / math.sqrt(d.toDouble)) < 1e-9,
      s"constant loadings expected: ${v.toSeq}"))
  }

  test("vocabulary encoding round-trips: decode(encode(doc)) == doc tokens") {
    import org.apache.spark.sql.expressions.Window
    val words = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(functions.TextFns.words(col("text"))))
      .toDF("doc_id", "pos", "word")
    val vocab = words.select("word").distinct()
      .withColumn("id", row_number().over(Window.orderBy("word")).cast("long"))
    // encode: per-doc id sequence in token order
    val encoded = words.join(broadcast(vocab), "word")
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, id))), x -> x.id)").as("ids"))
    // decode through the REVERSE dictionary and compare to the source
    val decoded = encoded
      .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "id")))
      .join(broadcast(vocab), "id")
      .groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, word))), x -> x.word), ' ')")
        .as("text_back"))
    val diff = decoded.join(
        Tables(spark, sf, "documents").filter(col("doc_id") < 50), "doc_id")
      .filter(col("text_back") =!= col("text"))
    assert(diff.isEmpty, "decode(encode(text)) must reproduce the text")
    // dense deterministic ids: 1..|vocab|
    val ids = vocab.agg(min("id"), max("id"), count(lit(1))).head
    assert(ids.getLong(0) == 1L && ids.getLong(1) == ids.getLong(2))
  }

  test("multimodal feature extraction is deterministic, total, and header-consistent") {
    val assets = pipeline.Multimodal.assets(spark, sf).collect()
      .map(a => a.asset_id -> a).toMap
    val f1 = pipeline.Multimodal.extractFeatures(
      pipeline.Multimodal.assets(spark, sf)).collect().sortBy(_.asset_id)
    val f2 = pipeline.Multimodal.extractFeatures(
      pipeline.Multimodal.assets(spark, sf)).collect().sortBy(_.asset_id)
    assert(f1.length == 500 && f1.map(_.content_hash).toSeq == f2.map(_.content_hash).toSeq)
    // decoded header geometry equals the typed sidecar metadata
    f1.foreach { f =>
      val a = assets(f.asset_id)
      f.kind match {
        case "image" =>
          assert(f.width == a.width && f.height == a.height && f.sample_rate == 0)
        case "audio" =>
          assert(f.sample_rate == 16000 && f.width == 0 && f.n_frames > 0)
        case _ =>
          assert(f.width == a.width && f.height == a.height &&
            f.n_frames == a.n_frames)
      }
    }
  }

  test("unicode_normalize: composition, decomposition, compatibility folding") {
    import graft.expressions.TextExprs.unicodeNormalize
    val probe = spark.range(1).select(
      unicodeNormalize(lit("café"), "NFC").as("nfc"),
      unicodeNormalize(lit("café"), "NFD").as("nfd"),
      unicodeNormalize(lit("ﬁle x²"), "NFKC").as("nfkc"),
      unicodeNormalize(lit("ascii stays"), "NFC").as("id"),
      unicodeNormalize(lit(null).cast("string"), "NFC").as("nul"),
      // SQL registration surface
      expr("unicode_normalize('café', 'NFC')").as("sql_nfc")).head()
    assert(probe.getString(0) == "café")
    assert(probe.getString(1) == "café")
    assert(probe.getString(2) == "file x2", "NFKC folds ﬁ→fi and ²→2")
    assert(probe.getString(3) == "ascii stays")
    assert(probe.isNullAt(4))
    assert(probe.getString(5) == "café")
    intercept[Exception](spark.range(1)
      .select(unicodeNormalize(lit("x"), "BOGUS")).collect())
  }

  test("SemDeDup: dup rule, survivor invariant, keeper preservation, τ-monotonicity") {
    val tau = 0.35
    val summary = pipeline.Similarity.semDedup(spark, sf, tau).collect()
    assert(summary.map(_.getLong(1)).sum ==
      Tables(spark, sf, "embeddings").count(), "every vector lands in one cluster")

    // brute-force ground truth per cluster from an independent (SQL
    // HOF) cosine formulation over the same assignment
    val emb = Tables(spark, sf, "embeddings")
    val model = graft.pipeline.KMeans.fit(emb, "embedding", "vec_id",
      pipeline.Similarity.semDedupK(emb.count()), iters = 3)
    val assigned = emb.select(col("vec_id"),
        model.assignCol(col("embedding")).as("cid"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      x.indices.foreach { i => d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      math.rint(d / (math.sqrt(nx) * math.sqrt(ny)) * 1e4) / 1e4
    }
    val byCluster = assigned.groupBy(_._2)
    val truthDups = byCluster.map { case (cid, vs) =>
      val sorted = vs.sortBy(_._1)
      cid -> sorted.count { case (id, _, v) =>
        sorted.exists { case (id2, _, v2) => id2 < id && cos(v2, v) >= tau }
      }.toLong
    }
    summary.foreach { r =>
      assert(truthDups(r.getLong(0).toInt) == r.getLong(2),
        s"cluster ${r.getLong(0)}: dup count mismatch")
    }
    // survivors are pairwise < τ; the min-id keeper always survives
    byCluster.foreach { case (cid, vs) =>
      val sorted = vs.sortBy(_._1)
      val survivors = sorted.filterNot { case (id, _, v) =>
        sorted.exists { case (id2, _, v2) => id2 < id && cos(v2, v) >= tau } }
      assert(survivors.head._1 == sorted.head._1, s"cluster $cid keeper must survive")
      for (i <- survivors.indices; j <- 0 until i)
        assert(cos(survivors(j)._3, survivors(i)._3) < tau,
          s"cluster $cid: surviving pair at/above τ")
    }
    // monotonicity: tightening τ can only find MORE duplicates
    val loose = pipeline.Similarity.semDedup(spark, sf, 0.9).collect().map(_.getLong(2)).sum
    val tight = pipeline.Similarity.semDedup(spark, sf, 0.2).collect().map(_.getLong(2)).sum
    assert(loose <= summary.map(_.getLong(2)).sum && summary.map(_.getLong(2)).sum <= tight)
  }

  test("tf-idf: crafted corpus ranks the repeated rare term first; " +
      "a term in every doc scores 0") {
    // Route through the declared query shape by checking invariants on
    // the fixture, then exactness on a crafted corpus via the same
    // formula: score = tf * ln(N/df).
    val rows = SparkEntry.queries("q_tfidf")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"doc $doc ranks $ranks")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores not non-increasing: ${scores.toSeq}")
    }
    // crafted: "zebra" repeats 3× in doc 1 only (idf = ln 3), "the"
    // appears in all 3 docs (idf = 0 → score exactly 0 for rank > 1)
    import spark.implicits._
    val crafted = Seq((1L, "the zebra zebra zebra apple"),
      (2L, "the apple pie"), (3L, "the pie crust")).toDF("doc_id", "text")
    crafted.createOrReplaceTempView("crafted_tfidf")
    val tf = crafted.select(col("doc_id"),
        explode(TextFns.words(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("word").agg(count(lit(1)).cast("double").as("df"))
    val top = tf.join(df_, "word")
      .withColumn("score", col("tf") * log(lit(3.0) / col("df")))
      .filter(col("doc_id") === 1L)
      .orderBy(col("score").desc, col("word")).collect()
    assert(top.head.getString(0) == "zebra")
    assert(math.abs(top.head.getDouble(4) - 3 * math.log(3.0)) < 1e-12)
    assert(top.filter(_.getString(0) == "the").head.getDouble(4) == 0.0)
  }

  test("chunking tiles every document: stride starts, boundary tokens, " +
      "exact token accounting") {
    val words = Tables(spark, sf, "documents")
      .select(col("doc_id"), TextFns.words(col("text")).as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = SparkEntry.queries("q_chunk_docs")(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == words.keySet, "every doc chunks")
    chunks.foreach { case (doc, rs) =>
      val n = words(doc).length
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(0L until sorted.length))
      assert(sorted.length == (n - 1) / 48 + 1, s"doc $doc chunk count")
      sorted.foreach { r =>
        val st = r.getLong(1).toInt * 48
        assert(r.getLong(2) == math.min(64, n - st), s"doc $doc len at $st")
      }
      assert(sorted.head.getString(4) == words(doc).head, "first boundary")
      assert(sorted.last.getString(5) == words(doc).last, "last boundary")
    }
  }

  test("hard negatives: no same-label result, ranks contiguous, " +
      "and equals the brute-force filtered ranking") {
    val labels = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("q_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qId, negId, negLabel) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(negLabel == labels(negId), "emitted label is the candidate's")
      assert(negLabel != labels(qId), s"query $qId mined a same-label negative")
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length),
        s"query $q ranks not contiguous")
    }
    // the mined set must be exactly the label-filtered slice of the
    // full brute-force ranking (q_sim_topk with k large enough)
    val brute = Similarity.bruteTopK(spark, sf, 500).collect()
      .filter(r => labels(r.getLong(2)) != labels(r.getLong(0)))
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy(_.getLong(1)).take(5).map(r => (r.getLong(0), r.getLong(2))).toSeq }
      .toSet
    val mined = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(mined == brute, "mined ≠ brute-force filtered top-5")
  }

  test("FIM transform partitions every selected doc into non-empty P/M/S") {
    val rows = SparkEntry.queries("q_fim_transform")(spark, sf).collect()
    assert(rows.nonEmpty)
    var applied = 0
    rows.foreach { r =>
      val (mode, p, m, s2) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (mode == "none") assert(m == 0 && s2 == 0)
      else {
        applied += 1
        assert(p >= 1 && m >= 1 && s2 >= 1, s"empty FIM part at $r")
        assert(Set("psm", "spm")(mode))
      }
    }
    // md5-digit coin ⇒ roughly half the corpus is transformed
    assert(applied > rows.length / 4 && applied < rows.length * 3 / 4,
      s"FIM selection rate off: $applied of ${rows.length}")
  }

  test("containment pairs are directed, bounded, and catch the planted dups") {
    val rows = SparkEntry.queries("q_dedup_containment")(spark, sf).collect()
    rows.foreach { r =>
      val (a, b, common, na, c) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(a != b && common <= na, s"impossible containment row $r")
      assert(c >= 0.8 - 1e-9 && c <= 1.0 + 1e-9, s"containment out of band: $r")
    }
    // byte-identical TEXTS have identical 3-gram sets, so each such
    // pair must appear in BOTH directions at containment 1.0
    val fp = Tables(spark, sf, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    val dir = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    fp.foreach { grp =>
      val ids = grp.map(_.getLong(0))
      for (a <- ids; b <- ids if a != b)
        assert(dir((a, b)), s"exact dup pair ($a,$b) missing from containment")
    }
  }

  test("per-group sample is deterministic, k-bounded, and within-group") {
    val g1 = SparkEntry.queries("q_agg_group_sample")(spark, sf).collect()
    val g2 = SparkEntry.queries("q_agg_group_sample")(spark, sf).collect()
    assert(g1.map(_.toString).toSeq == g2.map(_.toString).toSeq)
    assert(g1.nonEmpty)
    val orders = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    g1.foreach { r =>
      val keys = r.getString(1).split(',').map(_.toLong)
      assert(r.getLong(2) <= 3 && keys.length == r.getLong(2))
      assert(keys.forall(orders(r.getString(0))),
        s"sampled key outside group at $r")
    }
  }

  test("bm25 ranks by score, saturates tf, and bounds idf") {
    val rows = SparkEntry.queries("q_bm25")(spark, sf).collect()
    assert(rows.length == 20)
    // rank is 1..20 and the score column is non-increasing in rank
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // n_terms_hit within the 3-term query; every score positive (idf of
    // the Lucene 1+ variant is always > 0, so a matched doc scores > 0)
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
    assert(scores.forall(_ > 0))
    // tf saturation: a doc's per-term contribution is < idf·(k1+1), so
    // the total is bounded by n_terms_hit · max_idf · 2.2 with
    // max_idf = ln(1 + (N+0.5)/0.5) at df=0⁺ — a loose structural cap
    val n = Tables(spark, sf, "documents").count().toDouble
    val cap = 3 * 2.2 * math.log(1 + (n + 0.5) / 0.5)
    assert(scores.forall(_ < cap))
  }

  test("source-mix diversity indices obey their bounds and degeneracies") {
    val rows = SparkEntry.queries("q_source_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSrc, h, even, simp, top) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))
      assert(h >= 0 && h <= math.log(nSrc.toDouble) + 1e-6,
        s"entropy outside [0, ln k] at $r")
      assert(even >= 0 && even <= 1 + 1e-6)
      assert(simp >= 1.0 / nSrc - 1e-6 && simp <= 1 + 1e-6,
        s"simpson outside [1/k, 1] at $r")
      assert(top >= 1.0 / nSrc - 1e-6 && top <= 1 + 1e-6)
    }
    // degenerate corpus: one source ⇒ H=0, simpson=1, top_share=1
    val one = spark.createDataFrame(
        Seq((1L, "en", "only"), (2L, "en", "only")))
      .toDF("doc_id", "lang", "source")
    val grid = one.groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum("c").as("n"), count(lit(1)).as("k"), max("c").as("m"))
      .collect()
    assert(grid.head.getLong(1) == 2 && grid.head.getLong(2) == 1)
  }

  test("stopword coverage is a valid share, non-increasing within a language") {
    val rows = SparkEntry.queries("q_stopword_df")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1 + 1e-9,
        s"coverage outside (0, 1]: $r")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 10)
    }
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => b <= a },
        s"df must be non-increasing in rank for $lang")
    }
  }

  test("bloom dedup is sound: no false negatives, candidates superset dups") {
    val rows = SparkEntry.queries("q_dedup_bloom")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // is_dup ⇒ bloom_candidate (a Bloom filter has NO false negatives)
    assert(rows.forall { case (_, cand, dup) => !dup || cand })
    // independent exact ground truth: a doc is a dup iff its md5 text
    // fingerprint appears in the historical window
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val histFps = docs.filter(col("doc_id") <= 300)
      .select("fp").distinct().as[String].collect().toSet
    val truth = docs.filter(col("doc_id") > 250)
      .select(col("doc_id"), col("fp")).as[(Long, String)].collect()
      .map { case (id, fp) => id -> histFps(fp) }.toMap
    rows.foreach { case (id, _, dup) =>
      assert(dup == truth(id), s"doc $id: is_dup=$dup vs exact ${truth(id)}")
    }
  }

  test("hybrid RRF output is a fusion of its two source rankings") {
    val out = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val qs = out.map(_._1).distinct
    assert(qs.length == 5, s"expected 5 query docs, got ${qs.length}")
    qs.foreach { q =>
      val picks = out.filter(_._1 == q).sortBy(_._2)
      assert(picks.map(_._2).toSeq == (1L to picks.length))
      assert(picks.length <= 10 && picks.nonEmpty)
      // fused scores are sums of at most two reciprocal ranks from
      // top-20 lists: bounded by (0, 1/61 + 1/61]
      picks.foreach { case (_, _, _, rrf) =>
        assert(rrf > 0.0 && rrf <= 2.0 / 61 + 1e-9)
      }
      // descending with id tie-break
      assert(picks.map(_._4).toSeq == picks.map(_._4).sortBy(-(_: Double)).toSeq)
    }
  }

  test("MMR picks are greedy-consistent: top-relevance first, scores sane") {
    val out = SparkEntry.queries("q_sim_mmr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val qs = out.map(_._1).distinct
    assert(qs.length == 10)
    qs.foreach { q =>
      val picks = out.filter(_._1 == q).sortBy(_._2)
      assert(picks.length == Similarity.MmrK)
      assert(picks.map(_._3).distinct.length == picks.length, "picks must be distinct docs")
      // pick 1 maximizes pure relevance (maxSim term is zero);
      // mmr_1 = λ·rel_1 up to the shared rounding nudge
      val first = picks.head
      assert(math.abs(first._5 - Similarity.MmrLambda * first._4) < 1e-3)
      assert(picks.head._4 == picks.map(_._4).max,
        "first pick must carry the highest relevance among picks")
      // every later pick's score is λ·rel shifted by γ·maxSim with
      // maxSim ∈ [−1, 1] (cosines go negative on this fixture, so the
      // "penalty" can be a bonus — bound it, don't sign it)
      picks.tail.foreach { p =>
        assert(math.abs(p._5 - Similarity.MmrLambda * p._4) <=
          Similarity.MmrGamma + 1e-3)
      }
    }
  }

  test("pagerank ranks sit above the teleport floor and repeat exactly") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(rows.length == 20)
    // the damped update is 0.15 + 0.85·Σ(nonneg), so 0.15 is a hard
    // floor; on the dense co-purchase graph the top hubs must clear
    // the uniform start of 1.0 by a wide margin
    assert(rows.forall(_.getDouble(1) >= 0.15))
    assert(rows.map(_.getDouble(1)).max > 1.5, "no rank mass concentrated")
    // suppliers are the high-degree side of the bipartite walk, so
    // every supplier (10 at the spec's sf0.001) out-ranks the
    // long-tail customers into the top-20 hub list
    assert(rows.count(_.getString(0).startsWith("s")) >= 10)
    val again = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("URL canonicalization collapses case/scheme/tracking/slash variants") {
    val got = SparkEntry.queries("q_dedup_url")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val u = r.getString(0)
      assert(u == u.toLowerCase, s"canonical URL not lowercased: $u")
      assert(u.startsWith("https://"), s"scheme not unified: $u")
      assert(!u.contains("?") && !u.contains("#"), s"tracking/fragment kept: $u")
      assert(!u.endsWith("/"), s"trailing slash kept: $u")
    }
    // the injected mess must actually exercise the collapse: at least
    // one canonical page observed under >1 raw spelling
    assert(got.exists(r => r.getLong(2) > 1L),
      "no canonical URL with multiple raw variants — injection broken")
    // keeper is the min event id of the group, so keepers are unique
    val keepers = got.map(_.getLong(3))
    assert(keepers.distinct.length == keepers.length)
  }

  test("readability formulas agree with a hand computation per document") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r4(x: Double) = BigDecimal(x).setScale(4, HALF_UP).toDouble
    val texts = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = SparkEntry.queries("q_readability")(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (id, text) = (r.getLong(0), texts(r.getLong(0)))
      val nw = text.split(" ", -1).length.toLong
      val sentLen = id % 5 + 8
      val nSent = (nw + sentLen - 1) / sentLen
      val syl = "[aeiouy]+".r.findAllIn(text).length.toLong
      val longW = text.split(" ", -1).count(_.length > 6).toLong
      assert(r.getLong(1) == nw && r.getLong(2) == nSent &&
        r.getLong(3) == syl && r.getLong(4) == longW, s"counts: $r")
      assert(r.getDouble(5) == r4(206.835 - 1.015 * (nw.toDouble / nSent)
        - 84.6 * (syl.toDouble / nw) + 1e-9), s"flesch: $r")
      assert(r.getDouble(6) == r4(nw.toDouble / nSent
        + 100.0 * longW / nw + 1e-9), s"lix: $r")
    }
  }

  test("q_source_kl: KL is non-negative and splits as cross-entropy minus entropy") {
    // The oracle pins the arithmetic; this pins the SEMANTICS of the
    // divergence: KL(P_s ‖ P_corpus) ≥ 0 (Gibbs), the three reported
    // numbers satisfy KL = H× − H (they are one sum split in two),
    // and H(P_s) ≤ ln |vocab_s| (uniform bound).
    val rows = SparkEntry.queries("q_source_kl")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nv, kl, h, hx) = (r.getString(0), r.getLong(1),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(kl >= -1e-9, s"$src: KL negative ($kl)")
      assert(math.abs(kl - (hx - h)) < 5e-4,
        s"$src: KL $kl != H_cross $hx - H $h")
      assert(h <= math.log(nv.toDouble) + 1e-6,
        s"$src: entropy $h exceeds ln($nv)")
    }
    // sources must not all coincide with the corpus distribution
    assert(rows.exists(_.getDouble(3) > 1e-4),
      "every source KL is ~0 — fixture mixture degenerate?")
  }

  test("q_rank_ndcg: metrics bounded and DCG sits between worst- and best-packing") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val rows = SparkEntry.queries("q_rank_ndcg")(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 query rows, got ${rows.length}")
    rows.foreach { r =>
      val (q, hits, p10, dcg, ndcg) = (r.getLong(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(hits >= 0 && hits <= 10, s"q$q: hits $hits")
      assert(math.abs(p10 - hits / 10.0) < 1e-6, s"q$q: p@10 $p10 vs $hits")
      assert(ndcg >= -1e-9 && ndcg <= 1 + 1e-6, s"q$q: ndcg $ndcg")
      // DCG of `hits` relevant results is maximal when they occupy
      // ranks 1..hits and minimal when they occupy ranks 10-hits+1..10
      val best = (1 to hits.toInt).map(r => 1.0 / log2(r + 1.0)).sum
      val worst = (10 - hits.toInt + 1 to 10).map(r => 1.0 / log2(r + 1.0)).sum
      assert(dcg <= best + 1e-6 && dcg >= worst - 1e-6,
        s"q$q: dcg $dcg outside [$worst, $best] for $hits hits")
    }
    // the fixture labels are NOT embedding-clustered (they're
    // independent of the geometry), so mean p@10 sits AT chance
    // (~1/|classes| = 0.1) — the eval machinery is what's under
    // test (the oracle hash-checks it); just pin non-degeneracy:
    // some retrieved results are relevant, not all are
    val meanP = rows.map(_.getDouble(3)).sum / 10.0
    assert(meanP > 0.0 && meanP < 1.0,
      s"mean p@10 $meanP degenerate — no relevance signal at all?")
  }
}
