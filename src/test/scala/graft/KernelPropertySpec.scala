package graft

import graft.expressions.{RpKernels, TextExprs, VectorExprs}
import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import scala.util.Random

/** Algebraic properties of the native dedup/ANN kernels over RANDOM
  * inputs. The example-based suites (PipelineSpec) pin each kernel
  * bit-identical to an independent HOF formulation on the fixture
  * corpus; these pin the LAWS the pipelines silently rely on:
  *
  *  - MinHash is a union homomorphism (signatures merge by min — why
  *    incremental/streaming dedup can fold signatures without text)
  *    and order/duplicate-blind (a SET sketch);
  *  - SimHash is permutation-invariant (a MULTISET sketch);
  *  - winnowing honors the MOSS guarantee: any shared run of at least
  *    k + w − 1 characters forces a shared fingerprint (why a
  *    fingerprint equi-join cannot miss a long-enough clone);
  *  - rp_bits is scale-invariant and sign-antisymmetric (a COSINE
  *    bucketing key: direction only, magnitude never).
  *
  * Generators are ScalaCheck `Gen`s sampled into one DataFrame per
  * property — each law is checked distributed, through codegen, not
  * on driver-side replicas of the kernels.
  */
class KernelPropertySpec extends SparkSpec {

  private val rnd = new Random(0x9e3779b9L)
  private def sampled[A](g: Gen[A]): A = {
    val it = Iterator.continually(g.sample).flatten
    it.next()
  }

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  // nonempty: a doc SHORTER than the shingle width hashes its whole
  // text as one shingle (TextKernels.minhashWords), so the empty list
  // contributes hash("") — a real shingle, outside the set algebra
  private val words: Gen[Seq[String]] =
    Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, word))

  test("minhash merges by elementwise min: sig(A ++ B) == min(sig(A), sig(B))") {
    import spark.implicits._
    val rows = Seq.fill(300)((sampled(words), sampled(words)))
    val k = 16
    val sig = (c: String) => TextExprs.minhashWords(col(c), 1, k)
    val bad = rows.toDF("a", "b")
      .select(sig("a").as("sa"), sig("b").as("sb"),
        TextExprs.minhashWords(concat(col("a"), col("b")), 1, k).as("sab"))
      .filter(col("sab") =!= zip_with(col("sa"), col("sb"), (x, y) => least(x, y)))
    assert(bad.count() == 0, "minhash union homomorphism violated")
  }

  test("minhash and simhash ignore word order; minhash also ignores duplicates") {
    import spark.implicits._
    val rows = Seq.fill(300) {
      val w = sampled(words.suchThat(_.nonEmpty))
      (w, rnd.shuffle(w), w ++ rnd.shuffle(w).take(rnd.nextInt(w.size + 1)))
    }
    val bad = rows.toDF("w", "p", "d")
      .filter(
        TextExprs.minhashWords(col("w"), 1, 16) =!= TextExprs.minhashWords(col("p"), 1, 16) ||
        TextExprs.minhashWords(col("w"), 1, 16) =!= TextExprs.minhashWords(col("d"), 1, 16) ||
        TextExprs.simhashWords(col("w")) =!= TextExprs.simhashWords(col("p")))
    assert(bad.count() == 0, "order/duplicate invariance violated")
  }

  test("winnowing: a shared run of k+w-1 chars forces a shared fingerprint") {
    import spark.implicits._
    // default winnow params are k=16, w=8 ⇒ guarantee length 23; the
    // shared run is longer (32) and the flanks are independent noise
    val text: Gen[String] =
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val shared: Gen[String] = Gen.listOfN(32, Gen.alphaLowerChar).map(_.mkString)
    val rows = Seq.fill(300) {
      val s = sampled(shared)
      (sampled(text) + s + sampled(text), sampled(text) + s + sampled(text))
    }
    val bad = rows.toDF("x", "y")
      .filter(!arrays_overlap(
        TextFns.winnowFingerprints(col("x")), TextFns.winnowFingerprints(col("y"))))
    assert(bad.count() == 0, "MOSS winnowing guarantee violated")
  }

  test("rp_bits keys direction only: positive scaling fixes every bit, negation flips all") {
    import spark.implicits._
    val nBits = 16
    val dim = 16
    val signs = RpKernels.signs(nBits, dim)
    val vec: Gen[Seq[Float]] =
      Gen.listOfN(dim, Gen.choose(-1.0, 1.0).map(_.toFloat))
    // keep every projection away from zero: scaling cannot cross a
    // hyperplane, and negation must flip a STRICT sign (s = ±0.0 maps
    // to the same bit on both inputs — excluded, not a counterexample)
    val clear = (v: Seq[Float]) =>
      signs.forall(row => math.abs(v.zip(row).map { case (x, s) => x * s }.sum) > 1e-3)
    val rows = Seq.fill(300)(sampled(vec.suchThat(clear)))
      .map(v => (v, rnd.nextFloat() * 2.9f + 0.1f))
    val mask = (1L << nBits) - 1
    val bits = (c: org.apache.spark.sql.Column) => VectorExprs.rpBits(c, nBits, dim)
    val bad = rows.toDF("v", "c")
      .select(
        bits(col("v")).as("k"),
        bits(transform(col("v"), x => (x * col("c")).cast("float"))).as("ks"),
        bits(transform(col("v"), x => (-x).cast("float"))).as("kn"))
      .filter(col("ks") =!= col("k") ||
        col("kn") =!= col("k").bitwiseXOR(lit(mask)))
    assert(bad.count() == 0, "rp_bits scale/sign law violated")
  }

  test("ROC AUC laws on random labeled scores: range, complement, " +
      "rank-sum identity") {
    import spark.implicits._
    import operators.Analytics
    // scores on a COARSE grid so ties actually occur
    val rows = Seq.fill(400)((rnd.nextInt(40) / 4.0, rnd.nextBoolean()))
    val withBoth = if (rows.exists(_._2) && rows.exists(!_._2)) rows
      else rows.take(398) ++ Seq((1.0, true), (2.0, false))
    val df = withBoth.toDF("score", "pos")
    val auc = Analytics.rocAuc(df, col("pos"), col("score"))
      .collect()(0).getDouble(0)
    assert(auc >= 0.0 && auc <= 1.0, s"AUC out of range: $auc")
    val aucRev = Analytics.rocAuc(df, col("pos"), -col("score"))
      .collect()(0).getDouble(0)
    assert(math.abs(auc + aucRev - 1.0) < 2e-4,
      s"complement law: $auc + $aucRev != 1")
    // trapezoid-with-ties AUC == the Mann-Whitney rank-sum estimator:
    // (#pos-beats-neg pairs + half the ties) / (P*N), brute-forced
    val pos = withBoth.filter(_._2).map(_._1)
    val neg = withBoth.filterNot(_._2).map(_._1)
    val wins = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = wins / (pos.size.toDouble * neg.size)
    assert(math.abs(auc - brute) < 2e-4, s"rank-sum identity: $auc vs $brute")
  }

  test("skyline laws on random grids: equals brute force, idempotent, " +
      "monotone under point insertion") {
    import spark.implicits._
    // random distinct (price, size) grids
    val pts = Seq.fill(200)((rnd.nextInt(50).toDouble, rnd.nextInt(50).toLong))
      .distinct
    def brute(g: Seq[(Double, Long)]) = g.filter { case (p, s) =>
      !g.exists { case (p2, s2) => p2 <= p && s2 <= s && (p2 < p || s2 < s) }
    }.toSet
    // the declared query's window rule, applied globally (the local
    // phase only pre-prunes; on one partition this IS the operator)
    def winSkyline(g: Seq[(Double, Long)]): Set[(Double, Long)] = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("price").asc, col("size").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      g.toDF("price", "size")
        .withColumn("mprev", min("size").over(w))
        .filter(col("mprev").isNull || col("mprev") > col("size"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    }
    val sky = winSkyline(pts)
    assert(sky == brute(pts), "window rule != brute dominance")
    assert(winSkyline(sky.toSeq) == sky, "skyline not idempotent")
    // inserting a dominated point never changes the frontier
    val dominated = sky.head match { case (p, s) => (p + 1.0, s + 1L) }
    if (!pts.contains(dominated))
      assert(winSkyline((pts :+ dominated).distinct) == sky,
        "dominated insertion changed the frontier")
  }

  test("decayed-avg segment restitch survives spans far beyond 700·tau") {
    import spark.implicits._
    // spans the e^700 overflow cliff the single-anchor prefix form hit:
    // per-user histories up to 2000·tau (tau = 1s here), event gaps
    // both tiny (dense restitch traffic) and huge (carry underflow)
    val rnd = new Random(42)
    val rows = (0 until 3).flatMap { u =>
      var t = 0.0
      (0 until 120).map { i =>
        t += (if (rnd.nextInt(4) == 0) rnd.nextDouble() * 900 + 100
              else rnd.nextDouble() * 30)
        (u.toLong, i.toLong, rnd.nextDouble() * 100, t)
      }
    }
    val got = operators.Windows.decayedAvg(
        rows.toDF("user_id", "event_id", "value", "t"), tau = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // brute force: the O(n^2) definition, numerically safe term by term
    rows.groupBy(_._1).foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.foreach { case ((_, id, _, ti), i) =>
        var (ds, dc) = (0.0, 0.0)
        (0 to i).foreach { j =>
          val (_, _, vj, tj) = sorted(j)
          val w = math.exp(-(ti - tj))
          ds += vj * w; dc += w
        }
        val (gs, gc, ga) = got((u, id))
        assert(!gs.isNaN && !gc.isNaN && !ga.isNaN,
          s"user $u event $id: NaN at span ${ti}tau — the overflow cliff is back")
        assert(math.abs(gs - ds) < 1e-3 && math.abs(gc - dc) < 1e-3 &&
          math.abs(ga - ds / dc) < 1e-3,
          s"user $u event $id: got ($gs,$gc,$ga) want ($ds,$dc,${ds / dc})")
      }
    }
  }
}
