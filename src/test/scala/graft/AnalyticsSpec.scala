package graft

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Independent semantic checks for the ClickHouse-analytics aggregates
  * (`q_funnel`, `q_cohort_retention`, `q_sample`). The DuckDB oracle
  * mirrors each query's relational SHAPE, so these specs pin the
  * SEMANTICS on hand-crafted inputs with known ground truth — ordering
  * constraints, window cutoffs, cohort boundaries.
  */
class AnalyticsSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel counts only in-order, in-window progressions") {
    val rows = Seq(
      // u1: full in-order conversion within 7 days -> level 3
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE click -> purchase doesn't count, level 2
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // u3: click after the 7-day window -> level 1
      (3L, "signup", ts(1)), (3L, "click", ts(9)),
      // u4: signup only -> level 1
      (4L, "signup", ts(1)),
      // u5: click+purchase but never signed up -> not in the funnel
      (5L, "click", ts(1)), (5L, "purchase", ts(2)))
    val e = spark.createDataFrame(rows).toDF("user_id", "event_type", "ts_s")

    // same pipeline as q_funnel, applied to the synthetic events
    val u1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
    val u2 = e.filter(col("event_type") === "click")
      .join(u1, Seq("user_id"))
      .filter(col("ts_s") > col("t1") &&
        col("ts_s") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts_s")).as("t2"), first(col("t1")).as("t1b"))
    val u3 = e.filter(col("event_type") === "purchase")
      .join(u2, Seq("user_id"))
      .filter(col("ts_s") > col("t2") &&
        col("ts_s") <= col("t1b") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min(col("ts_s")).as("t3"))
    val levels = u1
      .join(u2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(u3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + col("t2").isNotNull.cast("int") + col("t3").isNotNull.cast("int"))
          .as("level"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(levels == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1),
      s"got $levels")
  }

  test("fixture funnel is monotone: level counts exist and users are partitioned") {
    val got = SparkEntry.queries("q_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every signup user lands in exactly one level
    val signups = operators.Relational.eventsSec(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(got.values.sum == signups, s"levels $got must partition $signups users")
    assert(got.keySet.subsetOf(Set(1L, 2L, 3L)))
  }

  test("cohort retention flags exact week offsets only") {
    val rows = Seq(
      // u1 signs up week of Jan 1 (Mon), active again exactly next week
      (1L, "signup", ts(1)), (1L, "click", ts(8)),
      // u2 signs up same week, next activity 2 weeks out only
      (2L, "signup", ts(2)), (2L, "click", ts(16)),
      // u3 signs up same week, never returns
      (3L, "signup", ts(3)))
    val e = spark.createDataFrame(rows).toDF("user_id", "event_type", "ts_s")
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min(col("ts_s"))).as("cohort_week"))
    val activity = e.select(col("user_id"),
      date_trunc("week", col("ts_s")).as("act_week")).distinct()
    val r = cohort.join(activity, Seq("user_id"))
      .groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum((col("act_week") === col("cohort_week") + expr("INTERVAL 7 DAYS"))
          .cast("long")).as("wk1"),
        sum((col("act_week") === col("cohort_week") + expr("INTERVAL 14 DAYS"))
          .cast("long")).as("wk2"))
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1 && r(0).getLong(3) == 1)
  }

  test("consistent-hash sample is stable and joins line up across tables") {
    val q = SparkEntry.queries("q_sample")
    val a = q(spark, sf).collect().map(_.getLong(0)).toSet
    val b = q(spark, sf).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty, "sample must be identical across runs")
    // sampling lineitem on the SAME key keeps exactly the sampled orders
    val li = Tables(spark, sf, "lineitem")
      .filter(substring(md5(col("l_orderkey").cast("string")), 1, 1) === "0")
      .select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(li.nonEmpty && li.subsetOf(a),
      "lineitem sampled on the same key must align with the orders sample")
  }

  // ---- round-4 analytics kernels (operators.Analytics) ----

  test("collapse drops fully-cancelled keys and nets the survivors") {
    val rows = Seq(
      // k1: 2 inserts + 1 cancel -> survives with net 1
      (1L, 1L, 10.0), (1L, 1L, 20.0), (1L, -1L, 10.0),
      // k2: insert + cancel annul -> vanishes
      (2L, 1L, 5.0), (2L, -1L, 5.0),
      // k3: cancel only (late cancel of a compacted insert) -> net<0, vanishes
      (3L, -1L, 7.0))
    val df = spark.createDataFrame(rows).toDF("k", "sign", "v")
    val got = operators.Analytics.collapse(df, "k", col("sign"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List((1L, 1L, 20.0)), s"got $got")
  }

  test("welch t-test: identical samples give t=0; known case matches hand math") {
    val same = Seq(("a", 1.0), ("b", 1.0), ("a", 2.0), ("b", 2.0),
      ("a", 3.0), ("b", 3.0))
    val df = spark.createDataFrame(same).toDF("g", "x")
    val r0 = operators.Analytics.welchTTest(df,
      col("g") === "a", col("g") === "b", col("x")).collect()(0)
    assert(r0.getDouble(0) == 0.0 && r0.getLong(2) == 3 && r0.getLong(3) == 3)

    // A = {1,2,3,4,5} (m=3, v=2.5), B = {2,4,6} (m=4, v=4):
    // se = 2.5/5 + 4/3; t = -1/sqrt(11/6); dof via Welch–Satterthwaite
    val ab = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0))
    val r = operators.Analytics.welchTTest(
      spark.createDataFrame(ab).toDF("g", "x"),
      col("g") === "a", col("g") === "b", col("x")).collect()(0)
    val se = 2.5 / 5 + 4.0 / 3
    val expT = BigDecimal(-1.0 / math.sqrt(se))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expDof = BigDecimal(se * se /
        (math.pow(0.5, 2) / 4 + math.pow(4.0 / 3, 2) / 2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(0) == expT, s"t: got ${r.getDouble(0)}, want $expT")
    assert(r.getDouble(1) == expDof, s"dof: got ${r.getDouble(1)}, want $expDof")
  }

  test("cramers V: 1 for perfect association, 0 for exact independence") {
    // perfect: b is a bijection of a
    val perfect = spark.createDataFrame(
      Seq(("x", "p"), ("y", "q"), ("z", "r"), ("x", "p"), ("y", "q")))
      .toDF("a", "b")
    val vp = operators.Analytics.cramersV(perfect, "a", "b").collect()(0)
    assert(vp.getDouble(1) == 1.0, s"perfect association must give V=1, got $vp")

    // exact independence: uniform 2x2 grid -> chi2 = 0
    val indep = spark.createDataFrame(
      for { a <- Seq("x", "y"); b <- Seq("p", "q") } yield (a, b))
      .toDF("a", "b")
    val vi = operators.Analytics.cramersV(indep, "a", "b").collect()(0)
    assert(vi.getDouble(0) == 0.0 && vi.getDouble(1) == 0.0,
      s"uniform grid must give chi2=V=0, got $vi")
  }

  test("sumMap nets per-key sums into the sorted canonical string") {
    val rows = Seq((1L, "b", 0.25), (1L, "a", 1.0), (1L, "b", 0.25),
      (2L, "a", -0.5))
    val df = spark.createDataFrame(rows).toDF("k", "mk", "v")
    val got = operators.Analytics.sumMap(df, "k", "mk", "v")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List(
      (1L, "a:10000\u001fb:5000", 2L), (2L, "a:-5000", 1L)), s"got $got")
  }

  test("bitwise aggregates fold as and/or/xor") {
    val df = spark.createDataFrame(Seq(("g", 6L), ("g", 7L), ("g", 12L)))
      .toDF("g", "x")
    val r = df.groupBy("g").agg(
      expr("bit_and(x)").as("a"), expr("bit_or(x)").as("o"),
      expr("bit_xor(x)").as("x")).collect()(0)
    assert(r.getLong(1) == (6L & 7L & 12L) &&
      r.getLong(2) == (6L | 7L | 12L) &&
      r.getLong(3) == (6L ^ 7L ^ 12L))
  }

  test("embed_normalize quantizes into the int8 range") {
    val rows = SparkEntry.queries("q_embed_normalize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nrm, qMin, qMax) = (r.getDouble(1), r.getLong(3), r.getLong(4))
      assert(nrm > 0, s"vec ${r.getLong(0)}: norm must be positive")
      assert(qMin >= -127 && qMax <= 127,
        s"vec ${r.getLong(0)}: codes [$qMin,$qMax] outside int8 range")
    }
  }

  test("temperature mix: probabilities normalize and up-weight the tail") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val pSum = rows.map(_._3).sum
    assert(math.abs(pSum - 1.0) <= 0.001, s"p must sum to ~1, got $pSum")
    // alpha < 1 compresses the range: every p is closer to uniform than
    // the raw share is (tail langs up-weighted, head langs down-weighted)
    val n = rows.map(_._2).sum.toDouble
    val uniform = 1.0 / rows.length
    rows.foreach { case (lang, nd, p) =>
      val raw = nd / n
      assert(math.abs(p - uniform) <= math.abs(raw - uniform) + 1e-9,
        s"$lang: alpha-scaled p=$p must sit between raw=$raw and uniform")
    }
  }

  test("ROC AUC: perfect separation is 1, ties count half, reversal complements") {
    import spark.implicits._
    import operators.Analytics
    val perfect = Seq((1.0, false), (2.0, false), (10.0, true), (11.0, true))
      .toDF("score", "pos")
    val p = Analytics.rocAuc(perfect, col("pos"), col("score")).collect()(0)
    assert(p.getDouble(0) == 1.0 && p.getLong(1) == 2 && p.getLong(2) == 2)
    // hand case with one tied score: pairs (3>2✓, 3>1✓, 2=2 half, 2>1✓)
    // → AUC = (2 + 1.5) / 4 = 0.875
    val hand = Seq((3.0, true), (2.0, false), (2.0, true), (1.0, false))
      .toDF("score", "pos")
    val h = Analytics.rocAuc(hand, col("pos"), col("score")).collect()(0)
    assert(h.getDouble(0) == 0.875, s"tied-case AUC=${h.getDouble(0)}")
    // score reversal: ties still count half → exactly 1 − AUC
    val r = Analytics.rocAuc(hand, col("pos"), -col("score")).collect()(0)
    assert(r.getDouble(0) == 0.125, s"reversed AUC=${r.getDouble(0)}")
  }

  test("ANOVA F: hand case matches; equal group means give F=0") {
    import spark.implicits._
    import operators.Analytics
    // groups with means 2/3/4, each var 1 → SSB=6 df1=2, SSW=6 df2=6 → F=3
    val g = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 3.0), ("c", 4.0), ("c", 5.0)).toDF("g", "x")
    val f = Analytics.anovaF(g, col("g"), col("x")).collect()(0)
    assert(f.getDouble(0) == 3.0, s"F=${f.getDouble(0)}")
    assert(f.getLong(1) == 2 && f.getLong(2) == 6 &&
      f.getLong(3) == 3 && f.getLong(4) == 9)
    // identical group means → SSB=0 → F=0 exactly
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "x")
    val f0 = Analytics.anovaF(eq, col("g"), col("x")).collect()(0)
    assert(f0.getDouble(0) == 0.0, s"F=${f0.getDouble(0)}")
  }

  test("skyline equals the brute-force dominance filter on the fixture") {
    val grid = Tables(spark, sf, "part")
      .groupBy(col("p_retailprice").as("price"), col("p_size").cast("long").as("size"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val brute = grid.filter { case (p, s, _) =>
      !grid.exists { case (p2, s2, _) =>
        p2 <= p && s2 <= s && (p2 < p || s2 < s) }
    }.map { case (p, s, n) => (p, s, n) }.toSet
    val sky = SparkEntry.queries("q_skyline")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
    assert(sky == brute, s"skyline=${sky.size} brute=${brute.size}")
    assert(sky.nonEmpty)
  }

  test("two-feature OLS recovers exact coefficients on noiseless data") {
    import spark.implicits._
    import operators.Analytics
    // y = 2·x1 + 3·x2 + 5 exactly (x grid chosen so x1, x2 decorrelate)
    val rows = for { a <- 1 to 5; b <- 1 to 4 }
      yield (a.toDouble, b.toDouble, 2.0 * a + 3.0 * b + 5.0)
    val df = rows.toDF("x1", "x2", "y")
    val r = Analytics.olsTwoFeature(df, col("x1"), col("x2"), col("y"))
      .collect()(0)
    assert(r.getDouble(0) == 2.0, s"b1=${r.getDouble(0)}")
    assert(r.getDouble(1) == 3.0, s"b2=${r.getDouble(1)}")
    assert(r.getDouble(2) == 5.0, s"b0=${r.getDouble(2)}")
    assert(r.getLong(3) == 20)
  }

  test("central moments: symmetric data has skew 0 and the hand kurtosis") {
    import spark.implicits._
    import operators.Analytics
    // {1,2,3}: m2=2/3, m3=0, m4=2/3 → skew 0, excess kurt = 1.5−3 = −1.5
    // {0,0,1,1}: Bernoulli(½) → skew 0, excess kurt = −2 exactly
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 0.0), ("b", 1.0), ("b", 1.0)).toDF("g", "x")
    val out = Analytics.momentsSkewKurt(df, col("g"), col("x"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("a") == ((0.0, -1.5, 3L)), s"a=${out("a")}")
    assert(out("b") == ((0.0, -2.0, 4L)), s"b=${out("b")}")
  }

  test("salted skew join aggregates exactly like the plain join") {
    val plain = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SparkEntry.queries("q_join_skew")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("logreg GD reduces the loss below the ln(2) start and stays bounded") {
    val r = SparkEntry.queries("q_logreg_gd")(spark, sf).collect().head
    val (w0, w1, w2, loss, n) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    // at w = 0 the log-loss is exactly ln 2; any productive descent
    // ends strictly below it, and loss is positive by definition
    assert(loss > 0 && loss < math.log(2.0), s"loss=$loss")
    assert(Seq(w0, w1, w2).forall(w => !w.isNaN && math.abs(w) < 10))
    assert(n == Tables(spark, sf, "lineitem").count())
    // determinism: a second full run reproduces the identical row
    val r2 = SparkEntry.queries("q_logreg_gd")(spark, sf).collect().head
    assert(r.toString == r2.toString)
  }

  test("markov transition rows are stochastic: shares sum to 1 per prev") {
    val rows = SparkEntry.queries("q_markov_transition")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      // each p is rounded to 4 decimals, so the row sum may be off by
      // at most |types|/2 ulps of the grid
      assert(math.abs(pSum - 1.0) <= rs.length * 5e-5 + 1e-9,
        s"row $prev sums to $pSum")
      assert(rs.forall(r => r.getLong(2) > 0 && r.getDouble(3) > 0))
    }
    // pair conservation: total transitions = total events − users with
    // ≥1 event (each user's chain has length n_events − 1)
    val e = operators.Relational.eventsSec(spark, sf)
    val total = e.count()
    val users = e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == total - users)
  }

  test("attribution credits conserve: each converting user counted once") {
    val rows = SparkEntry.queries("q_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    // no purchase channel may receive credit — purchases are the
    // conversion, not a touch
    assert(!rows.exists(_.getString(0) == "purchase"))
    // Σ first = Σ last = number of users with a pre-purchase touch
    val first = rows.map(_.getLong(1)).sum
    val last = rows.map(_.getLong(2)).sum
    assert(first == last && first > 0)
  }

  test("session paths are well-formed trigrams with descending counts") {
    val rows = SparkEntry.queries("q_session_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("signup", "click", "purchase", "view", "error")
    rows.foreach { r =>
      val parts = r.getString(0).split('>')
      assert(parts.length == 3 && parts.forall(types), s"bad path $r")
      assert(r.getLong(1) > 0)
    }
    // counts conserve against the raw trigram total: Σ over ALL paths
    // = Σ_users max(0, n_u − 2); the top-20 can only undercount
    val perUser = operators.Relational.eventsSec(spark, sf)
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val totalTris = perUser.map(n => math.max(0L, n - 2)).sum
    assert(rows.map(_.getLong(1)).sum <= totalTris)
  }

  test("retention matrix: offset-0 covers the cohort and rates stay in (0,1]") {
    val rows = SparkEntry.queries("q_retention_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0, s"negative offset: $r")
      assert(r.getLong(2) <= r.getLong(3), s"more active than cohort: $r")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1 + 1e-9)
    }
    // every signup user is active in their own cohort week (the signup
    // itself is activity), so offset 0 retention is exactly 1
    rows.filter(_.getLong(1) == 0).foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"offset-0 must cover cohort: $r")
    }
    // the matrix refines q_cohort_retention: same cohorts, same sizes
    val coarse = SparkEntry.queries("q_cohort_retention")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fine = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fine == coarse, "cohort sizes must agree with q_cohort_retention")
  }

  test("A/B z-test arms partition the users and z matches the rate gap sign") {
    val r = SparkEntry.queries("q_ab_ztest")(spark, sf).collect().head
    val (n0, c0, r0, n1, c1, r1, z) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5),
      r.getDouble(6))
    val users = operators.Relational.eventsSec(spark, sf)
      .select("user_id").distinct().count()
    assert(n0 + n1 == users, "arms must partition the user set")
    assert(c0 <= n0 && c1 <= n1 && r0 >= 0 && r0 <= 1 && r1 >= 0 && r1 <= 1)
    // z carries the sign of the observed rate difference (or 0 on a tie)
    assert(math.signum(z) == math.signum(r0 - r1) || math.abs(z) < 1e-3)
  }

  test("time-to-convert percentiles are ordered and mean sits inside them") {
    val r = SparkEntry.queries("q_time_to_convert")(spark, sf).collect().head
    val (n, p25, p50, p75, p90, mean) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(n > 0)
    assert(p25 <= p50 && p50 <= p75 && p75 <= p90, s"quantiles disordered: $r")
    assert(p25 >= 0 && mean >= 0, "latency cannot be negative")
  }

  test("q_mutual_info respects the information-theoretic bounds") {
    // The oracle pins the arithmetic against DuckDB; this pins the
    // SEMANTICS: 0 ≤ MI ≤ min(H(L), H(F)), 0 ≤ NMI ≤ 1, and the
    // entropy of the label is the same number whichever feature it
    // was computed alongside (it only depends on the label marginal).
    val rows = SparkEntry.queries("q_mutual_info")(spark, sf).collect()
    assert(rows.length == 3, s"expected 3 screened features, got ${rows.length}")
    val hLabels = rows.map(_.getDouble(3)).distinct
    assert(hLabels.length == 1,
      s"H(label) must not depend on the feature: ${hLabels.mkString(",")}")
    rows.foreach { r =>
      val (f, mi, hl, hf, nmi) = (r.getString(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mi >= -1e-9, s"$f: MI negative ($mi)")
      assert(mi <= math.min(hl, hf) + 1e-6,
        s"$f: MI $mi exceeds min(H) ${math.min(hl, hf)}")
      assert(nmi >= -1e-9 && nmi <= 1 + 1e-9, s"$f: NMI out of [0,1] ($nmi)")
      assert(hl > 0 && hf > 0, s"$f: degenerate marginal entropy")
    }
  }
}
