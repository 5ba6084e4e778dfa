package graft

import graft.operators.Relational

/** q_profile_table's null-counting arm: the fixture tables carry no
  * NULLs (so the declared query's oracle pins n_nulls = 0 only), and
  * this spec pins the arm against a constructed frame where nulls,
  * duplicates, and per-kind extrema are all exercised.
  */
class ProfileTableSpec extends SparkSpec {

  test("profile over a null-bearing frame: null/distinct counts and typed extrema") {
    import spark.implicits._
    val t = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (null, "a"), (2L, "c"), (null, null))
      .toDF("k", "s")
    val rows = Relational.profileTable(t, Seq(("k", "num"), ("s", "str")))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) == 5L && k.getLong(2) == 2L,   // n_rows, n_nulls
      s"k: expected 5 rows / 2 nulls, got ${k.getLong(1)}/${k.getLong(2)}")
    assert(k.getLong(3) == 2L, s"k: n_distinct ${k.getLong(3)} != 2")
    assert(k.getDouble(6) == 1.0 && k.getDouble(7) == 2.0,
      s"k: extrema ${k.getDouble(6)}..${k.getDouble(7)}")
    // avg ignores nulls: (1+2+2)/3 on the round+nudge grid
    assert(math.abs(k.getDouble(8) - 1.6667) < 1e-9,
      s"k: avg ${k.getDouble(8)}")
    assert(k.isNullAt(4) && k.isNullAt(5), "k: string extrema must be NULL")
    val s = rows("s")
    assert(s.getLong(2) == 2L && s.getLong(3) == 3L,
      s"s: nulls/distinct ${s.getLong(2)}/${s.getLong(3)}")
    assert(s.getString(4) == "a" && s.getString(5) == "c",
      s"s: extrema ${s.getString(4)}..${s.getString(5)}")
    assert(s.isNullAt(6) && s.isNullAt(7) && s.isNullAt(8),
      "s: numeric stats must be NULL")
  }

  test("approx profile ≡ exact profile except n_distinct within HLL error, and drops the Expand") {
    val cols = Seq(
      ("o_orderkey", "num"), ("o_custkey", "num"),
      ("o_orderdate", "str"), ("o_orderpriority", "str"),
      ("o_orderstatus", "str"), ("o_totalprice", "num"))
    val t = Tables(spark, sf, "orders")
    val rsd = 0.05
    val exact = Relational.profileTable(t, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Relational.profileTableApprox(t, cols, rsd)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // every non-distinct field is the IDENTICAL aggregate — equal
      (1 to 2).foreach(i => assert(a.getLong(i) == e.getLong(i),
        s"$c field $i drifted between exact and approx profiles"))
      (4 to 8).foreach { i =>
        assert(a.isNullAt(i) == e.isNullAt(i), s"$c field $i nullness drifted")
        if (!e.isNullAt(i)) assert(a.get(i) == e.get(i),
          s"$c field $i drifted between exact and approx profiles")
      }
      // n_distinct within HLL tolerance (5 standard errors — the
      // fixture cardinalities are small enough that HLL is near-exact)
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) <= math.max(2.0, 5 * rsd * ed),
        s"$c: approx distinct $ad vs exact $ed exceeds HLL error")
    }
    // the scale claim is structural, not just numeric: the exact form
    // pays the multi-distinct Expand; the approx form must not
    def hasExpand(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(Relational.profileTable(t, cols)),
      "exact profile should plan the multi-distinct Expand (sanity)")
    assert(!hasExpand(Relational.profileTableApprox(t, cols, rsd)),
      "approx profile must collapse to one Expand-free aggregate pass")
  }
}
