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
}
