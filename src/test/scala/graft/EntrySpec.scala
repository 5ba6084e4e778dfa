package graft

/** Smoke coverage: the flagship entry and every declared query run on
  * sf0.001 and return rows (the known-empty threshold queries are
  * allowed zero).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows with the manifest schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("event_type", "bucket_day", "bucket_week",
      "bucket_month", "f_daily", "event_id"))
    assert(df.count() > 0)
  }

  // Tiny sample ⇒ a similarity/near-dup threshold query may legitimately
  // come up empty at sf0.001.
  private val mayBeEmpty = Set("q_dedup_embed_cosine", "q_dedup_minhash",
    "q_dedup_simhash", "q_dedup_winnow", "q_dedup_ngram_jaccard", "q_join_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }
}
