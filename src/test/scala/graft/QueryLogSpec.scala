package graft

import org.apache.spark.sql.functions._

import graft.operators.QueryLog

/** system.query_log analog: one audit row per Dataset action, bounded
  * buffer, success + failure rows, DataFrame surface.
  */
class QueryLogSpec extends SparkSpec {

  /** The listener bus delivers asynchronously — poll until the
    * predicate holds or the deadline passes.
    */
  private def eventually[A](timeoutMs: Long = 15000)(probe: => Option[A]): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var got = probe
    while (got.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(50); got = probe
    }
    got.getOrElse(fail(s"query-log entry did not arrive within ${timeoutMs}ms"))
  }

  test("actions land as success rows with duration and row counts") {
    val l = QueryLog.install(spark)
    try {
      val n = Tables(spark, sf, "nation").filter(col("n_regionkey") === 0).count()
      val e = eventually() {
        l.entries.find(e => e.funcName == "count" && e.status == "Success")
      }
      assert(e.durationNs > 0)
      // count's final plan is the single-row aggregate
      assert(e.resultRows.contains(1L))
      // read_rows = scan output (parquet pushdown prunes at row-group
      // granularity, so it sits between the exact-filter count and the
      // full table)
      assert(e.readRows.exists(r => r >= n && r <= 25))
      assert(e.error.isEmpty)

      val df = QueryLog.asDf(spark, l)
      assert(df.columns.toSeq == Seq("event_time_ms", "func_name", "status",
        "duration_ns", "result_rows", "read_rows", "error"))
      assert(df.filter(col("status") === "Success").count() >= 1)
    } finally QueryLog.uninstall(spark, l)
  }

  test("failures land as exception rows; the buffer stays bounded") {
    val l = QueryLog.install(spark, capacity = 4)
    try {
      // ANSI mode: bigint * bigint overflow throws at execution time
      intercept[Exception] {
        Tables(spark, sf, "nation")
          .select((lit(Long.MaxValue) * col("n_nationkey") * 2).as("boom"))
          .collect()
      }
      val e = eventually() {
        l.entries.find(_.status == "ExceptionWhileProcessing")
      }
      assert(e.error.exists(_.nonEmpty))

      (1 to 10).foreach(_ => Tables(spark, sf, "region").count())
      eventually() {
        // all 10 counts delivered ⇒ ring has evicted down to capacity
        if (l.entries.count(_.funcName == "count") >= 4) Some(()) else None
      }
      assert(l.entries.length <= 4)
    } finally QueryLog.uninstall(spark, l)
  }
}
