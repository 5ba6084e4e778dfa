package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way every graft
  * workload expects, plus catalog registration so the whole engine is
  * usable from pure SQL.
  *
  * Settings rationale (100 TB posture, SURVEY.md §4):
  *  - AQE on with skew-join handling: runtime re-planning converts
  *    sort-merge to broadcast when a side turns out small and splits
  *    skewed partitions — the behaviors the operators here rely on
  *    instead of hand-tuning per query;
  *  - shuffle partitions sized by the caller (cores locally, a
  *    data-proportional number on a cluster) rather than Spark's
  *    legacy 200;
  *  - UTC session timezone: date-bucket semantics (backup.sh:26–29)
  *    must not depend on cluster locale;
  *  - graft's native expressions registered for SQL
  *    ([[graft.expressions.GraftExtensions]]) so `vec_dot`,
  *    `minhash_words`, `simhash_words`, `winnow_fp` work in
  *    `spark.sql(...)` text, not just the Column API.
  */
object Graft {

  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new expressions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE coalescing floor (default 1MB): with parallelismFirst=true
      // (default) AQE sizes post-shuffle partitions at
      // totalBytes/defaultParallelism but never below this floor, so
      // any CPU-heavy stage over a byte-SMALL shuffle (per-group HOF
      // arrays, window frames over a few MB of grid rows) collapses to
      // totalBytes/1MB tasks — 2–3 tasks on a 32-core host. 64 KiB
      // keeps such stages at the parallelism target while leaving
      // byte-LARGE shuffles untouched (the floor only binds when
      // total/parallelism < floor, i.e. small data). Scale-neutral by
      // construction; env-tunable for constrained or very-high-core
      // deployments.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      // Whole-stage-codegen compile cache (static conf, default 100
      // entries): this engine's query surface is ~320 distinct queries
      // × several codegen units each, so at the default size every
      // entry is evicted long before a plan repeats and EVERY
      // invocation re-pays Janino compilation — pure fixed overhead,
      // identical at any data scale (compile cost does not grow with
      // data; at 100 TB it is noise, on a many-query server it is the
      // difference between compiling once and compiling per request).
      // 8192 generated-class entries are a few hundred MB at worst
      // against the multi-GB driver heap. Parameterized via env for
      // constrained drivers.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
      // read as a timestamp (PARQUET_TYPE_ILLEGAL); the legacy flag
      // surfaces it as LongType epoch-nanos. A session-level default —
      // NOT a per-query conf.set, which would be a global side effect
      // from inside a lazy plan builder (concurrent sessions / other
      // readers would be silently affected).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.fold(b)(b.master)
  }

  def session(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(appName, master, shufflePartitions).getOrCreate()
    // getOrCreate may return a PRE-EXISTING session, in which case
    // withExtensions never ran — register the SQL functions directly so
    // the contract ("graft functions SQL-registered") holds either way
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reg = s.sessionState.functionRegistry
    (expressions.VectorExprs.functions ++ expressions.TextExprs.functions ++
        expressions.ChAggExprs.functions).foreach {
      case (ident, info, fb) =>
        if (!reg.functionExists(ident)) reg.registerFunction(ident, info, fb)
    }
    s
  }

  /** Register every fixture table under its name as a temp view — the
    * catalog enumeration of backup.sh:24/env.sh:24 — so all queries
    * (and user SQL over graft's registered functions) run as plain
    * `spark.sql` text.
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }

  /** The engine's SQL-text entry point: the reference's literal
    * `BACKUP DATABASE … TO Disk('backups', '…')` statement
    * (backup.sh:45) — plus RESTORE / ALTER-mutations / OPTIMIZE —
    * routed onto the spec'd [[operators.Snapshot]] engines, with an
    * exact fallthrough to `spark.sql` for everything else
    * ([[GraftSql]]).
    */
  def sql(spark: SparkSession, text: String): org.apache.spark.sql.DataFrame =
    GraftSql.sql(spark, text)
}
