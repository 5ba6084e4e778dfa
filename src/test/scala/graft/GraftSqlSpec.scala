package graft

import java.io.File
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** The SQL-text COMMAND surface ([[GraftSql]]): the reference's
  * literal `BACKUP DATABASE … TO Disk('backups', '….zip')` statement
  * (backup.sh:45) and the rest of the snapshot-lifecycle verbs, each
  * proven equivalent to the Scala API it routes onto — digest-
  * identical backups, row-identical restores, mutation-identical
  * ALTERs.
  */
class GraftSqlSpec extends SparkSpec {

  private def withRoot[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_sqlcmd").toString
    try body(root) finally FileUtils.deleteDirectory(new File(root))
  }

  private def events() = operators.Relational.eventsSec(spark, sf)
    .select("event_id", "user_id", "event_type", "value", "ts_s")

  test("SQL-text BACKUP TABLE ≡ Snapshot.backup — per-day digests byte-identical") {
    withRoot { root =>
      val e = events()
      e.createOrReplaceTempView("ev_graftsql")
      val out = Graft.sql(spark, s"BACKUP TABLE ev_graftsql TO '$root/sql';")
        .collect()(0)
      val apiRows = operators.Snapshot.backup(e, col("ts_s"), s"$root/api")
      assert(out.getAs[Long]("n_rows") == apiRows)
      // byte-identity witness: the order-insensitive (count, xor, sum)
      // content digest of every day partition matches exactly
      val sqlDig = operators.Snapshot.manifestDigests(spark, s"$root/sql").sorted
      val apiDig = operators.Snapshot.manifestDigests(spark, s"$root/api").sorted
      assert(sqlDig.nonEmpty && sqlDig == apiDig,
        "SQL-text BACKUP produced different content digests than Snapshot.backup")
      // and the statement registered the snapshot for later ALTERs
      assert(spark.conf.get("graft.snapshot.ev_graftsql") == s"$root/sql")
    }
  }

  test("the reference's literal statement: BACKUP DATABASE … TO Disk('backups', '….zip') round-trips") {
    withRoot { root =>
      // unique managed location per run: a PREVIOUS JVM's leftover
      // spark-warehouse/refdb.db would otherwise LOCATION_ALREADY_EXISTS
      // the saveAsTable (the catalog is in-memory, the warehouse is not)
      spark.sql("DROP DATABASE IF EXISTS refdb CASCADE")
      spark.sql(s"CREATE DATABASE refdb LOCATION '$root/refdb.db'")
      events().limit(500).write.mode("overwrite").saveAsTable("refdb.ev_small")
      Tables(spark, sf, "nation").write.mode("overwrite").saveAsTable("refdb.nation_dim")
      spark.conf.set("graft.disk.backups", root)
      // backup.sh:45 verbatim, with its dated BACKUP_SUFFIX object name
      val backed = Graft.sql(spark,
        "BACKUP DATABASE refdb TO Disk('backups', 'refdb-20240101-000000.zip');")
        .orderBy("table").collect()
      assert(backed.map(_.getString(0)).toSeq == Seq("ev_small", "nation_dim"))
      assert(new File(root, "refdb-20240101-000000.zip").isFile,
        "the backup must land as ONE zip object, the reference's artifact shape")
      val restored = Graft.sql(spark,
        "RESTORE DATABASE refdb FROM Disk('backups', 'refdb-20240101-000000.zip');")
        .orderBy("table").collect()
      assert(restored.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        backed.map(r => (r.getString(0), r.getAs[Long]("n_rows"))).toSeq)
      // restored views hold the original rows exactly (dimension table:
      // constant-epoch day bucket — one "part", dropped for the compare)
      val got = spark.table("nation_dim").drop("bucket_day")
        .orderBy("n_nationkey").collect().toSeq
      val want = spark.table("refdb.nation_dim")
        .orderBy("n_nationkey").collect().toSeq
      assert(got == want, "zip-restored nation_dim differs from the original")
      val gotEv = spark.table("ev_small").drop("bucket_day")
        .select("event_id", "user_id", "event_type", "value", "ts_s")
        .orderBy("event_id").collect().toSeq
      val wantEv = spark.table("refdb.ev_small")
        .select("event_id", "user_id", "event_type", "value", "ts_s")
        .orderBy("event_id").collect().toSeq
      assert(gotEv == wantEv, "zip-restored ev_small differs from the original")
    }
  }

  test("SQL-text RESTORE TABLE round-trips the directory arm, day-partitioned") {
    withRoot { root =>
      val e = events()
      e.createOrReplaceTempView("ev_rt_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_rt_graftsql TO '$root/snap';")
      val back = Graft.sql(spark,
        s"RESTORE TABLE ev_rt_graftsql FROM '$root/snap';")
      assert(back.columns.contains("bucket_day"),
        "a restored snapshot carries its day-partition column")
      val got = spark.table("ev_rt_graftsql") // RESTORE re-registered the view
        .select("event_id", "user_id", "event_type", "value", "ts_s")
        .orderBy("event_id").collect().toSeq
      val want = e.orderBy("event_id").collect().toSeq
      assert(got == want, "SQL-text RESTORE lost or changed rows")
    }
  }

  test("SQL-text ALTER TABLE DELETE ≡ Snapshot.delete, row for row") {
    withRoot { root =>
      val e = events()
      val pred = "event_type = 'error' AND value < 50.0"
      // SQL route
      e.createOrReplaceTempView("ev_del_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_del_graftsql TO '$root/sql';")
      val rep = Graft.sql(spark,
        s"ALTER TABLE ev_del_graftsql DELETE WHERE $pred;").collect()(0)
      // API route, independent snapshot
      operators.Snapshot.backup(e, col("ts_s"), s"$root/api")
      val apiRep = operators.Snapshot.delete(spark, s"$root/api", expr(pred))
      assert(rep.getAs[Long]("rows_affected") == apiRep.rowsAffected)
      assert(rep.getAs[Long]("rows_affected") > 0, "fixture must match the predicate")
      val got = operators.Snapshot.resolve(spark, s"$root/sql")
        .orderBy("event_id").collect().toSeq
      val want = operators.Snapshot.resolve(spark, s"$root/api")
        .orderBy("event_id").collect().toSeq
      assert(got == want, "SQL-text DELETE left a different snapshot than Snapshot.delete")
    }
  }

  test("SQL-text ALTER UPDATE and OPTIMIZE FINAL DEDUPLICATE route end-to-end") {
    withRoot { root =>
      val e = events()
      // UPDATE: assignment list with a computed expression + WHERE
      e.createOrReplaceTempView("ev_upd_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_upd_graftsql TO '$root/upd';")
      Graft.sql(spark,
        s"ALTER TABLE ev_upd_graftsql UPDATE value = value * 2, user_id = -1 " +
          "WHERE event_type = 'error';")
      operators.Snapshot.backup(e, col("ts_s"), s"$root/updapi")
      operators.Snapshot.update(spark, s"$root/updapi",
        col("event_type") === "error",
        Map("value" -> (col("value") * 2), "user_id" -> lit(-1L)))
      assert(
        operators.Snapshot.resolve(spark, s"$root/upd").orderBy("event_id").collect().toSeq ==
        operators.Snapshot.resolve(spark, s"$root/updapi").orderBy("event_id").collect().toSeq,
        "SQL-text UPDATE diverged from Snapshot.update")
      // OPTIMIZE … FINAL DEDUPLICATE over a dirty (double-ingested) snapshot
      val dirty = e.unionByName(e.filter(col("event_type") === "error"))
      dirty.createOrReplaceTempView("ev_dirty_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_dirty_graftsql TO '$root/dirty';")
      val dd = Graft.sql(spark,
        "OPTIMIZE TABLE ev_dirty_graftsql FINAL DEDUPLICATE;").collect()(0)
      assert(dd.getAs[Long]("rows_affected") ==
        e.filter(col("event_type") === "error").count(),
        "DEDUPLICATE must drop exactly the double-ingested copies")
      assert(operators.Snapshot.resolve(spark, s"$root/dirty").count() == e.count())
    }
  }

  test("SQL-text ALTER ADD/DROP COLUMN are metadata-only schema evolution") {
    withRoot { root =>
      events().createOrReplaceTempView("ev_evo_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_evo_graftsql TO '$root/evo';")
      Graft.sql(spark,
        "ALTER TABLE ev_evo_graftsql ADD COLUMN source_tag string DEFAULT 'legacy';")
      Graft.sql(spark, "ALTER TABLE ev_evo_graftsql DROP COLUMN user_id;")
      val evolved = operators.Snapshot.readEvolved(spark, s"$root/evo")
      assert(evolved.columns.contains("source_tag") && !evolved.columns.contains("user_id"))
      assert(evolved.select("source_tag").distinct().collect().map(_.getString(0)).toSeq
        == Seq("legacy"))
    }
  }

  private def days(dest: String): Seq[String] =
    operators.Snapshot.parts(spark, dest)
      .collect().map(_.getString(0)).sorted.toSeq

  private def resolved(dest: String) =
    operators.Snapshot.resolve(spark, dest).orderBy("event_id").collect().toSeq

  test("SQL-text DETACH/ATTACH/DROP PARTITION ≡ Snapshot API, digest-identical") {
    withRoot { root =>
      val e = events()
      e.createOrReplaceTempView("ev_part_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_part_graftsql TO '$root/sql';")
      operators.Snapshot.backup(e, col("ts_s"), s"$root/api")
      val d = days(s"$root/sql")
      val (first, second) = (d.head, d(1))
      // DETACH the oldest day through both routes
      Graft.sql(spark, s"ALTER TABLE ev_part_graftsql DETACH PARTITION '$first';")
      operators.Snapshot.detachPartition(spark, s"$root/api", first)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/sql").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/api").sorted)
      assert(!days(s"$root/sql").contains(first))
      // ATTACH it back (bare partition id — ClickHouse's unquoted form)
      Graft.sql(spark, s"ALTER TABLE ev_part_graftsql ATTACH PARTITION $first;")
      operators.Snapshot.attachPartition(spark, s"$root/api", first)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/sql").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/api").sorted)
      assert(resolved(s"$root/sql") == resolved(s"$root/api"),
        "attach round-trip must restore identical rows on both routes")
      // DROP another day outright
      Graft.sql(spark, s"ALTER TABLE ev_part_graftsql DROP PARTITION '$second';")
      operators.Snapshot.dropPartition(spark, s"$root/api", second)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/sql").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/api").sorted)
      assert(!days(s"$root/sql").contains(second))
    }
  }

  test("SQL-text MOVE/REPLACE PARTITION ≡ Snapshot API across two snapshots") {
    withRoot { root =>
      val e = events()
      val d0 = e.select(min(date_format(col("ts_s"), "yyyyMMdd"))).head.getString(0)
      val tail = e.filter(date_format(col("ts_s"), "yyyyMMdd") > d0)
      // MOVE day d0 from src to a destination snapshot lacking it
      e.createOrReplaceTempView("ev_mv_src_graftsql")
      tail.createOrReplaceTempView("ev_mv_dst_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_mv_src_graftsql TO '$root/mvsrc';")
      Graft.sql(spark, s"BACKUP TABLE ev_mv_dst_graftsql TO '$root/mvdst';")
      operators.Snapshot.backup(e, col("ts_s"), s"$root/mvsrc_api")
      operators.Snapshot.backup(tail, col("ts_s"), s"$root/mvdst_api")
      Graft.sql(spark,
        s"ALTER TABLE ev_mv_src_graftsql MOVE PARTITION '$d0' TO TABLE ev_mv_dst_graftsql;")
      operators.Snapshot.movePartition(spark, s"$root/mvsrc_api", s"$root/mvdst_api", d0)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/mvsrc").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/mvsrc_api").sorted)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/mvdst").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/mvdst_api").sorted)
      assert(!days(s"$root/mvsrc").contains(d0) && days(s"$root/mvdst").contains(d0))
      // REPLACE day d0 in a full snapshot with a doubled-value version
      val doubled = e.withColumn("value", col("value") * 2)
      e.createOrReplaceTempView("ev_rp_dst_graftsql")
      doubled.createOrReplaceTempView("ev_rp_src_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_rp_dst_graftsql TO '$root/rpdst';")
      Graft.sql(spark, s"BACKUP TABLE ev_rp_src_graftsql TO '$root/rpsrc';")
      operators.Snapshot.backup(e, col("ts_s"), s"$root/rpdst_api")
      operators.Snapshot.backup(doubled, col("ts_s"), s"$root/rpsrc_api")
      Graft.sql(spark,
        s"ALTER TABLE ev_rp_dst_graftsql REPLACE PARTITION '$d0' FROM ev_rp_src_graftsql;")
      operators.Snapshot.replacePartition(spark, s"$root/rpsrc_api", s"$root/rpdst_api", d0)
      assert(operators.Snapshot.manifestDigests(spark, s"$root/rpdst").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/rpdst_api").sorted)
      // COPY semantics: the source still serves every day untouched
      assert(operators.Snapshot.manifestDigests(spark, s"$root/rpsrc").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/rpsrc_api").sorted)
      assert(resolved(s"$root/rpdst") == resolved(s"$root/rpdst_api"))
    }
  }

  test("SQL-text BACKUP … SETTINGS base_backup ≡ Snapshot.backupIncremental, chain-resolving") {
    withRoot { root =>
      val e = events()
      val cut = operators.Lifecycle.CutTs
      val base = e.filter(col("ts_s") < lit(cut).cast("timestamp"))
      // SQL route: base backup, then the incremental statement
      base.createOrReplaceTempView("ev_incb_graftsql")
      e.createOrReplaceTempView("ev_incc_graftsql")
      Graft.sql(spark, s"BACKUP TABLE ev_incb_graftsql TO '$root/base';")
      val rep = Graft.sql(spark,
        s"BACKUP TABLE ev_incc_graftsql TO '$root/inc' " +
          s"SETTINGS base_backup = '$root/base';").collect()(0)
      assert(rep.getAs[Long]("n_rows") == e.count(),
        "the incremental statement must report the verified CHAIN row count")
      // API route, independent chain
      operators.Snapshot.backup(base, col("ts_s"), s"$root/base_api")
      operators.Snapshot.backupIncremental(e, col("ts_s"), s"$root/base_api", s"$root/inc_api")
      assert(operators.Snapshot.manifestDigests(spark, s"$root/inc").sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/inc_api").sorted,
        "SQL-text incremental chain diverged from the API chain")
      // per-day source attribution identical: pre-cut days ride the base
      def srcs(d: String) = operators.Snapshot.parts(spark, d)
        .collect().map(r => (r.getString(0), r.getString(2))).sorted.toSeq
      assert(srcs(s"$root/inc") == srcs(s"$root/inc_api"))
      assert(srcs(s"$root/inc").exists(_._2 == "base") &&
        srcs(s"$root/inc").exists(_._2 == "delta"))
      // RESTORE resolves the chain by statement
      Graft.sql(spark, s"RESTORE TABLE ev_chain_graftsql FROM '$root/inc';")
      assert(spark.table("ev_chain_graftsql").count() == e.count())
    }
  }

  test("a live lease on the snapshot fails a concurrent SQL-text BACKUP fast; winner digests clean") {
    withRoot { root =>
      val e = events()
      e.createOrReplaceTempView("ev_race_graftsql")
      val dest = s"$root/contended"
      val inLease = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => AtomicDir.withLease(dest) {
        inLease.countDown(); release.await()
      })
      holder.start(); inLease.await()
      // the router's BACKUP rides Snapshot.backup's writer lease — the
      // overlapping tick loses without touching the directory
      intercept[AtomicDir.LeaseHeldException] {
        Graft.sql(spark, s"BACKUP TABLE ev_race_graftsql TO '$dest';")
      }
      release.countDown(); holder.join()
      // un-contended retry lands, digest-identical to the API route
      Graft.sql(spark, s"BACKUP TABLE ev_race_graftsql TO '$dest';")
      operators.Snapshot.backup(e, col("ts_s"), s"$root/api")
      assert(operators.Snapshot.manifestDigests(spark, dest).sorted ==
        operators.Snapshot.manifestDigests(spark, s"$root/api").sorted)
    }
  }

  test("command errors are actionable; non-commands fall through to spark.sql") {
    // unknown disk: the ClickHouse unknown-disk shape, with the fix
    val err = intercept[IllegalArgumentException] {
      Graft.sql(spark, "BACKUP DATABASE x TO Disk('nosuchdisk', 'x.zip');")
    }
    assert(err.getMessage.contains("graft.disk.nosuchdisk"))
    // mutation against an unregistered table names the SET to run
    val err2 = intercept[IllegalArgumentException] {
      Graft.sql(spark, "ALTER TABLE never_backed_up DELETE WHERE 1 = 1;")
    }
    assert(err2.getMessage.contains("graft.snapshot.never_backed_up"))
    // exact fallthrough: plain SQL is untouched
    assert(Graft.sql(spark, "SELECT 1 AS one;").collect()(0).getInt(0) == 1)
  }

  // ── ClickHouse DDL routing (round-12 verdict item 1) ───────────────

  test("routed CREATE TABLE … ReplacingMergeTree registers FINAL/SAMPLE ≡ the Scala calls") {
    withRoot { root =>
      spark.sql("DROP TABLE IF EXISTS ev_ddl_graftsql")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ddldb LOCATION '$root/ddldb.db'")
      val out = Graft.sql(spark,
        """CREATE TABLE ddldb.ev_ddl_graftsql (
          |  user_id Int64,
          |  event_type LowCardinality(String),
          |  event_id Int64,
          |  value Nullable(Float64)
          |) ENGINE = ReplacingMergeTree(event_id)
          |PARTITION BY toYYYYMM(ts)
          |ORDER BY (user_id, event_type)
          |SAMPLE BY intHash32(user_id)""".stripMargin).collect()(0)
      assert(out.getAs[String]("engine") == "ReplacingMergeTree")
      // the DDL registered EXACTLY what the Scala calls would
      assert(spark.conf.get("graft.final.ev_ddl_graftsql") ==
        "user_id,event_type|event_id")
      assert(spark.conf.get("graft.sample.ev_ddl_graftsql") == "user_id")
      assert(spark.conf.get("graft.orderby.ev_ddl_graftsql") == "user_id,event_type")
      assert(spark.conf.get("graft.partition.ev_ddl_graftsql") == "toYYYYMM(ts)")
      // types mapped: the catalog table exists with the Spark schema
      assert(spark.table("ddldb.ev_ddl_graftsql").schema.map(f =>
        (f.name, f.dataType.sql)).toSeq == Seq(
        ("user_id", "BIGINT"), ("event_type", "STRING"),
        ("event_id", "BIGINT"), ("value", "DOUBLE")))
      // zero-Scala end-to-end: INSERT (fallthrough) then FINAL (dialect)
      Graft.sql(spark,
        """INSERT INTO ddldb.ev_ddl_graftsql VALUES
          |  (1, 'click', 10, 1.5), (1, 'click', 20, 2.5), (2, 'view', 5, 9.0)""".stripMargin)
      spark.table("ddldb.ev_ddl_graftsql")
        .createOrReplaceTempView("ev_ddl_graftsql")
      val rows = Graft.sql(spark,
        "SELECT user_id, event_type, event_id, value FROM ev_ddl_graftsql FINAL " +
          "ORDER BY user_id").collect().toSeq.map(_.toString)
      assert(rows == Seq("[1,click,20,2.5]", "[2,view,5,9.0]"))
      spark.sql("DROP DATABASE IF EXISTS ddldb CASCADE")
    }
  }

  test("CREATE TABLE refusals are actionable; Spark's own CREATE falls through") {
    val err = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad1 (k Int64, v Int64) ENGINE = ReplacingMergeTree ORDER BY k")
    }
    assert(err.getMessage.contains("version column"))
    // CollapsingMergeTree routes (r13 verdict item 6) — but only with
    // its sign column declared, and the sign cannot be a key
    val err2 = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad2 (k Int64, sign Int8, v Float64) " +
          "ENGINE = CollapsingMergeTree ORDER BY k")
    }
    assert(err2.getMessage.contains("sign column"))
    val err2b = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad2b (k Int64, sign Int8, v Float64) " +
          "ENGINE = CollapsingMergeTree(nope) ORDER BY k")
    }
    assert(err2b.getMessage.contains("not among"))
    val err3 = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad3 (k Int64, v String MATERIALIZED upper(s)) " +
          "ENGINE = MergeTree ORDER BY k")
    }
    assert(err3.getMessage.contains("MATERIALIZED"))
    // AggregatingMergeTree routes ONLY with SimpleAggregateFunction
    // columns (their value IS the state); a plain non-key column or an
    // opaque AggregateFunction blob refuses with the reason named
    val err4 = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad4 (k Int64, v Float64) " +
          "ENGINE = AggregatingMergeTree() ORDER BY k")
    }
    assert(err4.getMessage.contains("SimpleAggregateFunction"))
    // AggregateFunction(uniq|sum|min|max|count|avg, T) route (sketch
    // bytes / plain values / the (sum, count) pair); a genuinely
    // opaque state (quantileTDigest, topK, …) stays the refusal
    val err5 = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad5 (k Int64, " +
          "st AggregateFunction(quantileTDigest, Float64)) " +
          "ENGINE = AggregatingMergeTree() ORDER BY k")
    }
    assert(err5.getMessage.contains("OPAQUE"))
    val err6 = intercept[IllegalArgumentException] {
      Graft.sql(spark,
        "CREATE TABLE bad6 (k Int64, " +
          "a SimpleAggregateFunction(anyLast, Int64)) " +
          "ENGINE = AggregatingMergeTree() ORDER BY k")
    }
    assert(err6.getMessage.contains("insertion order"))
    // no ENGINE clause → not ClickHouse DDL → untouched fallthrough
    spark.sql("DROP TABLE IF EXISTS plain_spark_graftsql")
    Graft.sql(spark,
      "CREATE TABLE plain_spark_graftsql (a INT) USING parquet")
    assert(spark.table("plain_spark_graftsql").schema.head.name == "a")
    spark.sql("DROP TABLE plain_spark_graftsql")
    assert(spark.conf.getOption("graft.final.plain_spark_graftsql").isEmpty)
  }

  test("operator-UX verbs: RENAME TABLE re-homes registrations, EXISTS, dictionary lifecycle") {
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("uxv_graftsql")
    assert(Graft.sql(spark, "EXISTS TABLE uxv_graftsql").collect()(0).getInt(0) == 1)
    assert(Graft.sql(spark, "EXISTS TABLE no_such_uxv").collect()(0).getInt(0) == 0)
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS uxdb CASCADE")
      spark.sql(s"CREATE DATABASE uxdb LOCATION '$root/uxdb.db'")
      Graft.sql(spark,
        "CREATE TABLE uxdb.t_ux (k Int64, v Int64) " +
          "ENGINE = ReplacingMergeTree(v) ORDER BY k")
      assert(spark.conf.get("graft.final.t_ux") == "k|v")
      Graft.sql(spark, "RENAME TABLE uxdb.t_ux TO uxdb.t_ux2")
      assert(spark.catalog.tableExists("uxdb.t_ux2"))
      assert(spark.conf.getOption("graft.final.t_ux").isEmpty &&
        spark.conf.get("graft.final.t_ux2") == "k|v",
        "RENAME must re-home the FINAL registration")
      spark.sql("DROP DATABASE uxdb CASCADE")
    }
    // dictionary lifecycle: register → reload answers OK (a true no-op:
    // graft dictionaries read the live source) → drop → dictGet refuses
    Seq((1L, "a")).toDF("k", "nm").createOrReplaceTempView("uxdict_src_graftsql")
    Graft.sql(spark,
      "CREATE DICTIONARY ux_dict (k Int64, nm String) PRIMARY KEY k " +
        "SOURCE(CLICKHOUSE(TABLE 'uxdict_src_graftsql')) LAYOUT(FLAT())")
    assert(Graft.sql(spark, "SYSTEM RELOAD DICTIONARIES")
      .collect()(0).getAs[Boolean]("ok"))
    Graft.sql(spark, "DROP DICTIONARY ux_dict")
    intercept[plans.Dialect.DialectException] {
      Graft.sql(spark, "SELECT dictGet('ux_dict', 'nm', k) FROM uxdict_src_graftsql")
    }
    Graft.sql(spark, "DROP DICTIONARY IF EXISTS ux_dict") // absent + IF EXISTS: ok
    intercept[IllegalArgumentException](Graft.sql(spark, "DROP DICTIONARY ux_dict"))
  }

  test("routed CREATE MATERIALIZED VIEW: MV-served ≡ direct, partials actually read") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS mvdb CASCADE")
      spark.sql(s"CREATE DATABASE mvdb LOCATION '$root/mvdb.db'")
      Graft.sql(spark, "CREATE TABLE mvdb.src (k Int64, tag String, " +
        "v Float64) ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "INSERT INTO mvdb.src VALUES " +
        "(1, 'a', 1.5), (1, 'a', 2.5), (2, 'b', 4.0)")
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW mvdb.mv ENGINE = SummingMergeTree()
          |ORDER BY (k, tag) POPULATE AS
          |SELECT k, tag, sum(v) AS sv, count() AS n
          |FROM mvdb.src GROUP BY k, tag""".stripMargin)
      // a further INSERT maintains the MV (insert-block trigger):
      // appended partials, no read-modify-write of the standing rows
      Graft.sql(spark, "INSERT INTO mvdb.src VALUES (1, 'a', 10.0), (3, 'c', 7.0)")
      val served = Graft.sql(spark,
        "SELECT k, tag, sv, n FROM mvdb.mv FINAL ORDER BY k, tag")
      val direct = spark.sql("SELECT k, tag, sum(v) AS sv, count(*) AS n " +
        "FROM mvdb.src GROUP BY k, tag ORDER BY k, tag")
      assert(served.collect().toSeq.map(_.toString) ==
        direct.collect().toSeq.map(_.toString),
        "MV-served answer must equal the direct aggregate over raw rows")
      // the partials are ACTUALLY read: the served plan scans mv, not src
      val plan = served.queryExecution.optimizedPlan.toString
      assert(plan.contains("mvdb.db/mv") || plan.contains("spark_catalog.mvdb.mv"),
        s"served plan must read the MV partials:\n$plan")
      assert(!plan.contains("mvdb.db/src") && !plan.contains("spark_catalog.mvdb.src"),
        s"served plan must NOT read the source rows:\n$plan")
      // the MV holds >1 partial row for the twice-inserted key (the
      // SummingMergeTree parts contract: equal keys coexist until FINAL)
      assert(spark.table("mvdb.mv").filter("k = 1 AND tag = 'a'").count() == 2)
      // DROP TABLE unregisters the maintenance: a later INSERT into the
      // source must not try to append into the dropped MV
      Graft.sql(spark, "DROP TABLE mvdb.mv")
      assert(spark.conf.getOption("graft.mv.mv").isEmpty)
      Graft.sql(spark, "INSERT INTO mvdb.src VALUES (9, 'z', 0.5)")
      assert(spark.table("mvdb.src").filter("k = 9").count() == 1)
      spark.sql("DROP DATABASE mvdb CASCADE")
    }
  }

  test("CREATE MATERIALIZED VIEW refusals are actionable") {
    import spark.implicits._
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("mvsrc_graftsql")
    def err(sql: String): String =
      intercept[IllegalArgumentException](Graft.sql(spark, sql)).getMessage
    assert(err("CREATE MATERIALIZED VIEW mv_bad1 ENGINE = CollapsingMergeTree() " +
      "ORDER BY k AS SELECT k, sum(v) AS sv FROM mvsrc_graftsql GROUP BY k")
      .contains("SummingMergeTree"))
    assert(err("CREATE MATERIALIZED VIEW mv_bad2 TO other_table AS " +
      "SELECT k, sum(v) AS sv FROM mvsrc_graftsql GROUP BY k")
      .contains("TO"))
    assert(err("CREATE MATERIALIZED VIEW mv_bad3 ENGINE = SummingMergeTree() " +
      "ORDER BY k AS SELECT k, avg(v) AS av FROM mvsrc_graftsql GROUP BY k")
      .contains("not summable") || err("CREATE MATERIALIZED VIEW mv_bad3 " +
      "ENGINE = SummingMergeTree() ORDER BY k AS SELECT k, avg(v) AS av " +
      "FROM mvsrc_graftsql GROUP BY k").contains("avg"))
    // a JOIN routes (r15) — but only to a RESOLVABLE dim, only
    // INNER/LEFT, and only ONE of them
    assert(err("CREATE MATERIALIZED VIEW mv_bad4 ENGINE = SummingMergeTree() " +
      "ORDER BY k AS SELECT k, sum(v) AS sv FROM mvsrc_graftsql " +
      "JOIN no_such_t2 ON mvsrc_graftsql.k = no_such_t2.k GROUP BY k")
      .contains("not resolvable"))
    Seq((1L, "x")).toDF("k", "nm").createOrReplaceTempView("mvdim_graftsql")
    assert(err("CREATE MATERIALIZED VIEW mv_bad4b ENGINE = SummingMergeTree() " +
      "ORDER BY k AS SELECT k, sum(v) AS sv FROM mvsrc_graftsql " +
      "RIGHT JOIN mvdim_graftsql ON mvsrc_graftsql.k = mvdim_graftsql.k " +
      "GROUP BY k").contains("DIMENSION"))
    assert(err("CREATE MATERIALIZED VIEW mv_bad4c ENGINE = SummingMergeTree() " +
      "ORDER BY k AS SELECT k, sum(v) AS sv FROM mvsrc_graftsql " +
      "JOIN mvdim_graftsql ON mvsrc_graftsql.k = mvdim_graftsql.k " +
      "JOIN mvdim_graftsql ON mvsrc_graftsql.k = mvdim_graftsql.k " +
      "GROUP BY k").contains("ONE broadcast-dim"))
    assert(err("CREATE MATERIALIZED VIEW mv_bad5 ENGINE = SummingMergeTree() " +
      "ORDER BY wrongkey AS SELECT k, sum(v) AS sv FROM mvsrc_graftsql " +
      "GROUP BY k").contains("ORDER BY"))
    // min/max partials under a SUMMING merge would silently become
    // sums of minima — refused with the right engine named
    assert(err("CREATE MATERIALIZED VIEW mv_bad6 ENGINE = SummingMergeTree() " +
      "ORDER BY k AS SELECT k, min(v) AS lo FROM mvsrc_graftsql GROUP BY k")
      .contains("AggregatingMergeTree"))
  }

  test("AggregateFunction state columns: sum/min/max/count/avg merge exactly") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS stdb CASCADE")
      spark.sql(s"CREATE DATABASE stdb LOCATION '$root/stdb.db'")
      spark.sql("SELECT 'a' AS g, 1.0D AS v UNION ALL SELECT 'a', 2.0D " +
        "UNION ALL SELECT 'b', 10.0D").createOrReplaceTempView("stsrc1_gs")
      spark.sql("SELECT 'a' AS g, 3.0D AS v").createOrReplaceTempView("stsrc2_gs")
      Graft.sql(spark,
        """CREATE TABLE stdb.t (
          |  g String,
          |  sv AggregateFunction(sum, Float64),
          |  mn AggregateFunction(min, Float64),
          |  mx AggregateFunction(max, Float64),
          |  n AggregateFunction(count),
          |  av AggregateFunction(avg, Float64)
          |) ENGINE = AggregatingMergeTree() ORDER BY g""".stripMargin)
      Seq("stsrc1_gs", "stsrc2_gs").foreach { src =>
        Graft.sql(spark, s"INSERT INTO stdb.t SELECT g, sumState(v), " +
          s"minState(v), maxState(v), countState(), avgState(v) FROM $src " +
          "GROUP BY g")
      }
      // two "parts" in the table: one per insert batch for key a
      assert(spark.table("stdb.t").filter("g = 'a'").count() == 2)
      def merged(): Seq[String] = Graft.sql(spark,
        "SELECT g, sumMerge(sv) AS sv, minMerge(mn) AS mn, " +
          "maxMerge(mx) AS mx, countMerge(n) AS n, avgMerge(av) AS av " +
          "FROM stdb.t GROUP BY g ORDER BY g").collect().toSeq.map(_.toString)
      val expect = Seq("[a,6.0,1.0,3.0,3,2.0]", "[b,10.0,10.0,10.0,1,10.0]")
      assert(merged() == expect, merged())
      // FINAL collapses the pair field-wise; the *Merge reads after the
      // physical OPTIMIZE still serve the same exact answers (the state
      // columns round-trip through the stored schema)
      assert(Graft.sql(spark, "SELECT g, av.s AS s, av.c AS c FROM " +
        "stdb.t FINAL ORDER BY g").collect().toSeq.map(_.toString) ==
        Seq("[a,6.0,3]", "[b,10.0,1]"))
      Graft.sql(spark, "OPTIMIZE TABLE stdb.t FINAL")
      assert(spark.table("stdb.t").count() == 2)
      assert(merged() == expect, s"post-OPTIMIZE drift: ${merged()}")
      // routed drop — clears the simple-name registrations too
      Graft.sql(spark, "DROP TABLE stdb.t")
      spark.sql("DROP DATABASE stdb CASCADE")
    }
  }

  test("MV with broadcast-dim JOIN: per-batch row-local, dim read at insert time") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS mvjdb CASCADE")
      spark.sql(s"CREATE DATABASE mvjdb LOCATION '$root/mvjdb.db'")
      Graft.sql(spark, "CREATE TABLE mvjdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Seq((1L, "x"), (2L, "y")).toDF("k", "nm")
        .createOrReplaceTempView("dim_mvj_gs")
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW mvjdb.mv_j ENGINE = SummingMergeTree()
          |ORDER BY nm AS
          |SELECT nm, sum(v) AS sv, count() AS n
          |FROM mvjdb.src INNER JOIN dim_mvj_gs ON src.k = dim_mvj_gs.k
          |GROUP BY nm""".stripMargin)
      Graft.sql(spark, "INSERT INTO mvjdb.src VALUES (1, 1.0), (2, 2.0)")
      // the dim changes BETWEEN batches: the second batch joins the
      // NEW content (insert-time semantics — ClickHouse's MV joins
      // read the right side at insert time too)
      Seq((1L, "z"), (2L, "y")).toDF("k", "nm")
        .createOrReplaceTempView("dim_mvj_gs")
      Graft.sql(spark, "INSERT INTO mvjdb.src VALUES (1, 5.0)")
      val served = Graft.sql(spark,
        "SELECT nm, sv, n FROM mvjdb.mv_j FINAL ORDER BY nm")
        .collect().toSeq.map(_.toString)
      assert(served == Seq("[x,1.0,1]", "[y,2.0,1]", "[z,5.0,1]"), served)
      // POPULATE runs the same join over the standing source content
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW mvjdb.mv_j2 ENGINE = SummingMergeTree()
          |ORDER BY nm POPULATE AS
          |SELECT nm, sum(v) AS sv, count() AS n
          |FROM mvjdb.src INNER JOIN dim_mvj_gs ON src.k = dim_mvj_gs.k
          |GROUP BY nm""".stripMargin)
      val pop = Graft.sql(spark,
        "SELECT nm, sv, n FROM mvjdb.mv_j2 FINAL ORDER BY nm")
        .collect().toSeq.map(_.toString)
      assert(pop == Seq("[y,2.0,1]", "[z,6.0,2]"), pop)
      // the TO form composes with the join: the target's DDL declares
      // the collapse, the MV adds only the JOINED trigger (and no
      // POPULATE — only post-create batches land)
      Graft.sql(spark, "CREATE TABLE mvjdb.tgt (nm String, sv Float64, " +
        "n Int64) ENGINE = SummingMergeTree() ORDER BY nm")
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW mvjdb.mv_j3 TO mvjdb.tgt AS
          |SELECT nm, sum(v) AS sv, count() AS n
          |FROM mvjdb.src INNER JOIN dim_mvj_gs ON src.k = dim_mvj_gs.k
          |GROUP BY nm""".stripMargin)
      Graft.sql(spark, "INSERT INTO mvjdb.src VALUES (2, 0.5)")
      assert(Graft.sql(spark,
        "SELECT nm, sv, n FROM mvjdb.tgt FINAL ORDER BY nm")
        .collect().toSeq.map(_.toString) == Seq("[y,0.5,1]"))
      Graft.sql(spark, "DROP TABLE mvjdb.mv_j3")
      assert(spark.catalog.tableExists("mvjdb.tgt"))
      Graft.sql(spark, "DROP TABLE mvjdb.tgt")
      Graft.sql(spark, "DROP TABLE mvjdb.mv_j")
      Graft.sql(spark, "DROP TABLE mvjdb.mv_j2")
      Graft.sql(spark, "DROP TABLE mvjdb.src")
      spark.sql("DROP DATABASE mvjdb CASCADE")
    }
  }

  test("INSERT OVERWRITE into an MV-fed table refuses — stale partials never silently survive") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS ovdb CASCADE")
      spark.sql(s"CREATE DATABASE ovdb LOCATION '$root/ovdb.db'")
      Graft.sql(spark, "CREATE TABLE ovdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW ovdb.mv " +
        "ENGINE = SummingMergeTree() ORDER BY k AS " +
        "SELECT k, sum(v) AS sv FROM ovdb.src GROUP BY k")
      val err = intercept[IllegalArgumentException](Graft.sql(spark,
        "INSERT OVERWRITE ovdb.src SELECT 1, 2.0")).getMessage
      assert(err.contains("invalidate"))
      Graft.sql(spark, "DROP TABLE ovdb.mv")
      spark.sql("DROP DATABASE ovdb CASCADE")
    }
  }

  test("table TTL DELETE routes: registered at CREATE, expired at OPTIMIZE FINAL") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS ttldb CASCADE")
      spark.sql(s"CREATE DATABASE ttldb LOCATION '$root/ttldb.db'")
      Graft.sql(spark, "CREATE TABLE ttldb.t (k Int64, ts DateTime, " +
        "v Float64) ENGINE = MergeTree ORDER BY k " +
        "TTL ts + INTERVAL 30 DAY DELETE")
      assert(spark.conf.get("graft.ttl.t") == "ts|30|DAY")
      // SHOW CREATE carries the TTL clause (part of the stored DDL)
      assert(Graft.sql(spark, "SHOW CREATE TABLE ttldb.t")
        .head.getString(0).contains("TTL ts + INTERVAL 30 DAY DELETE"))
      // anchor = max(ts): rows 40 and 31 days older than the newest
      // expire at OPTIMIZE FINAL; 29 days and the anchor itself stay;
      // a NULL timestamp never expires (ClickHouse's reading)
      Graft.sql(spark, "INSERT INTO ttldb.t VALUES " +
        "(1, timestamp'2024-03-01 00:00:00', 1.0), " +
        "(2, timestamp'2024-01-21 00:00:00', 2.0), " +  // 40 d old → expires
        "(3, timestamp'2024-01-30 00:00:00', 3.0), " +  // 31 d old → expires
        "(4, timestamp'2024-02-01 00:00:00', 4.0), " +  // 29 d old → stays
        "(5, CAST(NULL AS TIMESTAMP), 5.0)")
      // TTL is merge-time semantics: rows remain visible UNTIL the
      // explicit merge (ClickHouse behaves the same between merges)
      assert(spark.table("ttldb.t").count() == 5)
      val rep = Graft.sql(spark, "OPTIMIZE TABLE ttldb.t FINAL").head
      assert(rep.getAs[Long]("rows_before") == 5 &&
        rep.getAs[Long]("rows_after") == 3, rep.toString)
      assert(spark.table("ttldb.t").select("k").collect().map(_.getLong(0))
        .sorted.toSeq == Seq(1L, 4L, 5L))
      // a second OPTIMIZE is a fixpoint (the anchor did not move)
      Graft.sql(spark, "OPTIMIZE TABLE ttldb.t FINAL")
      assert(spark.table("ttldb.t").count() == 3)
      // MODIFY TTL tightens retention on the LIVE table: the 29-day
      // row now falls outside a 7-day window and expires at the next
      // OPTIMIZE; SHOW CREATE serves the REWRITTEN clause
      Graft.sql(spark, "ALTER TABLE ttldb.t MODIFY TTL ts + INTERVAL 7 DAY")
      assert(spark.conf.get("graft.ttl.t") == "ts|7|DAY")
      val shown = Graft.sql(spark, "SHOW CREATE TABLE ttldb.t")
        .head.getString(0)
      assert(shown.contains("TTL ts + INTERVAL 7 DAY DELETE") &&
        !shown.contains("30 DAY"), shown)
      Graft.sql(spark, "OPTIMIZE TABLE ttldb.t FINAL")
      assert(spark.table("ttldb.t").select("k").collect().map(_.getLong(0))
        .sorted.toSeq == Seq(1L, 5L))
      // REMOVE TTL stops expiry and strips the clause from SHOW CREATE
      Graft.sql(spark, "ALTER TABLE ttldb.t REMOVE TTL")
      assert(spark.conf.getOption("graft.ttl.t").isEmpty)
      assert(!Graft.sql(spark, "SHOW CREATE TABLE ttldb.t")
        .head.getString(0).contains("TTL ts"))
      // MODIFY can also ADD a TTL to a table created without one (the
      // canonical retrofit), and the registration re-homes on RENAME
      Graft.sql(spark, "ALTER TABLE ttldb.t MODIFY TTL ts + INTERVAL 30 DAY DELETE")
      assert(spark.conf.get("graft.ttl.t") == "ts|30|DAY")
      assert(Graft.sql(spark, "SHOW CREATE TABLE ttldb.t")
        .head.getString(0).endsWith("TTL ts + INTERVAL 30 DAY DELETE"))
      Graft.sql(spark, "RENAME TABLE ttldb.t TO ttldb.t_rn")
      assert(spark.conf.getOption("graft.ttl.t").isEmpty &&
        spark.conf.get("graft.ttl.t_rn") == "ts|30|DAY")
      // MODIFY refusals keep the CREATE-time contract
      intercept[IllegalArgumentException](Graft.sql(spark,
        "ALTER TABLE ttldb.t_rn MODIFY TTL ts + INTERVAL 3 MONTH"))
      intercept[IllegalArgumentException](Graft.sql(spark,
        "ALTER TABLE ttldb.t_rn MODIFY TTL k + INTERVAL 1 DAY"))
      // DROP clears the TTL registration with the rest
      Graft.sql(spark, "DROP TABLE ttldb.t_rn")
      assert(spark.conf.getOption("graft.ttl.t_rn").isEmpty)
      spark.sql("DROP DATABASE ttldb CASCADE")
    }
    def err(sql: String): String =
      intercept[IllegalArgumentException](Graft.sql(spark, sql)).getMessage
    // non-DELETE TTL shapes refuse by name: tiering, rollups,
    // calendar-unit arithmetic, non-time columns
    assert(err("CREATE TABLE ttl_bad1 (k Int64, ts DateTime) " +
      "ENGINE = MergeTree ORDER BY k TTL ts + INTERVAL 1 DAY " +
      "TO VOLUME 'cold'").contains("TTL"))
    assert(err("CREATE TABLE ttl_bad3 (k Int64, ts DateTime) " +
      "ENGINE = MergeTree ORDER BY k TTL ts + INTERVAL 3 MONTH DELETE")
      .contains("calendar"))
    assert(err("CREATE TABLE ttl_bad4 (k Int64, ts DateTime) " +
      "ENGINE = MergeTree ORDER BY k TTL k + INTERVAL 1 DAY")
      .contains("Date/DateTime"))
    // column-level TTL stays the named refusal
    assert(err("CREATE TABLE ttl_bad2 (k Int64, " +
      "v Float64 TTL k + INTERVAL 1 DAY) ENGINE = MergeTree ORDER BY k")
      .contains("TTL"))
    // no failing statement left a table or registration behind
    assert(!spark.catalog.tableExists("ttl_bad1") &&
      !spark.catalog.tableExists("ttl_bad2"))
    assert(spark.conf.getOption("graft.orderby.ttl_bad1").isEmpty)
    assert(spark.conf.getOption("graft.ttl.ttl_bad1").isEmpty)
  }

  test("a failing CREATE TABLE leaves no stale registrations") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS regdb CASCADE")
      spark.sql(s"CREATE DATABASE regdb LOCATION '$root/regdb.db'")
      Graft.sql(spark, "CREATE TABLE regdb.t_reg (k Int64, v Int64) " +
        "ENGINE = ReplacingMergeTree(v) ORDER BY k")
      // second CREATE without IF NOT EXISTS fails at the Spark DDL —
      // and must not have overwritten the existing registration with
      // different metadata (r12 ADVICE: registrations ran pre-CREATE)
      intercept[Exception](Graft.sql(spark,
        "CREATE TABLE regdb.t_reg (k2 Int64, v2 Int64) " +
          "ENGINE = ReplacingMergeTree(v2) ORDER BY k2 SAMPLE BY k2"))
      assert(spark.conf.get("graft.final.t_reg") == "k|v",
        "a failed CREATE must not clobber the live registration")
      assert(spark.conf.getOption("graft.sample.t_reg").isEmpty,
        "a failed CREATE must not register a sample key")
      spark.sql("DROP DATABASE regdb CASCADE")
    }
  }

  test("RENAME TABLE re-homes dictionary SOURCES that name the renamed table") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS rndb CASCADE")
      spark.sql(s"CREATE DATABASE rndb LOCATION '$root/rndb.db'")
      Graft.sql(spark, "CREATE TABLE rndb.dim_src (k Int64, nm String) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "INSERT INTO rndb.dim_src VALUES (1, 'one'), (2, 'two')")
      Graft.sql(spark, "CREATE DICTIONARY rn_dict (k Int64, " +
        "nm String DEFAULT 'NONE') PRIMARY KEY k " +
        "SOURCE(CLICKHOUSE(TABLE 'rndb.dim_src')) LAYOUT(FLAT())")
      Graft.sql(spark, "RENAME TABLE rndb.dim_src TO rndb.dim_moved")
      // the dictionary's encoded source followed the rename (r12
      // ADVICE: it kept the old name — erroring, or silently reading a
      // DIFFERENT relation if that name is reused)
      assert(spark.conf.get("graft.dict.rn_dict").startsWith("rndb.dim_moved|"))
      Seq((1L, 0)).toDF("k", "z").createOrReplaceTempView("rn_probe_graftsql")
      val got = Graft.sql(spark,
        "SELECT dictGet('rn_dict', 'nm', k) AS nm FROM rn_probe_graftsql")
        .collect()(0).getString(0)
      assert(got == "one")
      Graft.sql(spark, "DROP DICTIONARY rn_dict")
      spark.sql("DROP DATABASE rndb CASCADE")
    }
  }

  test("system.tables joins a db-qualified snapshot onto its catalog row (one row)") {
    import spark.implicits._
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS sysdb CASCADE")
      spark.sql(s"CREATE DATABASE sysdb LOCATION '$root/sysdb.db'")
      events().limit(100).write.saveAsTable("sysdb.ev_syscat")
      // BACKUP DATABASE registers under `db.t`; the catalog lists the
      // simple name — r12 ADVICE: the mismatch split ONE table into
      // two rows (one with no snapshot, one not marked catalog)
      Graft.sql(spark, s"BACKUP TABLE sysdb.ev_syscat TO '$root/snap'")
      val rows = operators.SystemCatalog.tables(spark)
        .filter($"name" === "ev_syscat").collect()
      assert(rows.length == 1, s"expected ONE joined row, got ${rows.length}")
      assert(rows(0).getAs[String]("snapshot_dest") == s"$root/snap")
      assert(rows(0).getAs[Long]("total_rows") == 100L)
      spark.conf.unset("graft.snapshot.sysdb.ev_syscat")
      spark.sql("DROP DATABASE sysdb CASCADE")
    }
  }

  test("system.tables keeps an attached registration sharing a backed-up dest") {
    import spark.implicits._
    withRoot { root =>
      // The documented attach path: `SET graft.snapshot.<name> = <dir>`
      // over a directory some OTHER registration already points at.
      // The r14 orphan suppression keyed on dest VALUE, so while the
      // backed-up view was live in the session the attached name
      // silently vanished from the listing (the q_sql_system_tables
      // 0-row failure on a fresh staging).
      events().limit(25).createOrReplaceTempView("ev_attach_src")
      Graft.sql(spark, s"BACKUP TABLE ev_attach_src TO '$root/snap'")
      spark.conf.set("graft.snapshot.ev_attach_alias", s"$root/snap")
      val rows = operators.SystemCatalog.tables(spark)
        .filter($"name".isin("ev_attach_src", "ev_attach_alias"))
        .orderBy("name").collect()
      assert(rows.length == 2, s"both names must list: ${rows.toSeq}")
      assert(rows.forall(_.getAs[String]("snapshot_dest") == s"$root/snap"))
      assert(rows.forall(_.getAs[Long]("total_rows") == 25L))
      spark.conf.unset("graft.snapshot.ev_attach_src")
      spark.conf.unset("graft.snapshot.ev_attach_alias")
      spark.catalog.dropTempView("ev_attach_src")
    }
  }

  test("system.tables keeps same-named tables in different databases apart") {
    import spark.implicits._
    withRoot { root =>
      Seq("sysdba", "sysdbb").foreach { db =>
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
        spark.sql(s"CREATE DATABASE $db LOCATION '$root/$db.db'")
        events().limit(10).write.saveAsTable(s"$db.ev_dup")
      }
      Graft.sql(spark, s"BACKUP TABLE sysdba.ev_dup TO '$root/snap_a'")
      val rows = operators.SystemCatalog.tables(spark)
        .filter($"name" === "ev_dup").orderBy("database").collect()
      // r13 ADVICE: the simple-name join merged these into one row
      assert(rows.length == 2, s"two databases → two rows: ${rows.toSeq}")
      assert(rows(0).getAs[String]("database") == "sysdba" &&
        rows(0).getAs[String]("snapshot_dest") == s"$root/snap_a")
      assert(rows(1).getAs[String]("database") == "sysdbb" &&
        rows(1).getAs[String]("snapshot_dest") == null)
      spark.conf.unset("graft.snapshot.sysdba.ev_dup")
      Seq("sysdba", "sysdbb").foreach(db =>
        spark.sql(s"DROP DATABASE $db CASCADE"))
    }
  }

  test("INSERT INTO db2.t does not trigger an MV registered over db1.t") {
    withRoot { root =>
      Seq("mvda", "mvdb").foreach { db =>
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
        spark.sql(s"CREATE DATABASE $db LOCATION '$root/$db.db'")
        Graft.sql(spark, s"CREATE TABLE $db.evsrc (k Int64, v Float64) " +
          "ENGINE = MergeTree ORDER BY k")
      }
      Graft.sql(spark, "CREATE MATERIALIZED VIEW mvda.mv_xdb " +
        "ENGINE = SummingMergeTree() ORDER BY k AS " +
        "SELECT k, sum(v) AS sv FROM mvda.evsrc GROUP BY k")
      // r13 ADVICE: the simple-name match fed db2 inserts into db1's MV
      Graft.sql(spark, "INSERT INTO mvdb.evsrc VALUES (1, 5.0)")
      assert(spark.table("mvda.mv_xdb").count() == 0,
        "a foreign database's insert must not append partials")
      Graft.sql(spark, "INSERT INTO mvda.evsrc VALUES (1, 2.0)")
      assert(spark.table("mvda.mv_xdb").count() == 1)
      Graft.sql(spark, "DROP TABLE mvda.mv_xdb")
      Seq("mvda", "mvdb").foreach(db =>
        spark.sql(s"DROP DATABASE $db CASCADE"))
    }
  }

  test("a failing DROP TABLE leaves the MV registrations standing") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS dropdb CASCADE")
      spark.sql(s"CREATE DATABASE dropdb LOCATION '$root/dropdb.db'")
      Graft.sql(spark, "CREATE TABLE dropdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW dropdb.mv_drop " +
        "ENGINE = SummingMergeTree() ORDER BY k AS " +
        "SELECT k, sum(v) AS sv FROM dropdb.src GROUP BY k")
      // conf keys are simple-named: DROP of a DIFFERENT db's same-named
      // table fails (no such table) — the registrations must survive
      // (r13 ADVICE: they were unset BEFORE the failing DROP ran)
      intercept[Exception](Graft.sql(spark, "DROP TABLE nosuchdb.mv_drop"))
      assert(spark.conf.getOption("graft.mv.mv_drop").isDefined,
        "failing DROP must not unregister the maintenance")
      assert(spark.conf.getOption("graft.sumfinal.mv_drop").isDefined)
      Graft.sql(spark, "INSERT INTO dropdb.src VALUES (1, 2.0)")
      assert(spark.table("dropdb.mv_drop").count() == 1,
        "maintenance must still run after the failed DROP")
      Graft.sql(spark, "DROP TABLE dropdb.mv_drop")
      assert(spark.conf.getOption("graft.mv.mv_drop").isEmpty)
      spark.sql("DROP DATABASE dropdb CASCADE")
    }
  }

  test("MV insert batch evaluates ONCE: rand() and self-reference land identical rows") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS ckptdb CASCADE")
      spark.sql(s"CREATE DATABASE ckptdb LOCATION '$root/ckptdb.db'")
      Graft.sql(spark, "CREATE TABLE ckptdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW ckptdb.mv_ckpt " +
        "ENGINE = SummingMergeTree() ORDER BY k AS " +
        "SELECT k, sum(v) AS sv FROM ckptdb.src GROUP BY k")
      // non-deterministic batch: with per-sink re-evaluation (r13) the
      // MV would aggregate a DIFFERENT rand() draw than the table got
      Graft.sql(spark,
        "INSERT INTO ckptdb.src SELECT id, rand() FROM range(64)")
      def tableSum: Double =
        spark.table("ckptdb.src").agg(sum("v")).head.getDouble(0)
      def mvSum: Double = Graft.sql(spark,
        "SELECT sum(sv) AS t FROM ckptdb.mv_ckpt").head.getDouble(0)
      assert(math.abs(tableSum - mvSum) < 1e-9,
        s"table $tableSum vs MV $mvSum — the batch must evaluate once")
      // self-referencing insert: the batch pins BEFORE the append, so
      // the MV partials aggregate the PRE-insert snapshot, never the
      // just-appended rows (re-read would double-count → 3× total)
      Graft.sql(spark, "INSERT INTO ckptdb.src SELECT k, v FROM ckptdb.src")
      assert(math.abs(tableSum - mvSum) < 1e-9,
        s"self-referencing insert diverged: table $tableSum vs MV $mvSum")
      Graft.sql(spark, "DROP TABLE ckptdb.mv_ckpt")
      spark.sql("DROP DATABASE ckptdb CASCADE")
    }
  }

  test("TO-form MV: partials land in the target; DROP removes only the trigger") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS todb CASCADE")
      spark.sql(s"CREATE DATABASE todb LOCATION '$root/todb.db'")
      Graft.sql(spark, "CREATE TABLE todb.src (k Int64, tag String, " +
        "v Float64) ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE TABLE todb.tgt (k Int64, tag String, " +
        "sv Float64, n Int64) ENGINE = SummingMergeTree() ORDER BY (k, tag)")
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW todb.mv_to TO todb.tgt AS
          |SELECT k, tag, sum(v) AS sv, count() AS n
          |FROM todb.src GROUP BY k, tag""".stripMargin)
      Graft.sql(spark, "INSERT INTO todb.src VALUES " +
        "(1, 'a', 1.5), (1, 'a', 2.5), (2, 'b', 4.0)")
      Graft.sql(spark, "INSERT INTO todb.src VALUES (1, 'a', 10.0)")
      val served = Graft.sql(spark,
        "SELECT k, tag, sv, n FROM todb.tgt FINAL ORDER BY k, tag")
      val direct = spark.sql("SELECT k, tag, sum(v) AS sv, count(*) AS n " +
        "FROM todb.src GROUP BY k, tag ORDER BY k, tag")
      assert(served.collect().toSeq.map(_.toString) ==
        direct.collect().toSeq.map(_.toString))
      // two insert batches → the twice-hit key holds 2 partial rows
      assert(spark.table("todb.tgt").filter("k = 1 AND tag = 'a'").count() == 2)
      // the MV object is a readable view over the target's partials
      assert(spark.sql("SELECT count(*) FROM todb.mv_to").head.getLong(0) ==
        spark.table("todb.tgt").count())
      // DROP removes the view + trigger; the target TABLE and its
      // collapse registration survive (ClickHouse's TO semantics)
      Graft.sql(spark, "DROP TABLE todb.mv_to")
      assert(spark.conf.getOption("graft.mv.mv_to").isEmpty)
      assert(spark.conf.getOption("graft.sumfinal.tgt").isDefined,
        "the target's own registration must survive the MV drop")
      assert(spark.catalog.tableExists("todb.tgt"))
      assert(!spark.catalog.tableExists("todb.mv_to"))
      Graft.sql(spark, "INSERT INTO todb.src VALUES (9, 'z', 1.0)")
      assert(spark.table("todb.tgt").filter("k = 9").count() == 0,
        "dropped trigger must stop maintaining the target")
      // still a valid FINAL read after the drop
      assert(Graft.sql(spark, "SELECT sum(n) AS t FROM todb.tgt FINAL")
        .head.getLong(0) == 4L)
      spark.sql("DROP DATABASE todb CASCADE")
    }
  }

  test("DROP VIEW routes the TO-form MV drop; cross-db same-simple-name TO classifies as TO-form") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS dvdb CASCADE")
      spark.sql("DROP DATABASE IF EXISTS dvdb2 CASCADE")
      spark.sql(s"CREATE DATABASE dvdb LOCATION '$root/dvdb.db'")
      spark.sql(s"CREATE DATABASE dvdb2 LOCATION '$root/dvdb2.db'")
      Graft.sql(spark, "CREATE TABLE dvdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE TABLE dvdb.tgt (k Int64, sv Float64) " +
        "ENGINE = SummingMergeTree() ORDER BY k")
      Graft.sql(spark,
        "CREATE MATERIALIZED VIEW dvdb.mv_dv TO dvdb.tgt AS " +
          "SELECT k, sum(v) AS sv FROM dvdb.src GROUP BY k")
      Graft.sql(spark, "INSERT INTO dvdb.src VALUES (1, 2.0)")
      assert(spark.table("dvdb.tgt").count() == 1)
      // the user's NATURAL spelling — the MV object IS a view. Before
      // the r14 ADVICE fix this fell through to Spark, dropped the
      // view, and left the trigger silently appending partials.
      Graft.sql(spark, "DROP VIEW dvdb.mv_dv")
      assert(!spark.catalog.tableExists("dvdb.mv_dv"))
      assert(spark.conf.getOption("graft.mv.mv_dv").isEmpty,
        "DROP VIEW must unregister the trigger with the view")
      Graft.sql(spark, "INSERT INTO dvdb.src VALUES (9, 9.0)")
      assert(spark.table("dvdb.tgt").filter("k = 9").count() == 0,
        "a dropped MV must stop maintaining the target")
      // DROP VIEW on a TABLE-backed MV name fails in Spark ("not a
      // view") and the registration survives — the mirror guarantee
      Graft.sql(spark,
        "CREATE MATERIALIZED VIEW dvdb.mv_tb ENGINE = SummingMergeTree() " +
          "ORDER BY k AS SELECT k, sum(v) AS sv FROM dvdb.src GROUP BY k")
      intercept[Exception](Graft.sql(spark, "DROP VIEW dvdb.mv_tb"))
      assert(spark.conf.getOption("graft.mv.mv_tb").isDefined)
      Graft.sql(spark, "DROP TABLE dvdb.mv_tb")
      // cross-db TO with the SAME simple name on view and target (r14
      // ADVICE #4): the explicit toForm marker classifies the DROP —
      // simple-name inequality called this table-backed and errored
      Graft.sql(spark, "CREATE TABLE dvdb2.stats (k Int64, sv Float64) " +
        "ENGINE = SummingMergeTree() ORDER BY k")
      Graft.sql(spark,
        "CREATE MATERIALIZED VIEW dvdb.stats TO dvdb2.stats AS " +
          "SELECT k, sum(v) AS sv FROM dvdb.src GROUP BY k")
      Graft.sql(spark, "DROP TABLE dvdb.stats")
      assert(spark.conf.getOption("graft.mv.stats").isEmpty)
      assert(spark.catalog.tableExists("dvdb2.stats"),
        "the TO target must survive the view drop")
      assert(spark.conf.getOption("graft.sumfinal.stats").isDefined)
      spark.sql("DROP DATABASE dvdb CASCADE")
      spark.sql("DROP DATABASE dvdb2 CASCADE")
    }
  }

  test("TO-form MV refusals are actionable") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS tordb CASCADE")
      spark.sql(s"CREATE DATABASE tordb LOCATION '$root/tordb.db'")
      Graft.sql(spark, "CREATE TABLE tordb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE TABLE tordb.tgt (k Int64, sv Float64) " +
        "ENGINE = SummingMergeTree() ORDER BY k")
      def err(sql: String): String =
        intercept[IllegalArgumentException](Graft.sql(spark, sql)).getMessage
      assert(err("CREATE MATERIALIZED VIEW tordb.m1 TO tordb.nope AS " +
        "SELECT k, sum(v) AS sv FROM tordb.src GROUP BY k")
        .contains("does not exist"))
      // a plain (unregistered-engine) target cannot collapse partials
      spark.sql(s"CREATE TABLE tordb.plain (k BIGINT, sv DOUBLE) USING parquet")
      assert(err("CREATE MATERIALIZED VIEW tordb.m2 TO tordb.plain AS " +
        "SELECT k, sum(v) AS sv FROM tordb.src GROUP BY k")
        .contains("no Summing/AggregatingMergeTree registration"))
      // POPULATE is refused on TO (ClickHouse refuses it too)
      assert(err("CREATE MATERIALIZED VIEW tordb.m3 TO tordb.tgt POPULATE AS " +
        "SELECT k, sum(v) AS sv FROM tordb.src GROUP BY k")
        .contains("POPULATE") || err("CREATE MATERIALIZED VIEW tordb.m3 " +
        "TO tordb.tgt POPULATE AS SELECT k, sum(v) AS sv FROM tordb.src " +
        "GROUP BY k").contains("NOTHING between"))
      // schema order mismatch names the contract
      Graft.sql(spark, "CREATE TABLE tordb.tgt2 (sv Float64, k Int64) " +
        "ENGINE = SummingMergeTree() ORDER BY k")
      assert(err("CREATE MATERIALIZED VIEW tordb.m4 TO tordb.tgt2 AS " +
        "SELECT k, sum(v) AS sv FROM tordb.src GROUP BY k")
        .contains("in order"))
      // a min partial under a SUMMING target refuses
      assert(err("CREATE MATERIALIZED VIEW tordb.m5 TO tordb.tgt AS " +
        "SELECT k, min(v) AS sv FROM tordb.src GROUP BY k")
        .contains("not summable"))
      spark.sql("DROP DATABASE tordb CASCADE")
    }
  }

  test("avg in an MV body serves Σsum/Σcount under FINAL; helpers never surface") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS avgdb CASCADE")
      spark.sql(s"CREATE DATABASE avgdb LOCATION '$root/avgdb.db'")
      Graft.sql(spark, "CREATE TABLE avgdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "INSERT INTO avgdb.src VALUES (1, 2.0), (1, 4.0), (2, 10.0)")
      Graft.sql(spark,
        """CREATE MATERIALIZED VIEW avgdb.mv_avg
          |ENGINE = AggregatingMergeTree() ORDER BY k POPULATE AS
          |SELECT k, avg(v) AS av, count() AS n
          |FROM avgdb.src GROUP BY k""".stripMargin)
      // a second batch shifts the mean — Σsum/Σcount must track the
      // TRUE mean over both batches (averaging the two batch means
      // would give a different, wrong number: key 1 batch means are 3.0
      // and 9.0 → naive 6.0, true (2+4+9)/3 = 5.0)
      Graft.sql(spark, "INSERT INTO avgdb.src VALUES (1, 9.0)")
      val served = Graft.sql(spark,
        "SELECT k, av, n FROM avgdb.mv_avg FINAL ORDER BY k").collect()
      assert(served.map(_.getDouble(1)).toSeq == Seq(5.0, 10.0), served.toSeq)
      assert(served.map(_.getLong(2)).toSeq == Seq(3L, 1L))
      // helper partials exist in the TABLE but never through FINAL
      assert(spark.table("avgdb.mv_avg").columns.toSeq ==
        Seq("k", "av__graft_sum", "av__graft_cnt", "n"))
      val finalCols = Graft.sql(spark,
        "SELECT * FROM avgdb.mv_avg FINAL").columns.toSeq
      assert(finalCols == Seq("k", "n", "av"),
        s"helpers must not surface through FINAL: $finalCols")
      // avg under a SUMMING MV refuses with the engine named
      val e = intercept[IllegalArgumentException](Graft.sql(spark,
        "CREATE MATERIALIZED VIEW avgdb.mv_avg2 ENGINE = SummingMergeTree() " +
          "ORDER BY k AS SELECT k, avg(v) AS av FROM avgdb.src GROUP BY k"))
      assert(e.getMessage.contains("AggregatingMergeTree"))
      Graft.sql(spark, "DROP TABLE avgdb.mv_avg")
      spark.sql("DROP DATABASE avgdb CASCADE")
    }
  }

  test("CollapsingMergeTree FINAL is one sign-net aggregate + net>0 filter") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS colldb CASCADE")
      spark.sql(s"CREATE DATABASE colldb LOCATION '$root/colldb.db'")
      Graft.sql(spark, "CREATE TABLE colldb.state (k Int64, sign Int8, " +
        "v Float64) ENGINE = CollapsingMergeTree(sign) ORDER BY k")
      Graft.sql(spark, "INSERT INTO colldb.state VALUES " +
        "(1, 1, 5.0), (1, -1, 5.0), (2, 1, 3.0), (2, 1, 4.0), (3, -1, 1.0)")
      val rows = Graft.sql(spark,
        "SELECT k, sign, v FROM colldb.state FINAL ORDER BY k").collect()
      // key 1 annuls (net 0), key 3 is a dangling cancel (net<0): gone;
      // key 2 nets +2 rows, value 7.0
      assert(rows.length == 1 && rows(0).getLong(0) == 2L &&
        rows(0).getLong(1) == 2L && rows(0).getDouble(2) == 7.0, rows.toSeq)
      // plan pin: ONE hash aggregate + the net filter — no window, no join
      val plan = Graft.sql(spark,
        "SELECT k, v FROM colldb.state FINAL").queryExecution
        .executedPlan.toString
      assert(plan.contains("HashAggregate"), plan)
      assert(!plan.contains("Window") && !plan.contains("Join"), plan)
      // non-numeric measure columns refuse at FINAL with the rule named
      Graft.sql(spark, "CREATE TABLE colldb.bad (k Int64, sign Int8, " +
        "tag String) ENGINE = CollapsingMergeTree(sign) ORDER BY k")
      val e = intercept[Exception](Graft.sql(spark,
        "SELECT k FROM colldb.bad FINAL"))
      assert(e.getMessage.contains("non-numeric"))
      spark.sql("DROP DATABASE colldb CASCADE")
    }
  }

  test("VersionedCollapsingMergeTree nets per (key, version); refusals name the contract") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS vcolldb CASCADE")
      spark.sql(s"CREATE DATABASE vcolldb LOCATION '$root/vcolldb.db'")
      Graft.sql(spark, "CREATE TABLE vcolldb.st (k Int64, ver Int64, " +
        "sign Int8, v Float64) " +
        "ENGINE = VersionedCollapsingMergeTree(sign, ver) ORDER BY k")
      // key 1: version 1 annuls, version 2 survives; an OUT-OF-ORDER
      // cancel at version 3 (no matching insert) must not eat version 2
      Graft.sql(spark, "INSERT INTO vcolldb.st VALUES " +
        "(1, 1, 1, 5.0), (1, 1, -1, 5.0), (1, 2, 1, 7.0), (1, 3, -1, 9.0)")
      val rows = Graft.sql(spark,
        "SELECT k, ver, sign, v FROM vcolldb.st FINAL ORDER BY k, ver")
        .collect()
      assert(rows.length == 1 && rows(0).getLong(1) == 2L &&
        rows(0).getDouble(3) == 7.0, rows.toSeq)
      def err(sql: String): String =
        intercept[IllegalArgumentException](Graft.sql(spark, sql)).getMessage
      assert(err("CREATE TABLE vcolldb.bad (k Int64, sign Int8) " +
        "ENGINE = VersionedCollapsingMergeTree(sign) ORDER BY k")
        .contains("sign and version"))
      assert(err("CREATE TABLE vcolldb.bad2 (k Int64, sign Int8, v Float64) " +
        "ENGINE = VersionedCollapsingMergeTree(sign, nope) ORDER BY k")
        .contains("not among"))
      spark.sql("DROP DATABASE vcolldb CASCADE")
    }
  }

  test("AggregateFunction(uniq): sketch partials merge to the exact fixture count") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS uniqdb CASCADE")
      spark.sql(s"CREATE DATABASE uniqdb LOCATION '$root/uniqdb.db'")
      Graft.sql(spark, "CREATE TABLE uniqdb.st (g String, " +
        "u AggregateFunction(uniq, Int64)) " +
        "ENGINE = AggregatingMergeTree() ORDER BY g")
      events().limit(400).createOrReplaceTempView("ev_uniq_graftsql")
      // two half-batches → two sketch partial rows per group
      Seq(0, 1).foreach { p =>
        Graft.sql(spark, "INSERT INTO uniqdb.st SELECT event_type, " +
          s"uniqState(user_id) FROM ev_uniq_graftsql " +
          s"WHERE event_id % 2 = $p GROUP BY event_type")
      }
      val merged = Graft.sql(spark,
        "SELECT g, uniqMerge(u) AS nu FROM uniqdb.st GROUP BY g ORDER BY g")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = spark.sql("SELECT event_type, count(DISTINCT user_id) " +
        "FROM ev_uniq_graftsql GROUP BY event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // HLL (lgK=12) is exact at fixture cardinalities — and the merge
      // of the two half-sketches must equal the whole-set answer
      assert(merged == exact, s"merged $merged vs exact $exact")
      // FINAL merges the sketch COLUMN itself (state stays a sketch)
      assert(Graft.sql(spark,
        "SELECT g, uniqMerge(u) AS nu FROM uniqdb.st FINAL GROUP BY g " +
          "ORDER BY g").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
      spark.sql("DROP DATABASE uniqdb CASCADE")
    }
  }

  test("inline INSERT FORMAT forms route; unknown formats refuse BY NAME") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS fmtdb CASCADE")
      spark.sql(s"CREATE DATABASE fmtdb LOCATION '$root/fmtdb.db'")
      Graft.sql(spark, "CREATE TABLE fmtdb.t (k Int64, tag String, " +
        "v Float64) ENGINE = MergeTree ORDER BY k")
      // an MV on the table: FORMAT inserts must maintain it too
      Graft.sql(spark, "CREATE MATERIALIZED VIEW fmtdb.mv_fmt " +
        "ENGINE = SummingMergeTree() ORDER BY tag AS " +
        "SELECT tag, sum(v) AS sv FROM fmtdb.t GROUP BY tag")
      Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT Values (1, 'a', 1.5), (2, 'b', 2.5)")
      Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT JSONEachRow\n" +
          "{\"k\": 3, \"tag\": \"a\", \"v\": 0.5}\n{\"k\": 4, \"tag\": \"c\"}")
      Graft.sql(spark, "INSERT INTO fmtdb.t FORMAT CSV\n5,b,1.0\n6,a,2.0")
      Graft.sql(spark, "INSERT INTO fmtdb.t FORMAT TSV\n7\td\t4.0")
      Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT CSVWithNames\nk,tag,v\n8,e,0.5")
      assert(spark.table("fmtdb.t").count() == 8)
      // JSON's omitted column surfaced NULL
      assert(spark.table("fmtdb.t").filter("k = 4 AND v IS NULL").count() == 1)
      // the MV tracked every format's batch
      val mvServed = Graft.sql(spark,
        "SELECT tag, sv FROM fmtdb.mv_fmt FINAL ORDER BY tag").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(mvServed ==
        Map("a" -> 4.0, "b" -> 3.5, "d" -> 4.0, "e" -> 0.5), mvServed)
      val e = intercept[IllegalArgumentException](Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT Native  bytes"))
      assert(e.getMessage.contains("Native") &&
        e.getMessage.contains("JSONEachRow"))
      // malformed inline rows RAISE (FAILFAST, r14 ADVICE) — under the
      // readers' PERMISSIVE default a typo'd JSON line or a
      // wrong-typed CSV field silently inserted an all-NULL row where
      // ClickHouse rejects bad inline data
      intercept[Exception](Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT JSONEachRow\n{not json at all}"))
      intercept[Exception](Graft.sql(spark,
        "INSERT INTO fmtdb.t FORMAT CSV\nnot_a_number,b,1.0"))
      assert(spark.table("fmtdb.t").count() == 8,
        "a failed inline insert must land NOTHING")
      assert(spark.table("fmtdb.t").filter("tag IS NULL").count() == 0)
      Graft.sql(spark, "DROP TABLE fmtdb.mv_fmt")
      spark.sql("DROP DATABASE fmtdb CASCADE")
    }
  }

  test("CTAS registers engine metadata; EXCHANGE swaps tables with their registrations") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS ctasdb CASCADE")
      spark.sql(s"CREATE DATABASE ctasdb LOCATION '$root/ctasdb.db'")
      spark.sql("SELECT 1L AS k, 2L AS ver, 1.5D AS v " +
        "UNION ALL SELECT 1L, 5L, 9.5D UNION ALL SELECT 2L, 1L, 3.0D")
        .createOrReplaceTempView("ctas_src_graftsql")
      Graft.sql(spark,
        """CREATE TABLE ctasdb.t ENGINE = ReplacingMergeTree(ver)
          |ORDER BY k AS SELECT k, ver, v FROM ctas_src_graftsql""".stripMargin)
      // the registration rode along: FINAL keeps the latest version
      val rows = Graft.sql(spark,
        "SELECT k, ver, v FROM ctasdb.t FINAL ORDER BY k").collect()
        .toSeq.map(_.toString)
      assert(rows == Seq("[1,5,9.5]", "[2,1,3.0]"), rows)
      def err(sql: String): String =
        intercept[IllegalArgumentException](Graft.sql(spark, sql)).getMessage
      assert(err("CREATE TABLE ctasdb.bad ENGINE = AggregatingMergeTree() " +
        "ORDER BY k AS SELECT k, v FROM ctas_src_graftsql")
        .contains("explicit-columns"))
      assert(err("CREATE TABLE ctasdb.bad2 ENGINE = ReplacingMergeTree(nope) " +
        "ORDER BY k AS SELECT k, ver FROM ctas_src_graftsql")
        .contains("not among"))
      assert(err("CREATE TABLE ctasdb.bad3 ENGINE = MergeTree " +
        "ORDER BY wrong AS SELECT k FROM ctas_src_graftsql")
        .contains("not among"))
      // EXCHANGE: the FINAL registration follows its table to the new name
      Graft.sql(spark, "CREATE TABLE ctasdb.t2 ENGINE = MergeTree " +
        "ORDER BY k AS SELECT k, ver, v FROM ctas_src_graftsql WHERE k = 2")
      Graft.sql(spark, "EXCHANGE TABLES ctasdb.t AND ctasdb.t2")
      // t now holds t2's single row; t2 holds the versioned content AND
      // its ReplacingMergeTree registration
      assert(spark.table("ctasdb.t").count() == 1)
      assert(Graft.sql(spark,
        "SELECT k FROM ctasdb.t2 FINAL ORDER BY k").collect().length == 2)
      assert(spark.conf.get("graft.final.t2").startsWith("k|"))
      spark.sql("DROP DATABASE ctasdb CASCADE")
    }
  }

  test("EXCHANGE TABLES recovers a crashed swap from the catalog intermediate") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS xrdb CASCADE")
      spark.sql(s"CREATE DATABASE xrdb LOCATION '$root/xrdb.db'")
      def reset(): Unit = {
        Seq("a", "b", "a__graft_xchg").foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS xrdb.$t"))
        spark.sql("SELECT 1L AS k").write.saveAsTable("xrdb.a")
        spark.sql("SELECT 2L AS k UNION ALL SELECT 3L").write
          .saveAsTable("xrdb.b")
      }
      def counts(): (Long, Long) =
        (spark.table("xrdb.a").count(), spark.table("xrdb.b").count())
      // crash after rename 1 (a → tmp): the retry rolls BACK, then
      // redoes the full swap — post-state is the swapped state
      reset()
      Graft.sql(spark, "RENAME TABLE xrdb.a TO xrdb.a__graft_xchg")
      Graft.sql(spark, "EXCHANGE TABLES xrdb.a AND xrdb.b")
      assert(counts() == ((2L, 1L)), "recovered swap after rename 1")
      assert(!spark.catalog.tableExists("xrdb.a__graft_xchg"))
      // crash after rename 2 (b → a): a already holds the old b — the
      // retry rolls FORWARD with ONE rename (a second full swap here
      // would undo the crashed statement's intent)
      reset()
      Graft.sql(spark, "RENAME TABLE xrdb.a TO xrdb.a__graft_xchg")
      Graft.sql(spark, "RENAME TABLE xrdb.b TO xrdb.a")
      val r = Graft.sql(spark, "EXCHANGE TABLES xrdb.a AND xrdb.b")
      assert(r.head.getString(0).contains("roll-forward"))
      assert(counts() == ((2L, 1L)), "completed swap after rename 2")
      assert(!spark.catalog.tableExists("xrdb.a__graft_xchg"))
      // an unrecognizable layout (intermediate alongside BOTH tables)
      // refuses loudly instead of guessing
      reset()
      spark.sql("SELECT 9L AS k").write.saveAsTable("xrdb.a__graft_xchg")
      val e = intercept[IllegalStateException](
        Graft.sql(spark, "EXCHANGE TABLES xrdb.a AND xrdb.b"))
      assert(e.getMessage.contains("crash window"))
      spark.sql("DROP DATABASE xrdb CASCADE")
    }
  }

  test("SHOW CREATE TABLE returns routed DDL; rename rewrites it; fallthrough intact") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS scdb CASCADE")
      spark.sql(s"CREATE DATABASE scdb LOCATION '$root/scdb.db'")
      Graft.sql(spark, "CREATE TABLE scdb.sc_t (k Int64, ver Int64) " +
        "ENGINE = ReplacingMergeTree(ver) ORDER BY k")
      assert(Graft.sql(spark, "SHOW CREATE TABLE scdb.sc_t").head.getString(0) ==
        "CREATE TABLE scdb.sc_t (k Int64, ver Int64) " +
          "ENGINE = ReplacingMergeTree(ver) ORDER BY k")
      // RENAME rewrites the statement's own table name
      Graft.sql(spark, "RENAME TABLE scdb.sc_t TO scdb.sc_t2")
      assert(Graft.sql(spark, "SHOW CREATE TABLE scdb.sc_t2").head.getString(0)
        .startsWith("CREATE TABLE scdb.sc_t2 ("))
      // an unrouted table keeps Spark's own SHOW CREATE output
      spark.sql("CREATE TABLE scdb.plain_sc (a INT) USING parquet")
      assert(Graft.sql(spark, "SHOW CREATE TABLE scdb.plain_sc")
        .head.getString(0).contains("USING parquet"))
      // routed DROP TABLE clears the stored DDL and the FINAL/sample
      // registrations (r14 ADVICE): a later same-named table created
      // through plain Spark DDL must NOT inherit the stale ClickHouse
      // statement (or worse, the old collapse keys)
      Graft.sql(spark, "DROP TABLE scdb.sc_t2")
      assert(spark.conf.getOption("graft.ddl.sc_t2").isEmpty)
      assert(spark.conf.getOption("graft.final.sc_t2").isEmpty)
      spark.sql("CREATE TABLE scdb.sc_t2 (other INT) USING parquet")
      assert(Graft.sql(spark, "SHOW CREATE TABLE scdb.sc_t2")
        .head.getString(0).contains("USING parquet"),
        "a re-created plain table must serve Spark's own SHOW CREATE")
      spark.sql("DROP DATABASE scdb CASCADE")
    }
  }

  test("OPTIMIZE FINAL physically collapses partials; answers unchanged") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS optdb CASCADE")
      spark.sql(s"CREATE DATABASE optdb LOCATION '$root/optdb.db'")
      Graft.sql(spark, "CREATE TABLE optdb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW optdb.mv_opt " +
        "ENGINE = SummingMergeTree() ORDER BY k AS " +
        "SELECT k, sum(v) AS sv, count() AS n FROM optdb.src GROUP BY k")
      Graft.sql(spark, "INSERT INTO optdb.src VALUES (1, 2.0), (2, 3.0)")
      Graft.sql(spark, "INSERT INTO optdb.src VALUES (1, 5.0)")
      val beforeFinal = Graft.sql(spark,
        "SELECT k, sv, n FROM optdb.mv_opt FINAL ORDER BY k").collect().toSeq
      assert(spark.table("optdb.mv_opt").count() == 3) // 2 partials for k=1
      val rep = Graft.sql(spark, "OPTIMIZE TABLE optdb.mv_opt FINAL").collect()(0)
      assert(rep.getAs[Long]("rows_before") == 3 &&
        rep.getAs[Long]("rows_after") == 2)
      // FINAL answer unchanged, and the PLAIN read now equals it too
      assert(Graft.sql(spark,
        "SELECT k, sv, n FROM optdb.mv_opt FINAL ORDER BY k").collect().toSeq ==
        beforeFinal)
      assert(spark.sql("SELECT k, sv, n FROM optdb.mv_opt ORDER BY k")
        .collect().toSeq == beforeFinal)
      // later inserts keep maintaining; FINAL still collapses them
      Graft.sql(spark, "INSERT INTO optdb.src VALUES (1, 1.0)")
      assert(Graft.sql(spark,
        "SELECT sv FROM optdb.mv_opt FINAL WHERE k = 1").head.getDouble(0) == 8.0)
      Graft.sql(spark, "DROP TABLE optdb.mv_opt")
      spark.sql("DROP DATABASE optdb CASCADE")
    }
  }

  test("OPTIMIZE FINAL dedupes a ReplacingMergeTree table to latest versions") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS roptdb CASCADE")
      spark.sql(s"CREATE DATABASE roptdb LOCATION '$root/roptdb.db'")
      Graft.sql(spark, "CREATE TABLE roptdb.t (k Int64, ver Int64, " +
        "v Float64) ENGINE = ReplacingMergeTree(ver) ORDER BY k")
      Graft.sql(spark, "INSERT INTO roptdb.t VALUES " +
        "(1, 1, 10.0), (1, 3, 30.0), (1, 2, 20.0), (2, 1, 1.0)")
      val rep = Graft.sql(spark, "OPTIMIZE TABLE roptdb.t FINAL").collect()(0)
      assert(rep.getAs[Long]("rows_before") == 4 &&
        rep.getAs[Long]("rows_after") == 2)
      assert(spark.sql("SELECT k, ver, v FROM roptdb.t ORDER BY k")
        .collect().toSeq.map(_.toString) == Seq("[1,3,30.0]", "[2,1,1.0]"))
      spark.sql("DROP DATABASE roptdb CASCADE")
    }
  }

  test("OPTIMIZE FINAL refuses avg-MVs; TRUNCATE refuses on MV-fed tables") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS guarddb CASCADE")
      spark.sql(s"CREATE DATABASE guarddb LOCATION '$root/guarddb.db'")
      Graft.sql(spark, "CREATE TABLE guarddb.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW guarddb.mv_g " +
        "ENGINE = AggregatingMergeTree() ORDER BY k AS " +
        "SELECT k, avg(v) AS av FROM guarddb.src GROUP BY k")
      // the avg-MV's FINAL projection (derived quotient) is not
      // round-trippable into the stored helper schema — refuse named
      val e1 = intercept[IllegalArgumentException](Graft.sql(spark,
        "OPTIMIZE TABLE guarddb.mv_g FINAL"))
      assert(e1.getMessage.contains("avg"))
      // TRUNCATE on the MV-fed source would orphan the partials
      val e2 = intercept[IllegalArgumentException](Graft.sql(spark,
        "TRUNCATE TABLE guarddb.src"))
      assert(e2.getMessage.contains("orphan"))
      // on a plain table TRUNCATE falls through to Spark and works
      Graft.sql(spark, "CREATE TABLE guarddb.plain (k Int64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(spark, "INSERT INTO guarddb.plain VALUES (1), (2)")
      Graft.sql(spark, "TRUNCATE TABLE guarddb.plain")
      assert(spark.table("guarddb.plain").count() == 0)
      Graft.sql(spark, "DROP TABLE guarddb.mv_g")
      spark.sql("DROP DATABASE guarddb CASCADE")
    }
  }

  test("uniqState in an MV body: sketch partials per batch, uniqMerge ≡ exact") {
    withRoot { root =>
      spark.sql("DROP DATABASE IF EXISTS umvdb CASCADE")
      spark.sql(s"CREATE DATABASE umvdb LOCATION '$root/umvdb.db'")
      Graft.sql(spark, "CREATE TABLE umvdb.src (g String, uid Int64) " +
        "ENGINE = MergeTree ORDER BY g")
      Graft.sql(spark, "CREATE MATERIALIZED VIEW umvdb.mv_u " +
        "ENGINE = AggregatingMergeTree() ORDER BY g AS " +
        "SELECT g, uniqState(uid) AS u, count() AS n " +
        "FROM umvdb.src GROUP BY g")
      Graft.sql(spark, "INSERT INTO umvdb.src VALUES " +
        "('a', 1), ('a', 2), ('b', 1)")
      Graft.sql(spark, "INSERT INTO umvdb.src VALUES " +
        "('a', 2), ('a', 3), ('b', 9)")
      // 2 batches → 2 sketch partials per group; the merge must count
      // DISTINCT uids across both (a: {1,2,3} = 3, b: {1,9} = 2)
      val got = Graft.sql(spark,
        "SELECT g, uniqMerge(u) AS nu FROM umvdb.mv_u GROUP BY g ORDER BY g")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 3L, "b" -> 2L), got)
      assert(spark.table("umvdb.mv_u").count() == 4)
      // uniqState under a SUMMING MV refuses with the engine named
      val e = intercept[IllegalArgumentException](Graft.sql(spark,
        "CREATE MATERIALIZED VIEW umvdb.mv_u2 ENGINE = SummingMergeTree() " +
          "ORDER BY g AS SELECT g, uniqState(uid) AS u FROM umvdb.src " +
          "GROUP BY g"))
      assert(e.getMessage.contains("AggregatingMergeTree"))
      Graft.sql(spark, "DROP TABLE umvdb.mv_u")
      spark.sql("DROP DATABASE umvdb CASCADE")
    }
  }
}
