package graft

import graft.operators.Sources
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.DriverManager

/** Connector-boundary integration: the JDBC source reads a real
  * database (embedded Derby — the one JDBC engine shipped with Spark)
  * through the same code path a ClickHouse/Postgres pull would use,
  * and the partitioned variant actually splits the fetch.
  */
class SourcesSpec extends SparkSpec {

  private lazy val dbPath = {
    val dir = Files.createTempDirectory("graft-derby").toString + "/db"
    val conn = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE snapshots (id INT NOT NULL, db VARCHAR(32), n_rows INT)")
      val ins = conn.prepareStatement("INSERT INTO snapshots VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"db${i % 5}"); ins.setInt(3, i * 10)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
    dir
  }

  test("jdbc source reads a live database") {
    val df = Sources.jdbc(spark, s"jdbc:derby:$dbPath", "snapshots")
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).toSet == Set("id", "db", "n_rows"))
    assert(df.agg(sum("n_rows")).head.getLong(0) == (1 to 100).map(_ * 10).sum)
  }

  test("partitioned jdbc read splits the fetch and loses no rows") {
    val df = Sources.jdbcPartitioned(spark, s"jdbc:derby:$dbPath", "snapshots",
      partitionColumn = "id", lowerBound = 1, upperBound = 100, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "fetch must split into 4 range cursors")
    val single = Sources.jdbc(spark, s"jdbc:derby:$dbPath", "snapshots")
    assert(df.exceptAll(single).isEmpty && single.exceptAll(df).isEmpty)
    // bounds shape splits only — out-of-range rows still land in edge
    // partitions
    val narrow = Sources.jdbcPartitioned(spark, s"jdbc:derby:$dbPath", "snapshots",
      partitionColumn = "id", lowerBound = 40, upperBound = 60, numPartitions = 3)
    assert(narrow.count() == 100)
  }

  test("connection config parses the reference env and builds the jdbc url") {
    val ok = Config.connectionFromEnv(Map(
      "GRAFT_HOST" -> "ch.internal", "GRAFT_PASSWORD" -> "s3cret"))
    assert(ok == Right(Config.Connection("ch.internal", 9000, "default", "s3cret")))
    assert(ok.toOption.get.url("clickhouse") == "jdbc:clickhouse://ch.internal:9000")

    val bad = Config.connectionFromEnv(Map(
      "GRAFT_PASSWORD" -> Config.Sentinel, "GRAFT_PORT" -> "-1"))
    assert(bad.isLeft)
    val errs = bad.swap.toOption.get
    assert(errs.exists(_.contains("GRAFT_HOST")))
    assert(errs.exists(_.contains("GRAFT_PASSWORD")))
    assert(errs.exists(_.contains("GRAFT_PORT")))
  }

  test("bucketed tables join with zero exchanges") {
    // hermetic session: broadcast off so the join would otherwise be a
    // shuffled sort-merge join — the bucket metadata must remove both
    // the exchanges and the sorts
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val orders = Tables(session, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables(session, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Sources.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 8)
    Sources.writeBucketed(li, "b_lineitem", "o_orderkey", buckets = 8)
    try {
      val joined = session.table("b_orders").join(session.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // the expensive thing buckets remove is the exchange (in-join
      // sorts remain: Spark 3 bucketed scans don't advertise ordering)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, plan was:\n$plan")
      assert(plan.contains("Bucketed: true"), "scan must actually use the buckets")
      // and it is the same answer as the plain parquet join
      val want = orders.join(li, "o_orderkey")
      assert(joined.count() == want.count())
      assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
    } finally {
      session.sql("DROP TABLE IF EXISTS b_orders")
      session.sql("DROP TABLE IF EXISTS b_lineitem")
      ()
    }
  }

  test("config-wired jdbc overload passes credentials through") {
    // Derby's embedded driver ignores credentials by default, so the
    // wired overload exercises the option-plumbing path end-to-end
    val conn = Config.Connection("unused", 1, "app", "pw")
    val df = Sources.jdbc(spark, s"jdbc:derby:$dbPath", "snapshots",
      Map("user" -> conn.user, "password" -> conn.password))
    assert(df.count() == 100)
  }
}
