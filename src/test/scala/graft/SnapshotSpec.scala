package graft

import graft.operators.{Relational, Snapshot}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The backup→validate→restore loop (backup.sh:45,47–65) and the
  * partition-pruning contract of the tier views.
  */
class SnapshotSpec extends SparkSpec {

  test("backup writes, validates, and restores losslessly") {
    val src = Relational.eventsSec(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_s")
    val dest = Files.createTempDirectory("graft-snapshot").toString
    val n = Snapshot.backup(src, col("ts_s"), dest)
    assert(n == src.count())
    val back = Snapshot.restore(spark, dest).drop("bucket_day")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "restore must reproduce the backed-up rows exactly")
  }

  test("empty snapshot fails validation like the reference's exit 1") {
    val src = Relational.eventsSec(spark, sf).filter(lit(false))
      .select("event_id", "ts_s")
    val dest = Files.createTempDirectory("graft-snapshot-empty").toString
    intercept[IllegalArgumentException] {
      Snapshot.backup(src, col("ts_s"), dest)
    }
  }

  test("tier views prune snapshot partitions at the scan") {
    val src = Relational.eventsSec(spark, sf)
      .select("event_id", "event_type", "ts_s")
    val dest = Files.createTempDirectory("graft-snapshot-tiers").toString
    Snapshot.backup(src, col("ts_s"), dest)
    val snap = Snapshot.restore(spark, dest)
    val day = snap.select(min("bucket_day")).head.getString(0)
    val view = Snapshot.dayView(snap, day)
    view.collect()
    val plan = view.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket_day"),
      s"day view must prune partitions, plan was:\n$plan")
    // the view equals a post-hoc filter of the full restore
    val want = snap.filter(col("bucket_day") === day)
    assert(view.exceptAll(want).isEmpty && want.exceptAll(view).isEmpty)
    // month view covers every day view of that month
    val month = day.substring(0, 6)
    assert(Snapshot.monthView(snap, month).count() >= view.count())
  }

  test("snapshot round-trips losslessly through every supported format") {
    // timestamps through text formats are their own hazard (tz/format
    // round-trip); export the second-truncated form as string for
    // csv/json parity, typed columns otherwise
    val src = Relational.eventsSec(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), date_format(col("ts_s"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
    Snapshot.Formats.foreach { fmt =>
      val dest = Files.createTempDirectory(s"graft-export-$fmt").toString
      Snapshot.exportAs(src, dest, fmt)
      val back = Snapshot.importFrom(spark, dest, fmt, src.schema)
      assert(back.schema == src.schema, s"$fmt schema drift")
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"$fmt round trip lost or altered rows")
    }
    intercept[IllegalArgumentException] {
      Snapshot.exportAs(src, "/tmp/never", "avro")
    }
  }

  test("salted join is result-identical to the plain join") {
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "o_custkey", "c_mktsegment")
    val salted = operators.Skew.saltedJoin(
        orders, customer, key = "o_custkey", idCol = "o_orderkey", salts = 8)
      .select("o_orderkey", "o_custkey", "c_mktsegment")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("Graft.session registers SQL functions and the table catalog") {
    // the shared test session lacks the extensions; register on it the
    // way GraftExtensions would and exercise the SQL surface end-to-end
    (expressions.VectorExprs.functions ++ expressions.TextExprs.functions).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    Graft.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT d.doc_id, size(winnow_fp(d.text, 16, 8)) AS n_fp,
        |       round(vec_dot(e.embedding, e.embedding), 4) AS sq
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.doc_id < 5 ORDER BY d.doc_id""".stripMargin)
    assert(r.count() > 0 && r.filter(col("n_fp") <= 0 || col("sq") <= 0).isEmpty)
  }
}
