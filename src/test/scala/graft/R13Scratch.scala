package graft

import graft.plans.Dialect

/** Round-13 iteration scratch: exercise the new dialect constructs
  * (ANY JOIN, bare/multi ARRAY JOIN wrap, sumArray/avgArray,
  * groupArray(n)/topK(k), SAMPLE 1, MV routing) directly. Run:
  *
  *   sbt -batch "Test/runMain graft.R13Scratch [sfDir]"
  */
object R13Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = Graft.builder("r13-scratch", Some("local[8]"), 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("r13_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    def show(tag: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable => println(s"[$tag] FAILED: ${e.toString.take(600)}")
      }

    Seq((1L, Seq(1, 2, 3), Seq("a", "b", "c")), (2L, Seq(7, 8), Seq("z")))
      .toDF("id", "xs", "ys").createOrReplaceTempView("r13_arr")
    Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 20L, 3.0))
      .toDF("k", "eid", "v").createOrReplaceTempView("r13_r")
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "tag").createOrReplaceTempView("r13_l")

    show("anyjoin") {
      val q = "SELECT l.k, l.tag, r.eid FROM r13_l AS l ANY LEFT JOIN " +
        "r13_r AS r ON l.k = r.k ORDER BY l.k"
      println("[anyjoin] " + Dialect.translate(s, q))
      Graft.sql(s, q).show()
    }
    show("bare-aj") {
      val q = "SELECT id, xs FROM r13_arr ARRAY JOIN xs ORDER BY id, xs"
      println("[bare-aj] " + Dialect.translate(s, q))
      Graft.sql(s, q).show()
      println("[bare-aj star] " +
        Graft.sql(s, "SELECT * FROM r13_arr ARRAY JOIN xs").columns.mkString(","))
    }
    show("multi-aj-star") {
      println("[multi-aj star] " + Graft.sql(s,
        "SELECT * FROM r13_arr ARRAY JOIN xs AS x, ys AS y").columns.mkString(","))
      Graft.sql(s, "SELECT id, x, y FROM r13_arr ARRAY JOIN xs AS x, ys AS y " +
        "ORDER BY id, x").show()
    }
    show("sumArray") {
      val q = "SELECT id, sumArray(xs) AS sx, round(avgArray(xs), 4) AS ax " +
        "FROM r13_arr GROUP BY id ORDER BY id"
      println("[sumArray] " + Dialect.translate(s, q))
      Graft.sql(s, q).show()
    }
    show("groupArrayN") {
      val q = "SELECT k, groupArray(2)(eid) AS ga, topK(1)(k) AS tk " +
        "FROM r13_r GROUP BY k ORDER BY k"
      println("[groupArrayN] " + Dialect.translate(s, q))
      Graft.sql(s, q).show()
    }
    show("topK") {
      val q = "SELECT topK(2)(tag2) AS tk FROM (SELECT substr(tag, 1, 1) " +
        "AS tag2 FROM r13_l) t"
      Graft.sql(s, "SELECT topK(2)(k % 2) AS tk FROM r13_r").show()
    }
    show("sample1") {
      Dialect.registerSample(s, "r13_r", "eid")
      println("[sample1] " + Dialect.translate(s, "SELECT count() FROM r13_r SAMPLE 1"))
    }
    show("mv") {
      val wh = java.nio.file.Files.createTempDirectory("r13_mvdb").toString
      s.sql(s"CREATE DATABASE IF NOT EXISTS r13db LOCATION '$wh'")
      s.sql("DROP TABLE IF EXISTS r13db.src")
      Graft.sql(s, "DROP TABLE IF EXISTS r13db.mv1")
      Graft.sql(s, "CREATE TABLE r13db.src (k Int64, v Float64) " +
        "ENGINE = MergeTree ORDER BY k")
      Graft.sql(s, "INSERT INTO r13db.src SELECT k, v FROM r13_r")
      Graft.sql(s, "CREATE MATERIALIZED VIEW r13db.mv1 " +
        "ENGINE = SummingMergeTree() ORDER BY k POPULATE AS " +
        "SELECT k, sum(v) AS sv, count() AS n FROM r13db.src GROUP BY k")
      Graft.sql(s, "INSERT INTO r13db.src VALUES (1, 100.0), (3, 7.5)")
      Graft.sql(s, "SELECT k, sv, n FROM r13db.mv1 FINAL ORDER BY k").show()
      println("[mv] raw rows:")
      s.sql("SELECT * FROM r13db.mv1 ORDER BY k").show()
    }
    s.stop()
  }
}
