package graft

/** Dev harness: print the formatted physical plan for selected queries
  * (SURVEY.md §4 review loop — pushdown, broadcast, codegen spans).
  * Run: sbt "Test/runMain graft.PlanDump q_join_hash q_agg_hash ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
