package graft

/** Dev harness: print the Introspect strategy vector for named queries. */
object VecDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val r = plans.Introspect.summary(df)
        .select("n_broadcast_joins", "n_shuffle_joins", "n_cartesian",
          "n_nested_loop_joins", "n_global_windows", "n_hash_exchanges",
          "n_range_exchanges").collect()(0)
      println(s"VEC $n = $r")
    }
    spark.stop()
  }
}
