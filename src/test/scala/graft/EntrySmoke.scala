package graft

/** Dev harness mirroring the driver's t1 smoke: entry(spark) rows > 0.
  * Run: sbt "Test/runMain graft.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    spark.stop()
  }
}
