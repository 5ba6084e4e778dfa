package graft

/** Round-12 iteration scratch: run the new dialect queries at a small
  * scale factor and print row counts + head rows. Run manually:
  *
  *   sbt -batch "Test/runMain graft.R12Scratch [sfDir] [names…]"
  */
object R12Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_ch_create_final", "q_ch_dict_get", "q_ch_sample_rows",
      "q_ch_with_fill_infer", "q_ch_array_join_multi")
    val s = Graft.builder("r12-scratch", Some("local[8]"), 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("r12_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(s, sf)
        val rows = df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[$n] $dt%.2fs rows=${rows.length} head=${rows.take(8).mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[$n] FAILED: ${e.getMessage.take(400)}")
      }
    }
    s.stop()
  }
}
