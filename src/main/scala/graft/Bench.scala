package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query MEDIANS over N runs. Default 3: a one-shot number on a
    // shared host records the noisy neighbor, not the engine — the r6
    // one-shot artifact recorded a 131× contention tail on one query
    // that its own 3-run medians showed at 0.68 s. Host noise here is
    // ±15% run to run; median-of-3 is the cheapest robust default, and
    // the per-run loadavg below makes a contaminated run
    // self-identifying. Set to 1 only for quick iteration.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    // 1-minute loadavg (shared with the stamping below).
    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Loadavg-cooldown gate (same discipline as tools/scale30.py
    // wait_quiet, adopted per the r11 lesson: BENCH_r11 was recorded at
    // loadavg ~3 and inflated every shared-query diff 1.32x uniformly).
    // Wait until the host is quiet before the first timed run, bounded
    // by a deadline so a persistently busy host still records — with
    // the contamination visible in the stamped per-run loadavg rather
    // than silently inflating the artifact. Disable with
    // SPARK_GRAFT_BENCH_COOLDOWN_SEC=0 for quick iteration.
    val cooldownMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_SEC", "600").toInt
    val cooldownLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_LOAD", "2.0").toDouble
    val cdStart = System.currentTimeMillis()
    while (loadavg() >= cooldownLoad &&
        (System.currentTimeMillis() - cdStart) < cooldownMax * 1000L)
      Thread.sleep(5000)
    val cooldownSec = (System.currentTimeMillis() - cdStart) / 1000
    if (loadavg() >= cooldownLoad)
      System.err.println(f"[bench] cooldown TIMED OUT at loadavg ${loadavg()}%.2f — recording anyway")
    val spark = Graft.builder("graft-bench", Some(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest scale factor: JIT the Spark stack,
    // compile the common codegen shapes, read table footers — standard
    // steady-state benchmarking (the first query otherwise absorbs ~5 s
    // of one-time JVM warmup regardless of which query it is). The
    // timed loop below still pays each query's own planning + codegen.
    val t0w = System.nanoTime()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val warmup = (System.nanoTime() - t0w) / 1e9
    // noop sink, not count(): count() lets Catalyst prune every
    // computed column (a projection-heavy query would "run" in the
    // time of a row count); noop materializes the full result.
    // Optional comma-separated name filter: time just the queries under
    // investigation instead of the whole suite (iteration mode; the
    // driver never sets it, so per-round invocations are unchanged).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // 1-minute loadavg, sampled before each run: a number recorded at
    // loadavg 60 on a 32-core host is measuring the neighbors, not the
    // engine — stamping it into the artifact makes contamination
    // visible to any reader instead of silently inflating the record.
    def timedLoop(): Map[String, Double] =
      SparkEntry.queries.toSeq.filter(q => only.forall(_(q._1)))
        .sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    val loads = scala.collection.mutable.ArrayBuffer[Double]()
    val perRun = (1 to runs).map { _ => loads += loadavg(); timedLoop() }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val results = perRun.head.keys.map { name =>
      name -> median(perRun.map(_(name)))
    }.toMap
    // ms precision on the printed line: the driver captures only the
    // tail of our stdout, and at 100+ queries a full-double-precision
    // map overflows that window and truncates the line's head (the r03
    // BENCH file parsed to null). 3 decimals keeps the whole line
    // inside the capture window; the BENCH_OUT file below keeps full
    // precision for regression forensics.
    def fmtQ(m: Map[String, Double], prec: Int = 17): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v).setScale(prec, BigDecimal.RoundingMode.HALF_UP).bigDecimal.stripTrailingZeros.toPlainString
      }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val loadsJson = loads.map(r3).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","warmup_sec":${r3(warmup)},"runs":$runs,"cooldown_sec":$cooldownSec,"loadavg":$loadsJson,"queries":${fmtQ(results, 3)},"sf":"$sfDir"}"""
    println(line)
    // machine-readable medians file (SPARK_GRAFT_BENCH_OUT): the
    // regression baseline the next round diffs against — per-query
    // medians plus every raw run for outlier forensics. ALWAYS also
    // written to BENCH_LAST.json in the cwd: the driver's stdout
    // capture keeps only the last 2000 chars, which a 185-query map
    // (~5.5 KB) can never fit — the committed file carries the
    // complete per-query map for the round artifact.
    val runsJson = perRun.map(m => fmtQ(m)).mkString("[", ",", "]")
    val fullJson =
      s"""{"sf":"$sfDir","cpus":$cpus,"runs":$runs,"cooldown_sec":$cooldownSec,"loadavg":$loadsJson,"total_of_medians":$total,"medians":${fmtQ(results)},"per_run":$runsJson}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), fullJson)
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    // the LAST stdout line fits the driver's 2000-char tail whole: the
    // headline totals, the 10 slowest queries inline, and a pointer to
    // the complete map — so the round artifact always parses even
    // though the full per-query line above overflows the window.
    val slowest = results.toSeq.sortBy(-_._2).take(10).toMap
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","warmup_sec":${r3(warmup)},"runs":$runs,"cooldown_sec":$cooldownSec,"loadavg":$loadsJson,"n_queries":${results.size},"slowest":${fmtQ(slowest, 3)},"queries_file":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
