package graft

import org.scalatest.funsuite.AnyFunSuite

/** env.sh:4–29 semantics: sentinel rejection, CSV splitting, retention
  * arithmetic, aggregate error reporting. Pure — no SparkSession.
  */
class ConfigSpec extends AnyFunSuite {

  private val valid = Map(
    "GRAFT_DBS" -> "sales, events ,ops",
    "GRAFT_SNAPSHOT_DIR" -> "/tmp/snaps",
    "GRAFT_KEEP_WEEKS" -> "4",
    "GRAFT_KEEP_MONTHS" -> "6",
    "GRAFT_BACKUP_ON_START" -> "true")

  test("valid config parses: CSV split, trim, retention arithmetic, defaults") {
    val s = Config.fromEnvOrThrow(valid)
    assert(s.dbs == Seq("sales", "events", "ops"))
    assert(s.keepMins == 1440 && s.keepDays == 7) // Dockerfile:25,28 defaults
    assert(s.keepWeeksAsDays == 4 * 7 + 1)   // env.sh:28
    assert(s.keepMonthsAsDays == 6 * 31 + 1) // env.sh:29
    assert(s.backupOnStart) // case-insensitive TRUE
  }

  test("sentinel and missing keys fail fast, every error reported at once") {
    val bad = valid
      .updated("GRAFT_DBS", Config.Sentinel)
      .removed("GRAFT_SNAPSHOT_DIR")
      .updated("GRAFT_KEEP_WEEKS", "often")
    val errs = Config.fromEnv(bad).swap.getOrElse(Nil)
    assert(errs.size == 3, errs.mkString("; "))
    assert(errs.exists(_.contains("GRAFT_DBS")))
    assert(errs.exists(_.contains("GRAFT_SNAPSHOT_DIR")))
    assert(errs.exists(_.contains("GRAFT_KEEP_WEEKS")))
    val ex = intercept[IllegalArgumentException](Config.fromEnvOrThrow(bad))
    assert(ex.getMessage.contains("GRAFT_SNAPSHOT_DIR"))
  }

  test("an all-commas db list is rejected, negative retention rejected") {
    assert(Config.fromEnv(valid.updated("GRAFT_DBS", " , ,")).isLeft)
    assert(Config.fromEnv(valid.updated("GRAFT_KEEP_DAYS", "-1")).isLeft)
  }

  test("schedule strings map to fixed-cadence triggers; non-cadence cron is rejected") {
    import org.apache.spark.sql.streaming.Trigger
    def p(s: String) = Config.parseSchedule(s)
    val hour = 3600L * 1000
    val day = 24 * hour
    // go-cron descriptors (Dockerfile:20 ships @daily)
    assert(p("@daily") == Right(Trigger.ProcessingTime(day)))
    assert(p("@midnight") == Right(Trigger.ProcessingTime(day)))
    assert(p("@hourly") == Right(Trigger.ProcessingTime(hour)))
    assert(p("@weekly") == Right(Trigger.ProcessingTime(7 * day)))
    assert(p("@monthly") == Right(Trigger.ProcessingTime(31 * day))) // env.sh:29
    // @every with Go-style durations
    assert(p("@every 90s") == Right(Trigger.ProcessingTime(90L * 1000)))
    assert(p("@every 10m") == Right(Trigger.ProcessingTime(600L * 1000)))
    assert(p("@every 1h30m") == Right(Trigger.ProcessingTime(5400L * 1000)))
    // fixed-cadence 5-field cron
    assert(p("*/15 * * * *") == Right(Trigger.ProcessingTime(15L * 60 * 1000)))
    assert(p("* * * * *") == Right(Trigger.ProcessingTime(60L * 1000)))
    assert(p("30 * * * *") == Right(Trigger.ProcessingTime(hour)))
    assert(p("0 3 * * *") == Right(Trigger.ProcessingTime(day)))
    assert(p("0 */6 * * *") == Right(Trigger.ProcessingTime(6 * hour)))
    // rejected: calendar constraints, lists, zero/overflow, junk
    for (bad <- Seq("@every", "@every 0s", "0 0 1 * *", "0 0 * * 1",
        "1,2 * * * *", "99 * * * *", "*/70 * * * *", "every day", ""))
      assert(p(bad).isLeft, s"'$bad' must be rejected")
  }

  test("GRAFT_SCHEDULE wires into Settings; a bad one is collected with other errors") {
    import org.apache.spark.sql.streaming.Trigger
    val day = 24L * 3600 * 1000
    assert(Config.fromEnvOrThrow(valid).schedule == Trigger.ProcessingTime(day),
      "@daily is the shipped default")
    assert(Config.fromEnvOrThrow(valid.updated("GRAFT_SCHEDULE", "@every 5m")).schedule
      == Trigger.ProcessingTime(300L * 1000))
    val errs = Config.fromEnv(valid
      .updated("GRAFT_SCHEDULE", "0 0 1 * *")
      .updated("GRAFT_KEEP_DAYS", "nope")).swap.getOrElse(Nil)
    assert(errs.size == 2 && errs.exists(_.contains("GRAFT_SCHEDULE")), errs.mkString("; "))
  }
}
