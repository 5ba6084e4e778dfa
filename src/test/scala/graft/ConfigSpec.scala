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
}
