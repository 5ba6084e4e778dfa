package graft

/** Fail-fast configuration validation — the reference's env.sh as a
  * typed precondition layer (SURVEY.md §2.B "config validation
  * fail-fast" row).
  *
  * Reference semantics reproduced:
  *  - required settings must be present and not the `**None**`
  *    placeholder sentinel (env.sh:4–22; the Dockerfile ships the
  *    sentinel as the default so an unconfigured container aborts at
  *    boot rather than running with garbage);
  *  - the database list is comma-separated and split into words
  *    (env.sh:24 `tr , " "`);
  *  - retention windows: minutes and days pass through, weeks→days
  *    `*7+1`, months→days `*31+1` (env.sh:26–29 — mirrors
  *    [[operators.Retention.weeksToDays]]/`monthsToDays` which apply
  *    the same arithmetic in Column form).
  *
  * Unlike the reference (exit 1 on the FIRST bad var), validation
  * aggregates every problem into one error — a config with three
  * mistakes surfaces all three, which matters when the "container
  * restart" is a cluster job resubmit.
  */
object Config {

  /** The reference's unset-placeholder (env.sh:5,9,13,17). */
  val Sentinel = "**None**"

  /** Validated engine configuration; retention windows normalized to
    * the units the GC predicate uses (minutes for the instant tier,
    * days for the rest — backup.sh:119–122).
    */
  final case class Settings(
      dbs: Seq[String],
      snapshotDir: String,
      keepMins: Int,
      keepDays: Int,
      keepWeeksAsDays: Int,
      keepMonthsAsDays: Int,
      backupOnStart: Boolean,
      latestType: operators.Retention.LatestMode,
      schedule: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(24L * 3600 * 1000),
      suffix: String = "")

  /** `SCHEDULE` string → micro-batch trigger, mapping the reference's
    * go-cron config surface (Dockerfile:20 `SCHEDULE="@daily"`,
    * init.sh:14) onto Structured Streaming's `ProcessingTime`:
    *
    *  - `@hourly | @daily | @midnight | @weekly | @monthly` — the
    *    go-cron descriptors; `@monthly` uses the reference's own
    *    months→days `*31` convention (env.sh:29);
    *  - `@every <dur>` with a Go-style duration (`90s`, `10m`,
    *    `1h30m`);
    *  - a 5-field cron line WHEN it denotes a fixed cadence: a
    *    minute step (every N minutes), all-star (every minute), a
    *    fixed minute (hourly), fixed minute + hour (daily), or a
    *    fixed minute + hour step (every N hours).
    *
    * `ProcessingTime` is a fixed-interval tick, so the calendar PHASE
    * of a cron line (the "at minute 30" of an hourly line) is not
    * preserved — only its cadence; cron lines that are not a fixed
    * cadence at all (day-of-month/month/day-of-week constraints,
    * value lists/ranges) are rejected rather than silently
    * approximated.
    */
  def parseSchedule(s: String): Either[String, org.apache.spark.sql.streaming.Trigger] = {
    import org.apache.spark.sql.streaming.Trigger
    val GoDur = """@every\s+(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?""".r
    def fixed(ms: Long) = Right(Trigger.ProcessingTime(ms))
    s.trim match {
      case "@hourly" => fixed(3600L * 1000)
      case "@daily" | "@midnight" => fixed(24L * 3600 * 1000)
      case "@weekly" => fixed(7L * 24 * 3600 * 1000)
      case "@monthly" => fixed(31L * 24 * 3600 * 1000) // env.sh:29 convention
      case GoDur(h, m, sec) if h != null || m != null || sec != null =>
        def n(v: String) = Option(v).map(_.toLong).getOrElse(0L)
        val ms = ((n(h) * 60 + n(m)) * 60 + n(sec)) * 1000
        if (ms > 0) fixed(ms) else Left(s"schedule '@every' duration must be positive: '$s'")
      case cron =>
        val Minute = """(\d{1,2})""".r
        val MinuteStep = """\*/(\d{1,2})""".r
        val HourStep = """\*/(\d{1,2})""".r
        cron.split("""\s+""") match {
          case Array(min, hour, "*", "*", "*") => (min, hour) match {
            case (MinuteStep(n), "*") if n.toInt > 0 && n.toInt <= 59 =>
              fixed(n.toLong * 60 * 1000)
            case ("*", "*") => fixed(60L * 1000)
            case (Minute(m), "*") if m.toInt <= 59 => fixed(3600L * 1000)
            case (Minute(m), HourStep(n)) if m.toInt <= 59 && n.toInt > 0 && n.toInt <= 23 =>
              fixed(n.toLong * 3600 * 1000)
            case (Minute(m), Minute(h)) if m.toInt <= 59 && h.toInt <= 23 =>
              fixed(24L * 3600 * 1000)
            case _ => Left(s"cron schedule is not a fixed cadence: '$s'")
          }
          case Array(_, _, _, _, _) =>
            Left(s"cron day/month/weekday constraints are not a fixed cadence: '$s'")
          case _ => Left(s"unrecognized schedule '$s' (expected @daily-style, @every <dur>, or 5-field cron)")
        }
    }
  }

  /** Parse + validate, collecting every failure. Keys mirror the
    * reference's env surface (Dockerfile:13–28) with the engine's
    * names: `GRAFT_DBS`, `GRAFT_SNAPSHOT_DIR`, `GRAFT_KEEP_MINS`,
    * `GRAFT_KEEP_DAYS`, `GRAFT_KEEP_WEEKS`, `GRAFT_KEEP_MONTHS`,
    * `GRAFT_BACKUP_ON_START`.
    */
  def fromEnv(env: Map[String, String]): Either[Seq[String], Settings] = {
    val errs = Seq.newBuilder[String]

    def required(key: String): Option[String] = env.get(key) match {
      case None => errs += s"$key is required"; None
      case Some(Sentinel) => errs += s"$key is still the $Sentinel placeholder"; None
      case Some(v) if v.trim.isEmpty => errs += s"$key is empty"; None
      case Some(v) => Some(v)
    }

    def intWithDefault(key: String, default: Int): Int = env.get(key) match {
      case None | Some(Sentinel) => default
      case Some(v) => v.toIntOption match {
        case Some(n) if n >= 0 => n
        case _ => errs += s"$key must be a non-negative integer, got '$v'"; default
      }
    }

    // env.sh:24 — comma list to words, blanks dropped
    val dbs = required("GRAFT_DBS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    if (env.contains("GRAFT_DBS") && env("GRAFT_DBS") != Sentinel && dbs.isEmpty)
      errs += "GRAFT_DBS lists no databases"
    val dir = required("GRAFT_SNAPSHOT_DIR")
    // defaults per Dockerfile:25–28
    val keepMins = intWithDefault("GRAFT_KEEP_MINS", 1440)
    val keepDays = intWithDefault("GRAFT_KEEP_DAYS", 7)
    val keepWeeks = intWithDefault("GRAFT_KEEP_WEEKS", 4)
    val keepMonths = intWithDefault("GRAFT_KEEP_MONTHS", 6)
    val onStart = env.getOrElse("GRAFT_BACKUP_ON_START", "FALSE")
      .equalsIgnoreCase("TRUE")
    // SCHEDULE (Dockerfile:20): @daily is the shipped default
    val schedule = parseSchedule(env.getOrElse("GRAFT_SCHEDULE", "@daily"))
      .fold(e => { errs += s"GRAFT_SCHEDULE: $e"
                   org.apache.spark.sql.streaming.Trigger.ProcessingTime(24L * 3600 * 1000) },
        identity)
    // BACKUP_LATEST_TYPE (Dockerfile:24): symlink | hardlink | none,
    // symlink being the shipped default
    val latestType = operators.Retention.LatestMode
      .parse(env.getOrElse("GRAFT_LATEST_TYPE", "symlink"))
      .fold(e => { errs += s"GRAFT_LATEST_TYPE: $e"
                   operators.Retention.LatestMode.Symlink },
        identity)
    // BACKUP_SUFFIX (Dockerfile:23): the artifact-format axis. ""
    // keeps the engine-native partitioned parquet snapshot only;
    // ".zip" additionally publishes the reference's single-file
    // archive per (db, day bucket) — Snapshot.Formats' archive arm.
    val suffix = env.getOrElse("GRAFT_SUFFIX", "") match {
      case s @ ("" | ".zip") => s
      case other =>
        errs += s"GRAFT_SUFFIX must be '' or '.zip', got '$other'"; ""
    }

    val collected = errs.result()
    if (collected.nonEmpty) Left(collected)
    else Right(Settings(
      dbs = dbs,
      snapshotDir = dir.get,
      keepMins = keepMins,
      keepDays = keepDays,
      keepWeeksAsDays = keepWeeks * 7 + 1,   // env.sh:28
      keepMonthsAsDays = keepMonths * 31 + 1, // env.sh:29
      backupOnStart = onStart,
      latestType = latestType,
      schedule = schedule,
      suffix = suffix))
  }

  /** The exit-1 form (init.sh behavior): throw with every problem
    * listed, for callers that want the reference's abort-at-boot
    * semantics rather than an Either.
    */
  def fromEnvOrThrow(env: Map[String, String]): Settings =
    fromEnv(env).fold(
      errs => throw new IllegalArgumentException(
        s"invalid graft configuration:\n  ${errs.mkString("\n  ")}"),
      identity)

  /** Database connection settings — the reference's client env surface
    * (Dockerfile:13–19: host, native port 9000, user `default`,
    * password required past the sentinel; applied at backup.sh:38–44).
    * Consumed by [[operators.Sources.jdbc]], the connector boundary.
    */
  final case class Connection(host: String, port: Int, user: String, password: String) {
    /** JDBC url for a given subprotocol (`clickhouse`, `postgresql`, …). */
    def url(subprotocol: String): String = s"jdbc:$subprotocol://$host:$port"
  }

  /** Parse + validate the connection env (`GRAFT_HOST`, `GRAFT_PORT`,
    * `GRAFT_USER`, `GRAFT_PASSWORD`), collecting every failure like
    * [[fromEnv]]. Host and password are required (password may not be
    * the sentinel — the reference aborts at boot on an unconfigured
    * password); port defaults to 9000 and user to `default`, the
    * reference's shipped defaults.
    */
  def connectionFromEnv(env: Map[String, String]): Either[Seq[String], Connection] = {
    val errs = Seq.newBuilder[String]
    def required(key: String): Option[String] = env.get(key) match {
      case None => errs += s"$key is required"; None
      case Some(Sentinel) => errs += s"$key is still the $Sentinel placeholder"; None
      case Some(v) if v.trim.isEmpty => errs += s"$key is empty"; None
      case Some(v) => Some(v)
    }
    val host = required("GRAFT_HOST")
    val port = env.get("GRAFT_PORT") match {
      case None | Some(Sentinel) => 9000
      case Some(v) => v.toIntOption match {
        case Some(p) if p > 0 && p <= 65535 => p
        case _ => errs += s"GRAFT_PORT must be a port number, got '$v'"; 9000
      }
    }
    val user = env.get("GRAFT_USER").filterNot(_ == Sentinel).getOrElse("default")
    val password = required("GRAFT_PASSWORD")
    val collected = errs.result()
    if (collected.nonEmpty) Left(collected)
    else Right(Connection(host.get, port, user, password.get))
  }
}
