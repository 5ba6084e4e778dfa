package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** SQL-TEXT command front-end — the reference's ENTIRE user interface
  * is one statement typed over clickhouse-client's SQL channel:
  * `BACKUP DATABASE ${DB} TO Disk('backups', '${DB}-<stamp>.zip');`
  * (backup.sh:45, sent through the client flags of backup.sh:38–44).
  * [[Graft.sql]] routes that literal statement — and the rest of
  * ClickHouse 24.8's snapshot-lifecycle command family (RESTORE,
  * ALTER … DELETE / UPDATE / ADD COLUMN / DROP COLUMN, the partition
  * verbs DETACH / ATTACH / DROP / MOVE / REPLACE PARTITION,
  * OPTIMIZE … FINAL [DEDUPLICATE], and `BACKUP … SETTINGS
  * base_backup = …` incremental chains — the feature that makes the
  * reference's `@daily` re-backup affordable, Dockerfile:20) — onto
  * the engine's fully-spec'd Scala APIs ([[operators.Snapshot]]), and
  * passes every other statement through to `spark.sql` unchanged, so
  * ONE entry point serves both the SELECT surface
  * ([[plans.SqlSurface]]) and the operational command surface.
  *
  * Deliberately a COMMAND ROUTER, not a Catalyst parser extension:
  * BACKUP/RESTORE/mutations are imperative side-effecting operations,
  * not logical plans — there is nothing for Catalyst to optimize, and
  * `SparkSessionExtensions.injectParser` would put a session-global
  * hook in every query's path for what is a six-verb grammar. The
  * fallthrough to `spark.sql` is exact (any statement not matching a
  * command verb is untouched), so the router is a strict superset of
  * the session's SQL.
  *
  * Conventions:
  *  - `Disk('<name>', '<object>')` resolves through session conf
  *    `graft.disk.<name>` → root path — the ClickHouse storage-config
  *    analog (the reference's 'backups' disk is container config, not
  *    SQL; here `SET graft.disk.backups = /backups` plays that role).
  *  - `BACKUP` registers `graft.snapshot.<table>` = destination in the
  *    session conf so later `ALTER TABLE <table> …` / `OPTIMIZE` by
  *    NAME hit the right snapshot; `SET graft.snapshot.x = <dir>`
  *    attaches a pre-existing snapshot the same way.
  *  - a destination ending `.zip` is the single-object archive arm
  *    (BACKUP_SUFFIX=".zip", Dockerfile:23): the snapshot stages as
  *    its normal manifested parquet layout, then streams into one zip
  *    ([[operators.Snapshot.zipDirectory]]). Anything else is the
  *    partitioned-directory arm — the 100 TB path, and the only one
  *    mutations run against (a mutation rewrites day partitions; a
  *    zip is an immutable interchange object).
  *  - day bucketing needs a timestamp: `SETTINGS ts_column = 'col'`
  *    picks it, the first TimestampType column is inferred otherwise,
  *    and a table with no timestamp at all lands in one constant
  *    epoch bucket (a dimension snapshot is one "part").
  */
object GraftSql {

  def sql(spark: SparkSession, text: String): DataFrame = {
    val stmt = text.trim.stripSuffix(";").trim
    stmt match {
      // ClickHouse table DDL: `CREATE TABLE … ENGINE = <engine> ORDER
      // BY … [SAMPLE BY …]` — the statement every ClickHouse session
      // starts with, and the last Scala-only step in the switch story:
      // the ENGINE/ORDER BY/SAMPLE BY clauses carry exactly the
      // metadata [[plans.Dialect.registerFinal]]/[[plans.Dialect
      // .registerSample]] otherwise need from code. Routed ONLY when an
      // ENGINE clause is present — Spark's own CREATE TABLE … USING …
      // falls through untouched.
      case CreateTableRe(ifne, name, colsBlock, engine, engineArgs, tail) =>
        createTable(spark, ifne != null, name, colsBlock, engine,
          Option(engineArgs).map(_.trim).getOrElse(""), tail)
      case CreateDictRe(ifne, name, colsBlock, key, tail) =>
        createDictionary(spark, ifne != null, name, colsBlock, key, tail)
      // the operator-UX verbs around the DDL surface. RENAME maps onto
      // Spark's own ALTER TABLE … RENAME TO (different spelling, same
      // catalog op) and re-homes any graft registrations; EXISTS TABLE
      // is the ClickHouse probe (Spark has no statement form); DROP
      // DICTIONARY unregisters; SYSTEM RELOAD DICTIONARY[IES] is a
      // TRUE no-op here — graft dictionaries read the live source
      // relation on every query, there is no staleness to flush — and
      // answers OK so operator scripts keep working.
      case RenameTableRe(from, to) =>
        spark.sql(s"ALTER TABLE $from RENAME TO $to")
        Seq("final", "sample", "sumfinal", "orderby", "partition", "snapshot")
          .foreach { kind =>
            val (f, t) = (s"graft.$kind.${from.split('.').last}",
              s"graft.$kind.${to.split('.').last}")
            spark.conf.getOption(f).foreach { v =>
              spark.conf.set(t, v); spark.conf.unset(f)
            }
          }
        okRow(spark, s"RENAME TABLE TO $to", from)
      case ExistsTableRe(table) =>
        import spark.implicits._
        Seq(if (spark.catalog.tableExists(table)) 1 else 0).toDF("result")
      case DropDictRe(ifex, name) =>
        val key = s"graft.dict.${name.split('.').last}"
        val existed = spark.conf.getOption(key).isDefined
        require(existed || ifex != null, s"dictionary '$name' is not registered")
        spark.conf.unset(key)
        okRow(spark, "DROP DICTIONARY", name)
      case ReloadDictRe(_) =>
        okRow(spark, "SYSTEM RELOAD DICTIONARIES", "-")
      case BackupDbRe(db, destRaw, settings) =>
        backupDatabase(spark, db, destRaw.trim, parseSettings(Option(settings)))
      case BackupTableRe(table, destRaw, settings) =>
        backupTable(spark, table, destRaw.trim, parseSettings(Option(settings)))
      case RestoreDbRe(db, destRaw) =>
        restoreDatabase(spark, db, destRaw.trim)
      case RestoreTableRe(table, destRaw) =>
        restoreTable(spark, table, destRaw.trim)
      case AlterDeleteRe(table, pred) =>
        report(spark, "DELETE", table,
          operators.Snapshot.delete(spark, snapshotDirOf(spark, table), expr(pred.trim)))
      // ADD/DROP COLUMN route to the snapshot engine only for tables
      // with a REGISTERED snapshot; otherwise they are Spark's own
      // catalog DDL and must fall through untouched
      case AddColRe(table, name, dtype, dflt)
          if spark.conf.getOption(s"graft.snapshot.$table").isDefined =>
        operators.Snapshot.addColumn(spark, snapshotDirOf(spark, table),
          name, dflt.trim, dtype.trim)
        okRow(spark, s"ADD COLUMN $name", table)
      case DropColRe(table, name)
          if spark.conf.getOption(s"graft.snapshot.$table").isDefined =>
        operators.Snapshot.dropColumn(spark, snapshotDirOf(spark, table), name)
        okRow(spark, s"DROP COLUMN $name", table)
      // the partition lifecycle family — ClickHouse 24.8's day-2
      // operational verbs (the version the reference pins,
      // Dockerfile:2) — routed onto the spec'd Snapshot engines:
      // DETACH/ATTACH/DROP are one rename/delete + the one-row-per-day
      // manifest rewrite; MOVE re-homes a day across snapshots with no
      // data rewrite; REPLACE adopts the source's version of a day with
      // copy semantics. All require a registered snapshot (BACKUP first
      // or SET graft.snapshot.<table>).
      case DetachPartRe(table, day) =>
        operators.Snapshot.detachPartition(spark, snapshotDirOf(spark, table), day)
        okRow(spark, s"DETACH PARTITION $day", table)
      case AttachPartRe(table, day) =>
        operators.Snapshot.attachPartition(spark, snapshotDirOf(spark, table), day)
        okRow(spark, s"ATTACH PARTITION $day", table)
      case DropPartRe(table, day) =>
        operators.Snapshot.dropPartition(spark, snapshotDirOf(spark, table), day)
        okRow(spark, s"DROP PARTITION $day", table)
      case MovePartRe(table, day, dstTable) =>
        operators.Snapshot.movePartition(spark, snapshotDirOf(spark, table),
          snapshotDirOf(spark, dstTable), day)
        okRow(spark, s"MOVE PARTITION $day TO TABLE $dstTable", table)
      case ReplacePartRe(table, day, srcTable) =>
        operators.Snapshot.replacePartition(spark, snapshotDirOf(spark, srcTable),
          snapshotDirOf(spark, table), day)
        okRow(spark, s"REPLACE PARTITION $day FROM $srcTable", table)
      case AlterUpdateRe(table, rest) =>
        alterUpdate(spark, table, rest)
      case OptimizeRe(table, dedup) =>
        optimize(spark, table, dedup != null)
      // ClickHouse's EXPLAIN family, routed onto the engine's
      // introspection surfaces. Spark's own EXPLAIN verbs
      // ([EXTENDED|CODEGEN|COST|FORMATTED|LOGICAL]) fall through
      // untouched — these four spellings exist only in the dialect.
      //  - SYNTAX: what ClickHouse's EXPLAIN SYNTAX is — the rewritten
      //    statement. Here that is the dialect translation itself, so
      //    users can SEE what their PREWHERE/FINAL/ASOF text became.
      //  - PLAN / PIPELINE: one row per physical-plan node of interest
      //    (plans.Introspect.explain — scans with pushed filters, join
      //    strategies, exchanges, windows, codegen spans).
      //  - ESTIMATE: the one-row plan-shape dashboard
      //    (plans.Introspect.summary).
      case ExplainSyntaxRe(rest) =>
        import spark.implicits._
        Seq(plans.Dialect.translate(spark, rest.trim)).toDF("statement")
      case ExplainPlanRe(rest) =>
        plans.Introspect.explain(spark.sql(plans.Dialect.translate(spark, rest.trim)))
      case ExplainEstimateRe(rest) =>
        plans.Introspect.summary(spark.sql(plans.Dialect.translate(spark, rest.trim)))
      // fallthrough: the full SQL surface, via the ClickHouse-dialect
      // translator ([[plans.Dialect]]) — identity (byte-for-byte) on
      // ANSI/Spark text, so native statements are untouched; dialect
      // SELECTs (PREWHERE / FINAL / SAMPLE / LIMIT BY / ARRAY JOIN /
      // countIf / quantile(q)(x) / …) arrive as the Catalyst plan their
      // hand-written Spark twin would produce
      case _ => spark.sql(plans.Dialect.translate(spark, stmt))
    }
  }

  // ── grammar ────────────────────────────────────────────────────────
  // (?is): case-insensitive, DOTALL — predicates/defaults may span lines

  private val BackupDbRe =
    """(?is)^BACKUP\s+DATABASE\s+(\w+)\s+TO\s+(.+?)(?:\s+SETTINGS\s+(.+))?$""".r
  private val BackupTableRe =
    """(?is)^BACKUP\s+TABLE\s+([\w.]+)\s+TO\s+(.+?)(?:\s+SETTINGS\s+(.+))?$""".r
  private val RestoreDbRe =
    """(?is)^RESTORE\s+DATABASE\s+(\w+)\s+FROM\s+(.+)$""".r
  private val RestoreTableRe =
    """(?is)^RESTORE\s+TABLE\s+([\w.]+)\s+FROM\s+(.+)$""".r
  private val AlterDeleteRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DELETE\s+WHERE\s+(.+)$""".r
  private val AlterUpdateRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+UPDATE\s+(.+)$""".r
  // partition ids are day buckets (yyyymmdd) — quoted or bare, like
  // ClickHouse's PARTITION '<id>' / PARTITION <expr> forms
  private val DetachPartRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DETACH\s+PARTITION\s+'?(\w+)'?$""".r
  private val AttachPartRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+ATTACH\s+PARTITION\s+'?(\w+)'?$""".r
  private val DropPartRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+PARTITION\s+'?(\w+)'?$""".r
  private val MovePartRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+MOVE\s+PARTITION\s+'?(\w+)'?\s+TO\s+TABLE\s+([\w.]+)$""".r
  private val ReplacePartRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+REPLACE\s+PARTITION\s+'?(\w+)'?\s+FROM\s+([\w.]+)$""".r
  private val AddColRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w(),]+)\s+DEFAULT\s+(.+)$""".r
  private val DropColRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)$""".r
  private val OptimizeRe =
    """(?is)^OPTIMIZE\s+TABLE\s+([\w.]+)\s+FINAL(\s+DEDUPLICATE)?$""".r
  // ClickHouse DDL: the ENGINE clause is the routing discriminator —
  // Spark's own CREATE TABLE … USING … never has one and falls through
  private val CreateTableRe =
    """(?is)^CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.+)\)\s*ENGINE\s*=\s*(\w+)\s*(?:\(([^)]*)\))?(.*)$""".r
  private val CreateDictRe =
    """(?is)^CREATE\s+DICTIONARY\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.+)\)\s*PRIMARY\s+KEY\s+(\w+)(.*)$""".r
  private val RenameTableRe =
    """(?is)^RENAME\s+TABLE\s+([\w.]+)\s+TO\s+([\w.]+)$""".r
  private val ExistsTableRe = """(?is)^EXISTS\s+(?:TABLE\s+)?([\w.]+)$""".r
  private val DropDictRe =
    """(?is)^DROP\s+DICTIONARY\s+(IF\s+EXISTS\s+)?([\w.]+)$""".r
  private val ReloadDictRe =
    """(?is)^SYSTEM\s+RELOAD\s+(DICTIONARIES|DICTIONARY\s+[\w.]+)$""".r
  private val ExplainSyntaxRe = """(?is)^EXPLAIN\s+SYNTAX\s+(.+)$""".r
  private val ExplainPlanRe = """(?is)^EXPLAIN\s+(?:PLAN|PIPELINE)\s+(SELECT\b.+|WITH\b.+)$""".r
  private val ExplainEstimateRe = """(?is)^EXPLAIN\s+ESTIMATE\s+(.+)$""".r
  private val DiskRe = """(?is)^Disk\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)$""".r
  private val PathRe = """(?s)^'([^']*)'$""".r
  private val SettingRe = """(?is)^\s*(\w+)\s*=\s*'([^']*)'\s*$""".r
  private val DiskSettingRe = """(?is)^\s*(\w+)\s*=\s*(Disk\(.+\))\s*$""".r
  private val AssignRe = """(?s)^\s*(\w+)\s*=(?!=)\s*(.+)$""".r

  /** `Disk('name', 'obj')` → `${graft.disk.name}/obj`; `'path'` → path. */
  private def parseDest(spark: SparkSession, raw: String): String = raw match {
    case DiskRe(name, obj) =>
      val root = spark.conf.getOption(s"graft.disk.$name").getOrElse(
        throw new IllegalArgumentException(
          s"unknown disk '$name' — SET graft.disk.$name = <root path> first " +
            "(ClickHouse declares backup disks in storage config; graft " +
            "declares them in session conf)"))
      root.stripSuffix("/") + "/" + obj
    case PathRe(path) => path
    case other => throw new IllegalArgumentException(
      s"cannot parse backup destination: $other — expected 'path' or Disk('name', 'object')")
  }

  private def parseSettings(s: Option[String]): Map[String, String] =
    s.fold(Map.empty[String, String]) { text =>
      splitTopLevelCommas(text).map {
        case SettingRe(k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
        // a Disk('name','obj') value stays raw; its reader resolves it
        // through parseDest like any destination (base_backup's form)
        case DiskSettingRe(k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
        case bad => throw new IllegalArgumentException(
          s"cannot parse SETTINGS entry: $bad — expected key = 'value' or key = Disk('name', 'object')")
      }.toMap
    }

  /** `SETTINGS base_backup = '<dir>' | Disk('name', 'obj')` — the
    * ClickHouse 24.8 incremental-backup knob that makes the
    * reference's `@daily` re-backup (Dockerfile:20) affordable: only
    * day partitions whose content digest differs from the base's
    * manifest are re-written ([[operators.Snapshot.backupIncremental]]).
    */
  private def baseBackupOf(spark: SparkSession,
      settings: Map[String, String]): Option[String] =
    settings.get("base_backup").map { raw =>
      if (raw.trim.toLowerCase(java.util.Locale.ROOT).startsWith("disk("))
        parseDest(spark, raw.trim)
      else raw // SettingRe already stripped the quotes: a plain path
    }

  /** The day-bucketing timestamp for a backup: explicit setting, else
    * the first TimestampType column, else a constant epoch (the whole
    * table is one "part" — the dimension-table shape).
    */
  private def tsColumnOf(df: DataFrame,
      settings: Map[String, String]): org.apache.spark.sql.Column =
    settings.get("ts_column").map(col).getOrElse(
      df.schema.fields.find(_.dataType == TimestampType).map(f => col(f.name))
        .getOrElse(to_timestamp(lit("1970-01-01 00:00:00"))))

  /** One table → `dest` (zip or directory), via [[operators.Snapshot
    * .backup]] either way — the archive arm stages the IDENTICAL
    * manifested snapshot then containers it, so validation and digests
    * are uniform. Returns the verified row count.
    */
  private def backupInto(spark: SparkSession, df: DataFrame,
      settings: Map[String, String], dest: String): Long =
    baseBackupOf(spark, settings) match {
      case Some(base) =>
        require(!dest.endsWith(".zip"),
          "incremental backup (SETTINGS base_backup) needs the " +
            "partitioned-directory arm — the chain references its base " +
            "by path, and a zip is an immutable interchange object")
        operators.Snapshot.backupIncremental(df, tsColumnOf(df, settings), base, dest)
        // verified row count from the resolved chain's manifest — the
        // same metadata-scale read RESTORE DATABASE reports from
        operators.Snapshot.parts(spark, dest)
          .agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0)
      case None if dest.endsWith(".zip") =>
        val stage = dest + ".stage"
        val n = operators.Snapshot.backup(df, tsColumnOf(df, settings), stage)
        operators.Snapshot.zipDirectory(spark, stage, dest)
        AtomicDir.fileSystem(stage).delete(new org.apache.hadoop.fs.Path(stage), true)
        n
      case None => operators.Snapshot.backup(df, tsColumnOf(df, settings), dest)
    }

  private def backupTable(spark: SparkSession, table: String, destRaw: String,
      settings: Map[String, String]): DataFrame = {
    import spark.implicits._
    val dest = parseDest(spark, destRaw)
    val n = backupInto(spark, spark.table(table), settings, dest)
    if (!dest.endsWith(".zip"))
      spark.conf.set(s"graft.snapshot.$table", dest)
    Seq((table, dest, n)).toDF("table", "dest", "n_rows")
  }

  /** The reference's literal verb: every (non-temporary) table of the
    * named catalog database, each as its own manifested snapshot under
    * `dest/<table>` — or staged that way and streamed into the one zip
    * object when the destination carries the reference's
    * `BACKUP_SUFFIX` (one object per (db, bucket), backup.sh:26–34).
    */
  private def backupDatabase(spark: SparkSession, db: String, destRaw: String,
      settings: Map[String, String]): DataFrame = {
    import spark.implicits._
    val dest = parseDest(spark, destRaw)
    val tables = spark.sql(s"SHOW TABLES IN $db").collect()
      .filter(!_.getAs[Boolean]("isTemporary"))
      .map(_.getAs[String]("tableName")).sorted.toSeq
    require(tables.nonEmpty, s"database $db has no tables to back up")
    // incremental database backup: each table chains to ITS OWN base
    // under `<base>/<table>` — the layout BACKUP DATABASE itself writes
    val base = baseBackupOf(spark, settings)
    require(base.isEmpty || !dest.endsWith(".zip"),
      "incremental backup (SETTINGS base_backup) needs the partitioned-directory arm")
    def tableSettings(t: String): Map[String, String] =
      base.fold(settings)(b =>
        settings.updated("base_backup", b.stripSuffix("/") + "/" + t))
    val rows =
      if (dest.endsWith(".zip")) {
        val stage = dest + ".stage"
        val fs = AtomicDir.fileSystem(stage)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        val rs = tables.map { t =>
          (t, dest, operators.Snapshot.backup(
            spark.table(s"$db.$t"),
            tsColumnOf(spark.table(s"$db.$t"), settings), s"$stage/$t"))
        }
        operators.Snapshot.zipDirectory(spark, stage, dest)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        rs
      } else tables.map { t =>
        val d = s"$dest/$t"
        val n = backupInto(spark, spark.table(s"$db.$t"), tableSettings(t), d)
        spark.conf.set(s"graft.snapshot.$db.$t", d)
        (t, d, n)
      }
    rows.toDF("table", "dest", "n_rows")
  }

  /** Unzip-if-archive, else the directory itself. */
  private def materializeDir(spark: SparkSession, dest: String): String =
    if (dest.endsWith(".zip")) {
      val unpack = dest + ".unpacked"
      operators.Snapshot.unzipDirectory(spark, dest, unpack)
      unpack
    } else dest

  /** Temp-view names cannot be qualified — a restored `db.t` registers
    * under its table component.
    */
  private def viewName(table: String): String =
    table.split('.').last

  private def restoreTable(spark: SparkSession, table: String,
      destRaw: String): DataFrame = {
    val dest = parseDest(spark, destRaw)
    val df = operators.Snapshot.resolve(spark, materializeDir(spark, dest))
    df.createOrReplaceTempView(viewName(table))
    df
  }

  private def restoreDatabase(spark: SparkSession, db: String,
      destRaw: String): DataFrame = {
    import spark.implicits._
    val dest = parseDest(spark, destRaw)
    val dir = materializeDir(spark, dest)
    val fs = AtomicDir.fileSystem(dir)
    val tables = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted.toSeq
    require(tables.nonEmpty, s"no table snapshots under $dest")
    val rows = tables.map { t =>
      val tdir = s"$dir/$t"
      operators.Snapshot.resolve(spark, tdir).createOrReplaceTempView(t)
      if (!dest.endsWith(".zip")) spark.conf.set(s"graft.snapshot.$db.$t", tdir)
      // row count from the manifest — metadata-scale, no data footers
      val n = operators.Snapshot.parts(spark, tdir)
        .agg(sum("n_rows")).head.getLong(0)
      (t, n)
    }
    rows.toDF("table", "n_rows")
  }

  /** The snapshot directory a named table's mutations run against. */
  private def snapshotDirOf(spark: SparkSession, table: String): String = {
    val dir = spark.conf.getOption(s"graft.snapshot.$table").getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot registered for table '$table' — BACKUP TABLE it " +
          s"first or SET graft.snapshot.$table = <snapshot dir>"))
    require(!dir.endsWith(".zip"),
      s"snapshot of '$table' is a zip archive ($dir) — mutations need the " +
        "partitioned-directory arm (a zip is an immutable interchange object)")
    dir
  }

  private def alterUpdate(spark: SparkSession, table: String,
      rest: String): DataFrame = {
    val whereAt = lastTopLevelKeyword(rest, "WHERE")
    require(whereAt >= 0, "ALTER TABLE … UPDATE requires a WHERE clause")
    val assigns = splitTopLevelCommas(rest.substring(0, whereAt)).map {
      case AssignRe(name, e) => name -> expr(e.trim)
      case bad => throw new IllegalArgumentException(
        s"cannot parse UPDATE assignment: $bad — expected column = expression")
    }.toMap
    val pred = expr(rest.substring(whereAt + "WHERE".length).trim)
    report(spark, "UPDATE", table,
      operators.Snapshot.update(spark, snapshotDirOf(spark, table), pred, assigns))
  }

  private def optimize(spark: SparkSession, table: String,
      deduplicate: Boolean): DataFrame = {
    import spark.implicits._
    val dir = snapshotDirOf(spark, table)
    if (deduplicate)
      report(spark, "OPTIMIZE DEDUPLICATE", table,
        operators.Snapshot.deduplicate(spark, dir))
    else {
      val r = operators.Snapshot.compact(spark, dir)
      Seq(("OPTIMIZE FINAL", table, r.daysCompacted.length.toLong,
        r.filesBefore, r.filesAfter))
        .toDF("command", "table", "days_compacted", "files_before", "files_after")
    }
  }

  // ── ClickHouse DDL (CREATE TABLE … ENGINE, CREATE DICTIONARY) ──────

  /** First top-level (outside parens/strings) match of `re` in `s`. */
  private def topLevelMatches(s: String,
      re: scala.util.matching.Regex): Seq[scala.util.matching.Regex.Match] = {
    // paren/string depth at each offset, precomputed once
    val depth = new Array[Int](s.length + 1)
    var d = 0; var inStr = false; var i = 0
    while (i < s.length) {
      depth(i) = d
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ => ()
      }
      i += 1
    }
    depth(s.length) = d
    re.findAllMatchIn(s).filter(m => depth(m.start) == 0).toSeq
  }

  private val DdlClauseRe =
    """(?is)\b(PARTITION\s+BY|ORDER\s+BY|PRIMARY\s+KEY|SAMPLE\s+BY|TTL|SETTINGS|COMMENT)\b""".r

  /** DDL tail `ORDER BY … PARTITION BY … SAMPLE BY …` → normalized
    * clause name → body text (sliced between consecutive top-level
    * clause keywords).
    */
  private def ddlClauses(tail: String): Map[String, String] = {
    val ms = topLevelMatches(tail, DdlClauseRe)
    ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.length) ms(i + 1).start else tail.length
      m.group(1).toUpperCase(java.util.Locale.ROOT).replaceAll("\\s+", " ") ->
        tail.substring(m.end, end).trim
    }.toMap
  }

  /** ClickHouse column type → Spark SQL DDL type. Wrapper erasure
    * (`Nullable`/`LowCardinality` are nullability/encoding metadata —
    * Spark columns are nullable by default and dictionary encoding is
    * parquet's own); unsigned ints widen one level (UInt8→SMALLINT …)
    * except UInt64→BIGINT, whose top bit has no lossless home
    * (documented: values above 2^63−1 are out of contract).
    */
  private[graft] def chType(t0: String): String = {
    val t = t0.trim
    val TypeRe = """(?s)^(\w+)\s*(?:\((.*)\))?$""".r
    t match {
      case TypeRe(name, argsOrNull) =>
        val args = Option(argsOrNull).map(_.trim).getOrElse("")
        name.toLowerCase(java.util.Locale.ROOT) match {
          case "nullable" | "lowcardinality" => chType(args)
          case "array" => s"ARRAY<${chType(args)}>"
          case "map" =>
            val kv = splitTopLevelCommas(args)
            require(kv.length == 2, s"Map needs two type arguments: $t")
            s"MAP<${chType(kv(0))}, ${chType(kv(1))}>"
          case "tuple" =>
            val fields = splitTopLevelCommas(args).zipWithIndex.map {
              case (f, i) =>
                val parts = f.trim.split("\\s+", 2)
                if (parts.length == 2 && parts(0).forall(c =>
                    c.isLetterOrDigit || c == '_'))
                  s"${parts(0)}: ${chType(parts(1))}"
                else s"_${i + 1}: ${chType(f)}"
            }
            s"STRUCT<${fields.mkString(", ")}>"
          case "string" | "uuid" | "ipv4" | "ipv6" | "fixedstring"
             | "enum8" | "enum16" | "enum" | "json" => "STRING"
          case "int8" => "TINYINT"
          case "int16" => "SMALLINT"
          case "int32" => "INT"
          case "int64" => "BIGINT"
          case "uint8" => "SMALLINT"
          case "uint16" => "INT"
          case "uint32" | "uint64" => "BIGINT"
          case "float32" => "FLOAT"
          case "float64" => "DOUBLE"
          case "bool" | "boolean" => "BOOLEAN"
          case "date" | "date32" => "DATE"
          case "datetime" | "datetime64" => "TIMESTAMP"
          case "decimal" => s"DECIMAL($args)"
          case "decimal32" => s"DECIMAL(9, $args)"
          case "decimal64" => s"DECIMAL(18, $args)"
          case "decimal128" => s"DECIMAL(38, $args)"
          case _ => throw new IllegalArgumentException(
            s"unsupported ClickHouse column type: $t0")
        }
      case _ => throw new IllegalArgumentException(
        s"cannot parse ClickHouse column type: $t0")
    }
  }

  private val ColAttrRe =
    """(?is)\b(DEFAULT|MATERIALIZED|ALIAS|EPHEMERAL|CODEC|COMMENT|TTL)\b""".r

  /** One column entry `name Type [DEFAULT lit] [CODEC(…)] [COMMENT …]`
    * → (name, sparkType, default literal). MATERIALIZED/ALIAS columns
    * are computed-on-read server magic — refused, not dropped. INDEX /
    * PROJECTION / CONSTRAINT entries are physical-layout metadata with
    * no bearing on answers and are skipped (graft's skip/z-order
    * indexes and projections are their own registered machinery).
    */
  private def parseColDefs(block: String): Seq[(String, String, Option[String])] =
    splitTopLevelCommas(block).flatMap { entry =>
      val e = entry.trim
      val headWord = e.split("\\s+", 2)(0).toUpperCase(java.util.Locale.ROOT)
      if (Seq("INDEX", "PROJECTION", "CONSTRAINT").contains(headWord)) None
      else {
        val sp = e.indexWhere(_.isWhitespace)
        require(sp > 0, s"cannot parse column definition: $entry")
        val name = e.substring(0, sp).stripPrefix("`").stripSuffix("`")
        val rest = e.substring(sp + 1).trim
        val attrs = topLevelMatches(rest, ColAttrRe)
        attrs.headOption.foreach { m =>
          val kw = m.group(1).toUpperCase(java.util.Locale.ROOT)
          require(!Seq("MATERIALIZED", "ALIAS", "EPHEMERAL").contains(kw),
            s"$kw columns are computed server-side in ClickHouse and have no " +
              s"table-DDL equivalent here: $entry")
        }
        val typeTxt = attrs.headOption.fold(rest)(m => rest.substring(0, m.start)).trim
        val dflt = attrs.find(_.group(1).equalsIgnoreCase("DEFAULT")).map { m =>
          val after = rest.substring(m.end)
          val stop = topLevelMatches(after, ColAttrRe)
            .headOption.map(_.start).getOrElse(after.length)
          after.substring(0, stop).trim
        }
        Some((name, chType(typeTxt), dflt))
      }
    }

  private val HashedSampleRe = """(?is)^\w+\s*\(\s*([\w.]+)\s*\)$""".r

  /** `CREATE TABLE … ENGINE = <engine>[(args)] [ORDER BY …] [SAMPLE BY
    * …] [PARTITION BY …]` — the first statement of every ClickHouse
    * session, routed so that FINAL / SAMPLE / dictGet need ZERO Scala:
    *
    *  - the table is created in the session catalog as a managed
    *    parquet table (columns type-mapped via [[chType]]; literal
    *    DEFAULTs pass through to Spark's column-default support);
    *  - `ReplacingMergeTree(ver) ORDER BY k…` registers exactly the
    *    key/version metadata [[plans.Dialect.registerFinal]] carries —
    *    what ClickHouse itself does with this clause pair (the
    *    reference presumes it ran server-side before `BACKUP DATABASE`,
    *    backup.sh:45, engine pinned Dockerfile:2);
    *  - `SAMPLE BY col` (or `SAMPLE BY someHash(col)` — the hash is
    *    ClickHouse's randomizer; graft's md5-bucket predicate is ours)
    *    registers the sample key;
    *  - `ORDER BY` / `PARTITION BY` land in session conf as layout
    *    metadata (`graft.orderby.*` / `graft.partition.*`): physical
    *    hints that change no answer — graft snapshots bucket by day at
    *    BACKUP time, and Catalyst orders scans itself.
    *
    * Engines with read-time collapse semantics OTHER than replacing
    * (Summing/Aggregating/Collapsing) refuse: their merge behavior is
    * a query transform, not registrable metadata — the engine's
    * explicit collapse operators (q_collapse_*) are the translation.
    */
  private def createTable(spark: SparkSession, ifNotExists: Boolean,
      name: String, colsBlock: String, engine: String, engineArgs: String,
      tail: String): DataFrame = {
    import spark.implicits._
    val cols = parseColDefs(colsBlock)
    require(cols.nonEmpty, s"CREATE TABLE $name: no columns")
    val clauses = ddlClauses(tail)
    val simpleName = name.split('.').last
    val orderKeys = clauses.get("ORDER BY").map { txt =>
      val inner = if (txt.startsWith("(") && txt.endsWith(")"))
        txt.substring(1, txt.length - 1) else txt
      splitTopLevelCommas(inner).filterNot(_.equalsIgnoreCase("tuple()"))
    }.getOrElse(Nil)
    engine.toLowerCase(java.util.Locale.ROOT) match {
      case "mergetree" | "memory" | "log" | "tinylog" | "stripelog" => ()
      case "replacingmergetree" =>
        require(engineArgs.nonEmpty,
          "ReplacingMergeTree without an explicit version column collapses by " +
            "INSERTION ORDER — not reproducible on a distributed engine. " +
            "Declare ReplacingMergeTree(<version column>)")
        require(orderKeys.nonEmpty,
          "ReplacingMergeTree needs ORDER BY keys — they are the collapse " +
            "key FINAL groups by")
        plans.Dialect.registerFinal(spark, simpleName, orderKeys,
          splitTopLevelCommas(engineArgs))
      case "summingmergetree" =>
        // sum-collapse IS registrable metadata: keys + summed columns.
        // No argument list = ClickHouse's default (every numeric
        // non-key column), resolved against the schema at FINAL time.
        require(orderKeys.nonEmpty,
          "SummingMergeTree needs ORDER BY keys — they are the collapse " +
            "key FINAL sums under")
        val summed = if (engineArgs.isEmpty) Nil
          else splitTopLevelCommas(engineArgs)
        require(summed.forall(c => !orderKeys.contains(c)),
          "SummingMergeTree summed columns cannot include the ORDER BY keys")
        plans.Dialect.registerSumFinal(spark, simpleName, orderKeys, summed)
      case _ => throw new IllegalArgumentException(
        s"unsupported table engine: $engine — MergeTree, " +
          "ReplacingMergeTree(ver), SummingMergeTree([cols]) and the plain " +
          "engines (Memory/Log) route; Aggregating/CollapsingMergeTree " +
          "read-time merges depend on agg-state types or insertion order — " +
          "not reproducible as registrable metadata; use the engine's " +
          "explicit collapse operators (q_collapse_*)")
    }
    clauses.get("SAMPLE BY").foreach { expr0 =>
      val keyCol = expr0.trim match {
        case HashedSampleRe(c) => c
        case w if w.matches("[\\w.]+") => w
        case other => throw new IllegalArgumentException(
          s"SAMPLE BY must be a column or hash(column), got: $other")
      }
      plans.Dialect.registerSample(spark, simpleName, keyCol)
    }
    if (orderKeys.nonEmpty)
      spark.conf.set(s"graft.orderby.$simpleName", orderKeys.mkString(","))
    clauses.get("PARTITION BY").foreach(e =>
      spark.conf.set(s"graft.partition.$simpleName", e))
    val colDdl = cols.map { case (n, t, d) =>
      s"$n $t" + d.fold("")(x => s" DEFAULT $x")
    }.mkString(", ")
    val ifne = if (ifNotExists) "IF NOT EXISTS " else ""
    spark.sql(s"CREATE TABLE $ifne$name ($colDdl) USING parquet")
    Seq(("CREATE TABLE", name, engine, orderKeys.mkString(","), true))
      .toDF("command", "table", "engine", "order_by", "ok")
  }

  private val SourceTableRe = """(?is)\bTABLE\s+'([\w.]+)'""".r

  /** `CREATE DICTIONARY d (k T, attr T [DEFAULT lit] …) PRIMARY KEY k
    * SOURCE(… TABLE '<src>' …) LAYOUT(…) [LIFETIME(…)]` — registers
    * the dictionary [[plans.Dialect]] resolves `dictGet` against. The
    * LAYOUT/LIFETIME clauses are ClickHouse's in-memory cache tuning —
    * here the "layout" is Catalyst's own plan for the dictGet join
    * (aggregate + broadcast-able left outer join), so they are
    * accepted and ignored. Attribute DEFAULTs become the key-miss
    * values; an attribute WITHOUT one surfaces NULL on a miss where
    * ClickHouse renders the type default (0 / '') — declare the
    * DEFAULT to pin the exact ClickHouse behavior.
    */
  private def createDictionary(spark: SparkSession, ifNotExists: Boolean,
      name: String, colsBlock: String, key: String, tail: String): DataFrame = {
    import spark.implicits._
    val cols = parseColDefs(colsBlock)
    require(cols.exists(_._1 == key),
      s"PRIMARY KEY $key is not among the dictionary's columns")
    val src = SourceTableRe.findFirstMatchIn(tail).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(
        "CREATE DICTIONARY needs SOURCE(… TABLE '<table>' …) — the relation " +
          "the dictionary reads"))
    require(scala.util.Try(spark.table(src)).isSuccess,
      s"dictionary source table '$src' is not resolvable in the session catalog")
    val defaults = cols.collect { case (n, _, Some(d)) => n -> d }.toMap
    plans.Dialect.registerDictionary(spark, name.split('.').last, src, key, defaults)
    Seq(("CREATE DICTIONARY", name, src, key, true))
      .toDF("command", "dictionary", "source", "key", "ok")
  }

  private def report(spark: SparkSession, cmd: String, table: String,
      r: operators.Snapshot.MutationReport): DataFrame = {
    import spark.implicits._
    Seq((cmd, table, r.daysRewritten.length.toLong,
      r.daysDropped.length.toLong, r.rowsAffected))
      .toDF("command", "table", "days_rewritten", "days_dropped", "rows_affected")
  }

  private def okRow(spark: SparkSession, cmd: String, table: String): DataFrame = {
    import spark.implicits._
    Seq((cmd, table, true)).toDF("command", "table", "ok")
  }

  // ── tiny top-level scanners (outside '…' strings and parens) ──────

  /** Index of the LAST top-level occurrence of a keyword. */
  private def lastTopLevelKeyword(s: String, kw: String): Int = {
    var depth = 0; var inStr = false; var i = 0; var last = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && i + kw.length <= s.length &&
              s.regionMatches(true, i, kw, 0, kw.length) &&
              (i == 0 || s.charAt(i - 1).isWhitespace) &&
              (i + kw.length == s.length || s.charAt(i + kw.length).isWhitespace))
            last = i
      }
      i += 1
    }
    last
  }

  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
