package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.G — set operations. [R] seeds: the four retention tiers
  * are parallel copies of one snapshot stream (backup.sh:31–34 →
  * UNION ALL); GC is a set difference between "all snapshots" and
  * "retained snapshots" (backup.sh:119–122 → EXCEPT); the hardlink
  * fan-out stores one physical payload for N logical copies
  * (backup.sh:67–97 → exact dedup).
  *
  * Scale notes: UNION ALL is metadata-only (no shuffle). INTERSECT /
  * EXCEPT / DISTINCT each hash-shuffle on the full row — at 100 TB run
  * them on pre-projected key columns (as done here), never on wide rows.
  */
object SetOps extends QueryModule {

  def entries: Map[String, QueryDef] = Map(

    "q_union_all" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir).select("event_id", "event_type", "user_id")
        e.filter(col("event_type") === "signup")
          .unionByName(e.filter(col("event_type") === "purchase"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, user_id FROM events WHERE event_type = 'signup'
             |UNION ALL
             |SELECT event_id, event_type, user_id FROM events WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin)),

    // (user, day) pairs active in BOTH signup and purchase streams.
    "q_intersect" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), Retention.bucketDay(col("ts_s")).as("day_key"), col("event_type"))
        e.filter(col("event_type") === "signup").select("user_id", "day_key")
          .intersect(e.filter(col("event_type") === "purchase").select("user_id", "day_key"))
          .orderBy("user_id", "day_key")
      },
      Some("""SELECT user_id, strftime(date_trunc('second', ts), '%Y%m%d') AS day_key
             |FROM events WHERE event_type = 'signup'
             |INTERSECT
             |SELECT user_id, strftime(date_trunc('second', ts), '%Y%m%d') AS day_key
             |FROM events WHERE event_type = 'purchase'
             |ORDER BY user_id, day_key""".stripMargin)),

    // GC delta (backup.sh:119–122): signup-active pairs minus
    // error-active pairs. Spark `except` = EXCEPT DISTINCT, matching SQL.
    "q_except" -> QueryDef(
      (s, dir) => {
        val e = Relational.eventsSec(s, dir)
          .select(col("user_id"), Retention.bucketDay(col("ts_s")).as("day_key"), col("event_type"))
        e.filter(col("event_type") === "signup").select("user_id", "day_key")
          .except(e.filter(col("event_type") === "error").select("user_id", "day_key"))
          .orderBy("user_id", "day_key")
      },
      Some("""SELECT user_id, strftime(date_trunc('second', ts), '%Y%m%d') AS day_key
             |FROM events WHERE event_type = 'signup'
             |EXCEPT
             |SELECT user_id, strftime(date_trunc('second', ts), '%Y%m%d') AS day_key
             |FROM events WHERE event_type = 'error'
             |ORDER BY user_id, day_key""".stripMargin)),

    // Exact dedup (the hardlink identity of backup.sh:67–97): restrict
    // to the dedup key columns first so dropDuplicates ≡ DISTINCT (a
    // deterministic result; dropDuplicates on a wider row keeps an
    // arbitrary survivor).
    "q_dedup_exact" -> QueryDef(
      (s, dir) => Relational.eventsSec(s, dir)
        .select("user_id", "event_type")
        .dropDuplicates("user_id", "event_type")
        .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin))
  )
}
