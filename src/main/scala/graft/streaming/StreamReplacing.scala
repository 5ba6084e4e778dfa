package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ReplacingMergeTree FINAL maintained ON A STREAM — the streaming
  * twin of `q_replacing_final` (keep-latest-by-version per key): each
  * arriving row carries a monotone version; the keyed state is the
  * current winner (max version seen, its value, and the version
  * count), and every micro-batch emits the refreshed winner for each
  * key it touched (Update semantics — reading the sink's latest row
  * per key IS querying the table with FINAL).
  *
  * Scale shape: state is one (version, value, count) triple per key —
  * O(keys), independent of stream length, so no watermark eviction is
  * needed (a running latest, not a windowed one). The shuffle is on
  * the key only. The fold takes the max version, which is commutative
  * and idempotent per row — replays and batch boundaries cannot
  * change the winner.
  */
object StreamReplacing {

  final case class VerRow(key: String, ver: Long, v: Double)

  final case class LatestRow(key: String, last_ver: Long, last_value: Double,
      n_versions: Long)

  /** Per-key keep-latest over a stream with columns
    * (key string, ver long, v double). Ties on `ver` break toward the
    * larger value — deterministic under replays regardless of arrival
    * order (ClickHouse keeps the last-inserted part on equal versions,
    * which is ingestion-order-dependent; a stream needs an order-free
    * rule).
    */
  def replacing(rows: DataFrame): Dataset[LatestRow] = {
    import rows.sparkSession.implicits._
    rows
      .selectExpr("CAST(key AS STRING) AS key", "CAST(ver AS LONG) AS ver",
        "CAST(v AS DOUBLE) AS v")
      .as[VerRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Double, Long), LatestRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[VerRow], state: GroupState[(Long, Double, Long)]) =>
          var has = state.exists
          var (ver, v, n) = state.getOption.getOrElse((0L, 0.0, 0L))
          it.foreach { r =>
            if (!has || r.ver > ver || (r.ver == ver && r.v > v)) {
              ver = r.ver; v = r.v; has = true
            }
            n += 1
          }
          state.update((ver, v, n))
          Iterator(LatestRow(key, ver, v, n))
      }
  }
}
