package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CollapsingMergeTree maintained ON A STREAM — the streaming analog
  * of `operators.Analytics.collapse` (q_collapse_sign): every row
  * carries a sign (+1 insert / −1 cancel); the keyed state is the
  * sign-weighted net (net count, net value, row count), and each
  * micro-batch emits the refreshed net for every key it touched
  * (Update semantics — downstream applies the FINAL filter `net > 0`
  * whenever it reads, exactly like querying a CollapsingMergeTree
  * with FINAL).
  *
  * Scale shape: state is three numbers per key — O(keys) total,
  * independent of stream length, so no watermark eviction is needed
  * (this is a running net, not a windowed one). The shuffle is on the
  * key only. Arrivals fold in (sign, v) order so replays reproduce
  * the same floating-point sum.
  */
object StreamCollapse {

  final case class SignRow(key: String, sign: Long, v: Double)

  final case class NetRow(key: String, net: Long, net_value: Double, n_rows: Long)

  /** Per-key running collapse over a stream with columns
    * (key string, sign long, v double).
    */
  def collapse(rows: DataFrame): Dataset[NetRow] = {
    import rows.sparkSession.implicits._
    rows
      .selectExpr("CAST(key AS STRING) AS key", "CAST(sign AS LONG) AS sign",
        "CAST(v AS DOUBLE) AS v")
      .as[SignRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Double, Long), NetRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[SignRow], state: GroupState[(Long, Double, Long)]) =>
          val (n0, v0, c0) = state.getOption.getOrElse((0L, 0.0, 0L))
          // deterministic fold order: batch arrival order is arbitrary
          // under shuffles/retries, and double addition is not
          // associative
          val rows = it.toArray.sortBy(r => (r.sign, r.v))
          var net = n0; var nv = v0; var c = c0
          rows.foreach { r => net += r.sign; nv += r.sign * r.v; c += 1 }
          state.update((net, nv, c))
          Iterator(NetRow(key, net, nv, c))
      }
  }
}
