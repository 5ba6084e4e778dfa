package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** `system.query_log` analog — ClickHouse writes one audit row per
  * query (type, duration, read/result rows, exception) into a system
  * table every operator alerts on; the reference's operational loop
  * (backup.sh's ticks against the server) assumes that telemetry
  * exists. Spark's native hook for the same signal is
  * [[QueryExecutionListener]]: one callback per Dataset action with
  * the full [[QueryExecution]] and wall time, which this listener
  * flattens into the query_log row shape.
  *
  * Scale posture: the log is BOUNDED (ring buffer, default 1024) and
  * row-per-ACTION, not row-per-task — pure driver-side metadata, zero
  * executor cost beyond the SQLMetrics Spark already collects. On a
  * real cluster the sink would be a periodic append of this buffer to
  * a parquet table (the system-table flush loop); the in-memory
  * surface here is the queryable core of that.
  */
final class QueryLogListener(capacity: Int = 1024) extends QueryExecutionListener {

  /** One action = one row. Mirrors system.query_log's core columns:
    * event time, query kind, status, duration, result/read rows,
    * exception text. Row counts are Options — an action whose final
    * plan exposes no `numOutputRows` metric (e.g. a foreach sink)
    * records None, never a guess.
    */
  final case class Entry(
      eventTimeMs: Long,
      funcName: String,
      status: String,
      durationNs: Long,
      resultRows: Option[Long],
      readRows: Option[Long],
      error: Option[String])

  private val buf = new ArrayBuffer[Entry]

  private def add(e: Entry): Unit = synchronized {
    buf += e
    if (buf.length > capacity) buf.remove(0, buf.length - capacity)
  }

  /** Pre-order flatten with every AQE wrapper peeled: the executed
    * tree hides the real operators behind AdaptiveSparkPlanExec /
    * QueryStageExec shells whose own `metrics`/leaves describe the
    * wrapper, not the work.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case r: ReusedExchangeExec => p +: flatten(r.child)
    case _ => p +: p.children.flatMap(flatten)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val nodes = flatten(qe.executedPlan)
    // result rows = the top-most node that reports an output-row
    // metric (the final operator of the last stage).
    val result = nodes.iterator
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).nextOption()
    // read rows = sum of leaf-scan output metrics (query_log.read_rows):
    // what the scans produced AFTER pushed filters — the I/O signal.
    val leaves = nodes.filter(_.children.isEmpty)
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    add(Entry(System.currentTimeMillis(), funcName, "Success", durationNs,
      result, if (leaves.isEmpty) None else Some(leaves.sum), None))
  }

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
    add(Entry(System.currentTimeMillis(), funcName, "ExceptionWhileProcessing",
      0L, None, None, Option(ex.toString)))

  def entries: Seq[Entry] = synchronized(buf.toVector)

  def clear(): Unit = synchronized(buf.clear())
}

object QueryLog {

  /** Register a fresh listener on the session; returns it for
    * [[asDf]]/[[QueryLogListener.entries]] reads and [[uninstall]].
    */
  def install(spark: SparkSession, capacity: Int = 1024): QueryLogListener = {
    val l = new QueryLogListener(capacity)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: QueryLogListener): Unit =
    spark.listenerManager.unregister(l)

  /** The audit buffer as a DataFrame — `SELECT * FROM system.query_log`.
    * Model-scale by construction (≤ capacity rows from the driver).
    */
  def asDf(spark: SparkSession, l: QueryLogListener): DataFrame = {
    import spark.implicits._
    l.entries.map(e => (e.eventTimeMs, e.funcName, e.status, e.durationNs,
        e.resultRows, e.readRows, e.error))
      .toDF("event_time_ms", "func_name", "status", "duration_ns",
        "result_rows", "read_rows", "error")
  }
}
