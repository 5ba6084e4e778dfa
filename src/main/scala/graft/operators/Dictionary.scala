package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse external-dictionary layer (`dictGet` /
  * `dictGetOrDefault` — a staple lookup surface of the engine the
  * reference snapshots; its dictionaries are backed up with the
  * database by `BACKUP DATABASE`, backup.sh:45).
  *
  * Spark-first shape: a dictionary IS a broadcast hash join. The dict
  * table is dimension-scale by definition (it fits an external
  * key-value source), so the lookup broadcasts it to every executor
  * and the fact side never shuffles — `dictGet` over 100 TB of facts
  * costs one scan, zero exchanges. Misses surface as the caller's
  * default (dictGetOrDefault), never as dropped rows: the join is
  * LEFT, and `coalesce` applies the default after it.
  */
object Dictionary {

  /** Append `asCol` = dictGetOrDefault(dict, attr, factKey, default).
    *
    * `dict` must be unique on `dictKey` (a dictionary, not a
    * relation) — enforced cheaply at plan time by a broadcast-side
    * distinct-count guard in the spec, and semantically here: a
    * duplicate key would duplicate fact rows, which a lookup must
    * never do.
    */
  def dictGetOrDefault(fact: DataFrame, dict: DataFrame, factKey: Column,
      dictKey: String, attr: String, default: Column, asCol: String): DataFrame = {
    // ids-only dict projection: broadcast carries (key, attr), nothing else
    val d = dict.select(col(dictKey).as("_dict_key"), col(attr).as("_dict_attr"))
    fact.join(broadcast(d), factKey === col("_dict_key"), "left")
      .withColumn(asCol, coalesce(col("_dict_attr"), default))
      .drop("_dict_key", "_dict_attr")
  }

  /** Strict `dictGet`: a miss is an error in ClickHouse without a
    * default — surfaced here as a null the caller can assert on, via
    * the same left-broadcast shape.
    */
  def dictGet(fact: DataFrame, dict: DataFrame, factKey: Column,
      dictKey: String, attr: String, asCol: String): DataFrame =
    dictGetOrDefault(fact, dict, factKey, dictKey, attr, lit(null), asCol)
}
