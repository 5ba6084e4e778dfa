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

  /** RANGE_HASHED dictionary: `dictGet` keyed on (key, point) where
    * the dict row matches iff its key equals and `rangeStart <= point
    * <= rangeEnd` — ClickHouse's range dictionary (currency rates by
    * validity interval, price lists by date). Ranges per key must not
    * overlap (the engine's own contract — an overlap would duplicate
    * fact rows); a point covered by no range surfaces the default.
    *
    * Spark-first shape: the same broadcast LEFT join as [[dictGet]] —
    * the equality key drives a BroadcastHashJoin and the range pair
    * rides along as the join condition, so the fact side still never
    * shuffles and the range probe is a per-row comparison against the
    * broadcast rows of that key (dimension-scale by definition).
    */
  def dictGetRange(fact: DataFrame, dict: DataFrame, factKey: Column,
      point: Column, dictKey: String, rangeStart: String, rangeEnd: String,
      attr: String, default: Column, asCol: String): DataFrame = {
    val d = dict.select(col(dictKey).as("_dict_key"),
      col(rangeStart).as("_dict_r0"), col(rangeEnd).as("_dict_r1"),
      col(attr).as("_dict_attr"))
    fact.join(broadcast(d),
        factKey === col("_dict_key") &&
          point >= col("_dict_r0") && point <= col("_dict_r1"), "left")
      .withColumn(asCol, coalesce(col("_dict_attr"), default))
      .drop("_dict_key", "_dict_r0", "_dict_r1", "_dict_attr")
  }

  /** One level of a hierarchical dictionary: (dict table, its key
    * column, the attribute to surface, and the parent-key column the
    * NEXT level looks up — None at the root).
    */
  final case class DictLevel(dict: DataFrame, key: String, attr: String,
      parentKey: Option[String])

  /** `dictGetHierarchy`: walk a chain of dictionaries from a fact key
    * to the root, surfacing each level's attribute (`asCols`, inner
    * to outer). Each hop is the same broadcast-left shape as
    * [[dictGet]] — hierarchies are dimension-scale at every level, so
    * the whole walk is N broadcasts and ZERO fact shuffles however
    * deep; a miss at any level nulls that level and everything above
    * it (the lookup chain stops), never drops the fact row.
    */
  def dictGetHierarchy(fact: DataFrame, levels: Seq[DictLevel],
      factKey: Column, asCols: Seq[String]): DataFrame = {
    require(levels.size == asCols.size, "one output column per level")
    levels.zip(asCols).zipWithIndex.foldLeft((fact, factKey)) {
      case ((df, key), ((lvl, asCol), i)) =>
        val proj = Seq(col(lvl.key).as(s"_hk_$i"), col(lvl.attr).as("_ha")) ++
          lvl.parentKey.map(p => col(p).as(s"_hp_$i"))
        val d = lvl.dict.select(proj: _*)
        val joined = df.join(broadcast(d), key === col(s"_hk_$i"), "left")
          .withColumn(asCol, col("_ha"))
          .drop(s"_hk_$i", "_ha")
        (joined, lvl.parentKey.map(_ => col(s"_hp_$i")).getOrElse(lit(null)))
    }._1.drop(levels.indices.flatMap(i =>
      levels(i).parentKey.map(_ => s"_hp_$i")): _*)
  }
}
