package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation (SURVEY.md §4, 100 TB posture): salting for
  * the case AQE's skew-join splitting can't reach — e.g. a shuffle
  * whose skew only materializes downstream, or engines/configs without
  * adaptive execution.
  *
  * The shape: the BIG side's hot keys are spread across `salts`
  * sub-keys by a deterministic hash of a row-unique column; the SMALL
  * side is replicated once per salt. The join becomes
  * (key, salt)-partitioned — a hot key's rows land on `salts`
  * partitions instead of one — and the result set is identical to the
  * unsalted join (spec-checked), at the cost of |small| × salts
  * replication.
  *
  * Prefer AQE (`spark.sql.adaptive.skewJoin`, on by default in
  * [[graft.Graft.builder]]); reach for this when the skewed relation
  * also feeds a groupBy on the same hot key, where pre-salting fixes
  * both the join AND the aggregate (partial aggregates per salt, then
  * final merge).
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `salts` ways.
    * `idCol` must be row-unique on the big side (any stable id works —
    * the salt only needs to spread rows, not be meaningful); the salt
    * is a deterministic function of it, so plans are reproducible
    * run-to-run (no `rand()`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, idCol: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
