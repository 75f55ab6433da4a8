package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * Spark's partial aggregation already absorbs value skew for algebraic
  * aggregates, and AQE splits skewed shuffle partitions for sort-merge
  * joins — but broadcast-ineligible joins with a few hot keys still
  * funnel every hot-key row through one reducer. Salting spreads each hot
  * key over `salts` sub-keys: the big side gets a per-row salt, the small
  * side is replicated once per salt value, and the join key becomes
  * (key, salt). The join RESULT is salt-invariant, so the transformation
  * is semantically free; the cost is replicating the small side ×salts.
  */
object Skew {

  /** Equi-join `left` (big, skewed) with `right` (small) on `keys`,
    * spreading each left key over `salts` sub-keys. Use when the right
    * side is too big to broadcast but small enough to replicate ×salts.
    *
    * The per-row salt comes from `monotonically_increasing_id` — its exact
    * values are partition-layout-dependent, but any assignment works: the
    * join output never depends on which salt a row got.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation producing per-key sum/count/avg. For
    * algebraic aggregates Spark's map-side partial aggregation usually
    * suffices; this explicit form exists for pipelines that need the
    * intermediate (key, salt) granularity — e.g. to bound reducer state
    * when a single key dominates a non-combinable downstream op.
    */
  def saltedSumCountAvg(df: DataFrame, keys: Seq[String], valCol: String,
                        salts: Int): DataFrame = {
    require(salts > 0)
    val keyCols: Seq[Column] = keys.map(col)
    val phase1 = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valCol)).as("__s"), count(lit(1)).as("__c"))
    phase1
      .groupBy(keyCols: _*)
      .agg(sum(col("__s")).as("sum_val"), sum(col("__c")).as("cnt"))
      .withColumn("avg_val", col("sum_val") / col("cnt"))
  }
}
