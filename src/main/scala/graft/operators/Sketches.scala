package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Mergeable frequency sketches over the portable hash family.
  *
  * The approximate tier (SURVEY.md §2.3) already covers distinct counts
  * (HLL), quantiles, and frequent items with Spark built-ins; this adds
  * the count-min sketch, whose portable-hash construction makes the whole
  * sketch — collisions and overcounts included — reproducible by the
  * DuckDB oracle (see [[graft.functions.CountMinAgg]]).
  */
object Sketches {

  /** ONE-row frame `{sk: array<long>}` — the depth×width count-min sketch
    * of `key` over `df` (decomposable aggregate: map-side partial
    * sketches, shuffle carries d·w·8 bytes per task).
    */
  def countMinSketch(df: DataFrame, key: Column,
                     depth: Int = 4, width: Int = 128): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.agg(GraftFunctions.countMinAgg(
      GraftFunctions.bloomPositions(key, depth, width), depth, width).as("sk"))
  }

  /** Adds `cm_est` — the sketch's count estimate for `key` on every row
    * of `keys` (broadcast of the one-row sketch; no shuffle of `keys`).
    * Estimates never undercount: cm_est ≥ the true count, with equality
    * unless the key collided in all depth rows.
    */
  def countMinEstimates(keys: DataFrame, sketch: DataFrame, key: Column,
                        depth: Int = 4, width: Int = 128): DataFrame = {
    GraftFunctions.register(keys.sparkSession)
    keys.crossJoin(broadcast(sketch))
      .withColumn("cm_est", GraftFunctions.countMinEstimate(col("sk"),
        GraftFunctions.bloomPositions(key, depth, width), width))
      .drop("sk")
  }
}
