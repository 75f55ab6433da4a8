package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the audit step of an incremental corpus update: given
  * yesterday's and today's versions of a keyed dataset, classify every
  * key as added / removed / changed / unchanged. Downstream, `added` and
  * `changed` rows are what the ingest pipeline (dedup, quality, index)
  * actually needs to process; `removed` drives retraction.
  *
  * Scale shape: ONE full-outer sort-merge join on the key — both sides
  * shuffle once on the same partitioning, payload comparison is a narrow
  * codegen'd projection (null-safe column equality, no fingerprint
  * round-trip), and the result streams out without further exchange. At
  * 100 TB the join is the floor for an exact diff; the cheaper screen
  * (when most keys are unchanged) is a Bloom pre-filter of the key+hash
  * pairs — compose with [[Dedup.bloomFilter]].
  */
object Diff {

  /** (keys..., status) for every key in either snapshot. Payload = every
    * shared non-key column; comparison is null-safe (`<=>`), so a column
    * going null↔value reads as changed, null↔null as equal.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains)
      .filter(newDf.columns.contains(_)).toSeq
    require(payload.nonEmpty, "snapshots share no payload columns to compare")
    // Presence is tracked with explicit flags, NOT key nullness: a row
    // whose key column is itself null (never matched by the equi-join)
    // must still classify by the side it came from.
    val o = oldDf.select((keys ++ payload).map(c => col(c).as(s"__o_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newDf.select((keys ++ payload).map(c => col(c).as(s"__n_$c")) :+
      lit(true).as("__in_new"): _*)
    val joinCond = keys.map(k => col(s"__o_$k") === col(s"__n_$k"))
      .reduce(_ && _)
    val same = payload.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduce(_ && _)
    val keyIsOld = coalesce(col("__in_old"), lit(false))
    val keyIsNew = coalesce(col("__in_new"), lit(false))
    o.join(n, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) :+
          when(!keyIsOld, lit("added"))
            .when(!keyIsNew, lit("removed"))
            .when(same, lit("unchanged"))
            .otherwise(lit("changed")).as("status"): _*)
  }
}
