package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.roundHalfUp

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

  /** Distribution drift between two snapshots of a keyed population —
    * the monitoring step of an incremental corpus: per category (source
    * domain, language, quality bucket, …) the share in each snapshot,
    * the Laplace-smoothed KL-divergence contribution KL(a ‖ b), and the
    * total-variation contribution |p_a − p_b| / 2. Summing `kl_term` /
    * `tv_term` over the result gives the corpus-level drift scalars;
    * per-category rows localize WHICH stratum moved (the actionable part
    * of a drift alert).
    *
    * Laplace add-one smoothing over the union key set keeps both
    * distributions strictly positive, so a category present in one
    * snapshot only contributes a finite, correctly-signed KL term
    * instead of ∞ / a dropped row.
    *
    * Scale shape: one hash aggregation per side (map-side partials carry
    * (key, count) — shuffle is O(distinct keys)), a full-outer merge on
    * the key, and a single-row totals aggregate broadcast back. Driver
    * never touches data; nothing here grows with corpus size, only with
    * category cardinality.
    */
  def distributionDrift(a: DataFrame, b: DataFrame, key: String): DataFrame =
    distributionDriftCounts(
      a.groupBy(col(key)).agg(count(lit(1)).as("cnt_a")),
      b.groupBy(col(key)).agg(count(lit(1)).as("cnt_b")), key)

  /** [[distributionDrift]] from PRE-AGGREGATED sides: `ca` = (key,
    * cnt_a), `cb` = (key, cnt_b). The form a long-lived monitor wants —
    * a 100 TB blessed corpus is represented once by its O(categories)
    * category counts and never re-scanned per comparison (see
    * `StreamOps.driftMonitorStream`). */
  def distributionDriftCounts(ca: DataFrame, cb: DataFrame,
                              key: String): DataFrame = {
    val merged = ca.join(cb, Seq(key), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = merged.agg(
      sum(col("cnt_a")).as("__tot_a"), sum(col("cnt_b")).as("__tot_b"),
      count(lit(1)).as("__k"))
    val pA = (col("cnt_a") + lit(1)).cast("double") /
      (col("__tot_a") + col("__k")).cast("double")
    val pB = (col("cnt_b") + lit(1)).cast("double") /
      (col("__tot_b") + col("__k")).cast("double")
    merged.crossJoin(broadcast(totals))
      .select(col(key), col("cnt_a"), col("cnt_b"),
        roundHalfUp(pA, 6).as("p_a"),
        roundHalfUp(pB, 6).as("p_b"),
        roundHalfUp(pA * log(pA / pB), 6).as("kl_term"),
        roundHalfUp(abs(pA - pB) / lit(2.0), 6).as("tv_term"))
      .orderBy(col(key))
  }
}
