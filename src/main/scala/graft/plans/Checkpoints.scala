package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for `localCheckpoint`ed frames.
  *
  * `Dataset.unpersist()` is a SILENT NO-OP on a checkpointed frame: it
  * routes through the CacheManager, which only tracks cached *queries*
  * (`InMemoryRelation`), while `localCheckpoint()` persists the
  * materialized `RDD[InternalRow]` underneath a `LogicalRDD` leaf — a
  * storage registration the CacheManager never sees. Iterative operators
  * that checkpoint per round (connected components, any Pregel-style
  * loop) would therefore accumulate every round's blocks until the
  * ContextCleaner happened to GC the RDD references — measured here as 4
  * orphaned persisted RDDs after a 3-round non-converged probe, despite
  * unpersist() being called on every frame.
  *
  * [[free]] releases the blocks for real: it reaches the `LogicalRDD`
  * leaf of the checkpointed plan and unpersists the underlying RDD
  * (non-blocking, like `Dataset.unpersist`). For non-checkpointed frames
  * it falls back to `Dataset.unpersist()`, so call sites can treat it as
  * a strictly-better drop-in.
  */
object Checkpoints {

  /** Release the storage behind `df`: checkpoint RDD blocks if `df` is a
    * (local)checkpointed frame, cached-query blocks otherwise. Safe to
    * call on any frame; never throws on an unexpected plan shape.
    */
  def free(df: Dataset[_]): Unit = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val rdds = leaves.collect { case lr: LogicalRDD => lr.rdd }
    if (rdds.nonEmpty) rdds.foreach(_.unpersist(blocking = false))
    else df.unpersist()
  }

  /** [[free]] scoped to the checkpoints `df` OWNS: leaves whose RDD also
    * backs one of the `keep` frames stay persisted. A composite plan
    * (e.g. a screen built OVER an input checkpoint that the caller still
    * needs) can then release its inner materializations mid-flow without
    * relying on "nothing downstream references the input" as an
    * unenforced invariant — the input's blocks survive by construction.
    */
  def freeExcept(df: Dataset[_], keep: Dataset[_]*): Unit = {
    val keepIds = keep.flatMap(
      _.queryExecution.analyzed.collectLeaves()
        .collect { case lr: LogicalRDD => lr.rdd.id }).toSet
    df.queryExecution.analyzed.collectLeaves()
      .collect { case lr: LogicalRDD if !keepIds(lr.rdd.id) => lr.rdd }
      .foreach(_.unpersist(blocking = false))
  }
}
