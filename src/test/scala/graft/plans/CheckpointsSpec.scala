package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Storage-hygiene contracts of [[Checkpoints]]: `free` releases the
  * blocks `Dataset.unpersist` silently misses, and `freeExcept` scopes
  * the release to the checkpoints a composite plan OWNS — the governed
  * ingest loops free a screen's inner multi-probe checkpoint mid-batch
  * while the batch checkpoint (a leaf of the same plan) must stay
  * persisted for the rest of the batch.
  */
class CheckpointsSpec extends SparkSpec {

  private def leafRdds(df: Dataset[_]) =
    df.queryExecution.analyzed.collectLeaves()
      .collect { case lr: LogicalRDD => lr.rdd }

  test("freeExcept releases inner checkpoints but keeps the kept frame") {
    val b = spark.range(100).toDF("id").localCheckpoint()
    val inner = b.filter(col("id") % 2 === 0).localCheckpoint()
    val composite = inner.join(b, "id")
    // the composite plan has BOTH checkpoints as leaves
    assert(leafRdds(composite).map(_.id).toSet ==
      (leafRdds(b) ++ leafRdds(inner)).map(_.id).toSet)

    Checkpoints.freeExcept(composite, b)
    assert(leafRdds(inner).head.getStorageLevel == StorageLevel.NONE,
      "inner checkpoint must be unpersisted")
    assert(leafRdds(b).head.getStorageLevel != StorageLevel.NONE,
      "kept frame's checkpoint must survive freeExcept")
    // the kept frame is still fully usable after the scoped free
    assert(b.count() == 100)

    Checkpoints.free(b)
    assert(leafRdds(b).head.getStorageLevel == StorageLevel.NONE)
  }

  test("free releases a checkpointed frame's blocks (unpersist no-op case)") {
    val ck = spark.range(10).toDF("id").localCheckpoint()
    ck.unpersist() // documented silent no-op on checkpointed frames
    assert(leafRdds(ck).head.getStorageLevel != StorageLevel.NONE)
    Checkpoints.free(ck)
    assert(leafRdds(ck).head.getStorageLevel == StorageLevel.NONE)
  }
}
