package org.apache.spark.sql

import org.apache.spark.rdd.RDD

/** Bridge to the RDD backing a checkpointed Dataset. `localCheckpoint`
  * stores the materialized rows as executor-local RDD blocks with NO
  * lineage; those blocks are freed only when the backing RDD object is
  * garbage collected on the driver (ContextCleaner), which across a
  * long multi-query session lets checkpoint storage pile up
  * non-deterministically. Resolving the `LogicalRDD` behind the
  * returned Dataset lets `graft.CacheScope` unpersist the blocks
  * deterministically at scope end (classic sessions only, like
  * [[GraftColumnBridge]]). */
object GraftCheckpointBridge {
  def backingRdd(df: Dataset[_]): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
