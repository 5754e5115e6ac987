package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle scope for EAGER `localCheckpoint(true)` pins.
  *
  * Several operators trade fault tolerance for plan-replay safety by
  * eagerly checkpointing intermediates ([[Graph.triangleCounts]] pins
  * its edge/degree/orientation relations; the filter-funnel query pins
  * its per-row flag frame; every streaming tick pins its micro-batch).
  * `catalog.clearCache()` does NOT release those blocks — they live in
  * the block manager as persisted RDDs outside the relation cache — so
  * a long-lived library caller invoking such an operator in a loop
  * accumulates block-manager state that only dies with the session.
  * The Verify/Bench harness sweeps `sparkContext.getPersistentRDDs`
  * between queries, which masks the leak there but nowhere else.
  *
  * [[scoped]] is the library-caller contract: run the operator inside
  * the scope, get back a SELF-CONTAINED result (one checkpoint pin, the
  * result's own blocks), with every intermediate pin the body created
  * — eager checkpoints and plain persists alike — released before the
  * scope returns. The caller frees the last pin with [[release]] once
  * the result is consumed. One handle in, one handle out, nothing
  * hidden.
  */
object Pinned {

  /** Unpersist every checkpoint block in `df`'s lineage (the pinned
    * `LogicalRDD` leaves). The relation is unusable afterwards — its
    * lineage was truncated at the checkpoint, so the blocks are the
    * only copy. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Evaluate `body` (a plan that may eagerly checkpoint or persist
    * intermediates), materialize its result ONCE as a checkpointed
    * frame, and release every pin the body created on the way — the
    * returned frame's own blocks are the scope's single surviving
    * handle, freed by the caller via [[release]] (or the harness's
    * session sweep).
    *
    * Mechanics: snapshot `getPersistentRDDs` before, diff after the
    * result's checkpoint has materialized, unpersist everything new
    * except the result's own leaf RDDs. Unpersisting a checkpointed
    * intermediate is safe exactly because the result was materialized
    * FIRST — nothing reads the intermediate again; unpersisting a
    * `.persist()` intermediate is always safe (lineage intact).
    *
    * Not safe against a concurrent pinner on the same session (the
    * diff would claim its blocks); the query registry runs operators
    * sequentially per session, which is the intended scope. */
  def scoped(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = body.localCheckpoint(true)
    val keep = out.queryExecution.analyzed.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id) && !keep.contains(id))
        rdd.unpersist(blocking = false)
    }
    out
  }

  /** Pin `df` eagerly, hand the self-contained frame to `body`, and
    * release the pin when `body` finishes — the per-micro-batch form
    * ([[graft.streaming.Streaming]]'s foreachBatch ticks, where the
    * batch is read several times per commit and must not outlive it). */
  def withPinned[T](df: DataFrame)(body: DataFrame => T): T = {
    val pinned = df.localCheckpoint(true)
    try body(pinned) finally release(pinned)
  }
}
