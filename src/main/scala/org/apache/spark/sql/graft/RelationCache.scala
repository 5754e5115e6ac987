package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, SparkSession}
import org.apache.spark.sql.execution.CachedData

/** Scope-local view of the session's relation cache (the CacheManager
  * entries behind `Dataset.persist` / `spark.catalog.cacheTable`).
  *
  * [[graft.ext.Pinned.scoped]] must release every relation-cache entry
  * its body created WITHOUT touching entries the library caller holds
  * from before the scope — `catalog.clearCache()` is correct only for
  * the degenerate "cache was empty coming in" case. The public catalog
  * API can clear all entries or uncache one by a Dataset handle the
  * scope does not have, so this helper enumerates the manager's entry
  * list (read-only reflection on the private `cachedData` getter — the
  * jar is version-pinned and the shape is asserted, with a documented
  * clearCache fallback if it ever changes) and uncaches exactly the
  * entries that appeared since the snapshot, through the manager's own
  * `uncacheQuery` so both the entry and its buffers go together (an
  * RDD-only unpersist strands a stale entry that poisons later
  * equivalent persists into never-stored recomputes).
  *
  * Lives under `org.apache.spark.sql` to reach `classic.Dataset.ofRows`
  * (the standard pattern for Spark-native extension libraries, same as
  * [[AsOfJoinNative]]).
  */
object RelationCache {

  private def session(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** The manager's current entries, or None if the private getter is
    * not where this Spark version keeps it. */
  private def entries(spark: SparkSession): Option[Seq[CachedData]] =
    try {
      val cm = session(spark).sharedState.cacheManager
      val m = cm.getClass.getDeclaredMethod("cachedData")
      m.setAccessible(true)
      Some(m.invoke(cm).asInstanceOf[Seq[CachedData]])
    } catch { case _: ReflectiveOperationException | _: ClassCastException =>
      None
    }

  /** Identity snapshot of the entries present now. Entry identity is
    * the cached logical plan REFERENCE: retained entries keep their
    * plan object across the manager's internal rebuilds, so a plan ref
    * absent from the snapshot means the entry was created after it.
    * The snapshot holds the plan REFERENCES themselves in an
    * identity-keyed set (not their identityHashCode ints — hash codes
    * are not unique, and a new entry colliding with a pre-scope
    * entry's hash would be spared from [[uncacheNewSince]], a bounded
    * cache leak). (A caller-held entry the body itself forces a
    * recache of — e.g. by overwriting the cached relation's files —
    * gets a fresh plan ref and is claimed by the diff; the scope
    * contract documents that edge.) */
  def snapshot(spark: SparkSession): java.util.Set[AnyRef] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    entries(spark).getOrElse(Nil).foreach(e => s.add(e.plan))
    s
  }

  /** Uncache every relation-cache entry not present in `before`
    * (cascade=false: exactly the new entries, not caller plans built
    * over them). Falls back to `clearCache()` when the entry list is
    * not enumerable — the pre-round-14 blunt behavior, never a leak. */
  def uncacheNewSince(spark: SparkSession,
      before: java.util.Set[AnyRef]): Unit =
    entries(spark) match {
      case None => spark.catalog.clearCache()
      case Some(es) =>
        val cm = session(spark).sharedState.cacheManager
        es.filterNot(e => before.contains(e.plan))
          .foreach { e =>
            cm.uncacheQuery(
              classic.Dataset.ofRows(session(spark), e.plan),
              cascade = false, blocking = false)
          }
    }
}
