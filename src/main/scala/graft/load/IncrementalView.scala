package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from a
  * [[VersionedStore.changes]] feed — the lakehouse answer to the
  * reference's continuous-aggregate refresh policy
  * (`/root/reference/sql/001_schema.sql:43-46`): instead of
  * re-aggregating a time window, apply the EXACT row-level delta the
  * change feed already knows.
  *
  * The view is additive — per group a row count `n` and an integer sum
  * `sum_e6` (values quantized to 1e-6 units per ROW before any sum, the
  * engine's exactness discipline) — so delta application is associative
  * and commutative long arithmetic: insert adds a contribution, delete
  * subtracts one, update adds the new minus the old. Incremental
  * maintenance is therefore BIT-EQUAL to recomputation from the
  * snapshot (`q_matview_incremental`'s oracle recomputes; the gate
  * asserts equality), not approximately-equal-modulo-float-order —
  * derived aggregates (averages) divide at read time.
  *
  * Scale (100 TB store, single-day commit): the delta aggregate is
  * change-feed-sized — and the feed itself only scanned rewritten days
  * (manifest diff) — so maintenance cost tracks the COMMIT size, not
  * the view or the store. One shuffle on the view dims for the delta,
  * one co-keyed full-outer join to merge; groups whose count reaches
  * zero drop out.
  */
object IncrementalView {

  /** Build the view from a snapshot: `dims` + `n` + `sum_e6` where
    * `valueE6` is the per-row integer contribution. */
  def fromSnapshot(snap: DataFrame, dims: Seq[String],
      valueE6: Column): DataFrame =
    snap.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueE6).as("sum_e6"))

  /** Apply one change feed to the view. `cdf` must carry the dim
    * columns (derive any, e.g. a day bucket, before calling — dims are
    * functions of join keys, so they are stable under `update`) plus
    * `op` and the per-row integer contributions `oldE6`/`newE6`. */
  def applyDelta(view: DataFrame, cdf: DataFrame, dims: Seq[String],
      oldE6: Column, newE6: Column): DataFrame = {
    val dn = when(col("op") === "insert", 1L)
      .when(col("op") === "delete", -1L).otherwise(0L)
    val dv = when(col("op") =!= "delete", newE6).otherwise(lit(0L)) -
      when(col("op") =!= "insert", oldE6).otherwise(lit(0L))
    val delta = cdf.select(dims.map(col) :+ dn.as("_dn") :+ dv.as("_dv"): _*)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("_dn")).as("_dn"), sum(col("_dv")).as("_dv"))
    view.as("v").join(delta.as("d"), dims, "full_outer")
      .select(dims.map(col) ++ Seq(
        (coalesce(col("v.n"), lit(0L)) + coalesce(col("d._dn"), lit(0L)))
          .as("n"),
        (coalesce(col("v.sum_e6"), lit(0L)) +
          coalesce(col("d._dv"), lit(0L))).as("sum_e6")): _*)
      .filter(col("n") > 0)
  }
}
