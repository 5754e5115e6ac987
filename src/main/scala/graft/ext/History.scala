package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD2) interval construction from a change
  * stream — the history-tracking counterpart of [[graft.load.Merge]]'s
  * overwrite upsert (`/root/reference/etl/etl_habits.py:31-38` keeps only
  * the latest value; SCD2 keeps every value with its validity window).
  *
  * Scale notes: one shuffle on the entity keys, then two window passes
  * over the same partitioning (change detection, then interval close) —
  * Catalyst reuses the sort. No state beyond the window frame.
  */
object History {

  /** Collapse an ordered (keys, ts, value) stream into SCD2 rows:
    * consecutive equal values merge, each surviving row carries
    * `valid_from` (its first ts) and `valid_to` (the next change's ts;
    * NULL while current). Null-safe value comparison, so NULL→x and
    * x→NULL transitions are genuine changes.
    */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    df
      // the first row of a key is ALWAYS a change: lag() is NULL there,
      // and a NULL initial value would otherwise satisfy NULL <=> NULL
      // and silently drop the entity's opening interval
      .withColumn("_chg",
        when(row_number().over(byKey) === 1, 1)
          .otherwise(
            when(lag(col(valueCol), 1).over(byKey) <=> col(valueCol), 0)
              .otherwise(1)))
      .filter(col("_chg") === 1)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(keys.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col(valueCol)): _*)
  }

  /** Point-in-time (temporal) dimension join — each fact row picks the
    * dimension version VALID AT ITS OWN TIMESTAMP rather than the
    * current one: key equality plus
    * `valid_from <= ts < coalesce(valid_to, +inf)` against a [[scd2]]
    * history (Flink's temporal table join / Delta's
    * point-in-time-correct feature join). Because a key's intervals
    * tile `[first valid_from, inf)` without overlap, every fact at or
    * after its key's first change matches exactly ONE version — the
    * join never duplicates facts. `joinType = "left_outer"` keeps
    * facts older than their key's history (all dim columns null).
    *
    * Scale notes: plans as a hash equi-join on `keys` with the
    * interval bounds as a residual filter — the history side is
    * versions-sized (entities × changes), usually broadcastable; a
    * fact never meets more rows than its key's version count, so the
    * residual scan is bounded by history depth, not fact count. */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      tsCol: String, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "left").contains(joinType),
      s"temporalJoin supports inner/left_outer, got $joinType")
    val f = facts.as("f")
    val d = dim.as("d")
    val cond = keys.map(k => col(s"f.$k") === col(s"d.$k"))
      .reduce(_ && _) &&
      col(s"f.$tsCol") >= col("d.valid_from") &&
      (col("d.valid_to").isNull || col(s"f.$tsCol") < col("d.valid_to"))
    f.join(d, cond, joinType)
      .select(facts.columns.map(c => col(s"f.$c")).toSeq ++
        dim.columns.filterNot(keys.contains).map(c => col(s"d.$c")): _*)
  }
}
