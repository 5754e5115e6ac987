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
}
