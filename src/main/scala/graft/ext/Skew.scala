package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salting for hot keys.
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * helpers cover the cases it does not — replicated-build salted joins
  * chosen at plan time, and distinct-style aggregations whose partial
  * aggregation cannot compact a hot key map-side.
  *
  * Both are result-identical to their unsalted forms (specs pin it);
  * the salt only changes how rows distribute across reducers.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key` where a handful of hot keys
    * dominate `large`: rows of the same hot key spread over `salts`
    * reducers (salt = hash of the whole large row), while `small` is
    * replicated `salts`× so every (key, salt) bucket finds its match.
    * Use when `small` is too big to broadcast outright but `salts`×
    * replication is still cheap. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would null-extend the UNMATCHED replicated
    // copies of a small row (up to `salts` phantom rows per key) — not
    // result-identical to the unsalted join, so reject them.
    require(Set("inner", "cross", "left", "leftouter", "left_outer",
        "leftsemi", "left_semi", "leftanti", "left_anti")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti join types, got $joinType")
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** `groupBy(key).agg(count_distinct(value))` for a skewed key: salt by
    * the DISTINCT VALUE's hash (so each distinct value lands in exactly
    * one salt bucket — counts add without double counting), count
    * distinct per (key, salt), then sum per key. Two small shuffles
    * instead of one hot reducer absorbing every row of the key. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    df.groupBy(col(key),
        pmod(hash(col(valueCol)), lit(salts)).as("_salt"))
      .agg(count_distinct(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n_distinct"))
  }

  /** Per-key top-k with a salted pre-filter: take the local top-k within
    * each (key, salt) bucket first, so the final per-key sort sees at
    * most `salts × k` rows per key instead of every row of a hot key. */
  def saltedTopK(df: DataFrame, key: String, orderBy: Column, k: Int,
      salts: Int): DataFrame =
    saltedTopK(df, key, Seq(orderBy), k, salts)

  /** Multi-column ordering variant — pass a tiebreak (e.g.
    * `Seq(col("v").desc, col("id"))`) so the top-k cut is a total order
    * and therefore deterministic across runs and engines. */
  def saltedTopK(df: DataFrame, key: String, orderBy: Seq[Column], k: Int,
      salts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(salts > 0 && k > 0)
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val local = Window.partitionBy(col(key), col("_salt")).orderBy(orderBy: _*)
    val global = Window.partitionBy(col(key)).orderBy(orderBy: _*)
    salted
      .withColumn("_lr", row_number().over(local))
      .filter(col("_lr") <= k)
      .withColumn("_gr", row_number().over(global))
      .filter(col("_gr") <= k)
      .drop("_salt", "_lr", "_gr")
  }
}
