package graft

import graft.analytics.Habits
import graft.config.{EtlConfig, HabitSpec}
import graft.ext.{Classify, Dedup, History, MediaRecord, Multimodal, Similarity, Skew, TextAnalysis}
import graft.functions.Aggregators
import graft.load.Merge
import graft.streaming.Streaming
import graft.transform.HabitTransform
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or §7.5
  * extension scope) exercised end-to-end on the driver testdata; the
  * paired `oracleSql` is the same computation in DuckDB SQL. Conventions
  * for hash-stable compares:
  *   - every query ends in a deterministic total ORDER BY;
  *   - aggregated doubles are rounded on both sides: 6 dp for small
  *     magnitudes, 2 dp for sums that can reach ~1e9 (engine summation
  *     order disagrees beyond ~15 significant digits, so 6 dp there
  *     flips at larger scale factors), 4 dp for cosine similarities;
  *   - counts/ranks/sizes are cast to BIGINT (DuckDB's int64 defaults);
  *   - timestamps are emitted as timestamp_ntz (UTC wall time), matching
  *     DuckDB's naive TIMESTAMP read of the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_habit_daily")(spark, "/root/testdata/sf0.001")

  /** The full operator registry, merged from the per-family objects
    * (split from a single 7.8k-line map in round 10 — a pure
    * maintainability move, no behavior change). The size check makes a
    * cross-file name collision fail loudly instead of silently
    * shadowing one family's query. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = Seq(QueriesParity.map, QueriesScaleText.map,
      QueriesDedupSimMm.map, QueriesStreamStore.map)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicate query name across Queries* family objects")
    merged
  }

  /** DuckDB oracle per query, merged from the size-sliced objects —
    * same collision guard as [[queries]]. */
  def oracleSql: Map[String, String] = {
    val parts = Seq(Oracles1.map, Oracles2.map, Oracles3.map)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicate oracle name across Oracles* objects")
    merged
  }
}
