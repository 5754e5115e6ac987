package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ / Great
  * Expectations idea as a Spark-first operator: a SUITE of constraints
  * over a table, evaluated together, each reported as one row with its
  * measured metric (a fraction in [0, 1]) and a pass flag against the
  * declared minimum. The gate a pipeline runs on every new data drop
  * before letting it near training: completeness, key uniqueness,
  * value ranges, format compliance, domain membership.
  *
  * Extension scope beyond the reference (SURVEY.md §7.5): the
  * reference trusts its single form's shape (`etl/transform.py:20-68`
  * validates row-by-row); a 100 TB ingest needs table-level
  * verification with explicit thresholds.
  *
  * Scale design: the whole suite rides ONE aggregate over the table —
  * never one job per constraint (k scans of a 100 TB drop). Every
  * metric is a (numerator, denominator) aggregate pair, so map-side
  * partial aggregation collapses each partition to a handful of
  * counters and only the k-constraint-wide single row shuffles.
  * [[Unique]] uses exact `count_distinct` — with several Unique checks
  * Catalyst plans the standard Expand (rows × distinct-columns), the
  * same documented cost as [[Profile.profile]]; swap in a
  * bloom/HLL-backed variant when an estimate suffices. Thresholds are
  * vacuously met on an empty denominator (no evidence of violation —
  * the Deequ convention), so an empty drop reports metric 1.0
  * everywhere rather than raising ANSI DIVIDE_BY_ZERO.
  */
object Expectations {

  /** One declarative constraint. `minRatio` is the smallest metric
    * value that counts as a pass. */
  sealed trait Expectation {
    def colName: String
    def minRatio: Double
    private[Expectations] def kind: String
    /** (numerator, denominator) aggregate pair defining the metric. */
    private[Expectations] def fraction: (Column, Column)
  }

  /** Fraction of table rows with a non-NULL `colName`. */
  final case class Complete(colName: String, minRatio: Double = 1.0)
      extends Expectation {
    private[Expectations] def kind = "complete"
    private[Expectations] def fraction =
      (count(col(colName)), count(lit(1)))
  }

  /** Distinct values over non-NULL rows — 1.0 means a candidate key. */
  final case class Unique(colName: String, minRatio: Double = 1.0)
      extends Expectation {
    private[Expectations] def kind = "unique"
    private[Expectations] def fraction =
      (count_distinct(col(colName)), count(col(colName)))
  }

  /** Fraction of non-NULL values inside [lo, hi] (inclusive). */
  final case class InRange(colName: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Expectation {
    private[Expectations] def kind = "in_range"
    private[Expectations] def fraction =
      (count(when(col(colName).between(lo, hi), 1)), count(col(colName)))
  }

  /** Fraction of non-NULL values matching an (unanchored) regex —
    * anchor with ^...$ for whole-value format checks. */
  final case class MatchesRegex(colName: String, regex: String,
      minRatio: Double = 1.0) extends Expectation {
    private[Expectations] def kind = "matches_regex"
    private[Expectations] def fraction =
      (count(when(col(colName).rlike(regex), 1)), count(col(colName)))
  }

  /** Fraction of non-NULL values drawn from an allowed domain. */
  final case class InSet(colName: String, values: Seq[String],
      minRatio: Double = 1.0) extends Expectation {
    private[Expectations] def kind = "in_set"
    private[Expectations] def fraction =
      (count(when(col(colName).isin(values: _*), 1)), count(col(colName)))
  }

  /** Evaluate the suite in one scan. Output: one row per constraint —
    * `(check, col_name, metric double, passed boolean)` in suite
    * order is NOT guaranteed; sort on (check, col_name) like the
    * queries do. Duplicate (kind, column) pairs are rejected so the
    * output keys the report unambiguously. */
  def check(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "need at least one expectation")
    val keys = suite.map(e => (e.kind, e.colName))
    require(keys.distinct.size == keys.size,
      s"duplicate (check, column) pairs in suite: " +
        keys.diff(keys.distinct).distinct.mkString(", "))
    val aggs = suite.zipWithIndex.flatMap { case (e, i) =>
      val (num, den) = e.fraction
      Seq(num.cast("double").as(s"_num_$i"),
        den.cast("double").as(s"_den_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = suite.zipWithIndex.map { case (e, i) =>
      val m = when(col(s"_den_$i") === 0d, lit(1.0d))
        .otherwise(col(s"_num_$i") / col(s"_den_$i"))
      struct(
        lit(e.kind).as("check"),
        lit(e.colName).as("col_name"),
        m.as("metric"),
        (m >= e.minRatio).as("passed"))
    }
    wide.select(explode(array(entries: _*)).as("e")).select("e.*")
  }
}
