package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing over training-data tables — the release gate that
  * runs AFTER PII masking ([[TextAnalysis.maskPii]]): masking removes
  * literal identifiers; these audits measure whether the remaining
  * quasi-identifier combinations still single people out.
  *
  * k-anonymity: every quasi-identifier (QI) group must contain at
  * least k rows, else its members are re-identifiable by joining the
  * QI columns against an external table. l-diversity strengthens it:
  * a group whose rows all share one sensitive value leaks that value
  * even when the group is large, so each group must also carry at
  * least l distinct sensitive values.
  *
  * Scale design (100 TB): the audit is ONE hash-partitioned aggregate
  * over the QI key (count + exact distinct-sensitive per group) and a
  * second aggregate over the group relation, which is |QI domain|-
  * sized, not corpus-sized. No windows, no joins, no driver state; a
  * skewed QI group costs what any hot aggregation key costs and salts
  * the same way (partial aggregation already absorbs most of it).
  */
object Privacy {

  /** Per-group k-anonymity/l-diversity measurement: one row per QI
    * group with its size and sensitive-value diversity. `qiCols` may
    * be arbitrary expressions (bucketized value, truncated date) —
    * generalization IS choosing coarser QI expressions.
    *
    * @return (qi..., n_rows, n_sensitive) */
  def anonymityGroups(df: DataFrame, qiCols: Seq[Column],
      sensitiveCol: Column): DataFrame =
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(sensitiveCol).as("n_sensitive"))

  /** Release-gate summary over [[anonymityGroups]]: per value of the
    * first QI column, how many groups exist, how many violate
    * k-anonymity (size < k) and l-diversity (distinct sensitive < l),
    * how many ROWS sit in violating groups (the actual exposure), and
    * the worst group size/diversity observed. A compliant release
    * shows zero `risky_k_rows` and `risky_l_rows`.
    *
    * @param qiCols   quasi-identifier expressions; the FIRST one,
    *                 aliased `reportAs`, keys the summary rows
    * @return (reportAs, n_groups, min_group, risky_k_groups,
    *         risky_k_rows, min_l, risky_l_groups, risky_l_rows) */
  def anonymityAudit(df: DataFrame, qiCols: Seq[Column],
      sensitiveCol: Column, reportAs: String, k: Int, l: Int)
      : DataFrame = {
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    summarize(anonymityGroups(df,
      qiCols.head.as(reportAs) +: qiCols.tail, sensitiveCol),
      reportAs, k, l)
  }

  /** [[anonymityAudit]] from an ALREADY-MAINTAINED (QI, sensitive, n)
    * census — the ingest-time form: (QI, sensitive)-keyed row counts
    * are ADDITIVE across micro-batches (unlike the per-group distinct,
    * which is not), so a stream that appends per-batch censuses holds
    * the audit's sufficient statistic and the current audit derives
    * from census-sized state without rescanning the corpus. The same
    * duplicate-tolerance makes the derivation idempotent under batch
    * replay when each batch overwrites its own subdir.
    *
    * `census` columns: `qiCols` (first one pre-aliased or named
    * `reportAs`), `sensitiveCol`, and `nCol` row counts. */
  def anonymityAuditFromCensus(census: DataFrame, qiCols: Seq[Column],
      sensitiveCol: Column, nCol: Column, reportAs: String,
      k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    val groups = census
      .groupBy(qiCols.head.as(reportAs) +: qiCols.tail: _*)
      .agg(sum(nCol).as("n_rows"),
        count_distinct(sensitiveCol).as("n_sensitive"))
    summarize(groups, reportAs, k, l)
  }

  /** Generalization ladder — the k-anonymization RESPONSE, not just
    * the audit: coarsen the numeric quasi-identifier (doubling the
    * band width per rung) until NO group violates k-anonymity, and
    * report the first compliant rung with its audit. The classic
    * trade: each doubling halves the QI's resolution (information
    * loss) and monotonically merges groups (risk loss); the ladder
    * finds the finest compliant resolution.
    *
    * The driver loops over rungs — each rung ONE aggregate job, the
    * Lloyd's-iteration contract (job barriers, never data, on the
    * driver); rungs are bounded by `widths.length`. If even the
    * coarsest rung violates, it is returned with its nonzero
    * `risky_k_rows` — the caller sees the failure, nothing silently
    * passes.
    *
    * @return one row: (width, n_groups, min_group, risky_k_groups,
    *         risky_k_rows) for the chosen rung */
  def generalizationLadder(df: DataFrame, stableQi: Seq[Column],
      valueCol: Column, widths: Seq[Long], k: Int): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "need positive widths")
    // sort defensively: the ladder contract (and the shared oracle's
    // min-width pick over compliant rungs) assumes ascending widths —
    // walking fine→coarse makes the first compliant rung THE finest
    // compliant one for any argument order
    val rungWidths = widths.sorted
    val spark = df.sparkSession
    import spark.implicits._
    def auditAt(w: Long): DataFrame =
      anonymityGroups(df,
          stableQi :+ floor(valueCol / w.toDouble).as("__band"),
          lit(1))
        .agg(count(lit(1)).as("n_groups"),
          min(col("n_rows")).as("min_group"),
          count(when(col("n_rows") < k, 1)).as("risky_k_groups"),
          coalesce(sum(when(col("n_rows") < k, col("n_rows"))), lit(0L))
            .as("risky_k_rows"))
        .select(lit(w).as("width"), col("n_groups"), col("min_group"),
          col("risky_k_groups"), col("risky_k_rows"))
    val rungs = rungWidths.iterator.map(auditAt)
    // driver sees ONE 1-row audit per rung; data never leaves executors
    val chosen = rungs
      .map(_.collect()(0))
      .find(r => r.getLong(r.fieldIndex("risky_k_rows")) == 0L)
    chosen match {
      case Some(r) =>
        Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toDF("width", "n_groups", "min_group",
          "risky_k_groups", "risky_k_rows")
      case None => auditAt(rungWidths.last)
    }
  }

  private def summarize(groups: DataFrame, reportAs: String,
      k: Int, l: Int): DataFrame =
    groups.groupBy(col(reportAs))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("n_rows")).as("min_group"),
        count(when(col("n_rows") < k, 1)).as("risky_k_groups"),
        coalesce(sum(when(col("n_rows") < k, col("n_rows"))), lit(0L))
          .as("risky_k_rows"),
        min(col("n_sensitive")).as("min_l"),
        count(when(col("n_sensitive") < l, 1)).as("risky_l_groups"),
        coalesce(sum(when(col("n_sensitive") < l, col("n_rows"))),
          lit(0L)).as("risky_l_rows"))
}
