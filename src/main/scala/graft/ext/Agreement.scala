package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-aggregation operators for multi-annotator training data:
  * majority vote with a deterministic tie-break and Fleiss' kappa
  * inter-annotator agreement — the quality gate a labeling pipeline
  * runs before trusting a label column.
  *
  * Extension scope (SURVEY.md §7.5): label hygiene is as much a part
  * of a 100 TB training-data pipeline as text hygiene — crowd/model
  * ensembles produce one noisy label per rater per item, and the
  * pipeline must (a) collapse them reproducibly and (b) refuse
  * batches whose agreement collapses.
  *
  * Scale notes: both ops are one explode (raters × items — raters is
  * a small constant) followed by hash aggregates with map-side
  * partial aggregation; kappa's global reduction is category-count
  * sized. No windows, no joins beyond the vote census. All agreement
  * math is INTEGER (counts, squared counts, one final ppm division),
  * so the SQL oracle replays it cell-exactly.
  */
object Agreement {

  /** Deterministic synthetic annotator panel over a labeled table:
    * annotator `a ∈ [1, nAnnotators]` reports the true label unless
    * its md5-derived per-(item, annotator) draw falls below `a` of 10
    * — i.e. annotator a carries a·10% noise, and the noisy report is
    * `(label + a) % nCats`. The panel is a pure function of
    * (id, annotator), reproducible on any engine / partitioning —
    * the repo's md5Top60 discipline applied to label noise.
    *
    * @return (id, annotator, lab) — one row per rating */
  def annotatorLabels(items: DataFrame, idCol: String, labelCol: String,
      nAnnotators: Int = 3, nCats: Int = 10): DataFrame = {
    require(nAnnotators >= 2 && nAnnotators <= 9,
      "noise model is a·10% per annotator — a must stay below 10")
    items
      .select(col(idCol).cast("long").as("id"),
        col(labelCol).cast("long").as("label"))
      .select(col("id"), col("label"),
        explode(sequence(lit(1), lit(nAnnotators))).as("annotator"))
      .withColumn("draw",
        Sampling.hashBucket(
          concat(col("id"), lit(":"), col("annotator")), 10))
      .select(col("id"), col("annotator"),
        when(col("draw") < col("annotator"),
          (col("label") + col("annotator")) % nCats)
          .otherwise(col("label")).as("lab"))
  }

  /** Majority vote per item over (id, lab) ratings: the label with the
    * highest count wins, exact ties break to the SMALLEST label (a
    * total order, so the vote is deterministic under any partitioning).
    * @return (id, voted, n_votes, unanimous) */
  def majorityVote(ratings: DataFrame, nRaters: Int): DataFrame =
    ratings
      .groupBy(col("id"), col("lab"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(min(struct((-col("n")).as("nn"), col("lab"))).as("m"))
      .select(col("id"), col("m.lab").as("voted"),
        (-col("m.nn")).as("n_votes"),
        (col("m.nn") === -nRaters).as("unanimous"))

  /** Fleiss' kappa over a complete rating panel (every item rated by
    * exactly `nRaters` raters), computed entirely in INTEGER
    * arithmetic so the oracle replays it bit-exactly:
    *
    *   S2 = Σ_items Σ_cats n_ij²      (n_ij = votes for cat j on item i)
    *   C  = Σ_cats (Σ_items n_ij)²    (squared category totals)
    *   κ  = (P̄ − P̄e) / (1 − P̄e)
    *      = (n·N·(S2 − n·N) − (n−1)·? …reduced over the common
    *        denominator to the single integer ratio below.
    *
    * With n raters and N items: P̄ = (S2 − nN)/(Nn(n−1)),
    * P̄e = C/(nN)², and clearing the common denominator (Nn)²(n−1):
    *   κ_num = Nn·(S2 − Nn) − (n−1)·C
    *   κ_den = (n−1)·((Nn)² − C)
    * — one exact long ratio, reported as `kappa_ppm =
    * floor(10⁶·κ_num/κ_den)`, the repo's quantized-report discipline.
    * 10⁶·κ_num stays under 2⁶³ up to ~5·10⁵ items at n = 3; beyond
    * that, shard the panel and merge SUFFICIENT STATISTICS instead
    * (N and S2 are item-additive; the per-category vote census behind
    * C is category-additive) — the ingest-ledger pattern.
    *
    * @return one row: (n_items, n_raters, s2, c_sq, kappa_ppm) */
  def fleissKappa(ratings: DataFrame, nRaters: Int): DataFrame =
    fleissKappaFromCells(
      ratings.groupBy(col("id"), col("lab")).agg(count(lit(1)).as("n")),
      nRaters)

  /** [[fleissKappa]] from a maintained (id, lab, n) vote-cell census —
    * the ledger read path: cells are the panel's SUFFICIENT STATISTIC
    * and item-additive across ingest ticks (each item's ratings derive
    * from its own row, so ticks partition items), so kappa off the
    * unioned ledger equals the batch computation at any moment. The
    * re-aggregation is the usual formality for doc-spanning schemes. */
  def fleissKappaFromCells(cells: DataFrame, nRaters: Int): DataFrame = {
    val cell = cells
      .groupBy(col("id"), col("lab"))
      .agg(sum(col("n")).as("n"))
    val perItem = cell.agg(
      count_distinct(col("id")).as("n_items"),
      sum(col("n") * col("n")).as("s2"))
    val perCat = cell
      .groupBy(col("lab"))
      .agg(sum(col("n")).as("c"))
      .agg(sum(col("c") * col("c")).as("c_sq"))
    val n = lit(nRaters.toLong)
    val nn = n * col("n_items")
    perItem.crossJoin(perCat)
      .withColumn("num6", lit(1000000L) *
        (nn * (col("s2") - nn) - (n - 1) * col("c_sq")))
      .withColumn("den", (n - 1) * (nn * nn - col("c_sq")))
      // exact FLOOR division (κ can be negative; long `div` truncates
      // toward zero, so subtract the non-negative pmod remainder first
      // — the oracle mirrors with ((num % den + den) % den)). den = 0
      // ⇔ every rater put every item in ONE category (P̄e = 1, κ
      // undefined): fail LOUDLY instead of Spark's silent NULL `div` —
      // the DuckDB oracle's `// 0` raises too, so both engines agree
      // on the degenerate panel
      .select(col("n_items"), n.as("n_raters"), col("s2"), col("c_sq"),
        when(col("den") === 0,
          raise_error(lit("fleissKappa: kappa undefined — all ratings " +
            "in a single category (expected agreement is 1)")).cast("long"))
          .otherwise(expr("(num6 - pmod(num6, den)) div den"))
          .as("kappa_ppm"))
  }
}
