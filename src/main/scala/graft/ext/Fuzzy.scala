package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) near-duplicate pairing — record
  * linkage for short strings (names, titles, product labels), the
  * string-level sibling of the token-set dedup family in [[Dedup]].
  *
  * Extension scope beyond the reference (SURVEY.md §7.5): the reference
  * dedups only on exact content hashes
  * (`/root/reference/etl/etl_habits.py:63`); this generalizes to
  * typo-tolerant matching.
  *
  * Scale design: an all-pairs `levenshtein ≤ d` predicate is a cross
  * join. Here candidates meet on an equi-join key instead:
  * caller-chosen blocking columns (e.g. brand, zip, language) plus a
  * LENGTH BAND. Two strings within edit distance `d` differ in length
  * by at most `d`, so with band width `d+1` their length buckets differ
  * by at most 1 — the probe side joins on its own bucket while the
  * build side fans out to {bucket, bucket+1}, the
  * explode-the-coarser-side trick of [[RangeJoin]] with minimal 2×
  * fan-out (same-band pairs dedupe by id order; cross-band pairs meet
  * exactly once with the probe on the higher band). Comparisons are
  * then block-local: cost is Σ |block|²·|s|², bounded by the caller's
  * blocking-key cardinality, and three per-pair pre-filters prune the
  * residual work before the DP: length delta ≤ d, character-bitmask
  * popcount bound (each edit flips ≤ 2 set bits), and the early-exit
  * thresholded `levenshtein(…, …, d)`.
  */
object Fuzzy {

  /** Pairs `(idA, idB, strA, strB, dist)` with `idA < idB`, equal
    * blocking columns, and `levenshtein(strA, strB) <= maxDist`.
    *
    * @param blockCols  equality blocking keys; choose so blocks stay
    *                   small at scale (add more columns at higher data
    *                   volume — correctness only requires that true
    *                   duplicates share the block key)
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockCols.nonEmpty, "need at least one blocking column")
    val band = maxDist + 1
    // Per-ROW cheap signatures, computed once before the pair blowup:
    // length, and a 64-bit character-set bitmask. One edit changes the
    // distinct-char set by at most 2 (substitution = drop one + add
    // one), so ED ≥ popcount(maskA ⊕ maskB) / 2 — an O(1) bit test
    // that rejects most non-matches before the O(|s|·d) DP. Hash
    // collisions (chars sharing a bit mod 64) only make the filter
    // LESS selective, never incorrect.
    val mask = expr(s"aggregate(split(`$strCol`, ''), CAST(0 AS BIGINT), " +
      "(acc, c) -> acc | shiftleft(CAST(1 AS BIGINT), pmod(ascii(c), 64)))")
    // both join sides derive from `base`; pinned (eager disk-backed
    // checkpoint, r15) so the scan and the interpreted per-char mask
    // aggregate run once per row, not twice — eviction-proof under
    // heap pressure (the q_ccnet class), freed by the harness sweep
    val base = df
      .filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(blockCols.map(col) ++
        Seq(col(idCol), col(strCol), length(col(strCol)).as("_len"),
          mask.as("_mask"),
          floor(length(col(strCol)) / band).as("_band")): _*)
      .localCheckpoint(true)
    // Meet-once banding with MINIMAL fan-out: the build side emits only
    // {b, b+1} (not b−1 too). A same-band pair meets twice (both
    // orientations) — the id order keeps one; a cross-band pair meets
    // exactly once, with the probe as the higher-band row. Output ids
    // are then normalized to id_a < id_b.
    val probe = base.toDF(
      blockCols ++ Seq("_id_p", "_str_p", "_len_p", "_mask_p", "_band"): _*)
    val build = base.toDF(
      blockCols ++ Seq("_id_b", "_str_b", "_len_b", "_mask_b", "_b_orig"): _*)
      .withColumn("_band", explode(array(col("_b_orig"), col("_b_orig") + 1)))
    val aFirst = col("_id_p") < col("_id_b")
    probe.join(build, blockCols :+ "_band")
      .filter(((col("_b_orig") === col("_band") && aFirst) ||
          col("_b_orig") < col("_band")) &&
        abs(col("_len_p") - col("_len_b")) <= maxDist &&
        bit_count(col("_mask_p").bitwiseXOR(col("_mask_b"))) <= 2 * maxDist)
      // 3-arg levenshtein stops early once the running distance exceeds
      // maxDist (returns -1), so surviving non-matches don't pay the
      // full O(|a|·|b|) table
      .withColumn("_dist",
        levenshtein(col("_str_p"), col("_str_b"), maxDist))
      .filter(col("_dist") >= 0)
      .select(least(col("_id_p"), col("_id_b")).as("id_a"),
        greatest(col("_id_p"), col("_id_b")).as("id_b"),
        when(aFirst, col("_str_p")).otherwise(col("_str_b")).as("str_a"),
        when(aFirst, col("_str_b")).otherwise(col("_str_p")).as("str_b"),
        col("_dist").cast("long").as("dist"))
  }
}
