package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the schema/statistics sweep a pipeline runs
  * before ingesting a new data drop: per-column row/null/distinct
  * counts and min/max, computed in ONE aggregate over the table and
  * returned in long (one-row-per-column) form.
  *
  * Scale design: all statistics for all columns ride a single scan —
  * never one query per column (k scans of a 100 TB table). The exact
  * `count_distinct`s make Catalyst plan a single Expand-based
  * aggregate: still one scan, one shuffle, with rows replicated per
  * distinct-column — the standard cost of exact multi-column NDV. For
  * a quick look at wider tables swap in `approx_count_distinct`, which
  * collapses the plan to one partial-aggregate pass (not used here
  * because HLL estimates aren't oracle-comparable across engines).
  * Numeric min/max surface as doubles, everything else as strings, so
  * heterogeneous columns share one output schema without lossy
  * cross-type formatting.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"_nn_$c"),
        count_distinct(col(c)).as(s"_nd_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"_mnn_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"_mxn_$c"),
        (if (numeric) lit(null).cast("string")
         else min(col(c)).cast("string")).as(s"_mns_$c"),
        (if (numeric) lit(null).cast("string")
         else max(col(c)).cast("string")).as(s"_mxs_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_mnn_$c").as("min_num"),
        col(s"_mxn_$c").as("max_num"),
        col(s"_mns_$c").as("min_str"),
        col(s"_mxs_$c").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** [[profile]] with `approx_count_distinct` in place of the exact
    * NDVs — the quick-look variant for WIDE tables: no Expand, so the
    * whole profile collapses to one partial-aggregating pass (row
    * replication in the exact form is ×distinct-columns, which is the
    * difference between one scan and k scans' worth of shuffle on a
    * 100-column 100 TB drop). Estimates carry the HLL rsd guarantee;
    * the oracle checks them as a 5%-band invariant against the exact
    * counts rather than cell-exact equality. */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"_nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"_nd_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"_mnn_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"_mxn_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("approx_distinct"),
        col(s"_mnn_$c").as("min_num"),
        col(s"_mxn_$c").as("max_num"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Winsorized (percentile-clamped) robust statistics per group — the
    * outlier-resistant mean/stddev a data-quality report wants next to
    * the raw moments: values below the `lo` percentile or above the
    * `hi` percentile are CLAMPED to those bounds (not dropped, so
    * counts are preserved), then the moments are taken over the
    * clamped values. Exact interpolated percentiles (`percentile`),
    * the engine-reproducible kind the percentile query already pins
    * against DuckDB's quantile_cont.
    *
    * Scale: one percentile aggregate over the groups (exact
    * percentiles sort within the aggregate buffer — swap in
    * `approx_percentile` for a one-pass sketch when the group
    * cardinality times values no longer fits), broadcast back onto the
    * rows (group-cardinality relation), one moments aggregate. Two
    * bounded shuffles, no window over the raw values. */
  def winsorized(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val v = col(valueCol)
    val bounds = df.filter(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $lo)").as("_plo"),
        expr(s"percentile($valueCol, $hi)").as("_phi"))
    val clamped = df.filter(v.isNotNull)
      .join(broadcast(bounds), groupCols)
      .withColumn("_w", least(greatest(v, col("_plo")), col("_phi")))
    clamped.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        // the bounds are constant within a group — min is just a pick
        round(min(col("_plo")).cast("double"), 6).as("lo_bound"),
        round(max(col("_phi")).cast("double"), 6).as("hi_bound"),
        round(avg(col("_w")), 6).as("w_mean"),
        round(stddev_samp(col("_w")), 6).as("w_stddev"))
  }

  /** Fixed-width value histogram — distribution shape at a glance, the
    * partner to [[profile]]'s min/max and the exact percentiles query.
    * One hash-aggregate over the (optionally grouped) rows; bucket
    * arithmetic is a pure expression, so this scales like any count
    * aggregate. Values outside [lo, hi) clamp into the edge buckets
    * (so the histogram always accounts for every non-null row); NULLs
    * are dropped. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      buckets: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, "need at least one bucket")
    require(hi > lo, "hi must exceed lo")
    val w = (hi - lo) / buckets
    val bucket = least(greatest(
        floor((col(valueCol) - lo) / w), lit(0)), lit(buckets - 1))
      .cast("long").as("bucket")
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ bucket: _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Mergeable-quantile rollup over [[histogram]] sketches — the
    * percentile counterpart of the HLL sketch rollup (`q_hll_rollup`):
    * fine-grain histograms (e.g. per day) built in ONE pass over raw
    * rows merge to any coarser grouping by summing bin counts, and
    * quantiles at the coarse level come off the merged cumulative
    * histogram without a second pass over data. Rank error is bounded
    * by the bin population, value error by the bin width — the
    * fixed-domain stand-in for a KLL/t-digest, with the advantage that
    * every count is an exact integer and the whole estimate replays
    * across engines bit-for-bit.
    *
    * `hist` is [[histogram]] output at the FINE grain (its group
    * columns must include `groupCols`); `qs` are quantiles in (0, 1],
    * carried as exact ppm integers so the rank threshold
    * `cum · 1e6 >= q_ppm · total` is pure long arithmetic. The
    * estimate for q is the UPPER edge of the first bucket whose
    * cumulative count reaches the rank — deterministic and
    * conservative (never below the true quantile's bucket).
    *
    * Scale (100 TB): the raw-data pass already happened in
    * [[histogram]]; everything here runs on `groups × buckets` rows —
    * a merge aggregate, two windows over the same partitioning, one
    * explode by |qs|. Weekly/monthly/global rollups reuse the SAME
    * daily sketches: that is the point. */
  def histogramQuantiles(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[Double], lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    require(buckets > 0 && hi > lo, "need buckets > 0 and hi > lo")
    val w = (hi - lo) / buckets
    val merged = hist
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))
    val cumWin = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totWin = Window.partitionBy(groupCols.map(col): _*)
    val qPpm = qs.map(q => math.round(q * 1e6)).sorted
    merged
      .withColumn("cum", sum(col("n")).over(cumWin))
      .withColumn("total", sum(col("n")).over(totWin))
      .withColumn("q_ppm", explode(array(qPpm.map(lit): _*)))
      .filter(col("cum") * 1000000L >= col("q_ppm") * col("total"))
      .groupBy((groupCols :+ "q_ppm").map(col): _*)
      .agg(min(col("bucket")).as("bucket"),
        max(col("total")).as("n_total"))
      .withColumn("est",
        round(lit(lo) + lit(w) * (col("bucket") + 1), 6))
  }

  /** Population Stability Index between a reference and a current
    * distribution of `valueCol` — the drift monitor a continuously-
    * ingesting training-data store runs between snapshots (PSI > 0.2
    * is the classic "investigate" threshold). One [[histogram]] pass
    * per side (the only data-sized work), then everything else is
    * bucket-count arithmetic on `buckets` rows: Laplace-smoothed
    * shares p, q per bin and per-bin contribution (p−q)·ln(p/q),
    * quantized to 1e-6 units. Bin counts are exact longs, the shares
    * derive from them by a fixed IEEE expression chain, and the 1e-6
    * quantization absorbs sub-ULP `ln` variation across engines — the
    * same replay discipline as the NB classifier's log-probs.
    *
    * Pick `lo`/`hi`/`buckets` so the bucket width (hi−lo)/buckets is
    * exactly representable (e.g. powers of two) — the width is inlined
    * into both engines' floor arithmetic.
    *
    * Scale (100 TB): two count aggregates with map-side partials;
    * the join/window run on `buckets` rows. Monitoring N columns is N
    * independent histogram pairs — no corpus-sized state anywhere. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    val bins = ref.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    val hr = histogram(ref, valueCol, lo, hi, buckets)
      .withColumnRenamed("n", "ref_n")
    val hc = histogram(cur, valueCol, lo, hi, buckets)
      .withColumnRenamed("n", "cur_n")
    val j = bins
      .join(broadcast(hr), Seq("bucket"), "left")
      .join(broadcast(hc), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val b = lit(buckets.toLong)
    val p = (col("ref_n") + lit(1L)).cast("double") /
      (sum(col("ref_n")).over(w) + b).cast("double")
    val q = (col("cur_n") + lit(1L)).cast("double") /
      (sum(col("cur_n")).over(w) + b).cast("double")
    j.withColumn("psi_e6",
        round(((p - q) * log(p / q)) * lit(1000000.0)).cast("long"))
      .select(col("bucket"), col("ref_n"), col("cur_n"), col("psi_e6"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over the binned
    * ECDFs — the distribution-shape companion of [[psiDrift]] (PSI
    * reacts to mass shifts per bin; KS to the worst cumulative gap,
    * catching location/scale drift that balanced bin deltas hide).
    *
    * Exactness: the statistic is computed on the cross-multiplied
    * integer form `|ref_le·cur_total − cur_le·ref_total|` (no division
    * until the final quantized report), so the argmax bin and the
    * ordering of candidate gaps are pure long arithmetic — identical
    * in any engine. `ks_e6` then divides two exact longs once and
    * quantizes to 1e-6, the same replay discipline as the PSI rows.
    *
    * Binned, not per-distinct-value, by design: an exact KS over raw
    * doubles needs a global sort + prefix sum over a corpus-sized
    * distinct domain; over `buckets` bins the ECDF gap resolves to
    * bin-width resolution (bounded error, monitoring-grade) while the
    * data-sized work stays two [[histogram]] count passes with
    * map-side partials, and everything after runs on `buckets` rows.
    *
    * @return one row: (ks_bucket, ks_num, ref_total, cur_total, ks_e6)
    *         where ks_bucket is the smallest bin attaining the max gap */
  def ksDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    val bins = ref.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    val hr = histogram(ref, valueCol, lo, hi, buckets)
      .withColumnRenamed("n", "ref_n")
    val hc = histogram(cur, valueCol, lo, hi, buckets)
      .withColumnRenamed("n", "cur_n")
    val j = bins
      .join(broadcast(hr), Seq("bucket"), "left")
      .join(broadcast(hc), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val cum = Window.partitionBy()
      .orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.select(col("bucket"),
        sum(col("ref_n")).over(cum).as("ref_le"),
        sum(col("cur_n")).over(cum).as("cur_le"),
        sum(col("ref_n")).over(tot).as("ref_total"),
        sum(col("cur_n")).over(tot).as("cur_total"))
      .withColumn("ks_num",
        abs(col("ref_le") * col("cur_total") -
          col("cur_le") * col("ref_total")))
      .orderBy(col("ks_num").desc, col("bucket")).limit(1)
      .select(col("bucket").as("ks_bucket"), col("ks_num"),
        col("ref_total"), col("cur_total"),
        round(col("ks_num").cast("double") * lit(1000000.0) /
            (col("ref_total") * col("cur_total")).cast("double"))
          .cast("long").as("ks_e6"))
  }

  /** Robust outlier census — median/MAD (modified z-score) instead of
    * mean/stddev, so the fences themselves don't move when the
    * outliers arrive (the breakdown point of the mean is one bad row;
    * the median's is half the data). Per group: the exact interpolated
    * median, the median absolute deviation, and how many rows sit
    * outside `0.6745·|x − med| > z · mad` (Iglewicz–Hoban modified
    * z-score; z = 3.5 is the classic "investigate" fence). A zero MAD
    * (≥ half the group identical) flags NOTHING rather than everything
    * — reported via `mad` so the caller sees the degenerate case.
    *
    * Exactness: both engines implement the classic linear-interpolated
    * quantile bit-identically (the q_percentiles precedent); deviation
    * and both fence sides are single correctly-rounded multiplies of
    * identical doubles, so the comparison replays engine-exactly.
    *
    * Scale (100 TB): two grouped aggregates over the group key and one
    * broadcast-friendly join of the group-domain medians back to the
    * rows — the unavoidable two-pass shape of an exact MAD. For a
    * sketch-grade single pass at petabyte scale, feed
    * [[histogramQuantiles]] both times instead. */
  def robustOutliers(df: DataFrame, valueCol: String,
      groupCols: Seq[String], z: Double = 3.5): DataFrame = {
    val v = col(valueCol)
    val g = groupCols.map(col)
    val rows = df.filter(v.isNotNull)
    val med = rows.groupBy(g: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = rows.join(broadcast(med), groupCols)
      .withColumn("adev", abs(v - col("med")))
    val mad = dev.groupBy(g: _*)
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        count(when(col("mad") > 0 &&
            col("adev") * lit(0.6745) > lit(z) * col("mad"), 1))
          .as("n_outliers"))
  }

  /** Dyadic EWMA — exponentially-weighted moving average with α = 1/2
    * over the trailing `window` samples per key, carried as an exact
    * integer so the smoothing replays bit-for-bit across engines.
    *
    * Values quantize to centi-units (`floor(v·100 + 0.5)` — exact on
    * the same IEEE doubles in any engine), and the smoothed value is
    * the pure-integer numerator
    * `ewma_c16 = Σ_{j=0..len-1} v_c[j] · 2^(16−len+j)` (oldest-first
    * frame of at most `window`=16 rows; the newest sample carries
    * weight 2^15, each older sample half that). The true EWMA is
    * `ewma_c16 / (100 · 2^16)` up to the truncated tail — floats never
    * enter the recurrence, only the caller's final display division.
    * Powers of two make every weight exactly representable, and the
    * integer sum is order-independent, so there is no accumulated
    * rounding drift to disagree about.
    *
    * Scale (100 TB): one shuffle by `keyCols`, a per-key sort, and a
    * bounded 16-row frame — the canonical distributed window shape.
    * No global order, no driver state; skewed keys cost what any
    * per-key window costs and salt the same way. */
  def dyadicEwma(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*).rowsBetween(-15, 0)
    df.withColumn("v_c",
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long"))
      .withColumn("l", collect_list(col("v_c")).over(w))
      .withColumn("ewma_c16", expr(
        """aggregate(transform(sequence(0, size(l) - 1),
             i -> element_at(l, i + 1) * shiftleft(1L, 16 - size(l) + i)),
           0L, (a, x) -> a + x)"""))
      .drop("v_c", "l")
  }
}
