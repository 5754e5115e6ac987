package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton curve) clustering.
  *
  * A plain sort-on-write clusters only its leading column — parquet
  * min/max pruning then skips row groups for filters on THAT column and
  * nothing else. Writing in Z-order interleaves the bits of two
  * dimensions into one sort key, so each output file covers a small
  * RECTANGLE of the (x, y) space: filters on either dimension skip most
  * files (LayoutSpec proves the per-file range shrinkage against a
  * single-column sort of the same data).
  *
  * Scale shape: one `repartitionByRange` shuffle on the z key + a
  * partition-local sort — identical cost to any sorted write; the
  * benefit repays it on every subsequent selective read. The z key is
  * the native codegen'd `graft_zorder` expression
  * ([[graft.plans.ZInterleave]]).
  */
object Layout {

  /** Scale a numeric column into `[0, 2^bits)` given inclusive-range
    * bounds; out-of-range values clamp to the edges, NULL propagates
    * (Spark's greatest/least SKIP nulls, so the clamp alone would
    * silently turn NULL into 0 — the explicit gate keeps the
    * null-in-null-out contract of the z expression). `bits` caps at 31
    * so the scaled value always fits a signed Int (2^32-range values
    * would overflow the cast under ANSI mode). */
  def scaled(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, "hi must exceed lo")
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    when(c.isNotNull,
      least(greatest(floor((c - lo) / (hi - lo) * (1L << bits)), lit(0)),
        lit((1L << bits) - 1)).cast("int"))
  }

  /** 64-bit Morton key of two scaled dimensions (x → even bits,
    * y → odd bits). Requires `graft.plans.GraftExtensions`. */
  def zValue(x: Column, xLo: Double, xHi: Double,
      y: Column, yLo: Double, yHi: Double, bits: Int = 16): Column =
    call_function("graft_zorder",
      scaled(x, xLo, xHi, bits), scaled(y, yLo, yHi, bits))

  /** Write `df` as `numFiles` parquet files clustered on the z key:
    * range-partition by z (files = contiguous z ranges = spatial
    * rectangles), sort within each, drop the key. */
  def writeZOrdered(df: DataFrame, path: String, z: Column,
      numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    require(!df.columns.contains("_z"),
      "input already has a '_z' column — rename it before writeZOrdered")
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
