package graft

import graft.load.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout contracts: the bit interleave itself, and the actual
  * storage benefit — per-file dimension ranges shrink on BOTH columns
  * versus a single-column sort of the same data, which is what makes
  * parquet min/max skipping work for filters on either dimension. */
class LayoutSpec extends AnyFunSuite with SparkTestSession {

  test("ZInterleave spreads x to even bits, y to odd bits") {
    import graft.plans.ZInterleave
    assert(ZInterleave.interleave(0, 0) == 0L)
    assert(ZInterleave.interleave(1, 0) == 1L)    // x bit 0 -> z bit 0
    assert(ZInterleave.interleave(0, 1) == 2L)    // y bit 0 -> z bit 1
    assert(ZInterleave.interleave(3, 1) == 7L)    // 0b11 ⋈ 0b01 = 0b0111
    assert(ZInterleave.interleave(0xffff, 0) == 0x55555555L)
    assert(ZInterleave.interleave(0, 0xffff) == 0xaaaaaaaaL)
    // adjacent cells differ in few z bits: curve locality sanity
    assert(ZInterleave.interleave(2, 3) ==
      (ZInterleave.spread(2) | (ZInterleave.spread(3) << 1)))
  }

  test("scaled propagates NULL instead of clamping it to 0") {
    val s = spark
    import s.implicits._
    val out = Seq(Some(5.0), None).toDF("v")
      .select(Layout.scaled(col("v"), 0.0, 10.0, bits = 4).as("b"))
      .collect()
    assert(out(0).getInt(0) == 8 && out(1).isNullAt(0))
  }

  test("graft_zorder expression equals the driver-side reference") {
    val s = spark
    import s.implicits._
    val df = (0 until 64).map(i => (i, i * 7 % 64)).toDF("x", "y")
    val got = df.select(call_function("graft_zorder", col("x"), col("y"))
        .as("z"))
      .collect().map(_.getLong(0))
    val want = (0 until 64).map(i =>
      graft.plans.ZInterleave.interleave(i, i * 7 % 64))
    assert(got.toSeq == want)
  }

  test("z-ordered files cover tight rectangles; x-sorted files span full y") {
    val s = spark
    import s.implicits._
    // 64×64 uniform grid
    val grid = (0 until 4096).map(i => (i % 64, i / 64)).toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_")
    try {
      val zPath = tmp.resolve("z").toString
      val xPath = tmp.resolve("x").toString
      Layout.writeZOrdered(grid, zPath,
        Layout.zValue(col("x").cast("double"), 0.0, 64.0,
          col("y").cast("double"), 0.0, 64.0, bits = 6), numFiles = 8)
      grid.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(xPath)
      def avgYRange(path: String): Double = {
        // one scan: per-file min/max via input_file_name, not a job per file
        val ranges = s.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
          .collect()
          .map(r => (r.getInt(2) - r.getInt(1)).toDouble / 63.0)
        assert(ranges.length >= 4, s"expected several files at $path")
        ranges.sum / ranges.length
      }
      val zRange = avgYRange(zPath)
      val xRange = avgYRange(xPath)
      // x-sorted files each span (nearly) all of y; z-ordered files are
      // spatial rectangles covering a fraction of it
      assert(xRange > 0.9, s"x-sorted control should span y, got $xRange")
      assert(zRange < 0.6 * xRange,
        s"z-order should shrink per-file y ranges: z=$zRange x=$xRange")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
