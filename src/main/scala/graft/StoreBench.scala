package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the versioned store's metadata-planned reads —
  * the recorded evidence behind the zone-map / bloom / row-count
  * design (BASELINE.md "Store scan-planning head-to-head"): at file
  * counts where planning cost and scan scheduling start to matter,
  * compare each metadata-planned read against the naive
  * full-snapshot-scan-then-filter form of the same question:
  *
  *   - `scan-filter-range` vs `snapshotWhere`: a narrow key range over
  *     a range-clustered store (zone maps skip non-overlapping files).
  *   - `scan-filter-point` vs `snapshotPoint`: a needle-in-haystack id
  *     lookup (blooms + id zone maps skip nearly every file).
  *   - `scan-count` vs `snapshotRowCount`: COUNT(*) (sidecar row
  *     counts, no scan at all).
  *
  * Deterministic synthetic input (no wall-clock anywhere): `nRows`
  * events over `nDays` days × `rangeParts` range-clustered files per
  * day, committed in `nCommits` equal appends — timestamps and keys
  * from fixed arithmetic. Each form runs `runs` times against a
  * count/collect sink; per-form min is printed as one JSON line.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.StoreBench 5000000 60
  * 8 4 3"`. */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val nDays = args.lift(1).map(_.toInt).getOrElse(60)
    val rangeParts = args.lift(2).map(_.toInt).getOrElse(8)
    val nCommits = args.lift(3).map(_.toInt).getOrElse(4)
    val runs = args.lift(4).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.load.VersionedStore

    val nUsers = 100000L
    val tmp = java.nio.file.Files.createTempDirectory("graft_sbench_")
    try {
      val store = tmp.toString + "/store"
      // user ids stride across commits so every commit covers the
      // whole key domain (zone maps must earn their keep per file,
      // not per commit); ts spreads rows across nDays evenly
      def batch(c: Int) = {
        val per = nRows / nCommits
        spark.range(per).select(
          (col("id") * nCommits + c).as("event_id"),
          timestamp_micros(lit(1704067200000000L) +
            (col("id") % nDays) * 86400000000L +
            (col("id") * 37L % 3600L) * 1000000L).as("ts"),
          ((col("id") * 2654435761L + c) % nUsers).as("user_email"),
          concat(lit("h"), col("id") % 8).as("habit"),
          (col("id") % 1000).cast("double").as("value"))
      }
      VersionedStore.create(batch(0), store,
        sortCols = Seq("user_email", "habit", "ts"),
        rangeParts = nDays * rangeParts, bloomCols = Seq("event_id"))
      for (c <- 1 until nCommits)
        VersionedStore.append(spark, store, batch(c),
          sortCols = Seq("user_email", "habit", "ts"),
          rangeParts = nDays * rangeParts, bloomCols = Seq("event_id"))
      val nFiles = VersionedStore.snapshot(spark, store).inputFiles.length
      val needle = 1234L * nCommits // an id commit 0 wrote

      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      def best(tag: String)(body: => Unit): (String, Double) = {
        val t = (1 to runs).map(_ => time(body)).min
        println(f"[storebench] $tag%-22s $t%.3f s")
        tag -> t
      }
      val loHi = (1000L, 1099L) // 0.1% of the key domain
      val results = Seq(
        best("scan-filter-range") {
          VersionedStore.snapshot(spark, store)
            .filter(col("user_email").between(loHi._1, loHi._2))
            .agg(count(lit(1)), sum(col("value"))).collect()
        },
        best("snapshotWhere") {
          VersionedStore.snapshotWhere(spark, store, "user_email",
              loHi._1, loHi._2)
            .agg(count(lit(1)), sum(col("value"))).collect()
        },
        best("scan-filter-point") {
          VersionedStore.snapshot(spark, store)
            .filter(col("event_id") === needle).collect()
        },
        best("snapshotPoint") {
          VersionedStore.snapshotPoint(spark, store, "event_id", needle)
            .collect()
        },
        best("scan-count") {
          VersionedStore.snapshot(spark, store).count()
        },
        best("metadata-count") {
          VersionedStore.snapshotRowCount(spark, store)
        })
      println(results.map { case (k, v) => s""""$k":$v""" }
        .mkString(s"""{"rows":$nRows,"files":$nFiles,""", ",", "}"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
