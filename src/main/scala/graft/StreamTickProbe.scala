package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wall-clock probe for the streaming-ledger replays the r16 verdict
  * named as the bench's dominant fixed-overhead block — one JSON line
  * per query arm with the replay's total seconds and (where the ingest
  * is instrumented) its per-tick stage milliseconds, so a tick-job
  * change (pin-through-parquet, census single-pass, write batching)
  * has before/after receipts at the STAGE grain, not just the bench
  * total. Usage: `runMain graft.StreamTickProbe [sfDir] [arms]` with
  * `arms` a comma list from {cluster, band, dedup, web, url, funnel};
  * default all. Each arm runs `runs` times (3rd arg, default 2); min
  * is reported (the house cold-JIT discipline). */
object StreamTickProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val arms = args.lift(1).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("cluster", "band", "dedup", "web", "url", "funnel"))
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val known = Set("cluster", "band", "dedup", "web", "url", "funnel")
    require(arms.subsetOf(known),
      s"unknown arm(s) ${arms.diff(known).mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tickJson(qn: String): String =
      Option(graft.streaming.Streaming.tickStages.get(qn))
        .map(_.toArray(Array.empty[(Long, Seq[(String, Long)])]))
        .getOrElse(Array.empty)
        .sortBy(_._1)
        .map { case (b, st) =>
          s""""tick_$b":{${st.map { case (n, m) =>
            s""""$n":$m""" }.mkString(",")}}""" }
        .mkString(",")

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      graft.ext.Pinned.releaseAllScratch()
    }

    val bodies: Seq[(String, (String, String) => DataFrame)] = Seq(
      "cluster" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.clusterIncrementalAvailableNow(
          spark, sfDir, wd, qn)),
      "band" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.bandLedgerAvailableNow(
          spark, sfDir, wd, qn)),
      "dedup" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.dedupIncrementalAvailableNow(
          spark, sfDir, wd, qn)),
      "web" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.webStreamAvailableNow(
          spark, sfDir, wd, qn)),
      "url" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.urlStreamAvailableNow(
          spark, sfDir, wd, qn)),
      "funnel" -> ((wd: String, qn: String) =>
        graft.streaming.Streaming.funnelStreamAvailableNow(
          spark, sfDir, wd, qn)))

    val parts = bodies.filter { case (n, _) => arms(n) }.map {
      case (arm, body) =>
        val best = (1 to runs).map { i =>
          sweep()
          val tmp = java.nio.file.Files
            .createTempDirectory(s"graft_stp_${arm}_")
          try {
            val qn = s"graft_stp_${arm}_$i"
            val t0 = System.nanoTime()
            body(tmp.toString, qn)
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            (sec, qn)
          } finally org.apache.commons.io.FileUtils
            .deleteDirectory(tmp.toFile)
        }.minBy(_._1)
        f""""$arm":{"sec":${best._1}%.2f,"tick_stage_ms":{${tickJson(best._2)}}}"""
    }
    println(s"""{"metric":"stream_ticks","sf":"$sfDir",${parts.mkString(",")}}""")
    spark.stop()
  }
}
