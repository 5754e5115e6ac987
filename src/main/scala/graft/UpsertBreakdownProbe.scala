package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off breakdown of a VersionedStore.upsert at sf0.1: where does
  * the 1.6 s go — the touched-day probe, the keyed merge, or the
  * day-layout write? (scratch probe; results land in
  * OPTIMIZATION_r17.md) */
object UpsertBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    import graft.load.{Merge, VersionedStore}

    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[upb] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      out
    }

    val ev = Tables.eventsAsHabits(spark, sfDir)
    println(s"[upb] events rows=${ev.count()} days=" +
      ev.select(to_date(col("ts"))).distinct().count())
    val tmp = java.nio.file.Files.createTempDirectory("graft_upb_")
    try {
      val store = tmp.toString + "/store"
      t("create")(VersionedStore.create(ev, store))
      val batch = ev.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
      for (i <- 1 to 2) {
        t(s"touched_days_$i") {
          batch.select(to_date(col("ts")).cast("string").as("d"))
            .distinct().collect().length
        }
        val existing = VersionedStore.snapshot(spark, store)
        t(s"merge_noop_$i") {
          Merge.upsertEvents(existing, batch, Merge.EventKeys)
            .write.format("noop").mode("overwrite").save()
        }
        val merged = Merge.upsertEvents(existing, batch, Merge.EventKeys)
        t(s"merge_write_daylayout_$i") {
          merged.withColumn("__day", to_date(col("ts")))
            .repartition(col("__day"))
            .sortWithinPartitions(
              col("user_email"), col("habit"), col("ts"))
            .write.mode("overwrite").partitionBy("__day")
            .parquet(s"$tmp/w$i")
        }
        t(s"merge_write_nolayout_$i") {
          Merge.upsertEvents(existing, batch, Merge.EventKeys)
            .write.mode("overwrite").parquet(s"$tmp/n$i")
        }
        t(s"full_upsert_$i") {
          VersionedStore.upsert(spark, store, batch)
        }
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
