package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level wall clock for the q_matview_join composition — the
  * most expensive untouched family per the r16 verdict. Each store
  * commit and view step is timed separately so a commit-path change
  * (repartition fast path, touchedDays collapse) has receipts at the
  * phase grain. Run: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.MatviewProbe [sfDir] [runs]"`. */
object MatviewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
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
    import graft.load.{IncrementalView, VersionedStore}

    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }

    val all = (1 to runs).map { _ =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val ev = Tables.eventsAsHabits(spark, sfDir)
      def e6(c: Column) = round(c * 1e6).cast("long")
      val contrib = e6(col("value") * col("weight"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_mvp_")
      try {
        val (factPath, dimPath) =
          (tmp.toString + "/fact", tmp.toString + "/dim")
        val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        def ph[T](name: String)(body: => T): T = {
          val (out, sec) = t(body); phases += (name -> sec); out
        }
        ph("fact_create")(VersionedStore.create(ev, factPath))
        ph("fact_upsert")(VersionedStore.upsert(spark, factPath,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("value", col("value") * 2)))
        val dim0 = ev.select(col("user_email")).distinct()
          .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
          .withColumn("weight", (col("user_email") % 5 + 1).cast("double"))
        ph("dim_create")(VersionedStore.create(dim0, dimPath,
          sortCols = Seq("user_email")))
        ph("dim_upsert")(VersionedStore.upsert(spark, dimPath,
          dim0.filter(col("user_email") % 4 === 0)
            .withColumn("weight", col("weight") + 10),
          keys = Seq("user_email"), sortCols = Seq("user_email")))
        ph("dim_delete")(VersionedStore.delete(spark, dimPath,
          col("user_email") % 11 === 0, sortCols = Seq("user_email")))
        val view = ph("view_compute") {
          val a0 = VersionedStore.snapshot(spark, factPath, Some(0))
            .select(col("user_email"), col("habit"), col("value"))
          val b0 = VersionedStore.snapshot(spark, dimPath, Some(0))
            .select(col("user_email"), col("weight"))
          val mv0 = IncrementalView.fromSnapshot(
            a0.join(b0, "user_email"), Seq("habit"), contrib)
          val zA = IncrementalView.zRelation(
            VersionedStore.changes(spark, factPath, 0, 1)
              .select(col("user_email"), col("habit"), col("op"),
                col("value_old"), col("value_new")))
          val zB = IncrementalView.zRelation(
            VersionedStore.changes(spark, dimPath, 0, 2,
                keys = Seq("user_email"))
              .select(col("user_email"), col("op"),
                col("weight_old"), col("weight_new")))
          val bNew = VersionedStore.snapshot(spark, dimPath)
            .select(col("user_email"), col("weight"))
          IncrementalView.applyJoinDelta(mv0, zA, bNew, a0, zB,
            Seq("user_email"), Seq("habit"), contrib)
        }
        ph("view_materialize")(
          view.write.format("noop").mode("overwrite").save())
        phases.toSeq
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    // per-phase min across runs
    val names = all.head.map(_._1)
    val body = names.map { n =>
      val mn = all.map(_.toMap.apply(n)).min
      f""""$n":$mn%.2f"""
    }.mkString(",")
    println(s"""{"metric":"matview_phases","sf":"$sfDir",$body}""")
    spark.stop()
  }
}
