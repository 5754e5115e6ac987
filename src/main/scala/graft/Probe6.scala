package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: is q_transform_wide's bench cost compile-once or per-run? */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_transform_wide")(spark, "unused").count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
