package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: print schemas + a row from each driver testdata table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t rows=${df.count()}")
        df.printSchema()
        df.show(2, 60)
      } catch { case e: Throwable =>
        println(s"== $t FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
