package graft
import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: micro-bench the embedding near-dup pair kernel. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    time("warmup")(embs.select(col("vec_id")))
    time("pairs_kernel")(
      Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4))
    time("pairs_kernel_2nd")(
      Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4))
    spark.stop()
  }
}
