package graft
import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage timing for the minhash pipeline. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n)")
    }
    time("warmup")(docs.count())
    time("shingleRows")(Dedup.shingleRows(docs, "doc_id", "text").count())
    time("signature")(Dedup.minhashSignature(docs, "doc_id", "text").count())
    time("bands")(Dedup.bandKeys(
      Dedup.minhashSignature(docs, "doc_id", "text"), "doc_id").count())
    time("cands")(Dedup.candidatePairs(Dedup.bandKeys(
      Dedup.minhashSignature(docs, "doc_id", "text"), "doc_id"), "doc_id").count())
    time("full")(Dedup.minhashDupPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
