package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch: pin down builtin edge semantics before relying on
  * them in ext operators. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("a b c d e", "abc"), ("x y", "héllo")).toDF("t", "s")
    df.select(
      expr("CASE WHEN size(split(t,' ')) >= 3 THEN transform(sequence(1, size(split(t,' '))-2), i -> concat_ws(' ', slice(split(t,' '), i, 3))) ELSE array(t) END").as("shingles"),
      split(col("s"), "").as("chars"),
      expr("aggregate(split(s,''), 0L, (acc, c) -> pmod(acc*31 + ascii(c), 1000000007L))").as("polyhash"),
      expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("h60"),
      expr("regexp_extract_all('Hello, world! 42', '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)").as("toks"),
      md5(encode(col("s"), "UTF-8")).as("md5bin"),
      expr("substring(encode(s, 'UTF-8'), 2, 3)").cast("string").as("subbin"),
      ascii(lit("é")).as("asc")
    ).show(5, 200, vertical = true)
    // sequence(0,-1) behavior
    try df.select(expr("sequence(1, 0)")).show()
    catch { case e: Throwable => println("sequence(1,0) FAILS: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
