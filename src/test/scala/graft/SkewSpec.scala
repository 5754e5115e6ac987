package graft

import graft.ext.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting utilities must be result-identical to their unsalted forms —
  * the salt may only change physical distribution. */
class SkewSpec extends AnyFunSuite with SparkTestSession {

  // key "hot" carries 90% of the rows
  private def largeDf = {
    val s = spark
    import s.implicits._
    ((1 to 90).map(i => ("hot", i)) ++ (1 to 10).map(i => (s"c$i", i)))
      .toDF("k", "v")
  }

  private def smallDf = {
    val s = spark
    import s.implicits._
    (Seq(("hot", "H")) ++ (1 to 10).map(i => (s"c$i", s"C$i")))
      .toDF("k", "tag")
  }

  test("saltedJoin equals the plain join") {
    val plain = largeDf.join(smallDf, Seq("k"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(largeDf, smallDf, "k", salts = 4)
      .select(col("k"), col("v"), col("tag"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedCountDistinct equals count_distinct") {
    val s = spark
    import s.implicits._
    val df = ((1 to 90).map(i => ("hot", i % 7)) ++
      (1 to 10).map(i => (s"c$i", i))).toDF("k", "v")
    val plain = df.groupBy(col("k"))
      .agg(count_distinct(col("v")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, "k", "v", salts = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("hot") == 7L)
  }

  test("saltedTopK equals the direct window top-k") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
    val plain = largeDf.withColumn("r", row_number().over(w))
      .filter(col("r") <= 3).drop("r")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedTopK(largeDf, "k", col("v").desc, k = 3,
        salts = 4)
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
