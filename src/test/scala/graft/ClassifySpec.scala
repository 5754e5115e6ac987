package graft

import graft.ext.Classify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the in-engine classifier contracts (ext.Classify): Naive Bayes
  * smoothing/argmax arithmetic and the kNN vote tie-break chain — the
  * semantics the DuckDB oracles in SparkEntry replay.
  */
class ClassifySpec extends AnyFunSuite with SparkTestSession {

  test("naiveBayes: held-out docs get the class whose tokens dominate") {
    val s = spark
    import s.implicits._
    // ids 1-4,6-9 train (x%5 != 0); ids 5,10 are held out.
    val df = Seq(
      (1L, "aa aa bb", "A"), (2L, "aa bb aa", "A"),
      (3L, "aa aa aa", "A"), (4L, "bb aa aa", "A"),
      (6L, "cc cc dd", "B"), (7L, "cc dd cc", "B"),
      (8L, "cc cc cc", "B"), (9L, "dd cc cc", "B"),
      (5L, "aa aa bb aa", "A"), (10L, "cc cc dd cc", "B")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayes(df, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L, 10L))
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("A", "A"), ("B", "B")))
    // scores are negative log-posteriors in 1e-6 units
    assert(out.forall(_.getLong(3) < 0L))
  }

  test("naiveBayes: smoothing scores unseen tokens, equal evidence " +
      "ties break to the ascending class") {
    val s = spark
    import s.implicits._
    // Symmetric training: class A and B are mirror images, so a test
    // doc of only UNSEEN tokens scores identically under both (same
    // token totals, same vocab, same priors) — argmax must take 'A'.
    val df = Seq(
      (1L, "aa aa", "A"), (2L, "bb bb", "B"),
      (5L, "zz zz zz", "A")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayes(df, "doc_id", "text", "lang").collect()
    assert(out.length == 1 && out(0).getString(2) == "A")
  }

  test("knnClassify: majority label wins; vote ties fall to best dot") {
    val s = spark
    import s.implicits._
    // dim-2 vectors; ids % 5 == 0 are queries. Query 5 = (10, 0): its
    // 3 nearest train vectors under the quantized dot are the two
    // label-1 x-axis vectors and one label-2 y-axis vector.
    val df = Seq(
      (1L, Array(10f, 0f), 1), (2L, Array(9f, 1f), 1),
      (3L, Array(0f, 10f), 2), (4L, Array(1f, 9f), 2),
      (5L, Array(10f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Classify.knnClassify(
      df.filter(col("vec_id") % 5 =!= 0), df.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", "label", k = 3).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 5L && r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getLong(3) == 2L) // two of the three neighbors carry label 1
  }
}
