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

  /** Tiny separable corpus for the linear probe: long docs (many
    * tokens/chars) labeled 1 by `n_chars >= 306`. */
  private def probeDocs(nLong: Int, nShort: Int) = {
    val s = spark
    import s.implicits._
    val long = (0 until nLong).map { i =>
      val t = Seq.fill(80 + i % 7)("abcdef").mkString(" ")
      (i.toLong * 2, t, t.length.toLong)
    }
    val short = (0 until nShort).map { i =>
      val t = Seq.fill(20 + i % 5)("abc").mkString(" ")
      (i.toLong * 2 + 1, t, t.length.toLong)
    }
    (long ++ short).toDF("doc_id", "text", "n_chars")
  }

  test("logRegFit: weights match a driver-side scalar reference and " +
      "are partitioning-invariant") {
    val docs = probeDocs(12, 12)
    val label = col("n_chars") >= 306
    val w = Classify.logRegFit(docs, "text", "n_chars", label,
      iters = 3, lr = 0.5)
    val w7 = Classify.logRegFit(docs.repartition(7), "text", "n_chars",
      label, iters = 3, lr = 0.5)
    // exact long gradient sums ⇒ repartitioning cannot move a bit
    assert(w.toSeq == w7.toSeq)

    // scalar replay of the same quantized-GD recurrence
    val rows = docs.select(col("n_chars"),
      size(split(col("text"), " ")).cast("double").as("nt")).collect()
      .map(r => (r.getLong(0).toDouble, r.getDouble(1)))
    val feats = rows.map { case (ch, nt) =>
      (if (ch >= 306) 1.0 else 0.0,
        Array(1.0, (nt - 56.0) / 32.0, (ch - 306.0) / 128.0,
          ch / nt - 5.5))
    }
    val ref = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val g = Array.fill(4)(0L)
      feats.foreach { case (y, f) =>
        val z = ref(0) * f(0) + ref(1) * f(1) + ref(2) * f(2) +
          ref(3) * f(3)
        val err = (0.5 + z / (2.0 * (1.0 + math.abs(z)))) - y
        for (j <- 0 to 3)
          g(j) += BigDecimal(err * f(j) * 1048576.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      for (j <- 0 to 3)
        ref(j) = ref(j) - 0.5 * ((g(j).toDouble / 1048576.0) / feats.length)
    }
    assert(w.toSeq == ref.toSeq)
  }

  test("logRegQuality: the probe separates the separable label") {
    val out = Classify.logRegQuality(probeDocs(12, 12), "doc_id", "text",
      "n_chars", col("n_chars") >= 306, iters = 3, lr = 0.5).collect()
    assert(out.length == 24)
    assert(out.forall(r => r.getInt(3) == r.getInt(1))) // pred == y
    // margins carry the ranking signal, not just the sign
    val margins = out.map(r => (r.getInt(1), r.getLong(2)))
    assert(margins.filter(_._1 == 1).map(_._2).min >
      margins.filter(_._1 == 0).map(_._2).max)
  }

  test("calibration: clamped bins, exact ppm rates, out-of-range rows " +
      "land in the edge buckets") {
    val s = spark
    import s.implicits._
    val scored = Seq(
      // bucket 0 via clamping (below lo), bucket 0 in range
      (-5000000L, 1), (-999999L, 0),
      // bucket 3: [-250000, 0): two rows, one positive -> 500000 ppm
      (-200000L, 1), (-1L, 0),
      // bucket 4: [0, 250000): three rows, one positive -> 333333 ppm
      (0L, 0), (100L, 1), (200000L, 0),
      // bucket 7 via clamping (above hi-1)
      (999999L, 1), (7000000L, 1))
      .toDF("margin_e6", "y")
    val out = Classify.calibration(scored, "margin_e6", "y",
        lo = -1000000L, hi = 1000000L, buckets = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((2L, 1L, 500000L)))
    assert(out(3L) == ((2L, 1L, 500000L)))
    assert(out(4L) == ((3L, 1L, 333333L)))
    assert(out(7L) == ((2L, 2L, 1000000L)))
    assert(out.keySet == Set(0L, 3L, 4L, 7L))
  }

  test("chiSquareTerms: perfect separator tops, degenerate contingency " +
      "scores zero, values replay the scalar formula") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x y", "en"), (2L, "x y", "en"),
      (3L, "y z", "de"), (4L, "y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Classify.chiSquareTerms(df, "doc_id", "text", "lang",
        posLabel = "en", topK = 10)
      .collect().map(r => r.getString(1) ->
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // x: a=2 b=0 c=0 d=2 -> chi2 = 4*16/16 = 4.0 -> 4e6, rank 1
    assert(got("x") == ((1L, 2L, 2L, 4000000L)))
    // z: a=0 b=1 c=2 d=1 -> chi2 = 4*4/12 -> round(1333333.33) 
    assert(got("z") == ((2L, 0L, 1L, 1333333L)))
    // y appears in EVERY doc: (c+d)=0 -> degenerate -> 0 by convention
    assert(got("y") == ((3L, 2L, 4L, 0L)))
  }
}
