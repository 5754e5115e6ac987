package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine classifiers for training-data curation: multinomial Naive
  * Bayes over document tokens (the fastText-shaped "train a cheap
  * classifier on labeled docs, score the corpus" step of an LLM data
  * pipeline) and a majority-vote kNN labeler over embeddings (label
  * propagation from a small labeled seed set to the unlabeled corpus).
  *
  * Extension scope beyond the reference (SURVEY.md §7.5; driver tables
  * `documents` / `embeddings`).
  *
  * Both classifiers are ENGINE-EXACT, not approximately reproducible:
  * every per-token/per-neighbor contribution is quantized to an integer
  * (1e-6 log-prob units / int8 code dots) BEFORE the aggregation, so
  * the score sums are order-insensitive long arithmetic and an external
  * SQL oracle replays the trained model and every prediction bit for
  * bit — the same discipline as [[Similarity.kmeansFitInt8]].
  */
object Classify {

  /** Multinomial Naive Bayes with Laplace (+1) smoothing, trained and
    * scored in one plan. Rows with `idCol % holdMod == 0` are the
    * held-out test set; the rest train the model. Returns one row per
    * test document: (idCol, labelCol, pred, score_e6) where `pred` is
    * the argmax class and `score_e6` the winning log-posterior in
    * 1e-6 units.
    *
    * Model: per class c, P(c) = docs_c / docs and P(t|c) =
    * (count(t,c) + 1) / (tokens_c + |V|); score(d, c) = ln P(c) +
    * Σ_t n_t(d) · ln P(t|c). Every ln is quantized to a long in 1e-6
    * units per (term, class) — the sum over a document is then exact
    * integer math, independent of partial-aggregation order, so the
    * argmax (ties broken by class ascending) is deterministic across
    * engines.
    *
    * Scale (100 TB corpus, C classes): the model build is one
    * map-side-partial aggregate over train tokens shuffled on
    * (class, term) — the tf shape of [[TextAnalysis.tfidfTopTerms]].
    * Scoring fans each distinct (doc, term) out ×C (C is small — the
    * model dimension, not data) and equi-joins the (term, class) model
    * relation — vocabulary-sized, AQE-broadcast when small; the
    * class-level relation (priors, unseen-term default, C rows) rides
    * an explicit broadcast. No driver-side state: the model stays a
    * relation end to end.
    */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, holdMod: Int = 5): DataFrame = {
    require(holdMod > 1, "holdMod must leave both a train and a test set")
    val isTest = pmod(col(idCol), lit(holdMod)) === 0
    val train = docs.filter(!isTest)
    val test = docs.filter(isTest)

    val tf = train
      .select(col(labelCol).as("pred"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("pred"), col("term"))
      .agg(count(lit(1)).as("c"))
    val totals = tf.groupBy(col("pred")).agg(sum(col("c")).as("t_tokens"))
    val vocab = tf.agg(countDistinct(col("term")).as("v"))
    val priors = train.groupBy(col(labelCol).as("pred"))
      .agg(count(lit(1)).as("d_c"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("d_tot"))))

    // class-level model: C rows — prior and the unseen-term default
    val classModel = totals.crossJoin(broadcast(vocab))
      .join(priors, "pred")
      .select(col("pred"),
        round(log(lit(1d) / (col("t_tokens") + col("v"))) * 1e6)
          .cast("long").as("logp0_e6"),
        round(log(col("d_c").cast("double") / col("d_tot")) * 1e6)
          .cast("long").as("prior_e6"))
    // term-level model: |V| × C rows, quantized per (term, class)
    val termModel = tf.crossJoin(broadcast(vocab))
      .join(broadcast(totals), "pred")
      .select(col("term"), col("pred"),
        round(log((col("c") + lit(1)).cast("double") /
          (col("t_tokens") + col("v"))) * 1e6).cast("long").as("logp_e6"))

    val testTf = test
      .select(col(idCol), col(labelCol),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col(labelCol), col("term"))
      .agg(count(lit(1)).as("n"))
    val scored = testTf
      .crossJoin(broadcast(classModel.select(col("pred"), col("logp0_e6"))))
      .join(termModel, Seq("term", "pred"), "left")
      .groupBy(col(idCol), col(labelCol), col("pred"))
      .agg(sum(col("n") * coalesce(col("logp_e6"), col("logp0_e6")))
        .as("tok_e6"))
      .join(broadcast(classModel.select(col("pred"), col("prior_e6"))),
        "pred")
      .withColumn("score_e6", col("tok_e6") + col("prior_e6"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("pred"))
    scored.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .select(col(idCol), col(labelCol), col("pred"), col("score_e6"))
  }

  /** Centering/scaling constants for [[logRegFeatures]]. Plain GD on
    * raw length counts barely moves — the uninformative mean-token-
    * length column dominates the gradient magnitude — so features are
    * shifted to ≈0 mean and unit-ish range by FIXED constants (the
    * rough shape of the `documents` table; power-of-two scales so the
    * scaling itself is exact). Constants, not data-derived means: a
    * computed mean would be an order-sensitive double sum and break
    * engine-exact replay. */
  case class LogRegFeatureSpec(tokCenter: Double = 56.0,
      tokScale: Double = 32.0, charCenter: Double = 306.0,
      charScale: Double = 128.0, ratioCenter: Double = 5.5)

  /** Feature vector for the document probe trained by [[logRegFit]]:
    * bias, centered token count, centered char count, centered mean
    * token length. All derive from integers by one IEEE subtract +
    * divide each, so any engine recomputing them from the same rows
    * gets bit-identical doubles. */
  private[graft] def logRegFeatures(docs: DataFrame, textCol: String,
      charsCol: String, fs: LogRegFeatureSpec): DataFrame = {
    val nTok = size(split(col(textCol), " ")).cast("double")
    val nCh = col(charsCol).cast("double")
    docs.withColumn("__f1", (nTok - lit(fs.tokCenter)) / lit(fs.tokScale))
      .withColumn("__f2", (nCh - lit(fs.charCenter)) / lit(fs.charScale))
      .withColumn("__f3", nCh / nTok - lit(fs.ratioCenter))
  }

  /** Margin w·x under fixed left-to-right association — the association
    * the SQL oracle's `w0 + w1*f1 + w2*f2 + w3*f3` also uses, so both
    * engines round identically at every step. */
  private def margin(w: Array[Double]): org.apache.spark.sql.Column =
    lit(w(0)) + lit(w(1)) * col("__f1") + lit(w(2)) * col("__f2") +
      lit(w(3)) * col("__f3")

  /** Train a binary logistic probe over document-shape features with
    * full-batch gradient descent, ENGINE-EXACTLY: each row's gradient
    * contribution is quantized to a long in 2^-20 units BEFORE the sum,
    * so the per-iteration gradient is order-insensitive integer math
    * and an external SQL oracle unrolling the same `iters` CTE steps
    * reproduces every weight bit for bit. The activation is the
    * rational "fast sigmoid" σ̂(z) = 0.5 + z/(2·(1+|z|)) — same shape
    * as the logistic without `exp`, whose libm rounding differs across
    * engines and would break exact replay.
    *
    * This is the fastText/CCNet-style cheap quality-classifier step of
    * an LLM data pipeline (label a seed set, fit a linear probe, score
    * the corpus), expressed as the reference's analytics would be: the
    * reference trains nothing, so the probe is extension scope
    * (SURVEY.md §7.5).
    *
    * Scale (100 TB): each iteration is ONE map-side-partial global
    * aggregate — four long sums — so `iters` passes over the corpus
    * with O(d) driver state and no shuffle of data rows; the scored
    * output is a per-row projection under broadcast-literal weights.
    * Cache the feature projection when memory allows (the fit loop
    * reuses it `iters` times); at corpus scale leave it unpersisted
    * and pay the scans — the algorithm is pass-bounded either way.
    */
  def logRegFit(docs: DataFrame, textCol: String, charsCol: String,
      labelExpr: org.apache.spark.sql.Column, iters: Int = 3,
      lr: Double = 0.5,
      fs: LogRegFeatureSpec = LogRegFeatureSpec()): Array[Double] = {
    val feats = logRegFeatures(docs, textCol, charsCol, fs)
      .withColumn("__y", when(labelExpr, lit(1.0)).otherwise(lit(0.0)))
      .select(col("__y"), col("__f1"), col("__f2"), col("__f3"))
      .persist()
    try {
      val n = feats.count().toDouble
      require(n > 0, "logRegFit: empty training set")
      val w = Array(0.0, 0.0, 0.0, 0.0)
      for (_ <- 1 to iters) {
        val z = margin(w)
        val s = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
        val err = s - col("__y")
        def g(f: org.apache.spark.sql.Column) =
          sum(round(err * f * lit(1048576.0)).cast("long"))
        val r = feats.agg(g(lit(1.0)), g(col("__f1")), g(col("__f2")),
          g(col("__f3"))).head()
        for (j <- 0 to 3)
          w(j) = w(j) - lr * ((r.getLong(j).toDouble / 1048576.0) / n)
      }
      w
    } finally feats.unpersist()
  }

  /** Score `docs` under [[logRegFit]] weights: one row per document
    * with the quantized margin (1e-6 units) and the sign prediction.
    * Per-row projection only — no shuffle, no join. */
  def logRegScore(docs: DataFrame, idCol: String, textCol: String,
      charsCol: String, labelExpr: org.apache.spark.sql.Column,
      w: Array[Double],
      fs: LogRegFeatureSpec = LogRegFeatureSpec()): DataFrame =
    logRegFeatures(docs, textCol, charsCol, fs)
      .withColumn("margin_e6",
        round(margin(w) * lit(1000000.0)).cast("long"))
      .select(col(idCol),
        when(labelExpr, lit(1)).otherwise(lit(0)).as("y"),
        col("margin_e6"),
        when(col("margin_e6") > 0, lit(1)).otherwise(lit(0)).as("pred"))

  /** Fit + score in one call — the `queries()` entry point. */
  def logRegQuality(docs: DataFrame, idCol: String, textCol: String,
      charsCol: String, labelExpr: org.apache.spark.sql.Column,
      iters: Int = 3, lr: Double = 0.5,
      fs: LogRegFeatureSpec = LogRegFeatureSpec()): DataFrame =
    logRegScore(docs, idCol, textCol, charsCol, labelExpr,
      logRegFit(docs, textCol, charsCol, labelExpr, iters, lr, fs), fs)

  /** Majority-vote kNN labeler: each `test` vector takes the most
    * frequent label among its k nearest `train` vectors under the
    * integer-exact int8-quantized dot ([[Similarity.knnQuantizedInt8]]).
    * Ties break on (votes desc, best dot desc, label asc) — all exact
    * integers, so predictions replay engine-exactly. Returns one row
    * per test vector: (query_id, labelCol, pred, votes).
    *
    * Scale (100 TB): inherits the quantized-kNN shape — broadcast query
    * codes, partition-local top-k cut before the ranking window; the
    * vote is a (query, label) aggregate over q×k rows and the label
    * lookup is an equi-join on the train id. For corpus-sized query
    * sets swap the neighbor stage for [[Similarity.knnLsh]]/`knnIvf`
    * behind the same vote — the contract only needs (query_id, nn_id,
    * qdot).
    */
  def knnClassify(train: DataFrame, test: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = Similarity.knnQuantizedInt8(train, test, idCol, vecCol, k)
    val votes = nn
      .join(train.select(col(idCol).as("nn_id"), col(labelCol).as("pred")),
        "nn_id")
      .groupBy(col("query_id"), col("pred"))
      .agg(count(lit(1)).as("votes"), max(col("qdot")).as("best_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_dot").desc, col("pred"))
    votes.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .join(test.select(col(idCol).as("query_id"), col(labelCol)),
        "query_id")
      .select(col("query_id"), col(labelCol), col("pred"), col("votes"))
  }

  /** Classifier reliability (calibration) bins — the EVAL stage that
    * closes the train → score → evaluate loop: clamp each scored row's
    * margin into one of `buckets` equal-width bins over [lo, hi) and
    * report per-bin volume, positive count, and the empirical positive
    * rate in exact ppm. A well-calibrated probe shows the rate rising
    * monotonically with the margin bin; a probe that separates but
    * mis-ranks shows up immediately. One narrow bucket projection +
    * one map-side-partial aggregate over `buckets` groups — the
    * [[graft.ext.Profile]] histogram discipline applied to classifier
    * outputs.
    *
    * Determinism: rows clamp into [lo, hi−1] BEFORE the bucket
    * division, so the index arithmetic never divides a negative
    * number (Spark longs truncate toward zero, SQL `//` floors — the
    * clamp keeps both on the same non-negative path); `pos_ppm` is
    * integer `n_pos * 1e6 / n`.
    *
    * @param scored (marginCol, labelCol) relation, e.g.
    *               [[logRegQuality]] output
    * @return (bucket, n, n_pos, pos_ppm) */
  def calibration(scored: DataFrame, marginCol: String, labelCol: String,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(buckets >= 1 && hi > lo,
      s"bad calibration knobs: lo=$lo hi=$hi buckets=$buckets")
    val clamped = least(greatest(col(marginCol), lit(lo)), lit(hi - 1))
    // both quotients are non-negative ints ≪ 2^53, so the double
    // division is exact-input/correctly-rounded and floor() equals
    // integer division on both engines
    scored
      .withColumn("bucket",
        floor((clamped - lit(lo)) * lit(buckets.toLong) / lit(hi - lo))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
      .withColumn("pos_ppm",
        floor(col("n_pos") * lit(1000000L) / col("n")).cast("long"))
      .select(col("bucket"), col("n"), col("n_pos"), col("pos_ppm"))
  }

  /** χ²-based term selection — which vocabulary terms are informative
    * about a label: the feature-selection pass run before training a
    * cheap classifier ([[naiveBayes]]/[[logRegFit]]), and the audit
    * that explains what an existing one keys on. Per term, the 2×2
    * document-frequency contingency vs `posLabel` and the classic
    * `χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`, reported in 1e-6
    * units.
    *
    * Exactness: a, b, c, d are exact longs; the squared determinant
    * and the denominator stay in LONG arithmetic (≤ N⁴, exact), and
    * the single double expression `1e6 · N · sq / den` promotes exact
    * integers through one fixed multiply/divide chain — correctly
    * rounded IEEE ops on identical inputs, so both engines produce the
    * same bits. Terms whose contingency degenerates (a row or column
    * of zeros) score 0 by convention instead of raising ANSI
    * divide-by-zero.
    *
    * Scale (100 TB): one narrow distinct-terms explode, ONE
    * (term)-keyed aggregate with map-side partials (label split via
    * conditional counts — no join), a broadcast of the 1-row totals,
    * then vocabulary-domain-sized arithmetic and top-k. The label
    * relation never shuffles. The cut is a partial-per-partition
    * top-k (TakeOrderedAndProject) — a 1e8-term vocabulary never
    * sorts or funnels through one task — pinned eagerly (one job,
    * topK rows) so the rank self-join below reads the winners once
    * instead of re-running the census twice; ranks then come from a
    * broadcast inequality self-join over those topK rows (topK² ≤ 400
    * comparisons), not a window.
    *
    * @return (rank, term, df_pos, df_all, chi2_e6) top-K by
    *         (chi2_e6 DESC, term) */
  def chiSquareTerms(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, posLabel: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val terms = docs
      .select(col(labelCol),
        explode(array_distinct(split(col(textCol).cast("string"), " ", -1)))
          .as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_all"),
        count(when(col(labelCol) === posLabel, 1)).as("df_pos"))
    val totals = docs.agg(count(lit(1)).as("n"),
      count(when(col(labelCol) === posLabel, 1)).as("np"))
    val scored = terms.crossJoin(broadcast(totals))
      .withColumn("a", col("df_pos"))
      .withColumn("b", col("df_all") - col("df_pos"))
      .withColumn("c", col("np") - col("df_pos"))
      .withColumn("d",
        col("n") - col("np") - col("df_all") + col("df_pos"))
      .withColumn("diff", col("a") * col("d") - col("b") * col("c"))
      .withColumn("sq", col("diff") * col("diff"))
      .withColumn("den",
        (col("a") + col("b")) * (col("c") + col("d")) *
          (col("a") + col("c")) * (col("b") + col("d")))
      .withColumn("chi2_e6",
        when(col("den") === 0, lit(0L)).otherwise(
          round(lit(1e6) * col("n") * col("sq") /
            col("den").cast("double")).cast("long")))
    // distributed top-k cut; eager pin so both join sides read the
    // materialized topK rows (terms are unique post-groupBy, so
    // "strictly better + 1" is exactly the dense 1..topK ranking)
    val top = scored
      .select(col("term"), col("df_pos"), col("df_all"), col("chi2_e6"))
      .orderBy(col("chi2_e6").desc, col("term"))
      .limit(topK)
      .localCheckpoint(true)
    top.as("a")
      .join(broadcast(top.select(col("chi2_e6").as("__c2"),
          col("term").as("__t2"))),
        col("__c2") > col("a.chi2_e6") ||
          (col("__c2") === col("a.chi2_e6") && col("__t2") < col("a.term")),
        "left")
      .groupBy(col("a.term").as("term"), col("a.df_pos").as("df_pos"),
        col("a.df_all").as("df_all"), col("a.chi2_e6").as("chi2_e6"))
      .agg((count(col("__t2")) + lit(1L)).as("rank"))
      .select(col("rank"), col("term"), col("df_pos"), col("df_all"),
        col("chi2_e6"))
  }
}
