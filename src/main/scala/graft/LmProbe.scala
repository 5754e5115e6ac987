package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off stage decomposition of the stupid-backoff LM chain (the
  * r16 optimization round's #1 target): times each constituent of
  * [[graft.ext.TextAnalysis.stupidBackoffLogProb]] in isolation with
  * the noop sink, so the ~6.5 s q_lm_backoff spends at sf0.1 is
  * attributable to a stage instead of guessed at. Prints one JSON
  * line of stage seconds.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.LmProbe /root/testdata/sf0.1"
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      (tag, s)
    }

    val docs = Tables.read(spark, dir, "documents")
    // session warm-up (footer reads, codegen)
    noop(docs.limit(100))

    import graft.ext.TextAnalysis.tokens
    val t = tokens(col("text"))
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    results += time("docs_scan")(noop(docs.select(col("doc_id"), col("text"))))
    // variant A: token array materialized ONCE into a column, lambda
    // reads the attribute (does CollapseProject re-inline the split?)
    val tok = col("_t")
    val instA = docs
      .select(col("doc_id"), t.as("_t"))
      .filter(size(tok) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(3), size(tok)),
        i => struct(element_at(tok, i - 2).as("w1"),
          element_at(tok, i - 1).as("w2"),
          element_at(tok, i).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
    results += time("instA_materialized_noop")(noop(instA))
    // variant B: arrays_zip over three slices of the materialized array
    val instB = docs
      .select(col("doc_id"), t.as("_t"))
      .filter(size(tok) >= 3)
      .select(col("doc_id"), explode(arrays_zip(
        slice(tok, lit(1), size(tok) - 2).as("w1"),
        slice(tok, lit(2), size(tok) - 2).as("w2"),
        slice(tok, lit(3), size(tok) - 2).as("w3"))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
    results += time("instB_zip_noop")(noop(instB))
    println("plan A:")
    instA.explain(false)
    val instPlan = docs
      .filter(size(t) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(3), size(t)),
        i => struct(element_at(t, i - 2).as("w1"),
          element_at(t, i - 1).as("w2"),
          element_at(t, i).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
    results += time("inst_explode_noop")(noop(instPlan))
    println("inst rows: " + instPlan.count())

    var pinned: DataFrame = null
    results += time("pin_parquet_write") {
      pinned = graft.ext.Pinned.columnarPin(instPlan, "probe")
    }
    results += time("pin_read_noop")(noop(pinned))
    var ckpt: DataFrame = null
    results += time("pin_localCheckpoint") {
      ckpt = instPlan.localCheckpoint(true)
    }
    results += time("ckpt_read_noop")(noop(ckpt))

    val toks = docs.select(explode(t).as("w")).filter(col("w") =!= "")
    results += time("toks_count")(toks.count())
    results += time("uni_agg")(
      noop(toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))))
    val big = docs.filter(size(t) >= 2)
      .select(explode(transform(sequence(lit(2), size(t)),
        i => struct(element_at(t, i - 1).as("w1"),
          element_at(t, i).as("w2")))).as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    results += time("big_agg")(noop(big))
    results += time("tri_agg_from_pin")(
      noop(pinned.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("c3")).filter(col("c3") >= 2)))

    // gate-expression probes (the funnel/pipeline per-tick `gate` stage)
    import graft.ext.TextAnalysis
    results += time("gate_langid_noop")(
      noop(docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("l"))))
    results += time("gate_quality_noop")(
      noop(docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))))
    results += time("gate_full_noop")(
      noop(docs.select(col("doc_id"), col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.nTokens(col("text")).as("n_tokens"))
        .filter(TextAnalysis.langId(col("text")) === "en" &&
          col("quality") >= 60.0)))
    results += time("full_chain_total")(
      noop(graft.ext.TextAnalysis.stupidBackoffLogProb(docs, "doc_id", "text")
        .orderBy(col("doc_id"))))
    // second run, warm
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    results += time("full_chain_total2")(
      noop(graft.ext.TextAnalysis.stupidBackoffLogProb(docs, "doc_id", "text")
        .orderBy(col("doc_id"))))

    println(results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
