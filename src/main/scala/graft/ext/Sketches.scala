package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketching — the count-min complement to the HLL
  * distinct-count rollup (`q_hll_rollup`): approximate per-value
  * frequencies from one pass and O(1/eps · log(1/δ)) space, with the
  * classic one-sided guarantee `exact ≤ estimate ≤ exact + eps·N`
  * (overcount only, probability ≥ confidence).
  *
  * Scale notes (100 TB): `stat.countMinSketch` tree-aggregates
  * partition-local sketches — the corpus never shuffles and only the
  * fixed-size counter table reaches the driver; per-executor probes
  * then read a broadcast of it. That is the right shape for "rough
  * frequencies of a billion keys": the exact groupBy this module's
  * verification side runs is itself the scale-limited path (its shuffle
  * carries every distinct key).
  */
object Sketches {

  /** Per-distinct-value exact count + sketch estimate for `valueCol`.
    * The exact side exists to VERIFY the sketch (the oracle pins the
    * guarantee); production reads would probe the broadcast sketch
    * alone. Returns `(value, exact_n, est_n)`.
    *
    * @param eps        additive error bound as a fraction of total rows
    * @param confidence probability the bound holds per query
    * @param seed       hash-family seed — fixes the sketch bit-for-bit
    */
  def cmsFrequencies(df: DataFrame, valueCol: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    require(confidence > 0 && confidence < 1, "confidence must be in (0, 1)")
    // build the sketch over the STRING form so the string probe below
    // hashes into the same counters for any input column type — a
    // native-typed build (e.g. long) would hash differently than the
    // string probe and silently void the one-sided guarantee
    val strDf = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("value"))
    val sketch = strDf.stat.countMinSketch("value", eps, confidence, seed)
    cmsEstimates(df, valueCol, sketch)
  }

  /** Exact per-value counts of `valueCol` probed against an EXISTING
    * sketch — the read side of [[cmsFrequencies]], split out so a
    * sketch MAINTAINED elsewhere (e.g. summed per-micro-batch at
    * ingest, `Streaming.cmsIngest`) verifies through the same path.
    *
    * Probes ride the native graft_cms_estimate expression (the CMS
    * analog of Spark's BloomFilterMightContain, which Spark doesn't
    * ship for CMS): the serialized counter table rides the plan as a
    * binary literal and the probe stays inside whole-stage codegen.
    * Sessions without graft.plans.GraftExtensions fall back to the
    * UDF form (checked once, driver-side), mirroring Bloom. */
  def cmsEstimates(df: DataFrame, valueCol: String,
      sketch: org.apache.spark.util.sketch.CountMinSketch): DataFrame = {
    val strDf = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("value"))
    val spark = df.sparkSession
    val estimate =
      if (spark.catalog.functionExists("graft_cms_estimate")) {
        val os = new java.io.ByteArrayOutputStream()
        sketch.writeTo(os)
        call_function("graft_cms_estimate", lit(os.toByteArray), col("value"))
      } else {
        val bc = spark.sparkContext.broadcast(sketch)
        udf((v: String) => bc.value.estimateCount(v)).apply(col("value"))
      }
    strDf
      .groupBy(col("value"))
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("est_n", estimate)
  }
}
