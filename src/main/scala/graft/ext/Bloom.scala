package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — build a keys-bloom over the (filtered)
  * dimension side and drop non-matching fact rows BEFORE the join
  * shuffle. The manual, explicitly-sized form of Spark's own runtime
  * row-level filtering (`InjectRuntimeFilter`), for when the planner's
  * heuristics don't fire or the build side comes from outside the query
  * (e.g. yesterday's key set).
  *
  * Scale design: the win case is a dimension too large to broadcast
  * whose KEY BLOOM still broadcasts — n keys cost ~1.2·n·log2(1/fpp)
  * bits, e.g. 10M keys at 1% fpp ≈ 14 MB, two orders of magnitude under
  * the rows themselves. The fact side then sheds (1 − selectivity −
  * fpp) of its rows map-side, shrinking the join shuffle by the same
  * factor. False positives are harmless: the exact join that follows
  * drops them, so the result is identical to the unpruned join (the
  * oracle proves exactly this). The sketch is built with one
  * distributed aggregate (`stat.bloomFilter` tree-aggregates partition
  * blooms); only the fixed-size bitmap ever reaches the driver.
  */
object Bloom {

  /** Inner equi-join `fact ⋈ dim ON factKey = dimKey`, with `fact`
    * pre-filtered through a bloom of `dim`'s keys. Key columns must be
    * integral (the sketch stores longs).
    *
    * @param expectedKeys  sketch sizing — an UPPER bound on distinct
    *                      `dimKey` values (overshooting wastes bitmap
    *                      bits; undershooting inflates fpp, which costs
    *                      shuffle volume but never correctness)
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // The sketch stores longs; a non-integral key would cast to null,
    // silently dropping fact rows the exact join would match. Fail fast
    // instead of breaking the result-identical-to-unpruned-join contract.
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    Seq(fact.schema(factKey) -> factKey, dim.schema(dimKey) -> dimKey)
      .foreach { case (f, n) =>
        require(integral.contains(f.dataType),
          s"bloomPrunedJoin requires an integral key column; '$n' is " +
            s"${f.dataType.simpleString}")
      }
    val bloom = dim.select(col(dimKey).cast("long").as(dimKey))
      .stat.bloomFilter(dimKey, expectedKeys, fpp)
    bloomPrunedJoinWith(fact, dim, factKey, dimKey, bloom)
  }

  /** [[bloomPrunedJoin]] against an EXISTING sketch — the read side
    * split out so a bloom MAINTAINED elsewhere (per-micro-batch at
    * ingest, `Streaming.bloomIngest` — bloom bitmaps under one sizing
    * OR together exactly into the one-pass bitmap) prunes through the
    * same code path. The caller owns key-type discipline (the builder
    * above enforces integral keys). */
  def bloomPrunedJoinWith(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val spark = fact.sparkSession
    val keyAsLong = col(factKey).cast("long")
    // Probe with Spark's own BloomFilterMightContain expression — the
    // null-safe, codegen'd predicate InjectRuntimeFilter plans — so the
    // filter stays inside whole-stage codegen instead of paying a boxed
    // Long lambda per fact row. The serialized bitmap rides the plan as
    // a binary literal, the same shape Spark's runtime filter takes
    // after its build-side subquery evaluates. Sessions without
    // graft.plans.GraftExtensions fall back to the UDF form (checked
    // once, driver-side), mirroring Dedup.dotNative.
    val mightContain =
      if (spark.catalog.functionExists("graft_bloom_probe")) {
        val os = new java.io.ByteArrayOutputStream()
        bloom.writeTo(os)
        call_function("graft_bloom_probe", lit(os.toByteArray), keyAsLong)
      } else {
        val bc = spark.sparkContext.broadcast(bloom)
        udf((k: Long) => bc.value.mightContainLong(k)).apply(keyAsLong)
      }
    fact
      .filter(col(factKey).isNotNull && mightContain)
      .join(dim, col(factKey) === col(dimKey))
  }
}
