package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan contracts: the physical-plan properties the engine's scale
  * story depends on (SCALING.md). These fail if a refactor silently
  * loses predicate pushdown, a broadcast, the top-k plan shape, or
  * map-side partial aggregation. */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate predicate reaches the parquet scan, columns pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_comment"), "projection must prune unused columns")
  }

  test("revenue: dimension join is a broadcast hash join") {
    assert(plan("q_revenue_by_nation").contains("BroadcastHashJoin"))
  }

  test("recent events: ORDER BY + LIMIT plans distributed top-k") {
    assert(plan("q_recent_events").contains("TakeOrderedAndProject"))
  }

  test("knn: query side broadcasts; rank pushes a window group limit") {
    val p = plan("q_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune inside the window, not after it")
  }

  test("habit daily: hash aggregation splits partial/final") {
    val p = plan("q_habit_daily")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected map-side partial + final aggregate")
  }

  test("knn vec_id<8 query filter reaches the embeddings scan") {
    assert(plan("q_knn_bruteforce").contains("LessThan(vec_id,8)"))
  }

  test("knn brute force: partition-local top-k precedes the ranking window") {
    val p = plan("q_knn_bruteforce")
    // the pre-window cut is a typed mapPartitions over a local sort —
    // no Exchange between the scoring join and the local top-k
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must be in the plan")
    val mapIdx = p.indexOf("MapPartitions")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && winIdx < mapIdx,
      "ranking window must consume the pruned (mapPartitions) relation")
  }

  test("native as-of join: custom exec node, no window, no product join") {
    for (q <- Seq("q_asof_native", "q_asof_native_merge", "q_asof_multi")) {
      val p = plan(q)
      assert(p.contains("AsOfJoin"), // TreeNode.nodeName strips the Exec suffix
        s"$q: the injected strategy must plan the custom operator")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q: as-of must never degrade to a product join")
      // merge form: each side shuffles once in its OWN schema; broadcast
      // form: the fact side is untouched. Neither windows (contrast: the
      // composed form unions both sides into one null-padded schema and
      // windows over it).
      val body = p.substring(p.indexOf("AsOfJoin"))
      assert(!body.contains("Window"),
        s"$q: the native operator replaces the window carry-forward")
    }
    // at sf0.001 the aggregated purchase side is tiny: stats must pick
    // the broadcast form (fact side unshuffled, unsorted), while the
    // pinned merge form keeps the co-partitioned exec under the gate
    assert(plan("q_asof_native").contains("AsOfJoinBroadcast"),
      "stats-based choice must broadcast a small right side")
    val merge = plan("q_asof_native_merge")
    assert(merge.contains("AsOfJoin") && !merge.contains("AsOfJoinBroadcast"),
      "broadcast=Some(false) must pin the co-partitioned merge")
  }

  test("skew-aware as-of: hot keys broadcast, cold keys merge, no skewed " +
      "shuffle") {
    val p = plan("q_asof_skew")
    // hot split: broadcast exec (fact rows unshuffled); cold split: the
    // co-partitioned merge; glued by a union — never a product join
    assert(p.contains("AsOfJoinBroadcast"),
      "hot keys must take the broadcast (shuffle-free) form")
    assert(p.replace("AsOfJoinBroadcast", "").contains("AsOfJoin"),
      "cold keys must take the co-partitioned merge form")
    assert(p.contains("Union"), "split-union shape expected")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "skew split must not degrade to a product join")
  }

  test("sequence packing: prefix-sum window is shard-local, never a " +
      "global ordered window") {
    // the scale contract: an empty window partition spec would funnel
    // the whole corpus through ONE task at 100 TB
    val pack = plan("q_pack_sequences")
    assert("windowspecdefinition\\([^)]*shard#".r.findFirstIn(pack).isDefined,
      s"packing window must partition by shard:\n$pack")
    val cur = plan("q_pack_curated")
    assert("windowspecdefinition\\([^)]*shard#".r.findFirstIn(cur).isDefined,
      s"split-scoped packing window must partition by (split, shard):\n$cur")
  }

  test("variant shredded: paths read as a struct, k-predicate pushed " +
      "into the parquet scan") {
    val p = plan("q_variant_shredded")
    // PushVariantIntoScan must rewrite the three variant_get paths into
    // a plain struct read over the shredded typed subcolumns...
    assert(p.contains("ReadSchema: struct<payload:struct<"),
      s"variant scan must be rewritten to a struct read:\n$p")
    // ...and carry the $.k >= 50 predicate into the scan itself —
    // pushdown INTO a semi-structured column, the shredding payoff
    assert(p.contains("GreaterThanOrEqual(payload."),
      s"the \\$$.k predicate must land in PushedFilters:\n$p")
  }

  test("native as-of join: left-column filter pushes through to the scan") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsAsHabits(spark, dir)
    val clicks = ev.filter(col("habit") === "click")
      .select(col("event_id"), col("user_email"), col("ts"))
    val purchases = ev.filter(col("habit") === "purchase")
      .groupBy(col("user_email"), col("ts"))
      .agg(max(col("value")).as("pvalue"))
    val filtered = graft.ext.AsOf.asofJoinNative(clicks, purchases,
        "user_email", "ts", Seq("pvalue"))
      .filter(col("event_id") < 100 && col("asof_pvalue").isNotNull)
    val p = filtered.queryExecution.executedPlan.toString
    // the custom optimizer rule splits the conjunction: the left-only
    // predicate sinks into the click-side parquet scan, the asof_*
    // predicate stays above the operator
    assert(p.contains("LessThan(event_id,100)"),
      "left-side conjunct must reach PushedFilters on the scan")
    assert(p.contains("isnotnull(asof_pvalue"),
      "asof-column conjunct must remain above the join")
    // and the results agree with filtering the composed form
    val composed = graft.ext.AsOf.asofJoin(clicks, purchases,
        "user_email", "ts", Seq("pvalue"))
      .filter(col("event_id") < 100 && col("asof_pvalue").isNotNull)
    assert(filtered.collect().map(_.toSeq).toSet ==
      composed.collect().map(_.toSeq).toSet)
  }

  test("bucketed join: co-located scans, no shuffle into the join") {
    val p = plan("q_bucket_join")
    assert(p.contains("SortMergeJoin"))
    assert(p.contains("SelectedBucketsCount"),
      "both scans must read the bucketed layout")
    // the only hash exchange is the post-join groupBy re-key; the join
    // consumes the on-disk bucket co-location directly
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "bucket co-location must eliminate both join-side shuffles")
  }

  test("embedding LSH dedup: equi-join on (band, bucket), no cartesian") {
    val p = plan("q_dedup_embedding_lsh")
    assert(!p.contains("CartesianProduct"),
      "candidate generation must be a bucket equi-join")
    assert(p.contains("graft_dot"),
      "verification must use the native codegen'd dot product")
    assert(p.contains("InMemoryTableScan"),
      "bucketed relation must be persisted across the self-join")
  }

  test("semantic dedup: within-cell pairs meet on a cluster equi-join, " +
      "never a cartesian; cosine rides the native dot") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be the cluster-keyed equi-join:\n$p")
    assert(p.contains("graft_dot"),
      "cosine verification must use the native codegen'd dot product")
  }

  test("salted top-k: local (key, salt) window prunes before the global one") {
    val p = plan("q_salted_topk")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "both the local and the global rank filters must push group limits")
  }

  test("balanced packing (salted): local rank partitions on " +
      "(band, salt), offsets broadcast — no band-global doc window") {
    val p = plan("q_pack_balanced_salted")
    // the doc-sized rank window must carry the token-range salt in its
    // partition key; the count-offset lift joins back as a broadcast
    // (bands x buckets rows, never doc-sized)
    assert(p.contains("__graft_salt"),
      s"expected salt-partitioned local rank window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the count-offset lift to broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
    // and the plain path stays free of the salting machinery
    assert(!plan("q_pack_balanced").contains("__graft_salt"),
      "plain path must not pay the two-level lift")
  }

  test("QueryMetrics: shuffle bytes and row counts are observable") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 1000).map(i => (s"k${i % 10}", i)).toDF("k", "v")
      .groupBy(col("k")).agg(org.apache.spark.sql.functions.sum(col("v")))
    val p = graft.plans.QueryMetrics.profile(df)
    assert(p.shuffleBytesWritten > 0, "groupBy must report shuffle writes")
    assert(p.perNode.exists { case (k, v) =>
      k.startsWith("HashAggregate") && k.contains("number of output rows") &&
        v >= 10
    }, s"expected aggregate output rows in ${p.perNode.keys}")
    // outputRows is the RESULT cardinality (topmost counted node: the
    // final aggregate's 10 groups), not the 1000-row scan the old
    // max-across-the-tree read reported
    assert(p.outputRows == 10, s"result cardinality, got ${p.outputRows}")
    // a narrow projection shuffles nothing
    val narrow = graft.plans.QueryMetrics.profile(
      (1 to 100).toDF("v").select(col("v") * 2))
    assert(narrow.shuffleBytesWritten == 0)
  }

  test("scd2: both window passes reuse one shuffle on the entity keys") {
    val p = plan("q_scd2")
    // change detection + interval close partition the same way; Catalyst
    // must not re-exchange between them
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // one for the groupBy, one for the windows
      s"expected the two window passes to share one shuffle, saw $exchanges:\n$p")
  }

  test("substring contamination: anchor + text joins are equi-joins, " +
      "never a cartesian") {
    val p = plan("q_substring_contamination")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"tiled k-gram anchoring must keep every join equi-keyed:\n$p")
  }

  test("substring contamination: anchor verification runs the native " +
      "codegen'd graft_extend walk, not the substr/reverse/HOF chain") {
    val p = plan("q_substring_contamination")
    assert(p.contains("graft_extend"),
      s"extension verify must use the native extend kernel:\n$p")
    assert(p.contains("graft_khashes") && !p.contains("xxhash64"),
      s"window index must be the one-pass rolling hash, not per-offset " +
        s"substr+xxhash:\n$p")
    assert(!p.contains("zip_with") && !p.contains("reverse("),
      s"the copy-heavy fallback must not appear when the extension is " +
        s"registered:\n$p")
  }

  test("temporal join: keyed hash join with residual interval bounds — " +
      "never a product join") {
    val p = plan("q_temporal_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "interval containment must ride the key equi-join as a residual")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "the history side must join on the entity keys")
  }

  test("dsir: the selection cut is a distributed top-k and the ratio " +
      "relation joins, not cross-products") {
    val p = plan("q_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      "k-cut must plan top-k, never a global sort")
    assert(!p.contains("CartesianProduct"),
      "ratio relation must equi-join the per-doc tf")
  }

  test("quantile rollup: merge + windows run on sketch rows with " +
      "map-side partial histograms") {
    val p = plan("q_quantile_rollup")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "daily histogram must partial-aggregate map-side")
    assert(!p.contains("CartesianProduct"),
      "the q_ppm explode is a literal array, never a join")
  }

  test("mixture budget: one hash shuffle feeds both the rank and the " +
      "running sum") {
    val p = plan("q_mixture_budget")
    // the per-source window (row_number + cumulative sum share one
    // partition-order spec) is the ONLY hash exchange; the trailing
    // range exchange is the query's own ORDER BY
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected the single per-source window shuffle, saw $exchanges:\n$p")
  }

  test("mixture salted: local windows partition by (source, salt), " +
      "offsets broadcast — no single-partition-per-source sort of the " +
      "docs") {
    val p = plan("q_mixture_salted")
    // the doc-sized window must carry the salt in its partition key;
    // the bucket-offset relation joins back as a broadcast (it is
    // saltBuckets rows per source, never doc-sized)
    assert(p.contains("__graft_salt"),
      s"expected salt-partitioned local windows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the bucket-offset lift to broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
    // and the plain path stays free of the salting machinery
    assert(!plan("q_mixture_budget").contains("__graft_salt"),
      "saltBuckets=1 must collapse to the plain single-window path")
  }

  test("self repeats and redaction: anchor and island stages stay " +
      "equi-joined, never cartesian") {
    Seq("q_substring_selfdup", "q_redact_contamination").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay equi-keyed:\n$p")
    }
  }

  test("pipeline export: the composed stages never serialize the " +
      "corpus to one partition and never go cartesian") {
    val p = plan("q_pipeline_export")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"composition must stay equi-keyed:\n$p")
    // every window/aggregate stage keys on (source | shard | bucket) —
    // a SinglePartition exchange would mean some stage funnels the
    // whole corpus through one task, the classic composition regression
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may serialize to a single partition:\n$p")
  }

  test("web pipeline: the composed crawl stages never serialize the " +
      "corpus to one partition and never go cartesian") {
    val p = plan("q_pipeline_web")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"composition must stay equi-keyed:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may serialize to a single partition:\n$p")
  }

  test("negative samples: the vocabulary prefix sum is salted — " +
      "every window partitions on the salt bucket") {
    val p = plan("q_negative_samples")
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(p).toList
    assert(specs.nonEmpty && specs.forall(_.contains("__salt")),
      s"every window must partition on __salt:\n$p")
    // the one remaining SinglePartition exchange is the scalar
    // total-mass aggregate over the 16-row BUCKET relation — never
    // the vocabulary; a second one would mean the prefix sum funneled
    val sp = "Exchange SinglePartition".r.findAllIn(p).size
    assert(sp <= 1,
      s"only the bucket-sized scalar agg may single-partition ($sp):\n$p")
  }

  test("chi2 terms: rank comes from the top-k cut + tiny self-join — " +
      "no window, no single-partition exchange on the vocabulary") {
    val p = plan("q_chi2_terms")
    assert(!p.contains("Window"),
      s"ranking must not run a window over the vocabulary:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may serialize to a single partition:\n$p")
  }

  test("export shards: exactly the writer's own shuffle — one hash " +
      "exchange on the shard id") {
    val p = plan("q_export_shards")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected one shard-id shuffle for the dense rank, saw $exchanges:\n$p")
  }

  test("bpe encode: vocabulary chain joins back equi-keyed with " +
      "map-side partial aggregation, never a cartesian") {
    val p = plan("q_bpe_encode")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"word-token join must stay equi-keyed:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-document sums must split partial/final:\n$p")
  }

  test("fuzzy dedup: blocked pairing is an equi-join, never a cartesian") {
    val p = plan("q_fuzzy_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"length-band blocking must keep the join equi-keyed:\n$p")
  }

  test("bloom join: codegen'd probe filters the fact side BEFORE the join") {
    val p = plan("q_bloom_join")
    val joinIdx = p.indexOf("Join")
    // the bloom probe is Spark's native BloomFilterMightContain inside
    // a Filter on the fact branch, below the join in the tree (children
    // print after parents)
    val filterIdx = p.indexOf("might_contain", joinIdx.max(0))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom pre-filter must sit under the join on the fact branch:\n$p")
    // and it must be the codegen expression, not a boxed scalar UDF
    assert(!p.contains("UDF(") && !p.contains("BatchEvalPython"),
      s"bloom probe must not fall back to a scalar UDF:\n$p")
  }

  test("cms freq: probe is the native codegen expression, not a UDF") {
    val df = SparkEntry.queries("q_cms_freq")(spark, dir)
    // the probe rides inside an aggregate's result expressions, which
    // the plan STRING doesn't print — walk the analyzed tree instead
    val probes = df.queryExecution.analyzed.collect {
      case n if n.expressions.exists(
        _.exists(_.isInstanceOf[graft.plans.CmsEstimate])) => n
    }
    assert(probes.nonEmpty,
      "CMS probe must plan as the native graft_cms_estimate expression")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("UDF(") && !p.contains("BatchEvalPython"),
      s"CMS probe must not fall back to a scalar UDF:\n$p")
  }

  test("heavy hitters: candidate semi-join broadcasts, never shuffles tokens") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidates must broadcast into a semi-join:\n$p")
  }

  test("join-view maintenance: delta joins are broadcast equi-joins, " +
      "merge is dims-keyed, no cartesian") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.load.IncrementalView
    val zA = IncrementalView.zRelation(Seq(
      (1L, "x", "update", Some(2.0), Some(4.0)))
      .toDF("k", "g", "op", "v_old", "v_new"))
    val zB = IncrementalView.zRelation(Seq(
      (2L, "update", Some(2.0), Some(3.0))).toDF("k", "op", "w_old", "w_new"))
    val (b1, a0) = (Seq((2L, 3.0)).toDF("k", "w"),
      Seq((1L, "x", 2.0)).toDF("k", "g", "v"))
    val view = Seq(("x", 1L, 1L)).toDF("g", "n", "sum_e6")
    val p = IncrementalView.applyJoinDelta(view, zA, b1, a0, zB,
        Seq("k"), Seq("g"), round(col("v") * col("w") * 1e6).cast("long"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"delta rule must stay equi-join shaped:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"change-feed-sized sides must broadcast into both delta joins:\n$p")
  }

  test("phrase search: one aggregate, no join, term shed before the shuffle") {
    val p = plan("q_phrase_search")
    assert(!p.contains("Join"),
      s"phrase conjunction must not plan a self-join:\n$p")
    assert("Exchange".r.findAllIn(p).count(_ => true) <= 2,
      s"one doc-keyed aggregate (+ final sort) only:\n$p")
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(p).nonEmpty)
    // the isin() term shed must run in the narrow pre-shuffle stage
    assert(p.contains("__graft_term"),
      s"expected the shed filter on the exploded term column:\n$p")
  }

  test("hamming pairs: pigeonhole chunk equi-join, never a cartesian; " +
      "aHash kernel is shuffle-free") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val sig = Seq((1L, 7L), (2L, 7L), (3L, -1L)).toDF("id", "h")
    val p = graft.ext.Dedup.hammingDupPairs(sig, "id", "h")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay a chunk equi-join:\n$p")
    val media = Seq(graft.ext.MediaRecord(1L, "image/ppm",
      ("P6\n8 8\n255\n" + "x" * 192).getBytes("US-ASCII"))).toDS()
    val hp = graft.ext.Multimodal.ppmAHash(media)
      .queryExecution.executedPlan.toString
    assert(!hp.contains("Exchange"),
      s"perceptual hash must be a narrow partition-local kernel:\n$hp")
  }

  test("funnel: stage chain is equi-joins + aggregates, no windows, no cartesian") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"funnel must chain joins/aggs on the user key:\n$p")
  }

  test("hll rollup: sketch aggregation splits partial/final (map-side combine)") {
    val p = plan("q_hll_rollup")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"HLL sketches must partially aggregate before the shuffle:\n$p")
  }

  test("profile: exact multi-column NDV is ONE Expand scan, not k scans") {
    val p = plan("q_profile")
    assert("Expand".r.findAllIn(p).size >= 1, "expected Expand-based NDV")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profile must read the table exactly once:\n$p")
  }

  test("quantized knn: broadcast query codes + local top-k before window") {
    val p = plan("q_knn_quantized")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query codes must broadcast (map-side scoring)")
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must bound the ranking shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("pq knn: codebook recon is literal expression work over broadcast " +
      "query codes; local top-k bounds the window") {
    val p = plan("q_knn_pq")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query codes must broadcast (map-side ADC scoring)")
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must bound the ranking shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("ivfpq knn: probing is an equi-join on the cell id, no cartesian") {
    val p = plan("q_knn_ivfpq")
    assert(p.contains("BroadcastHashJoin"),
      "probe join must hash on the cell id against broadcast queries")
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must bound the ranking shuffle")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "unprobed cells must never pair with a query")
  }

  test("segment dedup: partial-aggregating frequency count, no cartesian") {
    val p = plan("q_dedup_lines")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"segment frequency must combine map-side before the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("cdc apply: winner window rides the feed, join is the only " +
      "sink-wide exchange") {
    val p = plan("q_cdc_apply")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"keyed full-outer merge expected:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("weighted sampling: one ranking window, group limit pushed") {
    val p = plan("q_weighted_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must prune inside the window:\n$p")
  }

  test("dsv2 pushdown: pruned scan plans exactly one day block") {
    val df = SparkEntry.queries("q_dsv2_pushdown")(spark, dir)
    df.collect() // finalize the adaptive plan
    // descend through AQE wrappers AND materialized query stages (a
    // stage's plan is not a `children` edge — same traversal as
    // QueryMetrics)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.inputRDD.getNumPartitions == 1,
      "pushed Report-Date equality must prune to a single partition")
    // 3 projected + Report Date (still referenced by the residual
    // isnotnull filter) — Timestamp/Meditation/Notes are pruned
    assert(scans.head.scan.readSchema().fieldNames.length == 4,
      "column pruning must reach the reader")
  }

  test("naive bayes: class fan-out broadcasts, model join is equi-keyed, " +
      "no cartesian") {
    val p = plan("q_nb_classifier")
    // the ×C class expansion and the C-row prior join ride broadcasts;
    // the (term, class) model join must be an equi-join — a
    // CartesianProduct would mean the corpus crossed the vocabulary
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"class model must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      "scoring must never cross corpus × vocabulary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "token counting must split partial/final (map-side combine)")
  }

  test("ppjoin: prefix-token equi-join, per-doc window, no product join") {
    val p = plan("q_dedup_ppjoin")
    // the candidate join and the verification join are both equi-joins;
    // a product join would mean the prefix filter degenerated
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"ppjoin must never plan a product join:\n$p")
    // prefix positions come from a window PARTITIONED BY doc id — a
    // single-partition exchange would mean a global ordering snuck in
    assert(!p.contains("Exchange SinglePartition"),
      "ppjoin must not funnel through one partition")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "census/verify aggregates must split partial/final")
  }

  test("winnow overlap: df-gated inverted self-join, no product join") {
    val p = plan("q_winnow_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fingerprint self-join must stay an equi-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      "winnowing is per-doc local + hash aggregates — no global funnel")
    assert(!p.contains("Window"),
      "the window-min is a groupBy over exploded starts, not a Window op")
  }

  test("knn classify: inherits the broadcast-codes/local-top-k shape") {
    val p = plan("q_knn_classify")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query codes must broadcast against the corpus scan")
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must precede the ranking window")
    assert(!p.contains("CartesianProduct"))
  }

  test("quality logreg: scoring is a per-row projection under literal " +
      "weights — no join, window, or aggregate") {
    // the fit loop runs driver-side before this plan materializes; the
    // returned scoring plan must be scan → project (+ the final
    // orderBy's one range exchange), nothing relational
    val p = plan("q_quality_logreg")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    assert(!p.contains("Window"), "scoring must not window")
    assert(!p.contains("HashAggregate"), "scoring must not aggregate")
    assert("Exchange".r.findAllIn(p).size == 1,
      "only the orderBy range exchange may shuffle")
  }

  test("psi drift: histogram sides split partial/final, bin joins " +
      "broadcast, no sort-merge or cartesian") {
    val p = plan("q_drift_psi")
    assert(p.contains("BroadcastHashJoin"),
      "bucket-count joins must broadcast — they carry `buckets` rows")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "each histogram side must map-side combine (partial+final)")
  }

  test("probe-gated export: the survivor join is keyed, never a " +
      "cartesian; one shard shuffle feeds the ranking") {
    val p = plan("q_probe_gated_export")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), "shard_pos must rank inside the shard")
    // doc ⋈ survivors on doc_id: equi-join (broadcast or hash)
    assert(p.contains("Join"), s"survivor filter must join back:\n$p")
  }

  test("multi-epoch export: each epoch ranks inside the SAME shard " +
      "hash — no extra corpus shuffle per epoch") {
    val p = plan("q_export_epochs")
    assert(!p.contains("CartesianProduct"))
    assert("Window".r.findAllIn(p).size >= 2,
      "both epochs' rankings must appear")
    // shard assignment hashes identically for both epochs, so the
    // exchanges partition on the same expression
    assert(p.contains("hashpartitioning"))
  }

  test("local supplier revenue: six-table chain is all equi-joins, " +
      "fixed dims broadcast, no cartesian") {
    val p = plan("q_local_supplier_revenue")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "nation/region must ride broadcasts")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "revenue aggregate must split partial/final")
  }

  test("unigram vocab: census splits partial/final, top-V is a " +
      "TakeOrdered, total rides a 1-row broadcast") {
    val p = plan("q_unigram_vocab")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "substring census must map-side combine")
    assert(p.contains("TakeOrderedAndProject"),
      "top-V must be local heads + driver merge, not a global rank window")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the vocabulary total must broadcast as one row")
    assert(!p.contains("CartesianProduct"))
  }

  test("unigram encode: DP kernel is partition-local, per-doc aggregate " +
      "splits partial/final, no cartesian") {
    val p = plan("q_unigram_encode")
    assert(p.contains("MapPartitions"),
      "the Viterbi DP must run as a narrow typed kernel")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-doc totals must map-side combine")
    assert(!p.contains("CartesianProduct"),
      "corpus must meet word results on an equi-join")
  }

  test("kcenter: the returned selection is driver-resident k rows — " +
      "no corpus computation leaks into the output plan") {
    // each round's work (narrow distance update + TakeOrdered argmax)
    // executes eagerly inside the operator; the handed-back relation
    // must be the k-row local table itself
    val p = plan("q_kcenter")
    assert(p.contains("LocalTableScan"), s"expected a local k-row scan:\n$p")
    assert(!p.contains("parquet"), "output plan must not rescan the corpus")
  }

  test("hard negatives: query codes broadcast, label filter inside the " +
      "join, local top-k precedes the ranking window") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query codes must broadcast against the corpus scan")
    assert(p.contains("MapPartitions"),
      "partition-local top-k kernel must precede the ranking window")
    assert(!p.contains("CartesianProduct"))
  }

  test("skipgram: typed kernel emits pairs, aggregate splits " +
      "partial/final, no join anywhere") {
    val p = plan("q_skipgram")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "pair emission must be the typed kernel, not an HOF chain")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair counts must map-side combine")
    assert(!p.contains("Join"))
  }

  test("negative samples: mass table and total ride broadcasts, " +
      "no cartesian") {
    val p = plan("q_negative_samples")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "interval containment must probe the broadcast cumulative table")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "nothing here may shuffle-join — both lookup sides broadcast")
  }

  test("subsample: one posexplode pass, threshold join equi-keyed, " +
      "per-doc aggregate splits partial/final") {
    val p = plan("q_subsample")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("interleave: one source-keyed ranking window, key mint is " +
      "narrow — no join, no second exchange family") {
    val p = plan("q_interleave")
    assert(!p.contains("Join"), s"interleave must not join:\n$p")
    assert("Window".r.findAllIn(p).size >= 1)
  }

  test("hopping window: bounded fan-out then one partial/final " +
      "aggregate, no cartesian") {
    val p = plan("q_hopping_window")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "window rollup must map-side combine")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the window explode is narrow — no join may appear")
  }

  test("dedup chunks: narrow boundary scan — no join anywhere, partial " +
      "and final aggregates present") {
    val p = plan("q_dedup_chunks")
    assert(!p.contains("Join"), "chunking must stay join-free")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "chunk dedup needs map-side partial + final aggregate")
  }

  test("chi2 terms: label rides conditional counts (no label join); " +
      "totals broadcast") {
    val p = plan("q_chi2_terms")
    assert(!p.contains("SortMergeJoin"),
      "the 1-row totals must broadcast, never shuffle-join")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("consistent shard: ring assignment is a pure expression — " +
      "no join in the plan") {
    assert(!plan("q_consistent_shard").contains("Join"))
  }

  test("ewma: exactly one exchange (the per-key window shuffle)") {
    val p = plan("q_ewma")
    // one hashpartitioning exchange for the window; the final sort is
    // range-partitioned output order, not a second data shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("wordpiece: distinct-word kernel then one broadcast join back " +
      "to the exploded corpus") {
    val p = plan("q_wordpiece")
    assert(p.contains("MapPartitions"),
      "greedy kernel must run as the typed distinct-word pass")
    assert(!p.contains("SortMergeJoin"),
      "word results join back via broadcast under AQE, not a shuffle join")
  }

  test("lang id ngram: one shuffle-free typed pass against the literal " +
      "profile — no join, no window, only the presentation sort's " +
      "exchange (r17 kernel)") {
    val p = plan("q_lang_id_ngram")
    assert(p.contains("MapElements") || p.contains("MapPartitions"),
      "classification must run as the typed per-row kernel")
    assert(!p.contains("Join"),
      "the profile is a closure-captured literal table — no join of " +
        s"any kind:\n$p")
    assert(!p.contains("Window"),
      "the precedence argmax replaced the rank window")
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"only the output sort may exchange:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("lm backoff: n-gram count joins stay equi-joins with partial " +
      "aggregation — no cartesian, no single-partition exchange") {
    val p = plan("q_lm_backoff")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "corpus total is a driver literal, not a scalar cross join")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-doc aggregate must stay hash-partitioned:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "count tables need map-side partial aggregation")
  }

  test("assoc rules: basket self-join and support joins are equi-joins; " +
      "the 1-row basket census broadcasts") {
    val p = plan("q_assoc_rules")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "n_baskets must ride a broadcast back onto the pair relation")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair/item supports need map-side partial aggregation")
  }

  test("pmi: no cartesian beyond the two 1-row census broadcasts, " +
      "top-k is TakeOrdered — no rank window") {
    val p = plan("q_pmi_collocations")
    assert(!p.contains("CartesianProduct"))
    // the 1-row N/B censuses legitimately reduce through a single
    // partition; what must NOT single-partition is the scoring relation
    assert(!p.contains("Window"),
      s"top-k must be TakeOrdered, not a global rank window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "orderBy+limit must plan the distributed top-k")
  }

  test("containment: df gate and inverted-index joins stay equi-joins — " +
      "no cartesian, no nested-loop") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("source cap: rank window partitions by source — no " +
      "single-partition exchange") {
    val p = plan("q_source_cap")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("WindowGroupLimit"),
      "rank<=cap must prune inside the window")
  }

  test("blocklist: with extensions registered the scan is the one-pass " +
      "Aho-Corasick expression — no join, no shuffle before the sort") {
    val p = plan("q_blocklist")
    assert(p.contains("graft_blocklist_count"),
      s"native automaton expression must be in the plan:\n$p")
    assert(!p.contains("Join"), s"native scan must be join-free:\n$p")
    // (WholeStageCodegen spans only render in executed AQE plans; the
    // expression's doGenCode participation is covered by the parity
    // spec actually executing it)
  }

  test("c4 rules: pure per-row gate — no join, no aggregate, the only " +
      "exchange is the final presentation sort") {
    val p = plan("q_c4_rules")
    assert(!p.contains("Join"), "a per-row rule gate must not join")
    assert(!p.contains("HashAggregate"))
    assert("Exchange".r.findAllIn(p).size == 1 &&
      p.contains("rangepartitioning"),
      "one range exchange (the ORDER BY) and nothing else")
  }

  test("span removal: the composed tiled-anchor + excision plan keeps " +
      "the contamination family's no-cartesian contract") {
    val p = plan("q_dedup_span_removal")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("ccnet frozen: the corpus-sized pass is window-free — one Window " +
      "(the sample's) and a broadcast compare join") {
    val p = plan("q_ccnet_frozen")
    assert("Window".r.findAllIn(p).size <= 2,
      s"only the sample's rank window may appear (executed+AQE copy):\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the frozen cutoffs must broadcast to the corpus side:\n$p")
  }

  test("triangles: wedge and closing joins are shuffled equi-joins — " +
      "no cartesian, no nested-loop, partial aggregation present") {
    // q_triangles now runs inside Pinned.scoped (its registration plan
    // is the materialized result's ExistingRDD scan), so the shape pin
    // inspects the OPERATOR's plan over the SHARED pair-graph builder
    // the registration itself calls — the pinned shape cannot drift
    // from the shipped one
    val p = graft.ext.Graph
      .triangleCounts(QueriesDedupSimMm.coOrderPairs(spark, dir),
        "id_a", "id_b")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    // ...and the scoped registration leaves exactly ONE pinned handle
    // behind: the result's own checkpoint, releasable by the caller
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val before = sc.getPersistentRDDs.keySet
    val out = SparkEntry.queries("q_triangles")(spark, dir)
    val after = sc.getPersistentRDDs.keySet -- before
    assert(after.size <= 1,
      s"scoped q_triangles must pin only its result, found ${after.size}")
    graft.ext.Pinned.release(out)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "releasing the returned handle must free the last pin")
  }
}
