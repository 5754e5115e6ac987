package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing for the composed export pipeline
  * (q_pipeline_export) — the attribution tool behind BASELINE.md's
  * stage table: each measurement evaluates a cumulative PREFIX of the
  * composition to a noop sink with the session cache cleared in
  * between, so stage cost = prefix(i) − prefix(i−1) and a drift in the
  * total is attributable to one stage instead of re-arguing the whole
  * plan. Usage: `runMain graft.PipelineStageProbe [sfDir] [arms]`
  * where `arms` is a comma list from {batch, incremental, funnel,
  * web} (default: the first three; `web` — the q_pipeline_web crawl
  * capstone's stage attribution — is opt-in) — the 100x geometry
  * probe runs `funnel` (and `incremental`) alone so the batch
  * prefixes don't bill a corpus two decades past their measured rows.
  */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val arms = args.lift(1).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("batch", "incremental", "funnel"))
    // a typo'd arm (e.g. "funel") must fail loudly, not silently
    // probe nothing (`web` is opt-in: it is not in the default set
    // because the 100x geometry probes run the other arms alone)
    val knownArms = Set("batch", "incremental", "funnel", "web")
    require(arms.subsetOf(knownArms),
      s"unknown arm(s) ${arms.diff(knownArms).mkString(",")} — " +
        s"choose from ${knownArms.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.read(spark, sfDir, "documents")
    def curated = graft.ext.Curation.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 60.0)
    def mixed = {
      val withSrc = curated.filter(col("split") === "train")
        .select(col("doc_id"), col("n_tokens"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.ext.Curation.mixtureByTokens(withSrc, "doc_id", "source",
        "n_tokens",
        weights = Map("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0,
          "src3" -> 1.0),
        totalTokens = 1500)
    }
    def corpus = mixed.select(col("doc_id"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def enc = {
      val c = corpus
      graft.ext.Bpe.bpeEncode(c, "doc_id", "text",
        graft.ext.Bpe.bpeTrain(c, "text", numMerges = 8))
    }
    def packed = graft.ext.Packing.packConcat(
      enc.select(col("doc_id"), col("n_bpe_tokens")),
      "doc_id", "n_bpe_tokens", budget = 512L, shards = 4)
    def full = {
      val bins = packed.groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .withColumnRenamed("shard", "pack_shard")
      graft.ext.Sampling.exportShards(bins,
          concat_ws(":", col("pack_shard"), col("bin")), numShards = 4)
        .select(col("shard"), col("shard_pos"), col("pack_shard"),
          col("bin"), col("n_docs"), col("bin_tokens"),
          col("first_doc"), col("last_doc"))
        .orderBy(col("shard"), col("shard_pos"))
    }
    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "curate" -> (() => curated),
      "mixture" -> (() => mixed),
      "corpus_join" -> (() => corpus),
      "bpe_train_encode" -> (() => enc),
      "pack" -> (() => packed),
      "bins_export" -> (() => full))
    if (arms("batch")) {
      // one untimed full pass absorbs session costs (codegen, footers)
      full.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val times = prefixes.map { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> sec
      }
      val body = times.map { case (n, s) => f""""$n":$s%.2f""" }.mkString(",")
      val deltas = times.zip(("start", 0.0) +: times.init)
        .map { case ((n, s), (_, p)) => (n, math.max(s - p, 0.0)) }
      val dbody = deltas.map { case (n, s) => f""""$n":$s%.2f""" }.mkString(",")
      println(s"""{"metric":"pipeline_stages","sf":"$sfDir","cumulative":{$body},"stage_delta":{$dbody}}""")
    }

    // INCREMENTAL arm (q_pipeline_incremental, the suite's heaviest
    // line): the AvailableNow call blocks through staging + both ingest
    // ticks (per-tick stage ms land in Streaming.tickStages via the
    // instrumented foreachBatch), while the returned mixPackExport TAIL
    // is lazy — so ingest and tail time cleanly apart, and the bar the
    // round report checks is tail <= the batch composition's own tail
    // (bpe_train_encode + pack + bins_export above) + eps, ticks flat
    // per the sig-ledger probe.
    // WEB capstone stage attribution (r15): cumulative prefixes of
    // q_pipeline_web — url canonicalization, keeper-pruned render +
    // block extraction, paragraph dedup + reassembly, the full
    // assemble/curate/export tail — same prefix-delta method as the
    // batch arm, so a 10x run names which crawl stage grows.
    if (arms("web")) {
      def urls = docs.select(col("doc_id"),
        graft.ext.Urls.urlCanonical(
          graft.ext.Urls.demoUrl(col("doc_id"), col("source")))
          .as("url_canon"))
      def keepers = urls.filter(col("url_canon").isNotNull)
        .groupBy(col("url_canon")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      def blocks = graft.ext.TextAnalysis.htmlBlocksLocal(
          graft.ext.TextAnalysis.htmlSyntheticPage(
            docs.join(keepers, "doc_id"), "doc_id", "text"),
          "doc_id", "page")
        .filter(col("kept"))
        .select(col("doc_id"), col("block_idx"), col("block_text"))
      def webFull = graft.ext.Curation.webAssembleExport(urls, blocks,
        docs.select(col("doc_id"), col("source")), "doc_id")
      val prefixesW: Seq[(String, () => DataFrame)] = Seq(
        "url_canon" -> (() => urls),
        "url_keepers" -> (() => keepers),
        "render_blocks" -> (() => blocks),
        "assemble_export" -> (() => webFull))
      webFull.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val timesW = prefixesW.map { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        name -> sec
      }
      val bodyW = timesW.map { case (n, t) => f""""$n":$t%.2f""" }
        .mkString(",")
      val deltasW = timesW.zip(("start", 0.0) +: timesW.init)
        .map { case ((n, t), (_, p)) => (n, math.max(t - p, 0.0)) }
      val dbodyW = deltasW.map { case (n, t) => f""""$n":$t%.2f""" }
        .mkString(",")
      println(s"""{"metric":"web_pipeline_stages","sf":"$sfDir","cumulative":{$bodyW},"stage_delta":{$dbodyW}}""")
    }

    if (arms("incremental")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val tmp = java.nio.file.Files.createTempDirectory("graft_pincprobe_")
      try {
        val qn = "graft_pinc_probe"
        // SPARK_GRAFT_PROBE_GEO=chunks|tables|auto picks the ingest's
        // probe geometry (default chunks, the artifact-continuity
        // arm) — the 100x probe runs tables/auto: the chunk arm's
        // candidate term there is the already-measured superlinear
        // stage and would shuffle ~7B rows for no new information
        val geo = sys.env.getOrElse("SPARK_GRAFT_PROBE_GEO", "chunks") match {
          case "tables" => graft.ext.Dedup.TableGeometry(9, 7, 2)
          case "auto" => graft.ext.Dedup.AutoGeometry()
          case _ => graft.ext.Dedup.ChunkGeometry()
        }
        val t0 = System.nanoTime()
        val inc = graft.streaming.Streaming
          .pipelineIncrementalAvailableNow(spark, sfDir, tmp.toString, qn,
            geometry = geo)
        val ingestSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        inc.write.format("noop").mode("overwrite").save()
        val tailSec = (System.nanoTime() - t1) / 1e9
        val ticks = Option(graft.streaming.Streaming.tickStages.get(qn))
          .map(_.toArray(Array.empty[(Long, Seq[(String, Long)])]))
          .getOrElse(Array.empty)
          .sortBy(_._1)
          .map { case (b, st) =>
            s""""tick_$b":{${st.map { case (n, m) =>
              s""""$n":$m""" }.mkString(",")}}""" }
          .mkString(",")
        println(f"""{"metric":"pipeline_incremental_stages","sf":"$sfDir","ingest_sec":$ingestSec%.2f,"tail_sec":$tailSec%.2f,"tick_stage_ms":{$ticks}}""")
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(tmp.toFile)
    }

    // FUNNEL arm under both probe geometries: the streaming filter
    // funnel's per-tick stage lines now carry cand_rows/pair_rows, so
    // one run per geometry measures the candidate constant the
    // (chunks vs Manku tables) knob sets ON THE STREAMING PATH — the
    // SCALING.md per-tick candidate row. Chunk 8x8 is the artifact-
    // continuity default; tables 9x7x2 is the widest-key construction
    // admitting the funnel's Hamming <= 7 contract.
    def tickJson(qn: String): String =
      Option(graft.streaming.Streaming.tickStages.get(qn))
        .map(_.toArray(Array.empty[(Long, Seq[(String, Long)])]))
        .getOrElse(Array.empty)
        .sortBy(_._1)
        .map { case (b, st) =>
          s""""tick_$b":{${st.map { case (n, m) =>
            s""""$n":$m""" }.mkString(",")}}""" }
        .mkString(",")
    // optional 3rd arg: comma subset of geometry arms — the 100x run
    // times tables/auto only (the chunk arm's candidate term at 250k
    // docs/tick is the measured superlinear stage; re-paying it buys
    // no new information and a ~1.7B-row shuffle)
    val geoNames = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val geos = Seq(
      "chunks_8x8" -> graft.ext.Dedup.ChunkGeometry(),
      "tables_9x7x2" -> graft.ext.Dedup.TableGeometry(9, 7, 2),
      // the next key-width rung at the same Hamming<=7 pigeonhole
      // (maxHamming <= blocks - keyBlocks; 10x6 uses the full 60 sig
      // bits): C(10,3)=120 tables of 18-bit keys — collision constant
      // 120/2^18 ~ 4.6e-4 vs 36/2^14 ~ 2.2e-3, the documented fix
      // path once the quadratic term dominates the 36-table probe
      // (measured at 100x: 466M candidates, the tick's own
      // superlinear stage)
      "tables_10x6x3" -> graft.ext.Dedup.TableGeometry(10, 6, 3),
      // the r15 POLICY arm: each tick picks its own geometry from the
      // measured cost model; the pick lands on the tick stage line as
      // `geo_auto-><arm>` — at sf0.1 (2.5k docs/tick) Auto must pick
      // chunks, at the 10x corpus (25k docs/tick) tables, matching the
      // r14 measured crossover
      "auto" -> graft.ext.Dedup.AutoGeometry())
      .filter { case (n, _) => geoNames.forall(_.contains(n)) }
    val funnelBody = if (!arms("funnel")) "" else geos.map { case (gname, geo) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val ftmp = java.nio.file.Files.createTempDirectory("graft_funprobe_")
      try {
        val qn = s"graft_funnel_probe_$gname"
        val t0 = System.nanoTime()
        graft.streaming.Streaming.funnelStreamAvailableNow(spark, sfDir,
            ftmp.toString, qn, geometry = geo)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        f""""$gname":{"sec":$sec%.2f,"tick_stage_ms":{${tickJson(qn)}}}"""
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(ftmp.toFile)
    }.mkString(",")
    if (arms("funnel"))
      println(s"""{"metric":"funnel_stages","sf":"$sfDir",$funnelBody}""")
    spark.stop()
  }
}
