package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — grouping documents into fixed-token-budget
  * training bins, the step that turns a curated corpus into
  * fixed-length pretraining sequences (the "concat-and-chunk" stage of
  * GPT-style data pipelines, document-intact variant: a document is
  * never split across bins; a bin absorbs whole documents until the
  * budget boundary passes).
  *
  * Deterministic by construction: shard = id mod `shards`, documents
  * pack in id order within their shard, and a document's bin is the
  * bin of its STARTING token offset (`floor(prefix_sum_before / budget)`),
  * so the same corpus always packs identically regardless of input
  * partitioning — reproducible training batches, and an exact SQL
  * oracle (the driver's DuckDB gate runs the same windowed prefix sum).
  *
  * Scale design (100 TB): packing is shard-LOCAL — one hash shuffle on
  * the shard key, then an in-partition sort + running sum per shard.
  * There is no global ordered window (a single unpartitioned window
  * would funnel the corpus through one task at any scale); shard count
  * scales with the cluster, and real pipelines pack per output shard
  * anyway. Next-fit-by-offset wastes at most one document's tokens of
  * overflow per boundary (bins where a long document straddles run
  * over budget rather than splitting the document), which is the
  * standard trade against a bin-searching packer that cannot run as a
  * single distributed pass. */
object Packing {

  /** Per-document bin assignment: `(idCol, tokenCol, extraKeys…, shard,
    * bin)`.
    *
    * @param idCol     non-negative integral id — ordering AND sharding key
    * @param tokenCol  token count per document
    * @param budget    tokens per training sequence (e.g. 2048)
    * @param shards    parallel packing lanes; bins are scoped per shard
    * @param extraKeys additional packing scopes ABOVE the shard — e.g.
    *                  `Seq("split")` packs train/val/test corpora
    *                  independently so no bin ever mixes splits; each
    *                  (extraKeys…, shard) lane packs and parallelizes
    *                  on its own */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window
      .partitionBy((extraKeys.map(col) :+ col("shard")): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol) +: col(tokenCol) +: extraKeys.map(col) :+
        pmod(col(idCol), lit(shards)).cast("long").as("shard"): _*)
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      // start-offset bin: exact while shard token totals stay below
      // 2^53 (double mantissa) — ~9e15 tokens PER SHARD, far above any
      // real shard; grow `shards` long before that bound binds
      .withColumn("bin",
        floor((col("_cum") - col(tokenCol)) / lit(budget.toDouble))
          .cast("long"))
      .drop("_cum")
  }

  /** Boundary-FREE packing — the GPT-style concat-and-chunk mode where
    * the shard's token stream is cut every `budget` tokens and a
    * document MAY span bins (vs [[packSequences]]' document-intact
    * next-fit). Every bin is exactly `budget` tokens except each
    * shard's tail, so there is zero padding waste; the cost is split
    * documents (callers insert EOD separators downstream).
    *
    * Output: one row per (document, bin it overlaps) — `(idCol, shard,
    * bin, tok_in_bin)`, where `tok_in_bin` is how many of the
    * document's tokens land in that bin; a document occupying bins
    * b0..b1 emits b1−b0+1 rows. Same determinism and scale contract as
    * [[packSequences]]: shard-local prefix sums, one shuffle, layout
    * independent of input partitioning, and the explode fan-out per
    * document is `1 + tokens/budget` — bounded by the document's own
    * length, never the corpus. */
  def packConcat(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(tokenCol),
        pmod(col(idCol), lit(shards)).cast("long").as("shard"))
      .filter(col(tokenCol) > 0)
      .withColumn("_end", sum(col(tokenCol)).over(w))
      .withColumn("_start", col("_end") - col(tokenCol))
      // integral long division — exact at any offset, no double rounding
      .withColumn("_bin0", expr(s"_start div ${budget}L"))
      .withColumn("_binLast", expr(s"(_end - 1) div ${budget}L"))
      .select(col(idCol), col("shard"),
        explode(sequence(col("_bin0"), col("_binLast"))).as("bin"),
        col("_start"), col("_end"))
      .withColumn("tok_in_bin",
        least(col("_end"), (col("bin") + 1) * budget) -
          greatest(col("_start"), col("bin") * budget))
      .select(col(idCol), col("shard"), col("bin"), col("tok_in_bin"))
  }
}
