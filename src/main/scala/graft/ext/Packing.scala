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

  /** Output columns the packers add; a caller column with one of these
    * names (directly or via `extraKeys`) would either collide with the
    * generated column or silently change the grouping, so it is
    * rejected up front. Internal scratch columns are `__graft_`-
    * prefixed and never escape, so only the real outputs are reserved. */
  private val Reserved =
    Set("shard", "bin", "tok_in_bin", "start_in_bin", "doc_off")

  private def checkNames(idCol: String, tokenCol: String,
      extraKeys: Seq[String]): Unit = {
    val clash = (Seq(idCol, tokenCol) ++ extraKeys).filter(Reserved)
    require(clash.isEmpty,
      s"packing reserves output column names ${Reserved.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
  }

  /** Per-document bin assignment: `(idCol, tokenCol, extraKeys…, shard,
    * bin)`. NULL or non-positive token counts are dropped (a NULL-text
    * document has no tokens to pack, and a NULL would otherwise ride
    * through the prefix sum as a NULL bin).
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
    checkNames(idCol, tokenCol, extraKeys)
    val w = Window
      .partitionBy((extraKeys.map(col) :+ col("shard")): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol) +: col(tokenCol) +: extraKeys.map(col) :+
        pmod(col(idCol), lit(shards)).cast("long").as("shard"): _*)
      .filter(col(tokenCol) > 0)
      .withColumn("__graft_cum", sum(col(tokenCol)).over(w))
      // start-offset bin: exact while shard token totals stay below
      // 2^53 (double mantissa) — ~9e15 tokens PER SHARD, far above any
      // real shard; grow `shards` long before that bound binds
      .withColumn("bin",
        floor((col("__graft_cum") - col(tokenCol)) / lit(budget.toDouble))
          .cast("long"))
      .drop("__graft_cum")
  }

  /** Boundary-FREE packing — the GPT-style concat-and-chunk mode where
    * the shard's token stream is cut every `budget` tokens and a
    * document MAY span bins (vs [[packSequences]]' document-intact
    * next-fit). Every bin is exactly `budget` tokens except each
    * shard's tail, so there is zero padding waste; the cost is split
    * documents (callers insert EOD separators downstream).
    *
    * Output: one row per (document, bin it overlaps) — `(idCol, shard,
    * bin, tok_in_bin, start_in_bin)`, where `tok_in_bin` is how many of
    * the document's tokens land in that bin and `start_in_bin` is the
    * 0-based token offset WITHIN the bin where the document's span
    * begins — the per-bin document-boundary offsets a trainer needs to
    * build attention masks over the packed sequence (a document
    * continuing from the previous bin starts at 0; the bin's first
    * document also starts at 0; later documents start at their
    * predecessor's end). A document occupying bins b0..b1 emits
    * b1−b0+1 rows. Same determinism and scale contract as
    * [[packSequences]]: shard-local prefix sums, one shuffle, layout
    * independent of input partitioning, and the explode fan-out per
    * document is `1 + tokens/budget` — bounded by the document's own
    * length, never the corpus. */
  def packConcat(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame =
    packConcatWithOffsets(docs, idCol, tokenCol, budget, shards)
      .drop("doc_off")

  /** [[packConcat]] + `doc_off`: how many of the document's own tokens
    * earlier bins already consumed — the slice offset a token-id
    * exporter needs to cut each document's id array into its per-bin
    * pieces. Closed form from the shard-stream interval (the document
    * occupies contiguous positions, so the part before this bin is
    * `max(start, bin·budget) − start`); no extra shuffle. */
  def packConcatWithOffsets(docs: DataFrame, idCol: String,
      tokenCol: String, budget: Long, shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    checkNames(idCol, tokenCol, Nil)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(tokenCol),
        pmod(col(idCol), lit(shards)).cast("long").as("shard"))
      .filter(col(tokenCol) > 0)
      .withColumn("__graft_end", sum(col(tokenCol)).over(w))
      .withColumn("__graft_start", col("__graft_end") - col(tokenCol))
      // integral long division — exact at any offset, no double rounding
      .withColumn("__graft_bin0", expr(s"__graft_start div ${budget}L"))
      .withColumn("__graft_binLast", expr(s"(__graft_end - 1) div ${budget}L"))
      .select(col(idCol), col("shard"),
        explode(sequence(col("__graft_bin0"), col("__graft_binLast"))).as("bin"),
        col("__graft_start"), col("__graft_end"))
      .withColumn("tok_in_bin",
        least(col("__graft_end"), (col("bin") + 1) * budget) -
          greatest(col("__graft_start"), col("bin") * budget))
      .withColumn("start_in_bin",
        greatest(col("__graft_start"), col("bin") * budget) -
          col("bin") * budget)
      .withColumn("doc_off",
        greatest(col("__graft_start"), col("bin") * budget) -
          col("__graft_start"))
      .select(col(idCol), col("shard"), col("bin"), col("tok_in_bin"),
        col("start_in_bin"), col("doc_off"))
  }

  /** BALANCED shard assignment by token count — the load-balancing
    * complement of the id-mod sharding above: `id mod shards` balances
    * document COUNTS, but a skewed length distribution then hands some
    * lanes far more TOKENS than others, and the slowest lane paces the
    * whole training epoch (the classic LPT/makespan problem).
    *
    * Engine-reproducible form (an exact SQL oracle must replay it, so
    * no greedy bin-picking driver loop): documents are banded by token
    * MAGNITUDE — `band = length(bin(tokens))`, i.e. ⌊log₂ tokens⌋+1,
    * pure integer/string ops identical in Spark and DuckDB — and
    * round-robined across shards within their band in DESCENDING size
    * order (ties by the portable md5 rank, then id). Sorted-desc
    * round-robin telescopes: within a band, any two shards' token
    * totals differ by at most that band's LARGEST document, so summing
    * the geometric band maxima bounds total imbalance by a few times
    * the single largest document — independent of corpus size, the
    * practical LPT guarantee, with none of LPT's sequential greedy
    * state.
    *
    * Output: `(idCol, tokenCol, band, shard)`, one row per document
    * with positive tokens.
    *
    * Scale (100 TB): one hash shuffle. Bands are few (~log of the max
    * length) and corpus-sized, so the per-band rank is the window-skew
    * hazard; `saltBuckets > 1` routes it through the two-level rank
    * (the [[Curation.mixtureByTokens]] escape). The salt here must be
    * monotone along the (tokens DESC, …) rank order for bucket ranges
    * to stay contiguous, so it is cut from the TOKEN VALUE — the
    * band's value range [2^(band−1), 2^band) splits into saltBuckets
    * equal sub-ranges, largest-first; local ranks run per (band, salt)
    * in parallel and band×bucket COUNT offsets (broadcast-sized) lift
    * them to exactly the global rank. Output is bit-identical to the
    * plain path on any input (uneven sub-ranges only change
    * parallelism). */
  def packBalanced(docs: DataFrame, idCol: String, tokenCol: String,
      shards: Int, saltBuckets: Int = 1): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(!Seq(idCol, tokenCol).exists(Set("band", "shard")),
      "packBalanced reserves output columns band, shard")
    val base = docs
      .select(col(idCol), col(tokenCol).cast("long").as(tokenCol))
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0)
      .withColumn("band", length(bin(col(tokenCol))).cast("long"))
    val rankOrder = Seq(col(tokenCol).desc,
      Sampling.md5Top60(col(idCol)).asc, col(idCol).asc)
    val ranked =
      if (saltBuckets == 1) {
        val w = Window.partitionBy(col("band")).orderBy(rankOrder: _*)
        base.withColumn("__graft_rank", row_number().over(w).cast("long"))
      } else {
        // sub-range salt, monotone with tokens DESC inside the band:
        // band b holds values [2^(b-1), 2^b); salt 0 = top sub-range.
        // Integer-exact; shiftleft stays in range only while band < 63
        // (⇔ tokens < 2^62) — beyond that the shift wraps silently, so
        // fail loudly per the matvec-overflow-guard discipline
        val salted = base.withColumn("__graft_salt",
          when(col("band") >= 63,
            raise_error(lit("packBalanced: token count >= 2^62 — the " +
              "sub-range salt's shiftleft(1L, band) would overflow"))
              .cast("long"))
            .otherwise(least(lit(saltBuckets - 1L), expr(
              s"(((shiftleft(1L, band) - 1) - ${tokenCol}) * $saltBuckets)" +
                s" div shiftleft(1L, band - 1)"))))
        val localW = Window.partitionBy(col("band"), col("__graft_salt"))
          .orderBy(rankOrder: _*)
        val priorW = Window.partitionBy(col("band"))
          .orderBy(col("__graft_salt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = salted
          .groupBy(col("band"), col("__graft_salt"))
          .agg(count(lit(1)).as("__graft_bn"))
          .select(col("band"), col("__graft_salt"),
            coalesce(sum(col("__graft_bn")).over(priorW), lit(0L))
              .as("__graft_rankoff"))
        salted
          .withColumn("__graft_lrank",
            row_number().over(localW).cast("long"))
          .join(broadcast(offsets), Seq("band", "__graft_salt"))
          .withColumn("__graft_rank",
            col("__graft_rankoff") + col("__graft_lrank"))
      }
    ranked
      .withColumn("shard", pmod(col("__graft_rank") - 1, lit(shards.toLong)))
      .select(col(idCol), col(tokenCol), col("band"), col("shard"))
  }
}
