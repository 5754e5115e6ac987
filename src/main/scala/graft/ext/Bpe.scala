package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * iterative merge loop on top of the one-shot pair census
  * ([[TextAnalysis.bpePairCounts]]): repeatedly take the corpus's most
  * frequent adjacent symbol pair, fuse it into a new symbol, and
  * re-segment — the algorithm that produces a GPT-style subword
  * vocabulary (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units").
  *
  * Scale design (100 TB): the corpus is read ONCE, collapsing to the
  * distinct-word frequency table (vocabulary-sized — a 100 TB corpus
  * has a few tens of millions of distinct words, not 100 TB of them);
  * every training iteration then runs over that word table only. Per
  * iteration: one map-side-combining pair aggregate (pair-vocabulary-
  * sized), ONE row collected (the arg-max pair), and a narrow literal
  * string `replace` over the word table. The corpus is never collected
  * and never re-scanned; driver state is the merge list itself — the
  * output, `numMerges` rows.
  *
  * Determinism: the arg-max pair breaks ties by (count DESC, left ASC,
  * right ASC) — a total order, the same one `q_bpe_pairs` pins — so the
  * merge sequence is a pure function of the corpus, replayable by the
  * DuckDB oracle and stable across partitionings.
  *
  * Segmentations are carried as strings, not arrays: a word's current
  * symbol sequence is its symbols joined by a DOUBLE space with
  * double-space padding at both ends (`"ab" → "  a  b  "`). Merging
  * pair (l, r) is then the literal replace of `" l  r "` with
  * `" lr "` — each 2-space separator donates one space to each
  * neighboring match, so back-to-back occurrences (`a b a b`) all
  * merge in one left-to-right pass, exactly the greedy non-overlapping
  * scan reference BPE uses (a single-space encoding would let the
  * first match swallow the separator the next match needs). Words
  * never contain spaces (they are split ON spaces), so the encoding is
  * unambiguous, codegen-friendly, and identical in Spark and SQL. */
object Bpe {

  /** One training merge: `step` (1-based), the pair (`lhs`, `rhs`), the
    * fused symbol `merged = lhs ∥ rhs`, and the pair's corpus frequency
    * `n` at merge time. Stops early (fewer than `numMerges` rows) when
    * no adjacent pair remains.
    *
    * @param docs      corpus; tokenized on single spaces like the rest
    *                  of the text stack
    * @param textCol   document text column
    * @param numMerges merges to learn (the vocabulary-size knob) */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession

    // corpus -> distinct-word frequency table (the ONLY corpus-sized
    // pass), then each word to its initial per-character segmentation
    // in the double-space string encoding
    var words = docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // "(?s)(.)" matches one code point incl. newlines; "$1  " plants
      // the trailing double separator after every symbol
      .select(
        concat(lit("  "), regexp_replace(col("w"), "(?s)(.)", "$1  "))
          .as("seg"),
        col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    var step = 0
    while (step < numMerges && !exhausted) {
      // adjacent symbol pairs weighted by word count: split the string
      // encoding back to symbols (double-space separator; the padding
      // yields empty edge slots, filtered), then one vocabulary-sized
      // aggregate with map-side partials
      val syms = filter(split(col("seg"), "  ", -1), x => x =!= "")
      val best = words
        .select(col("cnt"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("lhs"),
              element_at(col("s"), i + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("n"))
        // the deterministic total order q_bpe_pairs pins
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        step += 1
        merges += ((step.toLong, l, r, n))
        // fuse the pair everywhere it occurs; literal replace, greedy
        // left-to-right — see the encoding note above. Persist the new
        // generation and release the old so per-iteration cost stays
        // O(vocabulary), not O(vocabulary × step)
        val prev = words
        words = prev
          .select(replace(col("seg"), lit(s" $l  $r "), lit(s" ${l}${r} "))
            .as("seg"), col("cnt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        words.count() // materialize before dropping the parent
        prev.unpersist(blocking = false)
      }
    }
    words.unpersist(blocking = false)

    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map { case (s, l, r, n) => Row(s, l, r, l + r, n) }, 1),
      schema)
  }
}
