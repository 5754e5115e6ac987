package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) subword tokenizer — the
  * other major subword family next to BPE ([[Bpe]]): instead of
  * greedily fusing frequent pairs, score CANDIDATE pieces by corpus
  * likelihood and segment each word with a Viterbi search for the
  * minimum-cost piece sequence (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates"). The reference repo's pipeline tokenizes nothing — this
  * is part of the training-data surface layered on top of its corpus
  * tables.
  *
  * Scale design (100 TB): like the BPE trainer, the corpus is read
  * ONCE, collapsing to the distinct-word frequency relation
  * (vocabulary-sized, tens of millions of rows at worst — never corpus-
  * sized). The substring census explodes each distinct word into at
  * most `len × maxPieceLen` candidate pieces (a bounded narrow fan-out,
  * ≤ 64 at the defaults) and aggregates with map-side partials; the
  * top-V selection is a `TakeOrderedAndProject` (per-partition local
  * top-V, then a driver-side merge of V-row heads — no global sort
  * shuffle). The final vocabulary is bounded by the `vocabSize` knob
  * (32-256 k pieces in practice, a few MB) and BROADCASTS to the
  * Viterbi kernel exactly like the k-means centroid matrix — the
  * corpus-sized side never shuffles at all: encoding is one narrow
  * `mapPartitions` pass over distinct words plus one AQE-broadcast
  * join back to the exploded corpus.
  *
  * Determinism: piece costs are integer-quantized up front
  * (`round(1e6 · log2(total/cnt))`, the repo-wide 1e-6 log-prob
  * quantization), so every Viterbi comparison is exact long
  * arithmetic. The DP minimizes the PAIR (total cost, piece count)
  * lexicographically by packing it into one long (`cost·64 + 1` per
  * edge — a word holds at most `maxWordLen < 64` pieces, so the low
  * digit never carries), which makes the reported cost AND count
  * unique even when distinct segmentations tie: any tie left over
  * agrees on both outputs. The DuckDB oracle replays the same search
  * as an unrolled Bellman-Ford chain over the same packed metric.
  */
object Unigram {

  /** Candidate-piece census + top-V vocabulary with integer costs.
    *
    * Every substring of length 1..`maxPieceLen` of every distinct word
    * (≤ `maxWordLen` chars; longer words are out-of-vocabulary by
    * contract and encode as a single unknown piece) is counted once
    * per occurrence, weighted by the word's corpus frequency. The
    * vocabulary keeps the top `vocabSize` pieces under the total order
    * (count DESC, piece ASC) PLUS every single-character piece (the
    * SentencePiece required-character rule — guarantees every seeded
    * word stays segmentable). Cost = `round(1e6 · log2(total/cnt))`
    * where `total` sums the kept vocabulary's counts.
    *
    * @return (piece, cnt, cost) */
  def unigramSeed(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      vocabSize: Int = 40, maxWordLen: Int = 16): DataFrame =
    unigramSeedFromWords(wordFreq(docs, textCol), maxPieceLen, vocabSize,
      maxWordLen)

  /** [[unigramSeed]] starting from an ALREADY-MAINTAINED distinct-word
    * frequency relation `(w, freq)` — the ingest-time form: a stream
    * that keeps per-batch word censuses (additive, idempotent under
    * replay) can derive the current vocabulary at any moment without
    * ever rescanning the corpus, because the census IS the tokenizer
    * trainer's sufficient statistic. */
  def unigramSeedFromWords(wordsIn: DataFrame, maxPieceLen: Int = 4,
      vocabSize: Int = 40, maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen && vocabSize >= 1,
      s"bad knobs: maxPieceLen=$maxPieceLen maxWordLen=$maxWordLen " +
        s"vocabSize=$vocabSize")
    val words = wordsIn
      .filter(length(col("w")) <= maxWordLen)
    // bounded narrow fan-out: word -> all (start, len) substrings
    val census = words
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("w")) - i + 1)),
            len => col("w").substr(i, len))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    // local-top-V + merge, not a global rank window
    val top = census.orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    val singles = census.filter(length(col("piece")) === 1)
    val vocab = top.unionByName(singles).distinct()
    val total = vocab.agg(sum(col("cnt")).cast("double").as("t"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(lit(1e6) * log2(col("t") / col("cnt").cast("double")))
          .cast("long").as("cost"))
  }

  /** Viterbi-encode the corpus under a trained vocabulary: per document,
    * the total piece count and total quantized cost of the minimum-cost
    * segmentation of each of its words (lexicographic (cost, pieces)
    * minimum — see the object note on the packed metric). Words longer
    * than `maxWordLen`, or containing a character outside the
    * vocabulary, count as ONE unknown piece at the cost of a
    * hypothetical count-1 piece (`round(1e6 · log2(total))`).
    *
    * The vocabulary collects to the driver and broadcasts — it is
    * `vocabSize`-bounded by construction (the same contract as the
    * k-means centroid broadcast). The DP itself runs over the DISTINCT
    * word relation (narrow, partition-local); the corpus only pays an
    * explode and an AQE-broadcast join against the word results.
    *
    * @param vocab (piece, cnt, cost) as produced by [[unigramSeed]]
    * @return (idCol, n_pieces, total_cost) */
  def unigramEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 16)
      : DataFrame = {
    val spark = docs.sparkSession
    val (vmap, unkCost) = collectVocab(vocab)
    val bv = spark.sparkContext.broadcast(vmap)
    import spark.implicits._
    val wordSeg = docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "").distinct()
      .as[String]
      .mapPartitions { it =>
        val m = bv.value
        it.map { w =>
          val packed = viterbiPacked(w, m, maxPieceLen, maxWordLen, unkCost)
          (w, packed % 64L, packed / 64L)
        }
      }
      .toDF("w", "n_pieces", "w_cost")
    docs
      .select(col(idCol),
        explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .join(wordSeg, "w")
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_pieces"),
        sum(col("w_cost")).as("total_cost"))
  }

  /** One hard-EM (Viterbi-EM) refinement step: re-estimate piece counts
    * from the pieces the CURRENT vocabulary's best segmentations
    * actually use (each word's Viterbi path, weighted by word
    * frequency), drop pieces no path uses — keeping every single-
    * character piece, the required-character rule again — and re-derive
    * costs from the new counts. Iterating this shrinks the seed census
    * toward the pieces that pay for themselves, which is exactly
    * SentencePiece's prune loop with Viterbi (hard) counts in place of
    * full forward-backward expectations.
    *
    * Ties between equal-(cost, pieces) segmentations are broken
    * deterministically toward the LONGEST last piece at every DP cell
    * (smallest predecessor index), so the counted path is a pure
    * function of the corpus and vocabulary.
    *
    * Same shuffle shape as [[unigramSeed]]: one distinct-word DP pass
    * (narrow) and one piece-keyed aggregate with map-side partials.
    *
    * @return (piece, cnt, cost) over the surviving vocabulary */
  def unigramEmStep(docs: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val (vmap, _) = collectVocab(vocab)
    val bv = spark.sparkContext.broadcast(vmap)
    import spark.implicits._
    val words = wordFreq(docs, textCol)
      .filter(length(col("w")) <= maxWordLen)
      .as[(String, Long)]
    val used = words.flatMap { case (w, freq) =>
      viterbiPath(w, bv.value, maxPieceLen).iterator
        .flatMap(path => path.map(p => (p, freq)))
    }.toDF("piece", "freq")
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    // required characters survive even at count 0 under the new paths
    val singles = vocab.filter(length(col("piece")) === 1)
      .select(col("piece"))
      .join(used, Seq("piece"), "left_anti")
      .select(col("piece"), lit(0L).as("cnt"))
    val kept = used.unionByName(singles)
    val total = kept.agg(sum(col("cnt")).cast("double").as("t"))
    kept.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        when(col("cnt") > 0,
          round(lit(1e6) * log2(col("t") / col("cnt").cast("double")))
            .cast("long"))
          .otherwise(round(lit(1e6) * log2(col("t"))).cast("long"))
          .as("cost"))
  }

  /** Distinct-word frequency relation — the single corpus-sized pass. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Driver-side vocabulary materialization: (piece → cost) map plus
    * the unknown-piece cost derived from the vocabulary total. */
  private def collectVocab(vocab: DataFrame): (Map[String, Long], Long) = {
    val rows = vocab.select(col("piece"), col("cnt"), col("cost")).collect()
    val total = rows.iterator.map(_.getLong(1)).sum.toDouble
    val unk = math.round(1e6 * (math.log(total) / math.log(2.0)))
    (rows.iterator.map(r => r.getString(0) -> r.getLong(2)).toMap, unk)
  }

  /** Min over segmentations of the packed (cost·64 + pieces) metric;
    * the unknown path for over-long or unsegmentable words. */
  private[graft] def viterbiPacked(w: String, vocab: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int, unkCost: Long): Long = {
    if (w.length > maxWordLen) return unkCost * 64L + 1L
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MaxValue)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var len = 1
      val maxLen = math.min(maxPieceLen, j)
      while (len <= maxLen) {
        val i = j - len
        if (dp(i) != Long.MaxValue) {
          vocab.get(w.substring(i, j)) match {
            case Some(c) =>
              val cand = dp(i) + c * 64L + 1L
              if (cand < dp(j)) dp(j) = cand
            case None =>
          }
        }
        len += 1
      }
      j += 1
    }
    if (dp(n) == Long.MaxValue) unkCost * 64L + 1L else dp(n)
  }

  /** The arg-min segmentation behind [[viterbiPacked]], ties broken
    * toward the longest last piece at every cell; None when the word
    * has no in-vocabulary segmentation (the caller's unknown path). */
  private[graft] def viterbiPath(w: String, vocab: Map[String, Long],
      maxPieceLen: Int): Option[List[String]] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MaxValue)
    val back = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      // longest piece first: the descending-length scan itself is the
      // tie-break — the first setter of an exact packed cost has the
      // smallest predecessor i, and strict `<` keeps it
      var len = math.min(maxPieceLen, j)
      while (len >= 1) {
        val i = j - len
        if (dp(i) != Long.MaxValue) {
          vocab.get(w.substring(i, j)) match {
            case Some(c) =>
              val cand = dp(i) + c * 64L + 1L
              if (cand < dp(j)) { dp(j) = cand; back(j) = i }
            case None =>
          }
        }
        len -= 1
      }
      j += 1
    }
    if (dp(n) == Long.MaxValue) None
    else {
      var pieces = List.empty[String]
      var pos = n
      while (pos > 0) {
        val i = back(pos)
        pieces = w.substring(i, pos) :: pieces
        pos = i
      }
      Some(pieces)
    }
  }
}

/** WordPiece-style greedy tokenizer — the third encode family next to
  * BPE (merge replay) and Unigram (min-cost Viterbi): longest-match-
  * first segmentation under a fixed vocabulary, BERT's runtime rule.
  * Greedy needs only vocabulary MEMBERSHIP (no costs), always emits at
  * least as many pieces as the Viterbi optimum over the same
  * vocabulary, and is what a serving-side tokenizer actually runs, so
  * the gate's greedy-vs-optimal piece counts double as a tokenizer-
  * quality probe.
  *
  * Same shuffle contract as [[Unigram.unigramEncode]]: the vocabulary
  * collects and broadcasts (vocabSize-bounded — the centroid
  * contract), the greedy loop runs once per DISTINCT word
  * (partition-local), and the corpus pays one explode plus an
  * AQE-broadcast join against the word results.
  */
object WordPiece {

  /** Greedy longest-match piece count for one word. Over-long words
    * (> maxWordLen) and words hitting a position with NO in-vocabulary
    * piece take the BERT unknown path: the WHOLE word becomes one
    * unknown piece. With a vocabulary seeded from the same corpus
    * ([[Unigram.unigramSeed]] keeps every single character), the
    * stuck case is unreachable for in-contract words — it exists for
    * encoding NEW text under a frozen vocabulary.
    *
    * @return (n_pieces, n_unk) — n_unk ∈ {0, 1} */
  private[graft] def greedyPieces(w: String, vocab: Set[String],
      maxPieceLen: Int, maxWordLen: Int): (Long, Long) = {
    if (w.length > maxWordLen) return (1L, 1L)
    var pos = 0
    var n = 0L
    while (pos < w.length) {
      var len = math.min(maxPieceLen, w.length - pos)
      while (len > 0 && !vocab.contains(w.substring(pos, pos + len)))
        len -= 1
      if (len == 0) return (1L, 1L)
      n += 1L
      pos += len
    }
    (n, 0L)
  }

  /** Encode the corpus greedily under `vocab` (piece, cnt, cost — the
    * [[Unigram.unigramSeed]] shape; only `piece` is read): per
    * document, total greedy piece count and how many words fell to the
    * unknown path.
    *
    * @return (idCol, n_pieces, n_unk) */
  def wordPieceEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 16)
      : DataFrame = {
    val spark = docs.sparkSession
    val pieces = vocab.select(col("piece")).collect()
      .map(_.getString(0)).toSet
    val bv = spark.sparkContext.broadcast(pieces)
    import spark.implicits._
    val wordSeg = docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "").distinct()
      .as[String]
      .mapPartitions { it =>
        val v = bv.value
        it.map { w =>
          val (n, unk) = greedyPieces(w, v, maxPieceLen, maxWordLen)
          (w, n, unk)
        }
      }
      .toDF("w", "n_pieces", "n_unk")
    docs
      .select(col(idCol),
        explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .join(wordSeg, "w")
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_unk")).as("n_unk"))
  }
}
