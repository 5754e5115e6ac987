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
    trainLoop(docs.sparkSession,
      wordFreq(docs, textCol).select(charSeg0(col("w")).as("seg"), col("cnt")),
      numMerges)
  }

  /** BYTE-LEVEL training (the GPT-2 family, Radford et al. 2019): words
    * decompose into the bytes of their UTF-8 encoding instead of their
    * characters, so the base alphabet is the FIXED 256-byte set — ids
    * are stable across corpora and jobs, and encode has no unknown-word
    * path (any string decomposes into bytes). Symbols are carried as
    * uppercase hex pairs ("74" = 't'), merged symbols as concatenated
    * pairs ("7468" = "th") — space-free, pure ASCII, so the exact
    * double-space merge machinery (and its oracle replay) applies
    * unchanged. Same merge schema and determinism contract as
    * [[bpeTrain]]. */
  def bpeTrainBytes(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    trainLoop(docs.sparkSession,
      wordFreq(docs, textCol).select(byteSeg0(col("w")).as("seg"), col("cnt")),
      numMerges)
  }

  /** Corpus → distinct-word frequency table — the ONLY corpus-sized pass
    * either trainer runs. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
    .filter(col("w") =!= "")
    .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** PER-DOCUMENT word census `(idCol, w, cnt)` — the ledger-resident
    * form of the trainer's sufficient statistic: additive across ingest
    * ticks (each tick writes its own docs' rows exactly once) AND
    * restrictable to any document subset by a semi-join on the id, so a
    * MIXTURE-SCOPED training census derives from stored state without
    * re-reading or re-splitting any text. Summing `cnt` by `w` over any
    * id set reproduces [[wordFreq]] of that set's corpus exactly. */
  def docWordCensus(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = docs
    .select(col(idCol),
      explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
    .filter(col("w") =!= "")
    .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cnt"))

  /** [[bpeTrain]] fed from a pre-aggregated word census instead of
    * corpus text — the incremental pipeline's refresh path (the
    * [[Unigram.unigramSeedFromWords]] precedent): the census IS the
    * trainer's whole input, because [[wordFreq]] is the only
    * corpus-sized pass [[bpeTrain]] runs. Rows may repeat a word
    * (per-tick or per-doc census slices); they are summed here, so
    * `bpeTrainFromWords(docWordCensus(corpus))` is value-identical to
    * `bpeTrain(corpus)` (ExtSpec-pinned), and a refresh training over
    * maintained ledger state costs census-sized work, never a corpus
    * re-read. */
  def bpeTrainFromWords(words: DataFrame, wordCol: String,
      cntCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    trainLoop(words.sparkSession,
      words.groupBy(col(wordCol))
        .agg(sum(col(cntCol).cast("long")).as("cnt"))
        .select(charSeg0(col(wordCol)).as("seg"), col("cnt")),
      numMerges)
  }

  /** Initial per-CHARACTER segmentation in the double-space encoding.
    * "(?s)(.)" matches one code point incl. newlines; "$1  " plants the
    * trailing double separator after every symbol. */
  private def charSeg0(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("  "), regexp_replace(w, "(?s)(.)", "$1  "))

  /** Initial per-BYTE segmentation: `hex` emits the UTF-8 bytes as an
    * even-length uppercase hex string; "(..)" cuts it back into 2-char
    * byte symbols. */
  private def byteSeg0(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("  "), regexp_replace(hex(w), "(..)", "$1  "))

  /** The shared iterative merge loop over a pre-segmented word table. */
  private def trainLoop(spark: org.apache.spark.sql.SparkSession,
      words0: DataFrame, numMerges: Int): DataFrame = {
    var words = words0
      // the word table is vocabulary-sized — orders of magnitude below
      // the corpus — but inherits the corpus aggregate's partition
      // count, so every one of the numMerges sequential iterations
      // schedules a full-width stage over near-empty tasks. Size the
      // loop's working set to the DATA (a few partitions absorb tens
      // of millions of words), not the shuffle default: the iteration
      // latency is scheduling-bound, and this is the knob
      .coalesce(8)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    var step = 0
    // previous generation, kept cached until the NEXT census has
    // materialized its child — the census job itself then does the
    // materialization work a per-iteration count() used to do, saving
    // one full pass over the word table every merge step
    var prev: DataFrame = null
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
      // the census just materialized `words` into its cache, so the
      // generation that produced it is now droppable
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        step += 1
        merges += ((step.toLong, l, r, n))
        // fuse the pair everywhere it occurs; literal replace, greedy
        // left-to-right — see the encoding note above. Persist the new
        // generation (lazily — the next census materializes it) and
        // hold the parent one step so per-iteration cost stays
        // O(vocabulary), not O(vocabulary × step)
        prev = words
        words = prev
          .select(replace(col("seg"), lit(s" $l  $r "), lit(s" ${l}${r} "))
            .as("seg"), col("cnt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
    }
    if (prev != null) prev.unpersist(blocking = false)
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

  /** Above this many merges the per-word merge chain switches from a
    * folded `replace` expression tree to a per-row Scala fold — a
    * production merge list (32k-64k) as one nested expression would
    * blow analysis/codegen limits, and the fold runs over the
    * VOCABULARY-sized word table only, never the corpus. */
  private val MaxExprMerges = 128

  /** Vocabulary-size threshold for [[bpeEncodeIds]]'s map-literal vs
    * broadcast-join symbol→id lookup (see its scaladoc). */
  private val MaxLiteralVocab = 65536

  /** ENCODE with a trained merge list: applies `merges` (the output of
    * [[bpeTrain]], or any (step, lhs, rhs) table) in step order to every
    * document and returns per-document token statistics —
    * `(idCol, n_words, n_bpe_tokens)`, one row per document with at
    * least one word, ordered by nothing (caller sorts).
    *
    * Scale design (100 TB): the merge chain — the expensive sequential
    * part — runs once per DISTINCT word (vocabulary-sized), not once
    * per occurrence: corpus → distinct words → chain → per-word token
    * count, then one hash join back to the exploded corpus and a
    * map-side-combining sum per document. The merge list itself is
    * driver-side by construction (its size IS the vocabulary knob,
    * `numMerges` rows); ≤[[MaxExprMerges]] merges fold into a codegen'd
    * `replace` expression tree, larger lists run as a broadcast per-row
    * fold over the word table.
    *
    * Greedy left-to-right application per merge, in training order, on
    * the same double-space encoding [[bpeTrain]] carries — so
    * `bpeEncode(corpus, bpeTrain(corpus, m))` reproduces exactly the
    * segmentation training ended with. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame =
    bpeEncode(docs, idCol, textCol, merges, MaxExprMerges)

  /** Test seam: `maxExprMerges` forces the branch choice so the spec can
    * pin that the expression-fold and per-row-fold paths agree. */
  private[graft] def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, maxExprMerges: Int): DataFrame = {
    val segged = segmentWords(docs, textCol, collectChain(merges), maxExprMerges)
    val wordTokens = segged.select(col("w"),
      size(filter(split(col("seg"), "  ", -1), x => x =!= ""))
        .cast("long").as("t"))

    docs
      .select(col(idCol),
        explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .join(wordTokens, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("t")).as("n_bpe_tokens"))
  }

  /** step order IS application order — BPE merges are not commutative */
  private def collectChain(merges: DataFrame): Array[(String, String)] =
    merges
      .select(col("step"), col("lhs"), col("rhs"))
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2)))

  /** Final segmentation per distinct word of `docs` under the merge
    * `chain`, in the double-space encoding: `(w, seg)`. The chain — the
    * expensive sequential part — runs once per DISTINCT word. */
  private def segmentWords(docs: DataFrame, textCol: String,
      chain: Array[(String, String)], maxExprMerges: Int,
      seg0Of: org.apache.spark.sql.Column => org.apache.spark.sql.Column = charSeg0): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val seg0 = seg0Of(col("w"))
    if (chain.length <= maxExprMerges) {
      val segN = chain.foldLeft(seg0) { case (c, (l, r)) =>
        replace(c, lit(s" $l  $r "), lit(s" $l$r "))
      }
      words.select(col("w"), segN.as("seg"))
    } else {
      val bc = spark.sparkContext.broadcast(chain)
      import spark.implicits._
      words.select(col("w"), seg0.as("seg")).as[(String, String)]
        .mapPartitions { it =>
          val ms = bc.value
          it.map { case (w, s0) =>
            var s = s0
            var i = 0
            while (i < ms.length) {
              val (l, r) = ms(i)
              s = s.replace(s" $l  $r ", s" $l$r ")
              i += 1
            }
            (w, s)
          }
        }.toDF("w", "seg")
    }
  }

  /** ENCODE to real token-ID sequences — what a training pipeline feeds
    * the model: per document, the `array<int>` of vocabulary ids of its
    * BPE symbols in reading order. Output `(idCol, token_ids, n_tokens)`,
    * one row per document with at least one word.
    *
    * Vocabulary contract (deterministic, engine-independent): base
    * symbols are the distinct single characters of the corpus's words in
    * ascending (code-point) order, ids `0 .. B-1`; each merge step `k`
    * mints symbol `lhs ∥ rhs` with id `B + k - 1` — merge-order ids,
    * exactly the ids reference BPE implementations assign. If a minted
    * string collides with an existing symbol (possible: two merge paths
    * can fuse to the same string), the FIRST id wins, so the mapping is
    * a function of (alphabet, merge list) alone.
    *
    * Scale design (100 TB): identical to [[bpeEncode]] — the merge chain
    * and the id lookup run per DISTINCT word (vocabulary-sized), then
    * one hash join back to the exploded corpus; per-document arrays are
    * bounded by document length. The alphabet collect is
    * alphabet-sized (≤ distinct characters — thousands even for CJK
    * corpora), same driver-state class as the merge list itself.
    *
    * The two trailing parameters are branch seams with production
    * defaults: `maxExprMerges` as in [[bpeEncode]];
    * `maxLiteralVocab` — below it the symbol→id lookup is a single map
    * LITERAL in the plan (zero extra shuffles; the map rides the task
    * binary as one object, not inlined codegen constants), above it a
    * broadcast equi-join (a plan literal is re-shipped with every
    * stage referencing it, which stops being free somewhere past a
    * production tokenizer's 32-64k entries). */
  def bpeEncodeIds(docs: DataFrame, idCol: String,
      textCol: String, merges: DataFrame,
      maxExprMerges: Int = MaxExprMerges,
      maxLiteralVocab: Int = MaxLiteralVocab): DataFrame = {
    val chain = collectChain(merges)
    val segged = segmentWords(docs, textCol, chain, maxExprMerges)
    assembleIds(docs, idCol, textCol, segged, buildVocab(segged, chain),
      maxLiteralVocab)
  }

  /** BYTE-LEVEL encode to token-id sequences under the FIXED vocabulary:
    * ids 0..255 are the byte values themselves (symbol = uppercase hex
    * pair), merge step `k` mints id `256 + k − 1` (first id wins on a
    * minted-string collision). No corpus alphabet collect — the id
    * table is a pure function of the merge list, stable across corpora
    * and jobs, and every word encodes (no unknown path: any string
    * decomposes into bytes). Same output shape and scale design as
    * [[bpeEncodeIds]]. */
  def bpeEncodeIdsBytes(docs: DataFrame, idCol: String,
      textCol: String, merges: DataFrame,
      maxExprMerges: Int = MaxExprMerges,
      maxLiteralVocab: Int = MaxLiteralVocab): DataFrame = {
    val chain = collectChain(merges)
    val segged = segmentWords(docs, textCol, chain, maxExprMerges, byteSeg0)
    assembleIds(docs, idCol, textCol, segged, buildByteVocab(chain),
      maxLiteralVocab)
  }

  /** Shared tail of the id encoders: per-word id sequences under
    * `vocab`, then the order-restoring join back to the exploded
    * corpus. */
  private def assembleIds(docs: DataFrame, idCol: String, textCol: String,
      segged: DataFrame,
      vocab: scala.collection.mutable.LinkedHashMap[String, Int],
      maxLiteralVocab: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordSyms = filter(split(col("seg"), "  ", -1), x => x =!= "")
    // per-word id sequence: symbols in order -> ids in order. Every
    // segmentation symbol is in the vocabulary by construction (base
    // chars come from these words; merged symbols from the chain), so
    // the map lookup is total.
    val wordIds =
      if (vocab.size <= maxLiteralVocab)
        // pure expression — no shuffle, no join: the transform maps
        // each symbol through the map literal in place
        segged.select(col("w"),
          transform(wordSyms, s => element_at(typedLit(vocab.toMap), s))
            .as("__graft_wids"))
      else {
        val vocabDf = broadcast(
          vocab.toSeq.toDF("__graft_sym", "__graft_symid"))
        segged
          .select(col("w"),
            posexplode(wordSyms).as(Seq("__graft_spos", "__graft_sym")))
          .join(vocabDf, "__graft_sym")
          .groupBy(col("w"))
          .agg(transform(
            array_sort(collect_list(struct(col("__graft_spos"),
              col("__graft_symid")))),
            s => s.getField("__graft_symid")).as("__graft_wids"))
      }

    docs
      .select(col(idCol),
        posexplode(filter(split(col(textCol).cast("string"), " ", -1),
          x => x =!= "")).as(Seq("__graft_wpos", "w")))
      .join(wordIds, "w")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__graft_wpos"),
          col("__graft_wids")))),
        s => s.getField("__graft_wids"))).as("token_ids"))
      .select(col(idCol), col("token_ids"),
        size(col("token_ids")).cast("long").as("n_tokens"))
  }

  /** The deterministic symbol→id mapping [[bpeEncodeIds]] documents:
    * sorted corpus alphabet first (ids `0..B-1`), then merge-order
    * minted symbols; on a string collision the FIRST id wins and the
    * later mint is skipped (ids stay dense). Driver-side by design —
    * its size IS the tokenizer vocabulary, the same state class as the
    * merge list itself. */
  /** `words` needs only a raw-word column `w` — the alphabet comes from
    * the words themselves, never from their segmentations, so callers
    * that don't otherwise need the merge chain applied (e.g.
    * [[bpeVocab]]) can pass the plain distinct-word relation. */
  private def buildVocab(words: DataFrame,
      chain: Array[(String, String)]): scala.collection.mutable.LinkedHashMap[String, Int] = {
    val alphabet: Array[String] = words
      .select(explode(split(col("w"), "")).as("sym"))
      .filter(col("sym") =!= "").distinct()
      .orderBy(col("sym")).collect().map(_.getString(0))
    vocabOf(alphabet, chain)
  }

  /** Alphabet + chain → id table; the collision rule (first id wins,
    * ids stay dense) lives here so every vocab-size/id derivation
    * shares it. */
  private def vocabOf(alphabet: Array[String],
      chain: Array[(String, String)]): scala.collection.mutable.LinkedHashMap[String, Int] = {
    val vocab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    alphabet.foreach(s => vocab.getOrElseUpdate(s, vocab.size))
    chain.foreach { case (l, r) =>
      val minted = l + r
      if (!vocab.contains(minted)) vocab.update(minted, vocab.size)
      // collision: keep the earlier id; the minted id is simply unused
    }
    vocab
  }

  /** Vocabulary SIZE alone — the "next free id" a pipeline minting
    * special tokens (EOD, PAD) needs — without [[bpeVocab]]'s
    * distinct-word shuffle: the alphabet is the distinct non-space
    * characters of the text (identical to the distinct characters of
    * its words, since words are the text split on single spaces), so
    * one explode feeding a partially-aggregating distinct — each task
    * reduces its slice to ≤ alphabet-size partials before any shuffle —
    * replaces the corpus→distinct-words→chars chain. Same collision
    * rule as [[bpeVocab]], so the size matches it exactly. */
  def bpeVocabSize(docs: DataFrame, textCol: String,
      merges: DataFrame): Int = {
    val alphabet: Array[String] = docs
      .select(explode(split(col(textCol).cast("string"), "")).as("sym"))
      .filter(col("sym") =!= "" && col("sym") =!= " ")
      .distinct().collect().map(_.getString(0))
    vocabOf(alphabet, collectChain(merges)).size
  }

  /** The byte-level id table: the fixed 256-byte base (id = byte value,
    * symbol = uppercase hex pair) + merge-order minted symbols from 256
    * up, first id winning on a collision. A pure function of the merge
    * list — the property that makes byte-level vocabularies portable. */
  private def buildByteVocab(
      chain: Array[(String, String)]): scala.collection.mutable.LinkedHashMap[String, Int] = {
    val vocab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (0 until 256).foreach(b => vocab.update(f"$b%02X", b))
    chain.foreach { case (l, r) =>
      val minted = l + r
      if (!vocab.contains(minted)) vocab.update(minted, vocab.size)
    }
    vocab
  }

  /** [[buildByteVocab]] as a relation `(id, sym)` — needs no corpus at
    * all, unlike [[bpeVocab]]: the byte-level id table is the merge
    * list's pure function. */
  def bpeVocabBytes(spark: org.apache.spark.sql.SparkSession,
      merges: DataFrame): DataFrame = {
    import spark.implicits._
    buildByteVocab(collectChain(merges))
      .toSeq.map { case (s, i) => (i, s) }.toDF("id", "sym")
  }

  /** BYTE-LEVEL decode: ids → hex symbols via [[bpeDecode]]'s machinery,
    * then one `unhex` + UTF-8 decode turns the byte stream back into
    * characters. Same contract as [[bpeDecode]]:
    * `decode(encode(x)) == x.replace(" ", "")`. */
  def bpeDecodeBytes(encoded: DataFrame, idCol: String, idsCol: String,
      vocab: DataFrame,
      maxLiteralVocab: Int = MaxLiteralVocab): DataFrame =
    bpeDecode(encoded, idCol, idsCol, vocab, maxLiteralVocab)
      .withColumn("text", decode(unhex(col("text")), "UTF-8"))

  /** The tokenizer's id table as a relation `(id, sym)` — the artifact
    * a training pipeline persists next to the merge list so encode and
    * decode agree across jobs. Same deterministic contract as
    * [[bpeEncodeIds]] (which builds this mapping internally). */
  def bpeVocab(docs: DataFrame, textCol: String,
      merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // alphabet needs the raw words only — the merge chain never runs
    val words = docs
      .select(explode(split(col(textCol).cast("string"), " ", -1)).as("w"))
      .filter(col("w") =!= "").distinct()
    val vocab = buildVocab(words, collectChain(merges))
    import spark.implicits._
    vocab.toSeq.map { case (s, i) => (i, s) }.toDF("id", "sym")
  }

  /** DECODE — token-id sequences back to text, the inverse of
    * [[bpeEncodeIds]] and the integrity check every tokenizer pipeline
    * runs before training: `decode(encode(x))` must reproduce `x`'s
    * characters exactly. Because encode splits on single spaces and
    * flattens across words, the inverse recovers the text MINUS its
    * word separators (BPE symbols carry no boundary marker in this
    * vocabulary), i.e. `decode(encode(x)) == x.replace(" ", "")` —
    * which is precisely what the round-trip gate compares against.
    *
    * Output: `(idCol, text)`, one row per input row.
    *
    * Scale design (100 TB): the id→symbol table is the TOKENIZER, not
    * the data — bounded by vocabulary size (32-64k for production BPE),
    * so it collects to the driver like the merge list does. Below
    * `maxLiteralVocab` the lookup is a map literal in a narrow per-row
    * `transform` (zero shuffles, zero joins — decode is embarrassingly
    * parallel); above it, a posexplode + broadcast equi-join +
    * order-restoring re-assembly, one doc-keyed shuffle.
    *
    * Ids absent from `vocab` decode to the empty string rather than
    * nulling the document — callers validating a foreign id stream
    * should anti-join against [[bpeVocab]] first. */
  def bpeDecode(encoded: DataFrame, idCol: String, idsCol: String,
      vocab: DataFrame,
      maxLiteralVocab: Int = MaxLiteralVocab): DataFrame = {
    val spark = encoded.sparkSession
    val entries: Array[(Int, String)] = vocab.select(col("id").cast("int"), col("sym"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    require(entries.map(_._1).distinct.length == entries.length,
      "bpeDecode: vocab has duplicate ids")
    if (entries.length <= maxLiteralVocab) {
      val m = entries.toMap
      encoded.withColumn("text",
        array_join(
          transform(col(idsCol), i => element_at(typedLit(m), i.cast("int"))),
          "", ""))
        .drop(idsCol)
    } else {
      import spark.implicits._
      val vocabDf = broadcast(entries.toSeq.toDF("__graft_symid", "__graft_sym"))
      val decoded = encoded
        .select(col(idCol),
          posexplode_outer(col(idsCol)).as(Seq("__graft_tpos", "__graft_symid")))
        .join(vocabDf, Seq("__graft_symid"), "left")
        .groupBy(col(idCol))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("__graft_tpos"),
              coalesce(col("__graft_sym"), lit("")).as("__graft_sym")))),
            s => s.getField("__graft_sym")), "").as("text"))
      encoded.drop(idsCol).join(decoded, idCol)
    }
  }
}
