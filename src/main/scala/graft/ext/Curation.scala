package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pre-training data pipeline
  * built from this engine's individually-proven stages:
  *
  *   1. language gate    ([[TextAnalysis.langId]])
  *   2. quality gate     ([[TextAnalysis.qualityScore]])
  *   3. near-dup removal ([[Dedup.simhashDupPairs]] →
  *                        [[Dedup.dupClusters]] → keep each cluster's
  *                        canonical min-id survivor + all singletons)
  *   4. reproducible split assignment ([[Sampling.splitLabel]])
  *
  * Order matters and mirrors production practice: gates first (cheap,
  * narrow, shed rows before any shuffle), dedup on the surviving set
  * (pairs among rejected docs are wasted work), split last (so
  * train/val proportions hold on the final corpus).
  *
  * Scale shape: stages 1-2 and 4 are pure per-row expressions; stage 3
  * is the simhash pigeonhole join + iterative label propagation —
  * the only shuffling stage, keyed on signature chunks and node ids.
  * The cluster relation is dup-docs-sized (usually ≪ corpus), joined
  * back on id.
  */
object Curation {

  /** @param cuts  ascending cumulative split percentages, e.g.
    *              `Seq("train" -> 90)` with `lastLabel = "val"` ⇒ 90/10 */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      lang: String, minQuality: Double, maxHamming: Int = 7,
      cuts: Seq[(String, Int)] = Seq("train" -> 90),
      lastLabel: String = "val"): DataFrame = {
    // `kept` feeds two DAG branches (the dedup pipeline and the final
    // survivor join) — pinned as an eager disk-backed checkpoint (r15)
    // so the gate runs once per row even under heap pressure (a lazy
    // persist can drop blocks between the branches and replay the
    // lang/quality gates — the r14 q_ccnet eviction class). Freed by
    // the harness's persistent-RDD sweep. r16: the gate itself is the
    // typed kernel twin (bit-identical values, ExtSpec-pinned; the
    // expression form's interpreted per-token isin cost ~0.87 s per
    // sf0.1 corpus pass).
    val kept = TextAnalysis.langQualityGateLocal(docs, idCol, textCol,
        lang, minQuality)
      .localCheckpoint(true)
    // survivors: docs in no duplicate pair + cluster canonicals
    Dedup.keepCanonical(kept, idCol,
        Dedup.dupClusters(
          Dedup.simhashDupPairs(kept, idCol, textCol, maxHamming)))
      .select(col(idCol), col("quality"), col("n_tokens"),
        Sampling.splitLabel(col(idCol), cuts, lastLabel).as("split"))
  }

  /** The mixture→tokenize→pack→export TAIL of the composed pretraining
    * pipeline, factored so the batch composition (`q_pipeline_export`)
    * and the ledger-driven incremental composition
    * (`q_pipeline_incremental`) run the IDENTICAL plan over whichever
    * survivor relation fed them — the two gates share one oracle
    * because they share this code.
    *
    * `withSrc` is the curated train-split survivor relation
    * `(idCol, n_tokens, source)`; `texts` supplies `(idCol, textCol)`
    * for the selected docs (only mixture-selected ids are ever read).
    * Stages: token-budget mixture by source → BPE tokenizer trained ON
    * the mixed corpus and applied to it → boundary-free concat packing
    * into `budget`-token bins over `packShards` shards → deterministic
    * md5 export order over the bins. The joined corpus feeds BOTH
    * bpeTrain and bpeEncode — persisted here so the whole upstream
    * prefix runs once per consumer set, released by the caller's
    * clearCache (the pair-finder caching contract).
    *
    * `docWords`, when supplied, is a maintained PER-DOC word census
    * `(idCol, w, cnt)` covering at least the survivor docs (the
    * pipeline ledger's `words/batch=*` state,
    * [[Bpe.docWordCensus]] shape): the tokenizer is then trained via
    * [[Bpe.bpeTrainFromWords]] over the census semi-joined to the
    * mixture's ids — value-identical to training on the mixed text
    * (the census sums to exactly the mixed corpus's word frequencies),
    * but the refresh's TRAIN step reads census-sized ledger state
    * instead of re-splitting stored text. The encode stage still reads
    * the selected texts (it must — per-doc token sequences are its
    * output), which is the irreducible text touch of a refresh. */
  def mixPackExport(withSrc: DataFrame, texts: DataFrame,
      idCol: String, textCol: String,
      weights: Map[String, Double] = Map("src0" -> 2.0, "src1" -> 1.0,
        "src2" -> 1.0, "src3" -> 1.0),
      totalTokens: Long = 1500L, numMerges: Int = 8,
      budget: Long = 512L, packShards: Int = 4, exportShards: Int = 4,
      docWords: Option[DataFrame] = None): DataFrame = {
    val mixed = mixtureByTokens(withSrc, idCol, "source", "n_tokens",
      weights, totalTokens)
    val corpus = mixed.select(col(idCol))
      .join(texts.select(col(idCol), col(textCol)), idCol)
      // feeds bpeTrain AND bpeEncode — eager disk-backed pin (r15,
      // eviction-proof; see the q_ccnet class note in TextAnalysis)
      .localCheckpoint(true)
    val merges = docWords match {
      case Some(dw) => Bpe.bpeTrainFromWords(
        dw.join(mixed.select(col(idCol)), Seq(idCol), "left_semi"),
        "w", "cnt", numMerges)
      case None => Bpe.bpeTrain(corpus, textCol, numMerges)
    }
    val enc = Bpe.bpeEncode(corpus, idCol, textCol, merges)
    val packed = Packing.packConcat(
      enc.select(col(idCol), col("n_bpe_tokens")),
      idCol, "n_bpe_tokens", budget = budget, shards = packShards)
    val bins = packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_bin")).as("bin_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      // exportShards reserves "shard" — the packing shard renames
      .withColumnRenamed("shard", "pack_shard")
    Sampling.exportShards(bins,
        concat_ws(":", col("pack_shard"), col("bin")),
        numShards = exportShards)
      .select(col("shard"), col("shard_pos"), col("pack_shard"),
        col("bin"), col("n_docs"), col("bin_tokens"),
        col("first_doc"), col("last_doc"))
      .orderBy(col("shard"), col("shard_pos"))
  }

  /** Longest common prefix length of two strings (in characters).
    * Primary path is the native codegen'd [[graft.plans.StrLcp]] — one
    * UTF-8 byte walk per row; sessions without `GraftExtensions` fall
    * back to a pure-builtin form (zip the char arrays with null-safe
    * equality — the shorter side pads with null, which `<=>` reads as a
    * mismatch — and take the index of the first mismatch), same values,
    * ~10× slower per candidate (three interpreted HOF passes + two char
    * arrays). Runs ONLY on anchor candidate pairs (bounded), never
    * corpus-wide; same dispatch contract as [[Dedup.dotNative]]. */
  private def lcp(a: Column, b: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_lcp")))
      call_function("graft_lcp", a, b)
    else {
      val mismatch = array_position(
        zip_with(split(a, ""), split(b, ""), (x, y) => !(x <=> y)), lit(true))
      when(mismatch === 0, least(length(a), length(b)))
        .otherwise(mismatch - 1).cast("long")
    }

  /** EXACT-substring decontamination — the stronger form of the
    * fingerprint-overlap check (`q_contamination`): report every test
    * document that shares a VERBATIM character substring of length ≥
    * `minLen` with any training document, with the exact count of
    * contaminated window positions. This is the check recent pipelines
    * run before eval (find test answers leaked into training text),
    * where n-gram/fingerprint overlap only approximates it.
    *
    * Output: `(idCol, n_spans, first_pos)` — one row per contaminated
    * test doc; `n_spans` counts the 1-based positions `p` whose
    * `minLen`-char window `test[p, p+minLen)` occurs verbatim anywhere
    * in the training corpus, `first_pos` is the smallest such `p`.
    * Clean docs emit no row.
    *
    * Scale design (100 TB): a suffix-array or full every-offset
    * shingle index over the TRAIN side would carry one entry per
    * corpus character. Instead the train side is TILED: k-grams only
    * at stride-`s` offsets (k = ⌈minLen/2⌉, s = minLen−k+1, i.e.
    * s = k for odd minLen and s = k+1 for even), cutting train index
    * size by ~s×, while the test side (the small side — eval sets, not
    * corpora) shingles every offset. The pigeonhole guarantee is
    * exact: a window of length k+s−1 = minLen spans s consecutive
    * start offsets, and a stride-s tiling has exactly one aligned
    * offset in any s consecutive — so any common substring of length ≥
    * minLen must contain a tile-ALIGNED train k-gram, and the
    * hash equi-join on the k-gram's xxhash64 (an 8-byte join key; any
    * collision is killed by the explicit anchor-equality check, so the
    * hash choice is pure plumbing) finds an anchor for every true
    * contamination. A k-gram match alone only proves k < minLen common
    * chars, so each candidate anchor is then VERIFIED by in-order
    * extension: re-join both texts by id (hash equi-joins), extend the
    * anchor left/right via longest-common-prefix arithmetic, and keep
    * it only when the maximal common span through the anchor reaches
    * `minLen`. The span also yields, in closed form, EVERY contaminated
    * window position it covers (`[spanStart, spanStart+L−minLen]`), so
    * the result is exact — identical to the every-offset oracle — with
    * no position-level search. No cartesian anywhere (PlanSpec-pinned);
    * the explode fan-outs are bounded by text length (test windows) and
    * span length (coverage); anchor skew from boilerplate k-grams is
    * bounded by true hash-match incidence, the same contract as the
    * banded dedup joins.
    */
  def substringContamination(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame =
    substringContamination(train, test, idCol, textCol, minLen,
      excludeSelf = false)

  /** GPT-3-style token-n-gram decontamination (Brown et al. 2020,
    * appendix C — the published rule production pipelines quote): a
    * test document is contaminated iff it shares at least one
    * n-token-gram (n = 13 there) with any train document; documents
    * shorter than n tokens contribute their whole text as the one
    * gram (the `min(n, len)` treatment — [[TextAnalysis.shingleSet]]'s
    * fallback is exactly that rule).
    *
    * The token-level complement of [[substringContamination]]: coarser
    * (whole-gram granularity, no span extension) but one equi-join —
    * no anchor walk, no position arithmetic — which is why the
    * published filters run it at full corpus scale.
    *
    * Output: `(idCol, n_shared)` per contaminated TEST doc, n_shared =
    * DISTINCT shared grams (both sides' shingle sets are per-doc
    * distinct by construction).
    *
    * Scale shape (100 TB): the train gram set is one explode +
    * distinct (shuffle keyed on the gram; at PB scale key it on
    * sha2(gram) to cap shuffle width — the chunk-census precedent);
    * the test side streams one explode into a hash equi-join. No
    * cartesian, no windows, no driver state. */
  def ngramDecontamination(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val trainGrams = train
      .select(explode(TextAnalysis.shingleSet(col(textCol), n)).as("g"))
      .distinct()
    test
      .select(col(idCol),
        explode(TextAnalysis.shingleSet(col(textCol), n)).as("g"))
      .join(trainGrams, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Core detection pass: disjoint islands `(idCol, ia, ib)` of
    * contaminated window START positions per test doc (inclusive).
    * `excludeSelf = true` drops same-document anchor pairs — the knob
    * [[selfSubstringRepeats]] uses to run the corpus against itself. */
  private def contaminationIslands(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int,
      excludeSelf: Boolean, idOrdered: Boolean = false): DataFrame = {
    require(minLen >= 3, "minLen must be at least 3")
    val k = (minLen + 1) / 2
    val s = minLen - k + 1
    val trTexts = train
      .select(col(idCol).as("__graft_tid"),
        col(textCol).cast("string").as("__graft_ttext"))
      .filter(col("__graft_ttext").isNotNull &&
        length(col("__graft_ttext")) >= k)
    val teTexts = test
      .select(col(idCol), col(textCol).cast("string").as("__graft_text"))
      // a test doc shorter than minLen cannot contain a minLen window
      .filter(col("__graft_text").isNotNull &&
        length(col("__graft_text")) >= minLen)
    // train tile index: one xxhash64 per ALIGNED k-gram (stride s); every
    // occurrence is kept — two occurrences of the same k-gram extend
    // differently, and dropping one could miss a contamination only
    // reachable through its context
    // Index hashing, primary path: ONE rolling pass per text via the
    // native graft_khashes (O(len), zero substring copies; element i
    // hashes the window at char position i·stride + 1), vs the
    // per-offset substr+xxhash fallback at O(len·k) plus len copies.
    // The two paths hash with DIFFERENT functions — legal because both
    // sides of the equi-join always use the same one and every
    // candidate passes the exact anchor-equality check.
    val nativeHashes = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("graft_khashes"))
    def windowHashes(texts: DataFrame, textCol2: String, outId: String,
        outPos: String, stride: Int): DataFrame =
      if (nativeHashes)
        texts
          .select(col(outId),
            posexplode(call_function("graft_khashes", col(textCol2),
              lit(k), lit(stride))).as(Seq("__graft_i", "__graft_h")))
          .select(col(outId),
            (col("__graft_i") * stride + 1).as(outPos), col("__graft_h"))
      else
        texts
          .select(col(outId),
            explode(sequence(lit(1), length(col(textCol2)) - k + 1,
              lit(stride))).as(outPos),
            col(textCol2))
          .select(col(outId), col(outPos),
            xxhash64(col(textCol2).substr(col(outPos), lit(k)))
              .as("__graft_h"))
    val tiles = windowHashes(trTexts, "__graft_ttext", "__graft_tid",
      "__graft_q", s)
    // test windows at EVERY offset (the guarantee needs unaligned finds)
    val wins = windowHashes(teTexts, "__graft_text", idCol, "__graft_p", 1)
    val te = col("__graft_text")
    val tr = col("__graft_ttext")
    val p = col("__graft_p")
    val q = col("__graft_q")
    val anchored = wins.join(tiles, "__graft_h")
    // idOrdered restricts the train side to STRICTLY SMALLER doc ids —
    // "occurs in an earlier document" — which is the keep-one-canonical
    // dedup form (and subsumes excludeSelf); exactness is untouched
    // because the restriction is per train-doc and the pigeonhole +
    // extension argument is per (train doc, test doc) pair
    val spans0 = (if (idOrdered)
        anchored.filter(col("__graft_tid") < col(idCol))
      else if (excludeSelf)
        anchored.filter(col("__graft_tid") =!= col(idCol))
      else anchored)
      .join(teTexts, idCol)
      .join(trTexts, "__graft_tid")
      // anchor check kills hash collisions; extension arithmetic is on
      // candidate rows only
      .filter(te.substr(p, lit(k)) === tr.substr(q, lit(k)))
      // anchor MINIMALITY: a maximal common run holds one anchor per
      // train tile (~runLen/s of them), every one extending to the
      // SAME span. Keep only the run's first: if the s characters
      // immediately before the anchor match on both sides, the run
      // extends left through them, the s-shifted predecessor
      // (q−s IS a tile: tiles sit at 1+js) is itself a matching
      // hash-join candidate, and ITS extension emits the covering
      // span — so this anchor is redundant. Interior anchors always
      // have their preceding s chars inside the run, so exactly one
      // anchor survives per run (the one a mismatch or text start
      // precedes). Cuts LCP extensions from O(runLen/s) to 1 per run
      // at the cost of one s-char substr comparison per candidate.
      .filter(p - s < 1 || q - s < 1 ||
        te.substr(p - s, lit(s)) =!= tr.substr(q - s, lit(s)))
    // extension: primary path is the native graft_extend kernel — one
    // zero-copy walk left+right over both UTF-8 buffers per anchor
    // (packed (left << 32) | right); the builtin fallback composes four
    // substr copies (two reversed) + two lcp calls — same values, the
    // measured hot stage at ~6× the cost
    val extended =
      if (org.apache.spark.sql.SparkSession.getActiveSession
          .exists(_.catalog.functionExists("graft_extend")))
        spans0
          .withColumn("__graft_ext", call_function("graft_extend",
            te, tr, p.cast("long"), q.cast("long"), lit(k.toLong)))
          .withColumn("__graft_left", shiftright(col("__graft_ext"), 32))
          .withColumn("__graft_right",
            col("__graft_ext").bitwiseAND(lit(0xFFFFFFFFL)))
      else
        spans0
          .withColumn("__graft_left",
            lcp(reverse(te.substr(lit(1), p - 1)),
              reverse(tr.substr(lit(1), q - 1))))
          .withColumn("__graft_right",
            lcp(te.substr(p + k, length(te)), tr.substr(q + k, length(tr))))
    val spans = extended
      .withColumn("__graft_len",
        col("__graft_left") + k + col("__graft_right"))
      .filter(col("__graft_len") >= minLen)
    // spans → disjoint ISLANDS of contaminated window positions,
    // entirely at interval granularity: a verified span covers window
    // starts [sstart, sstart + len − minLen]; dedup spans (the same
    // test span verifies through every train doc sharing it), then
    // gaps-and-islands merge. Everything downstream (position counts,
    // redaction, the windows explode) derives from islands, so no
    // stage ever materializes one row per POSITION on a heavily
    // contaminated corpus until a consumer explicitly asks for them.
    val sp = spans
      .select(col(idCol),
        (p - col("__graft_left")).as("__graft_a"),
        (p - col("__graft_left") + col("__graft_len") - minLen)
          .as("__graft_b"))
      .distinct()
    val byA = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__graft_a"))
    val prevMax = max(col("__graft_b")).over(byA.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    sp
      // adjacent position ranges fuse too: a gap opens only when this
      // span starts at least 2 past everything seen so far
      .withColumn("__graft_new",
        when(prevMax.isNull || col("__graft_a") > prevMax + 1, 1L)
          .otherwise(0L))
      .withColumn("__graft_isl",
        sum(col("__graft_new")).over(byA))
      .groupBy(col(idCol), col("__graft_isl"))
      .agg(min(col("__graft_a")).as("ia"), max(col("__graft_b")).as("ib"))
      .select(col(idCol), col("ia"), col("ib"))
  }

  /** Cut every flagged window out of the documents: merge the (possibly
    * overlapping) `[pos, pos+minLen)` windows into disjoint islands per
    * doc, then splice the surviving gaps back together. Returns ALL
    * rows of `docs` — unflagged documents pass through unchanged with
    * `n_removed = 0`.
    *
    * Scale shape: the island merge is a window over the WINDOWS
    * relation (flagged-positions-sized, not corpus-sized); per doc the
    * islands collapse to one array row (islands ≤ spans, bounded by
    * text length / s), and the splice is pure expression work —
    * `zip_with` over the gap boundaries, one `substr` per island gap,
    * no UDF, no per-character explode. */
  def redactWindows(docs: DataFrame, windows: DataFrame, idCol: String,
      textCol: String, minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minLen >= 1, "minLen must be positive")
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevMaxEnd = max(col("__graft_end")).over(
      byPos.rowsBetween(Window.unboundedPreceding, -1))
    val islands = windows
      .select(col(idCol), col("pos"),
        (col("pos") + minLen).as("__graft_end"))
      // gaps-and-islands: a window starts a new island when it begins
      // at-or-after everything seen so far ends
      .withColumn("__graft_new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("__graft_isl",
        sum(col("__graft_new")).over(byPos))
      .groupBy(col(idCol), col("__graft_isl"))
      .agg(min(col("pos")).as("istart"),
        max(col("__graft_end")).as("iend"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("istart"), col("iend"))))
        .as("__graft_arr"))
    val arr = coalesce(col("__graft_arr"),
      expr("cast(array() as array<struct<istart:bigint,iend:bigint>>)"))
    val gapStarts = concat(array(lit(1L)),
      transform(arr, x => x.getField("iend")))
    val gapEnds = concat(transform(arr, x => x.getField("istart")),
      array(length(col(textCol)).cast("long") + 1))
    docs
      .join(islands, Seq(idCol), "left")
      .select(col(idCol),
        array_join(zip_with(gapStarts, gapEnds,
          (s, e) => col(textCol).substr(s.cast("int"), (e - s).cast("int"))),
          "").as("text_redacted"),
        aggregate(arr, lit(0L),
          (a, x) => a + x.getField("iend") - x.getField("istart"))
          .as("n_removed"))
  }

  private def substringContamination(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int,
      excludeSelf: Boolean): DataFrame =
    // islands are disjoint, so counts/mins are pure interval arithmetic
    contaminationIslands(train, test, idCol, textCol, minLen, excludeSelf)
      .groupBy(col(idCol))
      .agg(sum(col("ib") - col("ia") + 1).cast("long").as("n_spans"),
        min(col("ia")).as("first_pos"))

  /** One row per contaminated window position — `(idCol, pos)`, `pos`
    * 1-based in the test doc: the pre-aggregation form of
    * [[substringContamination]], the relation a redaction pass
    * ([[redactWindows]]) consumes. Derived from the disjoint islands,
    * so the fan-out needs no dedup. */
  def contaminationWindows(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int,
      excludeSelf: Boolean = false, idOrdered: Boolean = false)
      : DataFrame =
    contaminationIslands(train, test, idCol, textCol, minLen, excludeSelf,
        idOrdered)
      .select(col(idCol),
        explode(sequence(col("ia"), col("ib"))).as("pos"))

  /** WITHIN-corpus repeated-substring detection — the training-set
    * analog of decontamination (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): report every
    * document containing a ≥ `minLen`-char substring that also occurs
    * verbatim in a DIFFERENT document of the same corpus, with the
    * count of repeated window positions. Exactly
    * [[substringContamination]] with the corpus on both sides and
    * same-document anchors excluded, so it inherits the stride-tiled
    * index + extension-verify scale shape (the index stays one tile
    * per s characters even though both sides are now corpus-sized —
    * the test-side every-offset shingles are hashed window keys, not
    * materialized text). A curation pass drops or trims the flagged
    * passages before training. */
  def selfSubstringRepeats(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int): DataFrame =
    substringContamination(docs, docs, idCol, textCol, minLen,
      excludeSelf = true)

  /** One row per repeated window position — `(idCol, pos)`, the
    * [[contaminationWindows]] form of [[selfSubstringRepeats]]: the
    * relation a WITHIN-corpus span-removal pass ([[redactWindows]])
    * consumes. Two published removal semantics:
    *
    *  - `keepFirst = false` (drop-all): EVERY occurrence of a
    *    cross-document repeated span flags — the conservative form;
    *  - `keepFirst = true` (keep-one-canonical, the Lee et al. 2022
    *    product semantics): a position flags only when the same window
    *    occurs in a STRICTLY SMALLER doc id, so each duplicated
    *    passage survives exactly once, in its smallest-id document —
    *    an id-ordered anchor restriction on the same machinery. */
  def selfRepeatWindows(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int, keepFirst: Boolean = false)
      : DataFrame =
    contaminationWindows(docs, docs, idCol, textCol, minLen,
      excludeSelf = true, idOrdered = keepFirst)

  /** [[substringContamination]] over [[TextAnalysis.normalize]]d text:
    * case, punctuation, and whitespace variants of a leaked span no
    * longer evade the verbatim check ("The Answer Is  42!" vs "the
    * answer is 42"). Both sides normalize BEFORE tiling/shingling, so
    * the pigeonhole guarantee holds on the canonical forms; the
    * reported `first_pos`/`n_spans` are positions in NORMALIZED
    * coordinates (the canonical text is the artifact downstream
    * redaction should operate on — map back with a per-doc offset
    * index if raw offsets are needed). Same cost shape as the raw
    * form: normalization is pure expression work ahead of the same
    * joins. */
  def substringContaminationNormalized(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame =
    substringContamination(
      train.withColumn(textCol, TextAnalysis.normalize(col(textCol))),
      test.withColumn(textCol, TextAnalysis.normalize(col(textCol))),
      idCol, textCol, minLen)

  /** [[substringContaminationNormalized]] with
    * [[TextAnalysis.foldUnicode]] applied FIRST on both sides: an NFD
    * variant of a leaked span (byte-different, visually identical) no
    * longer evades the gate — without the fold, `normalize` maps the
    * precomposed form's accented character to a space but keeps the
    * decomposed form's base letter, so the two normalize to DIFFERENT
    * canonical text and never tile-match (ExtSpec pins the catch).
    * The fold is a narrow per-row kernel ahead of the identical join
    * machinery — same cost shape. */
  def substringContaminationUnicode(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame =
    substringContaminationNormalized(
      TextAnalysis.normalizeUnicodeLocal(
        train.select(col(idCol), col(textCol)), idCol, textCol),
      TextAnalysis.normalizeUnicodeLocal(
        test.select(col(idCol), col(textCol)), idCol, textCol),
      idCol, textCol, minLen)

  /** TOKEN-BUDGET data mixture — turn "train on W₁ parts source A, W₂
    * parts source B, … up to T tokens total" into a concrete document
    * selection, deterministically. Each source gets the budget
    * `floor(T · wₛ / Σw)`; within a source, documents are taken in the
    * portable md5-rank order (same hash as [[Sampling.md5Top60]], ties
    * by id) until the budget is met — the first document whose
    * cumulative-BEFORE count is still under budget is taken, so every
    * source with enough tokens meets (and minimally overshoots) its
    * budget. Sources not in `weights` (or with non-positive weight)
    * contribute nothing.
    *
    * Determinism contract (same as the Sampling family): the selection
    * depends only on document ids — not partitioning, not engine — and
    * RAISING a source's weight monotonically extends its prefix rather
    * than reshuffling it, so mixture iterations between training runs
    * reuse cached shards.
    *
    * Output: `(idCol, sourceCol, tokensCol, take_rank, cum_tokens)` —
    * `take_rank` the 1-based position in the source's take order,
    * `cum_tokens` the cumulative token count INCLUDING the row.
    *
    * Scale shape: one hash shuffle on `sourceCol` and a per-source
    * ordered window for rank + running sum — the same per-group sort an
    * export shard-writer needs anyway; no driver-side state beyond the
    * weight map itself. A pathologically dominant source (one group ≫
    * others) is the classic window skew: `saltBuckets > 1` routes it
    * through a salted two-level prefix sum — the salt is the HIGH BITS
    * of the same md5 rank key, so each bucket is a contiguous range of
    * the per-source take order, local window work runs on
    * `saltBuckets` partitions per source in parallel, and bucket-level
    * offsets (one tiny aggregate, broadcast back) lift local
    * ranks/sums to exactly the global values — output is IDENTICAL to
    * the plain path on any input. `saltBuckets = 1` (default) is the
    * plain single-window path. */
  def mixtureByTokens(docs: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, weights: Map[String, Double],
      totalTokens: Long, saltBuckets: Int = 1): DataFrame = {
    require(totalTokens > 0, "totalTokens must be positive")
    require(weights.values.exists(_ > 0), "at least one positive weight")
    require(saltBuckets > 0, "saltBuckets must be positive")
    val wSum = weights.values.filter(_ > 0).sum
    // per-source budget as a literal CASE — the weight map is config,
    // not data (a mixture spec names each source explicitly)
    val budget = weights.toSeq.filter(_._2 > 0).sortBy(_._1)
      .foldLeft(lit(0L): Column) { case (acc, (src, w)) =>
        when(col(sourceCol) === src,
          lit(math.floor(totalTokens * w / wSum).toLong)).otherwise(acc)
      }
    val base = docs
      .select(col(idCol), col(sourceCol),
        col(tokensCol).cast("long").as(tokensCol))
      .filter(col(tokensCol).isNotNull && col(tokensCol) > 0 &&
        budget > 0)
    // take while the budget is not yet met BEFORE this row — the
    // crossing document is included
    def takeWhileUnderBudget(df: DataFrame): DataFrame =
      df.filter(col("cum_tokens") - col(tokensCol) < budget)
    if (saltBuckets == 1) {
      val order = org.apache.spark.sql.expressions.Window
        .partitionBy(col(sourceCol))
        .orderBy(Sampling.md5Top60(col(idCol)), col(idCol))
      takeWhileUnderBudget(base
        .withColumn("take_rank", row_number().over(order).cast("long"))
        .withColumn("cum_tokens", sum(col(tokensCol)).over(order)))
    } else {
      import org.apache.spark.sql.expressions.Window
      // ceil(2^60 / buckets) keeps floor(md5 / width) < buckets; the
      // salt is monotone in the md5 rank key, so (salt, md5, id) is
      // the same total order as (md5, id) — contiguity is what makes
      // the two-level lift exact (uneven bucket sizes are fine)
      val width = ((1L << 60) + saltBuckets - 1) / saltBuckets
      val salted = base.withColumn("__graft_salt",
        (Sampling.md5Top60(col(idCol)) / width).cast("long"))
      val localW = Window
        .partitionBy(col(sourceCol), col("__graft_salt"))
        .orderBy(Sampling.md5Top60(col(idCol)), col(idCol))
      val local = salted
        .withColumn("__graft_lrank", row_number().over(localW).cast("long"))
        .withColumn("__graft_lcum", sum(col(tokensCol)).over(localW))
      // bucket totals: saltBuckets rows per source — broadcast-sized
      // whatever the corpus; the prior-buckets window runs on that tiny
      // relation, never the docs
      val priorW = Window.partitionBy(col(sourceCol))
        .orderBy(col("__graft_salt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = salted
        .groupBy(col(sourceCol), col("__graft_salt"))
        .agg(count(lit(1)).as("__graft_bn"),
          sum(col(tokensCol)).as("__graft_btok"))
        .select(col(sourceCol), col("__graft_salt"),
          coalesce(sum(col("__graft_bn")).over(priorW), lit(0L))
            .as("__graft_rankoff"),
          coalesce(sum(col("__graft_btok")).over(priorW), lit(0L))
            .as("__graft_tokoff"))
      takeWhileUnderBudget(local
        .join(broadcast(offsets), Seq(sourceCol, "__graft_salt"))
        .withColumn("take_rank",
          col("__graft_rankoff") + col("__graft_lrank"))
        .withColumn("cum_tokens",
          col("__graft_tokoff") + col("__graft_lcum")))
        .select(col(idCol), col(sourceCol), col(tokensCol),
          col("take_rank"), col("cum_tokens"))
    }
  }

  /** DSIR-style data selection (Xie et al. 2023, Data Selection via
    * Importance Resampling): score every CANDIDATE document by how
    * much more likely its tokens are under the TARGET corpus's unigram
    * LM than under the candidate pool's own LM —
    * `w(d) = Σ_t n_t(d) · (ln p_tgt(t) − ln p_src(t))` — and keep the
    * `k` most target-like. The cheap, principled "give me more data
    * that looks like my high-quality set" primitive.
    *
    * Both LMs are Laplace (+1) smoothed over the candidate vocabulary
    * (every scored term is a candidate term by construction; target
    * terms outside it only contribute to the target total). Each
    * side's per-term ln quantizes to 1e-6-unit longs BEFORE the
    * subtraction and the per-doc sum — the NB replay discipline: doc
    * scores are exact integers, independent of partial-aggregation
    * order, and the (weight desc, id) top-k cut is engine-exact.
    *
    * Scale (100 TB): one candidate token explode feeds both the
    * vocabulary counts (term-keyed, map-side partials absorb
    * stopwords) and the per-doc tf (doc-keyed); the ratio relation is
    * vocabulary-sized and AQE-broadcasts onto the tf; the final cut is
    * a top-k (TakeOrderedAndProject), never a global sort. Target-side
    * cost is one aggregate over the (small) target corpus. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val candTok = docs.filter(!isTarget).select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val srcTf = candTok.groupBy(col("term")).agg(count(lit(1)).as("c_s"))
    val srcTot = srcTf.agg(sum(col("c_s")).as("n_s"),
      count(lit(1)).as("v"))
    val tgtTf = docs.filter(isTarget)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val tgtTot = tgtTf.agg(coalesce(sum(col("c_t")), lit(0L)).as("n_t"))
    val ratios = srcTf
      .join(tgtTf, Seq("term"), "left")
      .crossJoin(broadcast(srcTot))
      .crossJoin(broadcast(tgtTot))
      .select(col("term"),
        (round(log((coalesce(col("c_t"), lit(0L)) + lit(1)).cast("double") /
          (col("n_t") + col("v"))) * 1e6).cast("long") -
         round(log((col("c_s") + lit(1)).cast("double") /
          (col("n_s") + col("v"))) * 1e6).cast("long")).as("ratio_e6"))
    candTok
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("n"))
      .join(ratios, "term")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("ratio_e6")).as("weight_e6"))
      .orderBy(col("weight_e6").desc, col(idCol))
      .limit(k)
  }

  /** TEMPERATURE-scaled mixture (the T5/Gopher "alpha sampling" rule):
    * instead of hand-written weights, each source's weight derives
    * from its own token mass, wₛ ∝ mₛ^α — α = 1 reproduces natural
    * proportions, α → 0 flattens toward uniform, intermediate values
    * (0.3–0.7 in practice) up-weight small high-quality sources
    * without drowning in the dominant web crawl. The rescaled weights
    * feed [[mixtureByTokens]] unchanged, inheriting its determinism
    * and prefix-monotonicity contract.
    *
    * Replay discipline: masses are exact longs (one sum aggregate);
    * the only transcendental is `pow(mₛ/mMax, α)`, computed in
    * RELATIVE form (max source = 1.0) and quantized to 1e-6 units —
    * at that scale a last-ULP `pow` disagreement between engines is
    * ~1e-10 of a unit, so the rounded long weights (and therefore
    * every budget boundary) reproduce exactly.
    *
    * Scale: one map-side-partial tokens-sum per source; the collect is
    * sources-sized (a mixture spec's cardinality — config scale, not
    * data scale). */
  def mixtureByTemperature(docs: DataFrame, idCol: String,
      sourceCol: String, tokensCol: String, alpha: Double,
      totalTokens: Long, saltBuckets: Int = 1): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    val masses = docs
      .filter(col(tokensCol).isNotNull && col(tokensCol) > 0)
      .groupBy(col(sourceCol))
      .agg(sum(col(tokensCol).cast("long")).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(masses.nonEmpty, "no source has positive token mass")
    val mMax = masses.map(_._2).max.toDouble
    val weights = masses.map { case (s, m) =>
      s -> math.round(math.pow(m / mMax, alpha) * 1e6).toDouble
    }.toMap
    mixtureByTokens(docs, idCol, sourceCol, tokensCol, weights,
      totalTokens, saltBuckets)
  }

  /** Mixture-weighted source INTERLEAVING — the deterministic global
    * training ORDER a multi-source corpus feeds the trainer in, the
    * ordering counterpart of [[mixtureByTokens]]'s budgets: weighted
    * fair queueing's virtual finish time `rank_in_source / weight`
    * (stride scheduling) as an exact integer sort key, so a weight-3
    * source contributes three documents for every weight-1 document at
    * ANY prefix of the stream — no round-robin driver loop, no RNG.
    *
    * Shuffle story: one hash shuffle on the source key for the
    * per-source md5 ranking window (per-key windows, the
    * exportShardsEpoch shape); the interleave key is then a pure
    * narrow expression. CONSUMING the order is a range-partitioned
    * sort on `ikey` — the same cost as any total-order write (the
    * z-order layout precedent); this operator only mints the key.
    * Append behavior: a new document splices into its source's md5
    * order, shifting later ABSOLUTE ranks by one — but the RELATIVE
    * order of existing documents within a source never changes, and
    * sources that did not ingest keep every key bit-identical.
    *
    * `ikey = rank·1e9 div weight` — Spark's `div` is INTEGRAL long
    * division (`/` on longs is double division and floor(double) only
    * matches SQL `//` below 2^53), so the key is exact up to the
    * genuine long-overflow bound: per-source ranks of ~9·10^9 before
    * `rank·1e9` wraps — raise to decimal128 if a single source ever
    * exceeds that many documents.
    *
    * @param weights relative integer weights per source; sources
    *                absent from the map are excluded
    * @return (idCol, sourceCol, rank_in_source, ikey) */
  def interleaveBySource(docs: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(Sampling.md5Top60(col(idCol)), col(idCol))
    docs
      .filter(col(sourceCol).isInCollection(weights.keySet))
      .select(col(idCol), col(sourceCol))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .withColumn("__w",
        coalesce(
          org.apache.spark.sql.functions.element_at(
            typedLit(weights), col(sourceCol)), lit(1L)))
      .withColumn("ikey",
        expr("rank_in_source * 1000000000L div __w"))
      .drop("__w")
  }

  /** Length-curriculum staging WITHOUT a global sort: each document
    * gets a curriculum stage 1..`stages` from its token count's
    * position in the corpus's exact length distribution — the
    * short-to-long ordering curriculum-training pipelines feed the
    * trainer, derived scalably. `ntile` over the corpus would funnel
    * every row through one sorted partition; instead the quantile
    * thresholds come from the value-keyed length CENSUS (distinct
    * lengths — a bounded relation at any corpus size) and assignment
    * is a narrow expression against the collected threshold literals
    * (stages−1 values, the broadcast-centroid contract).
    *
    * Threshold j = smallest length whose cumulative census count
    * reaches ⌈j·N/stages⌉ (tested as `cum·stages ≥ j·N` — pure integer
    * arithmetic, no division anywhere); stage = 1 + |{j : n_tokens >
    * t_j}|. Equal lengths always land in the same stage (ties collapse
    * stages rather than splitting a value), so assignment is a pure
    * function of the length — append-stable and engine-replayable.
    *
    * The one window runs over the census relation, not the corpus —
    * the same bounded-merge discipline as `Profile.histogramQuantiles`.
    *
    * @return (idCol, n_tokens, stage) */
  def curriculumByLength(docs: DataFrame, idCol: String, textCol: String,
      stages: Int = 4): DataFrame = {
    require(stages >= 1, "stages must be positive")
    val withLen = docs.select(col(idCol),
      size(filter(split(col(textCol).cast("string"), " ", -1),
        w => w =!= "")).cast("long").as("n_tokens"))
    val census = withLen.groupBy(col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = census.withColumn("cum", sum(col("cnt")).over(w))
    val tot = census.agg(sum(col("cnt")).as("N"))
    val spark = docs.sparkSession
    import spark.implicits._
    val js = (1 until stages).map(_.toLong).toDF("j")
    // thresholds: stages−1 rows via an integer-only quantile test on
    // the census; collected as literals so the corpus-side assignment
    // is a pure narrow projection (zero assignment shuffle)
    val ts =
      if (stages == 1) Array.empty[Long]
      else cum.crossJoin(broadcast(tot)).crossJoin(broadcast(js))
        .filter(col("cum") * lit(stages.toLong) >= col("j") * col("N"))
        .groupBy(col("j")).agg(min(col("n_tokens")).as("t"))
        .orderBy(col("j")).collect().map(_.getLong(1))
    val stage = ts.foldLeft(lit(1L)) { (acc, t) =>
      acc + when(col("n_tokens") > lit(t), lit(1L)).otherwise(lit(0L)) }
    withLen.withColumn("stage", stage)
  }

  /** The WEB capstone's shared composition TAIL from the two
    * crawl-sufficient-statistic relations — factored so the batch
    * composition (`q_pipeline_web`, which computes urls/blocks
    * inline) and the ledger-driven streaming twin
    * (`q_pipeline_web_stream`, which reads them from `urls/batch=*` /
    * `blocks/batch=*` state maintained at ingest) run the IDENTICAL
    * plan and share one oracle.
    *
    * `urls` is `(idCol, url_canon)` (NULL = dead-letter, dropped);
    * `blocks` is the KEPT jusText blocks `(idCol, block_idx,
    * block_text)` — for any superset of the URL-keeper docs (the
    * stream extracts every fetched doc before keeper status is
    * knowable; the keeper join here restricts identically);
    * `docsMeta` supplies `(idCol, source)`. Stages: URL dedup
    * (keeper = min id per canonical) → CCNet paragraph dedup (keeper
    * = min (doc, block) per digest) → per-doc text REASSEMBLY in
    * block order → [[curate]]'s gates/near-dup/split → train slice →
    * [[mixPackExport]]. */
  def webAssembleExport(urls: DataFrame, blocks: DataFrame,
      docsMeta: DataFrame, idCol: String): DataFrame = {
    val keepers = urls.filter(col("url_canon").isNotNull)
      .groupBy(col("url_canon")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val kb = blocks.join(keepers, idCol)
    val pkeep = kb
      .groupBy(md5(col("block_text")).as("dg"))
      .agg(min(col(idCol) * 10000 + col("block_idx")).as("kk"))
    val survb = kb
      .join(pkeep, md5(col("block_text")) === col("dg") &&
        col(idCol) * 10000 + col("block_idx") === col("kk"))
    val web = survb.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("block_idx"),
          col("block_text")))),
        x => x.getField("block_text")), " ").as("text"))
      // two consumers (curate's gate and mixPackExport's text join)
      // — without the pin the whole head (URL dedup, block join,
      // paragraph dedup, reassembly — and in the batch twin the HTML
      // render feeding `blocks`) re-runs per consumer (r16: measured
      // ~2.5 s of q_pipeline_web's 9 s tail). Doc-sized relation;
      // eager pin, freed by the harness sweep.
      .localCheckpoint(true)
    val curated = curate(web, idCol, "text", lang = "en",
      minQuality = 60.0)
    val withSrc = curated.filter(col("split") === "train")
      .select(col(idCol), col("n_tokens"))
      .join(docsMeta.select(col(idCol), col("source")), idCol)
    mixPackExport(withSrc, web.select(col(idCol), col("text")),
      idCol, "text")
  }

  /** Per-source document quota — the CommonCrawl-style per-domain cap:
    * keep at most `cap` documents from each source, preferring high
    * `rankCol` (ties broken by ascending id so the cut is total-order
    * deterministic). A single over-represented domain (a crawler trap,
    * a mirror farm) otherwise dominates the mixture no matter what the
    * downstream sampler does.
    *
    * Scale (100 TB): one shuffle on the source key, then a
    * partition-local rank window — the partition count is the domain
    * count (always ≫ executor count for web data). A single pathological
    * domain's partition is bounded by that domain's docs; for truly
    * degenerate skew (one domain = half the corpus) pre-aggregate with
    * the salted-topk pattern (`Skew.saltedTopK`) instead. */
  def sourceCap(docs: DataFrame, idCol: String, sourceCol: String,
      rankCol: String, cap: Int): DataFrame = {
    require(cap >= 1, "sourceCap: cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col(rankCol).desc, col(idCol))
    docs.withColumn("source_rank", row_number().over(w).cast("long"))
      .filter(col("source_rank") <= cap)
  }

  /** Multi-phrase blocklist scan — the safety/compliance gate: flag
    * every document containing at least one of the (config-sized)
    * banned phrases as a literal case-insensitive substring. Emits one
    * row per flagged doc with the hit count and the alphabetically
    * first matching phrase (deterministic evidence for review queues).
    *
    * Scale (100 TB): with `graft.plans.GraftExtensions` registered the
    * scan is ONE Aho–Corasick automaton pass per document
    * (`graft_blocklist_count`/`_first`, codegen'd, shuffle-free —
    * per-row cost independent of pattern count, which is what a
    * 10⁴-entry production blocklist needs). Sessions without the
    * extension fall back to the compositional BroadcastNestedLoopJoin
    * over codegen'd `instr` (O(len·phrases) per row — fine for
    * config-sized lists), selected once driver-side, mirroring
    * `Bloom.bloomPrunedJoinWith`. Both forms are value-identical
    * (spec-pinned) and share the q_blocklist oracle. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklistHits: empty phrase list")
    require(phrases.forall(_.nonEmpty), "blocklistHits: blank phrase")
    val spark = docs.sparkSession
    if (spark.catalog.functionExists("graft_blocklist_count")) {
      val lt = lower(col(textCol))
      val args = phrases.map(lit)
      docs.select(col(idCol),
          call_function("graft_blocklist_count", lt +: args: _*)
            .as("n_hits"),
          call_function("graft_blocklist_first", lt +: args: _*)
            .as("first_phrase"))
        .filter(col("n_hits") > 0)
    } else blocklistHitsJoin(docs, idCol, textCol, phrases)
  }

  /** The compositional (join) form of [[blocklistHits]] — the fallback
    * without session extensions, and the value-identity witness the
    * spec pins the automaton against. */
  def blocklistHitsJoin(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = broadcast(phrases.toDF("phrase"))
    docs.select(col(idCol), lower(col(textCol)).as("lt"))
      .crossJoin(p)
      .filter(instr(col("lt"), col("phrase")) > 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("phrase")).as("first_phrase"))
  }

  // ── Data augmentation ───────────────────────────────────────────────────

  /** Deterministic word-dropout augmentation census (the EDA-family
    * "random deletion", with the randomness replaced by the repo's
    * md5Top60 discipline): token at 0-based position p of document d
    * is dropped iff `md5bucket("d:p") < dropPct` — a pure function of
    * (doc, position), so the augmented corpus is identical on any
    * engine, any partitioning, and any re-run (the property synthetic
    * training data MUST have, or shuffles change the dataset). Reports
    * the augmented text's md5 rather than the text (byte-exact gate,
    * small output). All-dropped documents report md5("").
    *
    * Scale: one narrow posexplode + one doc-keyed aggregate — no
    * joins, no windows. */
  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    * split each selected document at two deterministic cut points and
    * emit the PSM re-ordering `<fim_pre> prefix <fim_suf> suffix
    * <fim_mid> middle` — the data-side op that teaches infilling to a
    * left-to-right model; applied to `ratePct`% of documents (the
    * paper's ~50% rate), the rest pass through verbatim (fim_applied
    * = 0, the whole doc reported as prefix). Cut points are the
    * portable md5 draws of the Sampling family (`"d:fim1"`/`"d:fim2"`
    * mod length+1, orientation by least/greatest), so the transform —
    * like every augmentation here — depends only on document ids and
    * replays identically on any engine or partitioning. Pure per-row
    * narrow expressions.
    *
    * Output: `(idCol, fim_applied, n_prefix, n_middle, n_suffix,
    * fim_md5)` — the md5 gates the transformed BYTES. */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      ratePct: Int = 50): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100)
    val t = col(textCol).cast("string")
    val len = length(t).cast("long")
    def draw(tag: String): Column = pmod(
      Sampling.md5Top60(concat_ws(":", col(idCol), lit(tag))), len + 1L)
    val lo = least(draw("fim1"), draw("fim2"))
    val hi = greatest(draw("fim1"), draw("fim2"))
    val applied =
      Sampling.hashBucket(concat_ws(":", col(idCol), lit("fim")), 100) <
        ratePct && len > 0
    val transformed = when(applied,
      concat(lit("<fim_pre>"), t.substr(lit(1), lo.cast("int")),
        lit("<fim_suf>"), t.substr((hi + 1).cast("int"), len.cast("int")),
        lit("<fim_mid>"), t.substr((lo + 1).cast("int"),
          (hi - lo).cast("int"))))
      .otherwise(t)
    docs.select(col(idCol),
      applied.cast("long").as("fim_applied"),
      when(applied, lo).otherwise(len).cast("long").as("n_prefix"),
      when(applied, hi - lo).otherwise(0L).cast("long").as("n_middle"),
      when(applied, len - hi).otherwise(0L).cast("long").as("n_suffix"),
      md5(transformed).as("fim_md5"))
  }

  def wordDropout(docs: DataFrame, idCol: String, textCol: String,
      dropPct: Int = 15): DataFrame = {
    require(dropPct >= 0 && dropPct <= 100)
    docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .withColumn("keep",
        Sampling.hashBucket(
          concat(col("id"), lit(":"), col("pos")), 100) >= dropPct)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_orig"),
        count(when(col("keep"), 1)).as("n_kept"),
        md5(array_join(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("token"))))).getField("token"),
          " ")).as("aug_md5"))
  }

  /** Deterministic adjacent-word swap augmentation (EDA's "random
    * swap", restricted to DISJOINT adjacent pairs so draws can never
    * conflict): tokens (2i, 2i+1) swap iff `md5bucket("d:s:i") <
    * swapPct` and the pair is complete. The position remap is
    * `pos xor 1` within a swapped pair — a permutation, so the
    * reassembled text is well-defined and identical on any engine.
    * Same census shape as [[wordDropout]]. */
  def wordSwap(docs: DataFrame, idCol: String, textCol: String,
      swapPct: Int = 30): DataFrame = {
    require(swapPct >= 0 && swapPct <= 100)
    val base = docs.select(col(idCol).cast("long").as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    val nTok = docs.select(col(idCol).cast("long").as("id"),
      (size(split(col(textCol), " ")) - 1).as("max_pos"))
    base.join(nTok, "id")
      .withColumn("pair", expr("pos div 2"))
      .withColumn("swapped",
        Sampling.hashBucket(
          concat(col("id"), lit(":s:"), col("pair")), 100) < swapPct &&
          col("pair") * 2 + 1 <= col("max_pos"))
      .withColumn("new_pos",
        when(col("swapped"), expr("pos ^ 1")).otherwise(col("pos")))
      .groupBy(col("id").as("doc_id"))
      .agg(count(when(col("swapped"), 1)).as("n_swapped_tokens"),
        md5(array_join(
          array_sort(collect_list(struct(col("new_pos"), col("token"))))
            .getField("token"), " ")).as("aug_md5"))
  }

  /** Preference-pair construction for reward-model / DPO-style data:
    * near-duplicate document pairs (SimHash Hamming ≤ maxHamming —
    * same content, different renditions) labeled by the deterministic
    * [[TextAnalysis.qualityScore]]: the higher-quality copy is
    * `chosen`, the lower `rejected`, `margin` the rounded score gap.
    * Rounded-score ties are DROPPED (no deterministic winner — and a
    * zero-margin pair teaches nothing). This is the standard trick for
    * minting preference data from a corpus's own duplication
    * structure: the pair is near-identical in content, so the score
    * gap isolates form quality.
    *
    * Scale: the pair relation is the pigeonhole-bounded SimHash join;
    * quality is a narrow per-row expression joined twice by id. */
  def preferencePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7): DataFrame = {
    val q = docs.select(col(idCol).cast("long").as("id"),
      round(TextAnalysis.qualityScore(col(textCol)), 6).as("q"))
    Dedup.simhashDupPairs(docs, idCol, textCol, maxHamming)
      .join(q.select(col("id").as("id_a"), col("q").as("q_a")), "id_a")
      .join(q.select(col("id").as("id_b"), col("q").as("q_b")), "id_b")
      .filter(col("q_a") =!= col("q_b"))
      .select(
        when(col("q_a") > col("q_b"), col("id_a")).otherwise(col("id_b"))
          .as("chosen_id"),
        when(col("q_a") > col("q_b"), col("id_b")).otherwise(col("id_a"))
          .as("rejected_id"),
        round(abs(col("q_a") - col("q_b")), 6).as("margin"))
  }
}
