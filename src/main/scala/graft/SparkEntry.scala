package graft

import graft.analytics.Habits
import graft.config.{EtlConfig, HabitSpec}
import graft.ext.{Classify, Dedup, History, MediaRecord, Multimodal, Similarity, Skew, TextAnalysis}
import graft.functions.Aggregators
import graft.load.Merge
import graft.streaming.Streaming
import graft.transform.HabitTransform
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or §7.5
  * extension scope) exercised end-to-end on the driver testdata; the
  * paired `oracleSql` is the same computation in DuckDB SQL. Conventions
  * for hash-stable compares:
  *   - every query ends in a deterministic total ORDER BY;
  *   - aggregated doubles are rounded on both sides: 6 dp for small
  *     magnitudes, 2 dp for sums that can reach ~1e9 (engine summation
  *     order disagrees beyond ~15 significant digits, so 6 dp there
  *     flips at larger scale factors), 4 dp for cosine similarities;
  *   - counts/ranks/sizes are cast to BIGINT (DuckDB's int64 defaults);
  *   - timestamps are emitted as timestamp_ntz (UTC wall time), matching
  *     DuckDB's naive TIMESTAMP read of the same parquet.
  */
object SparkEntry {

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")
  private def r6(c: Column): Column = round(c, 6)

  /** DuckDB oracle for the MinHash+LSH pipeline (k=16, bands=4,
    * threshold 0.5 over documents); `extraWhere` narrows the final pair
    * set (used by the incremental variant). */
  private def minhashOracleSql(extraWhere: String): String = {
    val k = 16; val bands = 4; val r = k / bands
    // one md5 per shingle + k affine permutations mod 2^31-1, mirroring
    // Dedup.signatureWide exactly (h and the maps are integer-exact)
    val mins = (0 until k).map(j =>
      s"min((h * ${2 * j + 1} + $j) % 2147483647)::BIGINT AS h$j")
      .mkString(", ")
    val bandCases = (0 until bands).map { b =>
      val slice = (b * r until (b + 1) * r).map(j => s"h$j::VARCHAR")
        .mkString(" || ',' || ")
      s"WHEN $b THEN md5($slice)"
    }.mkString(" ")
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
       shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
              THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                  for i in generate_series(1, len(l) - 2)])
              ELSE [text] END AS ss FROM tok),
       sh AS (SELECT doc_id,
              ('0x' || substr(md5(unnest(ss)), 1, 15))::UBIGINT
                % 2147483647 AS h
            FROM shl),
       sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       band AS (SELECT doc_id, b.b AS band,
              CASE b.b $bandCases END AS band_key
            FROM sig, (SELECT unnest(generate_series(0, ${bands - 1})) AS b) b),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM band a JOIN band b
              ON a.band = b.band AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id),
       jac AS (SELECT id_a, id_b,
              len(list_intersect(x.ss, y.ss))::DOUBLE
                / len(list_distinct(x.ss || y.ss))::DOUBLE AS j
            FROM cand JOIN shl x ON x.doc_id = id_a
                      JOIN shl y ON y.doc_id = id_b)
       SELECT id_a, id_b, round(j, 6) AS jaccard FROM jac
       WHERE round(j, 6) >= 0.5$extraWhere ORDER BY id_a, id_b"""
  }

  /** Exact length-blocked n-gram Jaccard pairs — shared by the
    * q_dedup_ngram check and the q_dedup_recall evaluation (where this
    * relation is the ground truth the LSH pipeline is scored against). */
  private def ngramOracleSql: String =
    """WITH tok AS (SELECT doc_id, n_chars, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, n_chars, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         blk AS (SELECT doc_id, ss,
                unnest([n_chars // 50, n_chars // 50 + 1]) AS block FROM shl),
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.ss, b.ss))::DOUBLE
                  / len(list_distinct(a.ss || b.ss))::DOUBLE AS j
              FROM blk a JOIN blk b
                ON a.block = b.block AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs
         WHERE round(j, 6) >= 0.5 ORDER BY id_a, id_b"""

  /** Unrolled DuckDB replay of [[graft.ext.Bpe.bpeTrain]]'s
    * deterministic merge loop: per merge step k, a pair census over
    * the current segmentation (`c`/`p`), the arg-max under the pinned
    * (n DESC, lhs, rhs) total order (`b`), and the greedy literal
    * replace in the double-space string encoding (`w`) — the exact
    * same encoding the Spark side carries, so cell-exact parity.
    * `AS MATERIALIZED` on each generation for the same reason as
    * [[bpeEncodeOracle]]: every w$k feeds both the next census and the
    * next replace, so CTE inlining would expand the chain 2^m-fold. */
  /** DuckDB replay of [[graft.ext.Multimodal.ppmAHash]] over the
    * `packPpm(width = 16)` payload: the pixel bytes ARE the document's
    * UTF-8 bytes (ASCII corpus ⇒ `ord`/`substr` address them 1:1), so
    * the oracle recomputes the all-integer 8×8 average-hash grid —
    * per-pixel gray `(r+g+b)//3`, per-cell `sum//npx`, grid mean
    * `Σ//64`, bit = cell > mean — from first principles. Emits CTE
    * `ah (doc_id, hi, lo)`: the two unsigned 32-bit halves, the form
    * both engines can build without signed-shift overflow at bit 63. */
  private val ahashChainSql: String =
    """d AS (SELECT doc_id, text, (length(text) // 48)::BIGINT AS h
          FROM documents WHERE length(text) // 48 >= 8),
       cells AS (SELECT doc_id, text, h, ci.ci, cj.cj FROM d,
          (SELECT unnest(generate_series(0, 7)) AS ci) ci,
          (SELECT unnest(generate_series(0, 7)) AS cj) cj),
       ys AS (SELECT doc_id, text, ci, cj,
          unnest(generate_series(ci * h // 8, (ci + 1) * h // 8 - 1)) AS y
          FROM cells),
       xs AS (SELECT doc_id, ci, cj, text, y,
          unnest([cj * 2, cj * 2 + 1]) AS x FROM ys),
       px AS (SELECT doc_id, ci, cj,
          (ord(substr(text, (48 * y + 3 * x + 1)::INT, 1)) +
           ord(substr(text, (48 * y + 3 * x + 2)::INT, 1)) +
           ord(substr(text, (48 * y + 3 * x + 3)::INT, 1))) // 3 AS g
          FROM xs),
       cavg AS (SELECT doc_id, ci, cj, (sum(g) // count(*))::BIGINT AS ca
          FROM px GROUP BY 1, 2, 3),
       gm AS (SELECT doc_id, (sum(ca) // 64)::BIGINT AS m
          FROM cavg GROUP BY 1),
       ah AS (SELECT c.doc_id,
          sum(CASE WHEN ca > m AND 8 * ci + cj >= 32
                THEN 1::BIGINT << (8 * ci + cj - 32) ELSE 0 END)::BIGINT
            AS hi,
          sum(CASE WHEN ca > m AND 8 * ci + cj < 32
                THEN 1::BIGINT << (8 * ci + cj) ELSE 0 END)::BIGINT AS lo
          FROM cavg c JOIN gm USING (doc_id) GROUP BY 1)"""

  /** Audio-hash replay: the WAV data chunk IS the document's bytes, so
    * the oracle recomputes [[graft.ext.Multimodal.wavAHash]]'s
    * all-integer 64-segment grid — segment bounds `[s·n/64,
    * (s+1)·n/64)`, per-segment `sum//count`, grid mean `Σ//64`, bit =
    * segment > mean — straight off the text. Emits CTE `ah (doc_id,
    * hi, lo)`, the same unsigned-halves shape as [[ahashChainSql]];
    * `corpus` names the (doc_id, text) relation to hash. */
  private def wavHashChainSql(corpus: String = "documents"): String =
    s"""d AS (SELECT doc_id, text, length(text)::BIGINT AS n
          FROM $corpus WHERE length(text) >= 64),
       seg AS (SELECT doc_id, text, s.s AS seg,
          (s.s * n) // 64 AS o0, ((s.s + 1) * n) // 64 AS o1
          FROM d, (SELECT unnest(generate_series(0, 63)) AS s) s),
       sm AS (SELECT doc_id, seg,
          (list_sum([ord(substr(text, (o0 + i + 1)::INT, 1))::BIGINT
             for i in generate_series(0, o1 - o0 - 1)])
            // (o1 - o0))::BIGINT AS sa
          FROM seg),
       gm AS (SELECT doc_id, (sum(sa) // 64)::BIGINT AS m
          FROM sm GROUP BY 1),
       ah AS (SELECT c.doc_id,
          sum(CASE WHEN sa > m AND seg >= 32
                THEN 1::BIGINT << (seg - 32)::INT ELSE 0 END)::BIGINT
            AS hi,
          sum(CASE WHEN sa > m AND seg < 32
                THEN 1::BIGINT << seg::INT ELSE 0 END)::BIGINT AS lo
          FROM sm c JOIN gm USING (doc_id) GROUP BY 1)"""

  private def bpeTrainOracle(m: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH words AS (SELECT w, count(*)::BIGINT AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE w <> '' GROUP BY 1),
         w0 AS MATERIALIZED (SELECT
                '  ' || regexp_replace(w, '(.)', '\1  ', 'gs') AS seg,
                cnt FROM words)""")
    for (k <- 1 to m) {
      sb.append(s""",
         c$k AS (SELECT list_filter(string_split(seg, '  '), x -> x <> '') AS s,
                cnt FROM w${k - 1}),
         p$k AS (SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(cnt)::BIGINT AS n
               FROM (SELECT s, cnt,
                      unnest(generate_series(1, len(s) - 1)) AS i
                     FROM c$k WHERE len(s) >= 2)
               GROUP BY 1, 2),
         b$k AS (SELECT lhs, rhs, n FROM p$k ORDER BY n DESC, lhs, rhs LIMIT 1),
         w$k AS MATERIALIZED (SELECT
                replace(seg, ' ' || b.lhs || '  ' || b.rhs || ' ',
                        ' ' || b.lhs || b.rhs || ' ') AS seg, cnt
               FROM w${k - 1}, b$k b)""")
    }
    sb.append("\n         SELECT * FROM (")
    sb.append((1 to m).map(k =>
      s"SELECT ${k}::BIGINT AS step, lhs, rhs, lhs || rhs AS merged, n FROM b$k")
      .mkString("\n         UNION ALL "))
    sb.append(") ORDER BY step")
    sb.toString
  }

  /** Shared unigram-tokenizer vocabulary chain — the DuckDB replay of
    * [[graft.ext.Unigram.unigramSeed]] at the gate's knobs
    * (maxPieceLen 4, vocabSize 40, maxWordLen 16): distinct-word
    * census, substring explode, (cnt DESC, piece) top-40 plus all
    * single characters, integer-quantized log2 costs. Emits CTEs
    * `uwf` (word, freq) and `ucosts` (piece, cnt, cost). */
  private val unigramChainSql: String =
    """uwf AS (SELECT w, count(*)::BIGINT AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE w <> '' GROUP BY 1),
       usub AS (SELECT piece, sum(freq)::BIGINT AS cnt FROM (
          SELECT substr(ws.w, i.i, L.L) AS piece, ws.freq
          FROM (SELECT w, freq FROM uwf WHERE length(w) <= 16) ws,
               (SELECT unnest(generate_series(1, 16)) AS i) i,
               (SELECT unnest(generate_series(1, 4)) AS L) L
          WHERE i.i + L.L - 1 <= length(ws.w)) GROUP BY 1),
       urk AS (SELECT piece, cnt,
              row_number() OVER (ORDER BY cnt DESC, piece) AS r FROM usub),
       uvocab AS (SELECT piece, cnt FROM urk
          WHERE r <= 40 OR length(piece) = 1),
       utot AS (SELECT sum(cnt)::DOUBLE AS t FROM uvocab),
       ucosts AS (SELECT piece, cnt,
              round(1e6 * log2(t / cnt::DOUBLE))::BIGINT AS cost
          FROM uvocab, utot)"""

  /** DuckDB replay of [[graft.ext.Unigram.unigramEncode]]: the packed
    * (cost·64 + pieces) Viterbi as an unrolled Bellman-Ford chain —
    * `uedges` holds every in-vocabulary (start, end) span of every
    * distinct word, `ud0..ud16` relax one more edge per generation
    * (16 = the maxWordLen contract, so the chain covers every
    * all-single-char path), and the final generation's `pos = len(w)`
    * row is the word's minimum. `AS MATERIALIZED` per generation:
    * each ud$k feeds both branches of the next union, and CTE
    * inlining would expand the chain 2^16-fold (the bpeTrainOracle
    * lesson). Over-long words take the unknown path: one piece at
    * `round(1e6·log2(total))`. */
  private def unigramEncodeOracle: String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(unigramChainSql)
    sb.append(""",
       udw AS (SELECT DISTINCT w FROM uwf),
       uedges AS (SELECT d.w, (i.i - 1)::BIGINT AS src,
              (i.i - 1 + L.L)::BIGINT AS dst, c.cost * 64 + 1 AS m
          FROM udw d,
               (SELECT unnest(generate_series(1, 16)) AS i) i,
               (SELECT unnest(generate_series(1, 4)) AS L) L,
               ucosts c
          WHERE length(d.w) <= 16 AND i.i + L.L - 1 <= length(d.w)
            AND substr(d.w, i.i, L.L) = c.piece),
       ud0 AS (SELECT w, 0::BIGINT AS pos, 0::BIGINT AS m
          FROM udw WHERE length(w) <= 16)""")
    for (k <- 1 to 16)
      sb.append(s""",
       ud$k AS MATERIALIZED (SELECT w, pos, min(m)::BIGINT AS m FROM (
          SELECT w, pos, m FROM ud${k - 1}
          UNION ALL
          SELECT e.w, e.dst, d.m + e.m FROM ud${k - 1} d
            JOIN uedges e ON e.w = d.w AND e.src = d.pos) GROUP BY 1, 2)""")
    sb.append(""",
       uwall AS (
          SELECT d.w, (d.m % 64) AS n_pieces, (d.m // 64) AS w_cost
          FROM ud16 d WHERE d.pos = length(d.w)
          UNION ALL
          SELECT w, 1::BIGINT AS n_pieces,
                 (SELECT round(1e6 * log2(t))::BIGINT FROM utot) AS w_cost
          FROM udw WHERE length(w) > 16)
       SELECT t.doc_id, sum(n_pieces)::BIGINT AS n_pieces,
              sum(w_cost)::BIGINT AS total_cost
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) t
       JOIN uwall ON t.w = uwall.w
       WHERE t.w <> ''
       GROUP BY 1 ORDER BY 1""")
    sb.toString
  }

  /** DuckDB replay of [[graft.ext.WordPiece.wordPieceEncode]] under
    * the [[unigramChainSql]] vocabulary: greedy longest-match-first as
    * a 16-generation frontier chain — each live word holds exactly ONE
    * (pos, n) frontier row, and a generation advances it by the
    * longest in-vocabulary piece (`max(dst)` over the edges leaving
    * `pos`). 16 generations cover the worst case (all single-char
    * steps at maxWordLen 16). Over-long words take the whole-word
    * unknown path. A word stuck at a position with no edge would drop
    * from the chain — unreachable here because the vocabulary is
    * seeded from the same corpus and keeps every single character of
    * every in-contract word. */
  private def wordPieceOracle: String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(unigramChainSql)
    sb.append(""",
       wpw AS (SELECT DISTINCT w FROM uwf),
       wpe AS (SELECT d.w, (i.i - 1)::BIGINT AS src,
              (i.i - 1 + L.L)::BIGINT AS dst
          FROM wpw d,
               (SELECT unnest(generate_series(1, 16)) AS i) i,
               (SELECT unnest(generate_series(1, 4)) AS L) L,
               ucosts c
          WHERE length(d.w) <= 16 AND i.i + L.L - 1 <= length(d.w)
            AND substr(d.w, i.i, L.L) = c.piece),
       wp0 AS (SELECT w, 0::BIGINT AS pos, 0::BIGINT AS n
          FROM wpw WHERE length(w) <= 16)""")
    for (k <- 1 to 16)
      sb.append(s""",
       wp$k AS MATERIALIZED (
          SELECT w, pos, n FROM wp${k - 1} WHERE pos >= length(w)
          UNION ALL
          SELECT e.w, max(e.dst) AS pos, d.n + 1 AS n
          FROM wp${k - 1} d JOIN wpe e ON e.w = d.w AND e.src = d.pos
          WHERE d.pos < length(d.w)
          GROUP BY e.w, d.n)""")
    sb.append(""",
       wpall AS (
          SELECT w, n AS n_pieces, 0::BIGINT AS n_unk FROM wp16
          WHERE pos >= length(w)
          UNION ALL
          SELECT w, 1::BIGINT, 1::BIGINT FROM wpw WHERE length(w) > 16)
       SELECT t.doc_id, sum(n_pieces)::BIGINT AS n_pieces,
              sum(n_unk)::BIGINT AS n_unk
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) t
       JOIN wpall ON t.w = wpall.w
       WHERE t.w <> ''
       GROUP BY 1 ORDER BY 1""")
    sb.toString
  }

  /** DuckDB replay of [[graft.ext.Bpe.bpeEncode]] over a merge list
    * trained in the same query: the [[bpeTrainOracle]] stage chain with
    * the word column carried through (so the final generation is a
    * word → segmentation map), then per-word token counts joined back
    * to the exploded corpus. `AS MATERIALIZED` on each generation —
    * every w$k is referenced twice (next census + next replace), and
    * DuckDB's CTE inlining would expand the chain 2^m-fold without it. */
  /** Shared by q_mixture_budget (plain window path) and
    * q_mixture_salted (two-level prefix sum): the selection contract is
    * identical, only the physical plan differs. */
  private val mixtureOracle: String =
    """WITH d AS (SELECT doc_id, source,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM documents
              WHERE source IN ('src0', 'src1', 'src2', 'src3')),
         r AS (SELECT doc_id, source, n_tokens,
                row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                  ::BIGINT AS take_rank,
                sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens,
                CASE source
                  WHEN 'src0' THEN floor(2000 * 3.0 / 5.5)::BIGINT
                  WHEN 'src3' THEN floor(2000 * 0.5 / 5.5)::BIGINT
                  ELSE floor(2000 * 1.0 / 5.5)::BIGINT END AS budget
              FROM d WHERE n_tokens > 0)
         SELECT source, take_rank, doc_id, n_tokens, cum_tokens
         FROM r WHERE cum_tokens - n_tokens < budget
         ORDER BY source, take_rank"""

  /** Brute-force every-window decontamination replay, parameterized by
    * the text expression so the raw and normalized gates share one
    * oracle (the normalized form passes the DuckDB rendering of
    * [[graft.ext.TextAnalysis.normalize]] — note DuckDB's
    * `regexp_replace` needs the explicit `'g'` flag Spark implies). */
  private def substringContaminationOracle(textExpr: String): String =
    s"""WITH b AS (SELECT doc_id, $textExpr AS text,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents),
         tr AS (SELECT text FROM b WHERE bucket < 80),
         tw AS (SELECT DISTINCT w FROM (
                SELECT unnest([substr(text, i, 31)
                    for i in generate_series(1, length(text) - 30)]) AS w
                FROM tr WHERE length(text) >= 31)),
         te AS (SELECT doc_id, text FROM b
              WHERE bucket >= 90 AND length(text) >= 31),
         tew AS (SELECT doc_id,
                unnest([{'i': i, 'w': substr(text, i, 31)}
                    for i in generate_series(1, length(text) - 30)]) AS x
              FROM te)
         SELECT doc_id, count(*)::BIGINT AS n_spans,
                min(x.i)::BIGINT AS first_pos
         FROM tew JOIN tw ON tew.x.w = tw.w
         GROUP BY doc_id ORDER BY doc_id"""

  /** The word-carrying merge chain shared by [[bpeEncodeOracle]],
    * [[bpeEncodeIdsOracle]] and the pipeline oracle: CTEs `words` +
    * `w0..w$m` whose final generation is a word → segmentation map (and
    * `b1..b$m`, the merge pairs). Returned as the interior of a WITH
    * clause; `corpus` names the (doc_id, text) relation to train on. */
  private def bpeWordChainSql(m: Int, corpus: String = "documents"): String = {
    val sb = new StringBuilder
    sb.append(
      raw"""words AS (SELECT w, count(*)::BIGINT AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $corpus)
           WHERE w <> '' GROUP BY 1),
         w0 AS MATERIALIZED (SELECT w,
                '  ' || regexp_replace(w, '(.)', '\1  ', 'gs') AS seg,
                cnt FROM words)""")
    for (k <- 1 to m) {
      sb.append(s""",
         c$k AS (SELECT list_filter(string_split(seg, '  '), x -> x <> '') AS s,
                cnt FROM w${k - 1}),
         p$k AS (SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(cnt)::BIGINT AS n
               FROM (SELECT s, cnt,
                      unnest(generate_series(1, len(s) - 1)) AS i
                     FROM c$k WHERE len(s) >= 2)
               GROUP BY 1, 2),
         b$k AS (SELECT lhs, rhs FROM p$k ORDER BY n DESC, lhs, rhs LIMIT 1),
         w$k AS MATERIALIZED (SELECT w,
                replace(seg, ' ' || b.lhs || '  ' || b.rhs || ' ',
                        ' ' || b.lhs || b.rhs || ' ') AS seg, cnt
               FROM w${k - 1}, b$k b)""")
    }
    sb.toString
  }

  private def bpeEncodeOracle(m: Int): String =
    s"""WITH ${bpeWordChainSql(m)},
         tok AS (SELECT w,
                len(list_filter(string_split(seg, '  '), x -> x <> ''))::BIGINT
                  AS t
               FROM w$m),
         dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents)
         SELECT doc_id, count(*)::BIGINT AS n_words,
                sum(t)::BIGINT AS n_bpe_tokens
         FROM dw JOIN tok USING (w) WHERE w <> ''
         GROUP BY doc_id ORDER BY doc_id"""

  /** DuckDB replay of [[graft.ext.Bpe.bpeEncodeIds]]: the same trained
    * chain, then the deterministic vocabulary (sorted corpus alphabet
    * ids `0..B-1`, merge step `k` mints id `B+k-1`, first id wins on a
    * string collision — `min(id)` after the union, since base ids are
    * all below minted ids and earlier mints below later) and the
    * per-word → per-document id-sequence assembly, compared as the
    * space-joined string form. */
  /** CTE interior `words..fl` where `fl` is (doc_id, tids: list<int>)
    * — the full vocabulary + per-document id assembly, shared by
    * [[bpeEncodeIdsOracle]] and the token-shard export oracle. */
  private def bpeIdsChainSql(m: Int): String = {
    val mergeUnion = (1 to m)
      .map(k => s"SELECT $k AS step, lhs, rhs FROM b$k")
      .mkString("\n               UNION ALL ")
    s"""${bpeWordChainSql(m)},
         syms AS (SELECT w, list_filter(string_split(seg, '  '), x -> x <> '')
                  AS s FROM w$m),
         alpha AS (SELECT DISTINCT unnest(string_split(w, '')) AS sym
               FROM words),
         base AS (SELECT sym,
                (row_number() OVER (ORDER BY sym) - 1)::INT AS id FROM alpha),
         minted AS (SELECT lhs || rhs AS sym,
                ((SELECT count(*) FROM base) + step - 1)::INT AS id
               FROM ($mergeUnion)),
         vocab AS (SELECT sym, min(id)::INT AS id
               FROM (SELECT sym, id FROM base
                     UNION ALL SELECT sym, id FROM minted) GROUP BY 1),
         wsym AS (SELECT w, pos, s[pos] AS sym
               FROM (SELECT w, s, unnest(generate_series(1, len(s))) AS pos
                     FROM syms)),
         wids AS (SELECT w, list(v.id ORDER BY pos) AS ids
               FROM wsym JOIN vocab v USING (sym) GROUP BY w),
         dw AS (SELECT doc_id, pos, ws[pos] AS w
               FROM (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws))) AS pos
                     FROM (SELECT doc_id,
                            list_filter(string_split(text, ' '), x -> x <> '')
                              AS ws
                           FROM documents))),
         fl AS (SELECT doc_id, flatten(list(ids ORDER BY pos)) AS tids
               FROM dw JOIN wids USING (w) GROUP BY doc_id)"""
  }

  /** Unrolled-CTE replay of [[graft.ext.Classify.logRegFit]] +
    * `logRegScore`: iteration t derives the four quantized gradient
    * longs under weights w(t−1), then weights w(t) by the identical
    * IEEE expression chain the Scala loop uses — exact longs between
    * iterations make the whole unroll engine-exact. */
  /** The CTE chain (through `w<iters>`) plus the margin expression —
    * shared by the standalone probe oracle and the probe-gated export
    * composition. */
  private def logRegChainSql(iters: Int): (String, String) = {
    def gsum(f: String, alias: String) =
      s"sum(CAST(round(((0.5 + z / (2.0 * (1.0 + abs(z)))) - y) * $f" +
        s" * 1048576.0) AS BIGINT)) AS $alias"
    val steps = (1 to iters).map { t =>
      s"""g$t AS (SELECT ${gsum("1.0", "g0")}, ${gsum("f1", "g1")},
                ${gsum("f2", "g2")}, ${gsum("f3", "g3")}
              FROM (SELECT f.y, f.f1, f.f2, f.f3,
                      w.w0 + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3 AS z
                    FROM f CROSS JOIN w${t - 1} w)),
         w$t AS (SELECT ${(0 to 3).map(j =>
                  s"w.w$j - 0.5 * ((CAST(g.g$j AS DOUBLE) / 1048576.0)" +
                    s" / n.n) AS w$j").mkString(", ")}
              FROM w${t - 1} w CROSS JOIN g$t g CROSS JOIN n)"""
    }
    val chain =
      s"""f AS (SELECT doc_id,
              CASE WHEN n_chars >= 306 THEN 1.0 ELSE 0.0 END AS y,
              (CAST(len(string_split(text, ' ')) AS DOUBLE) - 56.0)
                / 32.0 AS f1,
              (CAST(n_chars AS DOUBLE) - 306.0) / 128.0 AS f2,
              CAST(n_chars AS DOUBLE)
                / CAST(len(string_split(text, ' ')) AS DOUBLE) - 5.5 AS f3
            FROM documents),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
         w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         ${steps.mkString(",\n         ")}"""
    (chain, "w.w0 + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3")
  }

  private def logRegOracle(iters: Int): String = {
    val (chain, m) = logRegChainSql(iters)
    s"""WITH $chain
         SELECT f.doc_id, CAST(f.y AS INT) AS y,
                CAST(round(($m) * 1000000.0) AS BIGINT) AS margin_e6,
                CASE WHEN CAST(round(($m) * 1000000.0) AS BIGINT) > 0
                  THEN 1 ELSE 0 END AS pred
         FROM f CROSS JOIN w$iters w ORDER BY f.doc_id"""
  }

  /** Probe-gated export replay: the probe chain selects the positive
    * margins, the export ranking shards the survivors. */
  private def probeGatedExportOracle(iters: Int): String = {
    val (chain, m) = logRegChainSql(iters)
    s"""WITH $chain,
         kept AS (SELECT f.doc_id FROM f CROSS JOIN w$iters w
              WHERE CAST(round(($m) * 1000000.0) AS BIGINT) > 0),
         b AS (SELECT doc_id,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
            FROM kept)
         SELECT (h % 4)::BIGINT AS shard,
              row_number() OVER (PARTITION BY h % 4 ORDER BY h, doc_id)
                ::BIGINT AS shard_pos,
              doc_id
         FROM b ORDER BY shard, shard_pos"""
  }

  private def bpeEncodeIdsOracle(m: Int): String =
    s"""WITH ${bpeIdsChainSql(m)}
         SELECT doc_id, array_to_string(tids, ' ') AS token_ids,
                len(tids)::BIGINT AS n_tokens
         FROM fl ORDER BY doc_id"""

  /** Token-shard export replay: the id chain, then the concat-packing
    * spans in closed form (the doc occupies a contiguous interval
    * [s, e) of its shard stream, so each bin's piece of its id list is
    * a pure slice — no window over positions), and the per-bin stream
    * digest. */
  private def exportTokenShardsOracle(m: Int, eod: Boolean = false): String = {
    // the EOD id is the next free vocabulary id — vocab sizes agree
    // across engines even under minted-string collisions (both count
    // distinct SYMBOLS; only the unused ids differ)
    val (nExpr, tidsExpr) =
      if (eod) ("len(tids)::BIGINT + 1",
        "tids || [(SELECT count(*) FROM vocab)::INT]")
      else ("len(tids)::BIGINT", "tids")
    s"""WITH ${bpeIdsChainSql(m)},
         pk AS (SELECT doc_id, doc_id % 4 AS shard,
                $nExpr AS n, $tidsExpr AS tids FROM fl
              WHERE len(tids) > 0),
         pc AS (SELECT doc_id, shard, n, tids,
                sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                  AS e
              FROM pk),
         spans AS (SELECT doc_id, shard, tids, e - n AS s, e,
                unnest(generate_series((e - n) // 512,
                                       (e - 1) // 512)) AS bin
              FROM pc),
         sl AS (SELECT doc_id, shard, bin,
                greatest(s, bin * 512) - bin * 512 AS start_in_bin,
                least(e, (bin + 1) * 512) - greatest(s, bin * 512)
                  AS tok_in_bin,
                tids[(greatest(s, bin * 512) - s + 1)
                     : (least(e, (bin + 1) * 512) - s)] AS piece
              FROM spans)
         SELECT shard::BIGINT AS shard, bin::BIGINT AS bin,
                count(*)::BIGINT AS n_docs,
                sum(tok_in_bin)::BIGINT AS bin_tokens,
                md5(array_to_string(
                  flatten(list(piece ORDER BY start_in_bin)), ' '))
                  AS ids_md5
         FROM sl GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** DuckDB replay of [[graft.ext.Similarity]]'s farthest-point
    * seeding ([[graft.ext.Similarity.farthestSeedVecs]]) over the int8
    * code relation `q`/`pts`: the candidate pool is the
    * [[graft.ext.Similarity.seedSampleSize]] md5-rank-smallest ids
    * (the identical sample the Spark side collects in its ONE seeding
    * job); seed 0 is the sample's md5-rank minimum; each stage `sn{j}`
    * picks the not-yet-picked candidate with the largest min-distance
    * to the picked set (ties by id) — integer-exact, so the sequence
    * is identical to the Spark side's driver-local pass. Emits CTE
    * text ending in `seed (vec_id, cluster)`, spliced into the
    * q_kmeans oracle ahead of the unrolled Lloyd stages. */
  private def kmeansSeedSql(k: Int): String =
    s"""cand AS MATERIALIZED (SELECT vec_id FROM q
              ORDER BY md5(vec_id::VARCHAR), vec_id
              LIMIT ${graft.ext.Similarity.seedSampleSize(k)}),
         """ + seedChainSql(k, "pts", "")

  /** The farthest-point stage chain itself, parameterized so the PQ
    * oracle can emit one chain PER SUBSPACE (`pts` = that subspace's
    * point relation, `sfx` appended to every CTE name) over the ONE
    * shared `cand` sample — mirroring the Spark side, whose subspace
    * seeders slice the same collected sample. Ends in
    * `seed$sfx (vec_id, cluster)`. */
  private def seedChainSql(k: Int, pts: String, sfx: String): String = {
    // every sp{j} is referenced three times downstream (the distance
    // join, the NOT IN guard, and sp{j+1}'s union) — AS MATERIALIZED
    // stops DuckDB's CTE inlining from expanding the chain
    // exponentially (3^k scans of the parquet source without it)
    val sb = new StringBuilder
    sb.append(
      s"""cpts$sfx AS MATERIALIZED (SELECT p.vec_id, p.dim, p.x
              FROM $pts p JOIN cand USING (vec_id)),
         sp0$sfx AS MATERIALIZED (SELECT vec_id, 0 AS cluster FROM (
              SELECT vec_id FROM cand
              ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 1))""")
    for (j <- 1 until k) {
      sb.append(s""",
         se$j$sfx AS MATERIALIZED (SELECT p.vec_id, b.vec_id AS sv,
                sum((p.x - b.x) * (p.x - b.x)) AS dd
              FROM cpts$sfx p JOIN cpts$sfx b ON p.dim = b.dim
              JOIN sp${j - 1}$sfx s ON b.vec_id = s.vec_id
              GROUP BY p.vec_id, b.vec_id),
         sn$j$sfx AS MATERIALIZED (SELECT vec_id FROM (
                SELECT vec_id, min(dd) AS md FROM se$j$sfx GROUP BY vec_id)
              WHERE vec_id NOT IN (SELECT vec_id FROM sp${j - 1}$sfx)
              ORDER BY md DESC, vec_id LIMIT 1),
         sp$j$sfx AS MATERIALIZED (SELECT vec_id, cluster FROM sp${j - 1}$sfx
              UNION ALL SELECT vec_id, $j AS cluster FROM sn$j$sfx)""")
    }
    sb.append(s""",
         seed$sfx AS MATERIALIZED (SELECT vec_id, cluster::INTEGER AS cluster
              FROM sp${k - 1}$sfx)""")
    sb.toString
  }

  /** Full integer k-means replay as a CTE chain: global-scale int8
    * quantization (`g`/`q`/`pts`), farthest-point seeds
    * ([[kmeansSeedSql]]), `iterations` generated Lloyd rounds (assign
    * a_i → floor-div means m_i → coalesce-carry centroids c_i), ending
    * in the final assignment CTE `afin (vec_id, cluster)`. Every step
    * is integer or correctly-rounded-double arithmetic, so the replay
    * is cell-exact against `Similarity.kmeansFitInt8` — shared by the
    * q_kmeans purity rollup and the q_dedup_semantic within-cell pair
    * scan. `a_i`/`c_i` are MATERIALIZED: each is referenced twice
    * downstream, so plain CTE inlining would re-expand the whole
    * prefix 2^iterations times (the bpeTrainOracle lesson). */
  /** GLOBAL-scale int8 quantization of the embeddings table as CTEs
    * `g`/`q` (codes as a list) /`pts` (exploded (vec_id, dim, x)) —
    * the shared front of every integer-trainer replay. */
  private val int8PtsSql: String =
    """WITH g AS (SELECT max(list_max(list_transform(embedding,
                x -> abs(x::DOUBLE)))) AS gma
              FROM embeddings WHERE embedding IS NOT NULL),
         q AS (SELECT vec_id, label,
                CASE WHEN gma = 0
                  THEN list_transform(embedding, x -> 0::BIGINT)
                  ELSE list_transform(embedding,
                    x -> floor(x::DOUBLE / gma * 127 + 0.5)::BIGINT)
                END AS v
              FROM embeddings, g WHERE embedding IS NOT NULL),
         pts AS MATERIALIZED (SELECT vec_id, u.dim AS dim, u.x AS x FROM (
                SELECT vec_id, unnest(list_transform(v,
                  (x, i) -> {'dim': i - 1, 'x': x})) AS u FROM q)),
         """

  private def kmeansAssignSql(k: Int, iterations: Int): String =
    int8PtsSql + kmeansSeedSql(k) + "," +
      lloydChainSql(iterations, "pts", "")

  /** Full PQ replay ([[graft.ext.Similarity.pqTrainInt8]]): the shared
    * int8 `pts` and ONE md5-rank `cand` sample, then PER SUBSPACE a
    * dim-local point relation `pts_s{s}`, the farthest-point seed chain
    * and the Lloyd rounds (suffix `_s{s}`), ending in assignment
    * `afin_s{s}`. The tail assembles `codes (vec_id, sub, cluster)`,
    * the final codebook `cb (sub, cluster, dim, c)` and the
    * reconstruction `recon (vec_id, dim, c)` — integer-exact
    * cell-for-cell against the Spark trainer, shared by the q_pq_encode
    * and q_knn_pq oracles. */
  private def pqChainSql(m: Int, kSub: Int, iterations: Int,
      dsub: Int): String =
    int8PtsSql +
      s"""cand AS MATERIALIZED (SELECT vec_id FROM q
              ORDER BY md5(vec_id::VARCHAR), vec_id
              LIMIT ${graft.ext.Similarity.seedSampleSize(kSub)})""" +
      pqSubspacesSql(m, kSub, iterations, dsub, "pts")

  /** The per-subspace PQ chains over point source `src` — `pts` for
    * plain PQ, the coarse-residual relation for IVF+PQ — ending in
    * `codes (vec_id, sub, cluster)`, the final codebook
    * `cb (sub, cluster, dim, c)`, and the reconstruction
    * `recon (vec_id, dim, c)` in `src`'s coordinate system. Expects the
    * shared `cand` sample upstream. */
  private def pqSubspacesSql(m: Int, kSub: Int, iterations: Int,
      dsub: Int, src: String): String = {
    val sb = new StringBuilder
    for (s <- 0 until m) {
      sb.append(s""",
         pts_s$s AS MATERIALIZED (SELECT vec_id, dim - ${s * dsub} AS dim, x
              FROM $src WHERE dim >= ${s * dsub} AND dim < ${(s + 1) * dsub}),
         """)
      sb.append(seedChainSql(kSub, s"pts_s$s", s"_s$s"))
      sb.append(",")
      sb.append(lloydChainSql(iterations, s"pts_s$s", s"_s$s"))
    }
    val codesUnion = (0 until m).map(s =>
      s"SELECT vec_id, $s AS sub, cluster FROM afin_s$s")
      .mkString("\n              UNION ALL ")
    val cbUnion = (0 until m).map(s =>
      s"SELECT $s AS sub, cluster, dim, c FROM c${iterations}_s$s")
      .mkString("\n              UNION ALL ")
    sb.append(s""",
         codes AS MATERIALIZED ($codesUnion),
         cb AS MATERIALIZED ($cbUnion),
         recon AS MATERIALIZED (SELECT co.vec_id,
                co.sub * $dsub + cb.dim AS dim, cb.c
              FROM codes co JOIN cb
                ON cb.sub = co.sub AND cb.cluster = co.cluster)""")
    sb.toString
  }

  /** Full IVF+PQ replay ([[graft.ext.Similarity.knnIvfPq]]): coarse
    * integer k-means over `pts` (suffix `_c`), the residual relation
    * `res = pts − C[cell]`, then the per-subspace PQ chains over `res`.
    * One `cand` sample serves both trainers — the Spark side samples by
    * md5(id) on both relations, which is the same id set; the LIMIT
    * must therefore agree, hence the `require`. */
  private def ivfPqChainSql(nCells: Int, m: Int, kSub: Int,
      iterations: Int, dsub: Int): String = {
    require(graft.ext.Similarity.seedSampleSize(nCells) ==
      graft.ext.Similarity.seedSampleSize(kSub),
      "coarse and PQ samples must coincide for the shared cand CTE")
    int8PtsSql +
      s"""cand AS MATERIALIZED (SELECT vec_id FROM q
              ORDER BY md5(vec_id::VARCHAR), vec_id
              LIMIT ${graft.ext.Similarity.seedSampleSize(kSub)}),
         """ +
      seedChainSql(nCells, "pts", "_c") + "," +
      lloydChainSql(iterations, "pts", "_c") + s""",
         cells AS MATERIALIZED (SELECT vec_id, cluster AS cell
              FROM afin_c),
         res AS MATERIALIZED (SELECT p.vec_id, p.dim, p.x - cc.c AS x
              FROM pts p JOIN cells a ON a.vec_id = p.vec_id
              JOIN c${iterations}_c cc
                ON cc.cluster = a.cell AND cc.dim = p.dim)""" +
      pqSubspacesSql(m, kSub, iterations, dsub, "res")
  }

  /** The Lloyd rounds themselves (assign a_i → floor-div means m_i →
    * coalesce-carry centroids c_i → `afin$sfx`), parameterized like
    * [[seedChainSql]] so the PQ oracle replays one chain per subspace.
    * Expects `seed$sfx` upstream. `a_i`/`c_i` are MATERIALIZED: each is
    * referenced twice downstream, so plain CTE inlining would re-expand
    * the whole prefix 2^iterations times (the bpeTrainOracle lesson). */
  private def lloydChainSql(iterations: Int, pts: String,
      sfx: String): String = {
    val sb = new StringBuilder
    sb.append(s"""
         c0$sfx AS MATERIALIZED (SELECT s.cluster, p.dim, p.x AS c
              FROM seed$sfx s JOIN $pts p ON p.vec_id = s.vec_id)""")
    def assign(name: String, cent: String): String = s""",
         $name AS MATERIALIZED (SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM (SELECT p.vec_id, c.cluster,
                        sum((p.x - c.c) * (p.x - c.c)) AS d2
                      FROM $pts p JOIN $cent c ON p.dim = c.dim
                      GROUP BY p.vec_id, c.cluster)) WHERE rn = 1)"""
    for (i <- 1 to iterations) {
      sb.append(assign(s"a$i$sfx", s"c${i - 1}$sfx"))
      sb.append(s""",
         m$i$sfx AS (SELECT a.cluster, p.dim,
                floor(sum(p.x)::DOUBLE / count(*))::BIGINT AS mm
              FROM a$i$sfx a JOIN $pts p ON a.vec_id = p.vec_id
              GROUP BY a.cluster, p.dim),
         c$i$sfx AS MATERIALIZED (SELECT c${i - 1}$sfx.cluster,
                c${i - 1}$sfx.dim, coalesce(m$i$sfx.mm, c${i - 1}$sfx.c) AS c
              FROM c${i - 1}$sfx LEFT JOIN m$i$sfx
                ON m$i$sfx.cluster = c${i - 1}$sfx.cluster
                AND m$i$sfx.dim = c${i - 1}$sfx.dim)""")
    }
    sb.append(assign(s"afin$sfx", s"c$iterations$sfx"))
    sb.toString
  }

  /** 3-habit config used by the fixture-driven transform queries
    * (mirrors the reference unit-test config,
    * `/root/reference/tests/test_transform.py:3-13`). */
  private val cfg3 = EtlConfig(
    habits = Seq(
      "Workout" -> HabitSpec("workout", "bool"),
      "Meditation (Number of Minutes)" ->
        HabitSpec("meditation_minutes", "number"),
      "Mood" -> HabitSpec("mood_score", "number")),
    notesColumns = Seq("Notes"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_habit_daily")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Reference parity: analytics surface (SURVEY §2.5-2.6) ──────────
    // Ingest-completeness audit: gaps in the event_id sequence per
    // user (lost or unlanded rows in a replicated feed). One user-
    // keyed shuffle; lag rides the same sort as any per-user window.
    // Synthetic gaps: ids ≡ 4 (mod 9) are dropped first, so the audit
    // has a non-empty closed-form answer at every scale factor.
    "q_id_gaps" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
        .filter(col("event_id") % 9 =!= 4)
        .select(col("user_id"), col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      ev.withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .filter(col("prev_id").isNotNull &&
          col("event_id") - col("prev_id") > 1)
        .select(col("user_id"), col("prev_id").as("gap_after"),
          col("event_id").as("resume_at"),
          (col("event_id") - col("prev_id") - 1).as("missing"))
        .orderBy(col("user_id"), col("gap_after"))
    }),

    "q_recent_events" -> ((s, dir) =>
      Habits.recentEvents(Tables.eventsAsHabits(s, dir), 50, Seq(col("event_id")))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          col("habit"), col("value"))),

    "q_distinct_users" -> ((s, dir) =>
      Habits.distinctValues(Tables.eventsAsHabits(s, dir), "user_email")),

    "q_distinct_habits" -> ((s, dir) =>
      Habits.distinctValues(Tables.eventsAsHabits(s, dir), "habit")),

    "q_habit_daily" -> ((s, dir) =>
      Habits.habitDaily(Tables.eventsAsHabits(s, dir), sumHabit = "purchase")
        .select(ntz(col("day")).as("day"), col("user_email"), col("habit"),
          col("count_done"), r6(col("avg_value")).as("avg_value"),
          r6(col("sum_meditation")).as("sum_meditation"))
        .orderBy(col("day"), col("user_email"), col("habit"))),

    // Incremental matview refresh (batch form of the reference's
    // continuous-aggregate policy): rollup state from 80% of events
    // merged with the remaining 20%'s state must equal the one-shot
    // rollup — which is exactly what the shared q_habit_daily oracle
    // proves.
    "q_habit_daily_incremental" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val stored = Habits.habitDailyState(
        ev.filter(col("event_id") % 5 < 4), sumHabit = "purchase")
      val increment = Habits.habitDailyState(
        ev.filter(col("event_id") % 5 >= 4), sumHabit = "purchase")
      Habits.finishDaily(Habits.mergeDailyState(stored, increment))
        .select(ntz(col("day")).as("day"), col("user_email"), col("habit"),
          col("count_done"), r6(col("avg_value")).as("avg_value"),
          r6(col("sum_meditation")).as("sum_meditation"))
        .orderBy(col("day"), col("user_email"), col("habit"))
    }),

    "q_value_by_day" -> ((s, dir) =>
      Habits.valueByDay(Tables.eventsAsHabits(s, dir), lit(7L), "purchase",
          to_timestamp(lit("2024-01-05 00:00:00")),
          to_timestamp(lit("2024-01-25 00:00:00")))
        .select(ntz(col("day")).as("day"), r6(col("minutes")).as("minutes"))),

    // HOPPING (sliding) time window — the overlapping form between the
    // tumbling day rollup and session windows: 2-day windows advancing
    // 1 day, so every event lands in exactly two windows. Same
    // hash-agg + map-side-partial shape as the tumbling rollup; the
    // window fan-out is the duration/slide ratio (2 here), a bounded
    // narrow explode before the aggregate.
    "q_hopping_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), r6(sum(col("value"))).as("sum_value"))
        .select(ntz(col("w.start")).as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    "q_completion_pct" -> ((s, dir) =>
      Habits.completionPct(Tables.eventsAsHabits(s, dir), lit(7L),
          Seq("click", "view"),
          to_timestamp(lit("2024-01-01 00:00:00")),
          to_timestamp(lit("2024-01-25 00:00:00")))
        .select(col("habit"), r6(col("pct_done")).as("pct_done"))),

    // SCD2 intervals over each (user, habit)'s daily-total change stream:
    // consecutive equal totals merge, each surviving row carries its
    // validity window (valid_to NULL while current).
    "q_scd2" -> ((s, dir) => {
      val daily = Tables.eventsAsHabits(s, dir)
        .groupBy(col("user_email"), col("habit"),
          Habits.dayBucket(col("ts")).as("day"))
        .agg(round(sum(col("value")), 6).as("day_total"))
      History.scd2(daily, Seq("user_email", "habit"), "day", "day_total")
        .select(col("user_email"), col("habit"),
          ntz(col("valid_from")).as("valid_from"),
          ntz(col("valid_to")).as("valid_to"), col("day_total"))
        .orderBy(col("user_email"), col("habit"), col("valid_from"))
    }),

    // Point-in-time temporal join: every raw event picks the SCD2
    // dimension version valid AT ITS OWN TIMESTAMP (key equality +
    // interval containment). A key's intervals tile [first, inf), so
    // each event matches exactly one version — the aggregate proves
    // both the routing and the no-duplication contract.
    "q_temporal_join" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val daily = ev
        .groupBy(col("user_email"), col("habit"),
          Habits.dayBucket(col("ts")).as("day"))
        .agg(round(sum(col("value")), 6).as("day_total"))
      val dim = History.scd2(daily, Seq("user_email", "habit"), "day",
        "day_total")
      History.temporalJoin(
          ev.select(col("user_email"), col("habit"), col("ts"),
            col("value")),
          dim, Seq("user_email", "habit"), "ts")
        .groupBy(col("user_email"), col("habit"), col("valid_from"))
        .agg(count(lit(1)).as("n_events"),
          r6(sum(col("value"))).as("sum_value"),
          r6(max(col("day_total"))).as("day_total"))
        .select(col("user_email"), col("habit"),
          ntz(col("valid_from")).as("valid_from"), col("n_events"),
          col("sum_value"), col("day_total"))
        .orderBy(col("user_email"), col("habit"), col("valid_from"))
    }),

    // Typed UDAF (Aggregator) under the oracle gate: per-habit geometric
    // mean of positive values via sum-of-logs partial aggregation.
    "q_geomean" -> ((s, dir) => {
      val geoMean = udaf(Aggregators.GeoMean)
      Tables.eventsAsHabits(s, dir)
        .filter(col("value") > 0)
        .groupBy(col("habit"))
        .agg(r6(geoMean(col("value"))).as("geo_mean"),
          count(lit(1)).as("n_pos"))
        .orderBy(col("habit"))
    }),

    // Skew utilities under the gate: salting must be result-identical to
    // the unsalted form — exactly what the oracle compare proves.
    "q_salted_distinct" -> ((s, dir) =>
      Skew.saltedCountDistinct(Tables.eventsAsHabits(s, dir),
          "habit", "user_email", salts = 8)
        .orderBy(col("habit"))),

    "q_salted_topk" -> ((s, dir) =>
      Skew.saltedTopK(
          Tables.eventsAsHabits(s, dir)
            .select(col("habit"), col("event_id"), col("value")),
          "habit", Seq(col("value").desc, col("event_id")), k = 5, salts = 8)
        .orderBy(col("habit"), col("value").desc, col("event_id"))),

    // Salted fact⋈dim join on a 5-value (maximally skewed) key: the
    // small side replicates salts×, the hot key spreads over 8 reducer
    // partitions, and the oracle proves result identity with the plain
    // join (exactly the contract salting must keep).
    "q_salted_join" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
        .select(col("habit"), col("value"))
      val dim = ev.groupBy(col("habit"))
        .agg(r6(avg(col("value"))).as("habit_avg"))
      Skew.saltedJoin(ev, dim, "habit", salts = 8)
        .groupBy(col("habit"))
        // per-row |value − avg| is the same IEEE double in both engines,
        // so rounding EACH ROW to an e4-scaled long before summing makes
        // the aggregate order-independent and engine-exact at any SF
        // (the q_bucket_join revenue_e4 pattern) — unlike rounding a
        // summation-order-dependent double sum after the fact
        .agg(count(lit(1)).as("n"), r6(max(col("habit_avg"))).as("habit_avg"),
          sum(round(abs(col("value") - col("habit_avg")) * 10000)
            .cast("long")).as("dev_abs_e4"))
        .orderBy(col("habit"))
    }),

    // Same sessionization through Spark's BUILT-IN session_window
    // merge (dynamic-gap windows the aggregation engine coalesces)
    // instead of the gaps-and-islands lag/sum — two implementations,
    // one oracle. Boundary note: session_window opens a new session at
    // gap ≥ 30 min where the window form uses > 30 min; the synthetic
    // microsecond timestamps never land exactly on the boundary, and
    // the shared oracle would catch it if they ever did.
    "q_session_window" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .groupBy(col("user_email"),
          session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_email"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
        .orderBy(col("user_email"))),

    "q_sessionize" -> ((s, dir) =>
      Habits.sessionize(Tables.eventsAsHabits(s, dir), "user_email", "ts", 30)
        .groupBy(col("user_email"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_email"))),

    // The custom DataSource V2 table (graft.sources.FormResponseSource)
    // through the full transform: proves the scan partitioning, schema
    // inference, and InternalRow emission feed the engine end to end.
    "q_dsv2_form_source" -> ((s, dir) => {
      val wide = s.read.format("graft.sources.FormResponseSource")
        .option("users", 4).option("days", 9)
        .option("startdate", "2024-01-01").load()
      HabitTransform.toEvents(wide, cfg3)
        .select(ntz(col("ts")).as("ts"), col("user_email"), col("habit"),
          col("value"), col("notes"), col("source"))
        .orderBy(col("user_email"), col("habit"), col("ts"))
    }),

    // DSv2 scan pushdown: the Report-Date equality prunes day-block
    // partitions at planning time and the projection prunes the cells
    // the reader materializes (SourcesSpec pins both plan properties;
    // this row pins the pushed scan's RESULT against the closed form).
    "q_dsv2_pushdown" -> ((s, dir) =>
      s.read.format("graft.sources.FormResponseSource")
        .option("users", 4).option("days", 9)
        .option("startdate", "2024-01-01").load()
        .filter(col("`Report Date`") === "1/5/2024")
        .select(col("`Email Address`").as("user_email"),
          col("Workout").as("workout"), col("Mood").as("mood"))
        .orderBy(col("user_email"))),

    // DSv2 COMPLETE aggregate pushdown: grouped by Report Date every
    // group is exactly one day-block partition, so the source's
    // per-block fold IS the final answer — no sheet row ever reaches
    // Spark (the analog of a server-side summary endpoint).
    "q_dsv2_agg_pushdown" -> ((s, dir) =>
      s.read.format("graft.sources.FormResponseSource")
        .option("users", 6).option("days", 11)
        .option("startdate", "2024-02-20").load()
        .groupBy(col("`Report Date`"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("`Email Address`")).as("first_email"),
          max(col("Mood")).as("max_mood_text"))
        .select(col("`Report Date`").as("report_date"), col("n_rows"),
          col("first_email"), col("max_mood_text"))
        .orderBy(col("report_date"))),

    // DSv2 PARTIAL aggregate pushdown: ungrouped — each day block
    // returns one partial row (its count / min / max) and Spark's
    // final aggregate merges the 11 partials; rows never materialize.
    "q_dsv2_agg_global" -> ((s, dir) =>
      s.read.format("graft.sources.FormResponseSource")
        .option("users", 6).option("days", 11)
        .option("startdate", "2024-02-20").load()
        .agg(count(lit(1)).as("n_rows"),
          max(col("`Report Date`")).as("last_date_text"))),

    // Storage-partitioned join: both sides are day-block scans of the
    // same source reporting KeyGroupedPartitioning(Report Date), so
    // the row⋈daily-rollup join plans with NO exchange on either side
    // — the DSv2 co-location contract (the rollup side also rides the
    // COMPLETE aggregate pushdown). SourcesSpec pins the plan shape;
    // this row pins the result.
    "q_dsv2_spj" -> ((s, dir) => {
      def rows = s.read.format("graft.sources.FormResponseSource")
        .option("users", 5).option("days", 8)
        .option("startdate", "2024-03-01").load()
      val daily = rows.groupBy(col("`Report Date`"))
        .agg(count(lit(1)).as("n_day"),
          max(col("Mood")).as("max_mood_text"))
      rows.select(col("`Report Date`"), col("`Email Address`"))
        .join(daily, "Report Date")
        .select(col("`Report Date`").as("report_date"),
          col("`Email Address`").as("user_email"),
          col("n_day"), col("max_mood_text"))
        .orderBy(col("report_date"), col("user_email"))
    }),

    "q_json_extract" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .select(col("habit"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("habit"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          r6(avg(col("k"))).as("avg_k"))
        .orderBy(col("habit"))),

    // Spark 4 VARIANT path for semi-structured props: parse once into
    // the binary variant encoding, extract with variant_get — same
    // results as the string-path q_json_extract, so it shares the
    // oracle's expected values.
    "q_json_variant" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .select(col("habit"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy(col("habit"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          r6(avg(col("k"))).as("avg_k"))
        .orderBy(col("habit"))),

    "q_json_roundtrip" -> ((s, dir) =>
      Tables.read(s, dir, "orders")
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_totalprice"))).as("js"))
        .select(col("o_orderkey"),
          from_json(col("js"), "o_orderkey BIGINT, o_totalprice DOUBLE",
            Map.empty[String, String]).getField("o_totalprice")
            .as("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "q_rolling_avg" -> ((s, dir) =>
      Habits.rollingDailyAvg(Tables.eventsAsHabits(s, dir),
          Seq("purchase", "click"), anchor = "2024-01-01", windowDays = 7)
        .select(col("habit"), ntz(col("day")).as("day"),
          r6(col("rolling_avg")).as("rolling_avg"))
        .orderBy(col("habit"), col("day"))),

    // Exact interpolated percentiles — both engines implement the
    // classic linear-interpolation quantile, so values match bit-level.
    // Winsorized robust moments: values clamped to the exact
    // [p05, p95] band per event type, then mean/stddev over the
    // clamped values — the outlier-resistant row of the profile.
    "q_winsorized" -> ((s, dir) =>
      graft.ext.Profile.winsorized(Tables.read(s, dir, "events"),
          "value", Seq("event_type"), lo = 0.05, hi = 0.95)
        .orderBy(col("event_type"))),

    "q_percentiles" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .groupBy(col("habit"))
        .agg(
          r6(expr("percentile(value, 0.5)")).as("p50"),
          r6(expr("percentile(value, 0.9)")).as("p90"),
          r6(expr("percentile(value, 0.99)")).as("p99"))
        .orderBy(col("habit"))),

    // Approximate quantiles: the oracle pins `approx_ok = true` — the
    // sketch's p50 must land within 2% RELATIVE RANK of the exact
    // distribution (checked against the exact interpolated quantiles at
    // ±2 percentile points), the accuracy-invariant pattern shared with
    // q_approx_distinct.
    "q_approx_quantiles" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .groupBy(col("habit"))
        .agg(
          expr("approx_percentile(value, 0.5, 10000)").as("_ap50"),
          expr("percentile(value, 0.48)").as("_lo"),
          expr("percentile(value, 0.52)").as("_hi"),
          count(lit(1)).as("n"))
        .select(col("habit"), col("n"),
          (col("_ap50") >= col("_lo") && col("_ap50") <= col("_hi"))
            .as("approx_ok"))
        .orderBy(col("habit"))),

    "q_approx_distinct" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .groupBy(col("habit"))
        // rsd 0.01 (not the 0.05 default, a 1-sigma target that large
        // cardinalities DO exceed) so the 5% oracle bound holds at any SF
        .agg(count_distinct(col("user_email")).as("exact_n"),
          approx_count_distinct(col("user_email"), 0.01).as("_approx"))
        // the oracle pins `approx_ok = true`: HLL must land within 5%
        .select(col("habit"), col("exact_n"),
          (abs(col("_approx") - col("exact_n")).cast("double") /
            col("exact_n").cast("double") <= 0.05).as("approx_ok"))
        .orderBy(col("habit"))),

    // Reproducible 80/10/10 dataset split by content-independent hash of
    // the doc id — same assignment on any engine, any partitioning.
    "q_sample_split" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .withColumn("split", graft.ext.Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 80, "val" -> 90), lastLabel = "test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("split"))),

    // Deterministic stratified sampling: per-language keep rates (the
    // training-mix reweighting op), reproducible on any engine.
    "q_stratified" -> ((s, dir) =>
      graft.ext.Sampling.stratifiedSample(Tables.read(s, dir, "documents"),
          col("doc_id"), col("lang"),
          pcts = Map("en" -> 50, "es" -> 25), defaultPct = 10)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))),

    // Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): per
    // language, the 5 docs drawn with probability ∝ n_chars — the
    // portable-md5 priority makes the draw engine-independent, so the
    // oracle reproduces the exact sample.
    "q_weighted_sample" -> ((s, dir) =>
      graft.ext.Sampling.weightedTopK(Tables.read(s, dir, "documents"),
          col("doc_id"), col("n_chars"), Seq(col("lang")), k = 5)
        .select(col("lang"), col("sample_rank").cast("long").as("sample_rank"),
          col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("sample_rank"))),

    // Token-budget data mixture: per-source budgets from a weight map,
    // filled deterministically in md5-rank order — "3 parts src0, 1
    // part src1/src2, half a part src3, 2000 tokens total" as a
    // concrete, engine-independent document selection.
    "q_mixture_budget" -> ((s, dir) =>
      graft.ext.Curation.mixtureByTokens(
          Tables.read(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ", -1)).cast("long").as("n_tokens")),
          "doc_id", "source", "n_tokens",
          weights = Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0,
            "src3" -> 0.5),
          totalTokens = 2000)
        .select(col("source"), col("take_rank"), col("doc_id"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("take_rank"))),

    // Skew-safe mixture: the same selection computed through the salted
    // two-level prefix sum (salt = high bits of the md5 rank key ⇒
    // contiguous per-source ranges; bucket offsets lift local
    // ranks/sums to global) — shares q_mixture_budget's oracle because
    // the output contract is bit-identical to the plain path.
    "q_mixture_salted" -> ((s, dir) =>
      graft.ext.Curation.mixtureByTokens(
          Tables.read(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ", -1)).cast("long").as("n_tokens")),
          "doc_id", "source", "n_tokens",
          weights = Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0,
            "src3" -> 0.5),
          totalTokens = 2000, saltBuckets = 8)
        .select(col("source"), col("take_rank"), col("doc_id"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("take_rank"))),

    // DSIR importance resampling: candidates scored by the 1e-6-
    // quantized target-vs-pool unigram log ratio, top-200 most
    // target-like kept (src0 documents define the target LM).
    "q_dsir_select" -> ((s, dir) =>
      graft.ext.Curation.dsirSelect(
          Tables.read(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("text")),
          "doc_id", "text", col("source") === "src0", k = 200)
        .select(col("doc_id"), col("n_tokens"), col("weight_e6"))
        .orderBy(col("weight_e6").desc, col("doc_id"))),

    // Temperature-scaled mixture (T5/Gopher alpha sampling): weights
    // derive from the corpus's OWN per-source token masses, w ∝ m^α
    // quantized at 1e-6 of the largest source, then the standard
    // deterministic budget fill — small sources up-weighted without
    // hand-tuned ratios.
    "q_mixture_temperature" -> ((s, dir) =>
      graft.ext.Curation.mixtureByTemperature(
          Tables.read(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ", -1)).cast("long").as("n_tokens")),
          "doc_id", "source", "n_tokens", alpha = 0.5,
          totalTokens = 2000)
        .select(col("source"), col("take_rank"), col("doc_id"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("take_rank"))),

    // Deterministic sharded export order: shard = md5 bucket, position
    // = md5-rank within shard — the global training-order shuffle as a
    // pure function of doc ids, byte-identical on any engine.
    "q_export_shards" -> ((s, dir) =>
      graft.ext.Sampling.exportShards(Tables.read(s, dir, "documents"),
          col("doc_id"), numShards = 8)
        .select(col("shard"), col("shard_pos"), col("doc_id"))
        .orderBy(col("shard"), col("shard_pos"))),

    // Shard integrity manifest: per export shard, row count, byte
    // total, and an ORDER-SENSITIVE content digest (md5 over per-doc
    // md5s in shard_pos order) — what a consumer checks before
    // training on a delivered shard, and what makes silent truncation
    // or reorder detectable. One shard-keyed aggregate.
    "q_export_manifest" -> ((s, dir) =>
      graft.ext.Sampling.exportShards(Tables.read(s, dir, "documents"),
          col("doc_id"), numShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"),
          md5(array_join(transform(array_sort(collect_list(
              struct(col("shard_pos"), md5(col("text")).as("h")))),
            x => x("h")), "")).as("digest"))
        .orderBy(col("shard"))),

    // Multi-epoch training order: shard MEMBERSHIP is epoch-stable
    // (worker placement and caches survive), the within-shard order
    // reshuffles per epoch via an epoch-salted hash — two epochs
    // emitted side by side, both orders engine-exact.
    "q_export_epochs" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      (0 to 1).map(e =>
        graft.ext.Sampling.exportShardsEpoch(docs, col("doc_id"),
            numShards = 8, epoch = e)
          .select(lit(e).as("epoch"), col("shard"), col("shard_pos"),
            col("doc_id")))
        .reduce(_ unionByName _)
        .orderBy(col("epoch"), col("shard"), col("shard_pos"))
    }),

    // CDC apply — MERGE with deletes: a deterministic change feed
    // (seq-superseded stale updates, updates, deletes, inserts) applied
    // to the events table as the keyed sink. The stale seq=1 update
    // must lose to the seq=2 winner — the oracle's closed form assumes
    // exactly that.
    "q_cdc_apply" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      Merge.applyCdc(ev, cdcFeed(ev), keys = Seq("event_id"),
          seqCol = "seq")
        .orderBy(col("event_id"))
    }),

    // STREAMING CDC apply: the SAME change feed drained in three
    // ascending-seq ticks through cdcStream's foreachBatch merge
    // against a sink primed with the current table. Staged ascending
    // arrival makes the stream's arrival-wins contract coincide with
    // the batch path's highest-seq-wins, so the final sink state is
    // the q_cdc_apply oracle row for row.
    "q_cdc_stream" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcs_")
      try
        Streaming.cdcStreamAvailableNow(s, ev, cdcFeed(ev),
            Seq(1L, 2L, 3L), tmp.toString,
            Streaming.nextQueryName("graft_cdcs"))
          .orderBy(col("event_id"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // STREAMING ingest dedup: the documents corpus arrives in two
    // hash-split ticks; tick 0 bootstraps the corpus store, tick 1
    // runs the incremental batch×corpus + batch-internal path, and the
    // accumulated pair ledger must equal the batch minhash dedup over
    // the whole corpus — the q_dedup_minhash oracle, proving the
    // ingest-time dedup loses nothing vs the offline pass.
    "q_dedup_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ddups_")
      try
        Streaming.dedupIncrementalAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_ddups"))
          .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Sub-document dedup (CCNet/RefinedWeb line-dedup analog): segments
    // = non-overlapping 8-word windows; any segment recurring corpus-
    // wide is dropped and the survivors reassemble in document order.
    "q_dedup_lines" -> ((s, dir) =>
      Dedup.segmentDedup(Tables.read(s, dir, "documents"), "doc_id",
          "text", n = 8, maxOccurrences = 2)
        .select(col("id").as("doc_id"), col("kept_segments"),
          col("dropped_segments"), md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))),

    // Content-defined chunking dedup (rsync/LBFS boundary rule):
    // chunk starts where the windowed md5 draw is 0 mod 32, so
    // boundaries are functions of local content and an early edit
    // shifts one chunk, not every block after it; per-source chunk
    // dedup accounting (total/distinct/dup chunks, bytes a chunk
    // store would save).
    "q_dedup_chunks" -> ((s, dir) =>
      Dedup.chunkDedupStats(Tables.read(s, dir, "documents"),
          "source", "text", window = 8, mask = 32)
        .orderBy(col("source"))),

    // Chunk census maintained at ingest: per-tick (source, chunk)
    // occurrence counts are additive, so the dedup accounting off the
    // summed ledger equals the batch q_dedup_chunks (shared oracle) —
    // the chunk-store index built as data arrives.
    "q_chunk_store_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_chks_")
      try Streaming.chunkStatsAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_chunks"))
        .orderBy(col("source"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Incremental chunk dedup: the NEW batch's chunks probe the corpus
    // chunk store (semi-join against the distinct-chunk index) —
    // batch-proportional cost; how many chunks/bytes the store already
    // holds is the dedup-savings estimate for the arriving drop.
    "q_dedup_chunks_incremental" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      Dedup.chunkIncremental(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "source", "text")
        .orderBy(col("source"))
    }),

    // Int8 embedding quantization: integer code stats are exact on any
    // engine; the oracle additionally pins recon_ok = true (per-dim
    // reconstruction error within scale/2).
    "q_embed_quantize" -> ((s, dir) => {
      val q = Similarity.quantizeInt8(
        Tables.read(s, dir, "embeddings"), "embedding")
      q.select(col("vec_id"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("q_sum"),
        array_min(col("q")).cast("long").as("q_min"),
        array_max(col("q")).cast("long").as("q_max"),
        r6(col("scale")).as("scale_r"),
        forall(zip_with(col("q"), col("embedding"), (qi, x) =>
          abs(qi.cast("double") * col("scale") - x.cast("double")) <=
            col("scale") / 2 + lit(1e-9)), b => b).as("recon_ok"))
        .orderBy(col("vec_id"))
    }),

    // JL sign random projection 64 → 8 dims: the scale pre-step in
    // front of LSH/k-means. The ±1 matrix regenerates from the md5
    // parity formula on any engine; flattened (vec_id, dim, val) so the
    // oracle compares every projected coordinate cell-exact at 6 dp.
    "q_embed_project" -> ((s, dir) => {
      Similarity.projectSign(Tables.read(s, dir, "embeddings"),
          "embedding", inDims = 64, outDims = 8)
        .select(col("vec_id"), posexplode(col("proj")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          r6(col("col")).as("val"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // Canonical text normalization before content addressing: the
    // corpus is deterministically dirtied (case flips, punctuation,
    // ragged whitespace — reproduced verbatim in the oracle) and the
    // normalized form must hash identically on both engines.
    "q_text_normalize" -> ((s, dir) => {
      val noisy = concat(lit("  "),
        when(col("doc_id") % 3 === 0, upper(col("text")))
          .otherwise(col("text")),
        lit("!!  An,Example--End  "))
      val norm = TextAnalysis.normalize(noisy)
      Tables.read(s, dir, "documents")
        .select(col("doc_id"), md5(norm).as("norm_md5"),
          size(split(norm, " ")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Count-min frequency sketch: per-value estimates must sit inside
    // the classic one-sided band [exact, exact + eps·N] — the
    // frequency-sketch sibling of the q_approx_distinct/q_hll_rollup
    // invariant rows.
    "q_cms_freq" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      val n = ev.filter(col("event_type").isNotNull)
        .agg(count(lit(1)).as("_n"))
      graft.ext.Sketches.cmsFrequencies(ev, "event_type", eps = 0.001)
        .join(broadcast(n))
        .select(col("value").as("event_type"), col("exact_n"),
          (col("est_n") >= col("exact_n") &&
            col("est_n") <= col("exact_n") +
              ceil(lit(0.001) * col("_n")).cast("long")).as("est_ok"))
        .orderBy(col("event_type"))
    }),

    // K-means centroid training (IVF index build): 4 Lloyd iterations
    // over INT8 CODES, k = the ground-truth cluster count of the
    // synthetic embeddings. Every step is integer arithmetic or a
    // correctly-rounded double op on integer inputs (floor-division
    // centroid updates), so the assignments are engine-exact and the
    // FULL algorithm — quantization, 4 unrolled Lloyd rounds, final
    // assignment — has a cell-exact DuckDB oracle. The float-mean
    // variant (Similarity.kmeansFit) stays spec-pinned (determinism +
    // blob recovery) since its means are summation-order-dependent.
    "q_kmeans" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      val (_, assign) = Similarity.kmeansFitInt8(emb, "vec_id", "embedding",
        k = 10, iterations = 4)
      assign.join(emb.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("cluster"), col("label")).count()
        .groupBy(col("cluster"))
        .agg(sum(col("count")).as("n_points"),
          max(col("count")).as("n_majority"))
        .orderBy(col("cluster"))
    }),

    // Greedy k-center (Gonzalez farthest-point) coreset selection on
    // the exact int8 codes: 8 rounds, each one narrow min-distance
    // update against the newest broadcast center + one TakeOrdered
    // argmax — diversity-maximizing data selection with the covering-
    // radius curve as output, engine-exact integer distances.
    "q_kcenter" -> ((s, dir) =>
      Similarity.kcenterSelect(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8)
        .orderBy(col("round"))),

    // Mutual kNN: the symmetric matching filter — (a, b) kept only
    // when each is in the other's top-5 under exact int8 dots; hubs
    // that are "near everyone" without reciprocity drop out. One
    // self-join over the kNN relation. The gate runs the even half of
    // the corpus (the brute-force relation is O(n²) by design — the
    // scale path swaps in the IVF kNN relation, same mutuality join).
    "q_mutual_knn" -> ((s, dir) =>
      Similarity.mutualKnn(
          Tables.read(s, dir, "embeddings")
            .filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", k = 5)
        .orderBy(col("id_a"), col("id_b"))),

    // MMR diversified top-k: relevance-minus-redundancy greedy under
    // exact int8 dots (λ = 1/2 keeps the score pure integer) — the
    // RAG re-ranker / diverse-exemplar picker; per round one candidate
    // scan against the newly-picked broadcast-literal vector.
    "q_mmr" -> ((s, dir) =>
      Similarity.mmrSelect(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 0L, k = 8)
        .orderBy(col("round"))),

    // Hard-negative mining: per query vector, the 5 most similar
    // corpus vectors with a DIFFERENT label — the contrastive-training
    // pair miner. Exact int8 dots in the q_knn_quantized shape, with
    // the label-mismatch predicate inside the broadcast join so
    // same-label pairs never materialize.
    "q_hard_negatives" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "label", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // HOPPING windows on the STREAMING path: the q_hopping_window
    // rollup through a watermarked complete-mode replay — one event
    // feeds two window states; must equal the batch form (shared
    // oracle).
    "q_hopping_stream" -> ((s, dir) =>
      Streaming.hoppingAvailableNow(s, dir,
          Streaming.nextQueryName("graft_hop"))
        .select(ntz(col("win_start")).as("win_start"), col("event_type"),
          col("n"), r6(col("sum_value")).as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // kNN over the int8 codes: ranking is pure integer arithmetic, so
    // the cut is bit-exact across engines (no float rounding anywhere).
    "q_knn_quantized" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnQuantizedInt8(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), col("qdot"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Product quantization: 64-dim int8 vectors compress to 4 codebook
    // cells (16 dims/subspace, 8 cells each) — codes, codebooks, and
    // the per-vector reconstruction error are all integer-exact, so
    // the oracle replays the full training chain cell-for-cell.
    "q_pq_encode" -> ((s, dir) =>
      Similarity.pqEncodeInt8(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", m = 4, kSub = 8, iterations = 2)
        .select(col("vec_id"), concat_ws(" ", col("code")).as("code"),
          col("recon_err"))
        .orderBy(col("vec_id"))),

    // ADC search over the PQ index: rank by integer squared-L2 between
    // the query's exact int8 codes and each corpus vector's codebook
    // reconstruction — the memory-bound ANN scale path (corpus side
    // carries 4 small ints per vector).
    "q_knn_pq" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnPq(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, m = 4, kSub = 8, iterations = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), col("adist"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF+PQ (IVFADC): coarse cells + PQ over residuals, queries probe
    // only their 2 nearest cells — the inverted-list ANN layout whose
    // scan cost is nProbes/nCells of the corpus. Fully integer-exact,
    // so index build AND probe-limited search replay in the oracle.
    "q_knn_ivfpq" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnIvfPq(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nCells = 8, nProbes = 2,
          m = 4, kSub = 8, iterations = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), col("adist"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Decontamination: test-split docs whose winnowing fingerprint also
    // appears in the train split (composed from splitLabel + the native
    // MinKgramHash + a semi-join on fingerprint).
    "q_contamination" -> ((s, dir) => {
      // the fingerprint pass feeds both branches below — persist it
      // (released by the harness clearCache, see Dedup's cache contract)
      val d = Tables.read(s, dir, "documents")
        .withColumn("split", graft.ext.Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 80, "val" -> 90), lastLabel = "test"))
        .withColumn("fp",
          TextAnalysis.minKgramFingerprintNative(col("text"), 8))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val trainFps = d.filter(col("split") === "train")
        .select(col("fp")).distinct()
      d.filter(col("split") === "test")
        .select(col("doc_id"), col("fp"))
        .join(trainFps, "fp")
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))
    }),

    // EXACT-substring decontamination — the stronger form of
    // q_contamination's fingerprint overlap: test docs sharing a
    // verbatim ≥31-char substring with any train doc, found via the
    // stride-tiled k-gram anchor join + in-order extension verify.
    "q_substring_contamination" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
        .withColumn("split", graft.ext.Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 80, "val" -> 90), lastLabel = "test"))
      graft.ext.Curation.substringContamination(
          d.filter(col("split") === "train"),
          d.filter(col("split") === "test"),
          "doc_id", "text", minLen = 31)
        .orderBy(col("doc_id"))
    }),

    // Dead-letter quarantine at ingest: rows failing the expectation
    // route to the quarantine ledger, passing rows to the curated
    // sink — per-batch idempotent, closed-form oracle on the
    // synthetic corruption.
    "q_quarantine_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dlq_")
      try
        Streaming.quarantineAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_dlq"))
          .orderBy(col("dest"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // STREAMING decontamination gate: each arriving train tick is
    // checked against the static eval-set window index; the distinct
    // ledger union equals the offline every-offset scan — shared
    // oracle, reports available DURING ingest.
    "q_contamination_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cont_")
      try
        Streaming.contaminationAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_cont"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Redaction — the consuming half of decontamination: cut every
    // flagged ≥31-char window out of the test docs (overlapping
    // windows merged into islands, gaps spliced by pure expressions);
    // unflagged docs pass through unchanged with n_removed = 0.
    "q_redact_contamination" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
        .withColumn("split", graft.ext.Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 80, "val" -> 90), lastLabel = "test"))
      val train = d.filter(col("split") === "train")
      val test = d.filter(col("split") === "test")
      graft.ext.Curation.redactWindows(test,
          graft.ext.Curation.contaminationWindows(train, test,
            "doc_id", "text", minLen = 31),
          "doc_id", "text", minLen = 31)
        .orderBy(col("doc_id"))
    }),

    // Within-corpus repeated-substring detection (the training-set
    // analog of decontamination): docs sharing a verbatim ≥31-char
    // substring with a DIFFERENT doc of the same corpus — the same
    // tiled-anchor machinery run self-vs-self with same-doc anchors
    // excluded.
    "q_substring_selfdup" -> ((s, dir) =>
      graft.ext.Curation.selfSubstringRepeats(
          Tables.read(s, dir, "documents"), "doc_id", "text", minLen = 31)
        .orderBy(col("doc_id"))),

    // Normalized decontamination: the same verbatim-substring gate over
    // canonical text (lowercase, punctuation stripped, whitespace
    // collapsed) — case/spacing variants of a leaked span no longer
    // slip through. Spans report in normalized coordinates.
    "q_substring_contamination_norm" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
        .withColumn("split", graft.ext.Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 80, "val" -> 90), lastLabel = "test"))
      graft.ext.Curation.substringContaminationNormalized(
          d.filter(col("split") === "train"),
          d.filter(col("split") === "test"),
          "doc_id", "text", minLen = 31)
        .orderBy(col("doc_id"))
    }),

    "q_streaks" -> ((s, dir) =>
      Habits.streaks(Tables.eventsAsHabits(s, dir))
        .orderBy(col("user_email"), col("habit"))),

    "q_gap_fill" -> ((s, dir) =>
      Habits.gapFillDaily(Tables.eventsAsHabits(s, dir), "purchase")
        .select(col("user_email"), col("habit"),
          ntz(col("day")).as("day"), col("day_total"), col("filled_total"))
        .orderBy(col("user_email"), col("habit"), col("day"))),

    "q_habit_cube" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .filter(col("habit").isin("click", "view"))
        .cube(col("user_email"), col("habit"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total"))
        .orderBy(col("user_email").asc_nulls_first,
          col("habit").asc_nulls_first)),

    "q_habit_rollup" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .rollup(ntz(Habits.dayBucket(col("ts"))).as("day"), col("habit"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total"))
        .orderBy(col("day").asc_nulls_first, col("habit").asc_nulls_first)),

    // left-anti join (the newRawRows dedup shape) under the gate
    // directly: (user, day) pairs with click activity but no purchase.
    // LEFT SEMI — the EXISTS dual of q_anti_join: suppliers with at
    // least one 1996+ shipment. Semi stops at the first build-side
    // match and never duplicates the probe row — the shape IN/EXISTS
    // subqueries plan to.
    "q_semi_join" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15"))
      Tables.read(s, dir, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    "q_anti_join" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("user_email"), Habits.dayBucket(col("ts")).as("day"),
          col("value"))
      val purchaseDays = ev.filter(col("habit") === "purchase")
        .select(col("user_email"), Habits.dayBucket(col("ts")).as("day"))
        .distinct()
      clicks.join(purchaseDays, Seq("user_email", "day"), "left_anti")
        .groupBy(col("user_email"), ntz(col("day")).as("day"))
        .agg(count(lit(1)).as("n_clicks"),
          round(sum(col("value")), 6).as("click_value"))
        .orderBy(col("user_email"), col("day"))
    }),

    "q_set_ops" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      def users(h: String) =
        ev.filter(col("habit") === h).select(col("user_email")).distinct()
      val both = users("click").intersect(users("view"))
        .select(lit("both").as("grp"), col("user_email"))
      val clickOnly = users("click").except(users("view"))
        .select(lit("click_only").as("grp"), col("user_email"))
      both.union(clickOnly).orderBy(col("grp"), col("user_email"))
    }),

    // As-of join: each click paired with the user's most recent
    // prior-or-equal purchase. Oracle is DuckDB's native ASOF JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"), col("ts"))
      val purchases = ev.filter(col("habit") === "purchase")
        .groupBy(col("user_email"), col("ts"))
        .agg(r6(max(col("value"))).as("pvalue"))
      graft.ext.AsOf.asofJoin(clicks, purchases, "user_email", "ts",
          Seq("pvalue"))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"), col("asof_pvalue"))
        .orderBy(col("event_id"))
    }),

    // Same as-of semantics through the native operator stack (custom
    // LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions):
    // co-partitioned per-side shuffles + in-partition merge, no window.
    "q_asof_native" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"), col("ts"))
      val purchases = ev.filter(col("habit") === "purchase")
        .groupBy(col("user_email"), col("ts"))
        .agg(r6(max(col("value"))).as("pvalue"))
      graft.ext.AsOf.asofJoinNative(clicks, purchases, "user_email", "ts",
          Seq("pvalue"))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"), col("asof_pvalue"))
        .orderBy(col("event_id"))
    }),

    // Skew-aware split-union as-of: declared hot users take the
    // broadcast path (their fact rows never shuffle), everyone else
    // takes the co-partitioned merge, and the union is oracle-proven
    // result-identical to the plain as-of — exactly the contract skew
    // handling must keep (mirrors the q_salted_* identity proofs).
    "q_asof_skew" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"), col("ts"))
      val purchases = ev.filter(col("habit") === "purchase")
        .groupBy(col("user_email"), col("ts"))
        .agg(r6(max(col("value"))).as("pvalue"))
      graft.ext.AsOf.asofJoinSkew(clicks, purchases, "user_email", "ts",
          Seq("pvalue"), hotKeys = Seq(1L, 2L, 3L))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"), col("asof_pvalue"))
        .orderBy(col("event_id"))
    }),

    // Multi-column-key native as-of — (user, day) scopes the lookback
    // within a calendar day, the form the composed union+window as-of
    // doesn't offer. Oracle: DuckDB ASOF with two equality conditions.
    "q_asof_multi" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"),
          date_trunc("day", col("ts")).as("day"), col("ts"))
      val purchases = ev.filter(col("habit") === "purchase")
        .groupBy(col("user_email"), col("ts"))
        .agg(r6(max(col("value"))).as("pvalue"))
        .withColumn("day", date_trunc("day", col("ts")))
      graft.ext.AsOf.asofJoinNativeMulti(clicks, purchases,
          Seq("user_email", "day"), "ts", Seq("pvalue"))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"), col("asof_pvalue"))
        .orderBy(col("event_id"))
    }),

    // The same operator pinned to its shuffle-merge physical form
    // (broadcast = Some(false)) so the co-partitioned merge exec stays
    // under the oracle gate even when stats would pick broadcast.
    "q_asof_native_merge" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"), col("ts"))
      val purchases = ev.filter(col("habit") === "purchase")
        .groupBy(col("user_email"), col("ts"))
        .agg(r6(max(col("value"))).as("pvalue"))
      graft.ext.AsOf.asofJoinNative(clicks, purchases, "user_email", "ts",
          Seq("pvalue"), broadcast = Some(false))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"), col("asof_pvalue"))
        .orderBy(col("event_id"))
    }),

    // Range join: clicks falling inside 2-hour windows opened by each
    // purchase, via the bucketized equi-join formulation.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
      val clicks = ev.filter(col("habit") === "click")
        .select(col("event_id"), col("user_email"), col("ts"))
      val windows = ev.filter(col("habit") === "purchase")
        .select(col("user_email"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
        .distinct()
      graft.ext.RangeJoin.pointInInterval(clicks, windows, "user_email",
          "ts", "w_start", "w_end", bucketSeconds = 3600L)
        .select(col("event_id"), col("user_email"), ntz(col("ts")).as("ts"),
          ntz(col("w_start")).as("w_start"))
        .orderBy(col("event_id"), col("w_start"))
    }),

    // pivot — the inverse of the signature unpivot: long events back to
    // one wide row per (day, user) with a column per habit.
    "q_pivot_daily" -> ((s, dir) =>
      Tables.eventsAsHabits(s, dir)
        .groupBy(ntz(Habits.dayBucket(col("ts"))).as("day"),
          col("user_email"))
        .pivot("habit", Seq("click", "error", "purchase", "signup", "view"))
        .agg(r6(sum(col("value"))))
        .orderBy(col("day"), col("user_email"))),

    // ── Reference parity: unpivot + merge + dedup (SURVEY §2.1-2.2) ────
    "q_unpivot_orders" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
      o.select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast("double").as("o_custkey"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_custkey"), col("o_totalprice")), "metric", "val")
        .orderBy(col("o_orderkey"), col("metric"))
    }),

    // The partitioned store (EventStore) under the gate: write the
    // events table day-partitioned, upsert a modified batch rewriting
    // only touched days, read back. Same merge contract as
    // q_upsert_merge, so it shares that oracle's expected output.
    "q_upsert_partitioned" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_q")
      try {
        val path = tmp.resolve("events").toString
        val existing = Tables.eventsAsHabits(s, dir)
        graft.load.EventStore.write(existing, path)
        val batch = existing.filter(col("event_id") % 3 === 0)
          .withColumn("value", col("value") * 2)
        graft.load.EventStore.upsert(s, path, batch,
          keys = Seq("user_email", "habit", "ts"))
        // materialize before the finally deletes the temp store —
        // otherwise every verify/bench run leaks two copies of events
        graft.load.EventStore.read(s, path)
          .select(col("event_id"), ntz(col("ts")).as("ts"),
            col("user_email"), col("habit"), col("value"), col("props"))
          .orderBy(col("event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_upsert_merge" -> ((s, dir) => {
      val existing = Tables.eventsAsHabits(s, dir)
      val batch = existing.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
      Merge.upsertEvents(existing, batch)
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          col("habit"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }),

    // Schema-evolving upsert: the batch starts carrying a NEW column
    // (the ALTER TABLE ADD COLUMN moment) — the sink widens, untouched
    // rows read null for it, merged rows carry the batch's value.
    "q_upsert_evolving" -> ((s, dir) => {
      val existing = Tables.eventsAsHabits(s, dir)
      val batch = existing.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("channel", lit("reimport"))
      Merge.upsertEventsEvolving(existing, batch)
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          col("habit"), col("value"), col("channel"))
        .orderBy(col("event_id"))
    }),

    // Golden end-to-end run of the signature transform chain (P1-P8 +
    // F2 date parsing, SURVEY §2.2-2.3) on an inline edge-case fixture:
    // serial dates (incl. fractional), month names, datetime, DST winter
    // vs summer, blank cells, junk numerics, truthy variants, dropped
    // rows. The oracle is the hand-verified expected output.
    "q_transform_wide" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      val wide = Seq(
        ("8/22/2025", "Alice@Example.com", "Yes", "25", "8", "felt great"),
        ("45519", "bob@x.com", "no", "", "junk", ""),
        ("2025-01-15", "Carol@Y.com", "TRUE", "10.5", "", null),
        ("Aug 3, 2025", "dave@z.com", "on", "1e2", "7", "ok"),
        ("2025-08-22 08:30:00", "eve@w.com", "0", "5", "6", null),
        ("", "frank@x.com", "yes", "1", "1", null),
        ("8/22/2025", "", "yes", "1", "1", null),
        ("45519.25", "gina@x.com", "y", "3", "2", null))
        .toDF("Report Date", "Email Address", "Workout",
          "Meditation (Number of Minutes)", "Mood", "Notes")
      HabitTransform.toEvents(wide, cfg3)
        .select(ntz(col("ts")).as("ts"), col("user_email"), col("habit"),
          col("value"), col("notes"), col("source"))
        .orderBy(col("user_email"), col("habit"))
    }),

    // Same transform chain fed from a FILE-based wide CSV — the primary
    // SURVEY §2.1 S1 mapping (a user's first act is reading an exported
    // sheet): write the fixture to disk, spark.read.csv with header,
    // transform. Empty CSV cells read back as NULL where the inline
    // fixture had "" — the transform's blank/present gates treat both
    // identically, so the oracle is the same expected table.
    "q_transform_csv" -> ((s, dir) => {
      val csv =
        """Report Date,Email Address,Workout,Meditation (Number of Minutes),Mood,Notes
          |8/22/2025,Alice@Example.com,Yes,25,8,felt great
          |45519,bob@x.com,no,,junk,
          |2025-01-15,Carol@Y.com,TRUE,10.5,,
          |"Aug 3, 2025",dave@z.com,on,1e2,7,ok
          |2025-08-22 08:30:00,eve@w.com,0,5,6,
          |,frank@x.com,yes,1,1,
          |8/22/2025,,yes,1,1,
          |45519.25,gina@x.com,y,3,2,
          |""".stripMargin
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv_")
      try {
        java.nio.file.Files.writeString(tmp.resolve("habits.csv"), csv)
        val wide = s.read.option("header", true).csv(tmp.toString)
        // materialize before deleting the temp file under the scan
        HabitTransform.toEvents(wide, cfg3)
          .select(ntz(col("ts")).as("ts"), col("user_email"), col("habit"),
            col("value"), col("notes"), col("source"))
          .orderBy(col("user_email"), col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_raw_dedup" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("row_hash"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("row_hash"), col("n_copies"))
        .orderBy(col("doc_id"))),

    // Rolling 7-day distinct users per day ("7-day actives"): distinct
    // can't ride a window frame, so (user, day) pairs explode to the 7
    // window-ends they contribute to, then exact distinct per end.
    "q_rolling_distinct" -> ((s, dir) =>
      Habits.rollingDistinct(Tables.events(s, dir), "user_id", "ts", 7)
        .select(ntz(col("window_end")).as("window_end"), col("n_users"))
        .orderBy(col("window_end"))),

    // Ordered conversion funnel over raw events: users reaching each
    // stage strictly after completing the previous one.
    "q_funnel" -> ((s, dir) =>
      Habits.funnel(Tables.events(s, dir), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy(col("stage_idx"))),

    // Mergeable-sketch distinct rollup: per-day HLL sketches of user_id
    // union into weekly estimates WITHOUT touching raw rows again — the
    // 100 TB pattern for distinct-over-rollup. The estimate itself
    // isn't cross-engine comparable, so the gate checks the exact
    // weekly count plus a 5%-accuracy invariant (same pattern as
    // q_approx_distinct / q_approx_quantiles).
    "q_hll_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val weekly = daily
        .groupBy(date_trunc("WEEK", col("day")).as("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev
        .groupBy(date_trunc("WEEK", date_trunc("DAY", col("ts"))).as("week"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      weekly.join(exact, "week")
        .select(ntz(col("week")).as("week"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_ok"))
        .orderBy(col("week"))
    }),

    // ── Scale workload: joins / aggs / window top-k over TPC-H-ish ─────
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))
          .cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        // large-magnitude sums round to 2 dp: at ~1e9 magnitude the
        // engines' different summation orders disagree beyond 6 dp
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Correlated subquery through spark.sql — Catalyst decorrelates it
    // into an aggregate + join (no per-row re-execution).
    "q_above_avg_orders" -> ((s, dir) => {
      Tables.read(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_custkey, count(*) AS n_above, round(max(o_totalprice), 6)
          AS max_price
        FROM orders_v o
        WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_custkey ORDER BY o_custkey""")
    }),

    "q_revenue_by_nation" -> ((s, dir) => {
      val orders = Tables.read(s, dir, "orders")
      val customer = Tables.read(s, dir, "customer")
      val nation = Tables.read(s, dir, "nation")
      // orders⋈customer co-shuffle on custkey (both scale with SF);
      // nation is a fixed 25-row dim — always broadcast.
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q3 shape: three filtered fact/dim scans meet on equi-joins,
    // revenue per urgent order, distributed top-10. Every filter sits
    // below its join; customer is NOT force-broadcast (it scales with
    // SF — segment-filtered it still reaches 3e9 rows at 100 TB, so
    // the shuffle-vs-broadcast call belongs to stats/AQE, not the
    // query author).
    "q_shipping_priority" -> ((s, dir) => {
      val c = Tables.read(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1996-03-15"))
      val l = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"),
          col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          ntz(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"))
    }),

    // TPC-H Q5 shape: the six-table "local supplier" join — the
    // customer and the supplier must share a nation, expressed as a
    // second equality on the supplier join. The two fixed-size dims
    // (nation 25, region 5) broadcast explicitly; the SF-scaled
    // relations co-shuffle on their keys and Catalyst orders them.
    "q_local_supplier_revenue" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val r = Tables.read(s, dir, "region")
        .filter(col("r_name") === "ASIA")
      Tables.read(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.read(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.read(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.read(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q_top_orders_per_segment" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.read(s, dir, "orders")
      val customer = Tables.read(s, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("c_mktsegment"), col("rank").cast("long").as("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }),

    // Columnar-format breadth: the event store round-trips through ORC
    // (Spark's other built-in columnar format) — types, timestamps, and
    // aggregates must survive the format change bit-exact vs the oracle
    // reading the original parquet.
    "q_orc_roundtrip" -> ((s, dir) => {
      // per-process (pid) + per-sfDir path: stable within a process so
      // repeated runs overwrite in place, yet two concurrent processes
      // (e.g. Verify and Bench) can never clobber each other mid-query
      val path = s"${sys.props("java.io.tmpdir")}/graft_orc_" +
        s"${ProcessHandle.current().pid()}_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.eventsAsHabits(s, dir)
        .select(col("event_id"), col("ts"), col("user_email"),
          col("habit"), col("value"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("habit"))
        .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"),
          max(col("ts")).as("last_ts"))
        .select(col("habit"), col("n"), col("avg_value"),
          ntz(col("last_ts")).as("last_ts"))
        .orderBy(col("habit"))
    }),

    // JSON-lines round-trip — the interchange format training corpora
    // actually ship in. Timestamps ride as ISO-8601 strings (JSON has
    // no timestamp type) and are re-parsed on read with an explicit
    // schema-less scan + cast, so the aggregate must survive
    // format → text → format unchanged vs the parquet-reading oracle.
    "q_jsonl_roundtrip" -> ((s, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_jsonl_" +
        s"${ProcessHandle.current().pid()}_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.eventsAsHabits(s, dir)
        .select(col("event_id"), col("ts").cast("string").as("ts"),
          col("user_email"), col("habit"), col("value"))
        .write.mode("overwrite").json(path)
      s.read.json(path)
        .select(col("event_id"), to_timestamp(col("ts")).as("ts"),
          col("user_email"), col("habit"), col("value"))
        .groupBy(col("habit"))
        .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"),
          max(col("ts")).as("last_ts"))
        .select(col("habit"), col("n"), col("avg_value"),
          ntz(col("last_ts")).as("last_ts"))
        .orderBy(col("habit"))
    }),

    // Variant landing payload — the reference's jsonb events column
    // (sql/001_schema.sql:10) in its 100 TB-native form. The payload is
    // parsed ONCE into VariantType and written SHREDDED: Spark 4's
    // parquet writer (writeShredding + inferShreddingSchema, both
    // default-on) splits the inferred paths into typed subcolumns with
    // an untyped spill for non-conforming rows, so later readers scan
    // columnar typed values instead of re-parsing JSON text per row.
    // The read side is the payoff: PushVariantIntoScan rewrites the
    // requested `variant_get` paths into a struct read and the `$.k`
    // predicate lands in the scan's PushedFilters — predicate pushdown
    // INTO a semi-structured column (PlanSpec pins both properties).
    "q_variant_shredded" -> ((s, dir) => {
      // per-process + per-sfDir path, same rationale as q_orc_roundtrip
      val path = s"${sys.props("java.io.tmpdir")}/graft_variant_" +
        s"${ProcessHandle.current().pid()}_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Tables.eventsAsHabits(s, dir)
        .select(col("event_id"),
          expr("parse_json(to_json(named_struct(" +
            "'t', habit, 'v', value, " +
            "'k', cast(get_json_object(props, '$.k') as long))))")
            .as("payload"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(
          expr("variant_get(payload, '$.t', 'string')").as("habit"),
          expr("variant_get(payload, '$.v', 'double')").as("value"),
          expr("variant_get(payload, '$.k', 'long')").as("k"))
        .filter(col("k") >= 50)
        .groupBy(col("habit"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          r6(avg(col("value"))).as("avg_value"))
        .orderBy(col("habit"))
    }),

    // Bucketed-table co-located join: both sides written hash-bucketed
    // on the join key (Bucketing.writeBucketed), so the fact⋈fact join
    // plans with ZERO exchange into the join — the 100 TB answer to
    // repeated large⋈large joins on a stable key. PlanSpec pins the
    // no-shuffle contract; the oracle proves the layout changes nothing.
    "q_bucket_join" -> ((s, dir) => {
      // per-process + per-sfDir location: repeated invocations (plan
      // printing, verify, bench×2) overwrite in place instead of
      // accumulating orphaned table copies, while concurrent processes
      // stay isolated from each other
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_buckets_" +
        s"${ProcessHandle.current().pid()}_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val orders = Tables.read(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      graft.load.Bucketing.writeBucketed(orders, "g_orders_b",
        s"$tmp/orders", "o_orderkey", buckets = 8)
      graft.load.Bucketing.writeBucketed(li, "g_lineitem_b",
        s"$tmp/lineitem", "l_orderkey", buckets = 8)
      s.table("g_lineitem_b")
        .join(s.table("g_orders_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate"))
        // exact integer arithmetic: prices/discounts are 2-dp so the
        // product is an exact 4-dp value — summing it scaled to 1e-4
        // units as LONG is order-independent, where a double sum lands
        // on half-way round boundaries and flips per engine
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")).as("revenue_e4"),
          count(lit(1)).as("n"))
        .select(ntz(col("o_orderdate")).as("o_orderdate"),
          col("revenue_e4"), col("n"))
        .orderBy(col("o_orderdate"))
    }),

    // Bloom-pruned fact⋈dim: lineitem rows shed map-side through a
    // bloom of the qualifying orders' keys before the exact join — the
    // explicit form of runtime row-level filtering. False positives are
    // dropped by the join, so the oracle is the plain unpruned SQL.
    "q_bloom_join" -> ((s, dir) => {
      val hot = Tables.read(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
      graft.ext.Bloom.bloomPrunedJoin(
          Tables.read(s, dir, "lineitem"), hot,
          "l_orderkey", "o_orderkey", expectedKeys = 20000L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // One-scan dataset profile (rows/nulls/NDV/min/max per column) in
    // long form — the pre-ingest statistics sweep. Exact NDVs ride a
    // single Expand-based aggregate, not one query per column.
    "q_profile" -> ((s, dir) =>
      graft.ext.Profile.profile(Tables.read(s, dir, "events"),
          Seq("event_id", "user_id", "event_type", "value"))
        .orderBy(col("col_name"))),

    // Single-pass approximate profile (no Expand — the wide-table
    // path): exact-comparable stats plus an HLL-NDV 5%-band invariant
    // (the exact profile supplies the band's reference inside the
    // query, like q_approx_distinct).
    "q_profile_approx" -> ((s, dir) => {
      val cols = Seq("event_id", "user_id", "event_type", "value")
      val ev = Tables.read(s, dir, "events")
      val ap = graft.ext.Profile.profileApprox(ev, cols)
      val ex = graft.ext.Profile.profile(ev, cols)
        .select(col("col_name"), col("n_distinct"))
      ap.join(ex, "col_name")
        .select(col("col_name"), col("n_rows"), col("n_null"),
          r6(col("min_num")).as("min_num"), r6(col("max_num")).as("max_num"),
          (abs(col("approx_distinct") - col("n_distinct")).cast("double") <=
            lit(0.05) * col("n_distinct").cast("double")).as("approx_ok"))
        .orderBy(col("col_name"))
    }),

    // Declarative data-quality expectation suite (the Deequ idea):
    // completeness, key uniqueness, range, format, and domain checks
    // over orders, ALL evaluated in one aggregate scan; each reports
    // its measured fraction and pass flag. Two checks fail by design
    // (o_orderstatus is 3-valued, not unique; prices exceed 100k) so
    // the report proves failure surfacing, not just green paths.
    "q_expectations" -> ((s, dir) => {
      import graft.ext.Expectations._
      check(Tables.read(s, dir, "orders"), Seq(
        Complete("o_custkey"),
        Unique("o_orderkey"),
        Unique("o_orderstatus"),
        InRange("o_totalprice", 0, 100000, minRatio = 0.9),
        MatchesRegex("o_orderpriority", "^[1-5]-"),
        InSet("o_orderstatus", Seq("F", "O"), minRatio = 0.6)))
        .select(col("check"), col("col_name"),
          r6(col("metric")).as("metric"), col("passed"))
        .orderBy(col("check"), col("col_name"))
    }),

    // Native Morton (Z-order) key over two scaled dimensions — the
    // clustering key behind Layout.writeZOrdered; the oracle rebuilds
    // the identical bit interleave arithmetically.
    "q_zorder" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          graft.load.Layout.zValue(
            col("value"), 0.0, 500.0,
            pmod(col("event_id"), lit(256)).cast("double"), 0.0, 256.0,
            bits = 8).as("z"))
        .orderBy(col("event_id"))),

    // Fixed-width value histogram per event_type: 20 buckets over
    // [0, 500) — distribution profiling as one count aggregate.
    "q_histogram" -> ((s, dir) =>
      graft.ext.Profile.histogram(Tables.read(s, dir, "events"),
          "value", lo = 0.0, hi = 500.0, buckets = 20,
          groupCols = Seq("event_type"))
        .orderBy(col("event_type"), col("bucket"))),

    // Mergeable-quantile rollup — the percentile analog of the HLL
    // sketch rollup: per-(habit, day) fixed-bin histograms built in
    // ONE raw pass merge to per-habit sketches by summing bin counts,
    // and p50/p90/p99 come off the merged cumulative histogram —
    // raw rows touched once, every count an exact integer, the whole
    // estimate replayed across engines (rank threshold in ppm longs,
    // estimate = upper edge of the crossing bucket).
    "q_quantile_rollup" -> ((s, dir) => {
      val ev = Tables.eventsAsHabits(s, dir)
        .withColumn("day", Habits.dayBucket(col("ts")))
      val daily = graft.ext.Profile.histogram(ev, "value",
        lo = 0.0, hi = 640.0, buckets = 64,
        groupCols = Seq("habit", "day"))
      graft.ext.Profile.histogramQuantiles(daily, Seq("habit"),
          qs = Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 640.0, buckets = 64)
        .select(col("habit"), col("q_ppm"), col("bucket"),
          col("n_total"), col("est"))
        .orderBy(col("habit"), col("q_ppm"))
    }),

    // ── Extension scope: text analysis (SURVEY §7.5) ───────────────────
    "q_token_count" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))),

    "q_lang_id" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"))
        .orderBy(col("doc_id"))),

    "q_lang_id_ngram" -> ((s, dir) =>
      TextAnalysis.langIdNgram(Tables.read(s, dir, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q_text_quality" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.nTokens(col("text")).cast("long").as("n_tokens"),
          r6(TextAnalysis.meanTokenLen(col("text"))).as("mean_token_len"),
          r6(TextAnalysis.punctRatio(col("text"))).as("punct_ratio"),
          r6(TextAnalysis.stopwordRatio(col("text"))).as("stopword_ratio"),
          r6(TextAnalysis.qualityScore(col("text"))).as("quality"))
        .orderBy(col("doc_id"))),

    "q_token_stats" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.nTokens(col("text")).cast("long").as("n_ws_tokens"),
          TextAnalysis.regexTokenCount(col("text")).cast("long")
            .as("n_re_tokens"))
        .orderBy(col("doc_id"))),

    // Uses the NATIVE codegen'd PolyHash expression (graft.plans) —
    // values identical to the pure-builtin form, pinned by ExtSpec.
    "q_fingerprint" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.polyFingerprintNative(col("text")).as("poly_fp"),
          TextAnalysis.minKgramFingerprintNative(col("text"), 8)
            .as("kgram_min_fp"))
        .orderBy(col("doc_id"))),

    // Sequence packing: each doc split into consecutive 32-token
    // training chunks; chunk md5 proves byte-identical chunking.
    "q_chunk_tokens" -> ((s, dir) =>
      TextAnalysis.tokenChunks(Tables.read(s, dir, "documents"),
          "doc_id", "text", chunkSize = 32)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(split(col("chunk"), " ", -1)).cast("long").as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Sequence packing — documents into fixed-token-budget training
    // bins (the concat-and-chunk stage of a pretraining pipeline,
    // document-intact next-fit by start offset). Shard-LOCAL windows:
    // one shuffle on the shard key, per-shard prefix sums — never a
    // global ordered window (which would funnel the corpus through one
    // task at 100 TB). Deterministic, so the bin layout itself is
    // under the oracle: per (shard, bin) document counts, token loads,
    // and an id-chain digest must all match DuckDB's packing.
    "q_pack_sequences" -> ((s, dir) => {
      val toks = Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      graft.ext.Packing.packSequences(toks, "doc_id", "n_tokens",
          budget = 512L, shards = 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Boundary-free concat packing (GPT-style): the shard token stream
    // cuts every `budget` tokens and documents may span bins — zero
    // padding waste, exact `budget` tokens per non-tail bin. Oracle
    // checks the per-bin composition (docs overlapping, token loads,
    // split-doc accounting) cell-exact.
    "q_pack_concat" -> ((s, dir) => {
      val toks = Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      graft.ext.Packing.packConcat(toks, "doc_id", "n_tokens",
          budget = 512L, shards = 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          // attention-mask metadata under the oracle: the bin's
          // document-boundary offsets, checked via their sum and max
          // (cell-exact across every (doc,bin) span in the group)
          sum(col("start_in_bin")).as("sum_starts"),
          max(col("start_in_bin")).as("max_start"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Corpus-statistics quality: mean unigram log2-probability per doc
    // under the corpus's own distribution (the cheap CCNet-perplexity
    // stand-in; very negative = rare-token-heavy).
    "q_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(Tables.read(s, dir, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), r6(col("avg_logprob")).as("avg_logprob"))
        .orderBy(col("doc_id"))),

    // Cohort retention matrix: users grouped by their first active
    // week, distinct-user counts per (cohort, week offset) — the
    // classic product-analytics rollup over the events stream. Two
    // user-keyed aggregates; the (user, week) relation is deduped
    // map-side before either shuffle.
    "q_retention" -> ((s, dir) => {
      val weeks = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val cohorts = weeks.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      weeks.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(ntz(col("cohort_week")).as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Gopher-style rule gate: per-document rule measures + flags + the
    // conjunction, rule-per-column so rejections are attributable. The
    // cheap narrow pre-filter ahead of the dedup stages.
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.read(s, dir, "documents"),
          "doc_id", "text", minWords = 50, maxWords = 100000,
          minStopHits = 2)
        .orderBy(col("doc_id"))),

    // BM25 retrieval ranking for a literal query (Okapi k1=1.2,
    // b=0.75) — the search-side counterpart of the tf-idf profile.
    // Scores round to 6 dp BEFORE the rank cut so the top-k set is
    // engine-reproducible.
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(Tables.read(s, dir, "documents"), "doc_id",
          "text", Seq("spark", "merge", "window"), topK = 25)
        .orderBy(col("score").desc, col("doc_id"))),

    // STREAMING text-index maintenance: per-tick postings + lengths
    // (the BM25 sufficient statistic) in idempotent subdirs; scoring
    // the maintained index equals the ad-hoc corpus scan — shared
    // oracle, corpus never rescanned at query time.
    "q_bm25_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25s_")
      try
        Streaming.bm25StreamAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_bm25s"),
            Seq("spark", "merge", "window"), topK = 25)
          .orderBy(col("score").desc, col("doc_id"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Exact phrase search: the positional-index conjunction as ONE
    // doc-keyed aggregate — the corpus sheds to the phrase's own terms
    // before the shuffle, and per-doc position-set intersection (term
    // t_i at p+i for all i) counts every word-position occurrence.
    "q_phrase_search" -> ((s, dir) =>
      TextAnalysis.phraseSearch(Tables.read(s, dir, "documents"),
          "doc_id", "text", Seq("merge", "sort"))
        .orderBy(col("doc_id"))),

    // Dedup-pipeline evaluation: score the MinHash-LSH pipeline
    // against the exact length-blocked n-gram Jaccard relation as
    // ground truth — the recall/precision harness for tuning bands and
    // thresholds before a 100 TB run.
    "q_dedup_recall" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val truth = Dedup.ngramDupPairs(docs, "doc_id", "text", "n_chars",
          threshold = 0.5, blockWidth = 50)
        .select(col("id_a"), col("id_b"), lit(1L).as("t"))
      val found = Dedup.minhashDupPairs(docs, "doc_id", "text",
          threshold = 0.5)
        .select(col("id_a"), col("id_b"), lit(1L).as("f"))
      truth.join(found, Seq("id_a", "id_b"), "full_outer")
        .agg(sum(col("t")).as("n_truth"), sum(col("f")).as("n_found"),
          sum(col("t") * col("f")).as("n_hit"))
        .select(col("n_truth"), col("n_found"), col("n_hit"),
          r6(col("n_hit").cast("double") / col("n_truth").cast("double"))
            .as("recall"),
          r6(col("n_hit").cast("double") / col("n_found").cast("double"))
            .as("precision"))
    }),

    // Bigram conditional log2-probability quality (one Markov order up
    // from q_unigram_logprob): shuffled-word text scores very negative
    // even when its unigrams are common. Docs with < 2 tokens have no
    // bigrams and drop out.
    "q_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(Tables.read(s, dir, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), r6(col("avg_logprob")).as("avg_logprob"))
        .orderBy(col("doc_id"))),

    // Sliding-window chunking: 32-token windows stepping 16, so
    // consecutive chunks share 16 tokens of left context — the overlap
    // form of q_chunk_tokens for long-document splitting.
    "q_chunk_overlap" -> ((s, dir) =>
      TextAnalysis.tokenChunksOverlap(Tables.read(s, dir, "documents"),
          "doc_id", "text", chunkSize = 32, step = 16)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(split(col("chunk"), " ", -1)).cast("long").as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Gopher-style repeated-n-gram quality signal: fraction of a doc's
    // word 3-grams that repeat an earlier shingle (typed kernel form,
    // value-identical to the expression form per ExtSpec).
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionRatios(Tables.read(s, dir, "documents"),
          "doc_id", "text", 3)
        .select(col("doc_id"), r6(col("rep_ratio")).as("rep_ratio"))
        .orderBy(col("doc_id"))),

    // PII scan + redaction: match counts on the raw text plus the md5 of
    // the masked text — a cross-engine proof the redaction is identical.
    "q_pii_scan" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.countMatches(col("text"), TextAnalysis.EmailRegex)
            .cast("long").as("n_emails"),
          TextAnalysis.countMatches(col("text"), TextAnalysis.UrlRegex)
            .cast("long").as("n_urls"),
          TextAnalysis.countMatches(col("text"), TextAnalysis.LongNumberRegex)
            .cast("long").as("n_long_numbers"),
          md5(TextAnalysis.maskPii(col("text"))).as("masked_md5"))
        .orderBy(col("doc_id"))),

    // Exact corpus heavy hitters through the pigeonhole candidate
    // pre-filter (local count ≥ ⌈minCount/P⌉ guarantees a candidate
    // superset); the oracle is the plain exact GROUP BY ... HAVING.
    "q_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(Tables.read(s, dir, "documents"),
          "text", minCount = 200L)
        .select(col("term"), col("cnt"))
        .orderBy(col("term"))),

    // BPE iteration-0 pair statistics: adjacent code-point pairs within
    // whitespace words, counted corpus-wide — the distributed inner
    // step of tokenizer training. The shuffle key space is alphabet^2
    // (map-side partials collapse each partition to that bound), so the
    // aggregate is sketch-sized at any corpus size. Top-30 by count
    // with pair tiebreak keeps the cut total-order deterministic.
    "q_bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(Tables.read(s, dir, "documents"), "text")
        .orderBy(col("n").desc, col("pair")).limit(30)),

    // Full BPE tokenizer training — the iterative merge loop over the
    // pair census: 8 merges, each an arg-max under the pinned
    // (count DESC, lhs, rhs) total order followed by a greedy
    // left-to-right re-segmentation of the vocabulary-sized word
    // table. The oracle replays the identical deterministic sequence
    // as 8 unrolled argmax+replace CTE stages.
    "q_bpe_train" -> ((s, dir) =>
      graft.ext.Bpe.bpeTrain(Tables.read(s, dir, "documents"), "text",
          numMerges = 8)
        .orderBy(col("step"))),

    // Tokenizer APPLY: train 8 merges, then encode the corpus with
    // them — per-document word and BPE-token counts. The merge chain
    // runs once per distinct word (vocabulary-sized), then one hash
    // join back to the exploded corpus.
    "q_bpe_encode" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      graft.ext.Bpe.bpeEncode(docs, "doc_id", "text",
          graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM (SentencePiece-style) vocabulary — the OTHER subword
    // family next to BPE: substring census over the distinct-word
    // relation (bounded len×maxPieceLen fan-out per word), top-40
    // pieces under the (cnt DESC, piece) total order plus every
    // single character (the required-character rule), integer-
    // quantized log2 costs. Top-V is a TakeOrderedAndProject — local
    // per-partition heads merged on the driver, no global rank window.
    "q_unigram_vocab" -> ((s, dir) =>
      graft.ext.Unigram.unigramSeed(Tables.read(s, dir, "documents"),
          "text")
        .orderBy(col("piece"))),

    // The persistable unigram id table (the bpeVocab analog): dense
    // ids under the (cost ASC, piece ASC) total order — cheapest
    // pieces get the smallest ids, ties impossible since piece is
    // unique. Window over the vocabulary-sized relation only.
    "q_unigram_ids" -> ((s, dir) => {
      val vocab = graft.ext.Unigram.unigramSeed(
        Tables.read(s, dir, "documents"), "text")
      vocab.withColumn("id",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("cost"), col("piece"))) - 1).cast("long"))
        .select(col("id"), col("piece"), col("cnt"), col("cost"))
        .orderBy(col("id"))
    }),

    // STREAMING vocabulary maintenance: per-tick word censuses in
    // idempotent batch subdirs sum to the trainer's sufficient
    // statistic; the vocabulary derived from the maintained state must
    // equal the batch seed — shared oracle, corpus never rescanned.
    "q_unigram_vocab_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_uvs_")
      try
        Streaming.unigramVocabAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_uvs"))
          .orderBy(col("piece"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Tokenizer APPLY, unigram style: Viterbi minimum-cost
    // segmentation of every DISTINCT word under the broadcast
    // vocabulary (narrow mapPartitions DP — the corpus side never
    // shuffles), then one AQE-broadcast join back to the exploded
    // corpus for per-document piece counts and total quantized cost.
    // The packed (cost·64 + pieces) metric makes both outputs unique
    // under segmentation ties; the oracle replays the same search as
    // an unrolled 16-step Bellman-Ford chain over the same metric.
    "q_unigram_encode" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      graft.ext.Unigram.unigramEncode(docs, "doc_id", "text",
          graft.ext.Unigram.unigramSeed(docs, "text"))
        .orderBy(col("doc_id"))
    }),

    // WordPiece greedy encode (BERT's longest-match-first runtime
    // rule) under the SAME seeded vocabulary as the unigram gate —
    // membership-only segmentation, one greedy pass per distinct
    // word, per-doc piece + unknown-word counts.
    "q_wordpiece" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      graft.ext.WordPiece.wordPieceEncode(docs, "doc_id", "text",
          graft.ext.Unigram.unigramSeed(docs, "text"))
        .orderBy(col("doc_id"))
    }),

    // Mixture-weighted interleaving: the deterministic global training
    // order via stride scheduling — ikey = rank/weight as exact
    // integers, so src0 (weight 3) appears 3× as often as src3
    // (weight 1) at any stream prefix. One source-keyed window; the
    // key itself is narrow.
    "q_interleave" -> ((s, dir) =>
      graft.ext.Curation.interleaveBySource(
          Tables.read(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 3L, "src1" -> 1L, "src2" -> 1L, "src3" -> 1L))
        .orderBy(col("ikey"), col("source"), col("rank_in_source"))),

    // word2vec's discard rule, md5-deterministic: frequent-word
    // occurrences thin at 1 − √(t/f), rare words always survive;
    // per-doc kept-stream digest gates exact survivor text.
    "q_subsample" -> ((s, dir) =>
      TextAnalysis.subsampleFrequent(Tables.read(s, dir, "documents"),
          "doc_id", "text", tE6 = 10000L)
        .orderBy(col("doc_id"))),

    // Skip-gram co-occurrence pairs (word2vec training relation):
    // ±2-token contexts, one narrow explode + one observed-pairs-
    // bounded aggregate with map-side partials.
    "q_skipgram" -> ((s, dir) =>
      TextAnalysis.skipGramPairs(Tables.read(s, dir, "documents"),
          "doc_id", "text", window = 2)
        .orderBy(col("center"), col("context"))),

    // Deterministic negative sampling over the skip-gram pairs: k=2
    // frequency-proportional draws per pair via md5 inverse-CDF on the
    // vocabulary mass table — every draw a pure function of (pair, j),
    // replayable across engines and reruns.
    "q_negative_samples" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val vocab = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      TextAnalysis.negativeSamples(
          TextAnalysis.skipGramPairs(docs, "doc_id", "text", window = 2)
            .select(col("center"), col("context")),
          vocab, k = 2)
        .orderBy(col("center"), col("context"), col("j"))
    }),

    // Tokenizer EVAL — the selection metric both trainers share:
    // corpus compression (total emitted units) for the BPE-8 and
    // unigram-40 tokenizers trained on the same corpus. Each side is
    // its proven encode pipeline collapsed to one partial-aggregated
    // sum; fewer units at equal vocab budget = better compression.
    "q_tokenizer_eval" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val bpe = graft.ext.Bpe.bpeEncode(docs, "doc_id", "text",
          graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8))
        .agg(sum(col("n_bpe_tokens")).as("total_units"))
        .select(lit("bpe8").as("tokenizer"), col("total_units"))
      val uni = graft.ext.Unigram.unigramEncode(docs, "doc_id", "text",
          graft.ext.Unigram.unigramSeed(docs, "text"))
        .agg(sum(col("n_pieces")).as("total_units"))
        .select(lit("unigram40").as("tokenizer"), col("total_units"))
      val wp = graft.ext.WordPiece.wordPieceEncode(docs, "doc_id", "text",
          graft.ext.Unigram.unigramSeed(docs, "text"))
        .agg(sum(col("n_pieces")).as("total_units"))
        .select(lit("wordpiece40").as("tokenizer"), col("total_units"))
      bpe.unionByName(uni).unionByName(wp).orderBy(col("tokenizer"))
    }),

    // THE exportable end product: real token-id streams cut into
    // 512-token training bins — bpeEncodeIds supplies per-doc id
    // arrays, packConcatWithOffsets says which contiguous piece of
    // each array lands in which bin (closed-form doc_off slice
    // offset), and the per-bin stream digests under the oracle.
    "q_export_token_shards" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val ids = graft.ext.Bpe.bpeEncodeIds(docs, "doc_id", "text",
        graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8))
      graft.ext.Packing.packConcatWithOffsets(
          ids.select(col("doc_id"), col("n_tokens")),
          "doc_id", "n_tokens", budget = 512L, shards = 4)
        .join(ids.select(col("doc_id"), col("token_ids")), "doc_id")
        .withColumn("__piece", expr(
          "slice(token_ids, cast(doc_off + 1 as int), cast(tok_in_bin as int))"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          md5(array_join(flatten(transform(
            array_sort(collect_list(struct(col("start_in_bin"),
              col("__piece")))),
            x => x.getField("__piece"))), " ")).as("ids_md5"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Same export with an END-OF-DOCUMENT separator token appended to
    // every document before packing — the form trainers actually
    // consume (document boundaries must survive the concat-and-chunk
    // cut so the model can reset attention). The EOD id is the next
    // free vocabulary id; appending BEFORE packing means the spans,
    // bin token counts, and stream digests all shift — the oracle
    // re-derives them with the same +1 arithmetic.
    "q_export_token_shards_eod" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val merges = graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8)
      val eodId = graft.ext.Bpe.bpeVocab(docs, "text", merges).count()
      val ids = graft.ext.Bpe.bpeEncodeIds(docs, "doc_id", "text", merges)
        .withColumn("token_ids",
          concat(col("token_ids"), array(lit(eodId).cast("int"))))
        .withColumn("n_tokens", col("n_tokens") + 1)
      graft.ext.Packing.packConcatWithOffsets(
          ids.select(col("doc_id"), col("n_tokens")),
          "doc_id", "n_tokens", budget = 512L, shards = 4)
        .join(ids.select(col("doc_id"), col("token_ids")), "doc_id")
        .withColumn("__piece", expr(
          "slice(token_ids, cast(doc_off + 1 as int), cast(tok_in_bin as int))"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          md5(array_join(flatten(transform(
            array_sort(collect_list(struct(col("start_in_bin"),
              col("__piece")))),
            x => x.getField("__piece"))), " ")).as("ids_md5"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Per-bin POSITION-ID streams for packed attention: each packed
    // piece contributes positions doc_off .. doc_off+tok_in_bin-1, so
    // a document's positions restart at 0 at its own start and CONTINUE
    // across a bin split (the doc_off closed form) — exactly the
    // position_ids a trainer zips with the token stream. Same spans
    // arithmetic as the token-shard export; the oracle replays it.
    "q_pack_positions" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val ids = graft.ext.Bpe.bpeEncodeIds(docs, "doc_id", "text",
        graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8))
      graft.ext.Packing.packConcatWithOffsets(
          ids.select(col("doc_id"), col("n_tokens")),
          "doc_id", "n_tokens", budget = 512L, shards = 4)
        .withColumn("__pos", expr(
          "sequence(doc_off, doc_off + tok_in_bin - 1)"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          md5(array_join(flatten(transform(
            array_sort(collect_list(struct(col("start_in_bin"),
              col("__pos")))),
            x => x.getField("__pos"))), " ")).as("pos_md5"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Tokenizer apply, ID form: per-document array<int> token-id
    // sequences under the deterministic vocabulary (sorted corpus
    // alphabet, then merge-order minted ids) — what a training
    // pipeline actually feeds the model. Gate compares the
    // space-joined string form of the arrays cell-exact.
    "q_bpe_encode_ids" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      graft.ext.Bpe.bpeEncodeIds(docs, "doc_id", "text",
          graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8))
        .select(col("doc_id"),
          array_join(col("token_ids"), " ").as("token_ids"),
          col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer round-trip: decode(encodeIds(text)) must reproduce the
    // text's characters exactly (minus the word separators encode
    // splits on) — the integrity gate a pipeline runs before training.
    // The oracle is GROUND TRUTH, not a replay: it hashes
    // replace(text, ' ', '') straight off the table, so any drift
    // anywhere in train → vocab → encode → decode breaks the match.
    "q_bpe_roundtrip" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val merges = graft.ext.Bpe.bpeTrain(docs, "text", numMerges = 8)
      val enc = graft.ext.Bpe.bpeEncodeIds(docs, "doc_id", "text", merges)
      val vocab = graft.ext.Bpe.bpeVocab(docs, "text", merges)
      graft.ext.Bpe.bpeDecode(enc, "doc_id", "token_ids", vocab)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // BYTE-LEVEL tokenizer round-trip (the GPT-2 family): train on the
    // fixed 256-byte alphabet, encode under the merge-list-pure id
    // table (no corpus alphabet, no unknown path), decode back through
    // unhex. Same ground-truth gate as q_bpe_roundtrip: any drift in
    // byte train → byte vocab → byte encode → byte decode breaks the
    // md5 match against the raw table.
    "q_bpe_bytes_roundtrip" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val merges = graft.ext.Bpe.bpeTrainBytes(docs, "text", numMerges = 8)
      val enc = graft.ext.Bpe.bpeEncodeIdsBytes(docs, "doc_id", "text", merges)
      val vocab = graft.ext.Bpe.bpeVocabBytes(s, merges)
      graft.ext.Bpe.bpeDecodeBytes(enc, "doc_id", "token_ids", vocab)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // Character-distribution Shannon entropy via the native codegen'd
    // graft_entropy expression — per-row, shuffle-free; the oracle
    // recomputes the same log2 formula from per-char counts.
    "q_char_entropy" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          r6(TextAnalysis.charEntropy(col("text"))).as("char_entropy"))
        .orderBy(col("doc_id"))),

    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.read(s, dir, "documents"),
          "doc_id", "text", k = 3)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))),

    // ── Extension scope: dedup family (SURVEY §7.5) ────────────────────
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashDupPairs(Tables.read(s, dir, "documents"),
          "doc_id", "text", threshold = 0.5)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // Incremental ingest dedup: only pairs touching the new batch
    // (doc_id % 10 = 0) are found — existing × existing is never
    // compared, the per-batch cost at scale.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      Dedup.minhashDupPairsIncremental(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", threshold = 0.5)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramDupPairs(Tables.read(s, dir, "documents"),
          "doc_id", "text", "n_chars", threshold = 0.5, blockWidth = 50)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // Typo-tolerant record linkage: Levenshtein ≤ 2 pairs over part
    // names, blocked on brand + length band (no all-pairs compare);
    // the oracle brute-forces the same predicate within brands.
    "q_fuzzy_dedup" -> ((s, dir) =>
      graft.ext.Fuzzy.editDistancePairs(Tables.read(s, dir, "part"),
          "p_partkey", "p_name", Seq("p_brand"), maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))),

    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashSignatures(Tables.read(s, dir, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q_dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashDupPairs(Tables.read(s, dir, "documents"),
          "doc_id", "text", maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))),

    // Pair→cluster resolution (iterative distributed min-label
    // propagation): duplicate clusters are CONNECTED COMPONENTS of the
    // pair graph — a≈b, b≈c chains into {a,b,c} even though (a,c) was
    // never compared. cluster_id = component min id; is_canonical marks
    // the survivor a curation pass would keep. Oracle = recursive
    // min-label closure over the identical simhash pair SQL.
    // PageRank over the simhash near-dup graph — which copy of a
    // duplicated passage is the hub. All-integer ranks (1e-12 units,
    // per-edge `rank div deg`, long damping arithmetic) make every
    // iteration order-insensitive and the 3-step unrolled oracle
    // bit-exact. Each iteration is one edges⋈ranks equi-join plus a
    // partial-aggregating sum — the Pregel superstep as relational
    // algebra, rank state O(nodes).
    "q_pagerank" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      graft.ext.Graph.pageRank(docs, "doc_id",
          Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 7))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.simhashDupPairs(Tables.read(s, dir, "documents"),
        "doc_id", "text", maxHamming = 7)
      Dedup.dupClusters(pairs)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // Canonical-copy selection: the dedup story's last mile — cluster
    // the near-dup graph, then keep each cluster's PageRank HUB (the
    // most-linked copy, the one other copies derive from) instead of
    // the arbitrary min-id. Ties break by id ascending. Composes two
    // oracle-proven relations; only clustered (size >= 2) docs appear.
    "q_canonical_select" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text",
        maxHamming = 7)
      val clusters = Dedup.dupClusters(pairs)
      val ranks = graft.ext.Graph.pageRank(docs, "doc_id", pairs)
      val byCluster = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
      val pick = byCluster.orderBy(col("rank_e12").desc, col("id"))
      clusters.join(ranks, clusters("id") === ranks("doc_id"))
        .withColumn("rk", row_number().over(pick))
        .withColumn("n_members", count(lit(1)).over(byCluster))
        .filter(col("rk") === 1)
        .select(col("cluster_id"), col("id").as("canonical_id"),
          col("rank_e12"), col("n_members"))
        .orderBy(col("cluster_id"))
    }),

    // Capstone composition — the full curation pipeline (language gate
    // → quality gate → cluster-dedup survivors → deterministic split),
    // every stage individually oracle-proven; this query proves the
    // COMPOSITION end to end.
    "q_curation" -> ((s, dir) =>
      graft.ext.Curation.curate(Tables.read(s, dir, "documents"),
          "doc_id", "text", lang = "en", minQuality = 60.0)
        .select(col("doc_id"), r6(col("quality")).as("quality"),
          col("n_tokens").cast("long").as("n_tokens"), col("split"))
        .orderBy(col("doc_id"))),

    // THE composed pretraining pipeline, end to end as one query:
    // curate (gates → dedup survivors → split) → token-budget mixture
    // over the train split → BPE tokenizer trained ON the mixed corpus
    // and applied to it → boundary-free packing into 512-token bins →
    // deterministic export-shard order over the bins. Every stage is
    // individually oracle-proven; this gates the COMPOSITION (stage
    // interfaces, row multiplicity, ordering) cell-exact.
    "q_pipeline_export" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val curated = graft.ext.Curation.curate(docs, "doc_id", "text",
        lang = "en", minQuality = 60.0)
      val withSrc = curated.filter(col("split") === "train")
        .select(col("doc_id"), col("n_tokens"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      val mixed = graft.ext.Curation.mixtureByTokens(withSrc, "doc_id",
        "source", "n_tokens",
        weights = Map("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0,
          "src3" -> 1.0),
        totalTokens = 1500)
      val corpus = mixed.select(col("doc_id"))
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
        // consumed by BOTH bpeTrain and bpeEncode — without a persist
        // the whole curation+mixture prefix recomputes per consumer
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val enc = graft.ext.Bpe.bpeEncode(corpus, "doc_id", "text",
        graft.ext.Bpe.bpeTrain(corpus, "text", numMerges = 8))
      val packed = graft.ext.Packing.packConcat(
        enc.select(col("doc_id"), col("n_bpe_tokens")),
        "doc_id", "n_bpe_tokens", budget = 512L, shards = 4)
      val bins = packed.groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_in_bin")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        // exportShards reserves "shard" — the packing shard renames
        .withColumnRenamed("shard", "pack_shard")
      graft.ext.Sampling.exportShards(bins,
          concat_ws(":", col("pack_shard"), col("bin")), numShards = 4)
        .select(col("shard"), col("shard_pos"), col("pack_shard"),
          col("bin"), col("n_docs"), col("bin_tokens"),
          col("first_doc"), col("last_doc"))
        .orderBy(col("shard"), col("shard_pos"))
    }),

    // The capstone composition: curated survivors (language gate →
    // quality gate → cluster dedup → deterministic split) packed into
    // fixed-token-budget training bins, split-scoped so no bin mixes
    // train and val. This is the full corpus→training-shards pipeline
    // in one lazy plan — gates shed rows before any shuffle, dedup
    // touches survivors only, and packing adds exactly one shuffle on
    // (split, shard) — with the bin layout itself under the oracle.
    "q_pack_curated" -> ((s, dir) => {
      val surv = graft.ext.Curation.curate(Tables.read(s, dir, "documents"),
          "doc_id", "text", lang = "en", minQuality = 60.0)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("split"))
      graft.ext.Packing.packSequences(surv, "doc_id", "n_tokens",
          budget = 256L, shards = 4, extraKeys = Seq("split"))
        .groupBy(col("split"), col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("split"), col("shard"), col("bin"))
    }),

    "q_dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingDupPairs(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // The bucketed (no-collect) scale path: same near-dup contract, but
    // candidates restricted to pairs sharing an LSH bucket in any band.
    "q_dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingDupPairsLsh(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4, nPlanes = 4, bands = 4)
        .orderBy(col("id_a"), col("id_b"))),

    // SemDeDup: semantic near-dup pairs via integer-exact k-means
    // cells — pairs compared only within a cell (Σ|cell|² work, not
    // n²). The cells replay cell-exact in the oracle, so the pair set
    // is deterministic; cosines score the original float vectors.
    "q_dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDupPairs(Tables.read(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iterations = 2, threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // ── Extension scope: similarity search (SURVEY §7.5) ───────────────
    "q_knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), col("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q_knn_ivf" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnIvf(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), col("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // STREAMING ANN-index maintenance: tick 0 freezes the centroids,
    // every tick appends its own cell assignments to the inverted
    // lists; probing the accumulated index must equal the batch
    // build-and-search — shared oracle. Per-tick cost tracks the tick;
    // existing vectors are never re-assigned.
    "q_knn_ivf_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfs_")
      try
        Streaming.knnIvfStreamAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_ivfs"))
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("nn_id"), col("cos_sim"))
          .orderBy(col("query_id"), col("rank"))
          .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_knn_lsh" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Similarity.knnLsh(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nPlanes = 4)
        .select(col("query_id"), col("bucket"),
          col("rank").cast("long").as("rank"), col("nn_id"), col("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hybrid retrieval: BM25 keyword top-20 fused with embedding kNN
    // top-20 (embeddings align 1:1 with documents) by reciprocal-rank
    // fusion — 1e-6-quantized contributions, so the fused order is
    // engine-exact. The modern search stack's first-stage shape.
    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val emb = Tables.read(s, dir, "embeddings")
      val kwW = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      // the rank window runs on the already-top-20 relation — 20 rows,
      // not the corpus
      val kw = TextAnalysis.bm25(docs, "doc_id", "text",
          Seq("spark", "merge", "window"), topK = 20)
        .withColumn("rank", row_number().over(kwW).cast("long"))
        .select(col("doc_id"), col("rank"))
      val vr = Similarity.knnBruteForce(emb,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 20)
        .select(col("nn_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      Similarity.rrfFuse(Seq(kw, vr), "doc_id", topK = 10)
        .select(col("doc_id"), col("rrf_e6"), col("n_lists"))
        .orderBy(col("rrf_e6").desc, col("doc_id"))
    }),

    // ANN-pipeline evaluation: LSH and IVF top-5 scored against the
    // exact brute-force top-5 as ground truth — per-query hit counts,
    // the tuning harness for nPlanes/nProbes (the ANN analog of
    // q_dedup_recall). Composes three proven, oracle-gated rankings.
    "q_ann_recall" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val brute = Similarity.knnBruteForce(emb, queries, "vec_id",
        "embedding", k = 5).select(col("query_id"), col("nn_id"))
      def recall(approx: org.apache.spark.sql.DataFrame, name: String) =
        brute.join(approx.withColumn("hit", lit(1L)),
            Seq("query_id", "nn_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("method", lit(name))
      recall(Similarity.knnLsh(emb, queries, "vec_id", "embedding",
          k = 5, nPlanes = 4).select(col("query_id"), col("nn_id")), "lsh")
        .unionByName(
          recall(Similarity.knnIvf(emb, queries, "vec_id", "embedding",
            k = 5).select(col("query_id"), col("nn_id")), "ivf"))
        .select(col("method"), col("query_id"), col("n_true"),
          col("n_hit"))
        .orderBy(col("method"), col("query_id"))
    }),

    // ── Extension scope: multimodal binary columns (SURVEY §7.5) ───────
    "q_media_frames" -> ((s, dir) =>
      Multimodal.framesWithBytes(
          Multimodal.packDocuments(Tables.read(s, dir, "documents"),
            "doc_id", "text"), n = 4)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_len"), col("frame_md5"))
        .orderBy(col("media_id"), col("frame_idx"))),

    // Real image decode: each document's bytes packed into a VALID
    // binary PPM (P6) via pure expressions, then parsed back by a real
    // header scanner — width/height/maxval come from the HEADER BYTES,
    // the mean/checksum from the pixel payload. The oracle recomputes
    // the identical header+payload arithmetic from the source text, so
    // a parser that misreads any field hash-mismatches.
    "q_media_features" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.decodePpm(
          Multimodal.packPpm(Tables.read(s, dir, "documents"),
            "doc_id", "text", width = 16).as[MediaRecord])
        .toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("maxval").cast("long").as("maxval"),
          col("n_pixels"), r6(col("mean_px")).as("mean_px"),
          col("checksum"))
        .orderBy(col("media_id"))
    }),

    // Real 2-D nearest-neighbor image downscale: every second pixel of
    // every second row, re-encoded as a VALID P6 whose md5 the oracle
    // reproduces by sampling the same source bytes and hashing the
    // rebuilt small file — decode → transform → re-encode, gated on
    // the exact output BYTES, not just stats.
    "q_media_resize" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.ppmResize(
          Multimodal.packPpm(Tables.read(s, dir, "documents"),
            "doc_id", "text", width = 16).as[MediaRecord],
          factor = 2)
        .orderBy(col("media_id"))
    }),

    // Perceptual image hash: all-integer 8×8 average-hash recomputed
    // byte-for-byte by the oracle from the same payload (hex string —
    // the unsigned 64-bit form both engines can build exactly).
    "q_media_ahash" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.ppmAHash(
          Multimodal.packPpm(Tables.read(s, dir, "documents"),
            "doc_id", "text", width = 16).as[MediaRecord])
        .select(col("media_id"),
          format_string("%016x", col("ahash")).as("ahash_hex"))
        .orderBy(col("media_id"))
    }),

    // Image near-dup pairs: the aHash relation through the pigeonhole
    // chunk join (Hamming ≤ 7 ⇒ some byte chunk agrees) — the same
    // no-all-pairs machinery as SimHash, now over image fingerprints.
    "q_media_ahash_pairs" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      graft.ext.Dedup.hammingDupPairs(
          Multimodal.ppmAHash(
            Multimodal.packPpm(Tables.read(s, dir, "documents"),
              "doc_id", "text", width = 16).as[MediaRecord]),
          "media_id", "ahash", maxHamming = 7)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Perceptual AUDIO hash: the image aHash's sibling over the 8-bit
    // PCM stream — 64 equal-count segments, floor-mean thresholding,
    // all-integer; the oracle rebuilds the same grid from the bytes.
    "q_media_wavhash" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.wavAHash(
          Multimodal.packWav(Tables.read(s, dir, "documents"),
            "doc_id", "text", sampleRate = 8000).as[MediaRecord])
        .select(col("media_id"),
          format_string("%016x", col("ahash")).as("ahash_hex"))
        .orderBy(col("media_id"))
    }),

    // Audio near-dup pairs: the wav-hash relation through the same
    // pigeonhole chunk join as SimHash/image pairs — no all-pairs.
    // The corpus carries an exact re-encode of every 7th document
    // under a shifted id, so identical payloads prove the Hamming-0
    // path at every scale factor.
    "q_media_wavhash_pairs" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      val docs = Tables.read(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val echoed = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
      graft.ext.Dedup.hammingDupPairs(
          Multimodal.wavAHash(
            Multimodal.packWav(echoed, "doc_id", "text",
              sampleRate = 8000).as[MediaRecord]),
          "media_id", "ahash", maxHamming = 7)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Real audio decimation: every 2nd sample of the 8-bit mono PCM
    // stream, re-encoded as a VALID RIFF/WAVE at half the sample rate
    // — the data-chunk md5 gates the exact kept bytes.
    "q_media_decimate" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.wavDecimate(
          Multimodal.packWav(Tables.read(s, dir, "documents"),
            "doc_id", "text", sampleRate = 8000).as[MediaRecord],
          factor = 2)
        .select(col("media_id"), col("rate_small"),
          col("n_samples_small"), col("sum_small"), col("data_md5"))
        .orderBy(col("media_id"))
    }),

    // Real audio decode: the same corpus packed as VALID 8-bit mono
    // RIFF/WAVE PCM files (LE size fields built by expression), parsed
    // back by a real chunk walker — channels/rate/bits come from the
    // fmt CHUNK BYTES, sample stats from the data chunk.
    // Sobel gradient energy over REAL PPM pixel bytes — the image-DSP
    // sibling of the tone probe: integer |gx|+|gy| over r+g+b
    // luminance, the flat-vs-noisy image signal a curation pipeline
    // thresholds. Pure integer arithmetic, partition-local kernel.
    "q_media_gradient" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.ppmGradient(
          Multimodal.packPpm(Tables.read(s, dir, "documents"),
            "doc_id", "text", width = 16).as[MediaRecord])
        .toDF()
        .orderBy(col("media_id"))
    }),

    // Single-bin integer DFT tone probe over REAL WAV sample bytes:
    // 1e-4-quantized twiddles keep the correlation sums exact longs,
    // so a genuine DSP feature (not header metadata) replays
    // engine-exactly. Partition-local kernel, no shuffle.
    "q_media_tone" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.wavTone(
          Multimodal.packWav(Tables.read(s, dir, "documents"),
            "doc_id", "text", sampleRate = 8000).as[MediaRecord],
          cycles = 8)
        .toDF()
        .orderBy(col("media_id"))
    }),

    "q_media_wav" -> ((s, dir) => {
      val sp = s
      import sp.implicits._
      Multimodal.decodeWav(
          Multimodal.packWav(Tables.read(s, dir, "documents"),
            "doc_id", "text", sampleRate = 8000).as[MediaRecord])
        .toDF()
        .select(col("media_id"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_samples"), r6(col("mean_amp")).as("mean_amp"),
          col("checksum"))
        .orderBy(col("media_id"))
    }),

    // ── Extension scope: streaming analog of the rollup (SURVEY §2.7) ──
    // Streaming as-of enrichment: per-key right-side timeline state in
    // flatMapGroupsWithState binds each click to the freshest prior
    // purchase — the one as-of shape a stream-stream join can't express
    // (unbounded lookback). The one-shot replay equals the batch as-of,
    // so it shares the ASOF oracle with the three batch forms.
    "q_asof_stream" -> ((s, dir) =>
      Streaming.asofStreamAvailableNow(s, dir, "click", "purchase",
          Streaming.nextQueryName("graft_aas"))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_email"),
          ntz(col("asof_ts")).as("asof_ts"),
          r6(col("asof_pvalue")).as("asof_pvalue"))
        .orderBy(col("event_id"))),

    // Stream-stream interval join (both sides watermarked, event time
    // bounded in both directions so join state expires), replayed
    // one-shot and oracled against the batch theta join.
    "q_interval_join_stream" -> ((s, dir) =>
      Streaming.intervalJoinAvailableNow(s, dir, "click", "purchase",
          lower = "2 hours", upper = "0 seconds",
          Streaming.nextQueryName("graft_ijs"))
        .select(col("l_event_id"), col("r_event_id"),
          ntz(col("l_ts")).as("l_ts"), col("l_user_email").as("user_email"),
          ntz(col("r_ts")).as("r_ts"))
        .orderBy(col("l_event_id"), col("r_event_id"))),

    // LEFT OUTER stream-stream interval join: null-padded results may
    // only emit once the watermark proves no future match can arrive —
    // the staged sentinel batches drive that progression so the replay
    // equals the batch left interval join exactly (see
    // Streaming.intervalJoinOuterAvailableNow).
    "q_interval_join_outer_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ijo_")
      try {
        Streaming.intervalJoinOuterAvailableNow(s, dir, "click",
            "purchase", lower = "2 hours", upper = "0 seconds",
            tmp.toString, Streaming.nextQueryName("graft_ijo"))
          .select(col("l_event_id"), col("r_event_id"),
            ntz(col("l_ts")).as("l_ts"),
            col("l_user_email").as("user_email"),
            ntz(col("r_ts")).as("r_ts"))
          .orderBy(col("l_event_id"), col("r_event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // FULL OUTER stream-stream interval join — both sides' unmatched
    // rows null-pad once their state provably cannot match, through
    // the same sentinel-driven watermark progression.
    "q_interval_join_full_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ijf_")
      try {
        Streaming.intervalJoinOuterAvailableNow(s, dir, "click",
            "purchase", lower = "2 hours", upper = "0 seconds",
            tmp.toString, Streaming.nextQueryName("graft_ijf"),
            joinType = "fullOuter")
          .select(col("l_event_id"), col("r_event_id"),
            ntz(col("l_ts")).as("l_ts"),
            coalesce(col("l_user_email"), col("r_user_email"))
              .as("user_email"),
            ntz(col("r_ts")).as("r_ts"))
          .orderBy(col("l_event_id"), col("r_event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_habit_daily_stream" -> ((s, dir) =>
      Streaming.habitDailyAvailableNow(s, dir, sumHabit = "purchase",
          Streaming.nextQueryName("graft_hds"))
        .select(ntz(col("day")).as("day"), col("user_email"), col("habit"),
          col("count_done"), r6(col("avg_value")).as("avg_value"),
          r6(col("sum_meditation")).as("sum_meditation"))
        .orderBy(col("day"), col("user_email"), col("habit"))),

    // Arbitrary stateful processing (flatMapGroupsWithState): per-user
    // (last ts, session counter) state sessionizes the stream; the
    // one-shot replay equals the batch gaps-and-islands and shares its
    // oracle. user_id rides as the typed string key and is cast back
    // for oracle parity.
    "q_sessionize_stream" -> ((s, dir) =>
      Streaming.sessionizeAvailableNow(s, dir, gapMinutes = 30,
          Streaming.nextQueryName("graft_ses"))
        .groupBy(col("user_email").cast("long").as("user_email"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_email"))),

    // ── Extension scope: in-engine classifiers (ext.Classify) ─────────
    // Multinomial NB language classifier trained on doc_id % 5 != 0 and
    // scored on the held-out fifth; integer-quantized log-probs make
    // the scores exact longs, so the oracle replays training AND every
    // prediction bit for bit.
    "q_nb_classifier" -> ((s, dir) =>
      Classify.naiveBayes(Tables.read(s, dir, "documents"),
          "doc_id", "text", "lang", holdMod = 5)
        .orderBy(col("doc_id"))),

    // Consistent-hash ring sharding: stable export-shard assignment —
    // growing 8 → 9 shards moves only keys whose ring successor is a
    // NEW vnode (≈ 1/9 of docs), vs near-total reassignment under
    // hash % shards. Pure per-row expression over the plan-time
    // literal ring; per-shard counts + how many keys the growth moves.
    "q_consistent_shard" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          graft.ext.Sampling.ringShard(col("doc_id"), 8, 4).as("shard"),
          graft.ext.Sampling.ringShard(col("doc_id"), 9, 4).as("s9"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("s9") =!= col("shard"), 1)).as("n_moved"))
        .orderBy(col("shard"))),

    // Zipf rank–frequency fit: OLS slope/intercept of log2(freq) vs
    // log2(rank) over the word census — the one-number corpus health
    // monitor (natural text ≈ slope −1). Milli-unit quantization per
    // point BEFORE the long-exact OLS sums.
    "q_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(Tables.read(s, dir, "documents"), "text")),

    // χ² feature selection: which terms are informative about
    // lang = 'en' — exact 2×2 document-frequency contingency per term,
    // long-arithmetic determinant/denominator, one fixed double chain
    // for the 1e-6-unit report. One term-keyed aggregate; the ranking
    // runs on the vocabulary domain.
    "q_chi2_terms" -> ((s, dir) =>
      Classify.chiSquareTerms(Tables.read(s, dir, "documents"),
          "doc_id", "text", "lang", posLabel = "en", topK = 20)
        .orderBy(col("rank"))),

    // Linear quality probe (the fastText/CCNet "cheap classifier"
    // step): 3 full-batch gradient iterations with per-row gradient
    // contributions quantized to 2^-20-unit longs before the sum, so
    // every weight — and therefore every margin — replays bit-exactly
    // in the unrolled-CTE oracle. Each iteration is one map-side
    // partial global aggregate: iters passes, O(d) driver state,
    // zero data shuffle.
    // The label is the long-document bit (n_chars ≥ its rough median)
    // — the synthetic corpus draws every lang from one vocabulary, so
    // length is the only signal a linear probe can find; the probe
    // recovers it at ~99.6% from the centered features, demonstrating
    // real convergence rather than majority-class collapse.
    "q_quality_logreg" -> ((s, dir) =>
      Classify.logRegQuality(Tables.read(s, dir, "documents"),
          "doc_id", "text", "n_chars", col("n_chars") >= 306,
          iters = 3, lr = 0.5)
        .orderBy(col("doc_id"))),

    // Classifier reliability bins — the EVAL stage closing the probe
    // loop: margins clamped into 8 equal-width bins over [-1e6, 1e6),
    // per-bin volume, positives, and the exact-ppm positive rate.
    // All-integer arithmetic on top of the proven logreg chain.
    "q_calibration" -> ((s, dir) =>
      Classify.calibration(
          Classify.logRegQuality(Tables.read(s, dir, "documents"),
            "doc_id", "text", "n_chars", col("n_chars") >= 306,
            iters = 3, lr = 0.5),
          "margin_e6", "y", lo = -1000000L, hi = 1000000L, buckets = 8)
        .orderBy(col("bucket"))),

    // Length-curriculum staging without a global sort: quantile
    // thresholds from the bounded length census (integer-only
    // cum·stages ≥ j·N test), assignment as a narrow expression over
    // collected threshold literals — the scalable ntile replacement
    // for short-to-long curriculum training.
    "q_curriculum" -> ((s, dir) =>
      graft.ext.Curation.curriculumByLength(
          Tables.read(s, dir, "documents"), "doc_id", "text", stages = 4)
        .orderBy(col("doc_id"))),

    // The probe AS A PIPELINE STAGE: score the corpus, keep the
    // positive margins, shard the survivors into training-export
    // order — classifier-gated curation composed end to end, every
    // piece individually oracle-proven and the composition replayed
    // whole (probe CTE chain → filter → md5 shard ranking).
    "q_probe_gated_export" -> ((s, dir) => {
      val docs = Tables.read(s, dir, "documents")
      val kept = docs.join(
        Classify.logRegQuality(docs, "doc_id", "text", "n_chars",
            col("n_chars") >= 306, iters = 3, lr = 0.5)
          .filter(col("pred") === 1).select("doc_id"),
        "doc_id")
      graft.ext.Sampling.exportShards(kept, col("doc_id"), numShards = 4)
        .select(col("shard"), col("shard_pos"), col("doc_id"))
        .orderBy(col("shard"), col("shard_pos"))
    }),

    // Majority-vote kNN labeler over the int8-quantized exact dot:
    // label propagation from the train split to the held-out vectors.
    "q_knn_classify" -> ((s, dir) => {
      val emb = Tables.read(s, dir, "embeddings")
      Classify.knnClassify(
          emb.filter(pmod(col("vec_id"), lit(5)) =!= 0),
          emb.filter(pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", "label", k = 5)
        .orderBy(col("query_id"))
    }),

    // ── Extension scope: versioned store with time travel ─────────────
    // Lakehouse transaction log reduced to its core: create (v0) →
    // keyed upsert via partition-scoped copy-on-write (v1) → blind
    // append (v2), then TIME TRAVEL back through all three snapshots.
    // The oracle recomputes each version's expected contents from the
    // raw events; matching all three proves the manifest log isolates
    // versions (v0 unchanged after two later commits) and the upsert
    // rewrote merged days without losing carried files.
    "q_time_travel" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val third = ev.filter(col("event_id") % 3 === 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft_vstore_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 3 =!= 0), store)
        VersionedStore.upsert(s, store,
          third.withColumn("value", col("value") * 2))
        VersionedStore.append(s, store,
          third.withColumn("ts", col("ts") + expr("INTERVAL 1000 DAYS"))
            .withColumn("value", col("value") * 3))
        (0 to 2).map { v =>
          VersionedStore.snapshot(s, store, Some(v))
            .agg(count(lit(1)).as("n_rows"),
              countDistinct(col("user_email")).as("n_users"),
              r6(sum(col("value"))).as("sum_value"),
              r6(max(col("value"))).as("max_value"))
            .withColumn("version", lit(v).cast("long"))
            .select(col("version"), col("n_rows"), col("n_users"),
              col("sum_value"), col("max_value"))
        }.reduce(_ unionByName _)
          .orderBy(col("version"))
          // materialize before the finally deletes the store files
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Durable rollback (Delta RESTORE): after an upsert and a delete
    // mutate the store, RESTORE TO v0 publishes a new head whose
    // file set is v0's — metadata-only, data files shared by
    // reference, history intact. The head read must equal the
    // original snapshot exactly, which is what the raw-table oracle
    // proves (both mutations would change the aggregate if any of
    // them leaked through).
    "q_store_restore" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_restore_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev, store)
        VersionedStore.upsert(s, store,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("value", col("value") * 2))
        VersionedStore.delete(s, store, col("event_id") % 5 === 0)
        val rv = VersionedStore.restore(s, store, 0)
        require(rv == 3, s"restore must publish a NEW head, got $rv")
        require(VersionedStore.versions(s, store) == Seq(0, 1, 2, 3),
          "restore must keep the rolled-back history time-travelable")
        VersionedStore.snapshot(s, store) // head — v0 restored
          .groupBy(col("habit"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_email")).as("n_users"),
            r6(sum(col("value"))).as("sum_value"))
          .orderBy(col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Zone-map FILE skipping over the versioned store: both commits
    // range-cluster their files on the leading sort key and record
    // per-file (min, max) sidecars, so the narrow key-range read
    // plans — on the driver, from metadata alone — a strict subset
    // of the live files. The require makes the bench honest: if the
    // clustered layout ever stops pruning, the query fails rather
    // than silently benching a full scan. Results stay exact (the
    // real predicate still runs); the oracle is a plain filtered
    // aggregate over the same rows.
    "q_store_skipping" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_skip_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 2 === 0),
          store, rangeParts = 8)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 2 =!= 0), rangeParts = 8)
        val sel = VersionedStore.snapshotWhere(s, store,
          "user_email", 10L, 39L)
        require(sel.inputFiles.length <
          VersionedStore.snapshot(s, store).inputFiles.length,
          "zone-map skipping planned a full scan — clustering broke")
        sel.groupBy(col("user_email"))
          .agg(count(lit(1)).as("n_events"),
            r6(sum(col("value"))).as("sum_value"))
          .orderBy(col("user_email"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Z-ORDERED store layout (OPTIMIZE ZORDER BY): the commit clusters
    // each day into Morton rectangles over (user_email, value) — per-day
    // cluster splitting (clusterParts) instead of day-first ranges —
    // and zone maps now record DOUBLE columns, so BOTH a user-range
    // read and a value-range read plan strict file subsets from the
    // log alone. Results stay exact (the predicate still runs); the
    // oracle is the plain filtered aggregate pair.
    "q_store_zorder" -> ((s, dir) => {
      import graft.load.{Layout, VersionedStore}
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_zstore_")
      try {
        val store = tmp.toString + "/store"
        val z = Layout.zValue(col("user_email"), 0, 1500,
          col("value"), 0, 600, bits = 12)
        VersionedStore.create(ev, store, clusterParts = 8,
          zorderBy = Some(z))
        val nAll = VersionedStore.snapshot(s, store).inputFiles.length
        val byUser = VersionedStore.snapshotWhere(s, store,
          "user_email", 3L, 7L)
        val byValue = VersionedStore.snapshotWhere(s, store,
          "value", 200.0, 600.0)
        require(byUser.inputFiles.length < nAll,
          "z-order skipping planned a full scan on the user range")
        require(byValue.inputFiles.length < nAll,
          "double zone maps planned a full scan on the value range")
        def agg1(name: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n_events"),
            r6(sum(col("value"))).as("sum_value"))
            .select(lit(name).as("sel"), col("n_events"), col("sum_value"))
        agg1("user_range", byUser).unionByName(agg1("value_range", byValue))
          .orderBy(col("sel"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Distribution drift monitor: PSI between the click and purchase
    // value distributions over exact histogram counts; per-bin
    // contributions quantized to 1e-6 units replay engine-exactly
    // (ln on identical doubles, same discipline as the NB oracle).
    // The data-sized work is two count aggregates; the PSI arithmetic
    // runs on 16 rows.
    "q_drift_psi" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      graft.ext.Profile.psiDrift(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "value", lo = 0.0, hi = 512.0, buckets = 16)
        .orderBy(col("bucket"))
    }),

    // Rank-normalization window analytics: percent_rank (the ECDF
    // position every percentile-feature pipeline starts from) and
    // decile ntile per event type, tie-broken to a total order so
    // both replay exactly. One window shuffle by type.
    "q_percent_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.read(s, dir, "events")
        .filter(col("value").isNotNull &&
          col("event_type").isin("purchase", "click"))
        .select(col("event_type"), col("event_id"),
          r6(percent_rank().over(w)).as("pr"),
          ntile(10).over(w).cast("long").as("decile"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Robust outlier census: median/MAD modified z-score per event
    // type (z = 3.5) — the fences don't move when the outliers
    // arrive, unlike mean/stddev. Exact interpolated quantiles
    // replay bit-level across engines (the q_percentiles precedent).
    "q_robust_outliers" -> ((s, dir) =>
      graft.ext.Profile.robustOutliers(Tables.read(s, dir, "events"),
          "value", Seq("event_type"), z = 3.5)
        .orderBy(col("event_type"))),

    // Corpus n-gram diversity per source: distinct / total word
    // 3-grams in ppm — the cheap compression-ratio proxy (template
    // spam and boilerplate floods collapse it; natural text sits
    // high). One shingle explode + one aggregate; the corpus-level
    // companion of the per-doc repetition ratio.
    "q_ngram_diversity" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.wordShingles(col("text"), 3)).as("sh"))
        .groupBy(col("source"))
        .agg(count_distinct(col("sh")).as("distinct_ngrams"),
          count(lit(1)).as("total_ngrams"))
        .withColumn("diversity_ppm",
          floor(col("distinct_ngrams") * lit(1000000L) /
            col("total_ngrams")).cast("long"))
        .orderBy(col("source"))),

    // The one-look corpus-health dashboard: every monitor's headline
    // number as one (metric, value) row — KS drift, total PSI, robust
    // outlier rows, Zipf slope. Pure composition of proven operators;
    // the dashboard any ingest pipeline pins to its run report.
    "q_corpus_health" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      val click = ev.filter(col("event_type") === "click")
      val purchase = ev.filter(col("event_type") === "purchase")
      val zipf = TextAnalysis.zipfFit(
          Tables.read(s, dir, "documents"), "text")
        .select(lit("zipf_slope_e6").as("metric"),
          col("slope_e6").as("value"))
      val ks = graft.ext.Profile.ksDrift(click, purchase,
          "value", lo = 0.0, hi = 512.0, buckets = 256)
        .select(lit("ks_e6").as("metric"), col("ks_e6").as("value"))
      val psi = graft.ext.Profile.psiDrift(click, purchase,
          "value", lo = 0.0, hi = 512.0, buckets = 16)
        .agg(sum(col("psi_e6")).as("value"))
        .select(lit("psi_total_e6").as("metric"), col("value"))
      val outl = graft.ext.Profile.robustOutliers(ev, "value",
          Seq("event_type"))
        .agg(sum(col("n_outliers")).as("value"))
        .select(lit("outlier_rows").as("metric"), col("value"))
      ks.unionByName(outl).unionByName(psi).unionByName(zipf)
        .orderBy(col("metric"))
    }),

    // Kolmogorov–Smirnov arm of the drift monitor: worst cumulative
    // ECDF gap between the same two distributions, argmax'd on the
    // cross-multiplied INTEGER numerator so bin choice and gap
    // ordering replay engine-exactly; 256 fine bins keep the data
    // work at two histogram passes.
    "q_ks_drift" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      graft.ext.Profile.ksDrift(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "value", lo = 0.0, hi = 512.0, buckets = 256)
    }),

    // Dyadic EWMA smoothing of each user's purchase values: α = 1/2
    // over a 16-row frame, carried as the exact integer numerator
    // ewma_c16 (centi-units · 2^16) so the trend line is
    // bit-reproducible — the per-key trend feature a monitoring or
    // curriculum pipeline derives from raw event streams.
    "q_ewma" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      graft.ext.Profile.dyadicEwma(
          ev.filter(col("event_type") === "purchase"),
          Seq("user_id"), Seq("ts", "event_id"), "value")
        .select(col("user_id"), col("event_id"),
          ntz(col("ts")).as("ts"), col("ewma_c16"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // k-anonymity / l-diversity release audit: QI = (event_type, day,
    // value band), sensitive = user_id; per event_type, how many QI
    // groups fall under k = 5 rows or l = 3 distinct users, and how
    // many rows that exposes. One corpus aggregate + one domain-sized
    // summary aggregate.
    "q_kanon" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      graft.ext.Privacy.anonymityAudit(ev,
          Seq(col("event_type"), to_date(col("ts")),
            floor(col("value") / 32.0)),
          col("user_id"), reportAs = "event_type", k = 5, l = 3)
        .orderBy(col("event_type"))
    }),

    // Metadata-only aggregates: COUNT(*) and min/max of an integral
    // column answered by driver-side arithmetic over the sidecar row
    // counts and zone maps — no scan, no task. The spec proves the
    // no-scan claim by deleting the data files; here the oracle proves
    // exactness against the raw table.
    "q_store_meta_agg" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_meta_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 2 === 0), store)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 2 =!= 0))
        val n = VersionedStore.snapshotRowCount(s, store)
        val (mn, mx) = VersionedStore.snapshotMinMaxLong(s, store,
          "event_id").getOrElse(
          throw new IllegalStateException("zone maps missing"))
        val sp = s
        import sp.implicits._
        Seq((n, mn, mx)).toDF("n_rows", "min_id", "max_id")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Row-level write lineage from metadata alone: the commit id is
    // parsed from the file path Spark tracks per row — no stored
    // column, no join. Even event_ids landed in commit 0, odd in
    // commit 1, so the oracle is the parity split of the raw table.
    "q_store_lineage" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_lin_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 2 === 0), store)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 2 =!= 0))
        VersionedStore.snapshotWithLineage(s, store)
          .groupBy(col("_commit"))
          .agg(count(lit(1)).as("n_rows"),
            r6(sum(col("value"))).as("sum_value"))
          .orderBy(col("_commit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Needle-in-haystack id lookup: commits enable parquet bloom
    // filters on event_id, and snapshotPoint prunes — from footer
    // metadata, on the driver, before any task is scheduled — every
    // file whose blooms prove the id absent. Three commits × 30 days
    // of files collapse to the one file that can hold the row.
    "q_store_pointlookup" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_point_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 3 === 0),
          store, bloomCols = Seq("event_id"))
        for (m <- 1 to 2)
          VersionedStore.append(s, store,
            ev.filter(col("event_id") % 3 === m),
            bloomCols = Seq("event_id"))
        val hit = VersionedStore.snapshotPoint(s, store,
          "event_id", 123L)
        require(hit.inputFiles.length <= 2 && hit.inputFiles.nonEmpty,
          s"bloom point skipping kept ${hit.inputFiles.length} files")
        hit.select(col("event_id"), ntz(col("ts")).as("ts"),
            col("user_email"), col("habit"), col("value"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Stream-static enrichment: events stream ⋈ broadcast customer dim
    // → per-segment rollup; the one-shot replay equals the batch join,
    // which is the oracle.
    "q_stream_enrich" -> ((s, dir) =>
      Streaming.enrichAvailableNow(s, dir,
          Streaming.nextQueryName("graft_enrich"))
        .orderBy(col("c_mktsegment"))),

    // Streaming arm of the drift monitor: the purchase stream replays
    // in one AvailableNow batch against the click reference, the
    // foreachBatch sink collects the per-bin PSI rows — identical to
    // the batch q_drift_psi, and a second batch would double the row
    // count and fail the gate loudly.
    // Streaming arm of the Zipf health monitor: the word census the
    // vocabIngest ledger already maintains IS the fit's sufficient
    // statistic — two ticks' censuses sum and the derived slope must
    // equal the batch q_zipf (shared oracle). One maintained state,
    // two consumers (tokenizer trainer + corpus-health monitor).
    "q_zipf_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_zipfs_")
      try Streaming.zipfAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_zipf"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Streaming arm of the mergeable-quantile rollup: per-tick exact
    // histograms are bin-additive, so quantiles off the summed ledger
    // equal the batch q_quantile_rollup (shared oracle) — percentile
    // monitoring at ingest with sketch-sized state.
    "q_quantile_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_qrs_")
      try Streaming.quantileRollupAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_qroll"))
        .select(col("habit"), col("q_ppm"), col("bucket"),
          col("n_total"), col("est"))
        .orderBy(col("habit"), col("q_ppm"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Late-arrival audit at ingest: rows older than the prior ticks'
    // high-watermark minus the allowed lag are LEDGERED (not dropped)
    // — the lateness profile that sizes a production watermark. Ticks
    // split on the md5 key so the oracle replays tick membership.
    "q_late_audit" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_late_")
      try Streaming.lateAuditAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_late"))
        .orderBy(col("event_type"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Ensemble dedup verdict: a pair is a duplicate when ≥ 2 of the 3
    // independent text detectors (MinHash Jaccard, SimHash Hamming,
    // blocked n-gram Jaccard) agree — the precision move production
    // dedup makes, since each detector alone has its own false-positive
    // geometry. Pure composition of three proven pair relations.
    "q_dedup_ensemble" -> ((s, dir) => {
      val d = Tables.read(s, dir, "documents")
      val mh = Dedup.minhashDupPairs(d, "doc_id", "text", threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val sh = Dedup.simhashDupPairs(d, "doc_id", "text", maxHamming = 7)
        .select(col("id_a"), col("id_b"))
      val ng = Dedup.ngramDupPairs(d, "doc_id", "text", "n_chars",
          threshold = 0.5, blockWidth = 50)
        .select(col("id_a"), col("id_b"))
      mh.unionByName(sh).unionByName(ng)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("votes"))
        .filter(col("votes") >= 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Streaming arm of the bloom-pruned join: per-tick dim blooms OR
    // into exactly the one-pass bitmap, so the merged runtime filter
    // prunes identically to the batch build (shared oracle — the
    // exact join; blooms may only shed non-matches).
    "q_bloom_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_blooms_")
      try Streaming.bloomJoinAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_bloom"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Streaming arm of the HLL distinct-count rollup: per-tick daily
    // sketches union by register max (associative/commutative/
    // idempotent), so weekly estimates off the accumulated ledger
    // satisfy the same 5% envelope as the batch rollup (shared
    // oracle).
    "q_hll_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hlls_")
      try Streaming.hllRollupAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_hll"))
        .orderBy(col("week"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Streaming arm of the CMS frequency monitor: per-tick sketches
    // are cell-wise ADDITIVE under one hash family, so the merged
    // ingest state answers exactly like the single-pass batch sketch —
    // same exact counts, same one-sided eps·N guarantee (shared
    // oracle with q_cms_freq).
    "q_cms_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cmss_")
      try {
        val ev = Tables.read(s, dir, "events")
        val n = ev.filter(col("event_type").isNotNull)
          .agg(count(lit(1)).as("_n"))
        Streaming.cmsAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_cms"))
          .join(broadcast(n))
          .select(col("value").as("event_type"), col("exact_n"),
            (col("est_n") >= col("exact_n") &&
              col("est_n") <= col("exact_n") +
                ceil(lit(0.001) * col("_n")).cast("long")).as("est_ok"))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Generalization ladder: COARSEN the value band (doubling width
    // per rung) until no (type, day, band) group violates k = 5 —
    // k-anonymization as a response, not just an audit. Driver loops
    // over rungs (one 1-row aggregate each, the Lloyd's contract) and
    // stops at the finest compliant resolution.
    "q_kanon_ladder" -> ((s, dir) =>
      graft.ext.Privacy.generalizationLadder(
        Tables.read(s, dir, "events"),
        Seq(col("event_type"), to_date(col("ts"))),
        col("value"), widths = Seq(32L, 64L, 128L, 256L, 512L), k = 5)),

    // Streaming arm of the k-anonymity audit: two hash ticks each
    // write their (QI, user) row-count census — the audit's ADDITIVE
    // sufficient statistic (per-group distinct users is not additive;
    // the census is) — and the derived release audit must equal the
    // batch q_kanon (shared oracle).
    "q_kanon_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_kanon_")
      try Streaming.kanonAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_kanon"))
        .orderBy(col("event_type"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_drift_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_drift_")
      try Streaming.driftAvailableNow(s, dir, tmp.toString,
          Streaming.nextQueryName("graft_drift"))
        .localCheckpoint(true)
      finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // OPTIMIZE: two range-clustered commits leave every day split
    // across both, compact coalesces each day back to freshly
    // clustered files in a new commit — row-preserving (the oracle is
    // the plain aggregate over all events), file-count-reducing (the
    // require), history intact.
    "q_store_compact" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_compact_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 2 === 0),
          store, rangeParts = 8)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 2 =!= 0), rangeParts = 8)
        val before = VersionedStore.snapshot(s, store).inputFiles.length
        VersionedStore.compact(s, store, maxFilesPerDay = 1,
          rangeParts = 4)
        val snap = VersionedStore.snapshot(s, store)
        require(snap.inputFiles.length < before,
          "compaction did not reduce the live file count")
        snap.groupBy(col("habit"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_email")).as("n_users"),
            r6(sum(col("value"))).as("sum_value"))
          .orderBy(col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Change data feed off the manifest diff: update / delete / insert
    // commits each produce exactly their own ops (unchanged rows
    // rewritten alongside real changes drop out), with old/new values
    // summed in exact 1e-6-unit longs.
    "q_version_diff" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_vdiff_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev, store)
        VersionedStore.upsert(s, store,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("value", col("value") * 2))
        VersionedStore.delete(s, store, col("user_email") % 7 === 0)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("ts", col("ts") + expr("INTERVAL 1000 DAYS"))
            .withColumn("value", col("value") * 3))
        def sumE6(c: Column) =
          sum(coalesce(round(c * 1e6).cast("long"), lit(0L)))
        (1 to 3).map { v =>
          VersionedStore.changes(s, store, v - 1, v)
            .agg(count(lit(1)).as("n_rows"),
              sumE6(col("value_old")).as("sum_old_e6"),
              sumE6(col("value_new")).as("sum_new_e6"),
              max(col("op")).as("op_max"), min(col("op")).as("op_min"))
            .withColumn("to_version", lit(v).cast("long"))
            // op_min == op_max proves each commit produced ONE op kind
            .select(col("to_version"), col("op_min"), col("op_max"),
              col("n_rows"), col("sum_old_e6"), col("sum_new_e6"))
        }.reduce(_ unionByName _)
          .orderBy(col("to_version"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Incremental matview maintenance off the change feed: the daily
    // rollup is maintained by applying two commits' deltas (update,
    // then delete) — BIT-EQUAL to recomputing from the head snapshot,
    // which is exactly what the oracle does.
    "q_matview_incremental" -> ((s, dir) => {
      import graft.load.{IncrementalView, VersionedStore}
      val ev = Tables.eventsAsHabits(s, dir)
      val dims = Seq("day", "user_email", "habit")
      def e6(c: Column) = round(c * 1e6).cast("long")
      def withDay(df: DataFrame) =
        df.withColumn("day", date_trunc("day", col("ts")))
      val tmp = java.nio.file.Files.createTempDirectory("graft_mview_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev, store)
        VersionedStore.upsert(s, store,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("value", col("value") * 2))
        VersionedStore.delete(s, store, col("user_email") % 7 === 0)
        val mv0 = IncrementalView.fromSnapshot(
          withDay(VersionedStore.snapshot(s, store, Some(0))),
          dims, e6(col("value")))
        val mv2 = (1 to 2).foldLeft(mv0) { (mv, v) =>
          IncrementalView.applyDelta(mv,
            withDay(VersionedStore.changes(s, store, v - 1, v)),
            dims, e6(col("value_old")), e6(col("value_new")))
        }
        mv2.select(ntz(col("day")).as("day"), col("user_email"),
            col("habit"), col("n"), col("sum_e6"))
          .orderBy(col("day"), col("user_email"), col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Store growth audit, metadata-only: per-version COUNT(*) and
    // event_id min/max answered from sidecar row counts + zone maps
    // across create → append → delete — no version is ever scanned,
    // and the delete's day rewrites must keep the metadata exact.
    "q_store_history" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_hist_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev.filter(col("event_id") % 2 === 0), store)
        VersionedStore.append(s, store,
          ev.filter(col("event_id") % 2 =!= 0))
        VersionedStore.delete(s, store, col("user_email") % 9 === 0)
        val sp = s
        import sp.implicits._
        VersionedStore.versions(s, store).map { v =>
          val n = VersionedStore.snapshotRowCount(s, store, Some(v))
          val (mn, mx) = VersionedStore.snapshotMinMaxLong(s, store,
            "event_id", version = Some(v)).getOrElse(
            throw new IllegalStateException(s"zone maps missing at v$v"))
          (v.toLong, n, mn, mx)
        }.toDF("version", "n_rows", "min_id", "max_id")
          .orderBy(col("version"))
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Declarative MERGE INTO over the versioned store — the full SQL
    // clause set in one commit: delete matched zero-value rows, update
    // matched rows only when the source value is larger, insert new
    // rows gated by a source predicate. The oracle reconstructs the
    // final state with the same CASE logic from the raw table.
    "q_merge_into" -> ((s, dir) => {
      import graft.load.VersionedStore
      val ev = Tables.eventsAsHabits(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_merge_")
      try {
        val store = tmp.toString + "/store"
        VersionedStore.create(ev, store)
        val upd = ev.filter(col("event_id") % 4 === 0)
          .withColumn("value", col("value") * 3)
        val ins = ev.filter(col("event_id") % 5 === 0)
          .withColumn("event_id", col("event_id") + 10000000L)
          .withColumn("ts", col("ts") + expr("INTERVAL 2000 DAYS"))
          .withColumn("value", col("value") + 1)
        VersionedStore.mergeInto(s, store, upd.unionByName(ins),
          matchedUpdate = expr("s.value > t.value"),
          matchedDelete = expr("t.value = 0"),
          notMatchedInsert = expr("s.value <= 400"))
        VersionedStore.snapshot(s, store)
          .select(col("event_id"), ntz(col("ts")).as("ts"),
            col("user_email"), col("habit"), col("value"))
          .orderBy(col("event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // JOIN-view incremental maintenance: a weighted fact⋈dim aggregate
    // kept current from BOTH stores' change feeds via the two-sided
    // delta rule ΔV = ΔA⋈B_new ∪ A_old⋈ΔB in signed long arithmetic —
    // the fact side re-values a third of its rows while the dim side
    // reweights some users and drops others, and the maintained view
    // must be BIT-EQUAL to the oracle's recompute of the final join.
    "q_matview_join" -> ((s, dir) => {
      import graft.load.{IncrementalView, VersionedStore}
      val ev = Tables.eventsAsHabits(s, dir)
      def e6(c: Column) = round(c * 1e6).cast("long")
      val contrib = e6(col("value") * col("weight"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_mvjoin_")
      try {
        val (factPath, dimPath) = (tmp.toString + "/fact", tmp.toString + "/dim")
        // fact v0 = all events; v1 re-values every third event
        VersionedStore.create(ev, factPath)
        VersionedStore.upsert(s, factPath,
          ev.filter(col("event_id") % 3 === 0)
            .withColumn("value", col("value") * 2))
        // dim v0 = per-user weight; v1 reweights every 4th user,
        // v2 deletes every 11th — exercising the A_old⋈ΔB leg with
        // updates AND deletes
        val dim0 = ev.select(col("user_email")).distinct()
          .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
          .withColumn("weight", (col("user_email") % 5 + 1).cast("double"))
        VersionedStore.create(dim0, dimPath, sortCols = Seq("user_email"))
        VersionedStore.upsert(s, dimPath,
          dim0.filter(col("user_email") % 4 === 0)
            .withColumn("weight", col("weight") + 10),
          keys = Seq("user_email"), sortCols = Seq("user_email"))
        VersionedStore.delete(s, dimPath, col("user_email") % 11 === 0,
          sortCols = Seq("user_email"))
        val a0 = VersionedStore.snapshot(s, factPath, Some(0))
          .select(col("user_email"), col("habit"), col("value"))
        val b0 = VersionedStore.snapshot(s, dimPath, Some(0))
          .select(col("user_email"), col("weight"))
        val mv0 = IncrementalView.fromSnapshot(
          a0.join(b0, "user_email"), Seq("habit"), contrib)
        val zA = IncrementalView.zRelation(
          VersionedStore.changes(s, factPath, 0, 1)
            .select(col("user_email"), col("habit"), col("op"),
              col("value_old"), col("value_new")))
        val zB = IncrementalView.zRelation(
          VersionedStore.changes(s, dimPath, 0, 2, keys = Seq("user_email"))
            .select(col("user_email"), col("op"),
              col("weight_old"), col("weight_new")))
        val bNew = VersionedStore.snapshot(s, dimPath)
          .select(col("user_email"), col("weight"))
        IncrementalView.applyJoinDelta(mv0, zA, bNew, a0, zB,
            Seq("user_email"), Seq("habit"), contrib)
          .orderBy(col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Streaming JOIN-view maintenance: events stream into the fact
    // store over THREE micro-batch commits (maxFilesPerTrigger=1 over
    // a 3-file staging) and each commit's manifest-diff change feed
    // advances the fact⋈dim view via applyJoinDelta — the head view
    // generation must equal recomputing the weighted join aggregate
    // over all events.
    "q_matview_join_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jvs_")
      try {
        Streaming.joinViewAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_jview"))
          .orderBy(col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // TWO-SIDED streaming JOIN-view maintenance: the dim itself
    // changes mid-stream (batch 1 reweights every user%3==0 user)
    // while facts accrete over three commits — each tick advances the
    // view with BOTH stores' feeds (ΔA⋈B_new ∪ A_old⋈ΔB); the head
    // view must equal the weighted join aggregate under the FINAL dim.
    "q_matview_2sided_stream" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jv2_")
      try {
        Streaming.joinViewTwoSidedAvailableNow(s, dir, tmp.toString,
            Streaming.nextQueryName("graft_jview2"))
          .orderBy(col("habit"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    // Exactly-once streaming ingest into the versioned store: the same
    // replay runs TWICE with fresh checkpoints — without the committed
    // batch-id dedup the second run would re-commit (n_versions = 2);
    // the oracle asserts one version and the untouched event rows.
    // Backfill → streaming handoff: half the history bulk-loads as one
    // commit, the live half streams into the SAME store exactly-once;
    // the snapshot must hold every event once across the seam, in
    // exactly two commits.
    "q_backfill_handoff" -> ((s, dir) => {
      import graft.load.VersionedStore
      val tmp = java.nio.file.Files.createTempDirectory("graft_bfh_")
      try {
        val store = tmp.toString + "/store"
        Streaming.backfillHandoffAvailableNow(s, dir, store, s"$tmp/cp",
          Streaming.nextQueryName("graft_bfh"))
        VersionedStore.snapshot(s, store)
          .select(col("event_id"), ntz(col("ts")).as("ts"),
            col("user_email"), col("habit"), col("value"),
            lit(VersionedStore.versions(s, store).length).cast("long")
              .as("n_versions"))
          .orderBy(col("event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }),

    "q_store_ingest_stream" -> ((s, dir) => {
      import graft.load.VersionedStore
      val tmp = java.nio.file.Files.createTempDirectory("graft_vingest_")
      try {
        val store = tmp.toString + "/store"
        for (cp <- Seq("cp1", "cp2"))
          Streaming.versionedIngestAvailableNow(s, dir, store,
            s"$tmp/$cp", Streaming.nextQueryName("graft_vin"))
        VersionedStore.snapshot(s, store)
          .select(col("event_id"), ntz(col("ts")).as("ts"),
            col("user_email"), col("habit"), col("value"),
            lit(VersionedStore.versions(s, store).length).cast("long")
              .as("n_versions"))
          .orderBy(col("event_id"))
          .localCheckpoint(true)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }))

  /** The deterministic CDC change feed q_cdc_apply and q_cdc_stream
    * share: seq-superseded stale updates, winning updates, deletes,
    * and negative-mirror-id inserts (collision-proof against real
    * event_ids at any scale factor — testdata ids are non-negative).
    * The stale seq=1 update must lose to the seq=2 winner; the shared
    * oracle's closed form assumes exactly that. */
  private def cdcFeed(ev: DataFrame): DataFrame = {
    def feedCols(value: Column, op: String, seq: Long) = Seq(
      col("user_id"), col("event_type"), value.as("value"),
      lit(op).as("op"), lit(seq).as("seq"))
    val stale = ev.filter(col("event_id") % 7 === 1)
      .select(col("event_id") +: feedCols(lit(-1d), "U", 1L): _*)
    val updates = ev.filter(col("event_id") % 7 === 1)
      .select(col("event_id") +: feedCols(col("value") + 100d, "U", 2L): _*)
    val deletes = ev.filter(col("event_id") % 7 === 2)
      .select(col("event_id") +:
        feedCols(lit(null).cast("double"), "D", 3L): _*)
    val inserts = ev.filter(col("event_id") % 7 === 3)
      .select((-col("event_id") - 1L).as("event_id") +:
        feedCols(col("value"), "I", 1L): _*)
    stale.union(updates).union(deletes).union(inserts)
  }

  /** DuckDB replay of [[graft.ext.Similarity.kcenterSelect]] at k
    * rounds: the shared global-int8 quantization, then the greedy
    * farthest-point traversal unrolled — kc$j is round j's argmax
    * under the pinned (mind DESC, vec_id) order, kd$j folds the new
    * center into every point's min distance. All-integer squared
    * distances (‖a‖² + ‖b‖² − 2a·b on BIGINT codes), so the traversal
    * replays engine-exactly. kd$j is MATERIALIZED: each generation
    * feeds both the next argmax and the next fold. */
  /** DuckDB replay of [[graft.ext.Similarity.mmrSelect]] at
    * query = vec_id 0: the [[kcenterOracle]] unrolled-greedy shape
    * with (rel − maxsim) argmax instead of farthest-point. */
  private def mmrOracle(k: Int): String = {
    def dot(a: String, b: String): String =
      s"list_sum([$a.qq[i] * $b.qq[i] " +
        s"for i in generate_series(1, len($a.qq))])::BIGINT"
    val sb = new StringBuilder
    sb.append(
      """WITH mm AS (SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                AS ma
            FROM embeddings),
         mq0 AS (SELECT vec_id,
              CASE WHEN ma = 0
                THEN list_transform(embedding, x -> 0::BIGINT)
                ELSE list_transform(embedding,
                  x -> floor(x::DOUBLE / ma * 127 + 0.5)::BIGINT)
              END AS qq
            FROM mm),
         mqv AS (SELECT qq FROM mq0 WHERE vec_id = 0),
         mc AS (SELECT b.vec_id, b.qq,
              list_sum([b.qq[i] * q.qq[i]
                for i in generate_series(1, len(b.qq))])::BIGINT AS rel
            FROM mq0 b, mqv q WHERE b.vec_id <> 0),
         ms1 AS (SELECT vec_id, qq, rel FROM mc
            ORDER BY rel DESC, vec_id LIMIT 1),
         md1 AS MATERIALIZED (SELECT c.vec_id, c.qq, c.rel,
              """ + dot("c", "s") + """ AS maxsim
            FROM mc c, ms1 s WHERE c.vec_id <> s.vec_id)""")
    for (j <- 2 to k) {
      sb.append(s""",
         ms$j AS (SELECT vec_id, qq, rel, maxsim,
              (rel - maxsim) AS score FROM md${j - 1}
            ORDER BY (rel - maxsim) DESC, vec_id LIMIT 1)""")
      if (j < k) sb.append(s""",
         md$j AS MATERIALIZED (SELECT d.vec_id, d.qq, d.rel,
              greatest(d.maxsim, ${dot("d", "s")}) AS maxsim
            FROM md${j - 1} d, ms$j s WHERE d.vec_id <> s.vec_id)""")
    }
    sb.append(
      "\n         SELECT * FROM (SELECT 1::BIGINT AS round, vec_id, " +
        "rel, rel AS score FROM ms1")
    sb.append((2 to k).map(j =>
      s"\n         UNION ALL SELECT ${j}::BIGINT, vec_id, rel, score " +
        s"FROM ms$j").mkString)
    sb.append(") ORDER BY round")
    sb.toString
  }

  private def kcenterOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH km AS (SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                AS ma
            FROM embeddings),
         kq AS (SELECT vec_id,
              CASE WHEN ma = 0
                THEN list_transform(embedding, x -> 0::BIGINT)
                ELSE list_transform(embedding,
                  x -> floor(x::DOUBLE / ma * 127 + 0.5)::BIGINT)
              END AS qq
            FROM km),
         kb AS (SELECT vec_id, qq,
              list_sum([x * x for x in qq])::BIGINT AS qnorm FROM kq),
         kc1 AS (SELECT vec_id, qq, qnorm FROM kb ORDER BY vec_id LIMIT 1),
         kd1 AS MATERIALIZED (SELECT b.vec_id, b.qq, b.qnorm,
              (b.qnorm + c.qnorm - 2 * list_sum(
                [b.qq[i] * c.qq[i]
                 for i in generate_series(1, len(b.qq))])::BIGINT) AS mind
            FROM kb b, kc1 c)""")
    for (j <- 2 to k) {
      sb.append(s""",
         kc$j AS (SELECT vec_id, qq, qnorm, mind FROM kd${j - 1}
              ORDER BY mind DESC, vec_id LIMIT 1)""")
      if (j < k) sb.append(s""",
         kd$j AS MATERIALIZED (SELECT b.vec_id, b.qq, b.qnorm,
              least(b.mind, b.qnorm + c.qnorm - 2 * list_sum(
                [b.qq[i] * c.qq[i]
                 for i in generate_series(1, len(b.qq))])::BIGINT) AS mind
            FROM kd${j - 1} b, kc$j c)""")
    }
    sb.append(
      "\n         SELECT * FROM (SELECT 1::BIGINT AS round, vec_id, " +
        "0::BIGINT AS radius FROM kc1")
    sb.append((2 to k).map(j =>
      s"\n         UNION ALL SELECT ${j}::BIGINT, vec_id, mind::BIGINT " +
        s"FROM kc$j").mkString)
    sb.append(") ORDER BY round")
    sb.toString
  }

  /** Shared by the batch (q_hopping_window) and streaming
    * (q_hopping_stream) hopping rollups: duration 2d / slide 1d puts
    * every event in exactly the windows starting at its own day and
    * the day before (epoch-aligned starts). */
  private val hoppingOracle: String =
    """SELECT date_trunc('day', ts) - k.k * INTERVAL 1 DAY AS win_start,
              event_type, count(*)::BIGINT AS n,
              round(sum(value), 6) AS sum_value
       FROM events, (SELECT unnest([0, 1]) AS k) k
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Closed form of [[cdcFeed]] applied to the events table — shared
    * by the batch (q_cdc_apply) and streamed (q_cdc_stream) gates. */
  private val cdcApplyOracle: String =
    """SELECT event_id, user_id, event_type,
              CASE WHEN event_id % 7 = 1 THEN value + 100
                   ELSE value END AS value
       FROM events WHERE event_id % 7 <> 2
       UNION ALL
       SELECT -event_id - 1, user_id, event_type, value
       FROM events WHERE event_id % 7 = 3
       ORDER BY event_id"""

  /** One oracle for the composed as-of join and both native physical
    * forms — all three gates assert the same DuckDB ASOF LEFT JOIN. */
  private val asofOracle =
    """WITH clicks AS (SELECT event_id, user_id AS user_email, ts
            FROM events WHERE event_type = 'click'),
       purch AS (SELECT user_id AS user_email, ts,
              round(max(value), 6) AS pvalue
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
       SELECT c.event_id, c.ts, c.user_email,
              p.ts AS asof_ts, p.pvalue AS asof_pvalue
       FROM clicks c ASOF LEFT JOIN purch p
         ON c.user_email = p.user_email AND c.ts >= p.ts
       ORDER BY c.event_id"""

  /** One oracle for both the one-shot rollup and its incremental
    * state-merge equivalent — a single definition so a future fix can't
    * drift between the two gates. */
  private val habitDailyOracle =
    """SELECT date_trunc('day', ts) AS day,
                user_id AS user_email,
                event_type AS habit,
                count(*) FILTER (WHERE value >= 1) AS count_done,
                round(avg(value), 6) AS avg_value,
                round(sum(value) FILTER (WHERE event_type = 'purchase'), 6)
                  AS sum_meditation
         FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** DuckDB-equivalent SQL per query (same parquet tables, table name =
    * file stem). Omitted keys get a weaker rows-only check. */
  /** The deterministic hash split the curation pipeline applies
    * (`Sampling.splitLabel` with train<90, val otherwise), in DuckDB
    * form — shared by the q_curation and q_pack_curated oracles. */
  private lazy val curationSplitSql: String =
    """CASE WHEN ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 15))::UBIGINT
                       % 100 < 90 THEN 'train' ELSE 'val' END"""

  /** Everything q_curation computes up to the dedup-cluster relation —
    * language scores → best-lang gate → quality gate → simhash →
    * pigeonhole candidate pairs → recursive connected components. The
    * q_pack_curated oracle extends these CTEs with the packing window,
    * so both oracles stay cell-identical to the ONE shared pipeline
    * definition instead of drifting as two copies. */
  private lazy val curationOraclePrefix: String = {
    val markers = TextAnalysis.LangMarkers.map { case (l, ms) =>
      l -> ms.map(m => s"'$m'").mkString("[", ", ", "]")
    }
    val scores = markers.map { case (l, arr) =>
      s"len(list_filter(l, x -> list_contains($arr, x))) AS s_$l"
    }.mkString(",\n                ")
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN s_$l > 0 AND s_$l = best THEN '$l'").mkString(" ")
    s"""WITH RECURSIVE
         t AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         sc AS (SELECT doc_id, text, l, $scores FROM t),
         bb AS (SELECT *, $best AS best FROM sc),
         lng AS (SELECT doc_id, text, l, CASE $cases ELSE 'und' END AS lang
              FROM bb),
         q AS (SELECT doc_id, text, l, lang, len(l) AS n_tokens,
                (length(text) - (len(l) - 1))::DOUBLE / len(l)::DOUBLE AS mtl,
                length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                  / greatest(length(text), 1)::DOUBLE AS pr,
                len(list_filter(l, x -> list_contains(${markers.head._2}, x)))::DOUBLE
                  / greatest(len(l), 1)::DOUBLE AS sr
              FROM lng),
         kept AS (SELECT doc_id, text, l, n_tokens,
                25.0 * least(n_tokens::DOUBLE / 50.0, 1.0)
                  + 25.0 * least(mtl / 6.0, 1.0)
                  + 25.0 * (1.0 - pr)
                  + 25.0 * least(sr * 8.0, 1.0) AS quality
              FROM q WHERE lang = 'en') ,
         keptf AS (SELECT * FROM kept WHERE quality >= 60.0),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM keptf),
         sh AS (SELECT doc_id, unnest(ss) AS s FROM shl),
         h AS (SELECT doc_id,
                ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT AS h FROM sh),
         bits AS (SELECT doc_id, p.p AS p,
                CASE WHEN (h >> p.p) & 1 = 1 THEN 1 ELSE -1 END AS v
              FROM h, (SELECT unnest(generate_series(0, 59)) AS p) p),
         sv AS (SELECT doc_id, p, sum(v) AS sv FROM bits GROUP BY doc_id, p),
         sig AS (SELECT doc_id, sum(CASE WHEN sv > 0 THEN (1::BIGINT << p)
                                         ELSE 0 END)::BIGINT AS simhash
              FROM sv GROUP BY doc_id),
         chunked AS (SELECT doc_id, simhash, c.c AS chunk,
                (simhash >> (c.c * 8)) & 255 AS ckey
              FROM sig, (SELECT unnest(generate_series(0, 7)) AS c) c),
         prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM chunked a JOIN chunked b
                ON a.chunk = b.chunk AND a.ckey = b.ckey
                   AND a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= 7),
         edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                   UNION ALL SELECT id_b, id_a FROM prs),
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)"""
  }

  /** One oracle for batch sessionize and its streaming replay — both
    * gates assert the same gaps-and-islands session counts. */
  private val sessionizeOracle =
    """WITH g AS (
         SELECT user_id,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       )
       SELECT user_id AS user_email, sum(new_s)::BIGINT AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY 1 ORDER BY 1"""

  /** Unrolled replay of [[graft.ext.Graph.pageRank]] over the simhash
    * edge relation: all-integer ranks (1e-12 units), per-edge
    * contribution `rank // deg`, damping update in longs — `//` floors
    * like Scala's `/` because every value is positive. */
  /** The `n`/`deg`/`it0..itN` integer-PageRank CTE chain over the
    * `edges` relation, shared by [[pageRankOracle]] and the canonical-
    * selection oracle. */
  private def pageRankChainSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""it$t AS (SELECT d.doc_id AS id,
              (((1000000 - 850000) * (1000000000000 // n.n)) // 1000000
                + (850000 * coalesce(s.s, 0)) // 1000000)::BIGINT AS rank
            FROM documents d CROSS JOIN n LEFT JOIN (
              SELECT e.dst AS id, sum(r.rank // g.deg)::BIGINT AS s
              FROM edges e JOIN it${t - 1} r ON r.id = e.src
              JOIN deg g ON g.src = e.src
              GROUP BY 1) s ON s.id = d.doc_id)"""
    }
    s"""n AS (SELECT count(*) AS n FROM documents),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         it0 AS (SELECT d.doc_id AS id,
              (1000000000000 // n.n)::BIGINT AS rank
            FROM documents d CROSS JOIN n),
         ${steps.mkString(",\n         ")}"""
  }

  private def pageRankOracle(iters: Int): String =
    s"""WITH $simhashEdgesCte,
         ${pageRankChainSql(iters)}
         SELECT id AS doc_id, rank AS rank_e12 FROM it$iters
         ORDER BY doc_id"""

  /** Shared simhash near-dup EDGE relation (CTE chain through
    * `edges`): used by the clusters oracle and the PageRank oracle. */
  private val simhashEdgesCte =
    """tok AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS s FROM shl),
         h AS (SELECT doc_id,
                ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT AS h FROM sh),
         bits AS (SELECT doc_id, p.p AS p,
                CASE WHEN (h >> p.p) & 1 = 1 THEN 1 ELSE -1 END AS v
              FROM h, (SELECT unnest(generate_series(0, 59)) AS p) p),
         sv AS (SELECT doc_id, p, sum(v) AS sv FROM bits GROUP BY doc_id, p),
         sig AS (SELECT doc_id, sum(CASE WHEN sv > 0 THEN (1::BIGINT << p)
                                         ELSE 0 END)::BIGINT AS simhash
              FROM sv GROUP BY doc_id),
         chunked AS (SELECT doc_id, simhash, c.c AS chunk,
                (simhash >> (c.c * 8)) & 255 AS ckey
              FROM sig, (SELECT unnest(generate_series(0, 7)) AS c) c),
         prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM chunked a JOIN chunked b
                ON a.chunk = b.chunk AND a.ckey = b.ckey
                   AND a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= 7),
         edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                   UNION ALL SELECT id_b, id_a FROM prs)"""

  /** DuckDB replay of [[graft.ext.Multimodal.ppmGradient]]: interior
    * cells enumerate as j with y = 1 + j/14, x = 1 + j%14 (16-wide
    * images ⇒ 14 interior columns); all arithmetic is integer, so the
    * replay is definitional. */
  private def ppmGradientOracle: String = {
    def l(dx: Int, dy: Int): String =
      s"l[((1 + (j // 14)) + ($dy)) * 16 + ((1 + (j % 14)) + ($dx)) + 1]"
    val gx = s"(${l(1, -1)} + 2 * ${l(1, 0)} + ${l(1, 1)}) - " +
      s"(${l(-1, -1)} + 2 * ${l(-1, 0)} + ${l(-1, 1)})"
    val gy = s"(${l(-1, 1)} + 2 * ${l(0, 1)} + ${l(1, 1)}) - " +
      s"(${l(-1, -1)} + 2 * ${l(0, -1)} + ${l(1, -1)})"
    s"""WITH d AS (SELECT doc_id, text, (length(text) // 48)::INT AS h
               FROM documents WHERE length(text) >= 48),
         px AS (SELECT doc_id, h,
                [ascii(x)::BIGINT
                 for x in string_split(substring(text, 1, 48 * h), '')] AS bs
               FROM d),
         lm AS (SELECT doc_id, h,
                [bs[3 * i - 2] + bs[3 * i - 1] + bs[3 * i]
                 for i in generate_series(1, 16 * h)] AS l
               FROM px)
         SELECT doc_id::BIGINT AS media_id, 16::BIGINT AS width,
                h::BIGINT AS height,
                coalesce(list_sum([abs($gx) + abs($gy)
                  for j in generate_series(0, 14 * (h - 2) - 1)]), 0)
                  ::BIGINT AS grad_energy
         FROM lm ORDER BY media_id"""
  }

  /** Content-defined chunk relation (doc_id, source, chunk) — shared
    * by the batch stats, the ingest-ledger gate, and the incremental
    * probe. */
  private val chunkRelationCte =
    """WITH d AS (SELECT doc_id, source, text, length(text) AS n
              FROM documents),
         st AS (SELECT doc_id, source, text, n,
              list_prepend(1, [i for i in generate_series(2, n - 7)
                if ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::UBIGINT
                  % 32 = 0]) AS starts
            FROM d),
         ch AS (SELECT doc_id, source, unnest([substr(text, starts[j],
                ((CASE WHEN j < len(starts) THEN starts[j + 1]
                  ELSE n + 1 END) - starts[j])::INT)
                for j in generate_series(1, len(starts))]) AS chunk
            FROM st)"""

  /** Shared by q_dedup_chunks and the chunk-census ingest gate. */
  private def chunkStatsOracle: String =
    s"""$chunkRelationCte,
         g AS (SELECT source, chunk, count(*) AS cnt,
                min(length(chunk)) AS len
            FROM ch GROUP BY 1, 2)
         SELECT source, sum(cnt)::BIGINT AS n_chunks,
              count(*)::BIGINT AS n_distinct,
              (sum(cnt) - count(*))::BIGINT AS dup_chunks,
              coalesce(sum((cnt - 1) * len), 0)::BIGINT AS dup_bytes
         FROM g GROUP BY 1 ORDER BY 1"""

  /** Shared by q_dedup_simhash_pairs and the ensemble vote. */
  private val simhashPairsOracle =
    """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS s FROM shl),
         h AS (SELECT doc_id,
                ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT AS h FROM sh),
         bits AS (SELECT doc_id, p.p AS p,
                CASE WHEN (h >> p.p) & 1 = 1 THEN 1 ELSE -1 END AS v
              FROM h, (SELECT unnest(generate_series(0, 59)) AS p) p),
         sv AS (SELECT doc_id, p, sum(v) AS sv FROM bits GROUP BY doc_id, p),
         sig AS (SELECT doc_id, sum(CASE WHEN sv > 0 THEN (1::BIGINT << p)
                                         ELSE 0 END)::BIGINT AS simhash
              FROM sv GROUP BY doc_id),
         chunked AS (SELECT doc_id, simhash, c.c AS chunk,
                (simhash >> (c.c * 8)) & 255 AS ckey
              FROM sig, (SELECT unnest(generate_series(0, 7)) AS c) c),
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT))::BIGINT
                  AS hamming
              FROM chunked a JOIN chunked b
                ON a.chunk = b.chunk AND a.ckey = b.ckey
                   AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, hamming FROM pairs
         WHERE hamming <= 7 ORDER BY id_a, id_b"""

  /** Majority vote over the three text detectors' pair relations —
    * each a full proven oracle, nested as a subquery CTE. */
  private def dedupEnsembleOracle: String =
    s"""WITH emh AS (${minhashOracleSql("")}),
         esh AS ($simhashPairsOracle),
         eng AS ($ngramOracleSql)
         SELECT id_a, id_b, count(*)::BIGINT AS votes
         FROM (SELECT id_a, id_b FROM emh
               UNION ALL SELECT id_a, id_b FROM esh
               UNION ALL SELECT id_a, id_b FROM eng)
         GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2"""

  /** Shared by the batch fit (q_zipf) and the word-census ingest gate
    * (q_zipf_stream): the census is the fit's sufficient statistic. */
  private val zipfOracle =
    """WITH c AS (SELECT w, count(*)::BIGINT AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w <> '' GROUP BY 1),
         p AS (SELECT round(1e3 * log2(
                (row_number() OVER (ORDER BY cnt DESC, w))::DOUBLE))
                ::BIGINT AS x,
              round(1e3 * log2(cnt::DOUBLE))::BIGINT AS y
            FROM c),
         sums AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
              sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
              sum(x * x)::BIGINT AS sxx FROM p),
         d AS (SELECT n AS n_terms, (n * sxy - sx * sy) AS num_s,
              (sy * sxx - sx * sxy) AS num_i,
              (n * sxx - sx * sx) AS den FROM sums)
         SELECT n_terms,
              CASE WHEN den = 0 THEN 0::BIGINT
                ELSE CAST(round(1e6 * num_s / den::DOUBLE) AS BIGINT)
              END AS slope_e6,
              CASE WHEN den = 0 THEN 0::BIGINT
                ELSE CAST(round(1e3 * num_i / den::DOUBLE) AS BIGINT)
              END AS intercept_e6
         FROM d"""

  /** Shared by the batch rollup (q_quantile_rollup) and the
    * histogram-ledger ingest gate (q_quantile_stream): bin counts are
    * additive, so the summed per-tick sketches answer identically. */
  private val quantileRollupOracle =
    """WITH h AS (SELECT event_type AS habit, date_trunc('day', ts) AS day,
                least(greatest(floor((value - 0.0) / 10.0), 0), 63)::BIGINT
                  AS bucket,
                count(*)::BIGINT AS n
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         m AS (SELECT habit, bucket, sum(n)::BIGINT AS n
              FROM h GROUP BY 1, 2),
         c AS (SELECT habit, bucket, n,
                sum(n) OVER (PARTITION BY habit ORDER BY bucket
                  ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
                sum(n) OVER (PARTITION BY habit)::BIGINT AS total
              FROM m),
         q AS (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS q_ppm),
         sel AS (SELECT c.habit, q.q_ppm, min(c.bucket)::BIGINT AS bucket,
                max(c.total)::BIGINT AS n_total
              FROM c CROSS JOIN q
              WHERE c.cum * 1000000 >= q.q_ppm * c.total
              GROUP BY 1, 2)
         SELECT habit, q_ppm, bucket, n_total,
                round(0.0 + 10.0 * (bucket + 1), 6) AS est
         FROM sel ORDER BY habit, q_ppm"""

  /** Shared by q_robust_outliers and the corpus-health dashboard. */
  private val robustOutliersOracle =
    """WITH m AS (SELECT event_type,
              quantile_cont(value, 0.5) AS med
            FROM events WHERE value IS NOT NULL GROUP BY 1),
         d AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
            FROM events e JOIN m USING (event_type)
            WHERE e.value IS NOT NULL),
         md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM d GROUP BY 1)
         SELECT d.event_type, count(*)::BIGINT AS n,
              round(min(d.med), 6) AS med,
              round(min(md.mad), 6) AS mad,
              count(*) FILTER (WHERE md.mad > 0
                  AND d.adev * 0.6745 > 3.5 * md.mad)
                ::BIGINT AS n_outliers
         FROM d JOIN md USING (event_type)
         GROUP BY 1 ORDER BY 1"""

  /** The one-look corpus-health dashboard: each proven monitor's
    * headline number as one (metric, value) row — pure composition of
    * the shared oracle texts. */
  private def corpusHealthOracle: String =
    s"""WITH hz AS ($zipfOracle),
         hk AS ($ksDriftOracle),
         hp AS ($driftPsiOracle),
         ho AS ($robustOutliersOracle)
         SELECT * FROM (
           SELECT 'ks_e6' AS metric, ks_e6 AS value FROM hk
           UNION ALL
           SELECT 'outlier_rows', sum(n_outliers)::BIGINT FROM ho
           UNION ALL
           SELECT 'psi_total_e6', sum(psi_e6)::BIGINT FROM hp
           UNION ALL
           SELECT 'zipf_slope_e6', slope_e6 FROM hz)
         ORDER BY metric"""

  private val ksDriftOracle =
    """WITH r AS (SELECT CAST(least(greatest(
                floor((value - 0.0) / 2.0), 0), 255) AS BIGINT) AS bucket,
              count(*) AS ref_n
            FROM events WHERE event_type = 'click' AND value IS NOT NULL
            GROUP BY 1),
         c AS (SELECT CAST(least(greatest(
                floor((value - 0.0) / 2.0), 0), 255) AS BIGINT) AS bucket,
              count(*) AS cur_n
            FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1),
         b AS (SELECT unnest(generate_series(0, 255)) AS bucket),
         j AS (SELECT b.bucket,
              coalesce(r.ref_n, 0)::BIGINT AS ref_n,
              coalesce(c.cur_n, 0)::BIGINT AS cur_n
            FROM b LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)),
         t AS (SELECT bucket,
              CAST(sum(ref_n) OVER (ORDER BY bucket) AS BIGINT) AS ref_le,
              CAST(sum(cur_n) OVER (ORDER BY bucket) AS BIGINT) AS cur_le,
              CAST(sum(ref_n) OVER () AS BIGINT) AS ref_total,
              CAST(sum(cur_n) OVER () AS BIGINT) AS cur_total FROM j),
         g AS (SELECT bucket AS ks_bucket,
              abs(ref_le * cur_total - cur_le * ref_total) AS ks_num,
              ref_total, cur_total FROM t)
         SELECT ks_bucket, ks_num, ref_total, cur_total,
              CAST(round(ks_num::DOUBLE * 1000000.0
                  / (ref_total * cur_total)::DOUBLE) AS BIGINT) AS ks_e6
         FROM g ORDER BY ks_num DESC, ks_bucket LIMIT 1"""

  private val ewmaOracle =
    """WITH p AS (SELECT user_id, event_id, ts,
              CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_c
            FROM events WHERE event_type = 'purchase'),
         w AS (SELECT user_id, event_id, ts,
              list(v_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
            FROM p)
         SELECT user_id, event_id, ts,
              list_sum([l[i] * (1::BIGINT << (16 - len(l) + i - 1))
                  for i in generate_series(1, len(l))])::BIGINT AS ewma_c16
         FROM w ORDER BY user_id, ts, event_id"""

  private val kanonOracle =
    """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS d,
              CAST(floor(value / 32.0) AS BIGINT) AS vb,
              count(*) AS n_rows,
              count(DISTINCT user_id) AS n_sensitive
            FROM events GROUP BY 1, 2, 3)
         SELECT event_type,
              count(*)::BIGINT AS n_groups,
              min(n_rows)::BIGINT AS min_group,
              count(*) FILTER (WHERE n_rows < 5)::BIGINT AS risky_k_groups,
              coalesce(sum(n_rows) FILTER (WHERE n_rows < 5), 0)::BIGINT
                AS risky_k_rows,
              min(n_sensitive)::BIGINT AS min_l,
              count(*) FILTER (WHERE n_sensitive < 3)::BIGINT
                AS risky_l_groups,
              coalesce(sum(n_rows) FILTER (WHERE n_sensitive < 3), 0)::BIGINT
                AS risky_l_rows
         FROM g GROUP BY 1 ORDER BY 1"""

  /** DuckDB replay of [[graft.ext.Privacy.generalizationLadder]]: one
    * audit CTE per rung, pick the finest compliant width, else the
    * coarsest rung's (non-compliant) audit. */
  private def kanonLadderOracle(widths: Seq[Long]): String = {
    val rungs = widths.map { w =>
      s"""a$w AS (SELECT ${w}::BIGINT AS width,
              count(*)::BIGINT AS n_groups,
              min(n_rows)::BIGINT AS min_group,
              count(*) FILTER (WHERE n_rows < 5)::BIGINT AS risky_k_groups,
              coalesce(sum(n_rows) FILTER (WHERE n_rows < 5), 0)::BIGINT
                AS risky_k_rows
            FROM (SELECT count(*) AS n_rows FROM events
                  GROUP BY event_type, CAST(ts AS DATE),
                    floor(value / $w.0)))"""
    }.mkString(",\n         ")
    val unionAll = widths.map(w => s"SELECT * FROM a$w")
      .mkString("\n           UNION ALL ")
    s"""WITH $rungs,
         allr AS ($unionAll),
         pick AS (SELECT * FROM allr WHERE risky_k_rows = 0
              ORDER BY width LIMIT 1)
         SELECT * FROM pick
         UNION ALL
         SELECT * FROM a${widths.last}
         WHERE NOT EXISTS (SELECT 1 FROM pick)"""
  }

  private val driftPsiOracle =
    """WITH r AS (SELECT CAST(least(greatest(
                floor((value - 0.0) / 32.0), 0), 15) AS BIGINT) AS bucket,
              count(*) AS ref_n
            FROM events WHERE event_type = 'click' AND value IS NOT NULL
            GROUP BY 1),
         c AS (SELECT CAST(least(greatest(
                floor((value - 0.0) / 32.0), 0), 15) AS BIGINT) AS bucket,
              count(*) AS cur_n
            FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1),
         b AS (SELECT unnest(generate_series(0, 15)) AS bucket),
         j AS (SELECT b.bucket,
              coalesce(r.ref_n, 0)::BIGINT AS ref_n,
              coalesce(c.cur_n, 0)::BIGINT AS cur_n
            FROM b LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)),
         t AS (SELECT bucket, ref_n, cur_n,
              CAST(sum(ref_n) OVER () AS BIGINT) AS rt,
              CAST(sum(cur_n) OVER () AS BIGINT) AS ct FROM j)
         SELECT bucket, ref_n, cur_n,
              CAST(round(((CAST(ref_n + 1 AS DOUBLE)
                    / CAST(rt + 16 AS DOUBLE))
                  - (CAST(cur_n + 1 AS DOUBLE)
                    / CAST(ct + 16 AS DOUBLE)))
                * ln((CAST(ref_n + 1 AS DOUBLE)
                    / CAST(rt + 16 AS DOUBLE))
                  / (CAST(cur_n + 1 AS DOUBLE)
                    / CAST(ct + 16 AS DOUBLE)))
                * 1000000.0) AS BIGINT) AS psi_e6
         FROM t ORDER BY bucket"""

  /** Shared by the batch (q_knn_ivf) build-and-search and the
    * frozen-centroid incremental index gate (q_knn_ivf_stream). */
  private val knnIvfOracle: String =
    """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cents AS (SELECT vec_id AS cent_id, v AS ce FROM emb WHERE vec_id < 16),
         ca AS (SELECT e.vec_id AS id, c.cent_id,
                round(list_cosine_similarity(e.v, c.ce), 6) AS cc
              FROM emb e CROSS JOIN cents c),
         cass AS (SELECT id, cent_id AS cell FROM (
                SELECT id, cent_id, row_number() OVER (PARTITION BY id
                  ORDER BY cc DESC, cent_id) AS r FROM ca) WHERE r = 1),
         qass AS (SELECT id AS query_id, cent_id AS cell FROM (
                SELECT id, cent_id, row_number() OVER (PARTITION BY id
                  ORDER BY cc DESC, cent_id) AS r FROM ca WHERE id < 8)
              WHERE r <= 4),
         sc AS (SELECT q.query_id, n.id AS nn_id,
                round(list_cosine_similarity(eq.v, en.v), 4) AS cos_sim
              FROM qass q
              JOIN cass n ON q.cell = n.cell AND q.query_id <> n.id
              JOIN emb eq ON eq.vec_id = q.query_id
              JOIN emb en ON en.vec_id = n.id),
         r AS (SELECT query_id, nn_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id)::BIGINT AS rank FROM sc)
         SELECT query_id, rank, nn_id, cos_sim FROM r
         WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Shared by the ad-hoc scan (q_bm25) and the maintained-index
    * scorer gate (q_bm25_stream). */
  private val bm25Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         stats AS (SELECT count(*)::DOUBLE AS n,
                avg(len(l))::DOUBLE AS avgdl FROM t),
         tok AS (SELECT doc_id, unnest(l) AS term FROM t),
         tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
              WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc_id, len(l)::DOUBLE AS dl FROM t),
         sc AS (SELECT tf.doc_id,
                sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                  AS raw
              FROM tf JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id, stats s
              GROUP BY 1)
         SELECT doc_id, round(raw, 6) AS score FROM sc
         ORDER BY score DESC, doc_id LIMIT 25"""

  def oracleSql: Map[String, String] = Map(
    "q_id_gaps" ->
      """WITH e AS (SELECT user_id, event_id FROM events
              WHERE event_id % 9 <> 4),
         l AS (SELECT user_id, event_id,
              lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
                AS prev_id FROM e)
         SELECT user_id, prev_id AS gap_after, event_id AS resume_at,
                (event_id - prev_id - 1)::BIGINT AS missing
         FROM l WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
         ORDER BY user_id, gap_after""",

    "q_recent_events" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit, value
         FROM events ORDER BY ts DESC, event_id LIMIT 50""",

    "q_distinct_users" ->
      "SELECT DISTINCT user_id AS user_email FROM events ORDER BY 1",

    "q_distinct_habits" ->
      "SELECT DISTINCT event_type AS habit FROM events ORDER BY 1",

    "q_habit_daily" -> habitDailyOracle,

    "q_habit_daily_incremental" -> habitDailyOracle,

    "q_value_by_day" ->
      """SELECT date_trunc('day', ts) AS day, round(sum(value), 6) AS minutes
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
           AND user_id = 7 AND event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // every event belongs to the windows starting at its own day and
    // the day before (duration 2d, slide 1d, epoch-aligned starts)
    "q_hopping_window" -> hoppingOracle,

    // the watermarked streaming replay lands on the same final table —
    // same oracle
    "q_hopping_stream" -> hoppingOracle,

    "q_completion_pct" ->
      """SELECT event_type AS habit,
                round(100.0 * sum(CASE WHEN value >= 1 THEN 1 ELSE 0 END)
                      / GREATEST(count(*), 1), 6) AS pct_done
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
           AND user_id = 7 AND event_type IN ('click', 'view')
         GROUP BY 1 ORDER BY 1""",

    "q_sessionize" -> sessionizeOracle,

    // built-in session_window merge — third implementation, same oracle
    "q_session_window" -> sessionizeOracle,

    // the one-shot flatMapGroupsWithState replay equals the batch
    // gaps-and-islands sessionization, so both gates share one oracle
    "q_sessionize_stream" -> sessionizeOracle,

    // Mirrors FormResponseSource's closed-form cell math: January 2024 is
    // CST (UTC-6), so date-only noon-anchored rows land at 18:00Z; a mood
    // of (u+d)%11 = 10 is emitted as junk and must drop that event.
    "q_dsv2_form_source" ->
      """WITH g AS (SELECT u.u AS u, d.d AS d
              FROM (SELECT unnest(generate_series(0, 3)) AS u) u,
                   (SELECT unnest(generate_series(0, 8)) AS d) d),
         base AS (SELECT u, d,
                TIMESTAMP '2024-01-01 18:00:00' + d * INTERVAL 1 DAY AS ts,
                'user' || u || '@example.com' AS user_email,
                CASE WHEN d % 3 = 0 THEN 'Notes: good day'
                     ELSE NULL END AS notes
              FROM g)
         SELECT ts, user_email, 'workout' AS habit,
                (CASE WHEN (u + d) % 2 = 0 THEN 1.0 ELSE 0.0 END)::DOUBLE
                  AS value, notes, 'sheets' AS source FROM base
         UNION ALL
         SELECT ts, user_email, 'meditation_minutes',
                ((u * 7 + d * 3) % 60)::DOUBLE, notes, 'sheets' FROM base
         UNION ALL
         SELECT ts, user_email, 'mood_score',
                ((u + d) % 11)::DOUBLE, notes, 'sheets' FROM base
         WHERE (u + d) % 11 <> 10
         ORDER BY user_email, habit, ts""",

    // raw cells of day index 4 (2024-01-05 → sheet text '1/5/2024')
    "q_dsv2_pushdown" ->
      """SELECT 'User' || u || '@Example.com' AS user_email,
                CASE WHEN (u + 4) % 2 = 0 THEN 'Yes' ELSE 'no' END
                  AS workout,
                ((u + 4) % 11)::VARCHAR AS mood
         FROM (SELECT unnest(generate_series(0, 3)) AS u)
         ORDER BY user_email""",

    "q_dsv2_agg_pushdown" ->
      """WITH d AS (SELECT unnest(generate_series(0, 10)) AS d),
         u AS (SELECT unnest(generate_series(0, 5)) AS u),
         cells AS (SELECT d.d,
                month(DATE '2024-02-20' + d.d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                day(DATE '2024-02-20' + d.d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                year(DATE '2024-02-20' + d.d * INTERVAL 1 DAY)::VARCHAR
                  AS report_date,
                CASE WHEN (u.u + d.d) % 11 = 10 THEN 'n/a'
                     ELSE ((u.u + d.d) % 11)::VARCHAR END AS mood,
                'User' || u.u || '@Example.com' AS email
              FROM d, u)
         SELECT report_date, count(*)::BIGINT AS n_rows,
                min(email) AS first_email, max(mood) AS max_mood_text
         FROM cells GROUP BY report_date ORDER BY report_date""",

    "q_dsv2_spj" ->
      """WITH d AS (SELECT unnest(generate_series(0, 7)) AS d),
         u AS (SELECT unnest(generate_series(0, 4)) AS u),
         cells AS (SELECT d.d, u.u,
                month(DATE '2024-03-01' + d.d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                day(DATE '2024-03-01' + d.d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                year(DATE '2024-03-01' + d.d * INTERVAL 1 DAY)::VARCHAR
                  AS report_date,
                CASE WHEN (u.u + d.d) % 11 = 10 THEN 'n/a'
                     ELSE ((u.u + d.d) % 11)::VARCHAR END AS mood,
                'User' || u.u || '@Example.com' AS email
              FROM d, u),
         daily AS (SELECT report_date, count(*)::BIGINT AS n_day,
                max(mood) AS max_mood_text
              FROM cells GROUP BY 1)
         SELECT c.report_date, c.email AS user_email,
                dy.n_day, dy.max_mood_text
         FROM cells c JOIN daily dy USING (report_date)
         ORDER BY c.report_date, user_email""",

    "q_dsv2_agg_global" ->
      """WITH d AS (SELECT unnest(generate_series(0, 10)) AS d),
         dates AS (SELECT
                month(DATE '2024-02-20' + d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                day(DATE '2024-02-20' + d * INTERVAL 1 DAY)::VARCHAR
                  || '/' ||
                year(DATE '2024-02-20' + d * INTERVAL 1 DAY)::VARCHAR
                  AS rd
              FROM d)
         SELECT (11 * 6)::BIGINT AS n_rows,
                max(rd) AS last_date_text FROM dates""",

    "q_scd2" ->
      """WITH daily AS (SELECT user_id AS user_email, event_type AS habit,
                date_trunc('day', ts) AS day, round(sum(value), 6) AS day_total
              FROM events GROUP BY 1, 2, 3),
         c AS (SELECT user_email, habit, day, day_total,
                CASE WHEN row_number() OVER w = 1 THEN 1
                     WHEN lag(day_total) OVER w IS NOT DISTINCT FROM day_total
                       THEN 0
                     ELSE 1 END AS chg
              FROM daily WINDOW w AS (PARTITION BY user_email, habit
                                      ORDER BY day)),
         f AS (SELECT user_email, habit, day AS valid_from, day_total
              FROM c WHERE chg = 1)
         SELECT user_email, habit, valid_from,
                lead(valid_from) OVER (PARTITION BY user_email, habit
                  ORDER BY valid_from) AS valid_to,
                day_total
         FROM f ORDER BY user_email, habit, valid_from""",

    // Temporal-join replay: rebuild the same SCD2 history, then route
    // every event to the version whose interval contains its ts.
    "q_temporal_join" ->
      """WITH daily AS (SELECT user_id AS user_email, event_type AS habit,
                date_trunc('day', ts) AS day, round(sum(value), 6) AS day_total
              FROM events GROUP BY 1, 2, 3),
         c AS (SELECT user_email, habit, day, day_total,
                CASE WHEN row_number() OVER w = 1 THEN 1
                     WHEN lag(day_total) OVER w IS NOT DISTINCT FROM day_total
                       THEN 0
                     ELSE 1 END AS chg
              FROM daily WINDOW w AS (PARTITION BY user_email, habit
                                      ORDER BY day)),
         f AS (SELECT user_email, habit, day AS valid_from, day_total
              FROM c WHERE chg = 1),
         scd AS (SELECT user_email, habit, valid_from,
                lead(valid_from) OVER (PARTITION BY user_email, habit
                  ORDER BY valid_from) AS valid_to,
                day_total
              FROM f)
         SELECT e.user_id AS user_email, e.event_type AS habit,
                s.valid_from, count(*)::BIGINT AS n_events,
                round(sum(e.value), 6) AS sum_value,
                round(max(s.day_total), 6) AS day_total
         FROM events e JOIN scd s
           ON e.user_id = s.user_email AND e.event_type = s.habit
          AND e.ts >= s.valid_from
          AND (s.valid_to IS NULL OR e.ts < s.valid_to)
         GROUP BY 1, 2, 3
         ORDER BY 1, 2, 3""",

    "q_geomean" ->
      """SELECT event_type AS habit, round(exp(avg(ln(value))), 6) AS geo_mean,
                count(*) AS n_pos
         FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1""",

    "q_salted_distinct" ->
      """SELECT event_type AS habit, count(DISTINCT user_id)::BIGINT
                  AS n_distinct
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_salted_join" ->
      """WITH ev AS (SELECT event_type AS habit, value FROM events),
         dim AS (SELECT habit, round(avg(value), 6) AS habit_avg
                 FROM ev GROUP BY 1)
         SELECT e.habit, count(*)::BIGINT AS n,
                round(max(d.habit_avg), 6) AS habit_avg,
                sum(CAST(round(abs(e.value - d.habit_avg) * 10000)
                  AS BIGINT))::BIGINT AS dev_abs_e4
         FROM ev e JOIN dim d ON e.habit = d.habit
         GROUP BY 1 ORDER BY 1""",

    "q_salted_topk" ->
      """SELECT habit, event_id, value FROM (
           SELECT event_type AS habit, event_id, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id) AS r
           FROM events) WHERE r <= 5
         ORDER BY habit, value DESC, event_id""",

    "q_json_extract" ->
      """SELECT event_type AS habit, count(*) AS n,
                sum((props ->> '$.k')::BIGINT)::BIGINT AS sum_k,
                round(avg((props ->> '$.k')::BIGINT), 6) AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_json_variant" ->
      """SELECT event_type AS habit, count(*) AS n,
                sum((props ->> '$.k')::BIGINT)::BIGINT AS sum_k,
                round(avg((props ->> '$.k')::BIGINT), 6) AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_json_roundtrip" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey""",

    "q_rolling_avg" ->
      """WITH daily AS (SELECT event_type AS habit,
                date_trunc('day', ts) AS day, sum(value) AS day_total
              FROM events WHERE event_type IN ('purchase', 'click')
              GROUP BY 1, 2)
         SELECT habit, day,
                round(avg(day_total) OVER (PARTITION BY habit
                  ORDER BY date_diff('day', DATE '2024-01-01', day::DATE)
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                  AS rolling_avg
         FROM daily ORDER BY habit, day""",

    "q_winsorized" ->
      """WITH b AS (SELECT event_type,
                quantile_cont(value, 0.05) AS plo,
                quantile_cont(value, 0.95) AS phi
              FROM events WHERE value IS NOT NULL GROUP BY 1),
         w AS (SELECT e.event_type,
                least(greatest(e.value, b.plo), b.phi) AS wv, b.plo, b.phi
              FROM events e JOIN b USING (event_type)
              WHERE e.value IS NOT NULL)
         SELECT event_type, count(*)::BIGINT AS n,
                round(min(plo), 6) AS lo_bound,
                round(max(phi), 6) AS hi_bound,
                round(avg(wv), 6) AS w_mean,
                round(stddev_samp(wv), 6) AS w_stddev
         FROM w GROUP BY 1 ORDER BY 1""",

    "q_percentiles" ->
      """SELECT event_type AS habit,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90,
                round(quantile_cont(value, 0.99), 6) AS p99
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_approx_quantiles" ->
      """SELECT event_type AS habit, count(*) AS n, true AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_approx_distinct" ->
      """SELECT event_type AS habit,
                count(DISTINCT user_id)::BIGINT AS exact_n,
                true AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""WITH s AS (SELECT event_id,
             CASE WHEN value IS NULL THEN NULL
                  ELSE least(greatest(floor((value - 0.0) / 500.0 * 256), 0),
                    255)::BIGINT END AS x,
             (event_id % 256)::BIGINT AS y
           FROM events)
         SELECT event_id, ($terms)::BIGINT AS z FROM s ORDER BY event_id"""
    },

    "q_histogram" ->
      """SELECT event_type,
                least(greatest(floor((value - 0.0) / 25.0), 0), 19)::BIGINT
                  AS bucket,
                count(*)::BIGINT AS n
         FROM events WHERE value IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // Mergeable-quantile replay: the same daily bucket counts, the
    // same sum-merge to per-habit, the same ppm rank threshold in
    // pure BIGINT arithmetic, the same upper-edge estimate.
    "q_quantile_rollup" -> quantileRollupOracle,
    "q_quantile_stream" -> quantileRollupOracle,

    "q_rolling_distinct" ->
      """WITH daily AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
              FROM events),
         days AS (SELECT DISTINCT day FROM daily)
         SELECT d.day AS window_end, count(DISTINCT a.user_id)::BIGINT
                  AS n_users
         FROM days d JOIN daily a
           ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
         GROUP BY 1 ORDER BY 1""",

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
              WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
              WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT * FROM (
           SELECT 1::BIGINT AS stage_idx, 'view' AS stage,
                  (SELECT count(*) FROM s1)::BIGINT AS n_users
           UNION ALL
           SELECT 2, 'click', (SELECT count(*) FROM s2)
           UNION ALL
           SELECT 3, 'purchase', (SELECT count(*) FROM s3)
         ) ORDER BY stage_idx""",

    "q_hll_rollup" ->
      """SELECT date_trunc('week', date_trunc('day', ts)) AS week,
                count(DISTINCT user_id)::BIGINT AS exact_users,
                true AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_hll_stream" ->
      """SELECT date_trunc('week', date_trunc('day', ts)) AS week,
                count(DISTINCT user_id)::BIGINT AS exact_users,
                true AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_sample_split" ->
      """WITH b AS (SELECT lang, n_chars,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents)
         SELECT lang,
                CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split,
                count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_stratified" ->
      """WITH b AS (SELECT lang, n_chars,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents)
         SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS sum_chars
         FROM b
         WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 25
                                  ELSE 10 END
         GROUP BY 1 ORDER BY 1""",

    // A-ES priority = ln((md5₆₀ + 1) / 2⁶⁰) / weight, reproduced with
    // the same order of operations (hash → double → +1 → divide → ln)
    "q_weighted_sample" ->
      """WITH b AS (SELECT lang, doc_id, n_chars,
                ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                      ::UBIGINT::DOUBLE + 1)
                   / 1152921504606846976.0) / n_chars::DOUBLE AS pri
              FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         r AS (SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang
                  ORDER BY pri DESC, doc_id)::BIGINT AS sample_rank
              FROM b)
         SELECT lang, sample_rank, doc_id, n_chars FROM r
         WHERE sample_rank <= 5 ORDER BY lang, sample_rank""",

    // closed form of the CDC feed: %7=2 keys deleted, %7=1 keys take
    // the seq-2 update (the stale seq-1 change is superseded), %7=3
    // keys re-inserted at the negative mirror id -(event_id)-1
    "q_cdc_apply" -> cdcApplyOracle,

    // staged ascending-seq arrival makes the streamed apply land on
    // the same final state — same oracle
    "q_cdc_stream" -> cdcApplyOracle,

    "q_dedup_chunks" -> chunkStatsOracle,
    "q_chunk_store_stream" -> chunkStatsOracle,

    "q_dedup_chunks_incremental" ->
      s"""$chunkRelationCte,
         store AS (SELECT DISTINCT chunk FROM ch WHERE doc_id % 10 <> 0),
         bat AS (SELECT source, chunk FROM ch WHERE doc_id % 10 = 0)
         SELECT source,
              count(*) FILTER (WHERE s.chunk IS NULL)::BIGINT
                AS new_chunks,
              count(*) FILTER (WHERE s.chunk IS NOT NULL)::BIGINT
                AS known_chunks,
              coalesce(sum(length(b.chunk))
                FILTER (WHERE s.chunk IS NOT NULL), 0)::BIGINT
                AS known_bytes
         FROM bat b LEFT JOIN store s USING (chunk)
         GROUP BY 1 ORDER BY 1""",

    "q_dedup_lines" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         seg AS (SELECT doc_id, t.w AS pos,
                array_to_string(l[t.w * 8 + 1 : t.w * 8 + 8], ' ') AS seg
              FROM tok, unnest(generate_series(0, (len(l) - 1) // 8))
                AS t(w)),
         freq AS (SELECT seg, count(*) AS n_occ FROM seg GROUP BY seg),
         keep AS (SELECT s.doc_id, s.pos, s.seg
              FROM seg s JOIN freq f USING (seg) WHERE f.n_occ < 2),
         agg AS (SELECT doc_id, count(*) AS kept_segments,
                string_agg(seg, ' ' ORDER BY pos) AS clean_text
              FROM keep GROUP BY doc_id),
         tot AS (SELECT doc_id, count(*) AS total FROM seg GROUP BY doc_id)
         SELECT t.doc_id,
                coalesce(a.kept_segments, 0)::BIGINT AS kept_segments,
                (t.total - coalesce(a.kept_segments, 0))::BIGINT
                  AS dropped_segments,
                md5(coalesce(a.clean_text, '')) AS clean_md5
         FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""",

    // the same ±1 matrix from the md5 parity formula; embedding[i+1]
    // because DuckDB lists are 1-indexed while the sign index is 0-based
    "q_embed_project" ->
      """SELECT vec_id, j::BIGINT AS dim,
                round(list_sum([embedding[i + 1]::DOUBLE *
                    (CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' ||
                        j::VARCHAR), 1, 15))::UBIGINT % 2 = 0
                      THEN 1.0 ELSE -1.0 END)
                    for i in generate_series(0, 63)]) / sqrt(8.0), 6)
                  AS val
         FROM embeddings, generate_series(0, 7) AS t(j)
         ORDER BY vec_id, dim""",

    "q_embed_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                  AS ma
              FROM embeddings),
         q AS (SELECT vec_id, ma,
                CASE WHEN ma = 0
                  THEN list_transform(embedding, x -> 0::BIGINT)
                  ELSE list_transform(embedding,
                    x -> floor(x::DOUBLE / ma * 127 + 0.5)::BIGINT)
                END AS qq
              FROM m)
         SELECT vec_id, list_sum(qq)::BIGINT AS q_sum,
                list_min(qq)::BIGINT AS q_min,
                list_max(qq)::BIGINT AS q_max,
                round(ma / 127, 6) AS scale_r, true AS recon_ok
         FROM q ORDER BY vec_id""",

    "q_cms_freq" ->
      """SELECT event_type, count(*)::BIGINT AS exact_n, true AS est_ok
         FROM events WHERE event_type IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    "q_cms_stream" ->
      """SELECT event_type, count(*)::BIGINT AS exact_n, true AS est_ok
         FROM events WHERE event_type IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    "q_text_normalize" ->
      """WITH noisy AS (SELECT doc_id,
                '  ' || (CASE WHEN doc_id % 3 = 0 THEN upper(text)
                              ELSE text END) || '!!  An,Example--End  '
                  AS t
              FROM documents),
         n AS (SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(t),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
              FROM noisy)
         SELECT doc_id, md5(norm) AS norm_md5,
                len(string_split(norm, ' '))::BIGINT AS n_tokens
         FROM n ORDER BY doc_id""",

    // the q_knn_quantized chain with labels carried through and the
    // mismatch predicate in the pair join
    "q_hard_negatives" ->
      """WITH m AS (SELECT vec_id, label,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                  AS ma, embedding
              FROM embeddings),
         qz AS (SELECT vec_id, label,
                CASE WHEN ma = 0
                  THEN list_transform(embedding, x -> 0::DOUBLE)
                  ELSE list_transform(embedding,
                    x -> floor(x::DOUBLE / ma * 127 + 0.5))
                END AS qq
              FROM m),
         q AS (SELECT vec_id AS query_id, label AS qlabel, qq AS qv
              FROM qz WHERE vec_id < 8),
         c AS (SELECT vec_id AS neg_id, label AS neg_label, qq AS cv
              FROM qz),
         s AS (SELECT query_id, neg_id, neg_label,
                list_dot_product(qv, cv)::BIGINT AS qdot
              FROM q JOIN c ON query_id <> neg_id AND qlabel <> neg_label),
         r AS (SELECT query_id, neg_id, neg_label, qdot,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY qdot DESC, neg_id)::BIGINT AS rank
              FROM s)
         SELECT query_id, rank, neg_id, neg_label, qdot FROM r
         WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_knn_quantized" ->
      """WITH m AS (SELECT vec_id,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                  AS ma, embedding
              FROM embeddings),
         qz AS (SELECT vec_id,
                CASE WHEN ma = 0
                  THEN list_transform(embedding, x -> 0::DOUBLE)
                  ELSE list_transform(embedding,
                    x -> floor(x::DOUBLE / ma * 127 + 0.5))
                END AS qq
              FROM m),
         q AS (SELECT vec_id AS query_id, qq AS qv FROM qz
              WHERE vec_id < 8),
         c AS (SELECT vec_id AS nn_id, qq AS cv FROM qz),
         s AS (SELECT query_id, nn_id,
                list_dot_product(qv, cv)::BIGINT AS qdot
              FROM q JOIN c ON query_id <> nn_id),
         r AS (SELECT query_id, nn_id, qdot,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY qdot DESC, nn_id)::BIGINT AS rank
              FROM s)
         SELECT query_id, rank, nn_id, qdot FROM r
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // Full integer k-means replay (kmeansAssignSql: quantization,
    // farthest-point seeds, FOUR generated Lloyd rounds, final
    // assignment afin) + the purity rollup. Cell-exact against
    // kmeansFitInt8.
    "q_kmeans" ->
      (kmeansAssignSql(10, 4) + """,
         cnt AS (SELECT a.cluster, q.label, count(*) AS n
              FROM afin a JOIN q ON a.vec_id = q.vec_id
              GROUP BY a.cluster, q.label)
         SELECT cluster, sum(n)::BIGINT AS n_points,
                max(n)::BIGINT AS n_majority
         FROM cnt GROUP BY cluster ORDER BY cluster"""),

    "q_kcenter" -> kcenterOracle(8),
    "q_mmr" -> mmrOracle(8),
    "q_mutual_knn" ->
      """WITH km AS (SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                AS ma
            FROM embeddings WHERE vec_id % 2 = 0),
         kq AS (SELECT vec_id,
              CASE WHEN ma = 0
                THEN list_transform(embedding, x -> 0::BIGINT)
                ELSE list_transform(embedding,
                  x -> floor(x::DOUBLE / ma * 127 + 0.5)::BIGINT)
              END AS qq
            FROM km),
         sc AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
              list_sum([a.qq[i] * b.qq[i]
                for i in generate_series(1, len(a.qq))])::BIGINT AS d
            FROM kq a JOIN kq b ON a.vec_id <> b.vec_id),
         r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
                ORDER BY d DESC, nid)::BIGINT AS rank FROM sc),
         topk AS (SELECT * FROM r WHERE rank <= 5)
         SELECT ab.qid AS id_a, ab.nid AS id_b,
              ab.rank AS rank_ab, ba.rank AS rank_ba
         FROM topk ab JOIN topk ba
           ON ab.qid = ba.nid AND ab.nid = ba.qid AND ab.qid < ab.nid
         ORDER BY id_a, id_b""",

    // Full PQ replay (pqChainSql: shared int8 pts + one cand sample,
    // per-subspace seed/Lloyd chains, codes/cb/recon tail) + the
    // per-vector code string and integer reconstruction error.
    "q_pq_encode" ->
      (pqChainSql(4, 8, 2, 16) + """,
         cstr AS (SELECT vec_id,
                array_to_string(list(cluster ORDER BY sub), ' ') AS code
              FROM codes GROUP BY vec_id)
         SELECT c.vec_id, c.code,
                sum((p.x - r.c) * (p.x - r.c))::BIGINT AS recon_err
         FROM cstr c
         JOIN pts p ON p.vec_id = c.vec_id
         JOIN recon r ON r.vec_id = c.vec_id AND r.dim = p.dim
         GROUP BY c.vec_id, c.code ORDER BY c.vec_id"""),

    // ADC ranks from the same replayed codebooks: exact query codes vs
    // corpus reconstructions, integer squared-L2, ties by nn_id.
    "q_knn_pq" ->
      (pqChainSql(4, 8, 2, 16) + """,
         qry AS (SELECT vec_id, dim, x FROM pts WHERE vec_id < 8),
         d AS (SELECT qy.vec_id AS query_id, r.vec_id AS nn_id,
                sum((qy.x - r.c) * (qy.x - r.c))::BIGINT AS adist
              FROM qry qy JOIN recon r ON qy.dim = r.dim
              WHERE qy.vec_id <> r.vec_id
              GROUP BY 1, 2)
         SELECT query_id, rank, nn_id, adist FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY adist, nn_id)::BIGINT
                AS rank FROM d)
         WHERE rank <= 5 ORDER BY query_id, rank"""),

    // IVF+PQ replay: coarse chain + residual PQ chains, then the
    // probe-limited ADC — each query scores only docs whose coarse
    // cell is among its 2 nearest (ties by cell), distances are the
    // integer squared-L2 between the query's per-cell residual and the
    // doc's residual reconstruction.
    "q_knn_ivfpq" ->
      (ivfPqChainSql(8, 4, 8, 2, 16) + """,
         qd AS (SELECT p.vec_id, c.cluster AS cell,
                sum((p.x - c.c) * (p.x - c.c)) AS cd2
              FROM pts p JOIN c2_c c ON c.dim = p.dim
              WHERE p.vec_id < 8 GROUP BY 1, 2),
         probes AS (SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cd2, cell) AS rn FROM qd)
              WHERE rn <= 2),
         qres AS (SELECT p.vec_id, pr.cell, p.dim, p.x - cc.c AS x
              FROM pts p JOIN probes pr ON pr.vec_id = p.vec_id
              JOIN c2_c cc ON cc.cluster = pr.cell AND cc.dim = p.dim),
         d AS (SELECT qr.vec_id AS query_id, ce.vec_id AS nn_id,
                sum((qr.x - r.c) * (qr.x - r.c))::BIGINT AS adist
              FROM qres qr JOIN cells ce ON ce.cell = qr.cell
              JOIN recon r ON r.vec_id = ce.vec_id AND r.dim = qr.dim
              WHERE ce.vec_id <> qr.vec_id
              GROUP BY 1, 2)
         SELECT query_id, rank, nn_id, adist FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY adist, nn_id)::BIGINT
                AS rank FROM d)
         WHERE rank <= 5 ORDER BY query_id, rank"""),

    "q_contamination" ->
      """WITH fp AS (SELECT doc_id,
                CASE WHEN length(text) >= 8 THEN
                  list_min([list_reduce(list_prepend(0::BIGINT,
                      [ascii(x)::BIGINT for x in string_split(substr(text, i, 8), '')]),
                    (a, b) -> (a * 31 + b) % 1000000007)
                    for i in generate_series(1, length(text) - 7)])
                ELSE list_reduce(list_prepend(0::BIGINT,
                      [ascii(x)::BIGINT for x in string_split(text, '')]),
                    (a, b) -> (a * 31 + b) % 1000000007) END AS fp,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents),
         tr AS (SELECT DISTINCT fp FROM fp WHERE bucket < 80),
         te AS (SELECT doc_id, fp FROM fp WHERE bucket >= 90)
         SELECT te.doc_id, te.fp FROM te JOIN tr ON te.fp = tr.fp
         ORDER BY te.doc_id""",

    // The oracle takes the brute-force every-offset form the Spark
    // side's tiled-anchor + extension design provably equals: a test
    // position is contaminated iff its 31-char window appears verbatim
    // in the train split.
    "q_substring_contamination" -> substringContaminationOracle("text"),

    // the ingest-time ledger's distinct union equals the offline scan
    "q_contamination_stream" -> substringContaminationOracle("text"),

    // untouched rows curate; corrupted (event_id % 11 = 3) rows —
    // value rewritten to -(value+1), unambiguously negative — quarantine
    "q_quarantine_stream" ->
      """SELECT 'curated' AS dest, count(*)::BIGINT AS n_rows,
                round(sum(value), 6) AS value_sum
         FROM events WHERE event_id % 11 <> 3
         UNION ALL
         SELECT 'quarantine' AS dest, count(*)::BIGINT AS n_rows,
                round(sum(-(value + 1)), 6) AS value_sum
         FROM events WHERE event_id % 11 = 3
         ORDER BY dest""",
    // brute-force redaction replay: covered = union of hit windows'
    // [i, i+30] character positions; rebuild each test doc from its
    // uncovered characters (char-level — the oracle may be naive)
    "q_redact_contamination" ->
      """WITH b AS (SELECT doc_id, text,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents),
         tr AS (SELECT text FROM b WHERE bucket < 80),
         tw AS (SELECT DISTINCT w FROM (
                SELECT unnest([substr(text, i, 31)
                    for i in generate_series(1, length(text) - 30)]) AS w
                FROM tr WHERE length(text) >= 31)),
         te AS (SELECT doc_id, text FROM b
              WHERE bucket >= 90 AND length(text) >= 31),
         tew AS (SELECT doc_id,
                unnest([{'i': i, 'w': substr(text, i, 31)}
                    for i in generate_series(1, length(text) - 30)]) AS x
              FROM te),
         hit AS (SELECT DISTINCT tew.doc_id, tew.x.i AS i
              FROM tew JOIN tw ON tew.x.w = tw.w),
         cov AS (SELECT DISTINCT doc_id,
                unnest(generate_series(i, i + 30)) AS cp FROM hit),
         teall AS (SELECT doc_id, text FROM b WHERE bucket >= 90),
         chars AS (SELECT doc_id,
                unnest([{'cp': i, 'ch': substr(text, i, 1)}
                    for i in generate_series(1, length(text))]) AS x
              FROM teall),
         kept AS (SELECT c.doc_id, c.x.cp AS cp, c.x.ch AS ch
              FROM chars c LEFT JOIN cov
                ON cov.doc_id = c.doc_id AND cov.cp = c.x.cp
              WHERE cov.cp IS NULL),
         red AS (SELECT doc_id, string_agg(ch, '' ORDER BY cp) AS t
              FROM kept GROUP BY 1)
         SELECT teall.doc_id, coalesce(red.t, '') AS text_redacted,
                (length(teall.text) - coalesce(length(red.t), 0))::BIGINT
                  AS n_removed
         FROM teall LEFT JOIN red USING (doc_id) ORDER BY doc_id""",

    // brute-force every-window self-repeat replay: a window counts
    // when the same 31-char string occurs in a DIFFERENT document
    "q_substring_selfdup" ->
      """WITH w AS (SELECT doc_id,
                unnest([{'i': i, 'w': substr(text, i, 31)}
                    for i in generate_series(1, length(text) - 30)]) AS x
              FROM documents WHERE length(text) >= 31),
         ww AS (SELECT doc_id, x.i AS i, x.w AS w FROM w),
         rep AS (SELECT DISTINCT a.doc_id, a.i
              FROM ww a JOIN ww b ON a.w = b.w AND a.doc_id <> b.doc_id)
         SELECT doc_id, count(*)::BIGINT AS n_spans,
                min(i)::BIGINT AS first_pos
         FROM rep GROUP BY doc_id ORDER BY doc_id""",
    "q_substring_contamination_norm" -> substringContaminationOracle(
      "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', " +
        "'g'), ' +', ' ', 'g'))"),

    "q_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type,
                date_trunc('day', ts)::DATE AS day
              FROM events WHERE value >= 1),
         g AS (SELECT user_id, event_type, day,
                day - row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY day)::INT AS anchor
              FROM d),
         runs AS (SELECT user_id, event_type, anchor, count(*) AS run_len
              FROM g GROUP BY 1, 2, 3)
         SELECT user_id AS user_email, event_type AS habit,
                max(run_len)::BIGINT AS longest_streak
         FROM runs GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_gap_fill" ->
      """WITH daily AS (SELECT user_id AS user_email, event_type AS habit,
                date_trunc('day', ts)::DATE AS day,
                round(sum(value), 6) AS day_total
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3),
         bounds AS (SELECT user_email, habit, min(day) AS d0, max(day) AS d1
              FROM daily GROUP BY 1, 2),
         spine AS (SELECT user_email, habit,
                unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
              FROM bounds),
         j AS (SELECT s.user_email, s.habit, s.day, d.day_total
              FROM spine s LEFT JOIN daily d
                ON s.user_email = d.user_email AND s.habit = d.habit
                   AND s.day = d.day)
         SELECT user_email, habit, day::TIMESTAMP AS day, day_total,
                last_value(day_total IGNORE NULLS) OVER (
                  PARTITION BY user_email, habit ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS filled_total
         FROM j ORDER BY user_email, habit, day""",

    "q_habit_cube" ->
      """SELECT user_id AS user_email, event_type AS habit,
                count(*) AS n_events, round(sum(value), 2) AS total
         FROM events WHERE event_type IN ('click', 'view')
         GROUP BY CUBE (user_id, event_type)
         ORDER BY user_email NULLS FIRST, habit NULLS FIRST""",

    "q_habit_rollup" ->
      """SELECT date_trunc('day', ts) AS day, event_type AS habit,
                count(*) AS n_events, round(sum(value), 2) AS total
         FROM events
         GROUP BY ROLLUP (date_trunc('day', ts), event_type)
         ORDER BY day NULLS FIRST, habit NULLS FIRST""",

    "q_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier s
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_suppkey = s.s_suppkey
                         AND l.l_shipdate > TIMESTAMP '1996-03-15')
         ORDER BY s_suppkey""",

    "q_anti_join" ->
      """SELECT user_id AS user_email, date_trunc('day', ts) AS day,
                count(*) AS n_clicks, round(sum(value), 6) AS click_value
         FROM events c
         WHERE c.event_type = 'click'
           AND NOT EXISTS (SELECT 1 FROM events p
                           WHERE p.event_type = 'purchase'
                             AND p.user_id = c.user_id
                             AND date_trunc('day', p.ts)
                                 = date_trunc('day', c.ts))
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_set_ops" ->
      """SELECT 'both' AS grp, user_id AS user_email FROM
           (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
         UNION ALL
         SELECT 'click_only' AS grp, user_id AS user_email FROM
           (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
         ORDER BY grp, user_email""",

    "q_range_join" ->
      """WITH clicks AS (SELECT event_id, user_id AS user_email, ts
              FROM events WHERE event_type = 'click'),
         wnd AS (SELECT DISTINCT user_id AS user_email, ts AS w_start,
                ts + INTERVAL 2 HOUR AS w_end
              FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_email, c.ts, w.w_start
         FROM clicks c JOIN wnd w
           ON c.user_email = w.user_email
              AND c.ts >= w.w_start AND c.ts < w.w_end
         ORDER BY c.event_id, w.w_start""",

    "q_asof_join" -> asofOracle,

    "q_asof_native" -> asofOracle,

    "q_asof_native_merge" -> asofOracle,

    "q_asof_skew" -> asofOracle,

    "q_asof_stream" -> asofOracle,

    "q_asof_multi" ->
      """WITH clicks AS (SELECT event_id, user_id AS user_email,
                date_trunc('day', ts) AS day, ts
              FROM events WHERE event_type = 'click'),
         purch AS (SELECT user_id AS user_email,
                date_trunc('day', ts) AS day, ts,
                round(max(value), 6) AS pvalue
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3)
         SELECT c.event_id, c.ts, c.user_email,
                p.ts AS asof_ts, p.pvalue AS asof_pvalue
         FROM clicks c ASOF LEFT JOIN purch p
           ON c.user_email = p.user_email AND c.day = p.day
             AND c.ts >= p.ts
         ORDER BY c.event_id""",

    "q_pivot_daily" ->
      """SELECT date_trunc('day', ts) AS day, user_id AS user_email,
                round(sum(value) FILTER (WHERE event_type = 'click'), 6) AS click,
                round(sum(value) FILTER (WHERE event_type = 'error'), 6) AS error,
                round(sum(value) FILTER (WHERE event_type = 'purchase'), 6) AS purchase,
                round(sum(value) FILTER (WHERE event_type = 'signup'), 6) AS signup,
                round(sum(value) FILTER (WHERE event_type = 'view'), 6) AS view
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_unpivot_orders" ->
      """SELECT o_orderkey, 'o_custkey' AS metric,
                CAST(o_custkey AS DOUBLE) AS val FROM orders
         UNION ALL
         SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val
         FROM orders
         ORDER BY o_orderkey, metric""",

    "q_upsert_partitioned" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value,
                props
         FROM events ORDER BY event_id""",

    "q_upsert_merge" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value,
                props
         FROM events ORDER BY event_id""",

    "q_upsert_evolving" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value,
                CASE WHEN event_id % 3 = 0 THEN 'reimport' END AS channel
         FROM events ORDER BY event_id""",

    "q_transform_wide" ->
      """SELECT * FROM (VALUES
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'meditation_minutes', 25.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'mood_score', 8.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'workout', 1.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2024-08-15 17:00:00', 'bob@x.com', 'workout', 0.0::DOUBLE, NULL::VARCHAR, 'sheets'),
           (TIMESTAMP '2025-01-15 18:00:00', 'carol@y.com', 'meditation_minutes', 10.5::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-01-15 18:00:00', 'carol@y.com', 'workout', 1.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'meditation_minutes', 100.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'mood_score', 7.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'workout', 1.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'meditation_minutes', 5.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'mood_score', 6.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'workout', 0.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'meditation_minutes', 3.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'mood_score', 2.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'workout', 1.0::DOUBLE, NULL, 'sheets')
         ) t(ts, user_email, habit, value, notes, source)
         ORDER BY user_email, habit""",

    // identical expected table to q_transform_wide: the CSV roundtrip
    // must not change the transform's output
    "q_transform_csv" ->
      """SELECT * FROM (VALUES
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'meditation_minutes', 25.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'mood_score', 8.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2025-08-22 17:00:00', 'alice@example.com', 'workout', 1.0::DOUBLE, 'Notes: felt great', 'sheets'),
           (TIMESTAMP '2024-08-15 17:00:00', 'bob@x.com', 'workout', 0.0::DOUBLE, NULL::VARCHAR, 'sheets'),
           (TIMESTAMP '2025-01-15 18:00:00', 'carol@y.com', 'meditation_minutes', 10.5::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-01-15 18:00:00', 'carol@y.com', 'workout', 1.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'meditation_minutes', 100.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'mood_score', 7.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-03 17:00:00', 'dave@z.com', 'workout', 1.0::DOUBLE, 'Notes: ok', 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'meditation_minutes', 5.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'mood_score', 6.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2025-08-22 13:30:00', 'eve@w.com', 'workout', 0.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'meditation_minutes', 3.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'mood_score', 2.0::DOUBLE, NULL, 'sheets'),
           (TIMESTAMP '2024-08-15 11:00:00', 'gina@x.com', 'workout', 1.0::DOUBLE, NULL, 'sheets')
         ) t(ts, user_email, habit, value, notes, source)
         ORDER BY user_email, habit""",

    "q_raw_dedup" ->
      """SELECT min(doc_id) AS doc_id, sha256(text) AS row_hash,
                count(*) AS n_copies
         FROM documents GROUP BY sha256(text) ORDER BY 1""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS sum_disc_price,
                round(avg(l_quantity), 6) AS avg_qty,
                round(avg(l_discount), 6) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_above_avg_orders" ->
      """SELECT o_custkey, count(*) AS n_above,
                round(max(o_totalprice), 6) AS max_price
         FROM orders o
         WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                               WHERE o2.o_custkey = o.o_custkey)
         GROUP BY o_custkey ORDER BY o_custkey""",

    "q_revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
                count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",

    "q_shipping_priority" ->
      """SELECT l_orderkey,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue,
              o_orderdate, o_orderpriority
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1996-03-15'
           AND l_shipdate > TIMESTAMP '1996-03-15'
         GROUP BY 1, 3, 4
         ORDER BY revenue DESC, o_orderdate, l_orderkey
         LIMIT 10""",

    "q_local_supplier_revenue" ->
      """SELECT n_name,
              round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",

    "q_top_orders_per_segment" ->
      """SELECT c_mktsegment, rank, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders JOIN customer ON o_custkey = c_custkey
         ) WHERE rank <= 5 ORDER BY c_mktsegment, rank""",

    // plain unpruned join — proves the bloom pre-filter changes nothing
    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 450000
         GROUP BY 1 ORDER BY 1""",

    "q_bloom_stream" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 450000
         GROUP BY 1 ORDER BY 1""",

    "q_bucket_join" ->
      """SELECT o_orderdate,
                sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT))::BIGINT AS revenue_e4,
                count(*)::BIGINT AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",

    "q_orc_roundtrip" ->
      """SELECT event_type AS habit, count(*)::BIGINT AS n,
                round(avg(value), 6) AS avg_value, max(ts) AS last_ts
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_jsonl_roundtrip" ->
      """SELECT event_type AS habit, count(*)::BIGINT AS n,
                round(avg(value), 6) AS avg_value, max(ts) AS last_ts
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_variant_shredded" ->
      """SELECT event_type AS habit, count(*)::BIGINT AS n,
                sum((props ->> '$.k')::BIGINT)::BIGINT AS sum_k,
                round(avg(value), 6) AS avg_value
         FROM events WHERE (props ->> '$.k')::BIGINT >= 50
         GROUP BY 1 ORDER BY 1""",

    "q_interval_join_stream" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
              p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase')
         SELECT c.event_id AS l_event_id, p.event_id AS r_event_id,
                c.ts AS l_ts, c.user_id AS user_email, p.ts AS r_ts
         FROM c JOIN p ON c.user_id = p.user_id
           AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts
         ORDER BY 1, 2""",

    // the BATCH left interval join — every unmatched click must have
    // produced exactly one null-padded row through the watermark flush
    "q_interval_join_outer_stream" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
              p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase')
         SELECT c.event_id AS l_event_id, p.event_id AS r_event_id,
                c.ts AS l_ts, c.user_id AS user_email, p.ts AS r_ts
         FROM c LEFT JOIN p ON c.user_id = p.user_id
           AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts
         ORDER BY 1, 2""",

    // both directions at once — the BATCH full interval join
    "q_interval_join_full_stream" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
              p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase')
         SELECT c.event_id AS l_event_id, p.event_id AS r_event_id,
                c.ts AS l_ts,
                coalesce(c.user_id, p.user_id) AS user_email,
                p.ts AS r_ts
         FROM c FULL JOIN p ON c.user_id = p.user_id
           AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts
         ORDER BY 1, 2""",

    "q_profile_approx" ->
      """SELECT * FROM (
           SELECT 'event_id' AS col_name, count(*)::BIGINT AS n_rows,
                  (count(*) - count(event_id))::BIGINT AS n_null,
                  round(min(event_id)::DOUBLE, 6) AS min_num,
                  round(max(event_id)::DOUBLE, 6) AS max_num,
                  true AS approx_ok
           FROM events
           UNION ALL
           SELECT 'event_type', count(*)::BIGINT,
                  (count(*) - count(event_type))::BIGINT,
                  NULL::DOUBLE, NULL::DOUBLE, true
           FROM events
           UNION ALL
           SELECT 'user_id', count(*)::BIGINT,
                  (count(*) - count(user_id))::BIGINT,
                  round(min(user_id)::DOUBLE, 6),
                  round(max(user_id)::DOUBLE, 6), true
           FROM events
           UNION ALL
           SELECT 'value', count(*)::BIGINT,
                  (count(*) - count(value))::BIGINT,
                  round(min(value)::DOUBLE, 6),
                  round(max(value)::DOUBLE, 6), true
           FROM events
         ) ORDER BY col_name""",

    "q_profile" ->
      """SELECT * FROM (
           SELECT 'event_id' AS col_name, count(*)::BIGINT AS n_rows,
                  (count(*) - count(event_id))::BIGINT AS n_null,
                  count(DISTINCT event_id)::BIGINT AS n_distinct,
                  min(event_id)::DOUBLE AS min_num,
                  max(event_id)::DOUBLE AS max_num,
                  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
           FROM events
           UNION ALL
           SELECT 'user_id', count(*)::BIGINT,
                  (count(*) - count(user_id))::BIGINT,
                  count(DISTINCT user_id)::BIGINT,
                  min(user_id)::DOUBLE, max(user_id)::DOUBLE,
                  NULL::VARCHAR, NULL::VARCHAR
           FROM events
           UNION ALL
           SELECT 'event_type', count(*)::BIGINT,
                  (count(*) - count(event_type))::BIGINT,
                  count(DISTINCT event_type)::BIGINT,
                  NULL::DOUBLE, NULL::DOUBLE,
                  min(event_type), max(event_type)
           FROM events
           UNION ALL
           SELECT 'value', count(*)::BIGINT,
                  (count(*) - count(value))::BIGINT,
                  count(DISTINCT value)::BIGINT,
                  min(value)::DOUBLE, max(value)::DOUBLE,
                  NULL::VARCHAR, NULL::VARCHAR
           FROM events
         ) ORDER BY col_name""",

    "q_expectations" ->
      """WITH a AS (SELECT
              count(*)::DOUBLE AS n,
              count(o_custkey)::DOUBLE AS nn_cust,
              count(DISTINCT o_orderkey)::DOUBLE AS nd_key,
              count(o_orderkey)::DOUBLE AS nn_key,
              count(DISTINCT o_orderstatus)::DOUBLE AS nd_st,
              count(o_orderstatus)::DOUBLE AS nn_st,
              count(CASE WHEN o_totalprice BETWEEN 0 AND 100000
                    THEN 1 END)::DOUBLE AS nr_tp,
              count(o_totalprice)::DOUBLE AS nn_tp,
              count(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                    THEN 1 END)::DOUBLE AS nm_pr,
              count(o_orderpriority)::DOUBLE AS nn_pr,
              count(CASE WHEN o_orderstatus IN ('F', 'O')
                    THEN 1 END)::DOUBLE AS ns_st
            FROM orders)
         SELECT * FROM (
           SELECT 'complete' AS "check", 'o_custkey' AS col_name,
                  round(nn_cust / n, 6) AS metric,
                  nn_cust / n >= 1.0 AS passed FROM a
           UNION ALL
           SELECT 'unique', 'o_orderkey', round(nd_key / nn_key, 6),
                  nd_key / nn_key >= 1.0 FROM a
           UNION ALL
           SELECT 'unique', 'o_orderstatus', round(nd_st / nn_st, 6),
                  nd_st / nn_st >= 1.0 FROM a
           UNION ALL
           SELECT 'in_range', 'o_totalprice', round(nr_tp / nn_tp, 6),
                  nr_tp / nn_tp >= 0.9 FROM a
           UNION ALL
           SELECT 'matches_regex', 'o_orderpriority',
                  round(nm_pr / nn_pr, 6), nm_pr / nn_pr >= 1.0 FROM a
           UNION ALL
           SELECT 'in_set', 'o_orderstatus', round(ns_st / nn_st, 6),
                  ns_st / nn_st >= 0.6 FROM a
         ) ORDER BY "check", col_name""",

    "q_token_count" ->
      """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens, n_chars
         FROM documents ORDER BY doc_id""",

    "q_lang_id" -> {
      val markers = TextAnalysis.LangMarkers.map { case (l, ms) =>
        l -> ms.map(m => s"'$m'").mkString("[", ", ", "]")
      }
      val scores = markers.map { case (l, arr) =>
        s"len(list_filter(l, x -> list_contains($arr, x))) AS s_$l"
      }.mkString(",\n                ")
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l =>
        s"WHEN s_$l > 0 AND s_$l = best THEN '$l'").mkString(" ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         s AS (SELECT doc_id, $scores FROM t),
         b AS (SELECT *, $best AS best FROM s)
         SELECT doc_id, CASE $cases ELSE 'und' END AS lang_guess
         FROM b ORDER BY doc_id"""
    },

    "q_lang_id_ngram" -> {
      // The trigram profiles are trained once on the driver and shipped
      // to BOTH engines as the same literal longs — no float surface.
      val profVals = TextAnalysis.LangProfiles
        .map { case (l, _, tg, lp) => s"('$l', '$tg', ${lp}::BIGINT)" }
        .mkString(",\n                ")
      val langVals = TextAnalysis.LangSeeds.map(_._1).zipWithIndex
        .map { case (l, p) => s"('$l', $p)" }.mkString(", ")
      s"""WITH prof(lang, tg, lp) AS (VALUES $profVals),
         langs(lang, prec) AS (VALUES $langVals),
         t AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                '[^\\p{L} ]', ' ', 'g'), ' +', ' ', 'g')) AS n FROM documents),
         g AS (SELECT doc_id, unnest([substr(n, i, 3)
                for i in generate_series(1, length(n) - 2)]) AS tg
               FROM t WHERE length(n) >= 3),
         c AS (SELECT doc_id, tg, count(*)::BIGINT AS c FROM g GROUP BY 1, 2),
         sc AS (SELECT c.doc_id, l.lang, l.prec,
                 sum(c.c * coalesce(p.lp, ${TextAnalysis.LangOovLp}::BIGINT)) AS score
                FROM c CROSS JOIN langs l
                LEFT JOIN prof p ON p.lang = l.lang AND p.tg = c.tg
                GROUP BY 1, 2, 3),
         b AS (SELECT doc_id, lang, row_number() OVER (
                 PARTITION BY doc_id ORDER BY score DESC, prec ASC) AS rn
               FROM sc)
         SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_guess
         FROM documents d LEFT JOIN b ON d.doc_id = b.doc_id AND b.rn = 1
         ORDER BY d.doc_id"""
    },

    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
                length(text) AS n, len(list_filter(string_split(text, ' '),
                  x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS n_stop
              FROM documents),
         m AS (SELECT doc_id, n_tokens,
                (n - (n_tokens - 1))::DOUBLE / n_tokens::DOUBLE AS mtl,
                length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                  / greatest(n, 1)::DOUBLE AS pr,
                n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE AS sr
              FROM t)
         SELECT doc_id, n_tokens::BIGINT AS n_tokens,
                round(mtl, 6) AS mean_token_len,
                round(pr, 6) AS punct_ratio,
                round(sr, 6) AS stopword_ratio,
                round(25.0 * least(n_tokens::DOUBLE / 50.0, 1.0)
                      + 25.0 * least(mtl / 6.0, 1.0)
                      + 25.0 * (1.0 - pr)
                      + 25.0 * least(sr * 8.0, 1.0), 6) AS quality
         FROM m ORDER BY doc_id""",

    "q_token_stats" ->
      """SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
                len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_re_tokens
         FROM documents ORDER BY doc_id""",

    "q_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         c AS (SELECT doc_id, l,
                unnest(generate_series(0, (len(l) - 1) // 32)) AS i FROM t),
         s AS (SELECT doc_id, i::BIGINT AS chunk_idx,
                array_to_string(l[i * 32 + 1 : i * 32 + 32], ' ') AS chunk
              FROM c)
         SELECT doc_id, chunk_idx,
                len(string_split(chunk, ' '))::BIGINT AS n_tokens,
                md5(chunk) AS chunk_md5
         FROM s ORDER BY doc_id, chunk_idx""",

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents),
         c AS (SELECT doc_id, shard, n_tokens,
                sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t WHERE n_tokens > 0)
         SELECT shard::BIGINT AS shard,
                floor((cum - n_tokens) / 512.0)::BIGINT AS bin,
                count(*)::BIGINT AS n_docs,
                sum(n_tokens)::BIGINT AS bin_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_pack_concat" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents),
         c AS (SELECT doc_id, shard, n_tokens,
                sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                  AS e
              FROM t WHERE n_tokens > 0),
         spans AS (SELECT doc_id, shard, e - n_tokens AS s, e,
                unnest(generate_series((e - n_tokens) // 512,
                                       (e - 1) // 512)) AS bin
              FROM c)
         SELECT shard::BIGINT AS shard, bin::BIGINT AS bin,
                count(*)::BIGINT AS n_docs,
                sum(least(e, (bin + 1) * 512) -
                    greatest(s, bin * 512))::BIGINT AS bin_tokens,
                sum(greatest(s, bin * 512) - bin * 512)::BIGINT AS sum_starts,
                max(greatest(s, bin * 512) - bin * 512)::BIGINT AS max_start,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM spans GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents),
         freq AS (SELECT token, count(*)::DOUBLE AS cnt FROM tok GROUP BY 1),
         tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
         SELECT t.doc_id,
                round(avg(log2(f.cnt / tot.n)), 6) AS avg_logprob
         FROM tok t JOIN freq f USING (token), tot
         GROUP BY 1 ORDER BY 1""",

    "q_retention" ->
      """WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
         SELECT c.cohort_week,
                (date_diff('day', c.cohort_week, w.week) // 7)::BIGINT
                  AS week_offset,
                count(*)::BIGINT AS n_users
         FROM w JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         m AS (SELECT doc_id,
                len(l)::BIGINT AS n_words,
                (length(text) - (len(l) - 1))::DOUBLE / len(l)::DOUBLE
                  AS mwl,
                len(list_filter(l, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                  / greatest(len(l), 1)::DOUBLE AS ar,
                len(list_intersect(list_distinct(l),
                    ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it',
                     'that', 'for']))::BIGINT AS sh
              FROM t)
         SELECT doc_id, n_words,
                round(mwl, 6) AS mean_word_len,
                round(ar, 6) AS alpha_word_ratio,
                sh AS stop_hits,
                n_words BETWEEN 50 AND 100000 AS ok_words,
                mwl >= 3.0 AND mwl <= 10.0 AS ok_word_len,
                ar >= 0.8 AS ok_alpha,
                sh >= 2 AS ok_stop,
                (n_words BETWEEN 50 AND 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
                  AND ar >= 0.8 AND sh >= 2 AS pass
         FROM m ORDER BY doc_id""",

    "q_bm25" -> bm25Oracle,

    // scoring the maintained index equals the ad-hoc corpus scan
    "q_bm25_stream" -> bm25Oracle,

    // word-position occurrences (overlaps included) straight off the
    // token arrays — no index in sight, so the conjunction's answer is
    // gated against first principles
    "q_phrase_search" ->
      """WITH w AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS ws
              FROM documents),
         hits AS (SELECT doc_id FROM
              (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws) - 1)) AS p
               FROM w)
              WHERE ws[p] = 'merge' AND ws[p + 1] = 'sort')
         SELECT doc_id, count(*)::BIGINT AS n_hits
         FROM hits GROUP BY 1 ORDER BY 1""",

    "q_dedup_recall" ->
      (s"""WITH mh AS MATERIALIZED (${minhashOracleSql("")}),
         ng AS MATERIALIZED ($ngramOracleSql),
         j AS (SELECT
                (ng.id_a IS NOT NULL)::BIGINT AS t,
                (mh.id_a IS NOT NULL)::BIGINT AS f
              FROM ng FULL OUTER JOIN mh
                ON ng.id_a = mh.id_a AND ng.id_b = mh.id_b)
         SELECT sum(t)::BIGINT AS n_truth, sum(f)::BIGINT AS n_found,
                sum(t * f)::BIGINT AS n_hit,
                round(sum(t * f)::DOUBLE / sum(t)::DOUBLE, 6) AS recall,
                round(sum(t * f)::DOUBLE / sum(f)::DOUBLE, 6) AS precision
         FROM j"""),

    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         i AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
              FROM t WHERE len(l) >= 2),
         b AS (SELECT doc_id, l[i] AS prev, l[i + 1] AS cur FROM i),
         bc AS (SELECT prev, cur, count(*)::DOUBLE AS bcnt
              FROM b GROUP BY 1, 2),
         pc AS (SELECT prev, sum(bcnt) AS pcnt FROM bc GROUP BY 1)
         SELECT b.doc_id,
                round(avg(log2(bc.bcnt / pc.pcnt)), 6) AS avg_logprob
         FROM b JOIN bc USING (prev, cur) JOIN pc USING (prev)
         GROUP BY 1 ORDER BY 1""",

    "q_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         c AS (SELECT doc_id, l,
                unnest(generate_series(0,
                  greatest(0, (len(l) - 32 + 16 - 1) // 16))) AS i FROM t),
         s AS (SELECT doc_id, i::BIGINT AS chunk_idx,
                array_to_string(l[i * 16 + 1 : i * 16 + 32], ' ') AS chunk
              FROM c)
         SELECT doc_id, chunk_idx,
                len(string_split(chunk, ' '))::BIGINT AS n_tokens,
                md5(chunk) AS chunk_md5
         FROM s ORDER BY doc_id, chunk_idx""",

    "q_repetition" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN [array_to_string(l[i:i+2], ' ')
                      for i in generate_series(1, len(l) - 2)]
                ELSE [text] END AS s FROM tok)
         SELECT doc_id,
                round(1.0 - len(list_distinct(s))::DOUBLE / len(s)::DOUBLE, 6)
                  AS rep_ratio
         FROM sh ORDER BY doc_id""",

    "q_pii_scan" ->
      """SELECT doc_id,
                len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                  AS n_emails,
                len(regexp_extract_all(text,
                  'https?://[^ \t\n\r\f]+'))::BIGINT AS n_urls,
                len(regexp_extract_all(text, '[0-9]{7,}'))::BIGINT
                  AS n_long_numbers,
                md5(regexp_replace(regexp_replace(regexp_replace(text,
                  'https?://[^ \t\n\r\f]+', '<URL>', 'g'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '[0-9]{7,}', '<NUM>', 'g')) AS masked_md5
         FROM documents ORDER BY doc_id""",

    "q_heavy_hitters" ->
      """SELECT term, count(*)::BIGINT AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         GROUP BY term HAVING count(*) >= 200 ORDER BY term""",

    "q_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents),
         p AS (SELECT unnest([substr(w, i, 2)
                  for i in generate_series(1, length(w) - 1)]) AS pair
              FROM w)
         SELECT pair, count(*)::BIGINT AS n
         FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""",

    "q_bpe_train" -> bpeTrainOracle(8),

    "q_unigram_vocab" ->
      s"""WITH $unigramChainSql
         SELECT piece, cnt, cost FROM ucosts ORDER BY piece""",

    // the maintained-census vocabulary equals the batch seed
    "q_unigram_vocab_stream" ->
      s"""WITH $unigramChainSql
         SELECT piece, cnt, cost FROM ucosts ORDER BY piece""",

    "q_unigram_ids" ->
      s"""WITH $unigramChainSql
         SELECT (row_number() OVER (ORDER BY cost, piece) - 1)::BIGINT
                  AS id,
                piece, cnt, cost
         FROM ucosts ORDER BY id""",

    "q_unigram_encode" -> unigramEncodeOracle,
    "q_wordpiece" -> wordPieceOracle,

    // stride scheduling: per-source md5 rank, ikey = rank·1e9 // w
    "q_interleave" ->
      """WITH d AS (SELECT doc_id, source,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
            FROM documents
            WHERE source IN ('src0', 'src1', 'src2', 'src3')),
         r AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                ::BIGINT AS rank_in_source FROM d)
         SELECT doc_id, source, rank_in_source,
                (rank_in_source * 1000000000 //
                 CASE source WHEN 'src0' THEN 3 ELSE 1 END)::BIGINT AS ikey
         FROM r ORDER BY ikey, source, rank_in_source""",

    // raw-array 1-based positions, vocabulary keep-ppm thresholds
    // (sqrt is correctly rounded on both engines), md5 draws, and the
    // position-ordered survivor digest (coalesced to '' when a doc
    // keeps nothing, matching Spark's empty array_join)
    "q_subsample" ->
      """WITH tok AS (SELECT doc_id, l[i] AS word, i::BIGINT AS pos
              FROM (SELECT doc_id, string_split(text, ' ') AS l
                    FROM documents),
                   unnest(generate_series(1, len(l))) AS t(i)
              WHERE l[i] <> ''),
         freq AS (SELECT word, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
         tot AS (SELECT sum(cnt)::BIGINT AS N FROM freq),
         keep AS (SELECT word,
              least(1000000, round(1e6 *
                sqrt(10000.0 * N / cnt / 1e6)))::BIGINT AS keep_ppm
              FROM freq, tot),
         dr AS (SELECT t.doc_id, t.pos, t.word,
              (('0x' || substr(md5(t.doc_id || ' ' || t.pos || ' ' ||
                 t.word), 1, 15))::UBIGINT % 1000000)::BIGINT
                < k.keep_ppm AS kept
              FROM tok t JOIN keep k USING (word))
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
                sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                md5(coalesce(
                  string_agg(word, ' ' ORDER BY pos) FILTER (WHERE kept),
                  '')) AS kept_md5
         FROM dr GROUP BY 1 ORDER BY 1""",

    "q_skipgram" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         pr AS (SELECT l[i] AS center, l[i + d.d] AS context
              FROM tok, unnest(generate_series(1, len(l))) AS t(i),
                   (SELECT unnest([-2, -1, 1, 2]) AS d) d
              WHERE len(l) >= 2 AND i + d.d >= 1 AND i + d.d <= len(l))
         SELECT center, context, count(*)::BIGINT AS n
         FROM pr GROUP BY 1, 2 ORDER BY 1, 2""",

    // inverse-CDF draws at md5(center, context, j) mod total mass over
    // the cumulative vocabulary table ordered by the md5 rank key (the
    // order whose high bits Spark salts its distributed prefix sum on)
    "q_negative_samples" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         pr AS (SELECT l[i] AS center, l[i + d.d] AS context
              FROM tok, unnest(generate_series(1, len(l))) AS t(i),
                   (SELECT unnest([-2, -1, 1, 2]) AS d) d
              WHERE len(l) >= 2 AND i + d.d >= 1 AND i + d.d <= len(l)),
         pairs AS (SELECT center, context FROM pr GROUP BY 1, 2),
         voc AS (SELECT w AS word, count(*)::BIGINT AS m
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents)
              WHERE w <> '' GROUP BY 1),
         cum AS (SELECT word, m,
              sum(m) OVER (ORDER BY
                  ('0x' || substr(md5(word), 1, 15))::UBIGINT, word
                ROWS UNBOUNDED PRECEDING)::BIGINT AS hi FROM voc),
         cum2 AS (SELECT word, hi - m AS lo, hi FROM cum),
         tot AS (SELECT max(hi)::BIGINT AS M FROM cum),
         smp AS (SELECT center, context, j.j::BIGINT AS j,
              (('0x' || substr(md5(center || ' ' || context || ' ' || j.j),
                 1, 15))::UBIGINT % M)::BIGINT AS r
              FROM pairs, (SELECT unnest([1, 2]) AS j) j, tot)
         SELECT s.center, s.context, s.j, c.word AS neg
         FROM smp s JOIN cum2 c ON s.r >= c.lo AND s.r < c.hi
         ORDER BY 1, 2, 3""",

    // both proven encode chains collapsed to corpus totals
    "q_tokenizer_eval" ->
      s"""WITH b AS (${bpeEncodeOracle(8)}),
         u AS ($unigramEncodeOracle),
         wpt AS ($wordPieceOracle)
         SELECT * FROM (
           SELECT 'bpe8' AS tokenizer,
                  sum(n_bpe_tokens)::BIGINT AS total_units FROM b
           UNION ALL
           SELECT 'unigram40' AS tokenizer,
                  sum(n_pieces)::BIGINT AS total_units FROM u
           UNION ALL
           SELECT 'wordpiece40' AS tokenizer,
                  sum(n_pieces)::BIGINT AS total_units FROM wpt)
         ORDER BY tokenizer""",

    "q_bpe_encode" -> bpeEncodeOracle(8),
    "q_bpe_encode_ids" -> bpeEncodeIdsOracle(8),

    // Ground truth, not a replay: the round-trip's decoded characters
    // must equal the raw text with the single-space separators removed.
    "q_bpe_roundtrip" ->
      """SELECT doc_id, md5(replace(text, ' ', '')) AS text_md5
         FROM documents WHERE replace(text, ' ', '') <> ''
         ORDER BY doc_id""",

    // Ground truth again: the byte-level round-trip must land on the
    // same characters — bytes are an encoding detail, not a semantics
    // change.
    "q_bpe_bytes_roundtrip" ->
      """SELECT doc_id, md5(replace(text, ' ', '')) AS text_md5
         FROM documents WHERE replace(text, ' ', '') <> ''
         ORDER BY doc_id""",
    "q_export_token_shards" -> exportTokenShardsOracle(8),
    "q_export_token_shards_eod" -> exportTokenShardsOracle(8, eod = true),

    // the packed position streams in the same closed-form spans algebra
    "q_pack_positions" ->
      s"""WITH ${bpeIdsChainSql(8)},
         pk AS (SELECT doc_id, doc_id % 4 AS shard, len(tids)::BIGINT AS n
              FROM fl WHERE len(tids) > 0),
         pc AS (SELECT doc_id, shard, n,
                sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                  AS e
              FROM pk),
         spans AS (SELECT doc_id, shard, e - n AS s, e,
                unnest(generate_series((e - n) // 512,
                                       (e - 1) // 512)) AS bin
              FROM pc),
         sl AS (SELECT doc_id, shard, bin,
                greatest(s, bin * 512) - bin * 512 AS start_in_bin,
                least(e, (bin + 1) * 512) - greatest(s, bin * 512)
                  AS tok_in_bin,
                greatest(s, bin * 512) - s AS doc_off
              FROM spans),
         ps AS (SELECT shard, bin, start_in_bin, tok_in_bin,
                [p for p in generate_series(doc_off,
                                            doc_off + tok_in_bin - 1)]
                  AS pos
              FROM sl)
         SELECT shard::BIGINT AS shard, bin::BIGINT AS bin,
                count(*)::BIGINT AS n_docs,
                sum(tok_in_bin)::BIGINT AS bin_tokens,
                md5(array_to_string(
                  flatten(list(pos ORDER BY start_in_bin)), ' '))
                  AS pos_md5
         FROM ps GROUP BY 1, 2 ORDER BY 1, 2""",

    // Same hash → budget → ordered-prefix arithmetic as mixtureByTokens:
    // budget floor(2000·w/5.5) per source, md5-rank order, keep while
    // the cumulative count BEFORE the row is under budget.
    "q_mixture_budget" -> mixtureOracle,
    "q_mixture_salted" -> mixtureOracle,

    // DSIR replay: candidate-vocabulary Laplace LMs on both sides,
    // each ln quantized to 1e-6-unit BIGINTs before the subtraction
    // and the per-doc sum — the NB discipline, so the top-k cut is
    // exact.
    "q_dsir_select" ->
      """WITH ct AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents WHERE source <> 'src0'),
         sf AS (SELECT term, count(*)::BIGINT AS c_s FROM ct GROUP BY 1),
         st AS (SELECT sum(c_s)::BIGINT AS n_s, count(*)::BIGINT AS v
              FROM sf),
         tt AS (SELECT term, count(*)::BIGINT AS c_t
              FROM (SELECT unnest(string_split(text, ' ')) AS term
                    FROM documents WHERE source = 'src0')
              GROUP BY 1),
         ttot AS (SELECT coalesce(sum(c_t), 0)::BIGINT AS n_t FROM tt),
         r AS (SELECT sf.term,
                CAST(round(ln((coalesce(tt.c_t, 0) + 1)::DOUBLE
                    / (ttot.n_t + st.v)) * 1e6) AS BIGINT)
              - CAST(round(ln((sf.c_s + 1)::DOUBLE
                    / (st.n_s + st.v)) * 1e6) AS BIGINT) AS ratio_e6
              FROM sf LEFT JOIN tt USING (term)
              CROSS JOIN st CROSS JOIN ttot),
         dtf AS (SELECT doc_id, term, count(*)::BIGINT AS n
              FROM ct GROUP BY 1, 2),
         w AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens,
                sum(n * ratio_e6)::BIGINT AS weight_e6
              FROM dtf JOIN r USING (term) GROUP BY 1)
         SELECT doc_id, n_tokens, weight_e6 FROM w
         ORDER BY weight_e6 DESC, doc_id LIMIT 200""",

    // Temperature replay: per-source token masses off the corpus, the
    // relative-pow weights quantized to 1e-6 units (round to whole
    // units of the largest source), then the standard budget fill.
    // 2000 * w is exact (w <= 1e6 integral), the division replays the
    // driver's own IEEE expression order.
    "q_mixture_temperature" ->
      """WITH mass AS (SELECT source,
                sum(len(string_split(text, ' ')))::BIGINT AS m
              FROM documents GROUP BY 1),
         wts AS (SELECT source,
                round(pow(m / (SELECT max(m) FROM mass)::DOUBLE, 0.5)
                  * 1000000) AS w
              FROM mass),
         d AS (SELECT doc_id, source,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM documents),
         r AS (SELECT d.doc_id, d.source, d.n_tokens,
                row_number() OVER (PARTITION BY d.source
                  ORDER BY h, d.doc_id)::BIGINT AS take_rank,
                sum(d.n_tokens) OVER (PARTITION BY d.source
                  ORDER BY h, d.doc_id
                  ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens,
                floor(2000 * wts.w / (SELECT sum(w) FROM wts))::BIGINT
                  AS budget
              FROM d JOIN wts ON d.source = wts.source
              WHERE d.n_tokens > 0)
         SELECT source, take_rank, doc_id, n_tokens, cum_tokens
         FROM r WHERE cum_tokens - n_tokens < budget
         ORDER BY source, take_rank""",

    "q_export_shards" ->
      """WITH b AS (SELECT doc_id,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM documents)
         SELECT (h % 8)::BIGINT AS shard,
                row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
                  ::BIGINT AS shard_pos,
                doc_id
         FROM b ORDER BY shard, shard_pos""",

    "q_export_manifest" ->
      """WITH b AS (SELECT doc_id, text,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM documents),
         r AS (SELECT (h % 8)::BIGINT AS shard,
                row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
                  AS shard_pos,
                doc_id, text
            FROM b)
         SELECT shard, count(*)::BIGINT AS n_docs,
              sum(length(text))::BIGINT AS total_chars,
              md5(string_agg(md5(text), '' ORDER BY shard_pos)) AS digest
         FROM r GROUP BY 1 ORDER BY 1""",

    // epoch-salted order replay: same shard hash, per-epoch rank key
    "q_export_epochs" ->
      """WITH b AS (SELECT doc_id,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM documents),
         e0 AS (SELECT 0 AS epoch, (h % 8)::BIGINT AS shard,
                row_number() OVER (PARTITION BY h % 8 ORDER BY
                  ('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 15))
                    ::UBIGINT, doc_id)::BIGINT AS shard_pos, doc_id
              FROM b),
         e1 AS (SELECT 1 AS epoch, (h % 8)::BIGINT AS shard,
                row_number() OVER (PARTITION BY h % 8 ORDER BY
                  ('0x' || substr(md5(doc_id::VARCHAR || ':1'), 1, 15))
                    ::UBIGINT, doc_id)::BIGINT AS shard_pos, doc_id
              FROM b)
         SELECT * FROM e0 UNION ALL SELECT * FROM e1
         ORDER BY epoch, shard, shard_pos""",

    // LEFT JOIN back to documents so empty-text docs keep their 0.0 row
    // and NULL text stays NULL — matching CharEntropy's contract
    "q_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
                unnest([text[i] for i in generate_series(1, length(text))])
                  AS c
              FROM documents),
         cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS k
              FROM ch GROUP BY 1, 2),
         e AS (SELECT doc_id,
                round(log2(sum(k)) - sum(k * log2(k)) / sum(k), 6)
                  AS char_entropy
              FROM cnt GROUP BY doc_id)
         SELECT d.doc_id,
                CASE WHEN d.text IS NULL THEN NULL
                     ELSE coalesce(e.char_entropy, 0.0) END AS char_entropy
         FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
         ORDER BY d.doc_id""",

    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT t.doc_id, t.term,
                round(t.tf * ln(n.n_docs::DOUBLE / d.df::DOUBLE), 6) AS tfidf
              FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n),
         r AS (SELECT doc_id, term, tfidf,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term)::BIGINT AS rank FROM scored)
         SELECT doc_id, rank, term, tfidf FROM r
         WHERE rank <= 3 AND doc_id < 50 ORDER BY doc_id, rank""",

    "q_fingerprint" ->
      """WITH fp AS (SELECT doc_id, text,
                list_reduce(list_prepend(0::BIGINT,
                    [ascii(x)::BIGINT for x in string_split(text, '')]),
                  (a, b) -> (a * 31 + b) % 1000000007) AS poly_fp
              FROM documents)
         SELECT doc_id, poly_fp,
                CASE WHEN length(text) >= 8 THEN
                  list_min([list_reduce(list_prepend(0::BIGINT,
                      [ascii(x)::BIGINT for x in string_split(substr(text, i, 8), '')]),
                    (a, b) -> (a * 31 + b) % 1000000007)
                    for i in generate_series(1, length(text) - 7)])
                ELSE poly_fp END AS kgram_min_fp
         FROM fp ORDER BY doc_id""",

    "q_dedup_minhash" -> minhashOracleSql(""),

    // the streaming ingest-dedup replay accumulates exactly the batch
    // pair set — same oracle, no stream-specific SQL
    "q_dedup_stream" -> minhashOracleSql(""),

    // identical minhash pipeline, restricted to pairs touching the
    // batch (doc_id % 10 = 0) — exactly the incremental contract
    "q_dedup_incremental" ->
      minhashOracleSql(" AND (id_a % 10 = 0 OR id_b % 10 = 0)"),

    "q_dedup_ngram" -> ngramOracleSql,

    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS s FROM shl),
         h AS (SELECT doc_id,
                ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT AS h FROM sh),
         bits AS (SELECT doc_id, p.p AS p,
                CASE WHEN (h >> p.p) & 1 = 1 THEN 1 ELSE -1 END AS v
              FROM h, (SELECT unnest(generate_series(0, 59)) AS p) p),
         sv AS (SELECT doc_id, p, sum(v) AS sv FROM bits GROUP BY doc_id, p)
         SELECT doc_id, sum(CASE WHEN sv > 0 THEN (1::BIGINT << p)
                                 ELSE 0 END)::BIGINT AS simhash
         FROM sv GROUP BY doc_id ORDER BY doc_id""",

    "q_fuzzy_dedup" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                a.p_name AS str_a, b.p_name AS str_b,
                levenshtein(a.p_name, b.p_name)::BIGINT AS dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY id_a, id_b""",

    "q_dedup_simhash_pairs" -> simhashPairsOracle,
    "q_dedup_ensemble" -> dedupEnsembleOracle,
    "q_late_audit" ->
      """WITH b AS (SELECT event_type, ts,
              ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::UBIGINT % 2
                AS tick
            FROM events),
         m0 AS (SELECT max(ts) AS hw FROM b WHERE tick = 0)
         SELECT event_type, count(*)::BIGINT AS n_late
         FROM b, m0
         WHERE tick = 1 AND ts < hw - INTERVAL 1 DAY
         GROUP BY 1 ORDER BY 1""",
    // 3-iteration integer PageRank replay over the shared edge CTE
    "q_pagerank" -> pageRankOracle(3),

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
         SELECT id AS doc_id, min(lbl)::BIGINT AS cluster_id,
                (id = min(lbl)) AS is_canonical
         FROM reach GROUP BY id ORDER BY doc_id""",

    // clusters (recursive min-label) ⋈ 3-iteration integer PageRank,
    // hub picked per cluster by (rank desc, id)
    "q_canonical_select" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         ${pageRankChainSql(3)},
         pick AS (SELECT c.cluster_id, c.id, p.rank,
                row_number() OVER (PARTITION BY c.cluster_id
                  ORDER BY p.rank DESC, c.id) AS rk,
                count(*) OVER (PARTITION BY c.cluster_id) AS n_members
              FROM clus c JOIN it3 p ON p.id = c.id)
         SELECT cluster_id, id AS canonical_id, rank AS rank_e12,
                n_members::BIGINT AS n_members
         FROM pick WHERE rk = 1 ORDER BY cluster_id""",

    "q_curation" ->
      s"""$curationOraclePrefix
         SELECT k.doc_id, round(k.quality, 6) AS quality,
                k.n_tokens::BIGINT AS n_tokens, $curationSplitSql AS split
         FROM keptf k LEFT JOIN clus c ON k.doc_id = c.id
         WHERE c.id IS NULL OR c.cluster_id = k.doc_id
         ORDER BY k.doc_id""",

    // the composed pipeline: curation survivors (shared CTE prefix) →
    // mixture (budgets: 1500 tokens, weights 2/1/1/1 over src0-3 ⇒
    // 600/300/300/300) → BPE train+encode on the mixed corpus (shared
    // word-chain CTEs pointed at it) → 512-token concat packing over 4
    // pack shards → md5 export order over the bins
    "q_pipeline_export" ->
      s"""$curationOraclePrefix,
         surv AS (SELECT k.doc_id, k.n_tokens::BIGINT AS n_tokens,
                $curationSplitSql AS split
              FROM keptf k LEFT JOIN clus c ON k.doc_id = c.id
              WHERE c.id IS NULL OR c.cluster_id = k.doc_id),
         trn AS (SELECT s.doc_id, s.n_tokens, d.source
              FROM surv s JOIN documents d USING (doc_id)
              WHERE s.split = 'train'
                AND d.source IN ('src0', 'src1', 'src2', 'src3')),
         mh AS (SELECT doc_id, source, n_tokens,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS h
              FROM trn WHERE n_tokens > 0),
         mixr AS (SELECT doc_id, n_tokens,
                sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
                CASE source WHEN 'src0' THEN 600 ELSE 300 END AS budget
              FROM mh),
         corpus AS (SELECT d.doc_id, d.text
              FROM documents d
              JOIN (SELECT doc_id FROM mixr WHERE cum - n_tokens < budget) m
                USING (doc_id)),
         ${bpeWordChainSql(8, "corpus")},
         tok AS (SELECT w,
                len(list_filter(string_split(seg, '  '), x -> x <> ''))::BIGINT
                  AS t
               FROM w8),
         dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM corpus),
         enc AS (SELECT doc_id, sum(t)::BIGINT AS n_bpe
               FROM dw JOIN tok USING (w) WHERE w <> '' GROUP BY doc_id),
         pc AS (SELECT doc_id, doc_id % 4 AS pack_shard, n_bpe,
                sum(n_bpe) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                  AS e
              FROM enc WHERE n_bpe > 0),
         spans AS (SELECT doc_id, pack_shard, e - n_bpe AS s, e,
                unnest(generate_series((e - n_bpe) // 512,
                                       (e - 1) // 512)) AS bin
              FROM pc),
         bins AS (SELECT pack_shard::BIGINT AS pack_shard,
                bin::BIGINT AS bin, count(*)::BIGINT AS n_docs,
                sum(least(e, (bin + 1) * 512) -
                    greatest(s, bin * 512))::BIGINT AS bin_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
              FROM spans GROUP BY 1, 2),
         keyed AS (SELECT *,
                pack_shard::VARCHAR || ':' || bin::VARCHAR AS k,
                ('0x' || substr(md5(pack_shard::VARCHAR || ':'
                                    || bin::VARCHAR), 1, 15))::UBIGINT AS h
              FROM bins)
         SELECT (h % 4)::BIGINT AS shard,
                row_number() OVER (PARTITION BY h % 4 ORDER BY h, k)
                  ::BIGINT AS shard_pos,
                pack_shard, bin, n_docs, bin_tokens, first_doc, last_doc
         FROM keyed ORDER BY shard, shard_pos""",

    "q_pack_curated" ->
      s"""$curationOraclePrefix,
         surv AS (SELECT k.doc_id, k.n_tokens::BIGINT AS n_tokens,
                $curationSplitSql AS split
              FROM keptf k LEFT JOIN clus c ON k.doc_id = c.id
              WHERE c.id IS NULL OR c.cluster_id = k.doc_id),
         sharded AS (SELECT doc_id, n_tokens, split,
                doc_id % 4 AS shard FROM surv),
         cm AS (SELECT doc_id, n_tokens, split, shard,
                sum(n_tokens) OVER (PARTITION BY split, shard
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM sharded)
         SELECT split, shard::BIGINT AS shard,
                floor((cum - n_tokens) / 256.0)::BIGINT AS bin,
                count(*)::BIGINT AS n_docs,
                sum(n_tokens)::BIGINT AS bin_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM cm GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 4) AS cos_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) >= 0.4
         ORDER BY id_a, id_b""",

    "q_dedup_embedding_lsh" ->
      """WITH planes AS (SELECT j.j AS j,
                [((('0x' || substr(md5(j.j || ',' || d), 1, 15))::UBIGINT
                   % 2001)::BIGINT - 1000) / 1000.0
                 for d in generate_series(0, 63)] AS pv
              FROM (SELECT unnest(generate_series(0, 15)) AS j) j),
         emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sig AS (SELECT e.vec_id, p.j // 4 AS band,
                sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                         THEN (1::BIGINT << (p.j % 4)) ELSE 0 END)::BIGINT
                  AS bucket
              FROM emb e CROSS JOIN planes p GROUP BY e.vec_id, p.j // 4),
         cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM sig a JOIN sig b
                ON a.band = b.band AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id),
         sc AS (SELECT id_a, id_b,
                round(list_cosine_similarity(x.v, y.v), 4) AS cos_sim
              FROM cand JOIN emb x ON x.vec_id = id_a
                        JOIN emb y ON y.vec_id = id_b)
         SELECT id_a, id_b, cos_sim FROM sc
         WHERE cos_sim >= 0.4 ORDER BY id_a, id_b""",

    // SemDeDup: the shared integer k-means replay (afin = cell
    // assignment) scoped down to within-cell pairs, cosine-verified on
    // the original float vectors like q_dedup_embedding.
    "q_dedup_semantic" ->
      (kmeansAssignSql(8, 2) + """,
         pr AS (SELECT la.vec_id AS id_a, lb.vec_id AS id_b
              FROM afin la JOIN afin lb
                ON la.cluster = lb.cluster AND la.vec_id < lb.vec_id),
         sc AS (SELECT p.id_a, p.id_b,
                round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                             eb.embedding::DOUBLE[]), 4)
                  AS cos_sim
              FROM pr p
              JOIN embeddings ea ON ea.vec_id = p.id_a
              JOIN embeddings eb ON eb.vec_id = p.id_b)
         SELECT id_a, id_b, cos_sim FROM sc
         WHERE cos_sim >= 0.4 ORDER BY id_a, id_b"""),

    "q_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS nn_id, embedding::DOUBLE[] AS cv FROM embeddings),
         s AS (SELECT query_id, nn_id,
                round(list_cosine_similarity(qv, cv), 4) AS cos_sim
              FROM q JOIN c ON query_id <> nn_id),
         r AS (SELECT query_id, nn_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id)::BIGINT AS rank FROM s)
         SELECT query_id, rank, nn_id, cos_sim FROM r
         WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_knn_ivf" -> knnIvfOracle,

    // frozen-centroid incremental index + probe equals the batch
    // build-and-search — same oracle
    "q_knn_ivf_stream" -> knnIvfOracle,


    "q_knn_lsh" ->
      """WITH planes AS (SELECT j.j AS j,
                [((('0x' || substr(md5(j.j || ',' || d), 1, 15))::UBIGINT
                   % 2001)::BIGINT - 1000) / 1000.0
                 for d in generate_series(0, 63)] AS pv
              FROM (SELECT unnest(generate_series(0, 3)) AS j) j),
         emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         sig AS (SELECT e.vec_id,
                sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                         THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS bucket
              FROM emb e CROSS JOIN planes p GROUP BY e.vec_id),
         q AS (SELECT s.vec_id AS query_id, s.bucket, e.v AS qv
              FROM sig s JOIN emb e ON s.vec_id = e.vec_id WHERE s.vec_id < 8),
         c AS (SELECT s.vec_id AS nn_id, s.bucket AS cbucket, e.v AS cv
              FROM sig s JOIN emb e ON s.vec_id = e.vec_id),
         sc AS (SELECT query_id, bucket, nn_id,
                round(list_cosine_similarity(qv, cv), 4) AS cos_sim
              FROM q JOIN c ON bucket = cbucket AND query_id <> nn_id),
         r AS (SELECT query_id, bucket, nn_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id)::BIGINT AS rank FROM sc)
         SELECT query_id, bucket, rank, nn_id, cos_sim FROM r
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // RRF replay: the proven BM25 chain cut to a ranked top-20, the
    // proven brute-force chain for query vector 0, then the quantized
    // 1e6/(60+rank) fuse.
    "q_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         stats AS (SELECT count(*)::DOUBLE AS n,
                avg(len(l))::DOUBLE AS avgdl FROM t),
         tok AS (SELECT doc_id, unnest(l) AS term FROM t),
         tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
              WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc_id, len(l)::DOUBLE AS dl FROM t),
         sc AS (SELECT tf.doc_id,
                sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                  AS raw
              FROM tf JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id, stats s
              GROUP BY 1),
         kw AS (SELECT doc_id, row_number() OVER
                  (ORDER BY round(raw, 6) DESC, doc_id)::BIGINT AS rank
              FROM (SELECT doc_id, raw FROM sc
                    ORDER BY round(raw, 6) DESC, doc_id LIMIT 20)),
         emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings),
         v_s AS (SELECT c.vec_id AS doc_id,
                round(list_cosine_similarity(q.v, c.v), 4) AS cos_sim
              FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
              WHERE q.vec_id = 0),
         vr AS (SELECT doc_id, rank FROM (
                SELECT doc_id, row_number() OVER
                  (ORDER BY cos_sim DESC, doc_id)::BIGINT AS rank
                FROM v_s) WHERE rank <= 20),
         contrib AS (SELECT doc_id,
                round(1000000.0 / (60 + rank))::BIGINT AS c_e6 FROM kw
              UNION ALL
              SELECT doc_id, round(1000000.0 / (60 + rank))::BIGINT
              FROM vr),
         fused AS (SELECT doc_id, sum(c_e6)::BIGINT AS rrf_e6,
                count(*)::BIGINT AS n_lists
              FROM contrib GROUP BY 1)
         SELECT doc_id, rrf_e6, n_lists FROM fused
         ORDER BY rrf_e6 DESC, doc_id LIMIT 10""",

    // Recall replay: the three ranking chains are the PROVEN oracle
    // texts of q_knn_bruteforce / q_knn_lsh / q_knn_ivf (renamed CTEs),
    // joined on (query, neighbor) and counted.
    "q_ann_recall" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings),
         b_s AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                round(list_cosine_similarity(q.v, c.v), 4) AS cos_sim
              FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 8),
         b_r AS (SELECT query_id, nn_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id) AS rank FROM b_s),
         brute AS (SELECT query_id, nn_id FROM b_r WHERE rank <= 5),
         planes AS (SELECT j.j AS j,
                [((('0x' || substr(md5(j.j || ',' || d), 1, 15))::UBIGINT
                   % 2001)::BIGINT - 1000) / 1000.0
                 for d in generate_series(0, 63)] AS pv
              FROM (SELECT unnest(generate_series(0, 3)) AS j) j),
         sig AS (SELECT e.vec_id,
                sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                         THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT
                  AS bucket
              FROM emb e CROSS JOIN planes p GROUP BY e.vec_id),
         l_sc AS (SELECT sq.vec_id AS query_id, sc.vec_id AS nn_id,
                round(list_cosine_similarity(eq.v, ec.v), 4) AS cos_sim
              FROM sig sq JOIN sig sc ON sq.bucket = sc.bucket
                AND sq.vec_id <> sc.vec_id
              JOIN emb eq ON eq.vec_id = sq.vec_id
              JOIN emb ec ON ec.vec_id = sc.vec_id
              WHERE sq.vec_id < 8),
         l_r AS (SELECT query_id, nn_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id) AS rank FROM l_sc),
         lsh AS (SELECT query_id, nn_id FROM l_r WHERE rank <= 5),
         cents AS (SELECT vec_id AS cent_id, v AS ce FROM emb
              WHERE vec_id < 16),
         ca AS (SELECT e.vec_id AS id, c.cent_id,
                round(list_cosine_similarity(e.v, c.ce), 6) AS cc
              FROM emb e CROSS JOIN cents c),
         cass AS (SELECT id, cent_id AS cell FROM (
                SELECT id, cent_id, row_number() OVER (PARTITION BY id
                  ORDER BY cc DESC, cent_id) AS r FROM ca) WHERE r = 1),
         qass AS (SELECT id AS query_id, cent_id AS cell FROM (
                SELECT id, cent_id, row_number() OVER (PARTITION BY id
                  ORDER BY cc DESC, cent_id) AS r FROM ca WHERE id < 8)
              WHERE r <= 4),
         i_sc AS (SELECT q.query_id, n.id AS nn_id,
                round(list_cosine_similarity(eq.v, en.v), 4) AS cos_sim
              FROM qass q
              JOIN cass n ON q.cell = n.cell AND q.query_id <> n.id
              JOIN emb eq ON eq.vec_id = q.query_id
              JOIN emb en ON en.vec_id = n.id),
         i_r AS (SELECT query_id, nn_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id) AS rank FROM i_sc),
         ivf AS (SELECT query_id, nn_id FROM i_r WHERE rank <= 5)
         SELECT 'lsh' AS method, b.query_id, count(*)::BIGINT AS n_true,
                sum(CASE WHEN l.nn_id IS NOT NULL THEN 1 ELSE 0 END)
                  ::BIGINT AS n_hit
         FROM brute b LEFT JOIN lsh l
           ON b.query_id = l.query_id AND b.nn_id = l.nn_id
         GROUP BY 2
         UNION ALL
         SELECT 'ivf', b.query_id, count(*)::BIGINT,
                sum(CASE WHEN i.nn_id IS NOT NULL THEN 1 ELSE 0 END)
                  ::BIGINT
         FROM brute b LEFT JOIN ivf i
           ON b.query_id = i.query_id AND b.nn_id = i.nn_id
         GROUP BY 2
         ORDER BY method, query_id""",

    "q_media_frames" ->
      """WITH f AS (SELECT doc_id AS media_id, text, length(text) AS len,
                unnest(generate_series(0, 3)) AS frame_idx FROM documents),
         s AS (SELECT media_id, frame_idx::BIGINT AS frame_idx,
                (frame_idx * len) // 4 + 1 AS st,
                ((frame_idx + 1) * len) // 4 AS en, text FROM f)
         SELECT media_id, frame_idx, (en - st + 1)::BIGINT AS frame_len,
                md5(substr(text, st::INT, (en - st + 1)::INT)) AS frame_md5
         FROM s ORDER BY media_id, frame_idx""",

    // the decode oracle recomputes the PPM builder+parser arithmetic
    // from the source text (ASCII ⇒ code point = byte): 16-wide rows,
    // height = len/48 full rows, payload = the first 48·h bytes
    "q_media_features" ->
      """WITH d AS (SELECT doc_id, text, (length(text) // 48)::INT AS h
               FROM documents WHERE length(text) >= 48),
         px AS (SELECT doc_id, h,
                [ascii(x)::BIGINT
                 for x in string_split(substring(text, 1, 48 * h), '')] AS bs
               FROM d)
         SELECT doc_id::BIGINT AS media_id, 16::BIGINT AS width,
                h::BIGINT AS height, 255::BIGINT AS maxval,
                (16 * h)::BIGINT AS n_pixels,
                round(list_sum(bs)::DOUBLE / (48 * h), 6) AS mean_px,
                list_reduce(list_prepend(0::BIGINT, bs),
                  (a, b) -> (a * 31 + b) % 1000000007) AS checksum
         FROM px ORDER BY media_id""",

    // WAV decode oracle: 8-bit mono PCM, one sample per text byte
    // Resize replay: sample the same source bytes the kernel keeps
    // (every 2nd pixel of every 2nd row of the packed 16-wide image),
    // rebuild the small P6 text, and hash it — md5 gates the exact
    // output bytes.
    "q_media_ahash" ->
      s"""WITH $ahashChainSql
         SELECT doc_id AS media_id, printf('%08x%08x', hi, lo) AS ahash_hex
         FROM ah ORDER BY 1""",

    "q_media_ahash_pairs" ->
      s"""WITH $ahashChainSql,
         chunked AS (SELECT doc_id, hi, lo, c.c AS chunk,
              CASE WHEN c.c < 4 THEN (lo >> (8 * c.c)) & 255
                   ELSE (hi >> (8 * (c.c - 4))) & 255 END AS ckey
            FROM ah, (SELECT unnest(generate_series(0, 7)) AS c) c),
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              (bit_count(xor(a.hi::UBIGINT, b.hi::UBIGINT)) +
               bit_count(xor(a.lo::UBIGINT, b.lo::UBIGINT)))::BIGINT
                AS hamming
            FROM chunked a JOIN chunked b
              ON a.chunk = b.chunk AND a.ckey = b.ckey
                 AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, hamming FROM pairs
         WHERE hamming <= 7 ORDER BY 1, 2""",

    "q_media_resize" ->
      """WITH m AS (SELECT doc_id, text,
              (length(text) // 48)::INT AS h
            FROM documents WHERE length(text) >= 48),
         r AS (SELECT doc_id, text, (h // 2)::INT AS h2 FROM m
               WHERE h // 2 >= 1),
         px AS (SELECT doc_id, h2,
              [substr(text,
                 96 * (i // 24) + 6 * ((i % 24) // 3) + (i % 3) + 1, 1)
               for i in generate_series(0, h2 * 24 - 1)] AS chars
            FROM r)
         SELECT doc_id AS media_id, 8 AS small_w, h2 AS small_h,
              (h2 * 24)::BIGINT AS n_bytes_small,
              list_sum([ord(c) for c in chars])::BIGINT AS sum_small,
              md5('P6' || chr(10) || '8 ' || h2 || chr(10) || '255'
                || chr(10) || array_to_string(chars, '')) AS small_md5
         FROM px ORDER BY media_id""",

    "q_media_wavhash" ->
      s"""WITH ${wavHashChainSql()}
         SELECT doc_id AS media_id, printf('%08x%08x', hi, lo) AS ahash_hex
         FROM ah ORDER BY 1""",

    // The pair gate hashes the corpus PLUS an exact re-encode of every
    // 7th document under a shifted id — identical payloads must land
    // at Hamming 0 through the chunk join at every scale factor (the
    // within-few-bits near-dup claim is spec-pinned on hand-built
    // variants; natural near-dups add rows at larger SFs).
    "q_media_wavhash_pairs" ->
      s"""WITH echoed AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000000, text FROM documents
              WHERE doc_id % 7 = 0),
         ${wavHashChainSql("echoed")},
         chunked AS (SELECT doc_id, hi, lo, c.c AS chunk,
              CASE WHEN c.c < 4 THEN (lo >> (8 * c.c)) & 255
                   ELSE (hi >> (8 * (c.c - 4))) & 255 END AS ckey
            FROM ah, (SELECT unnest(generate_series(0, 7)) AS c) c),
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              (bit_count(xor(a.hi::UBIGINT, b.hi::UBIGINT)) +
               bit_count(xor(a.lo::UBIGINT, b.lo::UBIGINT)))::BIGINT
                AS hamming
            FROM chunked a JOIN chunked b
              ON a.chunk = b.chunk AND a.ckey = b.ckey
                 AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, hamming FROM pairs
         WHERE hamming <= 7 ORDER BY 1, 2""",

    // Decimation replay: every 2nd source byte, hashed as the data
    // chunk; rate halves, sample count ceils.
    "q_media_decimate" ->
      """WITH m AS (SELECT doc_id, text, length(text)::INT AS n
            FROM documents WHERE length(text) > 0),
         d AS (SELECT doc_id, text, ((n + 1) // 2)::BIGINT AS n2 FROM m)
         SELECT doc_id AS media_id, 4000 AS rate_small,
              n2 AS n_samples_small,
              list_sum([ord(substr(text, 2 * i + 1, 1))
                for i in generate_series(0, n2 - 1)])::BIGINT AS sum_small,
              md5(array_to_string([substr(text, 2 * i + 1, 1)
                for i in generate_series(0, n2 - 1)], '')) AS data_md5
         FROM d ORDER BY media_id""",

    "q_media_gradient" -> ppmGradientOracle,

    "q_media_tone" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n
               FROM documents WHERE length(text) > 0),
         bs AS (SELECT doc_id, n,
                [ascii(x)::BIGINT for x in string_split(text, '')] AS b
               FROM d)
         SELECT doc_id::BIGINT AS media_id, n::BIGINT AS n_samples,
                list_sum([b[i] * round(1e4 * cos(
                    2 * pi() * 8 * (i - 1) / n))::BIGINT
                  for i in generate_series(1, n)])::BIGINT AS re_q4,
                list_sum([b[i] * round(1e4 * sin(
                    2 * pi() * 8 * (i - 1) / n))::BIGINT
                  for i in generate_series(1, n)])::BIGINT AS im_q4
         FROM bs ORDER BY media_id""",

    "q_media_wav" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n
               FROM documents WHERE length(text) > 0),
         bs AS (SELECT doc_id, n,
                [ascii(x)::BIGINT for x in string_split(text, '')] AS b
               FROM d)
         SELECT doc_id::BIGINT AS media_id, 1::BIGINT AS channels,
                8000::BIGINT AS sample_rate, 8::BIGINT AS bits_per_sample,
                n::BIGINT AS n_samples,
                round(list_sum(b)::DOUBLE / n, 6) AS mean_amp,
                list_reduce(list_prepend(0::BIGINT, b),
                  (a, c) -> (a * 31 + c) % 1000000007) AS checksum
         FROM bs ORDER BY media_id""",

    "q_habit_daily_stream" -> habitDailyOracle,

    // Full NB replay: Laplace-smoothed per-(term, class) log-probs
    // quantized to 1e-6-unit longs before the document sum, so scores
    // are exact integers and the argmax (ties: class asc) is
    // engine-independent.
    "q_consistent_shard" ->
      """WITH v8 AS (SELECT s.s, v.v,
              ('0x' || substr(md5('shard:' || s.s::VARCHAR || ':'
                || v.v::VARCHAR), 1, 15))::UBIGINT::BIGINT AS vh
            FROM (SELECT unnest(generate_series(0, 7)) AS s) s,
                 (SELECT unnest(generate_series(0, 3)) AS v) v),
         v9 AS (SELECT s.s, v.v,
              ('0x' || substr(md5('shard:' || s.s::VARCHAR || ':'
                || v.v::VARCHAR), 1, 15))::UBIGINT::BIGINT AS vh
            FROM (SELECT unnest(generate_series(0, 8)) AS s) s,
                 (SELECT unnest(generate_series(0, 3)) AS v) v),
         k AS (SELECT doc_id,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                ::UBIGINT::BIGINT AS h
            FROM documents),
         a8 AS (SELECT doc_id, s FROM (
              SELECT k.doc_id, v.s, row_number() OVER (
                  PARTITION BY k.doc_id
                  ORDER BY ((v.vh - k.h + (1::BIGINT << 60))
                    % (1::BIGINT << 60)), v.s) AS r
              FROM k, v8 v) WHERE r = 1),
         a9 AS (SELECT doc_id, s FROM (
              SELECT k.doc_id, v.s, row_number() OVER (
                  PARTITION BY k.doc_id
                  ORDER BY ((v.vh - k.h + (1::BIGINT << 60))
                    % (1::BIGINT << 60)), v.s) AS r
              FROM k, v9 v) WHERE r = 1)
         SELECT a8.s::BIGINT AS shard, count(*)::BIGINT AS n_docs,
              count(*) FILTER (WHERE a9.s <> a8.s)::BIGINT AS n_moved
         FROM a8 JOIN a9 USING (doc_id) GROUP BY 1 ORDER BY 1""",

    "q_zipf" -> zipfOracle,
    "q_zipf_stream" -> zipfOracle,

    "q_chi2_terms" ->
      """WITH t AS (SELECT lang,
              unnest(list_distinct(string_split(text, ' '))) AS term
            FROM documents),
         tt AS (SELECT term, count(*)::BIGINT AS df_all,
              count(*) FILTER (WHERE lang = 'en')::BIGINT AS df_pos
            FROM t WHERE term <> '' GROUP BY 1),
         n AS (SELECT count(*)::BIGINT AS n,
              count(*) FILTER (WHERE lang = 'en')::BIGINT AS np
            FROM documents),
         s AS (SELECT term, df_pos, df_all, n.n,
              df_pos AS a, (df_all - df_pos) AS b,
              (np - df_pos) AS c,
              (n.n - np - df_all + df_pos) AS d
            FROM tt, n),
         s2 AS (SELECT term, df_pos, df_all, n,
              (a * d - b * c) * (a * d - b * c) AS sq,
              (a + b) * (c + d) * (a + c) * (b + d) AS den
            FROM s),
         x AS (SELECT term, df_pos, df_all,
              CASE WHEN den = 0 THEN 0::BIGINT
                ELSE CAST(round(1e6 * n * sq / den::DOUBLE) AS BIGINT)
              END AS chi2_e6
            FROM s2)
         SELECT row_number() OVER (ORDER BY chi2_e6 DESC, term)::BIGINT
                AS rank,
              term, df_pos, df_all, chi2_e6
         FROM x ORDER BY chi2_e6 DESC, term LIMIT 20""",

    "q_nb_classifier" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
         test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         tok AS (SELECT lang AS pred, unnest(string_split(text, ' ')) AS term
              FROM train),
         tf AS (SELECT pred, term, count(*) AS c FROM tok GROUP BY 1, 2),
         tot AS (SELECT pred, sum(c) AS t_tokens FROM tf GROUP BY 1),
         v AS (SELECT count(DISTINCT term) AS v FROM tf),
         pri AS (SELECT lang AS pred, count(*) AS d_c FROM train GROUP BY 1),
         dt AS (SELECT count(*) AS d_tot FROM train),
         cm AS (SELECT t.pred,
                CAST(round(ln(1.0 / (t.t_tokens + v.v)) * 1e6) AS BIGINT)
                  AS logp0_e6,
                CAST(round(ln(p.d_c::DOUBLE / dt.d_tot) * 1e6) AS BIGINT)
                  AS prior_e6
              FROM tot t CROSS JOIN v JOIN pri p USING (pred) CROSS JOIN dt),
         tm AS (SELECT f.term, f.pred,
                CAST(round(ln((f.c + 1)::DOUBLE / (t.t_tokens + v.v)) * 1e6)
                  AS BIGINT) AS logp_e6
              FROM tf f JOIN tot t USING (pred) CROSS JOIN v),
         tt AS (SELECT doc_id, lang, term, count(*) AS n
              FROM (SELECT doc_id, lang,
                      unnest(string_split(text, ' ')) AS term FROM test)
              GROUP BY 1, 2, 3),
         sc AS (SELECT tt.doc_id, tt.lang, cm.pred,
                (sum(tt.n * coalesce(tm.logp_e6, cm.logp0_e6))
                  + any_value(cm.prior_e6))::BIGINT AS score_e6
              FROM tt CROSS JOIN cm
              LEFT JOIN tm ON tm.term = tt.term AND tm.pred = cm.pred
              GROUP BY 1, 2, 3),
         fin AS (SELECT doc_id, lang, pred, score_e6,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score_e6 DESC, pred) AS rk
              FROM sc)
         SELECT doc_id, lang, pred, score_e6 FROM fin
         WHERE rk = 1 ORDER BY doc_id""",

    // Full gradient-descent replay: 3 unrolled iterations of exact
    // long gradient sums → bit-identical weights → identical margins.
    "q_quality_logreg" -> logRegOracle(3),

    // the logreg chain, then clamped equal-width margin bins with
    // integer-ppm positive rates
    "q_calibration" ->
      s"""WITH scored AS (${logRegOracle(3)}),
         cal AS (SELECT least(greatest(margin_e6, -1000000), 999999) AS mc,
                y FROM scored)
         SELECT ((mc + 1000000) * 8 // 2000000)::BIGINT AS bucket,
                count(*)::BIGINT AS n,
                sum(y)::BIGINT AS n_pos,
                ((sum(y)::BIGINT * 1000000) // count(*))::BIGINT AS pos_ppm
         FROM cal GROUP BY 1 ORDER BY 1""",

    // census → integer quantile thresholds → threshold-count stage
    "q_curriculum" ->
      """WITH wl AS (SELECT doc_id,
              len(list_filter(string_split(text, ' '), x -> x <> ''))
                ::BIGINT AS n_tokens FROM documents),
         cen AS (SELECT n_tokens, count(*)::BIGINT AS cnt FROM wl
              GROUP BY 1),
         cum AS (SELECT n_tokens,
              sum(cnt) OVER (ORDER BY n_tokens ROWS UNBOUNDED PRECEDING)
                ::BIGINT AS cum FROM cen),
         tot AS (SELECT count(*)::BIGINT AS N FROM wl),
         thr AS (SELECT j.j, min(n_tokens)::BIGINT AS t
              FROM cum, tot, (SELECT unnest([1, 2, 3]) AS j) j
              WHERE cum * 4 >= j.j * N GROUP BY 1),
         st AS (SELECT w.doc_id, w.n_tokens, count(t.j)::BIGINT AS above
              FROM wl w LEFT JOIN thr t ON w.n_tokens > t.t GROUP BY 1, 2)
         SELECT doc_id, n_tokens, (1 + above)::BIGINT AS stage
         FROM st ORDER BY doc_id""",

    // probe chain → positive-margin filter → shard ranking
    "q_probe_gated_export" -> probeGatedExportOracle(3),

    // kNN vote replay over the same quantize + integer-dot chain as
    // q_knn_quantized, restricted to the train/test split; ties
    // (votes desc, best dot desc, label asc) are exact integers.
    "q_knn_classify" ->
      """WITH m AS (SELECT vec_id, label,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                  AS ma, embedding
              FROM embeddings),
         qz AS (SELECT vec_id, label,
                CASE WHEN ma = 0
                  THEN list_transform(embedding, x -> 0::DOUBLE)
                  ELSE list_transform(embedding,
                    x -> floor(x::DOUBLE / ma * 127 + 0.5))
                END AS qq
              FROM m),
         q AS (SELECT vec_id AS query_id, label, qq AS qv FROM qz
              WHERE vec_id % 5 = 0),
         c AS (SELECT vec_id AS nn_id, label AS nn_label, qq AS cv FROM qz
              WHERE vec_id % 5 <> 0),
         s AS (SELECT query_id, nn_id, nn_label,
                list_dot_product(qv, cv)::BIGINT AS qdot
              FROM q JOIN c ON query_id <> nn_id),
         r AS (SELECT query_id, nn_id, nn_label, qdot,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY qdot DESC, nn_id) AS rank
              FROM s),
         v AS (SELECT query_id, nn_label AS pred, count(*)::BIGINT AS votes,
                max(qdot) AS best_dot
              FROM r WHERE rank <= 5 GROUP BY 1, 2),
         p AS (SELECT query_id, pred, votes,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, best_dot DESC, pred) AS rk
              FROM v)
         SELECT p.query_id, q.label, p.pred, p.votes
         FROM p JOIN q ON q.query_id = p.query_id
         WHERE p.rk = 1 ORDER BY p.query_id""",

    // Replays the three store versions from the raw events: v0 = the
    // non-thirds, v1 = v0 upserted with doubled thirds (the proven
    // q_upsert_merge semantics), v2 = v1 plus the appended shifted
    // triples. Matching all three proves snapshot isolation.
    "q_time_travel" ->
      """WITH v0 AS (SELECT user_id, value FROM events
              WHERE event_id % 3 <> 0),
         v1 AS (SELECT user_id,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value
              FROM events),
         v2 AS (SELECT * FROM v1
              UNION ALL
              SELECT user_id, value * 3 AS value FROM events
              WHERE event_id % 3 = 0)
         SELECT 0::BIGINT AS version, count(*) AS n_rows,
                count(DISTINCT user_id) AS n_users,
                round(sum(value), 6) AS sum_value,
                round(max(value), 6) AS max_value
         FROM v0
         UNION ALL
         SELECT 1, count(*), count(DISTINCT user_id),
                round(sum(value), 6), round(max(value), 6) FROM v1
         UNION ALL
         SELECT 2, count(*), count(DISTINCT user_id),
                round(sum(value), 6), round(max(value), 6) FROM v2
         ORDER BY version""",

    // RESTORE TO v0 makes the head read the ORIGINAL snapshot — the
    // raw table replays it directly; either surviving mutation
    // (doubled values, deleted ids) would break the aggregate.
    "q_store_restore" ->
      """SELECT event_type AS habit, count(*) AS n_events,
                count(DISTINCT user_id) AS n_users,
                round(sum(value), 6) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    // Replays the three commits' expected change feeds from raw
    // events. The update set excludes value = 0 rows (2v = v there, so
    // the rewrite carries them unchanged and the feed must drop them).
    // PSI replay: exact clamped-bucket counts per side, Laplace
    // shares, (p−q)·ln(p/q) quantized at 1e-6 — the identical IEEE
    // expression chain over identical longs.
    "q_drift_psi" -> driftPsiOracle,
    "q_ks_drift" -> ksDriftOracle,
    "q_percent_rank" ->
      """SELECT event_type, event_id,
              round(percent_rank() OVER w, 6) AS pr,
              (ntile(10) OVER w)::BIGINT AS decile
         FROM events
         WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
         WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
         ORDER BY event_type, event_id""",
    "q_robust_outliers" -> robustOutliersOracle,
    "q_corpus_health" -> corpusHealthOracle,
    "q_ngram_diversity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS l
              FROM documents),
         sh AS (SELECT source, unnest(CASE WHEN len(l) >= 3
                THEN [array_to_string(l[i:i+2], ' ')
                      for i in generate_series(1, len(l) - 2)]
                ELSE [array_to_string(l, ' ')] END) AS sh
            FROM t)
         SELECT source, count(DISTINCT sh)::BIGINT AS distinct_ngrams,
              count(*)::BIGINT AS total_ngrams,
              floor(count(DISTINCT sh) * 1000000 / count(*))::BIGINT
                AS diversity_ppm
         FROM sh GROUP BY 1 ORDER BY 1""",
    "q_ewma" -> ewmaOracle,
    "q_kanon" -> kanonOracle,
    "q_kanon_stream" -> kanonOracle,
    "q_kanon_ladder" -> kanonLadderOracle(Seq(32L, 64L, 128L, 256L, 512L)),

    // one-batch streaming replay of the same monitor, same oracle
    "q_drift_stream" -> driftPsiOracle,

    // stream-static join replay: the plain batch join + rollup
    "q_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
              round(sum(value), 6) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",

    // Metadata aggregates are exact, so the raw table replays them.
    "q_store_meta_agg" ->
      """SELECT count(*) AS n_rows, min(event_id) AS min_id,
              max(event_id) AS max_id
         FROM events""",

    // Lineage replay: the parity split that built the two commits.
    "q_store_lineage" ->
      """SELECT CAST(event_id % 2 AS INT) AS _commit,
              count(*) AS n_rows, round(sum(value), 6) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    // The bloom prune is file-level and one-sided, so the point read
    // returns exactly the raw table's matching row.
    "q_store_pointlookup" ->
      """SELECT event_id, ts, user_id AS user_email,
              event_type AS habit, value
         FROM events WHERE event_id = 123""",

    // Compaction is row-preserving, so the post-OPTIMIZE snapshot
    // aggregate replays as the plain aggregate over all events.
    "q_store_compact" ->
      """SELECT event_type AS habit, count(*) AS n_events,
              count(DISTINCT user_id) AS n_users,
              round(sum(value), 6) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    // The store's two commits hold exactly the events rows; the
    // zone-map prune is file-level only, so the filtered aggregate
    // over the raw table replays the result.
    "q_store_skipping" ->
      """SELECT user_id AS user_email, count(*) AS n_events,
              round(sum(value), 6) AS sum_value
         FROM events WHERE user_id BETWEEN 10 AND 39
         GROUP BY 1 ORDER BY 1""",

    // results are layout-independent; the requires inside the query
    // prove the planning claim, the oracle proves exactness
    "q_store_zorder" ->
      """SELECT 'user_range' AS sel, count(*)::BIGINT AS n_events,
              round(sum(value), 6) AS sum_value
         FROM events WHERE user_id BETWEEN 3 AND 7
         UNION ALL
         SELECT 'value_range', count(*)::BIGINT, round(sum(value), 6)
         FROM events WHERE value BETWEEN 200.0 AND 600.0
         ORDER BY sel""",

    "q_version_diff" ->
      """WITH upd AS (SELECT value AS old_v, value * 2 AS new_v
              FROM events WHERE event_id % 3 = 0 AND value <> 0),
         del AS (SELECT CASE WHEN event_id % 3 = 0 THEN value * 2
                        ELSE value END AS old_v
              FROM events WHERE user_id % 7 = 0),
         ins AS (SELECT value * 3 AS new_v FROM events
              WHERE event_id % 3 = 0)
         SELECT 1::BIGINT AS to_version, 'update' AS op_min,
                'update' AS op_max, count(*) AS n_rows,
                sum(CAST(round(old_v * 1e6) AS BIGINT))::BIGINT
                  AS sum_old_e6,
                sum(CAST(round(new_v * 1e6) AS BIGINT))::BIGINT
                  AS sum_new_e6
         FROM upd
         UNION ALL
         SELECT 2, 'delete', 'delete', count(*),
                sum(CAST(round(old_v * 1e6) AS BIGINT))::BIGINT,
                0::BIGINT
         FROM del
         UNION ALL
         SELECT 3, 'insert', 'insert', count(*), 0::BIGINT,
                sum(CAST(round(new_v * 1e6) AS BIGINT))::BIGINT
         FROM ins
         ORDER BY to_version""",

    // The incremental path must equal RECOMPUTING the head state:
    // thirds doubled by the upsert commit, user_id % 7 = 0 rows gone
    // after the delete commit, per-row 1e-6 quantization before sums.
    "q_matview_incremental" ->
      """WITH st AS (SELECT date_trunc('day', ts) AS day,
                user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value
              FROM events WHERE user_id % 7 <> 0)
         SELECT day, user_email, habit, count(*) AS n,
                sum(CAST(round(value * 1e6) AS BIGINT))::BIGINT AS sum_e6
         FROM st GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // per-version recompute from the raw table — the metadata-only
    // answers must match scans that never happened
    "q_store_history" ->
      """SELECT 0::BIGINT AS version, count(*)::BIGINT AS n_rows,
              min(event_id) AS min_id, max(event_id) AS max_id
         FROM events WHERE event_id % 2 = 0
         UNION ALL
         SELECT 1::BIGINT, count(*)::BIGINT, min(event_id), max(event_id)
         FROM events
         UNION ALL
         SELECT 2::BIGINT, count(*)::BIGINT, min(event_id), max(event_id)
         FROM events WHERE user_id % 9 <> 0
         ORDER BY version""",

    // the same clause logic as CASE arithmetic over the raw table:
    // %4 rows delete at value=0 / triple otherwise; shifted %5 rows
    // insert when value+1 <= 400; everything else unchanged
    "q_merge_into" ->
      """WITH base AS (SELECT event_id, ts, user_id AS user_email,
                event_type AS habit, value FROM events),
         kept AS (SELECT event_id, ts, user_email, habit,
                CASE WHEN event_id % 4 = 0 THEN value * 3
                     ELSE value END AS value
              FROM base
              WHERE NOT (event_id % 4 = 0 AND value = 0)),
         ins AS (SELECT event_id + 10000000 AS event_id,
                ts + INTERVAL 2000 DAY AS ts, user_email, habit,
                value + 1 AS value
              FROM base WHERE event_id % 5 = 0 AND value + 1 <= 400)
         SELECT event_id, ts, user_email, habit, value
         FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
         ORDER BY event_id""",

    // recompute of the FINAL fact⋈dim state — the incremental side must
    // land bit-equal on the quantized sums
    "q_matview_join" ->
      """WITH a1 AS (SELECT user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value
              FROM events),
         b2 AS (SELECT user_email,
                CASE WHEN user_email % 4 = 0
                  THEN CAST(user_email % 5 + 1 AS DOUBLE) + 10
                  ELSE CAST(user_email % 5 + 1 AS DOUBLE) END AS weight
              FROM (SELECT DISTINCT user_id AS user_email FROM events)
              WHERE user_email % 11 <> 0)
         SELECT habit, count(*)::BIGINT AS n,
                sum(CAST(round(value * weight * 1e6) AS BIGINT))::BIGINT
                  AS sum_e6
         FROM a1 JOIN b2 USING (user_email)
         GROUP BY habit ORDER BY habit""",

    // head view generation == recompute of the weighted fact⋈dim
    // aggregate over ALL events, whatever the micro-batch slicing
    "q_matview_join_stream" ->
      """WITH b AS (SELECT user_email,
                CAST(user_email % 5 + 1 AS DOUBLE) AS weight
              FROM (SELECT DISTINCT user_id AS user_email FROM events))
         SELECT habit, count(*)::BIGINT AS n,
                sum(CAST(round(value * weight * 1e6) AS BIGINT))::BIGINT
                  AS sum_e6
         FROM (SELECT user_id AS user_email, event_type AS habit, value
               FROM events) a
         JOIN b USING (user_email)
         GROUP BY habit ORDER BY habit""",

    // head view == recompute under the FINAL dim (batch-1 reweight
    // applied to user%3==0), whatever the micro-batch slicing
    "q_matview_2sided_stream" ->
      """WITH b AS (SELECT user_email,
                CASE WHEN user_email % 3 = 0
                     THEN CAST(user_email % 7 + 1 AS DOUBLE)
                     ELSE CAST(user_email % 5 + 1 AS DOUBLE) END AS weight
              FROM (SELECT DISTINCT user_id AS user_email FROM events))
         SELECT habit, count(*)::BIGINT AS n,
                sum(CAST(round(value * weight * 1e6) AS BIGINT))::BIGINT
                  AS sum_e6
         FROM (SELECT user_id AS user_email, event_type AS habit, value
               FROM events) a
         JOIN b USING (user_email)
         GROUP BY habit ORDER BY habit""",

    // double replay must leave exactly one committed version and the
    // events unchanged — the dedup skipped the second batch entirely
    // two commits: the backfill create + the one streamed upsert
    "q_backfill_handoff" ->
      """SELECT event_id, ts, user_id AS user_email,
                event_type AS habit, value, 2::BIGINT AS n_versions
         FROM events ORDER BY event_id""",

    "q_store_ingest_stream" ->
      """SELECT event_id, ts, user_id AS user_email,
                event_type AS habit, value, 1::BIGINT AS n_versions
         FROM events ORDER BY event_id""")
}
