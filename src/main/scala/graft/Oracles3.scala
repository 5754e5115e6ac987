package graft

import graft.ext.TextAnalysis
import graft.OracleBuilders._

/** DuckDB oracle SQL, slice 3 of 3 — split from the monolithic
  * [[SparkEntry.oracleSql]] registry by size for maintainability (the
  * map is keyed by query name; family grouping lives in the Queries*
  * objects). No behavior change. */
private[graft] object Oracles3 {
  /** URL-dedup oracle — ONE value shared by q_url_dedup and its
    * ledger-maintained streaming twin q_url_dedup_stream (the
    * filterFunnelOracle sharing precedent: two gates proving the same
    * report must reference the same SQL, not carry copies that can
    * drift). */
  private lazy val urlDedupOracle: String =
    s"""WITH u AS (SELECT doc_id, ${OracleBuilders.demoUrlSql} AS url
            FROM documents),
       ${OracleBuilders.urlCanonChainSql},
       k AS (SELECT url_canon, min(doc_id) AS keeper,
              count(*)::BIGINT AS n_fetches
            FROM uc GROUP BY 1)
       SELECT uc.doc_id, uc.url_canon,
              uc.doc_id = k.keeper AS keep, k.n_fetches
       FROM uc JOIN k USING (url_canon)
       ORDER BY uc.doc_id"""

  /** Frontier-attrition oracle — ONE value shared by the batch scan
    * and the ledger-maintained stream twin. */
  private lazy val urlFrontierOracle: String =
    s"""WITH u AS (SELECT doc_id, ${OracleBuilders.demoCrawlUrlSql} AS url
            FROM documents),
       ${OracleBuilders.urlCanonChainSql},
       ${OracleBuilders.urlFilterChainSql},
       fx AS (SELECT *, ${OracleBuilders.urlFilterReasonSql} AS reason
            FROM fr)
       SELECT coalesce(reason, 'kept') AS stage,
              count(*)::BIGINT AS n_urls,
              count(DISTINCT url_canon)::BIGINT AS n_canonical
       FROM fx GROUP BY 1 ORDER BY 1"""

  /** The composed batch pipeline's oracle SQL — shared verbatim by
    * q_pipeline_export and the ledger-driven q_pipeline_incremental
    * (their Spark sides share the Curation.mixPackExport tail). */
  /** The surv→trn→mixture→BPE→pack→export CTE tail over whatever
    * `(doc_id, text)` relation fed the gates — parameterized on the
    * TEXT source so the web capstone (which tokenizes the reassembled
    * post-HTML text, not raw documents) shares it verbatim. Assumes
    * `keptf` and `clus` are in scope; `source` always comes from
    * `documents` (provenance survives rendering). */
  private def mixPackExportTailSql(textSrc: String): String =
      s"""surv AS (SELECT k.doc_id, k.n_tokens::BIGINT AS n_tokens,
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
              FROM $textSrc d
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
         FROM keyed ORDER BY shard, shard_pos"""

  private lazy val pipelineExportOracle: String =
      s"""$curationOraclePrefix,
         ${mixPackExportTailSql("documents")}"""

  /** The WEB-pipeline capstone's oracle: URL canonicalize → URL dedup
    * (keeper per canonical URL; dead-letter NULLs dropped) → render →
    * block extraction + jusText link-density gate → CCNet paragraph
    * dedup → text REASSEMBLED from surviving blocks → the identical
    * curation gates / near-dup CC / mixture / BPE / pack / export
    * tail, every stage the shared builder the component oracle uses. */
  private lazy val pipelineWebOracle: String =
      s"""WITH RECURSIVE
         u AS (SELECT doc_id, ${OracleBuilders.demoUrlSql} AS url
              FROM documents),
         ${OracleBuilders.urlCanonChainSql},
         ukeep AS (SELECT min(doc_id) AS doc_id FROM uc
              WHERE url_canon IS NOT NULL GROUP BY url_canon),
         pg AS (SELECT d.doc_id, ${OracleBuilders.htmlPageSql} AS page
              FROM documents d JOIN ukeep USING (doc_id)),
         bl AS (SELECT doc_id,
                regexp_extract_all(page, '(?is)<p[^>]*>(.*?)</p>', 1) AS ps
              FROM pg),
         bx AS (SELECT doc_id,
                unnest([{'i': i - 1, 'r': ps[i]}
                    for i in generate_series(1, len(ps))]) AS z
              FROM bl),
         btx AS (SELECT doc_id, z.i::BIGINT AS block_idx,
                ${OracleBuilders.htmlExtractSql("z.r")} AS btxt,
                ${OracleBuilders.htmlExtractSql(
                  "coalesce(array_to_string(regexp_extract_all(z.r, " +
                  "'(?is)<a[^>]*>(.*?)</a>', 1), ' '), '')")} AS lk
              FROM bx),
         bmx AS (SELECT doc_id, block_idx, btxt,
                len(list_filter(string_split(btxt, ' '),
                  x -> x <> ''))::BIGINT AS n_words,
                CASE WHEN length(btxt) = 0 THEN 1000000
                     ELSE length(lk)::BIGINT * 1000000
                       // length(btxt)::BIGINT END AS link_ppm
              FROM btx),
         keptb AS (SELECT * FROM bmx
              WHERE link_ppm <= 500000 AND n_words >= 5),
         pkeep AS (SELECT md5(btxt) AS dg,
                min(doc_id * 10000 + block_idx) AS kk
              FROM keptb GROUP BY 1),
         survb AS (SELECT b.doc_id, b.block_idx, b.btxt
              FROM keptb b JOIN pkeep p
                ON md5(b.btxt) = p.dg
                   AND b.doc_id * 10000 + b.block_idx = p.kk),
         web AS (SELECT doc_id,
                string_agg(btxt, ' ' ORDER BY block_idx) AS text
              FROM survb GROUP BY 1),
${OracleBuilders.curationGateCtesFrom("web")}
${OracleBuilders.simhashCcChainSql("keptf")},
         ${mixPackExportTailSql("web")}"""

  val map: Map[String, String] = Map(

    // the streaming ingest-dedup replay accumulates exactly the batch
    // pair set — same oracle, no stream-specific SQL
    "q_dedup_stream" -> minhashOracleSql(""),

    // the band-ledger probe path accumulates the same pair set (stored
    // bands ARE the re-derived bands) — shares the full-corpus oracle
    "q_dedup_band_ledger" -> minhashOracleSql(""),

    // identical minhash pipeline, restricted to pairs touching the
    // batch (doc_id % 10 = 0) — exactly the incremental contract
    "q_dedup_incremental" ->
      minhashOracleSql(" AND (id_a % 10 = 0 OR id_b % 10 = 0)"),

    // incremental label maintenance must equal the FULL-corpus CC:
    // recursive min-label over the complete MinHash pair set (the
    // nested WITH is the shared minhash replay)
    "q_cluster_incremental" -> minhashCcOracle,

    // the streaming cluster-label ledger lands on the same final
    // relation (tick split differs, the fixed point cannot)
    "q_cluster_stream" -> minhashCcOracle,

    "q_dedup_ngram" -> ngramOracleSql,

    "q_dedup_ppjoin" -> ppjoinOracleSql(9, 10, " WHERE doc_id % 5 = 0"),

    // per-doc novelty over the shared 3-gram shingle chain (whole-text
    // fallback under 3 tokens, distinct shingles per doc)
    "q_novelty" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS shingle FROM shl),
         dfc AS (SELECT shingle, count(*)::BIGINT AS df FROM sh
              GROUP BY 1),
         j AS (SELECT doc_id, df FROM sh JOIN dfc USING (shingle))
         SELECT doc_id, count(*)::BIGINT AS n_shingles,
                (count(*) FILTER (WHERE df = 1))::BIGINT AS n_unique,
                ((count(*) FILTER (WHERE df = 1)) * 1000000
                  // count(*))::BIGINT AS novelty_ppm
         FROM j GROUP BY 1 ORDER BY doc_id""",

    // per-source rollup of the same novelty chain: truncated mean of
    // the per-doc ppm plus exact shingle totals
    "q_novelty_by_source" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS shingle FROM shl),
         dfc AS (SELECT shingle, count(*)::BIGINT AS df FROM sh
              GROUP BY 1),
         j AS (SELECT doc_id, df FROM sh JOIN dfc USING (shingle)),
         per AS (SELECT doc_id, count(*)::BIGINT AS n_shingles,
                (count(*) FILTER (WHERE df = 1))::BIGINT AS n_unique,
                ((count(*) FILTER (WHERE df = 1)) * 1000000
                  // count(*))::BIGINT AS novelty_ppm
              FROM j GROUP BY 1)
         SELECT d.source, count(*)::BIGINT AS n_docs,
                sum(p.n_shingles)::BIGINT AS n_shingles,
                sum(p.n_unique)::BIGINT AS n_unique,
                (sum(p.novelty_ppm)::BIGINT // count(*))::BIGINT
                  AS mean_novelty_ppm
         FROM per p JOIN documents d USING (doc_id)
         GROUP BY 1 ORDER BY 1""",

    // URL canonicalization over the deterministic fixture: the chain
    // replays the engine's expression tree rule for rule
    "q_url_canonical" ->
      s"""WITH u AS (SELECT doc_id, ${OracleBuilders.demoUrlSql} AS url
              FROM documents),
         ${OracleBuilders.urlCanonChainSql}
         SELECT doc_id, url, url_canon, host FROM uc ORDER BY doc_id""",

    // URL dedup proper: keeper = min doc_id per canonical URL (one
    // shared SQL value — the streaming twin references the SAME string
    // so the two gates cannot silently drift on a future edit)
    "q_url_dedup" -> urlDedupOracle,

    // the ledger-maintained streaming twin shares the report verbatim
    "q_url_dedup_stream" -> urlDedupOracle,

    // host rollup + URL dedup: distinct canonical URLs per host plus
    // the novelty chain's truncated-mean convention, keyed by HOST
    "q_host_rollup" ->
      s"""WITH u AS (SELECT doc_id, ${OracleBuilders.demoUrlSql} AS url
              FROM documents),
         ${OracleBuilders.urlCanonChainSql},
         tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS shingle FROM shl),
         dfc AS (SELECT shingle, count(*)::BIGINT AS df FROM sh
              GROUP BY 1),
         j AS (SELECT doc_id, df FROM sh JOIN dfc USING (shingle)),
         per AS (SELECT doc_id,
                ((count(*) FILTER (WHERE df = 1)) * 1000000
                  // count(*))::BIGINT AS novelty_ppm
              FROM j GROUP BY 1),
         nt AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT
                  AS n_tokens
              FROM documents)
         SELECT uc.host, count(*)::BIGINT AS n_docs,
                count(DISTINCT uc.url_canon)::BIGINT AS n_urls,
                sum(nt.n_tokens)::BIGINT AS n_tokens,
                (sum(per.novelty_ppm)::BIGINT // count(*))::BIGINT
                  AS mean_novelty_ppm
         FROM uc JOIN nt USING (doc_id) JOIN per USING (doc_id)
         GROUP BY 1 ORDER BY 1""",

    // frontier URL filter: rule columns generated from the engine's
    // own extension/path tables; reason = first failing rule in the
    // engine's order, keep = no rule fired, NULL canonical = invalid
    "q_url_filter" ->
      s"""WITH u AS (SELECT doc_id, ${OracleBuilders.demoCrawlUrlSql}
                AS url
              FROM documents),
         ${OracleBuilders.urlCanonChainSql},
         ${OracleBuilders.urlFilterChainSql},
         fx AS (SELECT *, ${OracleBuilders.urlFilterReasonSql} AS reason
              FROM fr)
         SELECT doc_id, url_canon, ext_blocked::BIGINT AS ext_blocked,
                part_banned::BIGINT AS part_banned,
                too_many_params::BIGINT AS too_many_params,
                too_deep::BIGINT AS too_deep, too_long::BIGINT AS too_long,
                (reason IS NULL)::BIGINT AS keep, reason
         FROM fx ORDER BY doc_id""",

    // frontier attrition: the summed at-ingest verdicts equal the
    // batch scan — one shared oracle for both gates
    "q_url_frontier" -> urlFrontierOracle,
    "q_url_frontier_stream" -> urlFrontierOracle,

    // registrable-domain rollup + cap: the generated longest-match
    // suffix fold (pldSql) replays the engine's fold pattern for
    // pattern; the cap replays sourceCap's rank cut (n_tokens desc,
    // doc_id tiebreak, top 3 per PLD); the NULL dead-letter group
    // (bare suffixes, single-label hosts) is reported uncapped via
    // the null-dropping LEFT JOIN
    "q_pld_rollup" ->
      s"""WITH h AS (SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                ${OracleBuilders.demoHostSql} AS host
              FROM documents),
         p AS (SELECT doc_id, n_tokens, host,
                ${OracleBuilders.pldSql("host")} AS pld
              FROM h),
         r AS (SELECT *, row_number() OVER (PARTITION BY pld
                  ORDER BY n_tokens DESC, doc_id) AS rk
              FROM p WHERE pld IS NOT NULL),
         cap AS (SELECT pld, count(*)::BIGINT AS n_kept,
                sum(n_tokens)::BIGINT AS kept_tokens
              FROM r WHERE rk <= 3 GROUP BY 1),
         base AS (SELECT pld, count(*)::BIGINT AS n_docs,
                count(DISTINCT host)::BIGINT AS n_hosts,
                sum(n_tokens)::BIGINT AS n_tokens
              FROM p GROUP BY 1)
         SELECT base.pld, base.n_docs, base.n_hosts, base.n_tokens,
                cap.n_kept, cap.kept_tokens
         FROM base LEFT JOIN cap ON base.pld = cap.pld
         ORDER BY base.pld""",

    // identical novelty pipeline (df over the full union), restricted
    // to the batch's docs — exactly the incremental contract
    "q_novelty_incremental" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         sh AS (SELECT doc_id, unnest(ss) AS shingle FROM shl),
         dfc AS (SELECT shingle, count(*)::BIGINT AS df FROM sh
              GROUP BY 1),
         j AS (SELECT doc_id, df FROM sh JOIN dfc USING (shingle)
              WHERE doc_id % 10 = 0)
         SELECT doc_id, count(*)::BIGINT AS n_shingles,
                (count(*) FILTER (WHERE df = 1))::BIGINT AS n_unique,
                ((count(*) FILTER (WHERE df = 1)) * 1000000
                  // count(*))::BIGINT AS novelty_ppm
         FROM j GROUP BY 1 ORDER BY doc_id""",

    // identical PPJoin pipeline, restricted to pairs touching the
    // batch (doc_id % 10 = 0) — exactly the incremental contract
    "q_ppjoin_incremental" -> ppjoinOracleSql(9, 10,
      " WHERE doc_id % 5 = 0",
      " AND (id_a % 10 = 0 OR id_b % 10 = 0)"),

    "q_winnow_census" -> winnowCensusOracleSql(16, 16),

    // the streaming ledger accumulates exactly the per-doc census —
    // same oracle, no stream-specific SQL
    "q_winnow_stream" -> winnowCensusOracleSql(16, 16),

    // 8 unrolled integer power-iteration generations over the
    // milli-quantized scatter matrix
    "q_embed_top_pc" -> topPcOracleSql(8),

    "q_pc_project_label" -> pcProjectionOracleSql(8),

    // deflated second-component chain: v1's generations plus 8 more
    // with the integer orthogonal-complement projection
    "q_embed_pc2" -> secondPcOracleSql(8),

    // the scatter ledger sums to exactly the batch statistics —
    // same oracle as the batch top-PC, no stream-specific SQL
    "q_top_pc_stream" -> topPcOracleSql(8),

    "q_whiten_project" -> whitenProjectionOracleSql(8),

    // per-label dispersion from milli-quantized integer sufficient
    // statistics; disp = (n·S2 − Σ S1²) // n² (non-negative by
    // Cauchy–Schwarz, so truncation == floor)
    "q_label_centroids" ->
      """WITH e AS (SELECT label::BIGINT AS label,
                unnest([{'d': i, 'x': embedding[i]}
                    for i in generate_series(1, len(embedding))]) AS z
              FROM embeddings),
         q AS (SELECT label, z.d AS d,
                floor(z.x::DOUBLE * 1000 + 0.5)::BIGINT AS xq FROM e),
         dims AS (SELECT label, d, sum(xq)::BIGINT AS s1,
                sum(xq * xq)::BIGINT AS sq FROM q GROUP BY 1, 2),
         np AS (SELECT label::BIGINT AS label, count(*)::BIGINT AS n
              FROM embeddings GROUP BY 1),
         agg AS (SELECT label, sum(sq)::BIGINT AS s2,
                sum(s1 * s1)::BIGINT AS s1_norm2 FROM dims GROUP BY 1)
         SELECT a.label, np.n, a.s2, a.s1_norm2,
                ((np.n * a.s2 - a.s1_norm2) // (np.n * np.n))::BIGINT
                  AS disp
         FROM agg a JOIN np USING (label) ORDER BY label""",

    // pairwise inter-centroid squared distance over truncated integer
    // means (Spark div ≡ DuckDB //, both toward zero)
    "q_centroid_dist" ->
      """WITH e AS (SELECT label::BIGINT AS label,
                unnest([{'d': i, 'x': embedding[i]}
                    for i in generate_series(1, len(embedding))]) AS z
              FROM embeddings),
         q AS (SELECT label, z.d AS d,
                floor(z.x::DOUBLE * 1000 + 0.5)::BIGINT AS xq FROM e),
         cent AS (SELECT label, d,
                (sum(xq)::BIGINT // count(*)::BIGINT) AS mu
              FROM q GROUP BY 1, 2)
         SELECT a.label AS label_a, b.label AS label_b,
                sum((a.mu - b.mu) * (a.mu - b.mu))::BIGINT AS dist2
         FROM cent a JOIN cent b
           ON a.d = b.d AND a.label < b.label
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // deterministic word dropout: 0-based position draw mirrored
    // ((i - 1) — DuckDB lists are 1-based), all-dropped docs md5("")
    "q_aug_dropout" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
         a AS (SELECT doc_id, unnest([{'p': i - 1, 'w': l[i]}
                  for i in generate_series(1, len(l))]) AS z FROM t),
         k AS (SELECT doc_id, z.p AS pos, z.w AS token,
                ('0x' || substr(md5(doc_id::VARCHAR || ':'
                    || z.p::VARCHAR), 1, 15))::UBIGINT % 100 >= 15
                  AS keep
              FROM a)
         SELECT doc_id, count(*)::BIGINT AS n_orig,
                (count(*) FILTER (WHERE keep))::BIGINT AS n_kept,
                md5(coalesce(string_agg(token, ' ' ORDER BY pos)
                  FILTER (WHERE keep), '')) AS aug_md5
         FROM k GROUP BY 1 ORDER BY doc_id""",

    // FIM: cut draws mod length+1 keyed "d:fim1"/"d:fim2" (least/
    // greatest orientation), 50% application draw keyed "d:fim",
    // PSM re-ordering byte-gated via md5
    "q_fim_transform" ->
      """WITH p AS (SELECT doc_id, text, length(text)::BIGINT AS l,
                (('0x' || substr(md5(doc_id::VARCHAR || ':fim1'), 1, 15))::UBIGINT
                  % (length(text) + 1)::UBIGINT)::BIGINT AS d1,
                (('0x' || substr(md5(doc_id::VARCHAR || ':fim2'), 1, 15))::UBIGINT
                  % (length(text) + 1)::UBIGINT)::BIGINT AS d2,
                ('0x' || substr(md5(doc_id::VARCHAR || ':fim'), 1, 15))::UBIGINT
                  % 100 < 50 AND length(text) > 0 AS ap
              FROM documents),
         q AS (SELECT doc_id, text, l, ap,
                least(d1, d2) AS lo, greatest(d1, d2) AS hi FROM p),
         t AS (SELECT doc_id, ap,
                CASE WHEN ap
                  THEN '<fim_pre>' || substr(text, 1, lo::INTEGER)
                    || '<fim_suf>' || substr(text, (hi + 1)::INTEGER)
                    || '<fim_mid>'
                    || substr(text, (lo + 1)::INTEGER, (hi - lo)::INTEGER)
                  ELSE text END AS tr,
                CASE WHEN ap THEN lo ELSE l END AS n_prefix,
                CASE WHEN ap THEN hi - lo ELSE 0 END AS n_middle,
                CASE WHEN ap THEN l - hi ELSE 0 END AS n_suffix
              FROM q)
         SELECT doc_id, ap::BIGINT AS fim_applied,
                n_prefix::BIGINT AS n_prefix, n_middle::BIGINT AS n_middle,
                n_suffix::BIGINT AS n_suffix, md5(tr) AS fim_md5
         FROM t ORDER BY doc_id""",

    // adjacent-pair swap: disjoint pairs, pos xor 1 remap, draws keyed
    // by (doc, pair index)
    "q_aug_swap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l,
                len(string_split(text, ' ')) - 1 AS max_pos
              FROM documents),
         a AS (SELECT doc_id, max_pos, unnest([{'p': i - 1, 'w': l[i]}
                  for i in generate_series(1, len(l))]) AS z FROM t),
         k AS (SELECT doc_id, z.p AS pos, z.w AS token,
                ('0x' || substr(md5(doc_id::VARCHAR || ':s:'
                    || (z.p // 2)::VARCHAR), 1, 15))::UBIGINT % 100 < 30
                  AND (z.p // 2) * 2 + 1 <= max_pos AS swapped
              FROM a),
         r AS (SELECT doc_id, token, swapped,
                CASE WHEN swapped THEN xor(pos::BIGINT, 1)
                     ELSE pos::BIGINT END AS new_pos
              FROM k)
         SELECT doc_id,
                (count(*) FILTER (WHERE swapped))::BIGINT
                  AS n_swapped_tokens,
                md5(string_agg(token, ' ' ORDER BY new_pos)) AS aug_md5
         FROM r GROUP BY 1 ORDER BY doc_id""",

    // near-dup pairs labeled by the rounded quality score; rounded
    // ties dropped (no deterministic winner)
    "q_preference_pairs" ->
      s"""WITH $simhashEdgesCte,
         tq AS (SELECT doc_id, text,
                len(string_split(text, ' ')) AS n_tokens,
                length(text) AS n,
                len(list_filter(string_split(text, ' '),
                  x -> list_contains(['the','a','and','of','to','in',
                    'is','it','that','for'], x))) AS n_stop
              FROM documents),
         mq AS (SELECT doc_id, n_tokens,
                (n - (n_tokens - 1))::DOUBLE / n_tokens::DOUBLE AS mtl,
                length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                  / greatest(n, 1)::DOUBLE AS pr,
                n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE AS sr
              FROM tq),
         qual AS (SELECT doc_id,
                round(25.0 * least(n_tokens::DOUBLE / 50.0, 1.0)
                      + 25.0 * least(mtl / 6.0, 1.0)
                      + 25.0 * (1.0 - pr)
                      + 25.0 * least(sr * 8.0, 1.0), 6) AS q
              FROM mq)
         SELECT CASE WHEN qa.q > qb.q THEN p.id_a ELSE p.id_b END
                  AS chosen_id,
                CASE WHEN qa.q > qb.q THEN p.id_b ELSE p.id_a END
                  AS rejected_id,
                round(abs(qa.q - qb.q), 6) AS margin
         FROM prs p JOIN qual qa ON qa.doc_id = p.id_a
              JOIN qual qb ON qb.doc_id = p.id_b
         WHERE qa.q <> qb.q
         ORDER BY chosen_id, rejected_id""",

    // split-stability diagnostic: group-split labels of EXISTING docs
    // before vs after the batch (doc_id % 10 = 0) joins the corpus —
    // two suffixed cluster generations in one recursive query
    "q_split_stability" -> {
      def splitCase(col: String) =
        s"""CASE WHEN ('0x' || substr(md5($col::VARCHAR), 1, 15))
               ::UBIGINT % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5($col::VARCHAR), 1, 15))
               ::UBIGINT % 100 < 90 THEN 'val'
             ELSE 'test' END"""
      s"""WITH RECURSIVE
         ${simhashEdgesCteNamed("o", " WHERE doc_id % 10 <> 0")},
         reacho(id, lbl) AS (
             SELECT DISTINCT src, src FROM edgeso
             UNION
             SELECT e.dst, r.lbl FROM reacho r
                  JOIN edgeso e ON e.src = r.id),
         cluso AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reacho GROUP BY id),
         ${simhashEdgesCteNamed("n")},
         reachn(id, lbl) AS (
             SELECT DISTINCT src, src FROM edgesn
             UNION
             SELECT e.dst, r.lbl FROM reachn r
                  JOIN edgesn e ON e.src = r.id),
         clusn AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reachn GROUP BY id),
         ko AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS gk
              FROM documents d LEFT JOIN cluso c ON c.id = d.doc_id
              WHERE d.doc_id % 10 <> 0),
         kn AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS gk
              FROM documents d LEFT JOIN clusn c ON c.id = d.doc_id),
         lo AS (SELECT doc_id, ${splitCase("gk")} AS split_old FROM ko),
         lbn AS (SELECT doc_id, ${splitCase("gk")} AS split_new FROM kn)
         SELECT lo.split_old, lbn.split_new, count(*)::BIGINT AS n_docs
         FROM lo JOIN lbn USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // group-atomic split: near-dup clusters (recursive min-label over
    // the simhash graph) supply the hash key; singletons use their own
    // id; n_moved counts row-level labels the group key overrode
    "q_group_split" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         keyed AS (SELECT d.doc_id, d.n_chars,
                coalesce(c.cluster_id, d.doc_id) AS gk
              FROM documents d LEFT JOIN clus c ON c.id = d.doc_id),
         lab AS (SELECT n_chars, gk,
                CASE WHEN ('0x' || substr(md5(gk::VARCHAR), 1, 15))
                       ::UBIGINT % 100 < 80 THEN 'train'
                     WHEN ('0x' || substr(md5(gk::VARCHAR), 1, 15))
                       ::UBIGINT % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split,
                CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                       ::UBIGINT % 100 < 80 THEN 'train'
                     WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                       ::UBIGINT % 100 < 90 THEN 'val'
                     ELSE 'test' END AS row_split
              FROM keyed)
         SELECT split, count(*)::BIGINT AS n_docs,
                count(DISTINCT gk)::BIGINT AS n_groups,
                sum(n_chars)::BIGINT AS sum_chars,
                (count(*) FILTER (WHERE split <> row_split))::BIGINT
                  AS n_moved
         FROM lab GROUP BY 1 ORDER BY 1""",

    // deterministic 3-annotator panel (a·10% md5 noise), majority vote
    // with smallest-label tie break, confusion census vs truth
    "q_label_vote" ->
      s"""WITH $annotatorPanelCte,
         cell AS (SELECT id, lab, count(*) AS n FROM pan GROUP BY 1, 2),
         vote AS (SELECT id, lab AS voted, n = 3 AS unanimous
              FROM (SELECT id, lab, n, row_number() OVER
                      (PARTITION BY id ORDER BY n DESC, lab) AS rk
                    FROM cell)
              WHERE rk = 1)
         SELECT t.label::BIGINT AS true_label, v.voted,
                count(*)::BIGINT AS n_items,
                (count(*) FILTER (WHERE v.unanimous))::BIGINT
                  AS n_unanimous
         FROM vote v JOIN embeddings t ON t.vec_id = v.id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // the streaming cell ledger accumulates exactly the panel census —
    // same oracle as the batch kappa, no stream-specific SQL
    "q_kappa_stream" -> fleissKappaOracleSql,

    // Fleiss' kappa over the same panel: integer sufficient statistics
    // (S2, C), one exact ppm-quantized floor division
    "q_fleiss_kappa" -> fleissKappaOracleSql,

    "q_winnow_overlap" -> winnowOverlapOracleSql(16, 16, 4, 20),

    // identical winnowing pipeline, restricted to pairs touching the
    // batch (doc_id % 10 = 0) — exactly the incremental contract
    "q_winnow_incremental" -> winnowOverlapOracleSql(16, 16, 4, 20,
      " AND (id_a % 10 = 0 OR id_b % 10 = 0)"),

    // the same df-gated join, positions kept: per-pair matched-extent
    // bounds on both sides (end = last matched pos + k − 1)
    "q_winnow_spans" ->
      s"""WITH ${winnowFpChainSql(16, 16)},
         dfp AS (SELECT DISTINCT id, fp FROM fp),
         rare AS (SELECT fp FROM dfp GROUP BY 1 HAVING count(*) <= 20),
         kept AS (SELECT f.id, f.pos, f.fp FROM fp f JOIN rare USING (fp))
         SELECT a.id AS id_a, b.id AS id_b,
                count(DISTINCT a.fp)::BIGINT AS shared,
                min(a.pos)::BIGINT AS a_start,
                (max(a.pos) + 15)::BIGINT AS a_end,
                min(b.pos)::BIGINT AS b_start,
                (max(b.pos) + 15)::BIGINT AS b_end
         FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
         GROUP BY 1, 2 HAVING count(DISTINCT a.fp) >= 4
         ORDER BY id_a, id_b""",

    "q_triangles" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 200 AS i
              FROM lineitem),
         e AS (SELECT x.i AS u, y.i AS v
              FROM it x JOIN it y ON x.b = y.b AND x.i < y.i
              GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT n, count(*)::BIGINT AS degree
              FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                   JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         tn AS (SELECT n, count(*)::BIGINT AS n_triangles
              FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri) GROUP BY 1)
         SELECT d.n AS node, d.degree,
                coalesce(t.n_triangles, 0)::BIGINT AS n_triangles
         FROM deg d LEFT JOIN tn t ON d.n = t.n ORDER BY d.n""",

    "q_graph_health" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 200 AS i
              FROM lineitem),
         e AS (SELECT x.i AS u, y.i AS v
              FROM it x JOIN it y ON x.b = y.b AND x.i < y.i
              GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT n, count(*)::BIGINT AS degree
              FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                   JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         tn AS (SELECT n, count(*)::BIGINT AS t
              FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri) GROUP BY 1),
         base AS (SELECT d.n, d.degree, coalesce(t.t, 0)::BIGINT AS t
              FROM deg d LEFT JOIN tn t ON d.n = t.n),
         cc AS (SELECT n, degree, t, CASE WHEN degree >= 2
                THEN (t * 2000000) // (degree * (degree - 1)) END AS cc_e6
              FROM base)
         SELECT count(*)::BIGINT AS n_nodes,
                (sum(degree) // 2)::BIGINT AS n_edges,
                (sum(t) // 3)::BIGINT AS n_triangles,
                CASE WHEN count(cc_e6) > 0 THEN
                  round(sum(cc_e6)::DOUBLE / (count(cc_e6) * 1000000.0), 6)
                END AS avg_clustering
         FROM cc""",

    "q_dedup_containment" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS l
              FROM documents),
         shl AS (SELECT doc_id, CASE WHEN len(l) >= 3
                THEN list_distinct([array_to_string(l[i:i+2], ' ')
                                    for i in generate_series(1, len(l) - 2)])
                ELSE [text] END AS ss FROM tok),
         r AS (SELECT doc_id, unnest(ss) AS shingle FROM shl),
         rare AS (SELECT shingle FROM r GROUP BY 1 HAVING count(*) <= 40),
         kept AS (SELECT r.doc_id, r.shingle FROM r JOIN rare USING (shingle)),
         sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
         i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM kept a JOIN kept b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
         SELECT i.id_a, i.id_b, i.inter,
                round(i.inter::DOUBLE / sa.sz, 6) AS cont_a,
                round(i.inter::DOUBLE / sb.sz, 6) AS cont_b
         FROM i JOIN sz sa ON i.id_a = sa.doc_id
              JOIN sz sb ON i.id_b = sb.doc_id
         WHERE round(i.inter::DOUBLE / sa.sz, 6) >= 0.5
            OR round(i.inter::DOUBLE / sb.sz, 6) >= 0.5
         ORDER BY i.id_a, i.id_b""",

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
    // non-default fingerprint geometry: the pair set at Hamming <= 3 is
    // geometry-invariant, so the oracle is the shared simhash pair SQL
    // with the tighter verify threshold
    "q_dedup_simhash_geo" -> simhashPairsOracleAt(3),
    // the multi-table construction is recall-exact too — same pair set
    "q_dedup_simhash_tables" -> simhashPairsOracleAt(3),
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

    // clusters → per-cluster size → integer ppm down-weights; the
    // LEFT JOIN gives singletons weight 1e6
    "q_dedup_weights" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
              FROM clus GROUP BY 1)
         SELECT d.doc_id,
                coalesce(c.cluster_id, d.doc_id)::BIGINT AS cluster_id,
                coalesce(s.cluster_size, 1)::BIGINT AS cluster_size,
                (1000000 // coalesce(s.cluster_size, 1))::BIGINT
                  AS weight_ppm
         FROM documents d
           LEFT JOIN clus c ON d.doc_id = c.id
           LEFT JOIN sz s ON c.cluster_id = s.cluster_id
         ORDER BY d.doc_id""",

    // cluster-size histogram over the same recursive CC, singletons
    // via the left join, 5+ folded into the tail bucket
    "q_dup_profile" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         mem AS (SELECT d.doc_id,
                coalesce(c.cluster_id, d.doc_id) AS cid
              FROM documents d LEFT JOIN clus c ON d.doc_id = c.id),
         szs AS (SELECT cid, count(*)::BIGINT AS sz FROM mem GROUP BY 1)
         SELECT least(sz, 5)::BIGINT AS size_bucket,
                count(*)::BIGINT AS n_clusters, sum(sz)::BIGINT AS n_docs
         FROM szs GROUP BY 1 ORDER BY 1""",

    // the composed weighted-balance pipeline: cluster sizes → ppm
    // down-weights → effective tokens → band round-robin → per-shard
    // censuses
    "q_pipeline_balanced" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         csz AS (SELECT cluster_id, count(*)::BIGINT AS n
              FROM clus GROUP BY 1),
         wts AS (SELECT c.id, (1000000 // s.n)::BIGINT AS wppm
              FROM clus c JOIN csz s USING (cluster_id)),
         dtk AS (SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents),
         eff AS (SELECT d.doc_id,
                ((d.n_tokens * coalesce(w.wppm, 1000000)) // 1000000)
                  ::BIGINT AS eff_tokens
              FROM dtk d LEFT JOIN wts w ON d.doc_id = w.id),
         bnd AS (SELECT doc_id, eff_tokens,
                length(bin(eff_tokens))::BIGINT AS band,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT AS hh
              FROM eff WHERE eff_tokens > 0),
         rr AS (SELECT doc_id, eff_tokens,
                ((row_number() OVER (PARTITION BY band
                    ORDER BY eff_tokens DESC, hh, doc_id) - 1) % 4)
                  ::BIGINT AS shard
              FROM bnd)
         SELECT shard, count(*)::BIGINT AS n_docs,
                sum(eff_tokens)::BIGINT AS shard_tokens
         FROM rr GROUP BY 1 ORDER BY 1""",

    // clusters → md5-rank row_number per cluster, keep rank <= 2;
    // singletons (no cluster row) always survive at rank 1
    "q_cluster_cap" ->
      s"""WITH RECURSIVE
         $simhashEdgesCte,
         reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         clus AS (SELECT id, min(lbl)::BIGINT AS cluster_id
              FROM reach GROUP BY id),
         rk AS (SELECT id, cluster_id,
                row_number() OVER (PARTITION BY cluster_id
                  ORDER BY ('0x' || substr(md5(id::VARCHAR), 1, 15))::UBIGINT,
                    id)::BIGINT AS keep_rank
              FROM clus)
         SELECT d.doc_id,
                coalesce(c.cluster_id, d.doc_id)::BIGINT AS cluster_id,
                coalesce(r.keep_rank, 1)::BIGINT AS keep_rank
         FROM documents d
           LEFT JOIN clus c ON d.doc_id = c.id
           LEFT JOIN (SELECT id, keep_rank FROM rk WHERE keep_rank <= 2) r
             ON d.doc_id = r.id
         WHERE c.id IS NULL OR r.id IS NOT NULL
         ORDER BY d.doc_id""",

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
    "q_pipeline_export" -> pipelineExportOracle,

    // the ledger-driven incremental composition must produce the SAME
    // final export as the batch pipeline — shared oracle by design
    // (the Spark sides also share the mixPackExport tail)
    "q_pipeline_incremental" -> pipelineExportOracle,

    // the web capstone: component-shared builders end to end (url
    // chain, html page/extract, jusText gate, para-dedup keeper rule,
    // curation gates from the reassembled text, CC, export tail)
    "q_pipeline_web" -> pipelineWebOracle,

    // the ledger-driven streaming twin runs the IDENTICAL
    // webAssembleExport tail over at-ingest url/block/meta state —
    // shared oracle by design (the Spark sides share the code)
    "q_pipeline_web_stream" -> pipelineWebOracle,

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

    "q_contamination_embed" ->
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         nxt AS (SELECT vec_id - 1 AS join_id, v AS plant FROM e0),
         q AS (SELECT e.vec_id AS query_id,
                CASE WHEN e.vec_id % 74 = 0 AND n.plant IS NOT NULL
                  THEN n.plant ELSE e.v END AS qv
              FROM e0 e LEFT JOIN nxt n ON e.vec_id = n.join_id
              WHERE e.vec_id % 37 = 0),
         c AS (SELECT vec_id AS nn_id, v AS cv FROM e0
              WHERE vec_id % 37 <> 0),
         s AS (SELECT query_id, nn_id,
                round(list_cosine_similarity(qv, cv), 4) AS cos_sim
              FROM q JOIN c ON query_id <> nn_id),
         r AS (SELECT query_id, nn_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, nn_id)::BIGINT AS rank FROM s)
         SELECT query_id, nn_id, cos_sim,
                (CASE WHEN cos_sim >= 0.999 THEN 1 ELSE 0 END)::BIGINT
                  AS contaminated
         FROM r WHERE rank = 1 ORDER BY query_id""",

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

    // Matryoshka replay: the same deterministic top-5 twice (full dim,
    // leading-32 slice), overlap counted per query
    "q_ann_matryoshka" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS nn_id, embedding::DOUBLE[] AS cv
              FROM embeddings),
         rf AS (SELECT query_id, nn_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                           nn_id) AS rank
              FROM q JOIN c ON query_id <> nn_id),
         rh AS (SELECT query_id, nn_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY round(list_cosine_similarity(
                    qv[1:32], cv[1:32]), 4) DESC, nn_id) AS rank
              FROM q JOIN c ON query_id <> nn_id),
         fk AS (SELECT query_id, nn_id FROM rf WHERE rank <= 5),
         hk AS (SELECT query_id, nn_id, 1 AS hit FROM rh WHERE rank <= 5)
         SELECT f.query_id, count(*)::BIGINT AS k,
                coalesce(sum(h.hit), 0)::BIGINT AS n_overlap,
                (1000000 * coalesce(sum(h.hit), 0) // count(*))::BIGINT
                  AS recall_ppm
         FROM fk f LEFT JOIN hk h USING (query_id, nn_id)
         GROUP BY 1 ORDER BY 1""",

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
         FROM events ORDER BY event_id"""
  )
}
