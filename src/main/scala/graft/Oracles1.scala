package graft

import graft.ext.TextAnalysis
import graft.OracleBuilders._

/** DuckDB oracle SQL, slice 1 of 3 — split from the monolithic
  * [[SparkEntry.oracleSql]] registry by size for maintainability (the
  * map is keyed by query name; family grouping lives in the Queries*
  * objects). No behavior change. */
private[graft] object Oracles1 {
  /** Char-excision span-removal replay, shared by the drop-all and
    * keep-first gates: `repJoin` is the window-pair predicate deciding
    * which occurrences flag ("<>" = every occurrence, "<" on the train
    * side = only copies with a smaller-id original). */
  private def spanRemovalOracle(repJoin: String): String =
    s"""WITH w AS (SELECT doc_id,
                unnest([{'i': i, 'w': substr(text, i, 31)}
                    for i in generate_series(1, length(text) - 30)]) AS x
              FROM documents WHERE length(text) >= 31),
         ww AS (SELECT doc_id, x.i AS i, x.w AS w FROM w),
         rep AS (SELECT DISTINCT a.doc_id, a.i
              FROM ww a JOIN ww b ON a.w = b.w AND $repJoin),
         cov AS (SELECT DISTINCT doc_id,
                unnest(generate_series(i, i + 30)) AS cp FROM rep),
         chars AS (SELECT doc_id,
                unnest([{'cp': i, 'ch': substr(text, i, 1)}
                    for i in generate_series(1, length(text))]) AS x
              FROM documents),
         kept AS (SELECT c.doc_id, c.x.cp AS cp, c.x.ch AS ch
              FROM chars c LEFT JOIN cov
                ON cov.doc_id = c.doc_id AND cov.cp = c.x.cp
              WHERE cov.cp IS NULL),
         red AS (SELECT doc_id, string_agg(ch, '' ORDER BY cp) AS t
              FROM kept GROUP BY 1)
         SELECT d.doc_id, coalesce(red.t, '') AS text_redacted,
                (length(d.text) - coalesce(length(red.t), 0))::BIGINT
                  AS n_removed
         FROM documents d LEFT JOIN red USING (doc_id)
         ORDER BY doc_id"""

  val map: Map[String, String] = Map(
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

    // the SQL-view surface: same panel math over the raw relation and
    // the daily rollup, joined on the day bucket
    "q_sql_dashboard" ->
      """WITH ts_panel AS (
           SELECT date_trunc('day', ts) AS day, round(sum(value), 6) AS minutes
           FROM events
           WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             AND ts <  TIMESTAMP '2024-01-25 00:00:00'
             AND user_id = 7 AND event_type = 'purchase'
           GROUP BY 1),
         agg_panel AS (
           SELECT date_trunc('day', ts) AS day,
                  count(*) FILTER (WHERE value >= 1) AS count_done,
                  round(avg(value), 6) AS avg_value
           FROM events
           WHERE user_id = 7 AND event_type = 'purchase'
           GROUP BY 1)
         SELECT t.day, t.minutes, a.count_done, a.avg_value
         FROM ts_panel t JOIN agg_panel a ON t.day = a.day
         ORDER BY t.day""",

    // all four dashboard read shapes, tall-unioned — mirrors the Spark
    // SQL text panel for panel
    "q_sql_dashboard_full" ->
      """WITH ts_panel AS (
           SELECT date_trunc('day', ts) AS day, round(sum(value), 6) AS minutes
           FROM events
           WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             AND ts <  TIMESTAMP '2024-01-25 00:00:00'
             AND user_id = 7 AND event_type = 'purchase'
           GROUP BY 1),
         agg_panel AS (
           SELECT date_trunc('day', ts) AS day,
                  count(*) FILTER (WHERE value >= 1) AS count_done,
                  round(avg(value), 6) AS avg_value
           FROM events
           WHERE user_id = 7 AND event_type = 'purchase'
           GROUP BY 1),
         recent AS (
           SELECT ts, user_id, event_type, value, event_id
           FROM events ORDER BY ts DESC, event_id LIMIT 50)
         SELECT 'ts' AS panel, strftime(day, '%Y-%m-%d') AS k1,
                CAST(NULL AS VARCHAR) AS k2, minutes AS v1,
                CAST(NULL AS DOUBLE) AS v2
         FROM ts_panel
         UNION ALL
         SELECT 'agg', strftime(day, '%Y-%m-%d'), NULL,
                avg_value, count_done::DOUBLE
         FROM agg_panel
         UNION ALL
         SELECT 'var_user', user_id::VARCHAR, NULL, NULL, NULL
         FROM (SELECT DISTINCT user_id FROM events)
         UNION ALL
         SELECT 'var_habit', event_type, NULL, NULL, NULL
         FROM (SELECT DISTINCT event_type FROM events)
         UNION ALL
         SELECT 'recent', strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
                user_id::VARCHAR || ':' || event_type,
                value, event_id::DOUBLE
         FROM recent
         ORDER BY panel, k1, k2, v2""",

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

    // dimension-wise mean in micro-units: quantize before sum, one
    // textually-mirrored floor(sum/n), md5 over dim-ordered components
    "q_embed_pool" ->
      """WITH e AS (SELECT vec_id // 4 AS group_id,
                unnest([{'d': i, 'x': embedding[i]}
                    for i in generate_series(1, len(embedding))]) AS z
              FROM embeddings),
         q AS (SELECT group_id, z.d AS d,
                floor(z.x::DOUBLE * 1e6 + 0.5)::BIGINT AS qx FROM e),
         s AS (SELECT group_id, d, sum(qx)::BIGINT AS sq,
                count(*)::BIGINT AS n FROM q GROUP BY 1, 2),
         p AS (SELECT group_id, n, d,
                floor(sq::DOUBLE / n::DOUBLE)::BIGINT AS pooled FROM s)
         SELECT group_id, n AS n_chunks,
                md5(array_to_string(list(pooled::VARCHAR ORDER BY d), ' '))
                  AS vec_md5
         FROM p GROUP BY 1, 2 ORDER BY group_id""",

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

    // HTML extraction replayed rule for rule (RE2 shares Java's (?is)
    // + non-greedy semantics on this subset; entity decode order
    // matters — &amp; last so &amp;lt; renders the literal &lt;)
    "q_html_extract" ->
      s"""WITH pg AS (SELECT doc_id, ${OracleBuilders.htmlPageSql} AS page
              FROM documents),
         x AS (SELECT doc_id,
                ${OracleBuilders.htmlExtractSql("page")} AS t
              FROM pg)
         SELECT doc_id, md5(t) AS text_md5,
                len(string_split(t, ' '))::BIGINT AS n_tokens
         FROM x ORDER BY doc_id""",

    // per-<p> link-density rows: the planted nav bar is all link
    // (density 1e6, dropped), the planted mixed paragraph is prose-
    // dominated (kept), short main blocks drop on the word floor
    "q_html_blocks" ->
      s"""WITH pg AS (SELECT doc_id, ${OracleBuilders.htmlPageSql}
                || CASE WHEN doc_id % 4 = 0
                     THEN '<p><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></p>'
                     ELSE '' END
                || CASE WHEN doc_id % 7 = 0
                     THEN '<p>Read the <a href="/x">full story</a> and much more prose follows here today</p>'
                     ELSE '' END AS page
              FROM documents),
         l AS (SELECT doc_id,
                regexp_extract_all(page, '(?is)<p[^>]*>(.*?)</p>', 1) AS ps
              FROM pg),
         b AS (SELECT doc_id,
                unnest([{'i': i - 1, 'r': ps[i]}
                    for i in generate_series(1, len(ps))]) AS z
              FROM l),
         t AS (SELECT doc_id, z.i::BIGINT AS block_idx,
                ${OracleBuilders.htmlExtractSql("z.r")} AS bt,
                ${OracleBuilders.htmlExtractSql(
                  // array_to_string([]) is NULL in DuckDB (array_join
                  // is '' in Spark) — coalesce keeps no-anchor blocks
                  "coalesce(array_to_string(regexp_extract_all(z.r, " +
                  "'(?is)<a[^>]*>(.*?)</a>', 1), ' '), '')")} AS lk
              FROM b),
         m AS (SELECT doc_id, block_idx, bt,
                length(bt)::BIGINT AS n_chars,
                len(list_filter(string_split(bt, ' '),
                  x -> x <> ''))::BIGINT AS n_words,
                CASE WHEN length(bt) = 0 THEN 1000000
                     ELSE (length(lk)::BIGINT * 1000000
                       // length(bt)::BIGINT) END::BIGINT AS link_ppm
              FROM t)
         SELECT doc_id, block_idx, md5(bt) AS block_md5, n_chars,
                n_words, link_ppm,
                (link_ppm <= 500000 AND n_words >= 5)::BIGINT AS kept
         FROM m ORDER BY doc_id, block_idx""",


    // CCNet stage-1 paragraph-hash dedup over the kept blocks: keeper
    // = min (doc*10000 + idx) per digest, copy count carried
    "q_para_dedup" ->
      s"""WITH pg AS (SELECT doc_id, ${OracleBuilders.htmlPageSql} AS page
              FROM documents),
         l AS (SELECT doc_id,
                regexp_extract_all(page, '(?is)<p[^>]*>(.*?)</p>', 1) AS ps
              FROM pg),
         b AS (SELECT doc_id,
                unnest([{'i': i - 1, 'r': ps[i]}
                    for i in generate_series(1, len(ps))]) AS z
              FROM l),
         t AS (SELECT doc_id, z.i::BIGINT AS block_idx,
                ${OracleBuilders.htmlExtractSql("z.r")} AS bt,
                ${OracleBuilders.htmlExtractSql(
                  "coalesce(array_to_string(regexp_extract_all(z.r, " +
                  "'(?is)<a[^>]*>(.*?)</a>', 1), ' '), '')")} AS lk
              FROM b),
         m AS (SELECT doc_id, block_idx, bt,
                len(list_filter(string_split(bt, ' '),
                  x -> x <> ''))::BIGINT AS n_words,
                CASE WHEN length(bt) = 0 THEN 1000000
                     ELSE (length(lk)::BIGINT * 1000000
                       // length(bt)::BIGINT) END::BIGINT AS link_ppm
              FROM t),
         kb AS (SELECT doc_id, block_idx, md5(bt) AS block_md5
              FROM m WHERE link_ppm <= 500000 AND n_words >= 5),
         k AS (SELECT block_md5,
                min(doc_id * 10000 + block_idx)::BIGINT AS k,
                count(*)::BIGINT AS n_copies
              FROM kb GROUP BY 1)
         SELECT kb.doc_id, kb.block_idx, kb.block_md5,
                (kb.doc_id * 10000 + kb.block_idx = k.k)::BIGINT AS keep,
                k.n_copies
         FROM kb JOIN k USING (block_md5)
         ORDER BY kb.doc_id, kb.block_idx""",

    // DETERMINISTIC FIXTURE oracle for the Unicode fold (DuckDB has no
    // NFKC): the engine dirties each doc with enumerable variants —
    // NFD e+U+0301, fullwidth letters, the fi ligature, zero-width
    // separators — and this replay appends each variant's KNOWN NFKC
    // image instead (chr(233) = the precomposed e-acute); the corpus
    // text itself is ASCII and unaffected by the fold, so the md5
    // pins the engine's normalizer output byte for byte
    "q_text_normalize_nfkc" ->
      """WITH n AS (SELECT doc_id,
                text || CASE doc_id % 5
                  WHEN 0 THEN ' Caf' || chr(233) || ' menu'
                  WHEN 1 THEN ' ABC wide'
                  WHEN 2 THEN ' fine print'
                  WHEN 3 THEN ' zerowidthmark'
                  ELSE '' END AS t
              FROM documents)
         SELECT doc_id, md5(t) AS norm_md5,
                length(t)::BIGINT AS n_chars
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

    // the GPT-3 whole-gram rule: token 13-grams (whole text below 13
    // tokens), distinct per doc on both sides, one equi-join
    "q_decontam_13gram" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS l,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT
                  % 100 AS bucket
              FROM documents),
         -- the CASE must live INSIDE the unnest: an unnest in the
         -- select list drops rows whose list is empty, which would
         -- silently erase every short doc's whole-text fallback gram
         trg AS (SELECT DISTINCT g FROM (
                SELECT unnest(CASE WHEN len(l) >= 13
                     THEN [array_to_string(l[i : i + 12], ' ')
                          for i in generate_series(1, len(l) - 12)]
                     ELSE [array_to_string(l, ' ')] END) AS g
                FROM b WHERE bucket < 80)),
         teg AS (SELECT DISTINCT doc_id,
                unnest(CASE WHEN len(l) >= 13
                  THEN [array_to_string(l[i : i + 12], ' ')
                       for i in generate_series(1, len(l) - 12)]
                  ELSE [array_to_string(l, ' ')] END) AS g
              FROM b WHERE bucket >= 90)
         SELECT doc_id, count(*)::BIGINT AS n_shared
         FROM teg JOIN trg USING (g)
         GROUP BY doc_id ORDER BY doc_id""",

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

    // span-REMOVAL product step: the selfdup window relation (below)
    // drives the same char-excision replay as q_redact_contamination —
    // covered = union of repeated windows' [i, i+30] positions,
    // rebuild each doc from its uncovered characters
    "q_dedup_span_removal" -> spanRemovalOracle("a.doc_id <> b.doc_id"),

    // keep-first variant: a window is covered only when the same
    // 31-char string occurs in a STRICTLY SMALLER doc id — the
    // smallest-id copy of each duplicated passage survives intact
    "q_dedup_span_keepfirst" -> spanRemovalOracle("b.doc_id < a.doc_id"),

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

    "q_grouping_sets" ->
      """SELECT user_id AS user_email, event_type AS habit,
                GROUPING(user_id, event_type)::BIGINT AS gid,
                count(*) AS n_events, round(sum(value), 2) AS total
         FROM events WHERE event_type IN ('click', 'view')
         GROUP BY GROUPING SETS ((user_id), (event_type), ())
         ORDER BY gid, user_email NULLS FIRST, habit NULLS FIRST""",

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

  )
}
