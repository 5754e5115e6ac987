package graft

import graft.analytics.Habits
import graft.load.Merge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or §7.5
  * extension scope) exercised end-to-end on the driver testdata; the
  * paired `oracleSql` is the same computation in DuckDB SQL. Conventions
  * for hash-stable compares:
  *   - every query ends in a deterministic total ORDER BY;
  *   - aggregated doubles are rounded to 6 places on both sides;
  *   - timestamps are emitted as timestamp_ntz (UTC wall time), matching
  *     DuckDB's naive TIMESTAMP read of the same parquet.
  */
object SparkEntry {

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")
  private def r6(c: Column): Column = round(c, 6)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_habit_daily")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Reference parity: analytics surface (SURVEY §2.5-2.6) ──────────
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

    "q_value_by_day" -> ((s, dir) =>
      Habits.valueByDay(Tables.eventsAsHabits(s, dir), lit(7L), "purchase",
          to_timestamp(lit("2024-01-05 00:00:00")),
          to_timestamp(lit("2024-01-25 00:00:00")))
        .select(ntz(col("day")).as("day"), r6(col("minutes")).as("minutes"))),

    "q_completion_pct" -> ((s, dir) =>
      Habits.completionPct(Tables.eventsAsHabits(s, dir), lit(7L),
          Seq("click", "view"),
          to_timestamp(lit("2024-01-01 00:00:00")),
          to_timestamp(lit("2024-01-25 00:00:00")))
        .select(col("habit"), r6(col("pct_done")).as("pct_done"))),

    "q_sessionize" -> ((s, dir) =>
      Habits.sessionize(Tables.eventsAsHabits(s, dir), "user_email", "ts", 30)
        .groupBy(col("user_email"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_email"))),

    // ── Reference parity: unpivot + merge + dedup (SURVEY §2.1-2.2) ────
    "q_unpivot_orders" -> ((s, dir) => {
      val o = Tables.read(s, dir, "orders")
      o.select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast("double").as("o_custkey"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_custkey"), col("o_totalprice")), "metric", "val")
        .orderBy(col("o_orderkey"), col("metric"))
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

    "q_raw_dedup" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("row_hash"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("row_hash"), col("n_copies"))
        .orderBy(col("doc_id"))),

    // ── Scale workload: joins / aggs / window top-k over TPC-H-ish ─────
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))
          .cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r6(sum(col("l_quantity"))).as("sum_qty"),
          r6(sum(col("l_extendedprice"))).as("sum_base_price"),
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_revenue_by_nation" -> ((s, dir) => {
      val orders = Tables.read(s, dir, "orders")
      val customer = Tables.read(s, dir, "customer")
      val nation = Tables.read(s, dir, "nation")
      // orders⋈customer co-shuffle on custkey (both scale with SF);
      // nation is a fixed 25-row dim — always broadcast.
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(r6(sum(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
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
        .select(col("c_mktsegment"), col("rank"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }),

    // ── Extension scope: text analysis (SURVEY §7.5) ───────────────────
    "q_token_count" -> ((s, dir) =>
      Tables.read(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).as("n_tokens"), col("n_chars"))
        .orderBy(col("doc_id"))))

  /** DuckDB-equivalent SQL per query (same parquet tables, table name =
    * file stem). Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_recent_events" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit, value
         FROM events ORDER BY ts DESC, event_id LIMIT 50""",

    "q_distinct_users" ->
      "SELECT DISTINCT user_id AS user_email FROM events ORDER BY 1",

    "q_distinct_habits" ->
      "SELECT DISTINCT event_type AS habit FROM events ORDER BY 1",

    "q_habit_daily" ->
      """SELECT date_trunc('day', ts) AS day,
                user_id AS user_email,
                event_type AS habit,
                count(*) FILTER (WHERE value >= 1) AS count_done,
                round(avg(value), 6) AS avg_value,
                round(sum(value) FILTER (WHERE event_type = 'purchase'), 6)
                  AS sum_meditation
         FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_value_by_day" ->
      """SELECT date_trunc('day', ts) AS day, round(sum(value), 6) AS minutes
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
           AND user_id = 7 AND event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    "q_completion_pct" ->
      """SELECT event_type AS habit,
                round(100.0 * sum(CASE WHEN value >= 1 THEN 1 ELSE 0 END)
                      / GREATEST(count(*), 1), 6) AS pct_done
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
           AND ts <  TIMESTAMP '2024-01-25 00:00:00'
           AND user_id = 7 AND event_type IN ('click', 'view')
         GROUP BY 1 ORDER BY 1""",

    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         )
         SELECT user_id AS user_email, sum(new_s) AS n_sessions,
                count(*) AS n_events
         FROM g GROUP BY 1 ORDER BY 1""",

    "q_unpivot_orders" ->
      """SELECT o_orderkey, 'o_custkey' AS metric,
                CAST(o_custkey AS DOUBLE) AS val FROM orders
         UNION ALL
         SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val
         FROM orders
         ORDER BY o_orderkey, metric""",

    "q_upsert_merge" ->
      """SELECT event_id, ts, user_id AS user_email, event_type AS habit,
                CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
                  AS value,
                props
         FROM events ORDER BY event_id""",

    "q_raw_dedup" ->
      """SELECT min(doc_id) AS doc_id, sha256(text) AS row_hash,
                count(*) AS n_copies
         FROM documents GROUP BY sha256(text) ORDER BY 1""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 6) AS sum_qty,
                round(sum(l_extendedprice), 6) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 6)
                  AS sum_disc_price,
                round(avg(l_quantity), 6) AS avg_qty,
                round(avg(l_discount), 6) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice), 6) AS revenue,
                count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",

    "q_top_orders_per_segment" ->
      """SELECT c_mktsegment, rank, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders JOIN customer ON o_custkey = c_custkey
         ) WHERE rank <= 5 ORDER BY c_mktsegment, rank""",

    "q_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, n_chars
         FROM documents ORDER BY doc_id""")
}
