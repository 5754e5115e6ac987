package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics read surface over `habit_events`-shaped data:
  * the Timescale continuous aggregate (`/root/reference/sql/001_schema.sql:31-40`)
  * and the Grafana dashboard query set (`/root/reference/README.md:98,118-139`).
  *
  * All functions assume the canonical event columns `(ts, user_email,
  * habit, value)`; adapt other tables by renaming (grouping is
  * type-agnostic). Every aggregation is hash-aggregatable — Catalyst
  * splits partial/final around the single shuffle on the group keys, and
  * the day bucket keeps cardinality bounded at any scale.
  */
object Habits {

  /** `time_bucket('1 day', ts)` (`/root/reference/sql/001_schema.sql:33`). */
  def dayBucket(ts: Column): Column = date_trunc("DAY", ts)

  /** The continuous aggregate `habit_daily`
    * (`/root/reference/sql/001_schema.sql:31-40`):
    * `count(*) FILTER (WHERE value >= 1)` as count_done, `avg(value)`,
    * `sum(value) FILTER (WHERE habit = sumHabit)` as sum_meditation.
    * SQL FILTER clauses become `agg(count/sum(when(...)))`.
    */
  def habitDaily(events: DataFrame,
      sumHabit: String = "meditation_minutes"): DataFrame =
    events.groupBy(
        dayBucket(col("ts")).as("day"), col("user_email"), col("habit"))
      .agg(
        count(when(col("value") >= 1, 1)).as("count_done"),
        avg(col("value")).as("avg_value"),
        sum(when(col("habit") === sumHabit, col("value"))).as("sum_meditation"))

  /** Combinable partial-aggregate STATE of [[habitDaily]] — the algebra
    * behind incremental materialized-view refresh (the batch form of
    * Timescale's continuous-aggregate policy,
    * `/root/reference/sql/001_schema.sql:43-46`): every state column is
    * a sum or count, so states computed from disjoint batches merge by
    * addition instead of re-scanning history. `avg` decomposes into
    * (sum_value, n_value). */
  def habitDailyState(events: DataFrame,
      sumHabit: String = "meditation_minutes"): DataFrame =
    events.groupBy(
        dayBucket(col("ts")).as("day"), col("user_email"), col("habit"))
      .agg(
        count(when(col("value") >= 1, 1)).as("count_done"),
        sum(col("value")).as("sum_value"),
        count(col("value")).as("n_value"),
        sum(when(col("habit") === sumHabit, col("value"))).as("sum_meditation"))

  /** Merge two [[habitDailyState]] relations computed from DISJOINT
    * event batches: full-outer join on the bucket keys, state columns
    * add null-safely (NULL means "no contributing rows on this side";
    * both NULL stays NULL, preserving sum-of-empty semantics). One
    * shuffle on the keys — refresh cost tracks the increment, not the
    * stored history. */
  def mergeDailyState(stored: DataFrame, increment: DataFrame): DataFrame = {
    val keys = Seq("day", "user_email", "habit")
    val states = stored.columns.filterNot(keys.contains).toSeq
    val inc = states.foldLeft(increment)((d, c) =>
      d.withColumnRenamed(c, c + "_inc"))
    stored.join(inc, keys, "full_outer")
      .select(keys.map(col) ++ states.map { c =>
        val l = col(c); val r = col(c + "_inc")
        when(l.isNull && r.isNull, lit(null))
          .otherwise(coalesce(l, lit(0)) + coalesce(r, lit(0))).as(c)
      }: _*)
  }

  /** Finish a (possibly merged) state into the [[habitDaily]] shape. */
  def finishDaily(state: DataFrame): DataFrame =
    state.select(col("day"), col("user_email"), col("habit"),
      col("count_done"),
      (col("sum_value") / col("n_value")).as("avg_value"),
      col("sum_meditation"))

  /** Grafana time-series panel: per-day sum for one user + habit within a
    * time range (`/root/reference/README.md:122-125`). */
  def valueByDay(events: DataFrame, user: Column, habit: String,
      from: Column, to: Column): DataFrame =
    events
      .filter(col("ts") >= from && col("ts") < to &&
        col("user_email") === user && col("habit") === habit)
      .groupBy(dayBucket(col("ts")).as("day"))
      .agg(sum(col("value")).as("minutes"))
      .orderBy(col("day"))

  /** Grafana bar gauge: completion % for bool-y habits over a window
    * (`/root/reference/README.md:130-139`). The 1-row `week` CTE cross
    * join collapses to literal range predicates.
    * `100.0 * sum(CASE WHEN value >= 1 THEN 1 ELSE 0 END)::float
    *  / GREATEST(count(*), 1)`.
    */
  def completionPct(events: DataFrame, user: Column, habits: Seq[String],
      from: Column, to: Column): DataFrame =
    events
      .filter(col("ts") >= from && col("ts") < to &&
        col("user_email") === user && col("habit").isin(habits: _*))
      .groupBy(col("habit"))
      .agg((lit(100.0) *
        sum(when(col("value") >= 1, 1).otherwise(0)).cast("double") /
        greatest(count(lit(1)), lit(1))).as("pct_done"))
      .orderBy(col("habit"))

  /** Dashboard variable queries (`/root/reference/README.md:118-119`). */
  def distinctValues(events: DataFrame, column: String): DataFrame =
    events.select(col(column)).distinct().orderBy(col(column))

  /** The SQL consumption surface a BI tool (the reference's Grafana,
    * `/root/reference/README.md:112-143`) actually needs: the raw
    * event relation and the daily continuous aggregate as NAMED temp
    * views, so every panel above is writable as plain `spark.sql`
    * text. Views are lazy logical plans — registering costs nothing;
    * each `spark.sql` read plans through the same Catalyst pipeline
    * (pushdown, pruning, partial aggs) as the DataFrame forms, so the
    * two surfaces stay performance-equivalent by construction. */
  def registerDashboardViews(events: DataFrame,
      sumHabit: String = "meditation_minutes"): Unit = {
    events.createOrReplaceTempView("habit_events")
    habitDaily(events, sumHabit).createOrReplaceTempView("habit_daily")
  }

  /** Verification query `ORDER BY ts DESC LIMIT n`
    * (`/root/reference/README.md:98`). Spark plans TakeOrderedAndProject —
    * a true distributed top-k, no global sort. `tiebreak` makes the cut
    * deterministic for testing. */
  def recentEvents(events: DataFrame, n: Int, tiebreak: Seq[Column]): DataFrame =
    events.orderBy(col("ts").desc +: tiebreak: _*).limit(n)

  /** Rolling `windowDays`-day average of the per-day value total, per
    * habit — a RANGE window frame over integer day offsets (frames are
    * the one window feature the reference's SQL never uses, SURVEY
    * §2.6). Partitioned by habit: the frame sort rides the per-habit
    * shuffle. */
  def rollingDailyAvg(events: DataFrame, habits: Seq[String],
      anchor: String, windowDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.filter(col("habit").isin(habits: _*))
      .groupBy(col("habit"), dayBucket(col("ts")).as("day"))
      .agg(sum(col("value")).as("day_total"))
    val w = Window.partitionBy(col("habit"))
      .orderBy(datediff(to_date(col("day")), to_date(lit(anchor))))
      .rangeBetween(-(windowDays - 1), Window.currentRow)
    daily.select(col("habit"), col("day"),
      avg(col("day_total")).over(w).as("rolling_avg"))
  }

  /** Calendar gap-fill + forward-fill: build the full day spine per
    * (user, habit) between that pair's first and last active day, left
    * join the actual daily totals, and carry the last observed value
    * through the gaps (`last(..., ignoreNulls)` over an unbounded
    * preceding frame). The spine explode is per-key bounded (≤ days in
    * range); the fill rides the same (user, habit) shuffle as the join. */
  def gapFillDaily(events: DataFrame, habit: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.filter(col("habit") === habit)
      .groupBy(col("user_email"), col("habit"),
        to_date(dayBucket(col("ts"))).as("day"))
      .agg(round(sum(col("value")), 6).as("day_total"))
    val spine = daily.groupBy(col("user_email"), col("habit"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_email"), col("habit"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_email"), col("habit"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_email", "habit", "day"), "left")
      .withColumn("filled_total",
        last(col("day_total"), ignoreNulls = true).over(w))
  }

  /** Longest consecutive-day streak of habit completion per (user,
    * habit) — the "streaks" analysis the reference README motivates but
    * never ships (`/root/reference/README.md:5`). Classic gaps-and-
    * islands: distinct completion days, anchor = day − row_number days
    * (constant within a consecutive run), count per anchor, max per key.
    * Two hash aggregates + one window, all keyed on (user, habit) — the
    * same shuffle key throughout, so one exchange at scale.
    */
  def streaks(events: DataFrame, threshold: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_email"), col("habit"))
      .orderBy(col("day"))
    events
      .filter(col("value") >= threshold)
      .select(col("user_email"), col("habit"),
        to_date(dayBucket(col("ts"))).as("day"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", expr("date_sub(day, rn)"))
      .groupBy(col("user_email"), col("habit"), col("anchor"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_email"), col("habit"))
      .agg(max(col("run_len")).as("longest_streak"))
  }

  /** Gaps-and-islands sessionization over a user event stream — the
    * "streaks" analysis the reference README motivates but never ships
    * (`/root/reference/README.md:5`; index prepared for it at
    * `/root/reference/sql/001_schema.sql:28`). A new session starts after
    * `gapMinutes` of inactivity. One shuffle on the partition key; the
    * window sort rides the same partitioning.
    */
  /** Rolling `windowDays`-day distinct users per day — the "7-day
    * active users" metric. DISTINCT cannot ride a window frame (no
    * engine supports `count(DISTINCT) OVER (RANGE ...)` at scale), so
    * the scalable form is: per-day distinct (user, day) pairs, each
    * EXPLODED to the `windowDays` window-ends it contributes to, then
    * an exact distinct count per window-end. Work scales as
    * rows × windowDays with map-side dedup before each shuffle; only
    * window-ends that are observed event days are reported.
    */
  def rollingDistinct(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays > 0)
    // The spine is DateType end to end: a date sequence steps CALENDAR
    // days, so window-ends stay aligned with day buckets across DST
    // transitions in any session timezone (a timestamp + INTERVAL
    // spine adds fixed 24 h spans and drifts an hour off the buckets).
    // `daily` feeds two branches (contrib + observed days) → persist,
    // released by the caller's clearCache as elsewhere.
    val daily = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("_u"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contrib = daily.withColumn("window_end",
      explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
    val days = daily.select(col("day").as("window_end")).distinct()
    contrib.join(days, "window_end")
      .groupBy(col("window_end"))
      .agg(count_distinct(col("_u")).as("n_users"))
  }

  /** Ordered conversion funnel: how many users performed `stages(0)`,
    * then `stages(1)` STRICTLY AFTER their first `stages(0)`, then
    * `stages(2)` strictly after that, … — the standard product-analytics
    * staged-conversion query. One row per stage with the surviving user
    * count.
    *
    * Stage k's reached-set derives from stage k−1's by an equi-join on
    * the user plus a time bound, then a min-ts aggregate — so the whole
    * funnel is a chain of co-partitioned joins/aggregates on the user
    * key (one logical shuffle key end to end, no windows over the full
    * event stream). Each reached-set feeds two branches (next stage +
    * its own count), hence the persist; caller releases via
    * `clearCache` (same contract as the dedup operators).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val spill = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (stage index, reached-set as (user, first-completion ts))
    val reached = stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        .persist(spill)) { (prev, stage) =>
      events.filter(col(typeCol) === stage).as("e")
        .join(prev.select(col(userCol).as("_u"), col("_t").as("_prev_t")),
          col(userCol) === col("_u") && col(tsCol) > col("_prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        .persist(spill)
    }
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(stage).as("stage"), col("n_users"))
    }.reduce(_ union _)
  }

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    // microsecond precision: unix_timestamp() truncates to seconds, so a
    // true gap in (gap, gap+1s) could compare as exactly == gap and
    // merge two sessions a full-precision engine would split
    val gapMicros = lit(gapMinutes * 60L * 1000000L)
    val prev = lag(col(tsCol), 1).over(byUser)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapMicros, 1).otherwise(0)
    events
      .withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }
}
