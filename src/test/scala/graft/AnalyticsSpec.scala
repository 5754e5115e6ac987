package graft

import graft.analytics.Habits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the continuous-aggregate semantics
  * (`/root/reference/sql/001_schema.sql:31-40`): FILTER-ed count/sum and
  * the division guard of the completion query
  * (`/root/reference/README.md:130-139`).
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestSession {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkEvents() = {
    import spark.implicits._
    Seq(
      (ts("2025-08-20 17:00:00"), "a@b.com", "workout", 1.0),
      (ts("2025-08-20 18:00:00"), "a@b.com", "workout", 0.0),
      (ts("2025-08-20 17:00:00"), "a@b.com", "meditation_minutes", 25.0),
      (ts("2025-08-21 17:00:00"), "a@b.com", "meditation_minutes", 10.0),
      (ts("2025-08-20 17:00:00"), "c@d.com", "mood_score", 0.5))
      .toDF("ts", "user_email", "habit", "value")
  }

  test("habitDaily: count_done counts value>=1, avg over all, sum filtered") {
    val out = Habits.habitDaily(mkEvents()).collect().map { r =>
      (r.getAs[Timestamp]("day").toInstant.toString.take(10),
        r.getAs[String]("user_email"), r.getAs[String]("habit")) ->
        (r.getAs[Long]("count_done"), r.getAs[Double]("avg_value"),
          Option(r.getAs[java.lang.Double]("sum_meditation")))
    }.toMap
    assert(out(("2025-08-20", "a@b.com", "workout")) == (1L, 0.5, None))
    assert(out(("2025-08-20", "a@b.com", "meditation_minutes")) ==
      (1L, 25.0, Some(25.0)))
    assert(out(("2025-08-21", "a@b.com", "meditation_minutes")) ==
      (1L, 10.0, Some(10.0)))
    assert(out(("2025-08-20", "c@d.com", "mood_score")) == (0L, 0.5, None))
  }

  test("incremental state merge equals the one-shot habitDaily rollup") {
    val ev = mkEvents()
    // disjoint split: first batch = workout rows, increment = the rest
    val stored = Habits.habitDailyState(ev.filter(col("habit") === "workout"))
    val inc = Habits.habitDailyState(ev.filter(col("habit") =!= "workout"))
    val merged = Habits.finishDaily(Habits.mergeDailyState(stored, inc))
      .collect().map { r =>
        (r.getAs[Timestamp]("day"), r.getAs[String]("user_email"),
          r.getAs[String]("habit")) ->
          (r.getAs[Long]("count_done"), r.getAs[Double]("avg_value"),
            Option(r.getAs[java.lang.Double]("sum_meditation")))
      }.toMap
    val oneShot = Habits.habitDaily(ev).collect().map { r =>
      (r.getAs[Timestamp]("day"), r.getAs[String]("user_email"),
        r.getAs[String]("habit")) ->
        (r.getAs[Long]("count_done"), r.getAs[Double]("avg_value"),
          Option(r.getAs[java.lang.Double]("sum_meditation")))
    }.toMap
    assert(merged == oneShot)
  }

  test("completionPct matches the README bar-gauge formula") {
    val out = Habits.completionPct(mkEvents(), lit("a@b.com"), Seq("workout"),
      lit(ts("2025-08-18 00:00:00")), lit(ts("2025-08-25 00:00:00"))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("pct_done") == 50.0) // 1 of 2 >= 1
  }

  test("recentEvents is a deterministic top-k") {
    val out = Habits.recentEvents(mkEvents(), 2,
      Seq(col("user_email"), col("habit"))).collect()
    assert(out.length == 2)
    assert(out.head.getAs[Timestamp]("ts") == ts("2025-08-21 17:00:00"))
  }

  test("gapFillDaily builds the day spine and forward-fills gaps") {
    import spark.implicits._
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), "u1", "purchase", 10.0),
      // 1/2 and 1/3 missing -> spine rows with filled_total = 10.0
      (ts("2024-01-04 10:00:00"), "u1", "purchase", 4.0))
      .toDF("ts", "user_email", "habit", "value")
    val out = Habits.gapFillDaily(ev, "purchase")
      .orderBy($"day").collect()
      .map(r => (r.getDate(2).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", Some(10.0), 10.0),
      ("2024-01-02", None, 10.0),
      ("2024-01-03", None, 10.0),
      ("2024-01-04", Some(4.0), 4.0)))
  }

  test("rollingDailyAvg applies a day-range frame, not a row frame") {
    import spark.implicits._
    val ev = Seq(
      // gap between 1/1 and 1/5 — a ROW frame would wrongly average them
      (ts("2024-01-01 10:00:00"), "u1", "workout", 10.0),
      (ts("2024-01-05 10:00:00"), "u1", "workout", 30.0),
      (ts("2024-01-06 10:00:00"), "u1", "workout", 50.0))
      .toDF("ts", "user_email", "habit", "value")
    val out = Habits.rollingDailyAvg(ev, Seq("workout"), "2024-01-01", 3)
      .orderBy($"day").collect().map(_.getDouble(2))
    // 1/1: avg(10); 1/5: avg(30) (1/1 outside 3-day range); 1/6: avg(30,50)
    assert(out.toSeq == Seq(10.0, 30.0, 40.0))
  }

  test("streaks finds the longest consecutive-day completion run") {
    import spark.implicits._
    val ev = Seq(
      // u1/workout: done 8/18, 8/19, 8/20 (streak 3), gap, 8/22 (streak 1)
      (ts("2025-08-18 10:00:00"), "u1", "workout", 1.0),
      (ts("2025-08-19 09:00:00"), "u1", "workout", 1.0),
      (ts("2025-08-19 21:00:00"), "u1", "workout", 1.0), // same day twice
      (ts("2025-08-20 10:00:00"), "u1", "workout", 1.0),
      (ts("2025-08-22 10:00:00"), "u1", "workout", 1.0),
      // not-done days break nothing they never start
      (ts("2025-08-21 10:00:00"), "u1", "workout", 0.0),
      (ts("2025-08-18 10:00:00"), "u2", "workout", 1.0))
      .toDF("ts", "user_email", "habit", "value")
    val out = Habits.streaks(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("u1", "workout") -> 3L, ("u2", "workout") -> 1L))
  }

  test("sessionize splits on gaps > threshold per user") {
    import spark.implicits._
    val ev = Seq(
      (ts("2025-08-20 10:00:00"), "u1"),
      (ts("2025-08-20 10:10:00"), "u1"), // same session
      (ts("2025-08-20 11:00:00"), "u1"), // 50 min gap -> new session
      (ts("2025-08-20 10:00:00"), "u2"))
      .toDF("ts", "user_email")
    val out = Habits.sessionize(ev, "user_email", "ts", 30)
      .groupBy($"user_email").agg(max($"session_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("u1" -> 2L, "u2" -> 1L))
  }

  test("rollingDistinct counts unique users over trailing days, observed ends only") {
    import spark.implicits._
    val ev = Seq(
      ("u1", ts("2025-08-20 10:00:00")),
      ("u1", ts("2025-08-20 18:00:00")), // same (user, day): dedups
      ("u2", ts("2025-08-21 09:00:00")),
      ("u1", ts("2025-08-29 09:00:00"))) // outside 7d of the 20th/21st
      .toDF("user_id", "ts")
    val out = Habits.rollingDistinct(ev, "user_id", "ts", 7).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // only observed event days report: 20th {u1}=1, 21st {u1,u2}=2,
    // 29th {u1}=1 (the 21st is 8 days before the 29th — out of window)
    assert(out == Map("2025-08-20" -> 1L, "2025-08-21" -> 2L,
      "2025-08-29" -> 1L))
  }

  test("funnel requires stages strictly in time order per user") {
    import spark.implicits._
    val ev = Seq(
      ("a", "view", ts("2025-08-20 10:00:00")),   // full ordered funnel
      ("a", "click", ts("2025-08-20 10:05:00")),
      ("a", "purchase", ts("2025-08-20 10:10:00")),
      ("b", "click", ts("2025-08-20 09:00:00")),  // click BEFORE view:
      ("b", "view", ts("2025-08-20 09:30:00")),   //   stalls at stage 1
      ("c", "view", ts("2025-08-20 08:00:00")),   // stage 1 only
      ("d", "click", ts("2025-08-20 08:00:00")))  // never viewed
      .toDF("user_id", "event_type", "ts")
    val out = Habits.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }
}
