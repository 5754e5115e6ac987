package graft

import java.sql.Timestamp

import graft.analytics.Habits
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY §2.7 ST1-ST4): the watermarked windowed
  * aggregate must agree with the batch `habit_daily` rollup, and
  * watermark-bounded dedup must absorb replays like the `habits_raw` PK.
  */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 10:00:00"), "a@x", "workout", 1.0),
    (ts("2024-01-01 11:00:00"), "a@x", "workout", 0.0),
    (ts("2024-01-01 12:00:00"), "a@x", "meditation_minutes", 20.0),
    (ts("2024-01-02 09:00:00"), "b@x", "workout", 1.0))

  test("streaming habit_daily equals the batch rollup on the same data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, String, Double)]
    mem.addData(rows: _*)
    val stream = mem.toDF().toDF("ts", "user_email", "habit", "value")
    val qn = Streaming.nextQueryName("spec_hd")
    val q = Streaming.habitDailyStream(stream)
      .writeStream.format("memory").queryName(qn)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = s.table(qn)
      .orderBy(col("day"), col("user_email"), col("habit")).collect().toSeq
    val batch = Habits.habitDaily(rows.toDF("ts", "user_email", "habit", "value"))
      .orderBy(col("day"), col("user_email"), col("habit")).collect().toSeq
    assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
  }

  test("sessionizeStream assigns gap-based session ids with state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.SessionEvent
    val mem = MemoryStream[SessionEvent]
    mem.addData(
      SessionEvent("u1", ts("2024-01-01 10:00:00")),
      SessionEvent("u1", ts("2024-01-01 10:10:00")), // same session
      SessionEvent("u1", ts("2024-01-01 11:00:00")), // 50 min gap -> new
      SessionEvent("u2", ts("2024-01-01 10:00:00")))
    val qn = Streaming.nextQueryName("spec_sess")
    val q = Streaming.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = s.table(qn).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(out == Set(
      ("u1", "2024-01-01 10:00:00.0", 1L),
      ("u1", "2024-01-01 10:10:00.0", 1L),
      ("u1", "2024-01-01 11:00:00.0", 2L),
      ("u2", "2024-01-01 10:00:00.0", 1L)))
    // agrees with the batch sessionizer on the same data
    val batch = Habits.sessionize(
        s.table(qn).select(col("ts"), col("user_email")),
        "user_email", "ts", 30)
      .select(col("user_email"), col("ts"), col("session_id")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(batch == out)
  }

  test("dedupStream drops replayed keys within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, String, Double)]
    mem.addData(rows ++ rows: _*) // full replay in the same batch
    val stream = mem.toDF().toDF("ts", "user_email", "habit", "value")
    val qn = Streaming.nextQueryName("spec_dd")
    val q = Streaming.dedupStream(stream, Seq("user_email", "habit", "ts"))
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(s.table(qn).count() == rows.length.toLong)
  }
}
