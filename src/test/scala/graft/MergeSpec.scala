package graft

import graft.load.Merge
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the upsert conflict semantics of the reference
  * (`/root/reference/etl/etl_habits.py:31-38`): value always replaced,
  * notes coalesced, unmatched sink rows kept, idempotent on replay.
  */
class MergeSpec extends AnyFunSuite with SparkTestSession {

  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (String, String, String, Double, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (t, u, h, v, n) =>
      (ts(t), u, h, v, Option(n), "sheets")
    }.toDF("ts", "user_email", "habit", "value", "notes", "source")
  }

  private val existing = events(
    ("2025-08-20 17:00:00", "a@b.com", "workout", 1.0, "old note"),
    ("2025-08-20 17:00:00", "a@b.com", "mood_score", 7.0, null),
    ("2025-08-21 17:00:00", "c@d.com", "workout", 0.0, "keep me"))

  test("conflict: value replaced, non-null new notes win") {
    val batch = events(("2025-08-20 17:00:00", "a@b.com", "workout", 0.0, "new note"))
    val out = Merge.upsertEvents(existing, batch).collect()
      .map(r => (r.getAs[String]("user_email"), r.getAs[String]("habit")) ->
        (r.getAs[Double]("value"), r.getAs[String]("notes"))).toMap
    assert(out(("a@b.com", "workout")) == (0.0, "new note"))
    assert(out(("c@d.com", "workout")) == (0.0, "keep me")) // untouched
    assert(out.size == 3)
  }

  test("conflict: NULL new notes keep the old notes (COALESCE rule)") {
    val batch = events(("2025-08-20 17:00:00", "a@b.com", "workout", 5.0, null))
    val out = Merge.upsertEvents(existing, batch).collect()
      .map(r => (r.getAs[String]("user_email"), r.getAs[String]("habit")) ->
        r.getAs[String]("notes")).toMap
    assert(out(("a@b.com", "workout")) == "old note")
  }

  test("new key inserts") {
    val batch = events(("2025-08-22 17:00:00", "e@f.com", "workout", 1.0, null))
    assert(Merge.upsertEvents(existing, batch).count() == 4)
  }

  test("idempotent: applying the same batch twice equals once") {
    val batch = events(
      ("2025-08-20 17:00:00", "a@b.com", "workout", 0.5, "n1"),
      ("2025-08-23 17:00:00", "x@y.com", "sleep_hours", 8.0, null))
    val once = Merge.upsertEvents(existing, batch)
    val twice = Merge.upsertEvents(once, batch)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("within-batch duplicates: last writer (by seq) wins") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2025-08-20 17:00:00"), "a@b.com", "workout", 10.0, Option("first"), "sheets"),
      (2L, ts("2025-08-20 17:00:00"), "a@b.com", "workout", 20.0, Option.empty[String], "sheets"))
      .toDF("seq", "ts", "user_email", "habit", "value", "notes", "source")
    val out = Merge.upsertEvents(existing, batch, seqCol = Some("seq")).collect()
      .filter(r => r.getAs[String]("habit") == "workout" &&
        r.getAs[String]("user_email") == "a@b.com")
    assert(out.head.getAs[Double]("value") == 20.0)
    // the reference applies notes = COALESCE(new, current) row by row:
    // seq 1 sets "first", seq 2's NULL keeps it — NOT the sink's note
    assert(out.head.getAs[String]("notes") == "first")
  }

  test("within-batch duplicates: all-null notes fall back to sink notes") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2025-08-20 17:00:00"), "a@b.com", "workout", 10.0, Option.empty[String], "sheets"),
      (2L, ts("2025-08-20 17:00:00"), "a@b.com", "workout", 20.0, Option.empty[String], "sheets"))
      .toDF("seq", "ts", "user_email", "habit", "value", "notes", "source")
    val out = Merge.upsertEvents(existing, batch, seqCol = Some("seq")).collect()
      .filter(r => r.getAs[String]("habit") == "workout" &&
        r.getAs[String]("user_email") == "a@b.com")
    assert(out.head.getAs[Double]("value") == 20.0)
    assert(out.head.getAs[String]("notes") == "old note")
  }

  test("upsertEventsEvolving widens the sink with the batch's new column") {
    import spark.implicits._
    val batch = Seq(
      (ts("2025-08-20 17:00:00"), "a@b.com", "workout", 5.0,
        Option.empty[String], "sheets", "ios"),
      (ts("2025-08-22 17:00:00"), "e@f.com", "workout", 1.0,
        Option.empty[String], "sheets", "web"))
      .toDF("ts", "user_email", "habit", "value", "notes", "source", "device")
    val out = Merge.upsertEventsEvolving(existing, batch).collect()
      .map(r => (r.getAs[String]("user_email"), r.getAs[String]("habit")) ->
        Option(r.getAs[String]("device"))).toMap
    assert(out.size == 4)
    assert(out(("a@b.com", "workout")) == Some("ios"))   // updated row
    assert(out(("e@f.com", "workout")) == Some("web"))   // inserted row
    assert(out(("c@d.com", "workout")).isEmpty)          // untouched: null
    // and a batch MISSING a sink column still merges (null-filled)
    val narrow = Seq((ts("2025-08-20 17:00:00"), "a@b.com", "workout", 9.0))
      .toDF("ts", "user_email", "habit", "value")
    val out2 = Merge.upsertEventsEvolving(existing, narrow).collect()
      .map(r => (r.getAs[String]("user_email"), r.getAs[String]("habit")) ->
        (r.getAs[Double]("value"), Option(r.getAs[String]("notes")))).toMap
    assert(out2(("a@b.com", "workout")) == ((9.0, Some("old note"))))
  }

  test("upsertEventsEvolving demands the sequence column on the batch") {
    import spark.implicits._
    val batch = Seq((ts("2025-08-20 17:00:00"), "a@b.com", "workout", 5.0))
      .toDF("ts", "user_email", "habit", "value")
    val ex = intercept[IllegalArgumentException] {
      Merge.upsertEventsEvolving(existing, batch, seqCol = Some("seq"))
    }
    // the contract error, not a downstream unresolved-column analysis error
    assert(ex.getMessage.contains("seq") &&
      ex.getMessage.contains("batch"))
  }

  test("newRawRows: within-batch + against-sink dedup on row_hash") {
    import spark.implicits._
    val sink = Seq(("h1", "p1")).toDF("row_hash", "payload")
    val batch = Seq(("h1", "p1"), ("h2", "p2"), ("h2", "p2"), ("h3", "p3"))
      .toDF("row_hash", "payload")
    val out = Merge.newRawRows(sink, batch).collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("h2", "h3"))
  }

  test("newRawRows stamps ingested_at with the batch ingest time (F11)") {
    import spark.implicits._
    val sink = Seq(("h1", "p1")).toDF("row_hash", "payload")
    val batch = Seq(("h2", "p2"), ("h3", "p3")).toDF("row_hash", "payload")
    val before = System.currentTimeMillis() - 60000L
    val rows = Merge.newRawRows(sink, batch).collect()
    val after = System.currentTimeMillis() + 60000L
    val stamps = rows.map(_.getAs[java.sql.Timestamp]("ingested_at"))
    assert(stamps.length == 2)
    stamps.foreach { t =>
      assert(t.getTime >= before && t.getTime <= after)
    }
    // one INSERT, one now(): all rows of a batch share the same stamp
    assert(stamps.distinct.length == 1)
  }

  // ── applyCdc (MERGE with deletes) ────────────────────────────────────

  private def cdcSink = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "value")
  }

  private def cdcFeed(rows: (Long, String, Double, String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "name", "value", "op", "seq")
  }

  private def applied(feed: DataFrame) =
    Merge.applyCdc(cdcSink, feed, keys = Seq("k"), seqCol = "seq")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap

  test("applyCdc: update replaces payload, delete removes, insert adds") {
    val out = applied(cdcFeed(
      (1L, "a2", 11.0, "U", 1L),
      (2L, "b", 0.0, "D", 1L),
      (9L, "z", 90.0, "I", 1L)))
    assert(out == Map(1L -> (("a2", 11.0)), 3L -> (("c", 30.0)),
      9L -> (("z", 90.0))))
  }

  test("applyCdc: highest seq wins within the feed; D then U resurrects") {
    val out = applied(cdcFeed(
      (1L, "stale", -1.0, "U", 1L),
      (1L, "fresh", 99.0, "U", 5L),
      (3L, "gone", 0.0, "D", 1L),
      (3L, "back", 33.0, "U", 2L)))
    assert(out(1L) == (("fresh", 99.0)))
    assert(out(3L) == (("back", 33.0)))
  }

  test("applyCdc: delete of an absent key is a no-op; lowercase ops ok") {
    val out = applied(cdcFeed((42L, "x", 0.0, "d", 1L)))
    assert(out == Map(1L -> (("a", 10.0)), 2L -> (("b", 20.0)),
      3L -> (("c", 30.0))))
  }

  test("applyCdc rejects unknown op markers at evaluation") {
    val ex = intercept[Exception] {
      applied(cdcFeed((1L, "a", 1.0, "X", 1L)))
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")))
    // validation covers EVERY feed row, not just per-key winners — a
    // corrupt marker superseded by a later seq must still surface
    val ex2 = intercept[Exception] {
      applied(cdcFeed((1L, "bad", 0.0, "X", 1L), (1L, "good", 2.0, "U", 2L)))
    }
    assert(ex2.getMessage.contains("unknown op") ||
      Option(ex2.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("applyCdc resolves seq ties deterministically") {
    // same key, same seq, different payloads: op+payload ordering picks
    // the winner — identical across runs and partitionings
    val out1 = applied(cdcFeed((1L, "zzz", 1.0, "U", 9L),
      (1L, "aaa", 2.0, "U", 9L)))
    val out2 = applied(cdcFeed((1L, "aaa", 2.0, "U", 9L),
      (1L, "zzz", 1.0, "U", 9L)))
    assert(out1(1L) == out2(1L))
    assert(out1(1L) == (("zzz", 1.0))) // desc on payload order
  }

  test("applyCdc demands every sink payload column on the feed") {
    import spark.implicits._
    val feed = Seq((1L, 1.0, "U", 1L)).toDF("k", "value", "op", "seq")
    val ex = intercept[IllegalArgumentException] {
      Merge.applyCdc(cdcSink, feed, keys = Seq("k"), seqCol = "seq")
    }
    assert(ex.getMessage.contains("name"))
  }
}
