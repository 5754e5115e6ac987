package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.load.EventStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The day-partitioned event store: layout, partition pruning, and
  * partition-scoped upsert (the hypertable analog, SURVEY §4). */
class EventStoreSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (ts("2024-01-01 10:00:00"), "a@x", "workout", 1.0, Option("n1")),
      (ts("2024-01-01 11:00:00"), "b@x", "workout", 0.0, None),
      (ts("2024-01-02 10:00:00"), "a@x", "workout", 1.0, None),
      (ts("2024-01-03 10:00:00"), "a@x", "meditation_minutes", 20.0, None))
      .toDF("ts", "user_email", "habit", "value", "notes")
  }

  private def tmp(): String =
    Files.createTempDirectory("graft_store_").resolve("events").toString

  test("write lays out one directory per day and reads back losslessly") {
    val path = tmp()
    EventStore.write(events, path)
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("day=")).sorted
    assert(dirs.toSeq ==
      Seq("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
    val back = EventStore.read(spark, path)
    assert(back.count() == 4)
    assert(back.columns.sorted.toSeq ==
      Seq("habit", "notes", "ts", "user_email", "value"))
  }

  test("compact collapses fragmented day partitions to one sorted file") {
    val s = spark
    import s.implicits._
    val path = tmp()
    EventStore.write(events, path)
    // fragment day 1 with two single-row upserts (each writes new files)
    Seq(1, 2).foreach { i =>
      val b = Seq((ts("2024-01-01 10:00:00"), "a@x", "workout",
        i.toDouble, Option(s"n$i")))
        .toDF("ts", "user_email", "habit", "value", "notes")
      EventStore.upsert(s, path, b)
    }
    def day1Files() = new java.io.File(path, "day=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = EventStore.read(s, path).collect().map(_.toSeq).toSet
    EventStore.compact(s, path)
    assert(day1Files() == 1, "compaction must leave one file per day")
    val after = EventStore.read(s, path).collect().map(_.toSeq).toSet
    assert(after == before, "compaction must not change the data")
  }

  test("time-range predicates prune partitions at plan time") {
    val path = tmp()
    EventStore.write(events, path)
    val q = spark.read.parquet(path)
      .filter(col(EventStore.DayCol) === "2024-01-02")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("2024-01-02"))
    assert(q.count() == 1)
  }

  test("upsert rewrites only touched day partitions with merge semantics") {
    val path = tmp()
    EventStore.write(events, path)
    val day1 = new java.io.File(s"$path/day=2024-01-01").lastModified()
    val day3 = new java.io.File(s"$path/day=2024-01-03").lastModified()
    Thread.sleep(1100)

    val s = spark
    import s.implicits._
    val batch = Seq(
      // replaces a@x workout on day 1; null notes must keep old "n1"
      (ts("2024-01-01 10:00:00"), "a@x", "workout", 5.0,
        None: Option[String]),
      // brand-new row on day 2
      (ts("2024-01-02 12:00:00"), "c@x", "workout", 1.0,
        Option("new")))
      .toDF("ts", "user_email", "habit", "value", "notes")
    EventStore.upsert(spark, path, batch)

    val back = EventStore.read(spark, path)
    assert(back.count() == 5)
    val updated = back.filter(col("user_email") === "a@x" &&
      col("ts") === ts("2024-01-01 10:00:00")).head()
    assert(updated.getAs[Double]("value") == 5.0)
    assert(updated.getAs[String]("notes") == "n1") // coalesced
    // untouched day-3 partition was not rewritten; day-1 was
    assert(new java.io.File(s"$path/day=2024-01-03").lastModified() == day3)
    assert(new java.io.File(s"$path/day=2024-01-01").lastModified() > day1)

    // idempotency: replaying the same batch changes nothing
    EventStore.upsert(spark, path, batch)
    assert(EventStore.read(spark, path).count() == 5)
  }
}
