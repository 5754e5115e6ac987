package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read the raw int64 nanos (legacy flag) and convert to a
    * microsecond TimestampType. The driver data is µs-aligned, so the
    * `div 1000` is lossless and matches DuckDB's ns->µs read exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // NB session-level side effect, intentionally NOT restored: the
    // returned DataFrame is lazy and the flag must still hold when it
    // executes. Verify/Bench/test sessions also pin it at construction;
    // ad-hoc sessions get it set here on first use (any later genuine
    // TIMESTAMP(NANOS) read in the same session then surfaces as long).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** `events` adapted to the canonical habit_events column names
    * (FIXTURES.md §B: ts/user_id/event_type/value ≈ ts/user_email/habit/value). */
  def eventsAsHabits(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumnRenamed("user_id", "user_email")
      .withColumnRenamed("event_type", "habit")
}
