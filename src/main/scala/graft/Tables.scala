package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver testdata tables (TESTDATA.md). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver has shipped `events.parquet` with two `ts` encodings so
    * far — TIMESTAMP(NANOS) (which Spark surfaces as int64 under
    * `spark.sql.legacy.parquet.nanosAsLong`) and native timestamp[us]
    * (isAdjustedToUTC=false ⇒ Spark reads TIMESTAMP_NTZ). Map whatever
    * the file declares onto a session-TZ `TimestampType`; all entry
    * points pin the session to UTC, so the NTZ→TZ cast is the identity
    * on wall-clock values and matches DuckDB's naive-timestamp read of
    * the same file exactly.
    */
  def normalizeEventTs(df: DataFrame, column: String = "ts"): DataFrame =
    df.schema(column).dataType match {
      case LongType => // legacy nanos-as-int64: µs-aligned, div is lossless
        df.withColumn(column, timestamp_micros(expr(s"$column div 1000")))
      case TimestampNTZType =>
        df.withColumn(column, col(column).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.$column has unsupported type $other — extend " +
          "Tables.normalizeEventTs for the new encoding")
    }

  /** `events.parquet` with `ts` normalized to TimestampType whatever the
    * on-disk encoding (see [[normalizeEventTs]]). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // NB session-level side effect, intentionally NOT restored: the
    // returned DataFrame is lazy and the flag must still hold when it
    // executes. Harmless when ts is a native timestamp; load-bearing
    // when the file declares TIMESTAMP(NANOS), which Spark otherwise
    // refuses to read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(read(spark, dir, "events"))
  }

  /** `events` adapted to the canonical habit_events column names
    * (FIXTURES.md §B: ts/user_id/event_type/value ≈ ts/user_email/habit/value). */
  def eventsAsHabits(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumnRenamed("user_id", "user_email")
      .withColumnRenamed("event_type", "habit")
}
