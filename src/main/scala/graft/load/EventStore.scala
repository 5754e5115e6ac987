package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned parquet event store — the engine's analog of the
  * reference's Timescale hypertable + indexes
  * (`/root/reference/sql/001_schema.sql:26-28`):
  *
  *   - `create_hypertable('habit_events','ts')` → `partitionBy(day)`
  *     directory layout; time-range predicates become partition pruning
  *     (directories never listed, let alone read).
  *   - the `(user_email, habit, ts DESC)` index → `sortWithinPartitions`
  *     on write; parquet row-group min/max stats then skip pages for
  *     per-user/habit reads.
  *
  * At 100 TB the day partition bounds every maintenance operation: a
  * batch upsert rewrites only the day directories the batch touches
  * (dynamic partition overwrite), exactly like Timescale's bounded
  * 60-day refresh window (`/root/reference/sql/001_schema.sql:43-46`).
  */
object EventStore {

  val DayCol = "day"

  /** Write/replace the store: day directories, intra-partition sort for
    * row-group skipping. One shuffle on the partition key. */
  def write(events: DataFrame, path: String): Unit =
    events.withColumn(DayCol, to_date(col("ts")))
      .repartition(col(DayCol))
      .sortWithinPartitions(col("user_email"), col("habit"), col("ts"))
      .write.mode("overwrite").partitionBy(DayCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(DayCol)

  /** Compact the store back to the [[write]] layout contract — one
    * sorted file per day partition. Repeated partition-scoped upserts
    * and streaming ticks fragment partitions into many small files
    * (each micro-batch writes at least one); at 100 TB periodic
    * compaction is what keeps scan task counts and row-group skipping
    * healthy.
    *
    * Crash-safe write-to-temp-then-swap: the compacted copy is fully
    * DURABLE (written beside the store, reading from the live files —
    * no overwrite-what-you-read, no lineage-truncating checkpoint)
    * before the old store is touched; a failure at any point leaves at
    * least one complete copy on disk. Hadoop `FileSystem.rename` reports
    * most failures by returning false rather than throwing, so each swap
    * step is `require`d: a false from the first rename aborts with the
    * live store untouched; a false from the second aborts with the
    * complete compacted copy still at `_compacting` and the pre-swap
    * store at `_precompact` (recover by renaming `_precompact` back —
    * readers see a missing `path` only between the two renames, which is
    * the unavoidable window of a swap on stores without atomic dir
    * rename-over). Full rewrite here; at scale, scope it to
    * recently-touched partitions the same way [[upsert]] scopes its
    * rewrite. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    val old = new org.apache.hadoop.fs.Path(path + "_precompact")
    fs.delete(tmp, true); fs.delete(old, true) // stale leftovers
    write(read(spark, path), tmp.toString)
    require(fs.rename(dst, old),
      s"compact: failed to move live store $dst aside to $old; store left untouched")
    require(fs.rename(tmp, dst),
      s"compact: failed to move compacted copy $tmp into place at $dst; " +
        s"pre-compaction store preserved at $old — rename it back to recover")
    fs.delete(old, true)
  }

  /** Upsert a batch, rewriting ONLY the day partitions the batch
    * intersects (reference semantics via [[Merge.upsertEvents]]: new
    * value wins, notes coalesce). `localCheckpoint` materializes the
    * merged slice so the dynamic-partition overwrite is not reading the
    * files it replaces. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String] = Merge.EventKeys): Unit = {
    val existing = spark.read.parquet(path)
    val touched = batch.select(to_date(col("ts")).as(DayCol)).distinct()
    val scoped = existing.join(broadcast(touched), Seq(DayCol), "left_semi")
      .drop(DayCol)
    val merged = Merge.upsertEvents(scoped, batch, keys)
      .withColumn(DayCol, to_date(col("ts")))
      .localCheckpoint(true)
      // rewritten partitions must keep the write()-time layout contract:
      // one consolidated file per day, sorted for row-group skipping
      .repartition(col(DayCol))
      .sortWithinPartitions(col("user_email"), col("habit"), col("ts"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(DayCol).parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
