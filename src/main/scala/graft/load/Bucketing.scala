package graft.load

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the 100 TB answer to
  * REPEATED large⋈large joins on a stable key (events⋈users,
  * raw⋈events): both sides pre-hash-partitioned into the same bucket
  * count on disk, so every subsequent equi-join on the bucket key plans
  * with ZERO shuffle exchange — the join cost collapses to a per-bucket
  * merge, paid once at write time instead of per query.
  *
  * This generalizes the reference's Postgres index maintenance
  * (`/root/reference/sql/001_schema.sql:26-28`): an index is paid on
  * write to make every read cheap; a bucket layout is paid on write to
  * make every JOIN cheap. Complements [[EventStore]]'s day partitioning
  * (time pruning) with key co-location.
  *
  * BucketingSpec pins the plan contract: a join of two tables bucketed
  * (same count, same key) contains no `Exchange hashpartitioning`.
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table registered as `name` with
    * data at `path`. `sortBy` the key as well: single-file buckets then
    * also skip the join-side sort. */
  def writeBucketed(df: DataFrame, name: String, path: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
}
