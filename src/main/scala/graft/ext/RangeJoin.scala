package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — pair each point with every interval
  * containing it on the same key. The second custom-join example from
  * the build brief (alongside [[AsOf]]).
  *
  * A naive `p.ts BETWEEN i.start AND i.end` theta join degenerates to a
  * per-key cross product. Here intervals explode into the coarse time
  * buckets they overlap and points map to their single bucket, turning
  * the containment test into an equi-join on (key, bucket) + an exact
  * residual filter. Bucket fan-out is bounded by interval span ÷
  * `bucketSeconds`, so the shuffle key cardinality — and the worst-case
  * bucket population — is tunable. A point's bucket intersects every
  * interval bucket range that could contain it, so no pair is missed,
  * and each (point, interval) pair meets in exactly the point's one
  * bucket, so no pair duplicates. */
object RangeJoin {

  /** @param points     (key, ts, ...) probe rows
    * @param intervals  (key, start, end, ...) with end exclusive
    * @param bucketSeconds  coarse bucket width; choose ≈ typical
    *                       interval span */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val p = points.withColumn("_bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    // Guard degenerate intervals BEFORE the bucket explode: an inverted
    // interval would make sequence() count DOWNWARD (Spark's
    // sequence(hi, lo) trap) and a null bound would sequence to null.
    // A corrupt far-future end still bounds the fan-out at one row per
    // spanned bucket — pick bucketSeconds ≈ the typical interval span
    // and sanity-filter interval lengths upstream for hostile data.
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("_bucket", explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(i, Seq(key, "_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }
}
