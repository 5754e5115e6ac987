package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key. The canonical time-series
  * operator Spark's built-ins lack (build-brief extension list; DuckDB
  * ships it natively as `ASOF JOIN`, which is the oracle).
  *
  * Formulated as UNION + windowed carry-forward, not a range join:
  * tag both inputs, union them, sort per key by (ts, tag) with right
  * rows first at equal timestamps (≤ semantics), carry the last right
  * payload with `last(..., ignoreNulls)`, keep left rows. ONE shuffle
  * on the key, no per-row range scan, no candidate explosion — the
  * formulation that survives 100 TB, unlike `left.ts >= right.ts`
  * theta joins.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate duplicates
  * (the result would otherwise depend on intra-timestamp order). */
object AsOf {

  /** @param left       probe side
    * @param right      reference side, unique per (key, ts)
    * @param key        equi-join key column name (both sides)
    * @param tsCol      event-time column name (both sides)
    * @param rightCols  right payload columns to carry (renamed
    *                   `asof_<name>` in the output) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((tsCol +: rightCols).map(col): _*)
    val rpType = right.select(payload.as("_rp")).schema("_rp").dataType

    val lNorm = left.select(col(key), col(tsCol), lit(1).as("_src"),
      lit(null).cast(rpType).as("_rp"),
      struct(leftCols.map(col): _*).as("_lrow"))
    val lrowType = lNorm.schema("_lrow").dataType
    val rNorm = right.select(col(key), col(tsCol), lit(0).as("_src"),
      payload.as("_rp"), lit(null).cast(lrowType).as("_lrow"))

    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lNorm.unionByName(rNorm)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)

    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      (tsCol +: rightCols).map(c => col(s"_asof.$c").as(s"asof_$c"))
    carried.select(out: _*)
  }

  /** Native-operator form of [[asofJoin]] — same output schema and the
    * same result on non-null keys/timestamps, planned as the custom
    * Catalyst operator stack (`AsOfJoinNode` → `AsOfJoinStrategy` →
    * `AsOfJoinExec`/`AsOfJoinBroadcastExec`, injected via
    * `graft.plans.GraftExtensions`). Each side shuffles once in its own
    * schema and merges per partition with O(1) state (or broadcasts a
    * small right side and leaves the fact side unshuffled), instead of
    * pushing a null-padded union schema through a window carry-forward.
    *
    * One deliberate contract difference: NULL keys and NULL timestamps
    * never match here (SQL comparison semantics, matching DuckDB's
    * `ASOF JOIN` oracle), whereas the composed form's window groups
    * null keys together and can carry a null-ts right row. */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String],
      broadcast: Option[Boolean] = None): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinNative.asofJoin(
      left, right, key, tsCol, rightCols, broadcast)

  /** Multi-column-key native as-of: rows match when every key column is
    * equal and `right.ts <= left.ts` (e.g. (user, day) to scope the
    * lookback within a day). Composed [[asofJoin]] has no multi-key
    * form — this only exists natively. */
  def asofJoinNativeMulti(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, rightCols: Seq[String],
      broadcast: Option[Boolean] = None): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinNative.asofJoinMulti(
      left, right, keys, tsCol, rightCols, broadcast)

  /** Skew-aware native as-of: result-identical to [[asofJoinNative]]
    * (specs pin it), but hot keys never touch a shuffle. The merge form
    * hash-clusters on the key, so at 100 TB a hot key (one user behind
    * a bot, one instrument carrying half the ticks) funnels its entire
    * fact timeline through a single task. Splitting by the declared hot
    * keys routes each side to the physical form that cannot skew:
    *
    *  - HOT left rows stay exactly where they are — the broadcast exec
    *    declares no required distribution, so the hot key's rows remain
    *    spread across whatever partitions the scan produced (a stronger
    *    guarantee than salting, which still shuffles `salts` ways) and
    *    each task binary-searches the broadcast per-key timeline.
    *  - COLD keys (including NULL keys, which must surface as unmatched
    *    left rows) take the co-partitioned merge; with the hot keys
    *    removed, its per-task load is balanced by construction.
    *
    * The trade: the hot keys' RIGHT timelines must fit in a broadcast —
    * the natural shape when the right side is dimension updates (orders
    * of magnitude fewer than fact rows). Hot keys are declared by the
    * caller, mirroring Spark's own skew-hint precedent; pair with
    * [[Skew]]-style frequency detection upstream when they're unknown. */
  def asofJoinSkew(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String],
      hotKeys: Seq[Any]): DataFrame = {
    require(hotKeys.nonEmpty, "asofJoinSkew: declare at least one hot key")
    val hot = hotKeys.map(lit)
    val lHot = left.filter(col(key).isin(hot: _*))
    val lCold = left.filter(!col(key).isin(hot: _*) || col(key).isNull)
    val rHot = right.filter(col(key).isin(hot: _*))
    val rCold = right.filter(!col(key).isin(hot: _*))
    asofJoinNative(lHot, rHot, key, tsCol, rightCols,
        broadcast = Some(true))
      .unionByName(asofJoinNative(lCold, rCold, key, tsCol, rightCols,
        broadcast = Some(false)))
  }

  /** [[asofJoinSkew]] with the hot keys DETECTED instead of declared —
    * for when nobody knows which user is the bot. One aggregate over
    * the left side finds keys whose row count exceeds `skewFactor`
    * fair shares (total/shufflePartitions, the same relative-imbalance
    * yardstick AQE's skew-join uses); the heaviest `maxHotKeys` of
    * them split to the broadcast path, everything else merges. No hot
    * keys detected → the plain native as-of, zero extra plan nodes.
    *
    * Scale notes: the detection aggregate partial-aggregates map-side,
    * so the hot keys themselves cannot skew it (each partition emits
    * one row per local key before the shuffle); only ≤ `maxHotKeys`
    * key values ever reach the driver — bounded like any skew-hint
    * list, never data-sized. The count pass is one extra scan of the
    * left side — worth it exactly when a hot key would otherwise pin
    * the whole join on one straggler task. */
  def asofJoinSkewAuto(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String], skewFactor: Double = 4.0,
      maxHotKeys: Int = 32): DataFrame = {
    require(skewFactor > 0, "skewFactor must be positive")
    require(maxHotKeys > 0, "maxHotKeys must be positive")
    val counts = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totalRow = counts.agg(sum(col("_n"))).first()
      val hot =
        if (totalRow.isNullAt(0)) Seq.empty[Any]
        else {
          val parts = left.sparkSession.sessionState.conf.numShufflePartitions
          val thresh = skewFactor * totalRow.getLong(0).toDouble / parts
          counts.filter(col("_n") > thresh)
            .orderBy(col("_n").desc, col(key))
            .limit(maxHotKeys).collect().map(_.get(0)).toSeq
        }
      if (hot.isEmpty) asofJoinNative(left, right, key, tsCol, rightCols)
      else asofJoinSkew(left, right, key, tsCol, rightCols, hot)
    } finally counts.unpersist()
  }
}
