package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-oriented MERGE semantics over immutable columnar storage.
  *
  * The reference delegates conflict resolution to Postgres row-at-a-time
  * (`/root/reference/etl/etl_habits.py:24-39`); here the same declarative
  * contract is a join: new batch vs existing sink, resolved per column.
  * At 100 TB both sides shuffle-partition on the natural key (or the new
  * side broadcasts when batch-sized), and the rewrite touches only the
  * partitions the batch intersects when the sink is date-partitioned.
  */
object Merge {

  val EventKeys: Seq[String] = Seq("user_email", "habit", "ts")

  /** Keyed upsert with the reference's resolution rules
    * (`/root/reference/etl/etl_habits.py:31-38`):
    * `value = EXCLUDED.value`, `notes = COALESCE(EXCLUDED.notes, old.notes)`;
    * rows only in the sink are kept; rows only in the batch are inserted.
    *
    * Within-batch duplicates resolve last-writer-wins by `seqCol` (sheet
    * row order = arrival order), mirroring the reference's sequential
    * per-row upsert loop (`/root/reference/etl/etl_habits.py:47-50`).
    */
  def upsertEvents(
      existing: DataFrame,
      batch: DataFrame,
      keys: Seq[String] = EventKeys,
      seqCol: Option[String] = None): DataFrame = {

    val deduped = seqCol match {
      case Some(s) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(s).desc)
        // The reference's loop applies notes = COALESCE(new, current) row
        // by row, so a last-duplicate with NULL notes still inherits an
        // earlier duplicate's notes. Last-writer-wins on `value` alone
        // would drop it; carry the running last non-null notes forward
        // before picking the winning row.
        val withNotes =
          if (batch.columns.contains("notes")) {
            val run = Window.partitionBy(keys.map(col): _*).orderBy(col(s))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            batch.withColumn("notes",
              last(col("notes"), ignoreNulls = true).over(run))
          } else batch
        withNotes.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", s)
      case None => batch.dropDuplicates(keys)
    }

    val payload = existing.columns.filterNot(keys.contains).toSeq
    val n = deduped.withColumn("_present", lit(true))
    val joined = existing.as("e").join(n.as("n"), keys, "full_outer")
    val resolved = payload.map {
      case "notes" =>
        when(col("n._present"), coalesce(col("n.notes"), col("e.notes")))
          .otherwise(col("e.notes")).as("notes")
      case c =>
        when(col("n._present"), col(s"n.$c")).otherwise(col(s"e.$c")).as(c)
    }
    joined.select(keys.map(col) ++ resolved: _*)
  }

  /** [[upsertEvents]] with SCHEMA EVOLUTION: payload columns present on
    * only one side are null-filled on the other before the merge, so a
    * batch that starts carrying a new column (a new form field, a new
    * enrichment) widens the sink instead of being silently projected
    * down to the old schema — the ALTER TABLE ADD COLUMN moment of the
    * reference's Postgres sink, done declaratively. Column order:
    * existing's columns first, then the batch's new ones. */
  def upsertEventsEvolving(existing: DataFrame, batch: DataFrame,
      keys: Seq[String] = EventKeys,
      seqCol: Option[String] = None): DataFrame = {
    // seqCol is deliberately excluded from null-filling below (a null
    // sequence would scramble the within-batch ordering), so it MUST
    // ride the batch — fail here with the contract, not later as an
    // unresolved-column error inside upsertEvents's window ordering
    seqCol.foreach(c => require(batch.columns.contains(c),
      s"upsertEventsEvolving: sequence column '$c' must be present on " +
        s"the batch (batch columns: ${batch.columns.mkString(", ")})"))
    val batchCols = batch.columns.toSeq.filterNot(seqCol.contains)
    val newCols = batchCols.filterNot(existing.columns.contains)
    // compare against the batch's FULL column set: if the sink happens to
    // carry a column named like seqCol, treating it as missing would
    // null-overwrite the batch's real sequence values
    val missingInBatch = existing.columns.toSeq
      .filterNot(batch.columns.contains).filterNot(seqCol.contains)
    val widenedExisting = newCols.foldLeft(existing)((d, c) =>
      d.withColumn(c, lit(null).cast(batch.schema(c).dataType)))
    val widenedBatch = missingInBatch.foldLeft(batch)((d, c) =>
      d.withColumn(c, lit(null).cast(existing.schema(c).dataType)))
    upsertEvents(widenedExisting, widenedBatch, keys, seqCol)
  }

  /** Apply a CDC change feed (insert/update/delete) to a keyed sink —
    * the MERGE-with-deletes generalization of [[upsertEvents]], the
    * operation a replicated source table needs (Debezium-style feeds:
    * each change row carries an op marker and a monotonically increasing
    * sequence).
    *
    * Semantics: per key, the change with the highest `seqCol` wins
    * (earlier changes to the same key are superseded within the batch;
    * seq ties resolve deterministically on op+payload order, so exact
    * replayed duplicates are harmless); a winning 'D' removes the key
    * from the sink (a no-op if absent), a winning 'I'/'U' replaces the
    * full payload (an insert if absent). Keys untouched by the feed
    * pass through unchanged.
    *
    * Scale notes: one window over the CHANGE FEED only (batch-sized,
    * never the sink) to pick winners, then a single full-outer
    * shuffle-join on the key — identical plan shape to [[upsertEvents]].
    * With a date-partitioned sink, scope the rewrite to touched
    * partitions exactly like `EventStore.upsert`.
    *
    * @param opCol  change-kind column on `changes`: 'I' | 'U' | 'D'
    *               (any other marker fails the job via `raise_error`
    *               rather than silently passing rows through)
    */
  def applyCdc(existing: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String = "op"): DataFrame = {
    require(changes.columns.contains(seqCol),
      s"applyCdc: sequence column '$seqCol' must be present on the feed")
    require(changes.columns.contains(opCol),
      s"applyCdc: op column '$opCol' must be present on the feed")
    val payload = existing.columns.filterNot(keys.contains).toSeq
    require(payload.forall(changes.columns.contains),
      "applyCdc: the feed must carry every sink payload column " +
        s"(missing: ${payload.filterNot(changes.columns.contains).mkString(", ")})")
    // seq ties (a replayed batch unioned with its original, per-source
    // sequences that restart) must not pick a shuffle-order-dependent
    // winner: the op and payload columns extend the ordering so equal
    // (seq, op, payload) duplicates are genuinely interchangeable and
    // anything else resolves deterministically
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc +:
        (opCol +: payload).map(c => col(c).desc_nulls_last): _*)
    val winners = changes
      // validate EVERY feed row, not just winners — a corrupt op marker
      // superseded by a later seq would otherwise go unreported
      .withColumn(opCol,
        when(upper(col(opCol)).isin("I", "U", "D"), upper(col(opCol)))
          .otherwise(raise_error(concat(lit("applyCdc: unknown op '"),
            col(opCol), lit("' (expected I, U, or D)")))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((keys.map(col) :+ col(opCol).as("_op")) ++
        payload.map(c => col(c).as(s"_new_$c")): _*)
    existing.join(winners, keys, "full_outer")
      // deletes drop the key; a 'D' on an absent key joins nothing on
      // the sink side and is filtered here too (delete-of-missing no-op)
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(keys.map(col) ++ payload.map(c =>
        when(col("_op").isNotNull, col(s"_new_$c")).otherwise(col(c))
          .as(c)): _*)
  }

  /** Content-addressed append to the raw landing zone: `ON CONFLICT DO
    * NOTHING` on `row_hash` (`/root/reference/etl/etl_habits.py:27-30`,
    * `/root/reference/sql/001_schema.sql:7-11`) becomes within-batch
    * dedup + left-anti join against the sink. Returns only the NEW rows
    * (the caller appends them — append-only forensic copy), each stamped
    * with `ingested_at`, the landing table's `now()` default
    * (`/root/reference/sql/001_schema.sql:9`). The stamp is the batch
    * ingest time (query start), evaluated once per plan — all rows of a
    * batch share it, like a single INSERT's `now()`.
    */
  def newRawRows(existing: DataFrame, batch: DataFrame,
      hashCol: String = "row_hash"): DataFrame = {
    val fresh = batch.dropDuplicates(hashCol)
      .join(existing.select(hashCol), Seq(hashCol), "left_anti")
    // a batch replayed from the forensic copy already carries its
    // original landing stamp — preserve that lineage, don't re-stamp
    if (batch.columns.contains("ingested_at")) fresh
    else fresh.withColumn("ingested_at", current_timestamp())
  }
}
