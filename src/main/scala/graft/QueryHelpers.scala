package graft

import graft.config.{EtlConfig, HabitSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column/fixture helpers shared by the [[SparkEntry.queries]] family
  * objects (QueriesParity / QueriesScaleText / QueriesDedupSimMm /
  * QueriesStreamStore). Split from the monolithic registry for
  * maintainability — no behavior change. */
private[graft] object QueryHelpers {

  def ntz(c: Column): Column = c.cast("timestamp_ntz")
  def r6(c: Column): Column = round(c, 6)

  /** 3-habit config used by the fixture-driven transform queries
    * (mirrors the reference unit-test config,
    * `/root/reference/tests/test_transform.py:3-13`). */
  val cfg3 = EtlConfig(
    habits = Seq(
      "Workout" -> HabitSpec("workout", "bool"),
      "Meditation (Number of Minutes)" ->
        HabitSpec("meditation_minutes", "number"),
      "Mood" -> HabitSpec("mood_score", "number")),
    notesColumns = Seq("Notes"))

  /** The deterministic CDC change feed q_cdc_apply and q_cdc_stream
    * share: seq-superseded stale updates, winning updates, deletes,
    * and negative-mirror-id inserts (collision-proof against real
    * event_ids at any scale factor — testdata ids are non-negative).
    * The stale seq=1 update must lose to the seq=2 winner; the shared
    * oracle's closed form assumes exactly that. */
  def cdcFeed(ev: DataFrame): DataFrame = {
    def feedCols(value: Column, op: String, seq: Long) = Seq(
      col("user_id"), col("event_type"), value.as("value"),
      lit(op).as("op"), lit(seq).as("seq"))
    val stale = ev.filter(col("event_id") % 7 === 1)
      .select(col("event_id") +: feedCols(lit(-1d), "U", 1L): _*)
    val updates = ev.filter(col("event_id") % 7 === 1)
      .select(col("event_id") +: feedCols(col("value") + 100d, "U", 2L): _*)
    val deletes = ev.filter(col("event_id") % 7 === 2)
      .select(col("event_id") +:
        feedCols(lit(null).cast("double"), "D", 3L): _*)
    val inserts = ev.filter(col("event_id") % 7 === 3)
      .select((-col("event_id") - 1L).as("event_id") +:
        feedCols(col("value"), "I", 1L): _*)
    stale.union(updates).union(deletes).union(inserts)
  }

  /** DuckDB replay of [[graft.ext.Similarity.kcenterSelect]] at k
    * rounds: the shared global-int8 quantization, then the greedy
    * farthest-point traversal unrolled — kc$j is round j's argmax
    * under the pinned (mind DESC, vec_id) order, kd$j folds the new
    * center into every point's min distance. All-integer squared
    * distances (‖a‖² + ‖b‖² − 2a·b on BIGINT codes), so the traversal
    * replays engine-exactly. kd$j is MATERIALIZED: each generation
    * feeds both the next argmax and the next fold. */
  /** DuckDB replay of [[graft.ext.Similarity.mmrSelect]] at
    * query = vec_id 0: the [[kcenterOracle]] unrolled-greedy shape
    * with (rel − maxsim) argmax instead of farthest-point. */
}
