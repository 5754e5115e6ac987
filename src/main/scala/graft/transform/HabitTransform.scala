package graft.transform

import graft.config.{EtlConfig, HabitSpec}
import graft.functions.Dates
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide form-response rows -> tidy habit events.
  *
  * Re-expresses `unpivot_row` (`/root/reference/etl/transform.py:71-113`)
  * as one lazy columnar plan: required-field gate, date parse, email
  * normalization, notes assembly, built-in `unpivot`, per-habit coercion.
  * The reference loops row-at-a-time on the driver; here each step is a
  * narrow (shuffle-free) projection/filter over the whole batch, so the
  * pipeline is a single WholeStageCodegen stage regardless of scale.
  */
object HabitTransform {

  /** Non-empty check matching Python falsiness on a string cell:
    * `not row.get(c)` skips only None/"" (no strip),
    * `/root/reference/etl/transform.py:77-78,85`. */
  private def present(c: Column): Column = c.isNotNull && c =!= ""

  /** Notes assembly (`/root/reference/etl/transform.py:84-87`): each
    * configured notes column with a non-empty value contributes
    * `"<col>: <val>"`; joined with `" | "`; NULL when none contribute. */
  def notesColumn(cfg: EtlConfig): Column = {
    val parts = cfg.notesColumns.map { n =>
      when(present(col(n)), concat(lit(n + ": "), col(n)))
    }
    if (parts.isEmpty) lit(null).cast("string")
    else nullif(concat_ws(" | ", parts: _*), lit(""))
  }

  /** Bool coercion + optional invert
    * (`/root/reference/etl/transform.py:96-99`). */
  def boolValue(raw: Column, invert: Boolean): Column = {
    val v = when(lower(Dates.pyTrim(raw)).isin(EtlConfig.Truthy: _*), 1.0)
      .otherwise(0.0)
    if (invert) lit(1.0) - v else v
  }

  /** Number coercion: unparseable -> NULL (caller filters), mirroring the
    * reference's `except ValueError: continue`
    * (`/root/reference/etl/transform.py:100-104`). */
  def numberValue(raw: Column): Column = try_cast_double(Dates.pyTrim(raw))

  private def try_cast_double(c: Column): Column = c.try_cast("double")

  /** Full wide->long pipeline. `wide` must carry the configured columns as
    * strings (Sheets cells are untyped). Output schema: the `habit_events`
    * shape `(ts timestamp, user_email string, habit string, value double,
    * notes string, source string)` (`/root/reference/sql/001_schema.sql:14-23`).
    */
  def toEvents(wide: DataFrame, cfg: EtlConfig = EtlConfig.default): DataFrame = {
    val dateC = col(cfg.dateColumn)
    val emailC = col(cfg.emailColumn)

    // Required-field row gate (/root/reference/etl/transform.py:77-78).
    val gated = wide.filter(present(dateC) && present(emailC))

    val withRow = gated
      .withColumn("ts", Dates.parseReportDate(dateC, cfg.timezone))
      .filter(col("ts").isNotNull) // deviation: bad date drops row, not run
      .withColumn("user_email", lower(Dates.pyTrim(emailC)))
      .withColumn("notes", notesColumn(cfg))

    // Built-in unpivot: one row x N configured habit columns -> N rows.
    val ids = Array(col("ts"), col("user_email"), col("notes"))
    val vals = cfg.habits.map { case (sheetCol, _) =>
      col(sheetCol).cast("string").as(sheetCol)
    }.toArray[Column]
    val long = withRow.unpivot(ids, vals, "sheet_col", "raw")

    // Blank-cell filter (/root/reference/etl/transform.py:93-94): Python
    // skips None or strip()=="".
    val nonBlank = long.filter(col("raw").isNotNull &&
      Dates.pyTrim(col("raw")) =!= "")

    // sheet_col -> (habit id, coerced value) via a chained CASE over the
    // (tiny, config-sized) habit mapping — stays inside codegen; no join.
    val habitId = cfg.habits.foldLeft(lit(null).cast("string")) {
      case (acc, (sheetCol, spec)) =>
        when(col("sheet_col") === sheetCol, lit(spec.id)).otherwise(acc)
    }
    val value = cfg.habits.foldLeft(lit(null).cast("double")) {
      case (acc, (sheetCol, spec)) =>
        val v = if (spec.kind == "bool") boolValue(col("raw"), spec.invert)
                else numberValue(col("raw"))
        when(col("sheet_col") === sheetCol, v).otherwise(acc)
    }

    nonBlank
      .withColumn("habit", habitId)
      .withColumn("value", value)
      .filter(col("value").isNotNull) // numeric-coercion event drop (P3)
      .select(col("ts"), col("user_email"), col("habit"), col("value"),
        col("notes"), lit("sheets").as("source"))
  }

  /** Content hash of a row over `cols`, sorted by column name — the
    * dedup key of the raw landing zone (`/root/reference/etl/transform.py:16-18`,
    * `/root/reference/sql/001_schema.sql:8`). Hex SHA-256 of the JSON
    * struct; byte parity with Python's `json.dumps` is intentionally NOT
    * promised (SURVEY.md §2.3 F1) — the contract is deterministic
    * same-row => same-hash.
    */
  def rowHash(cols: Seq[String]): Column =
    sha2(to_json(struct(cols.sorted.map(col): _*)), 256)

  /** JSON payload of the raw row (`/root/reference/etl/etl_habits.py:29`). */
  def payloadJson(cols: Seq[String]): Column =
    to_json(struct(cols.sorted.map(col): _*))
}
