package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format report-date normalization.
  *
  * Re-expresses the reference's `parse_report_date`
  * (`/root/reference/etl/transform.py:20-68`) as a pure `Column => Column`
  * coalesce chain — every branch is built-in, codegen-friendly expression
  * work; no UDF, so Catalyst can constant-fold / push the whole thing into
  * WholeStageCodegen.
  *
  * Branch precedence (identical to the reference):
  *   1. Google/Excel serial number: days since 1899-12-30 local + fractional
  *      day as `round(frac * 86400)` seconds; a zero-seconds serial is a
  *      date-only value and anchors to 12:00 LOCAL
  *      (`/root/reference/etl/transform.py:26-34`).
  *   2. Date-only strings `M/d/yyyy`, `yyyy-M-d`, `M/d/yy` — noon-local
  *      anchor (`:39-45`).
  *   3. Month-name strings `MMM d, yyyy`, `MMMM d, yyyy` — noon-local
  *      anchor (`:48-54`).
  *   4. Datetime strings `yyyy-M-d H:m:s`, `M/d/yyyy H:m`,
  *      `M/d/yyyy H:m:s` — wall time in the local tz (`:57-62`).
  *   5. ISO-8601 fallback; attach local tz when the string carries no
  *      offset (`:65-68`).
  *
  * The noon anchor exists to dodge DST cliffs (reference README.md:215);
  * the contract is pinned by `/root/reference/tests/test_parse_date.py`
  * (noon America/Chicago == 17:00Z in CDT).
  *
  * Documented deviations from the reference:
  *   - Unparseable input yields NULL instead of raising (a bad cell kills
  *     the whole reference run; here it drops only that row — filter
  *     downstream).
  *   - `"8/22/25"` parses as 2025 (strict 4-digit `yyyy` falls through to
  *     the `yy` format) where Python's `%Y` would accept year 25.
  */
object Dates {

  /** Python-`str.strip()` parity trim: Unicode whitespace at both ends
    * (tabs, newlines, NBSP, ...), not just ASCII space like Spark's
    * `trim`. Multiline/padded Sheets cells otherwise flip bool values
    * ('yes\n' not in the truthy set) and drop parseable dates. */
  def pyTrim(c: Column): Column =
    regexp_replace(c, "^[\\p{IsWhite_Space}]+|[\\p{IsWhite_Space}]+$", "")

  private val SerialRe = "^-?\\d+(\\.\\d+)?$"

  /** Zone designators Spark's ISO parser honors: 'Z', numeric offsets
    * with or without minutes/colon ('+05', '+0500', '+05:00'), named
    * zones ('UTC', 'GMT'), and region ids ('America/Chicago'). If one is
    * present the parsed instant must NOT be re-interpreted in the local
    * tz — doing so would apply the offset twice. */
  private val OffsetRe =
    "(Z|z|[+-]\\d{2}(:?\\d{2})?|UTC|GMT|[A-Za-z_]+/[A-Za-z_]+)\\s*$"

  /** Google/Excel serial bounds: 9999-12-31 is serial 2958465; anything
    * outside [-693593, 2958465] (year 1..9999) is junk digits (phone
    * numbers, ids) — without this guard a 10-digit cell doesn't fall
    * through to the other branches, it ABORTS the whole job with a
    * DATETIME_OVERFLOW under Spark 4's default ANSI mode (violating the
    * null-not-crash contract below). */
  private val SerialMin = -693593.0
  private val SerialMax = 2958465.0

  /** Interpret `wall` (a timestamp holding LOCAL wall-clock fields) in
    * `tz` and return the UTC instant. */
  private def wallToUtc(wall: Column, tz: String): Column =
    to_utc_timestamp(wall, tz)

  private def noon(wall: Column): Column =
    date_trunc("DAY", wall) + expr("INTERVAL 12 HOURS")

  /** Serial branch: 1899-12-30 + whole days + round(frac*86400) seconds of
    * wall-clock arithmetic in the local tz (Python tz-aware datetime +
    * timedelta is wall-clock arithmetic; `astimezone` resolves afterward).
    * Python `round` is banker's rounding — `bround` matches. */
  private def serialBranch(s: Column, tz: String): Column = {
    val num = s.try_cast("double")
    val whole = num.cast("long") // trunc-toward-zero, same as Python int()
    val secs = bround((num - whole) * lit(86400.0), 0).cast("long")
    val base = to_timestamp(lit("1899-12-30 00:00:00"))
    val wall = timestamp_add("SECOND", secs, timestamp_add("DAY", whole, base))
    val anchored = when(secs === 0L, noon(wall)).otherwise(wall)
    when(s.rlike(SerialRe) &&
      num.between(lit(SerialMin), lit(SerialMax)), wallToUtc(anchored, tz))
  }

  private def dateOnly(s: Column, fmt: String, tz: String): Column =
    wallToUtc(noon(try_to_timestamp(s, lit(fmt))), tz)

  private def dateTime(s: Column, fmt: String, tz: String): Column =
    wallToUtc(try_to_timestamp(s, lit(fmt)), tz)

  /** ISO fallback: respect an explicit offset; otherwise the naive wall
    * time is interpreted in the local tz. (Session tz is UTC, so a naive
    * parse yields the wall fields unchanged.) */
  private def isoBranch(s: Column, tz: String): Column =
    when(s.rlike(OffsetRe), try_to_timestamp(s))
      .otherwise(wallToUtc(try_to_timestamp(s), tz))

  /** The reference-parity parser. `s` may be any string cell (serials
    * arrive as digit strings from CSV where Python saw numerics). */
  def parseReportDate(s: Column, tz: String): Column = {
    val t = pyTrim(s)
    coalesce(
      serialBranch(t, tz),
      dateOnly(t, "M/d/yyyy", tz),
      dateOnly(t, "yyyy-M-d", tz),
      dateOnly(t, "M/d/yy", tz),
      dateOnly(t, "MMM d, yyyy", tz),
      dateOnly(t, "MMMM d, yyyy", tz),
      dateTime(t, "yyyy-M-d H:m:s", tz),
      dateTime(t, "M/d/yyyy H:m", tz),
      dateTime(t, "M/d/yyyy H:m:s", tz),
      isoBranch(t, tz))
  }
}
