package graft

import graft.functions.Dates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports + extends the reference's date tests
  * (`/root/reference/tests/test_parse_date.py`) and pins every branch of
  * `parse_report_date` (`/root/reference/etl/transform.py:20-68`).
  */
class DatesSpec extends AnyFunSuite with SparkTestSession {

  private val Tz = "America/Chicago"

  /** Parse one raw string, return the UTC instant as ISO string (or null). */
  private def parse(raw: String): String = {
    import spark.implicits._
    val out = Seq(raw).toDF("s")
      .select(Dates.parseReportDate(col("s"), Tz).as("ts"))
      .collect()(0)
    if (out.isNullAt(0)) null else out.getTimestamp(0).toInstant.toString
  }

  // -- reference tests (tests/test_parse_date.py) --------------------------
  test("M/d/yyyy noon-anchors: 8/22/2025 -> 17:00Z (CDT)") {
    assert(parse("8/22/2025") == "2025-08-22T17:00:00Z")
  }

  test("Google serial 45519 = 2024-08-15 -> 17:00Z (CDT)") {
    // NB the reference test's comment claims =DATE(2025,8,22) -> 45519, but
    // 45519 is actually 2024-08-15 (DATE(2025,8,22) is 45891); the reference
    // test only asserts the HOUR so it never noticed. Noon CDT -> 17:00Z
    // holds for both.
    assert(parse("45519") == "2024-08-15T17:00:00Z")
    assert(parse("45891") == "2025-08-22T17:00:00Z")
  }

  // -- DST winter side (SURVEY §7.4 risk 1) --------------------------------
  test("winter date noon-anchors to 18:00Z (CST)") {
    assert(parse("1/15/2025") == "2025-01-15T18:00:00Z")
  }

  // -- remaining string formats --------------------------------------------
  test("ISO date-only") { assert(parse("2025-08-22") == "2025-08-22T17:00:00Z") }
  test("two-digit year") { assert(parse("8/22/25") == "2025-08-22T17:00:00Z") }
  test("zero-padded M/d") { assert(parse("08/20/2025") == "2025-08-20T17:00:00Z") }
  test("short month name") { assert(parse("Aug 22, 2025") == "2025-08-22T17:00:00Z") }
  test("long month name") { assert(parse("August 22, 2025") == "2025-08-22T17:00:00Z") }

  test("datetime yyyy-M-d H:m:s is wall time in local tz") {
    assert(parse("2025-08-22 14:30:00") == "2025-08-22T19:30:00Z")
  }
  test("datetime M/d/yyyy H:m") {
    assert(parse("8/22/2025 14:30") == "2025-08-22T19:30:00Z")
  }
  test("datetime M/d/yyyy H:m:s") {
    assert(parse("8/22/2025 14:30:05") == "2025-08-22T19:30:05Z")
  }

  // -- serial fractional-day branch ----------------------------------------
  test("serial with fraction keeps the time-of-day (no noon anchor)") {
    // 45519.25 = 06:00 local CDT = 11:00Z
    assert(parse("45519.25") == "2024-08-15T11:00:00Z")
  }
  test("serial fractional sub-second part rounds to whole seconds") {
    // .25000578 of a day = 21600.499s -> rounds down to 06:00:00
    assert(parse("45519.25000578") == "2024-08-15T11:00:00Z")
  }

  // -- ISO fallback ---------------------------------------------------------
  test("ISO datetime with T separator hits the fallback, local tz attached") {
    assert(parse("2025-08-22T14:30:00") == "2025-08-22T19:30:00Z")
  }
  test("ISO with explicit offset is respected") {
    assert(parse("2025-08-22T10:00:00+05:00") == "2025-08-22T05:00:00Z")
  }

  // -- deviation: unparseable -> null, not a crashed run --------------------
  test("garbage parses to null") { assert(parse("not a date") == null) }
  test("whitespace-only parses to null") { assert(parse("   ") == null) }

  // -- review regression pins ---------------------------------------------

  test("ISO with hour-only offset is not double-shifted") {
    assert(parse("2025-06-01T12:00:00+05") == "2025-06-01T07:00:00Z")
  }

  test("ISO with full offset, no colon") {
    assert(parse("2025-06-01T12:00:00+0500") == "2025-06-01T07:00:00Z")
  }

  test("junk all-digit cells (phone numbers, long ids) yield null, not a crash") {
    assert(parse("5551234567") == null)          // DATETIME_OVERFLOW trap
    assert(parse("99999999999999999999") == null) // CAST_OVERFLOW trap
  }

  test("serial at the valid bound still parses") {
    assert(parse("2958465") != null) // 9999-12-31
  }

  test("dates padded with tabs/newlines parse (Python strip parity)") {
    assert(parse("\t8/22/2025\n") == "2025-08-22T17:00:00Z")
  }

  test("leading/trailing whitespace is trimmed") {
    assert(parse("  8/22/2025  ") == "2025-08-22T17:00:00Z")
  }
}
