package graft

import graft.config.{EtlConfig, HabitSpec}
import graft.transform.HabitTransform
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's unpivot test
  * (`/root/reference/tests/test_transform.py`) and pins every untested
  * behavior SURVEY §5 flags: bool truthy/invert, numeric-failure skip,
  * blank skip, required-field skip, notes assembly.
  */
class TransformSpec extends AnyFunSuite with SparkTestSession {

  // The reference unit-test config (tests/test_transform.py:3-13).
  private val cfg = EtlConfig(
    habits = Seq(
      "Workout" -> HabitSpec("workout", "bool"),
      "Meditation (Number of Minutes)" -> HabitSpec("meditation_minutes", "number"),
      "Mood" -> HabitSpec("mood_score", "number")),
    notesColumns = Seq("Notes"))

  private val cols =
    Seq("Report Date", "Email Address", "Workout",
      "Meditation (Number of Minutes)", "Mood", "Notes")

  private def wide(rows: Seq[String]*): DataFrame = {
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    val data = rows.map(r => Row(r.map(v => if (v == "<null>") null else v): _*))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  private val referenceRow =
    Seq("08/20/2025", "Test@Example.com", "Yes", "25", "8", "did intervals")

  test("reference row unpivots to the 3 configured habits") {
    val ev = HabitTransform.toEvents(wide(referenceRow), cfg).collect()
    assert(ev.map(_.getAs[String]("habit")).toSet ==
      Set("workout", "meditation_minutes", "mood_score"))
    assert(ev.map(_.getAs[String]("user_email")).toSet == Set("test@example.com"))
    assert(ev.forall(!_.isNullAt(0))) // ts non-null
    assert(ev.forall(_.getAs[String]("source") == "sheets"))
  }

  test("values coerce: bool Yes -> 1.0, numbers parse") {
    val ev = HabitTransform.toEvents(wide(referenceRow), cfg).collect()
      .map(r => r.getAs[String]("habit") -> r.getAs[Double]("value")).toMap
    assert(ev == Map("workout" -> 1.0, "meditation_minutes" -> 25.0,
      "mood_score" -> 8.0))
  }

  test("notes assembly: '<col>: <val>' replicated on every event") {
    val ev = HabitTransform.toEvents(wide(referenceRow), cfg).collect()
    assert(ev.map(_.getAs[String]("notes")).toSet == Set("Notes: did intervals"))
  }

  test("empty notes -> NULL notes") {
    val ev = HabitTransform.toEvents(
      wide(Seq("08/20/2025", "a@b.com", "Yes", "25", "8", "")), cfg).collect()
    assert(ev.forall(_.isNullAt(ev.head.fieldIndex("notes"))))
  }

  test("missing date or email skips the whole row") {
    val ev = HabitTransform.toEvents(wide(
      Seq("", "a@b.com", "Yes", "25", "8", ""),
      Seq("<null>", "a@b.com", "Yes", "25", "8", ""),
      Seq("08/20/2025", "", "Yes", "25", "8", ""),
      Seq("08/20/2025", "<null>", "Yes", "25", "8", "")), cfg).collect()
    assert(ev.isEmpty)
  }

  test("blank habit cell emits no event; others on the row survive") {
    val ev = HabitTransform.toEvents(
      wide(Seq("08/20/2025", "a@b.com", "  ", "<null>", "8", "")), cfg).collect()
    assert(ev.map(_.getAs[String]("habit")).toSet == Set("mood_score"))
  }

  test("non-numeric cell in a number habit drops that event only") {
    val ev = HabitTransform.toEvents(
      wide(Seq("08/20/2025", "a@b.com", "Yes", "abc", "8", "")), cfg).collect()
    assert(ev.map(_.getAs[String]("habit")).toSet == Set("workout", "mood_score"))
  }

  test("bool truthy set is case/space-insensitive; everything else is 0.0") {
    // "yes\n" / tabbed cells: Python str.strip() strips ALL whitespace —
    // a multiline Sheets cell must not silently flip to 0.0
    for ((raw, expect) <- Seq("Yes" -> 1.0, "no" -> 0.0, "TRUE" -> 1.0,
        "1" -> 1.0, " on " -> 1.0, "t" -> 1.0, "Y" -> 1.0, "nope" -> 0.0,
        "0" -> 0.0, "false" -> 0.0, "yes\n" -> 1.0, "\ttrue\t" -> 1.0)) {
      val ev = HabitTransform.toEvents(
        wide(Seq("08/20/2025", "a@b.com", raw, "<null>", "<null>", "")), cfg)
        .collect()
      assert(ev.head.getAs[Double]("value") == expect, s"raw=$raw")
    }
  }

  test("invert flips a bool: 1 - v") {
    val inv = cfg.copy(habits = Seq("Workout" -> HabitSpec("rest_day", "bool",
      invert = true)))
    val ev = HabitTransform.toEvents(
      wide(Seq("08/20/2025", "a@b.com", "Yes", "<null>", "<null>", "")), inv)
      .collect()
    assert(ev.head.getAs[Double]("value") == 0.0)
  }

  test("numeric coercion trims whitespace and accepts scientific notation") {
    val ev = HabitTransform.toEvents(
      wide(Seq("08/20/2025", "a@b.com", "<null>", "  25.5  ", "1e1", "")), cfg)
      .collect()
      .map(r => r.getAs[String]("habit") -> r.getAs[Double]("value")).toMap
    assert(ev == Map("meditation_minutes" -> 25.5, "mood_score" -> 10.0))
  }

  test("bad date drops the row (documented deviation from raising)") {
    val ev = HabitTransform.toEvents(
      wide(Seq("garbage", "a@b.com", "Yes", "25", "8", "")), cfg).collect()
    assert(ev.isEmpty)
  }

  test("rowHash is deterministic and column-order independent") {
    import org.apache.spark.sql.functions.col
    val df1 = wide(referenceRow).select(HabitTransform.rowHash(cols).as("h"))
    val df2 = wide(referenceRow).select(cols.reverse.map(col): _*)
      .select(HabitTransform.rowHash(cols).as("h"))
    assert(df1.collect()(0).getString(0) == df2.collect()(0).getString(0))
    assert(df1.collect()(0).getString(0).matches("[0-9a-f]{64}"))
  }

  test("fromYaml on the reference's own habits.yml reproduces the " +
      "checked-in default config") {
    val ref = java.nio.file.Paths.get("/root/reference/etl/config/habits.yml")
    assume(java.nio.file.Files.isReadable(ref), "reference yml not present")
    val parsed = EtlConfig.loadYaml(ref)
    assert(parsed.timezone == EtlConfig.default.timezone)
    assert(parsed.dateColumn == EtlConfig.default.dateColumn)
    assert(parsed.emailColumn == EtlConfig.default.emailColumn)
    assert(parsed.habits == EtlConfig.defaultHabits) // order included
    assert(parsed.notesColumns == Seq("Notes"))
  }

  test("fromYaml: invert flag, defaults, comments, and missing " +
      "date_column") {
    val parsed = EtlConfig.fromYaml(
      """# minimal config
        |date_column: "When"   # trailing comment
        |habits:
        |  "Skipped (# not a comment)": { id: "skip", type: "bool", invert: true }
        |""".stripMargin)
    assert(parsed.timezone == "America/Chicago") // reference default
    assert(parsed.emailColumn == "Email Address")
    assert(parsed.notesColumns.isEmpty) // runtime default, not ["Notes"]
    assert(parsed.habits ==
      Seq("Skipped (# not a comment)" -> HabitSpec("skip", "bool", invert = true)))
    intercept[IllegalArgumentException] {
      EtlConfig.fromYaml("timezone: \"UTC\"\nhabits:\n")
    }
  }

  test("fromYaml transform parity: parsed config and checked-in config " +
      "emit identical events") {
    val ref = java.nio.file.Paths.get("/root/reference/etl/config/habits.yml")
    assume(java.nio.file.Files.isReadable(ref), "reference yml not present")
    // the parsed file has the same habits/date/email mapping, so the
    // whole unpivot pipeline must agree row for row; notesColumns also
    // matches (the shipped file carries ["Notes"]). The wide frame
    // needs every default header — the reduced `cols` set lacks 5
    val parsed = EtlConfig.loadYaml(ref)
    val allCols = Seq("Report Date", "Email Address", "Notes") ++
      EtlConfig.defaultHabits.map(_._1)
    val schema = StructType(
      allCols.map(StructField(_, StringType, nullable = true)))
    val row = Row(Seq("08/20/2025", "Test@Example.com", "did intervals",
      "7.5", "8", "8", "25", "Yes", "2", "no", "9"): _*)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema)
    val a = HabitTransform.toEvents(df, parsed).collect()
    val b = HabitTransform.toEvents(df, EtlConfig.default).collect()
    assert(a.toSeq == b.toSeq && a.length == 8)
  }
}
