package graft.config

/** One configured habit column.
  *
  * Mirrors the reference's `HabitSpec` dataclass
  * (`/root/reference/etl/transform.py:8-12`): `id` is the normalized habit
  * name, `kind` is `"bool"` or `"number"`, `invert` flips a bool (1 - v).
  */
final case class HabitSpec(id: String, kind: String, invert: Boolean = false) {
  require(kind == "bool" || kind == "number", s"kind must be bool|number, got $kind")
}

/** Schema/config layer replacing the reference's YAML config
  * (`/root/reference/etl/config/habits.yml`). The mapping is ordered
  * (sheet header -> spec) because event emission order follows config
  * order in the reference (`/root/reference/etl/transform.py:89-112`).
  */
final case class EtlConfig(
    timezone: String = "America/Chicago",
    dateColumn: String = "Report Date",
    emailColumn: String = "Email Address",
    habits: Seq[(String, HabitSpec)] = EtlConfig.defaultHabits,
    notesColumns: Seq[String] = Seq("Notes"))

object EtlConfig {

  /** The shipped 8-habit mapping (`/root/reference/etl/config/habits.yml:9-16`). */
  val defaultHabits: Seq[(String, HabitSpec)] = Seq(
    "Sleep (Number of hours)" -> HabitSpec("sleep_hours", "number"),
    "Nutrition" -> HabitSpec("nutrition_score", "number"),
    "Mood" -> HabitSpec("mood_score", "number"),
    "Meditation (Number of Minutes)" -> HabitSpec("meditation_minutes", "number"),
    "Workout" -> HabitSpec("workout", "bool"),
    "Water (How many litres?)" -> HabitSpec("water_liters", "number"),
    "Skin Care" -> HabitSpec("skin_care", "bool"),
    "How authentically did you live this day?" -> HabitSpec("authenticity_score", "number"))

  val default: EtlConfig = EtlConfig()

  /** Truthy spellings for bool habits, lowercased
    * (`/root/reference/etl/transform.py:14`). */
  val Truthy: Seq[String] = Seq("yes", "true", "1", "y", "t", "on")

  /** Runtime config load — the reference parses its YAML at run time
    * (`/root/reference/etl/etl_habits.py:42`,
    * `yaml.safe_load(open(CFG_PATH))`); this reads the same file shape
    * into the case classes. Driver-side, file-sized — config is not a
    * Spark concern (SURVEY.md §2.1). */
  def loadYaml(path: java.nio.file.Path): EtlConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))

  /** Parse a `habits.yml`-shaped document. Not a general YAML parser —
    * exactly the subset the reference config uses (and `yaml.safe_load`
    * sees): top-level scalar keys, one `habits:` block mapping quoted
    * sheet headers to flow maps `{ id: …, type: …[, invert: …] }`, and
    * a flow list `notes_columns`. Semantics mirror the reference's
    * reads (`/root/reference/etl/transform.py:70-91`): `date_column`
    * required, `timezone`/`email_column` defaulted, absent
    * `notes_columns` is EMPTY (the runtime default, not the shipped
    * file's `["Notes"]`), habit order is file order, `type` is the
    * case-class `kind`. I/O-plumbing keys (`sheet_id`, `tab_name` —
    * modeled by the DSv2 source) are ignored. */
  def fromYaml(text: String): EtlConfig = {
    // strip comments OUTSIDE quotes, then drop blank lines
    def stripComment(line: String): String = {
      val sb = new StringBuilder
      var quote: Char = 0
      var i = 0
      var done = false
      while (i < line.length && !done) {
        val c = line.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0; sb += c }
        else if (c == '"' || c == '\'') { quote = c; sb += c }
        else if (c == '#') done = true
        else sb += c
        i += 1
      }
      sb.result()
    }
    def unquote(s0: String): String = {
      val s = s0.trim
      if (s.length >= 2 && (s.head == '"' || s.head == '\'') &&
        s.last == s.head) s.substring(1, s.length - 1)
      else s
    }
    // split on top-level commas of a flow body (no nesting in this shape)
    def flowItems(body: String): Seq[String] = {
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var quote: Char = 0
      body.foreach { c =>
        if (quote != 0) { if (c == quote) quote = 0; sb += c }
        else if (c == '"' || c == '\'') { quote = c; sb += c }
        else if (c == ',') { items += sb.result(); sb.clear() }
        else sb += c
      }
      items += sb.result()
      items.map(_.trim).filter(_.nonEmpty).toSeq
    }
    // "key: value" at the first top-level colon outside quotes
    def splitKey(s: String): (String, String) = {
      var quote: Char = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == ':') return (unquote(s.substring(0, i)),
          s.substring(i + 1).trim)
        i += 1
      }
      (unquote(s), "")
    }
    def habitSpec(flow: String): HabitSpec = {
      require(flow.startsWith("{") && flow.endsWith("}"),
        s"habit spec must be a flow map, got: $flow")
      val kv = flowItems(flow.substring(1, flow.length - 1))
        .map(splitKey).map { case (k, v) => k -> unquote(v) }.toMap
      HabitSpec(
        id = kv.getOrElse("id",
          throw new IllegalArgumentException(s"habit spec missing id: $flow")),
        kind = kv.getOrElse("type",
          throw new IllegalArgumentException(s"habit spec missing type: $flow")),
        invert = kv.get("invert").exists(_.toLowerCase == "true"))
    }

    val lines = text.split("\n", -1).map(stripComment)
      .filter(_.trim.nonEmpty)
    val scalars = scala.collection.mutable.Map.empty[String, String]
    val habits = scala.collection.mutable.ArrayBuffer.empty[(String, HabitSpec)]
    var inHabits = false
    lines.foreach { line =>
      val indented = line.startsWith(" ") || line.startsWith("\t")
      if (inHabits && indented) {
        val (header, flow) = splitKey(line.trim)
        habits += header -> habitSpec(flow)
      } else {
        inHabits = false
        val (k, v) = splitKey(line.trim)
        if (k == "habits" && v.isEmpty) inHabits = true
        else scalars(k) = v
      }
    }
    require(scalars.contains("date_column"),
      "habits.yml: date_column is required (the reference indexes it " +
        "unconditionally, transform.py:73)")
    val notes = scalars.get("notes_columns").map { v =>
      require(v.startsWith("[") && v.endsWith("]"),
        s"notes_columns must be a flow list, got: $v")
      flowItems(v.substring(1, v.length - 1)).map(unquote)
    }.getOrElse(Seq.empty)
    EtlConfig(
      timezone = scalars.get("timezone").map(unquote)
        .getOrElse("America/Chicago"),
      dateColumn = unquote(scalars("date_column")),
      emailColumn = scalars.get("email_column").map(unquote)
        .getOrElse("Email Address"),
      habits = habits.toSeq,
      notesColumns = notes)
  }
}
