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
}
