package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` standing in for the reference's Google
  * Sheets scan (`/root/reference/etl/etl_habits.py:11-17,44`) — the
  * "faithful extreme" noted in SURVEY §2.1 S1: an external tab of wide,
  * untyped form-response rows surfaced as a Spark table.
  *
  * Instead of HTTP (zero-egress container) it generates the tab
  * deterministically from closed-form cell math (see companion object),
  * so an external oracle can reproduce every cell. The DSv2 mechanics
  * are the real thing: schema inference, one `InputPartition` per sheet
  * "day block" (splittable, parallel scan — the Sheets API reads row
  * ranges the same way), `InternalRow` emission straight from the
  * partition reader with no driver involvement, plus the two scan
  * pushdowns that matter at scale:
  *
  *   - `SupportsPushDownFilters`: an `EqualTo("Report Date", …)`
  *     predicate prunes day-block partitions at PLANNING time — the
  *     non-matching blocks are never scheduled, the DSv2 equivalent of
  *     partition pruning on a date-partitioned store (a Sheets client
  *     would fetch only that row range).
  *   - `SupportsPushDownRequiredColumns`: the reader materializes only
  *     the projected cells, so a 2-column query does not pay for the
  *     7-column sheet (column pruning reaching the source, like
  *     parquet's `ReadSchema`).
  *
  * Options: `users` (default 5), `days` (default 20), `startdate`
  * (ISO date, default 2024-01-01).
  *
  * Usage: `spark.read.format("graft.sources.FormResponseSource")
  * .option("users", 4).load()`.
  */
class FormResponseSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FormResponseSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FormResponseTable(
      opts.getInt("users", 5),
      opts.getInt("days", 20),
      opts.getOrDefault("startdate", "2024-01-01"))
  }
}

object FormResponseSource {
  /** The sheet header row: untyped string cells, like
    * `ws.get_all_records()` returns. */
  val Columns: Seq[String] = Seq("Timestamp", "Report Date", "Email Address",
    "Workout", "Meditation (Number of Minutes)", "Mood", "Notes")
  val Schema: StructType =
    StructType(Columns.map(StructField(_, StringType, nullable = true)))

  // Closed-form deterministic cell math — mirrored in the DuckDB oracle
  // (SparkEntry.oracleSql("q_dsv2_form_source")). A mood of 10 is
  // emitted as junk text to exercise the numeric-coercion drop.
  def meditation(u: Int, d: Int): Int = (u * 7 + d * 3) % 60
  def mood(u: Int, d: Int): Int = (u + d) % 11
  def workoutYes(u: Int, d: Int): Boolean = (u + d) % 2 == 0
  def notes(d: Int): String = if (d % 3 == 0) "good day" else ""

  /** Sheet date-cell text for day index `d` (M/d/yyyy, no zero pad). */
  def dateStr(start: String, d: Int): String = {
    val date = java.time.LocalDate.parse(start).plusDays(d)
    s"${date.getMonthValue}/${date.getDayOfMonth}/${date.getYear}"
  }
}

class FormResponseTable(users: Int, days: Int, start: String)
    extends Table with SupportsRead {
  override def name(): String = s"form_responses(${users}x$days)"
  override def schema(): StructType = FormResponseSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new FormScanBuilder(users, days, start)
}

/** Scan builder holding the pushdown state Catalyst negotiates:
  * an optional pushed Report-Date equality and the pruned schema. */
class FormScanBuilder(users: Int, days: Int, start: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedDate: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FormResponseSource.Schema

  // attribute names needing quoting (the space) arrive backticked
  private def unquote(a: String): String =
    if (a.length >= 2 && a.startsWith("`") && a.endsWith("`"))
      a.substring(1, a.length - 1).replace("``", "`")
    else a

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accept ONE Report-Date equality (the partition-pruning predicate);
    // everything else stays a post-scan filter. Returning the accepted
    // filter in pushedFilters() is a correctness promise: the scan must
    // emit no row violating it — guaranteed here because a day block
    // either matches the date exactly or is never planned.
    val (accepted, rest) = filters.partition {
      case EqualTo(attr, v: String)
          if unquote(attr) == "Report Date" && pushedDate.isEmpty =>
        pushedDate = Some(v); true
      case _ => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new FormResponseScan(users, days, start, pushedDate, required)
}

class FormResponseScan(users: Int, days: Int, start: String,
    pushedDate: Option[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until days)
      .filter(d => pushedDate.forall(_ ==
        FormResponseSource.dateStr(start, d)))
      .map(d => FormDayPartition(d, users, start,
        required.fieldNames.toSeq): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FormReaderFactory
  override def description(): String =
    s"FormResponseScan pushedDate=${pushedDate.getOrElse("none")} " +
      s"columns=[${required.fieldNames.mkString(", ")}]"
}

/** One sheet "day block" — the unit of scan parallelism. `columns` is
  * the pruned projection the reader materializes. */
case class FormDayPartition(day: Int, users: Int, start: String,
    columns: Seq[String]) extends InputPartition

class FormReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[FormDayPartition]
    new PartitionReader[InternalRow] {
      private var u = -1
      private val dayDate =
        FormResponseSource.dateStr(part.start, part.day)

      override def next(): Boolean = { u += 1; u < part.users }

      // only the pruned columns are computed and emitted — cell work
      // scales with the projection, not the sheet width
      override def get(): InternalRow = {
        import FormResponseSource._
        val d = part.day
        val cells = part.columns.map {
          case "Timestamp" => s"$dayDate 0:00:00" // form-submit ts
          case "Report Date" => dayDate
          case "Email Address" => s"User$u@Example.com"
          case "Workout" => if (workoutYes(u, d)) "Yes" else "no"
          case "Meditation (Number of Minutes)" => meditation(u, d).toString
          case "Mood" => if (mood(u, d) == 10) "n/a" else mood(u, d).toString
          case "Notes" => notes(d)
        }
        InternalRow.fromSeq(cells.map(UTF8String.fromString))
      }

      override def close(): Unit = ()
    }
  }
}
