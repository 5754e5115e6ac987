package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
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
  * ranges the same way), and `InternalRow` emission straight from the
  * partition reader with no driver involvement.
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
}

class FormResponseTable(users: Int, days: Int, start: String)
    extends Table with SupportsRead {
  override def name(): String = s"form_responses(${users}x$days)"
  override def schema(): StructType = FormResponseSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FormResponseScan(users, days, start)
    }
}

class FormResponseScan(users: Int, days: Int, start: String)
    extends Scan with Batch {
  override def readSchema(): StructType = FormResponseSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until days).map(d =>
      FormDayPartition(d, users, start): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FormReaderFactory
}

/** One sheet "day block" — the unit of scan parallelism. */
case class FormDayPartition(day: Int, users: Int, start: String)
    extends InputPartition

class FormReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[FormDayPartition]
    new PartitionReader[InternalRow] {
      private var u = -1
      private val date =
        java.time.LocalDate.parse(part.start).plusDays(part.day)
      private val dateStr =
        s"${date.getMonthValue}/${date.getDayOfMonth}/${date.getYear}"

      override def next(): Boolean = { u += 1; u < part.users }

      override def get(): InternalRow = {
        import FormResponseSource._
        val d = part.day
        val mo = if (mood(u, d) == 10) "n/a" else mood(u, d).toString
        val wk = if (workoutYes(u, d)) "Yes" else "no"
        InternalRow.fromSeq(Seq(
          s"$dateStr 0:00:00",            // form-submit ts (ignored column)
          dateStr,
          s"User$u@Example.com",
          wk,
          meditation(u, d).toString,
          mo,
          notes(d)).map(UTF8String.fromString))
      }

      override def close(): Unit = ()
    }
  }
}
