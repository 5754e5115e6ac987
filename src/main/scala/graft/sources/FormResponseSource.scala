package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
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

  /** One sheet cell as text — the single source of truth for row
    * readers AND the pushed-aggregate reader (which folds over cells
    * without ever materializing rows). */
  def cell(column: String, u: Int, d: Int, dayDate: String): String =
    column match {
      case "Timestamp" => s"$dayDate 0:00:00" // form-submit ts
      case "Report Date" => dayDate
      case "Email Address" => s"User$u@Example.com"
      case "Workout" => if (workoutYes(u, d)) "Yes" else "no"
      case "Meditation (Number of Minutes)" => meditation(u, d).toString
      case "Mood" => if (mood(u, d) == 10) "n/a" else mood(u, d).toString
      case "Notes" => notes(d)
    }

  /** Aggregate functions this source evaluates at the scan
    * ([[FormScanBuilder]]'s `SupportsPushDownAggregates`). */
  sealed trait PushedAggFunc extends Serializable
  case object CountStarFunc extends PushedAggFunc
  final case class MinFunc(column: String) extends PushedAggFunc
  final case class MaxFunc(column: String) extends PushedAggFunc
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  import FormResponseSource.{CountStarFunc, MaxFunc, MinFunc, PushedAggFunc}

  private var pushedDate: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FormResponseSource.Schema
  private var pushedAgg: Option[(Seq[String], Seq[PushedAggFunc])] = None
  private var pushedLimit: Option[Int] = None

  /** LIMIT reaches the reader: each day block stops generating after
    * `limit` cells-worth of rows (PARTIAL pushdown — Spark keeps the
    * final global limit; a source with one surviving partition, e.g.
    * under a pushed date, then materializes exactly `limit` rows). */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit); true
  }
  override def isPartiallyPushed(): Boolean = true

  // attribute names needing quoting (the space) arrive backticked
  private def unquote(a: String): String =
    if (a.length >= 2 && a.startsWith("`") && a.endsWith("`"))
      a.substring(1, a.length - 1).replace("``", "`")
    else a

  /** Translate the connector [[Aggregation]] into this source's terms:
    * group-by columns must be top-level field references, functions
    * must be COUNT(*) / MIN(col) / MAX(col). Returns None when any
    * piece falls outside that (Spark then aggregates above a row
    * scan as usual). */
  private def translate(agg: Aggregation)
      : Option[(Seq[String], Seq[PushedAggFunc])] = {
    def ref(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val groups = agg.groupByExpressions.toSeq.map(ref)
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(CountStarFunc)
      case m: Min => ref(m.column).map(MinFunc)
      case m: Max => ref(m.column).map(MaxFunc)
      case _: AggregateFunc => None
    }
    if (groups.forall(_.isDefined) && funcs.nonEmpty &&
        funcs.forall(_.isDefined) &&
        (groups.isEmpty || groups.flatten == Seq("Report Date")))
      Some((groups.flatten, funcs.flatten))
    else None
  }

  /** Complete (final-result) pushdown is only claimed when grouping by
    * Report Date: a group is then exactly one day block — one input
    * partition — so per-partition aggregation IS the final answer.
    * Global (no-group) aggregates are still accepted by
    * [[pushAggregation]] but as PARTIAL results (one partial row per
    * day block) that Spark's final aggregate merges — count partials
    * sum, min/max partials fold. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).exists { case (groups, _) => groups.nonEmpty }

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some(t) => pushedAgg = Some(t); true
      case None => false
    }

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
    new FormResponseScan(users, days, start, pushedDate, required,
      pushedAgg, pushedLimit)
}

class FormResponseScan(users: Int, days: Int, start: String,
    pushedDate: Option[String], required: StructType,
    pushedAgg: Option[(Seq[String], Seq[FormResponseSource.PushedAggFunc])]
      = None,
    pushedLimit: Option[Int] = None)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {
  import FormResponseSource.{CountStarFunc, MaxFunc, MinFunc}

  // with a pushed aggregation the scan's rows ARE the (per-partition)
  // aggregate results: group columns first, then one column per
  // function — the layout Spark's V2 pushdown rule expects
  override def readSchema(): StructType = pushedAgg match {
    case Some((groups, funcs)) =>
      StructType(
        groups.map(StructField(_, StringType, nullable = true)) ++
          funcs.zipWithIndex.map {
            case (CountStarFunc, i) =>
              StructField(s"count_star_$i", LongType, nullable = false)
            case (MinFunc(c), i) =>
              StructField(s"min_${c}_$i", StringType, nullable = true)
            case (MaxFunc(c), i) =>
              StructField(s"max_${c}_$i", StringType, nullable = true)
          })
    case None => required
  }
  override def toBatch: Batch = this

  // runtime (DPP-style) pruning state: dates admitted by a runtime
  // filter delivered just before execution, None = no runtime filter
  @volatile private var runtimeDates: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("`Report Date`"))

  /** Runtime filters arrive AFTER planning but before partition
    * enumeration (dynamic partition pruning: e.g. the distinct build
    * keys of a join). Only Report-Date In/EqualTo prune; anything else
    * is ignored — runtime filtering is an optimization, Spark still
    * applies the full predicate above the scan. */
  override def filter(filters: Array[Filter]): Unit = {
    val dates = filters.collect {
      case org.apache.spark.sql.sources.In(attr, vs)
          if stripQuotes(attr) == "Report Date" =>
        vs.collect { case s: String => s }.toSet
      case EqualTo(attr, v: String) if stripQuotes(attr) == "Report Date" =>
        Set(v)
    }
    if (dates.nonEmpty)
      runtimeDates = Some(dates.reduce(_ intersect _))
  }

  private def stripQuotes(a: String): String =
    if (a.length >= 2 && a.startsWith("`") && a.endsWith("`"))
      a.substring(1, a.length - 1).replace("``", "`")
    else a

  private def liveDays: Seq[Int] =
    (0 until days)
      .filter(d => pushedDate.forall(_ ==
        FormResponseSource.dateStr(start, d)))
      .filter(d => runtimeDates.forall(_.contains(
        FormResponseSource.dateStr(start, d))))

  override def planInputPartitions(): Array[InputPartition] =
    (pushedAgg match {
      case Some((groups, funcs)) =>
        liveDays.map(d =>
          FormDayAggPartition(d, users, start, groups, funcs): InputPartition)
      case None =>
        liveDays.map(d => FormDayPartition(d, users, start,
          required.fieldNames.toSeq, pushedLimit): InputPartition)
    }).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FormReaderFactory

  /** Storage-partitioned-join reporting: the day blocks ARE an
    * identity partitioning on Report Date, so when that column
    * survives into the scan output Spark can plan joins and
    * aggregations keyed on it with NO exchange on this side (each
    * partition carries its key via [[HasPartitionKey]]; enable
    * `spark.sql.sources.v2.bucketing.enabled`). Pruned-away key or an
    * ungrouped pushed aggregate → Unknown, never a false promise. */
  override def outputPartitioning(): Partitioning = {
    val keyVisible = readSchema().fieldNames.contains("Report Date")
    if (keyVisible)
      new KeyGroupedPartitioning(
        // Expressions.identity PARSES the name — the space needs the
        // quoted-identifier form
        Array(Expressions.identity("`Report Date`")), liveDays.size)
    else new UnknownPartitioning(liveDays.size)
  }

  override def description(): String =
    s"FormResponseScan pushedDate=${pushedDate.getOrElse("none")} " +
      s"columns=[${required.fieldNames.mkString(", ")}]" +
      pushedAgg.map { case (g, f) =>
        s" pushedAggregates=[${f.mkString(", ")}]" +
          s" groupedBy=[${g.mkString(", ")}]"
      }.getOrElse("") +
      pushedLimit.map(l => s" pushedLimit=$l").getOrElse("")
}

/** One sheet "day block" — the unit of scan parallelism. `columns` is
  * the pruned projection the reader materializes. Carries its Report
  * Date as the partition key for storage-partitioned joins. */
case class FormDayPartition(day: Int, users: Int, start: String,
    columns: Seq[String], limit: Option[Int] = None)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(FormResponseSource.dateStr(start, day))))
}

/** A day block under a pushed aggregation: the reader folds the
  * block's cells into ONE pre-aggregated row — grouped by Report Date
  * that row is final (a group never spans day blocks); ungrouped it is
  * the partial Spark's final aggregate merges. */
case class FormDayAggPartition(day: Int, users: Int, start: String,
    groups: Seq[String], funcs: Seq[FormResponseSource.PushedAggFunc])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(FormResponseSource.dateStr(start, day))))
}

class FormReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case part: FormDayPartition => rowReader(part)
      case part: FormDayAggPartition => aggReader(part)
    }

  private def rowReader(part: FormDayPartition)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var u = -1
      private val cap = part.limit.fold(part.users)(_.min(part.users))
      private val dayDate =
        FormResponseSource.dateStr(part.start, part.day)

      override def next(): Boolean = { u += 1; u < cap }

      // only the pruned columns are computed and emitted — cell work
      // scales with the projection, not the sheet width
      override def get(): InternalRow =
        InternalRow.fromSeq(part.columns.map(c => UTF8String.fromString(
          FormResponseSource.cell(c, u, part.day, dayDate))))

      override def close(): Unit = ()
    }

  private def aggReader(part: FormDayAggPartition)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      import FormResponseSource.{CountStarFunc, MaxFunc, MinFunc}
      private var emitted = false
      private val dayDate =
        FormResponseSource.dateStr(part.start, part.day)

      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }

      // the aggregate folds over closed-form cells — no row is ever
      // materialized, the DSv2 analog of a server-side summary call
      override def get(): InternalRow = {
        def colValues(c: String): Seq[String] =
          (0 until part.users)
            .map(u => FormResponseSource.cell(c, u, part.day, dayDate))
        val groupCells = part.groups.map(g =>
          UTF8String.fromString(
            FormResponseSource.cell(g, 0, part.day, dayDate)))
        val aggCells = part.funcs.map {
          case CountStarFunc => java.lang.Long.valueOf(part.users.toLong)
          case MinFunc(c) => UTF8String.fromString(colValues(c).min)
          case MaxFunc(c) => UTF8String.fromString(colValues(c).max)
        }
        InternalRow.fromSeq(groupCells ++ aggCells)
      }

      override def close(): Unit = ()
    }
}
