package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, NumericType, StringType, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the sink-side counterpart of
  * [[FormResponseSource]], completing the custom source/sink story with
  * the real V2 batch-commit protocol: per-partition `DataWriter`s run on
  * executors and produce `WriterCommitMessage`s, and only the driver's
  * `BatchWrite.commit` — invoked once, with every partition's message —
  * publishes the result. A failed task's partial state is simply never
  * committed (its message never reaches commit), which is the
  * all-or-nothing contract every real table format builds on.
  *
  * The sink itself is an audit ledger: it commits the row count and an
  * order-independent content digest of everything written, registered
  * under `option("runId", ...)` and read back via
  * `DigestSink.result(runId)`. The digest combines commutatively
  * (addition), so it is independent of partitioning and row order —
  * write the same data through 1 or 100 partitions and the committed
  * digest is identical (spec-pinned).
  *
  * Usage:
  * `df.write.format("graft.sources.DigestSink").option("runId", "x")
  * .mode("append").save()` — then `DigestSink.result("x")`.
  * The ledger lives on the driver (companion-object state), the natural
  * home of commit results in the V2 protocol.
  */
class DigestSink extends TableProvider {
  // write-side source: take the incoming frame's schema as-is
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new DigestTable(schema, opts.getOrDefault("runid", "default"))
  }
}

object DigestSink {
  /** One committed write: total rows, commutative digest, and how many
    * partition commit messages the driver combined. */
  case class Result(rows: Long, digest: Long, partitions: Int)

  private val ledger =
    new java.util.concurrent.ConcurrentHashMap[String, Result]()

  def result(runId: String): Option[Result] = Option(ledger.get(runId))
  def clear(runId: String): Unit = ledger.remove(runId)
  private[sources] def publish(runId: String, r: Result): Unit =
    ledger.put(runId, r)

  /** Deterministic per-row hash over the row's rendered field values,
    * position-weighted; rows combine by ADDITION so the total is
    * independent of partitioning and order. Only [[supportedType]]
    * fields are accepted (enforced at write-build time): atomic types
    * whose INTERNAL Catalyst value renders canonically — binary /
    * array / struct / map values have identity-based or non-value
    * toString and would make the digest nondeterministic. */
  def rowDigest(values: Seq[Any]): Long =
    values.zipWithIndex.map { case (v, i) =>
      (if (v == null) 0L else v.toString.hashCode.toLong) * (i + 1)
    }.sum

  private[sources] def supportedType(t: DataType): Boolean = t match {
    case _: NumericType => true
    case StringType | BooleanType | TimestampType | TimestampNTZType |
         DateType => true
    case _ => false
  }

  /** [[rowDigest]] over an EXTERNAL (driver-side) `Row`, converting
    * temporal values to the internal primitives the executor writers
    * render — the cross-check companion for audits and specs. */
  def rowDigestExternal(row: org.apache.spark.sql.Row): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    rowDigest(row.toSeq.map {
      case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
      case t: java.time.Instant => DateTimeUtils.instantToMicros(t)
      case t: java.time.LocalDateTime =>
        DateTimeUtils.localDateTimeToMicros(t)
      case d: java.sql.Date => DateTimeUtils.fromJavaDate(d)
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case v => v
    })
  }
}

class DigestTable(schema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"digest_sink($runId)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val bad = info.schema().fields.filterNot(f =>
      DigestSink.supportedType(f.dataType))
    require(bad.isEmpty,
      "DigestSink digests atomic columns only (numeric, string, boolean, " +
        s"timestamp, date); unsupported: ${bad.map(_.name).mkString(", ")}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new DigestBatchWrite(info.schema(), runId)
      }
    }
  }
}

class DigestBatchWrite(schema: StructType, runId: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory(schema)

  /** Driver-side, once, with EVERY partition's message — the atomic
    * publish point of the protocol. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.map(_.asInstanceOf[DigestCommit])
    DigestSink.publish(runId, DigestSink.Result(
      parts.map(_.rows).sum, parts.map(_.digest).sum, parts.length))
  }

  /** Nothing durable to roll back: uncommitted partials were never
    * published. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class DigestCommit(rows: Long, digest: Long) extends WriterCommitMessage

class DigestWriterFactory(schema: StructType) extends DataWriterFactory {
  private val types: Seq[DataType] = schema.fields.map(_.dataType).toSeq

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var digest = 0L
      override def write(r: InternalRow): Unit = {
        rows += 1
        digest += DigestSink.rowDigest(r.toSeq(types))
      }
      override def commit(): WriterCommitMessage = DigestCommit(rows, digest)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
