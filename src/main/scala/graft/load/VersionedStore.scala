package graft.load

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot store with time travel — the lakehouse
  * transaction-log idea (Delta/Iceberg) reduced to its load-bearing
  * core: immutable data files plus a manifest log that says which
  * files are live at each version.
  *
  * Layout under `path/`:
  *   - `data/c<N>/_vday=<day>/part-*.parquet` — files written by
  *     commit N, day-partitioned like [[EventStore]] (one sorted file
  *     per day per commit; `ts` stays a data column so readers never
  *     depend on directory structure).
  *   - `_log/<N>.manifest` — one line per live file: `<relative path>`.
  *     A version IS its manifest; nothing else is consulted at read
  *     time.
  *
  * Commit protocol: publishing version N is a CREATE-IF-ABSENT of
  * `_log/<N>.manifest` — `FileSystem.create(path, overwrite = false)`
  * throws when the file exists, so two writers racing to commit the
  * same version cannot both win; the loser gets a conflict error and
  * must rebase (optimistic concurrency, the Delta protocol's core —
  * rename-if-absent is NOT the primitive here because Hadoop's local
  * filesystem rename happily replaces an existing destination). A
  * terminating `#end` sentinel line guards torn reads: a manifest
  * still being written fails loudly instead of yielding a partial
  * file list (on an object store the equivalent is an atomic
  * put-if-absent of the whole object). Data files are written BEFORE
  * the manifest, so a crashed commit leaves only unreferenced files
  * (garbage, never corruption); readers of any published version see
  * immutable files only.
  *
  * Scale notes (100 TB): a snapshot read costs one driver-side
  * manifest read (O(live files) metadata) and scans only listed files
  * — no directory listing of the whole store, the expensive operation
  * on object stores. [[VersionedStore.upsert]] is partition-scoped
  * copy-on-write: only day partitions the batch intersects are
  * rewritten; every other file is carried into the new manifest by
  * reference. The manifest here is a full per-version file list —
  * at extreme file counts the production move is Delta's delta-log +
  * periodic checkpoint compaction, which changes the log encoding but
  * none of the commit/read semantics. Day-scoped FILE PRUNING rides
  * the manifest: a time-bounded read selects matching `_vday=` entries
  * before Spark ever opens a footer.
  */
object VersionedStore {

  private val DayDir = "_vday"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(path: String) = new Path(path, "_log")

  private def manifestPath(path: String, v: Int) =
    new Path(logDir(path), f"$v%010d.manifest")

  /** Live versions, ascending. Driver-side metadata listing of `_log`
    * only — never the data tree. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark, path)
    if (!f.exists(logDir(path))) Seq.empty
    else f.listStatus(logDir(path)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toInt).sorted
  }

  private val EndSentinel = "#end"

  private def readLines(spark: SparkSession, path: String,
      v: Int): Seq[String] = {
    val in = fs(spark, path).open(manifestPath(path, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    require(lines.lastOption.contains(EndSentinel),
      s"VersionedStore: torn manifest read for version $v at $path — " +
        "a commit is mid-write or was interrupted; retry or repair")
    lines.init
  }

  private def readManifest(spark: SparkSession, path: String,
      v: Int): Seq[String] =
    readLines(spark, path, v).filterNot(_.startsWith("#"))

  /** Commit metadata recorded with version `v` (`#k=v` manifest
    * lines) — e.g. the streaming batch id used for exactly-once
    * ingest dedup. */
  def commitMeta(spark: SparkSession, path: String,
      v: Int): Map[String, String] =
    readLines(spark, path, v).filter(_.startsWith("#"))
      .map(_.stripPrefix("#").split("=", 2))
      .collect { case Array(k, value) => k -> value }.toMap

  // ── Log-recorded snapshot schema ────────────────────────────────────
  // Schema is log metadata, not something rediscovered from data files
  // (the Delta/Iceberg move): each commit records the version's merged
  // read schema under a reserved meta key, and every read plans with
  // it directly — zero footer opens at planning, at any file count.
  // Stores written before this key existed fall back to a mergeSchema
  // footer pass, so old logs stay readable.

  private val SchemaKey = "schema"

  private def recordedSchema(spark: SparkSession, path: String,
      v: Int): Option[org.apache.spark.sql.types.StructType] =
    commitMeta(spark, path, v).get(SchemaKey).flatMap { j =>
      try Some(org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      catch { case _: Exception => None }
    }

  /** Name-based widen: `prev`'s columns in order, then `written`'s new
    * ones. The store never retypes a column, so first-type-wins is the
    * whole conflict story. */
  private def mergeSchemas(prev: org.apache.spark.sql.types.StructType,
      written: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val have = prev.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      prev.fields ++ written.fields.filterNot(f => have(f.name)))
  }

  /** Caller meta + the version's recorded schema: the previous
    * version's recorded schema (if any) widened by what this commit
    * writes. */
  private def schemaMeta(spark: SparkSession, path: String,
      prevV: Option[Int],
      written: org.apache.spark.sql.types.StructType,
      meta: Map[String, String]): Map[String, String] = {
    require(!meta.contains(SchemaKey),
      s"VersionedStore: commit meta key '$SchemaKey' is reserved")
    val s = prevV.flatMap(recordedSchema(spark, path, _))
      .map(mergeSchemas(_, written)).getOrElse(written)
    meta + (SchemaKey -> s.json)
  }

  /** Schema ENFORCEMENT for non-evolving commits (the Delta write
    * contract): a batch column the log knows must keep its exact type;
    * a column the log does NOT know is rejected unless the caller
    * opted into evolution — silent drift becomes a loud commit-time
    * error instead of a corrupted snapshot. Absent batch columns are
    * fine (the file just won't carry them; reads surface null).
    * Pre-schema-key logs have nothing to enforce against. */
  private def enforceSchema(spark: SparkSession, path: String,
      prevV: Int, batch: org.apache.spark.sql.types.StructType,
      evolve: Boolean): Unit =
    recordedSchema(spark, path, prevV).foreach { rec =>
      val known = rec.fields.map(f => f.name -> f.dataType).toMap
      batch.fields.foreach { f =>
        known.get(f.name) match {
          case Some(dt) => require(dt == f.dataType,
            s"VersionedStore: column ${f.name} is ${dt.simpleString} " +
              s"in the log but the batch carries ${f.dataType.simpleString}" +
              " — the store never retypes a column")
          case None => require(evolve,
            s"VersionedStore: batch carries unknown column ${f.name} — " +
              "pass evolve = true to widen the schema deliberately")
        }
      }
    }

  /** Version `v`'s relation when its manifest lists NO live files — a
    * LEGAL state, not corruption: a `delete`/`mergeInto` that removes
    * every row publishes an empty version, and SQL semantics say the
    * table reads as zero rows afterwards. Plans as the empty relation
    * under the log-recorded schema; pre-schema-key logs have no schema
    * to plan with, so they keep the loud error. */
  private def emptySnapshot(spark: SparkSession, path: String,
      v: Int): DataFrame = {
    val s = recordedSchema(spark, path, v).getOrElse(throw
      new IllegalArgumentException(s"VersionedStore: version $v has no " +
        "data files and no recorded schema (pre-schema-key log)"))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
  }

  /** Read `files` of version `v` under the log-recorded schema when
    * present (missing columns in older files surface as null), else
    * a mergeSchema footer pass. Empty `files` keeps the schema and
    * reads nothing (`all` donates it on the fallback path). */
  private def readFiles(spark: SparkSession, path: String, v: Int,
      files: Seq[String], all: Seq[String]): DataFrame = {
    val reader = recordedSchema(spark, path, v) match {
      case Some(s) => spark.read.schema(s)
      case None => spark.read.option("mergeSchema", "true")
    }
    if (files.isEmpty && all.isEmpty) emptySnapshot(spark, path, v)
    else if (files.isEmpty)
      reader.parquet(all.map(fl => s"$path/$fl"): _*).limit(0)
    else reader.parquet(files.map(fl => s"$path/$fl"): _*)
  }

  /** Publish version `v` with exactly `files` live. Create-if-absent
    * is the commit point: a concurrent writer that already published
    * `v` makes this fail loudly — rebase and retry, never overwrite.
    * (`private[graft]` so the spec can drive the conflict primitive
    * directly — the interleaving is unreachable from the public API
    * without a second process.) */
  private[graft] def writeManifest(spark: SparkSession, path: String, v: Int,
      files: Seq[String], meta: Map[String, String] = Map.empty): Unit = {
    require(files.forall(!_.startsWith("#")),
      "VersionedStore: file paths must not start with '#'")
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    val out =
      try f.create(manifestPath(path, v), false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"VersionedStore: commit conflict publishing version $v at " +
              s"$path — another writer won; rebase on the new head and " +
              "retry", e)
      }
    val metaLines = meta.toSeq.sortBy(_._1).map { case (k, value) =>
      require(!k.contains("=") && !(k + value).contains("\n"),
        s"VersionedStore: malformed commit meta $k")
      s"#$k=$value"
    }
    try out.write(
      (files.sorted ++ metaLines :+ EndSentinel).mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Write a batch as commit `v`'s data files (day-partitioned, sorted
    * within day for row-group skipping) and return their store-relative
    * paths. One shuffle on the day key.
    *
    * `rangeParts > 0` range-clusters on (day, leading sort col) into
    * that many tasks instead of hashing on day alone: a day then splits
    * into several files, each covering a contiguous range of the
    * leading sort column — the layout that makes [[snapshotWhere]]'s
    * zone-map skipping bite (at 100 TB a day is MANY files; without
    * clustering every file spans the whole key domain and no file-level
    * stat can exclude anything). After the write, per-file min/max of
    * the leading sort column lands in the commit's `_log/<v>.stats`
    * sidecar, lifted straight from the parquet footers the write just
    * produced — metadata reads only, no second pass over data. */
  /** Physical layout of one commit's files. `rangeParts` range-
    * partitions on (day, leading sort col) — contiguous DAY blocks, so
    * interior days land in ONE file spanning the full cluster range
    * (day-scan-friendly, weak zone maps). `clusterParts` instead
    * range-partitions on the cluster key ALONE (the leading sort col,
    * or `zorderBy`'s Morton key when given), so EVERY day splits into
    * `clusterParts` cluster-range files and zone maps turn selective —
    * at the price of days × clusterParts files per commit (size the
    * knob to per-day volume; [[compact]] re-lays accreted days).
    * `zorderBy` (see [[Layout.zValue]]) clusters each file into a
    * (x, y) RECTANGLE, so the per-file min/max of BOTH dimension
    * columns tighten and `snapshotWhere` prunes on either. */
  private def writeData(batch: DataFrame, path: String, v: Int,
      sortCols: Seq[String], rangeParts: Int = 0,
      bloomCols: Seq[String] = Nil, clusterParts: Int = 0,
      zorderBy: Option[org.apache.spark.sql.Column] = None): Seq[String] = {
    val spark = batch.sparkSession
    val dir = s"$path/data/c$v"
    val dayed = batch.withColumn(DayDir, to_date(col("ts")))
    val clusterKey = zorderBy.getOrElse(col(sortCols.head))
    val parted =
      if (clusterParts > 0)
        dayed.repartitionByRange(clusterParts, clusterKey)
      else if (rangeParts > 0)
        dayed.repartitionByRange(rangeParts, col(DayDir),
          col(sortCols.head))
      else dayed.repartition(col(DayDir))
    val sorted = zorderBy match {
      case Some(z) => parted.sortWithinPartitions(col(DayDir), z)
      case None => parted.sortWithinPartitions(sortCols.map(col): _*)
    }
    val writer = bloomCols.foldLeft(
      sorted.write.mode("errorifexists")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", "100000")
    }
    writer.partitionBy(DayDir).parquet(dir)
    val f = fs(spark, path)
    val root = new Path(path).toUri.getPath
    val it = f.listFiles(new Path(dir), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-"))
        out += st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
    }
    writeStats(spark, path, v, out.toSeq)
    out.toSeq
  }

  // ── Zone-map sidecars: per-file min/max of every eligible column ──

  private def statsPath(path: String, v: Int) =
    new Path(logDir(path), f"$v%010d.stats")

  /** Record per-file (min, max) of EVERY eligible column (integral or
    * string, top-level primitive) for commit `v`'s files, lifted from
    * the PARQUET FOOTERS the write just produced — no re-read of data
    * pages, just O(files) driver-side footer opens on a small pool
    * (the Delta/Iceberg stats-collection move: Delta records stats for
    * the first 32 columns; the footer is already open, so extra
    * columns cost only sidecar bytes here). Written BEFORE the
    * manifest publishes, so a crash leaves an unreferenced sidecar,
    * never a version without one it needs — and a missing/torn sidecar
    * only disables pruning ([[readStats]] returns None), it cannot
    * affect correctness. A (file, column) whose footer lacks usable
    * stats (all-null, truncated binary stats, unexpected type) gets no
    * line and never prunes.
    *
    * Sidecar v2 line: `file<TAB>col<TAB>kind<TAB>min<TAB>max` under a
    * `#v=2` header; v1 sidecars (single `#col=`/`#kind=` headers,
    * 3-field lines) written by earlier commits still read. */
  private def writeStats(spark: SparkSession, path: String, v: Int,
      relFiles: Seq[String]): Unit = {
    if (relFiles.isEmpty) return
    val conf = spark.sessionState.newHadoopConf()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val lines = Await.result(
      Future.traverse(relFiles.sorted)(rel =>
        Future(statLines(path, rel, conf))),
      Duration.Inf).flatten
    if (lines.isEmpty) return
    val out = fs(spark, path).create(statsPath(path, v), true)
    try out.write(("#v=2" +: lines :+ EndSentinel)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Footer-derived v2 stat lines for one data file: one line per
    * eligible column with usable stats in every row group. */
  private def statLines(path: String, rel: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import scala.jdk.CollectionConverters._
    val rd = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(s"$path/$rel"), conf))
    try {
      val md = rd.getFooter.getFileMetaData.getSchema
      val blocks = rd.getFooter.getBlocks.asScala
      // the file's exact row count rides as the pseudo-column `#rows`
      // (a real column can never be named that — `#` marks headers in
      // the sidecar grammar, but lines split on TAB, so the value
      // position is unambiguous); it powers metadata-only COUNT(*)
      val rowCount = blocks.map(_.getRowCount).sum
      Seq(s"$rel\t#rows\tlong\t$rowCount\t$rowCount") ++
        md.getFields.asScala.toSeq.flatMap { t =>
        val kind =
          if (!t.isPrimitive) None
          else (t.asPrimitiveType().getPrimitiveTypeName,
              t.getLogicalTypeAnnotation) match {
            // plain ints only — timestamp-annotated INT64 carries
            // engine-dependent units; timestamps ride day pruning
            case (PrimitiveTypeName.INT64 | PrimitiveTypeName.INT32,
                null | (_: LogicalTypeAnnotation.IntLogicalTypeAnnotation))
              => Some("long")
            case (PrimitiveTypeName.BINARY,
                _: LogicalTypeAnnotation.StringLogicalTypeAnnotation)
              => Some("string")
            // parquet double stats exclude NaN from min/max; that is
            // still one-sided-safe for pruning: under Spark's ordering
            // NaN exceeds every real, so a NaN row cannot satisfy a
            // finite BETWEEN and losing it to a prune is impossible.
            // A NaN min/max (all-NaN block) is dropped below via the
            // enc null path, keeping the file unprunable.
            case (PrimitiveTypeName.DOUBLE, null) => Some("double")
            case _ => None
          }
        kind.flatMap { k =>
          val statCol = t.getName
          val stats = blocks.map(
            _.getColumns.asScala
              .find(_.getPath.toDotString == statCol)
              .map(_.getStatistics).orNull)
          if (stats.isEmpty || stats.exists(s =>
            s == null || !s.hasNonNullValue)) None
          else {
            def enc(g: org.apache.parquet.column.statistics.Statistics[_],
                mx: Boolean): String = g.genericGetMin match {
              case _: java.lang.Long | _: java.lang.Integer =>
                (if (mx) g.genericGetMax else g.genericGetMin).toString
              case d: java.lang.Double =>
                val v = if (mx)
                  g.genericGetMax.asInstanceOf[java.lang.Double] else d
                // Double.toString round-trips exactly through parseDouble
                if (v.isNaN) null else v.toString
              case b: org.apache.parquet.io.api.Binary =>
                (if (mx) g.genericGetMax.asInstanceOf[
                    org.apache.parquet.io.api.Binary]
                  else b).toStringUsingUTF8
              case _ => null
            }
            val mns = stats.map(enc(_, mx = false))
            val mxs = stats.map(enc(_, mx = true))
            if (mns.contains(null) || mxs.contains(null)) None
            else {
              val (mn, mx) =
                if (k == "long")
                  (mns.map(_.toLong).min.toString,
                    mxs.map(_.toLong).max.toString)
                else if (k == "double")
                  (mns.map(_.toDouble).min.toString,
                    mxs.map(_.toDouble).max.toString)
                else (mns.min, mxs.max)
              if ((rel + statCol + mn + mx).exists(c =>
                c == '\t' || c == '\n')) None
              else Some(s"$rel\t$statCol\t$k\t$mn\t$mx")
            }
          }
        }
      }
    } finally rd.close()
  }

  /** Commit `v`'s sidecar entries for `column`, or None when the
    * sidecar is absent/torn or records nothing for that column —
    * every None path degrades to "don't prune". Reads both formats:
    * v2 (`#v=2`, self-describing 5-field lines, any column) and the
    * earlier v1 (single `#col=`/`#kind=` headers, 3-field lines, one
    * column). */
  private def readStats(spark: SparkSession, path: String, v: Int,
      column: String): Option[(String, Map[String, (String, String)])] = {
    val f = fs(spark, path)
    if (!f.exists(statsPath(path, v))) return None
    val in = f.open(statsPath(path, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    if (!lines.lastOption.contains(EndSentinel)) return None
    val body = lines.init
    val hdr = body.takeWhile(_.startsWith("#"))
      .map(_.stripPrefix("#").split("=", 2))
      .collect { case Array(k, value) => k -> value }.toMap
    val data = body.dropWhile(_.startsWith("#"))
    if (hdr.get("v").contains("2")) {
      val hits = data.flatMap { l =>
        l.split("\t", -1) match {
          case Array(rel, col0, kind, mn, mx) if col0 == column =>
            Some((kind, rel -> (mn, mx)))
          case _ => None
        }
      }
      hits.headOption.map { case (kind, _) =>
        (kind, hits.collect { case (`kind`, e) => e }.toMap)
      }
    } else {
      if (!hdr.get("col").contains(column)) return None
      val kind = hdr.getOrElse("kind", return None)
      Some((kind, data.flatMap { l =>
        l.split("\t", -1) match {
          case Array(rel, mn, mx) => Some(rel -> (mn, mx))
          case _ => None
        }
      }.toMap))
    }
  }

  private val CommitRe = "data/c(\\d+)/".r

  /** File-level zone-map prune of `files` against `[lo, hi]` on
    * `column`: a file drops only when its recorded (min, max) range
    * provably misses the bound; files without stats always survive.
    * Returns the kept files. */
  private[graft] def pruneByStats(spark: SparkSession, path: String,
      files: Seq[String], column: String, lo: Any, hi: Any): Seq[String] = {
    def asLong(a: Any): Long = a match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"snapshotWhere: long-stat column $column needs integral " +
          s"bounds, got $other")
    }
    files.groupBy(fl => CommitRe.findFirstMatchIn(fl).map(_.group(1).toInt))
      .toSeq.flatMap {
        case (Some(c), fls) => readStats(spark, path, c, column) match {
          case Some(("long", m)) =>
            fls.filter(fl => m.get(fl).forall { case (mn, mx) =>
              mx.toLong >= asLong(lo) && mn.toLong <= asLong(hi) })
          case Some(("double", m)) =>
            def asDouble(a: Any): Double = a match {
              case d: Double => d
              case f: Float => f.toDouble
              case l: Long => l.toDouble
              case i: Int => i.toDouble
              case other => throw new IllegalArgumentException(
                s"snapshotWhere: double-stat column $column needs " +
                  s"numeric bounds, got $other")
            }
            fls.filter(fl => m.get(fl).forall { case (mn, mx) =>
              mx.toDouble >= asDouble(lo) && mn.toDouble <= asDouble(hi) })
          case Some(("string", m)) =>
            fls.filter(fl => m.get(fl).forall { case (mn, mx) =>
              mx >= lo.toString && mn <= hi.toString })
          case _ => fls
        }
        case (None, fls) => fls
      }
  }

  private def dayOf(relFile: String): String = {
    val m = s"$DayDir=([^/]+)/".r.findFirstMatchIn(relFile)
    require(m.isDefined, s"VersionedStore: file outside day layout: $relFile")
    m.get.group(1)
  }

  /** Days a keyed merge must rewrite. With `ts` among the keys, a
    * matching target row can only live on one of the batch's own days,
    * so those alone are the rewrite set. Without `ts` (dimension-style
    * keys, e.g. `user_email`), a match may live on ANY day — the
    * batch's days widen by the days of target rows sharing a key,
    * found with one column-pruned key-semi-join against the head
    * snapshot (the scan reads only `keys` + `ts`; the distinct batch
    * key set is small relative to the store and broadcasts under AQE,
    * so this stays a metadata-cheap probe, not a store rewrite). */
  private def touchedDays(spark: SparkSession, path: String, head: Int,
      batch: DataFrame, keys: Seq[String]): Set[String] = {
    val batchDays = batch
      .select(to_date(col("ts")).cast("string").as("d"))
      .distinct()
    if (keys.contains("ts"))
      batchDays.collect().map(_.getString(0)).toSet
    else {
      // ONE collect for both day sets (r17): the sequential pair paid
      // two driver round-trips per non-ts-keyed commit
      val matchDays = snapshot(spark, path, Some(head))
        .select((keys :+ "ts").distinct.map(col): _*)
        .join(batch.select(keys.map(col): _*).distinct(), keys, "left_semi")
        .select(to_date(col("ts")).cast("string").as("d"))
        .distinct()
      batchDays.union(matchDays).distinct()
        .collect().map(_.getString(0)).toSet
    }
  }

  /** Create the store at version 0 from `events`. `rangeParts` opts in
    * to range-clustered files (see [[writeData]]). */
  def create(events: DataFrame, path: String,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0,
      bloomCols: Seq[String] = Nil, clusterParts: Int = 0,
      zorderBy: Option[org.apache.spark.sql.Column] = None): Int = {
    val spark = events.sparkSession
    require(versions(spark, path).isEmpty,
      s"VersionedStore: $path already has a log — use append/upsert")
    writeManifest(spark, path, 0,
      writeData(events, path, 0, sortCols, rangeParts, bloomCols,
        clusterParts, zorderBy),
      schemaMeta(spark, path, None, events.schema, meta))
    0
  }

  /** Append-only commit: batch files are ADDED to the head manifest;
    * no existing file is read or rewritten (blind ingest — the cheap
    * path for known-new data such as a fresh day's events). */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0,
      bloomCols: Seq[String] = Nil): Int = {
    val head = versions(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"VersionedStore: no log at $path"))
    enforceSchema(spark, path, head, batch.schema, evolve = false)
    val v = head + 1
    writeManifest(spark, path, v,
      readManifest(spark, path, head) ++
        writeData(batch, path, v, sortCols, rangeParts, bloomCols),
      schemaMeta(spark, path, Some(head), batch.schema, meta))
    v
  }

  /** Keyed MERGE commit ([[Merge.upsertEvents]] semantics), scoped
    * copy-on-write: only the day partitions a match can live in are
    * read, merged, and rewritten ([[touchedDays]] — the batch's days
    * when `keys` pin the day via `ts`, widened by key-matching target
    * days otherwise); all other live files carry into the new manifest
    * untouched. The day set collects to the driver — bounded by the
    * batch's distinct days (plus its matches' days), not the store.
    *
    * `evolve = true` switches to [[Merge.upsertEventsEvolving]]: a
    * batch carrying NEW columns widens the rewritten days (the ALTER
    * TABLE ADD COLUMN moment); carried days keep their old file
    * schema, and [[snapshot]]'s merged-schema read surfaces the new
    * column as null there — per-commit schema evolution without ever
    * rewriting untouched data. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String] = Merge.EventKeys,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      evolve: Boolean = false,
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0): Int = {
    val head = versions(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"VersionedStore: no log at $path"))
    enforceSchema(spark, path, head, batch.schema, evolve)
    val v = head + 1
    val live = readManifest(spark, path, head)
    val touched = touchedDays(spark, path, head, batch, keys)
    val (hit, carried) = live.partition(fl => touched.contains(dayOf(fl)))
    val existing =
      if (hit.isEmpty) batch.limit(0)
      else readFiles(spark, path, head, hit, live)
    // no checkpoint needed: the merge reads the head's files and writes
    // NEW files under data/c<v> — published data files are immutable,
    // so the plan never races its own rewrite
    val merged =
      if (evolve) Merge.upsertEventsEvolving(existing, batch, keys)
      else Merge.upsertEvents(existing, batch, keys)
    writeManifest(spark, path, v,
      carried ++ writeData(merged, path, v, sortCols, rangeParts),
      schemaMeta(spark, path, Some(head), merged.schema, meta))
    v
  }

  /** Declarative MERGE INTO — the full SQL merge clause set over the
    * store, generalizing [[upsert]] (which is the
    * all-defaults instance) the way Delta's `MERGE` generalizes
    * upsert:
    *
    *   WHEN MATCHED AND `matchedDelete`  THEN DELETE
    *   WHEN MATCHED AND `matchedUpdate`  THEN UPDATE SET * (source wins)
    *   WHEN MATCHED                      (else) keep the target row
    *   WHEN NOT MATCHED AND `notMatchedInsert` THEN INSERT *
    *
    * Conditions are expressions over the aliased sides — `t` is the
    * target (store) row, `s` the source (batch) row, e.g.
    * `expr("s.value > t.value")`. Delete is tested before update, the
    * SQL clause order. Source rows are deduplicated on `keys` first
    * (last-writer-wins is the caller's concern; use a seq column
    * upstream if arrival order matters).
    *
    * Same commit mechanics and scale shape as [[upsert]]: day-scoped
    * copy-on-write — only day partitions a match can live in
    * ([[touchedDays]]) are read, merged through ONE keyed full-outer
    * join, and rewritten; everything else carries by reference.
    * Target-only rows of untouched days are never read at all, so a
    * MERGE's cost tracks the batch's day-and-match footprint, not the
    * store. */
  def mergeInto(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String] = Merge.EventKeys,
      matchedUpdate: org.apache.spark.sql.Column = lit(true),
      matchedDelete: org.apache.spark.sql.Column = lit(false),
      notMatchedInsert: org.apache.spark.sql.Column = lit(true),
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0): Int = {
    val head = versions(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"VersionedStore: no log at $path"))
    enforceSchema(spark, path, head, batch.schema, evolve = false)
    val v = head + 1
    val live = readManifest(spark, path, head)
    val touched = touchedDays(spark, path, head, batch, keys)
    val (hit, carried) = live.partition(fl => touched.contains(dayOf(fl)))
    val existing =
      if (hit.isEmpty) batch.limit(0)
      else readFiles(spark, path, head, hit, live)
    val payload = existing.columns.filterNot(keys.contains).toSeq
    val t = existing.withColumn("__graft_t", lit(true)).as("t")
    val s = batch.dropDuplicates(keys)
      .withColumn("__graft_s", lit(true)).as("s")
    val joined = t.join(s, keys, "full_outer")
    val matched = col("t.__graft_t").isNotNull && col("s.__graft_s").isNotNull
    val sOnly = col("t.__graft_t").isNull
    // clause order: DELETE, then UPDATE, then keep; inserts gated
    val keep =
      when(matched, !coalesce(matchedDelete, lit(false)))
        .when(sOnly, coalesce(notMatchedInsert, lit(false)))
        .otherwise(lit(true)) // target-only: always kept
    val takeSource =
      when(matched, coalesce(matchedUpdate, lit(false))).otherwise(sOnly)
    val resolved = payload.map(c =>
      when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c))
    val merged = joined.filter(keep)
      .select(keys.map(col) ++ resolved: _*)
    writeManifest(spark, path, v,
      carried ++ writeData(merged, path, v, sortCols, rangeParts),
      schemaMeta(spark, path, Some(head), merged.schema, meta))
    v
  }

  /** Highest committed value of commit-meta key `key` across the log
    * (as a long), or None. O(versions) driver metadata reads — the
    * exactly-once ingest check ([[graft.streaming.Streaming]]'s
    * `versionedIngest`), same role as Delta's per-app transaction
    * version. */
  def maxCommitted(spark: SparkSession, path: String,
      key: String): Option[Long] = {
    val ids = versions(spark, path)
      .flatMap(v => commitMeta(spark, path, v).get(key)).map(_.toLong)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Row-deletion commit, scoped copy-on-write like [[upsert]]: day
    * partitions containing matching rows are rewritten without them;
    * everything else carries by reference. A day whose every row
    * matches simply drops out of the manifest (file-level delete — no
    * rewrite at all for fully-deleted days). */
  def delete(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts")): Int = {
    val head = versions(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"VersionedStore: no log at $path"))
    val v = head + 1
    val live = readManifest(spark, path, head)
    val touched = snapshot(spark, path, Some(head)).filter(predicate)
      .select(to_date(col("ts")).cast("string").as("d"))
      .distinct().collect().map(_.getString(0)).toSet
    val (hit, carried) = live.partition(fl => touched.contains(dayOf(fl)))
    val files =
      if (hit.isEmpty) carried
      else {
        val remaining = readFiles(spark, path, head, hit, live)
          .filter(!predicate)
        carried ++ writeData(remaining, path, v, sortCols)
      }
    // deletes never change the schema: carry the head's record
    writeManifest(spark, path, v, files,
      recordedSchema(spark, path, head)
        .map(sc => Map(SchemaKey -> sc.json)).getOrElse(Map.empty))
    v
  }

  /** OPTIMIZE: rewrite each day whose live file count exceeds
    * `maxFilesPerDay` into freshly clustered files, publishing the
    * result as a new commit; compliant days carry by reference. Row-
    * preserving by construction — the new files hold exactly the rows
    * of the files they replace — and history stays time-travelable
    * (the old small files remain live in older versions until
    * [[vacuum]]). The rewrite re-sorts on `sortCols` and re-records
    * zone-map sidecars, so compaction REPAIRS clustering that
    * accumulated appends have degraded — the lakehouse OPTIMIZE
    * contract. A store already compliant publishes nothing and
    * returns the current head.
    *
    * Scale (100 TB): the decision is driver-side metadata (file counts
    * per day from the manifest); the rewrite reads and writes only the
    * offending days. Streaming ingest writes a file per micro-batch —
    * without periodic compaction a year of 15-minute batches is 35k
    * files/day and snapshot planning drowns in footers; with it, reads
    * cost O(days × rangeParts) files regardless of ingest cadence. */
  def compact(spark: SparkSession, path: String,
      maxFilesPerDay: Int = 1,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      rangeParts: Int = 0, bloomCols: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty, clusterParts: Int = 0,
      zorderBy: Option[org.apache.spark.sql.Column] = None): Int = {
    require(maxFilesPerDay >= 1, "compact: maxFilesPerDay must be >= 1")
    val head = versions(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"VersionedStore: no log at $path"))
    val live = readManifest(spark, path, head)
    val oversized = live.groupBy(dayOf).filter(_._2.size > maxFilesPerDay)
      .values.flatten.toSeq
    if (oversized.isEmpty) return head
    val v = head + 1
    val merged = readFiles(spark, path, head, oversized, live)
    val carried = live.filterNot(oversized.toSet)
    writeManifest(spark, path, v,
      carried ++ writeData(merged, path, v, sortCols, rangeParts,
        bloomCols, clusterParts, zorderBy),
      schemaMeta(spark, path, Some(head), merged.schema, meta))
    v
  }

  /** Snapshot with row-level WRITE LINEAGE: each row carries the
    * commit that wrote its current file as `_commit` — which ingest
    * batch produced this row, the first question a data audit asks.
    * Free metadata: the commit id is parsed from the file path Spark
    * already tracks per row (`_metadata`), no stored column and no
    * join. NB lineage is "who wrote the CURRENT file": an upsert or
    * compaction that rewrites a day re-attributes its rows to the
    * rewriting commit (time travel to an older version recovers the
    * older attribution). */
  def snapshotWithLineage(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame =
    snapshot(spark, path, version).withColumn("_commit",
      regexp_extract(col("_metadata.file_path"), "data/c(\\d+)/", 1)
        .cast("int"))

  /** Exact COUNT(*) of a snapshot from LOG METADATA alone: per-file
    * row counts were recorded in the stats sidecar at commit, so the
    * answer is driver-side addition over the (day-pruned) manifest —
    * no scan, no task, no data file opened. Files whose commit predates
    * the sidecar row counts fall back to one counting scan over just
    * those files. The `SELECT COUNT(*)` metadata shortcut every
    * lakehouse ships. */
  def snapshotRowCount(spark: SparkSession, path: String,
      version: Option[Int] = None,
      days: Option[Set[String]] = None): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"VersionedStore: no log at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"VersionedStore: version $v not in log (have ${vs.mkString(",")})")
    val files = readManifest(spark, path, v)
      .filter(fl => days.forall(_.contains(dayOf(fl))))
    val byCommit = files.groupBy(fl =>
      CommitRe.findFirstMatchIn(fl).map(_.group(1).toInt))
    var total = 0L
    val unrecorded = scala.collection.mutable.ArrayBuffer.empty[String]
    byCommit.foreach {
      case (Some(c), fls) =>
        val m = readStats(spark, path, c, "#rows")
          .map(_._2).getOrElse(Map.empty)
        fls.foreach { fl =>
          m.get(fl) match {
            case Some((n, _)) => total += n.toLong
            case None => unrecorded += fl
          }
        }
      case (None, fls) => unrecorded ++= fls
    }
    if (unrecorded.nonEmpty)
      total += spark.read.option("mergeSchema", "true")
        .parquet(unrecorded.toSeq.map(fl => s"$path/$fl"): _*).count()
    total
  }

  /** Exact (min, max) of an INTEGRAL column from log metadata alone —
    * integral parquet stats are never truncated, so file-level min/max
    * compose exactly (string stats may be truncated bounds and are NOT
    * offered here). None when any live file lacks recorded stats for
    * the column (all-null file, pre-stats commit) — the caller falls
    * back to a scan rather than risking a wrong exact answer. */
  def snapshotMinMaxLong(spark: SparkSession, path: String,
      column: String, version: Option[Int] = None,
      days: Option[Set[String]] = None): Option[(Long, Long)] = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"VersionedStore: no log at $path")
    val v = version.getOrElse(vs.last)
    val files = readManifest(spark, path, v)
      .filter(fl => days.forall(_.contains(dayOf(fl))))
    val bounds = files.groupBy(fl =>
      CommitRe.findFirstMatchIn(fl).map(_.group(1).toInt)).toSeq
      .flatMap {
        case (Some(c), fls) => readStats(spark, path, c, column) match {
          case Some(("long", m)) => fls.map(m.get)
          case _ => fls.map(_ => None)
        }
        case (None, fls) => fls.map(_ => None)
      }
    if (bounds.isEmpty || bounds.contains(None)) None
    else {
      val bs = bounds.flatten.map { case (mn, mx) => (mn.toLong, mx.toLong) }
      Some((bs.map(_._1).min, bs.map(_._2).max))
    }
  }

  /** Commit-time CHECK constraints (the Delta constraint contract):
    * evaluate a declarative [[graft.ext.Expectations]] suite over the
    * batch in ONE aggregate scan and commit only if every check
    * passes — a failing batch throws with the failing metrics and
    * writes NOTHING (the store's quality gate sits at the write,
    * where a violation is one batch to fix, not a corpus to repair).
    * Applies to both the blind-append and keyed-upsert paths. */
  def appendChecked(spark: SparkSession, path: String, batch: DataFrame,
      suite: Seq[graft.ext.Expectations.Expectation],
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0,
      bloomCols: Seq[String] = Nil): Int = {
    enforceConstraints(batch, suite)
    append(spark, path, batch, sortCols, meta, rangeParts, bloomCols)
  }

  /** [[upsert]] gated by the same commit-time constraint suite. */
  def upsertChecked(spark: SparkSession, path: String, batch: DataFrame,
      suite: Seq[graft.ext.Expectations.Expectation],
      keys: Seq[String] = Merge.EventKeys,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      evolve: Boolean = false,
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0): Int = {
    enforceConstraints(batch, suite)
    upsert(spark, path, batch, keys, sortCols, evolve, meta, rangeParts)
  }

  private def enforceConstraints(batch: DataFrame,
      suite: Seq[graft.ext.Expectations.Expectation]): Unit = {
    val failed = graft.ext.Expectations.check(batch, suite)
      .filter(!col("passed"))
      .select(col("check"), col("col_name"), col("metric")).collect()
    if (failed.nonEmpty)
      throw new IllegalArgumentException(
        "VersionedStore: batch violates commit constraints — nothing " +
          "written: " + failed.map(r =>
          s"${r.getString(0)}(${r.getString(1)})=${r.getDouble(2)}")
          .mkString(", "))
  }

  /** Append under OPTIMISTIC-CONCURRENCY retry: on a commit conflict
    * (another writer published the head first) re-read the new head
    * and try again, up to `attempts` times — the loop every Delta
    * writer runs. Safe for append specifically because a blind append
    * is conflict-free by content: it touches no existing file, so
    * rebasing is just re-reading the manifest. (Upserts would need
    * real conflict detection — overlapping day rewrites — which is why
    * there is no upsertWithRetry.) */
  def appendWithRetry(spark: SparkSession, path: String,
      batch: DataFrame, attempts: Int = 3,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      meta: Map[String, String] = Map.empty, rangeParts: Int = 0,
      bloomCols: Seq[String] = Nil): Int = {
    require(attempts >= 1, "appendWithRetry: need at least one attempt")
    var left = attempts
    while (true) {
      left -= 1
      try return append(spark, path, batch, sortCols, meta, rangeParts,
        bloomCols)
      catch {
        // loser can fail at either race point: the manifest publish
        // (create-if-absent) or the data-dir write (errorifexists when
        // the winner already claimed data/c<v>)
        case e: IllegalStateException
            if e.getMessage.contains("commit conflict") && left > 0 => ()
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("already exists") && left > 0 => ()
      }
    }
    -1 // unreachable
  }

  /** The periodic maintenance job, one call: OPTIMIZE days that
    * accumulated too many files, then VACUUM history beyond the
    * retention window. Returns (head after compaction, files removed).
    * Run it off the ingest path on whatever cadence the file-count ×
    * retention SLAs demand — both halves are no-ops when the store is
    * already compliant, so over-calling is safe (and cheap: the
    * decision work is driver-side metadata). */
  def maintain(spark: SparkSession, path: String,
      maxFilesPerDay: Int = 4, retainVersions: Int = 7,
      sortCols: Seq[String] = Seq("user_email", "habit", "ts"),
      rangeParts: Int = 0, bloomCols: Seq[String] = Nil): (Int, Int) = {
    val head = compact(spark, path, maxFilesPerDay, sortCols,
      rangeParts, bloomCols)
    (head, vacuum(spark, path, retainVersions))
  }

  /** Roll the head back to `v`'s contents by PUBLISHING A NEW VERSION
    * carrying `v`'s manifest — history stays intact (the bad commits
    * remain time-travelable), which is what distinguishes restore from
    * ever rewriting the log. Metadata-only: no data file moves, and
    * every file's zone-map/row-count sidecar stays valid because stats
    * key on the WRITING commit, which restore never changes. The
    * restore itself is an auditable commit: its metadata records
    * `restoredFrom` (plus any caller `meta`), so the log explains the
    * rollback instead of silently forking. */
  def restore(spark: SparkSession, path: String, v: Int,
      meta: Map[String, String] = Map.empty): Int = {
    val vs = versions(spark, path)
    require(vs.contains(v),
      s"VersionedStore: cannot restore to unknown version $v")
    require(!meta.contains(SchemaKey),
      s"VersionedStore: commit meta key '$SchemaKey' is reserved")
    val next = vs.last + 1
    writeManifest(spark, path, next, readManifest(spark, path, v),
      recordedSchema(spark, path, v)
        .map(s => Map(SchemaKey -> s.json)).getOrElse(Map.empty) ++
        meta + ("restoredFrom" -> v.toString))
    next
  }

  /** Change data feed between two published versions, computed from
    * the MANIFEST DIFF first: a day whose file set is identical in
    * both versions was carried by reference and provably holds
    * identical rows, so only days whose files differ are scanned on
    * either side — at 100 TB a single-day upsert's change feed reads
    * one day, not the store. Within differing days, a keyed full-outer
    * join classifies rows: `insert` (key only in `to`), `delete` (key
    * only in `from`), `update` (key in both, any payload column
    * differing under null-safe equality); unchanged rows that were
    * merely rewritten alongside real changes drop out. Returns key
    * columns + `op` + `<c>_old`/`<c>_new` for every payload column. */
  def changes(spark: SparkSession, path: String, fromV: Int, toV: Int,
      keys: Seq[String] = Merge.EventKeys): DataFrame = {
    def byDay(v: Int): Map[String, Seq[String]] =
      readManifest(spark, path, v).groupBy(dayOf).view.mapValues(_.sorted)
        .toMap
    val (mf, mt) = (byDay(fromV), byDay(toV))
    val differing = (mf.keySet ++ mt.keySet)
      .filter(d => mf.get(d) != mt.get(d))
    def side(v: Int, m: Map[String, Seq[String]]): DataFrame = {
      val files = differing.toSeq.sorted.flatMap(m.getOrElse(_, Nil))
      readFiles(spark, path, v, files,
        (mf.values.flatten ++ mt.values.flatten).toSeq.take(1))
    }
    // explicit presence markers — payload nullness cannot distinguish
    // "row absent" from "row present with null payload"
    val fRaw = side(fromV, mf).withColumn("_f", lit(true))
    val tRaw = side(toV, mt).withColumn("_t", lit(true))
    // payload = UNION of both sides' columns: an `evolve` commit means
    // one side may not have a column at all — it reads as null there,
    // and populating it counts as a change
    val payload = (fRaw.columns ++ tRaw.columns).distinct
      .filterNot(c => keys.contains(c) || c == "_f" || c == "_t").toSeq
    def sideCol(alias: String, have: Set[String], c: String) =
      if (have(c)) col(s"$alias.$c") else lit(null)
    val (fHave, tHave) = (fRaw.columns.toSet, tRaw.columns.toSet)
    val joined = fRaw.as("f").join(tRaw.as("t"), keys, "full_outer")
    val changed = payload
      .map(c => !(sideCol("f", fHave, c) <=> sideCol("t", tHave, c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("f._f").isNotNull && col("t._t").isNull, "delete")
      .when(col("f._f").isNull && col("t._t").isNotNull, "insert")
      .when(changed, "update") // both present; unchanged rewrites drop
    joined.withColumn("op", op).filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++ payload.flatMap(c => Seq(
        sideCol("f", fHave, c).as(s"${c}_old"),
        sideCol("t", tHave, c).as(s"${c}_new"))): _*)
  }

  /** Drop history: delete every manifest except the newest `retain`,
    * then delete data files no surviving manifest references. Driver
    * metadata work O(total files); irreversible — vacuumed versions
    * are no longer time-travelable. Run AFTER a retention window, the
    * same contract as lakehouse VACUUM: any reader still scanning a
    * dropped version's files races the delete. Returns the number of
    * data files removed. */
  def vacuum(spark: SparkSession, path: String, retain: Int): Int = {
    require(retain >= 1, "vacuum must retain at least the head")
    val f = fs(spark, path)
    val vs = versions(spark, path)
    val (dropV, keepV) = vs.splitAt(math.max(0, vs.length - retain))
    val live = keepV.flatMap(readManifest(spark, path, _)).toSet
    val root = new Path(path).toUri.getPath
    val it = f.listFiles(new Path(path, "data"), true)
    var removed = 0
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      if (st.getPath.getName.startsWith("part-") && !live.contains(rel)) {
        f.delete(st.getPath, false)
        removed += 1
      }
    }
    dropV.foreach(v => f.delete(manifestPath(path, v), false))
    removed
  }

  /** Snapshot read. `version = None` reads the head; `Some(v)` time
    * travels. `days` (as `yyyy-MM-dd` strings) prunes FILES from the
    * manifest before the scan — metadata-level partition pruning.
    *
    * Reads plan under the LOG-RECORDED schema (a column added by an
    * `evolve` commit reads as null in days that predate it) — no
    * footer is opened at planning time regardless of file count.
    * Pre-schema-key logs fall back to a mergeSchema footer pass. */
  def snapshot(spark: SparkSession, path: String,
      version: Option[Int] = None,
      days: Option[Set[String]] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"VersionedStore: no log at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"VersionedStore: version $v not in log (have ${vs.mkString(",")})")
    val all = readManifest(spark, path, v)
    if (all.isEmpty) return emptySnapshot(spark, path, v)
    val files = all.filter(fl => days.forall(_.contains(dayOf(fl))))
    readFiles(spark, path, v, files, all)
  }

  /** Drop `files` whose parquet BLOOM FILTERS prove `value` absent
    * from every row group of the file for `column`. Blooms ride the
    * footers the write produced (`bloomCols` at commit time enables
    * them), so this costs O(files) pooled metadata reads and no data
    * pages. One-sided: "maybe present" (or no bloom, or column
    * missing) keeps the file; only a definite miss prunes. */
  private[graft] def pruneByBloom(spark: SparkSession, path: String,
      files: Seq[String], column: String, value: Any): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import scala.jdk.CollectionConverters._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val conf = spark.sessionState.newHadoopConf()
    def definitelyAbsent(rel: String): Boolean = {
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(s"$path/$rel"), conf))
      try rd.getFooter.getBlocks.asScala.forall { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column)
          .exists { cm =>
            val bf = rd.getBloomFilterDataReader(b).readBloomFilter(cm)
            bf != null && {
              val h = (cm.getPrimitiveType.getPrimitiveTypeName, value)
                match {
                case (PrimitiveTypeName.INT64, l: Long) => Some(bf.hash(l))
                case (PrimitiveTypeName.INT64, i: Int) =>
                  Some(bf.hash(i.toLong))
                case (PrimitiveTypeName.INT32, i: Int) => Some(bf.hash(i))
                case (PrimitiveTypeName.BINARY, s: String) => Some(bf.hash(
                  org.apache.parquet.io.api.Binary.fromString(s)))
                case _ => None
              }
              h.exists(!bf.findHash(_))
            }
          }
      } finally rd.close()
    }
    Await.result(
      Future.traverse(files)(fl =>
        Future(if (definitelyAbsent(fl)) None else Some(fl))),
      Duration.Inf).flatten
  }

  /** Point-lookup read: rows of the snapshot with `column = value`,
    * scanning only files that zone maps AND bloom filters cannot rule
    * out. The needle-in-haystack path: an id lookup over a store whose
    * commits enabled `bloomCols` on that id opens ~1 file instead of
    * every file, and the decision is made on the driver from footer
    * metadata before any task is scheduled — Spark's own row-group
    * bloom filtering still applies inside whatever survives. */
  def snapshotPoint(spark: SparkSession, path: String, column: String,
      value: Any, version: Option[Int] = None,
      days: Option[Set[String]] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"VersionedStore: no log at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"VersionedStore: version $v not in log (have ${vs.mkString(",")})")
    val all = readManifest(spark, path, v)
    if (all.isEmpty)
      return emptySnapshot(spark, path, v).filter(col(column) === lit(value))
    val dayKept = all.filter(fl => days.forall(_.contains(dayOf(fl))))
    val kept = pruneByBloom(spark, path,
      pruneByStats(spark, path, dayKept, column, value, value),
      column, value)
    readFiles(spark, path, v, kept, all)
      .filter(col(column) === lit(value))
  }

  /** Range read with zone-map FILE skipping: rows of the snapshot with
    * `column` in `[lo, hi]` (inclusive), scanning only files whose
    * recorded per-file (min, max) overlaps the bound — plus any file
    * without stats. Exact: the surviving files still pass through the
    * real predicate, so skipping can only remove provably-empty scans,
    * never rows. Compose with `days` for time bounds (day pruning) ×
    * key bounds (zone maps) — the two metadata prunes multiply.
    *
    * Scale (100 TB): with [[create]]/[[append]]`(rangeParts = R)` a
    * day's R files partition the key domain, so a narrow key range
    * opens O(days) files instead of O(days × R) — the scan-planning
    * win is decided entirely on the driver from sidecar metadata,
    * before Spark lists or opens anything. */
  def snapshotWhere(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any, version: Option[Int] = None,
      days: Option[Set[String]] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"VersionedStore: no log at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"VersionedStore: version $v not in log (have ${vs.mkString(",")})")
    val all = readManifest(spark, path, v)
    if (all.isEmpty)
      return emptySnapshot(spark, path, v)
        .filter(col(column).between(lit(lo), lit(hi)))
    val dayKept = all.filter(fl => days.forall(_.contains(dayOf(fl))))
    val kept = pruneByStats(spark, path, dayKept, column, lo, hi)
    readFiles(spark, path, v, kept, all)
      .filter(col(column).between(lit(lo), lit(hi)))
  }
}
