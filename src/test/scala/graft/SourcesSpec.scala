package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 form-response table (SURVEY §2.1 S1). */
class SourcesSpec extends AnyFunSuite with SparkTestSession {

  private def read(users: Int, days: Int) =
    spark.read.format("graft.sources.FormResponseSource")
      .option("users", users).option("days", days)
      .option("startdate", "2024-01-01").load()

  test("schema is the untyped sheet header row") {
    val df = read(2, 2)
    assert(df.columns.toSeq == Seq("Timestamp", "Report Date",
      "Email Address", "Workout", "Meditation (Number of Minutes)",
      "Mood", "Notes"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("one row per (user, day); one partition per day block") {
    val df = read(3, 4)
    assert(df.count() == 12)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("variant payload writes SHREDDED parquet (typed subcolumns + " +
      "untyped spill)") {
    // q_variant_shredded's storage contract: Spark 4's default-on
    // writeShredding + inferShreddingSchema must produce typed_value
    // subcolumns next to the untyped binary spill. Pinned against the
    // physical footer so a future default flip is caught here, not as
    // a silent perf regression in the scan.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.hadoop.conf.Configuration
    val path = java.nio.file.Files
      .createTempDirectory("graft_shred_").toString
    spark.range(50).selectExpr("id",
        "parse_json(to_json(named_struct(" +
          "'t', cast(id % 3 as string), 'k', id))) as payload")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val f = new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val schema = ParquetFileReader.readFooter(new Configuration(),
      new HPath(f.getAbsolutePath)).getFileMetaData.getSchema.toString
    assert(schema.contains("typed_value"),
      s"expected shredded typed_value subcolumns, got:\n$schema")
    assert(schema.contains("metadata") && schema.contains("value"),
      s"shredded group must keep the untyped variant spill:\n$schema")
  }

  test("cells follow the documented closed-form math") {
    val r = read(3, 4).filter(col("`Report Date`") === "1/3/2024" &&
      col("`Email Address`") === "User2@Example.com").head()
    // u=2, d=2: workout (2+2)%2==0 -> Yes; meditation (14+6)%60=20;
    // mood (2+2)%11=4; d%3!=0 -> blank notes
    assert(r.getAs[String]("Workout") == "Yes")
    assert(r.getAs[String]("Meditation (Number of Minutes)") == "20")
    assert(r.getAs[String]("Mood") == "4")
    assert(r.getAs[String]("Notes") == "")
  }

  test("junk mood cell appears where (u+d)%11 == 10") {
    val junk = read(4, 9).filter(col("Mood") === "n/a")
      .select(col("`Email Address`"), col("`Report Date`")).collect()
    assert(junk.nonEmpty)
  }

  private def batchScan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  private def preAdaptiveScan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  test("pushed Report Date equality prunes day-block partitions") {
    val base = read(3, 20)
    val filtered = base.filter(col("`Report Date`") === "1/5/2024")
    // pruning happens at planning: only day 4's block is ever scheduled
    assert(batchScan(filtered).inputRDD.getNumPartitions == 1)
    assert(filtered.count() == 3)
    // the pushed filter is a correctness promise — result must equal a
    // post-scan filter over the full table
    val unpruned = base.collect()
      .filter(_.getAs[String]("Report Date") == "1/5/2024")
    assert(filtered.collect().map(_.toSeq).toSet ==
      unpruned.map(_.toSeq).toSet)
    // a date matching no block plans zero partitions, returns nothing
    val none = base.filter(col("`Report Date`") === "7/4/1999")
    assert(batchScan(none).inputRDD.getNumPartitions == 0)
    assert(none.count() == 0)
  }

  test("column pruning reaches the source's read schema") {
    val pr = read(2, 3).select(col("`Email Address`"), col("Mood"))
    assert(batchScan(pr).scan.readSchema().fieldNames.toSeq ==
      Seq("Email Address", "Mood"))
    assert(pr.collect().length == 6)
  }
  test("grouped aggregate pushes down COMPLETE: scan emits one final " +
      "row per day block and no aggregate exec remains") {
    val agg = read(4, 6)
      .groupBy(col("`Report Date`"))
      .agg(count(lit(1)).as("n"), min(col("`Email Address`")).as("lo"),
        max(col("Mood")).as("hi"))
    val scan = batchScan(agg)
    assert(scan.scan.description().contains("pushedAggregates"),
      s"aggregation must reach the source: ${scan.scan.description()}")
    // complete pushdown: the scan's schema IS the aggregated shape and
    // Spark plans no HashAggregate above it
    assert(scan.scan.readSchema().length == 4)
    assert(!agg.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "complete pushdown must remove the aggregate exec")
    val rows = agg.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(rows.size == 6 && rows.values.forall(_._1 == 4L))
    assert(rows.values.forall(_._2 == "User0@Example.com"))
    // result parity with an unpushed aggregation over the raw rows
    val raw = read(4, 6).collect()
      .groupBy(_.getAs[String]("Report Date"))
      .map { case (d, rs) => d -> (rs.length.toLong,
        rs.map(_.getAs[String]("Email Address")).min,
        rs.map(_.getAs[String]("Mood")).max) }
    assert(rows == raw)
  }

  test("ungrouped aggregate pushes down PARTIAL: one partial row per " +
      "day block, merged by Spark's final aggregate") {
    val agg = read(4, 6)
      .agg(count(lit(1)).as("n"), max(col("`Report Date`")).as("hi"))
    // the final-merge exchange makes the executed plan adaptive, which
    // hides the scan until execution — read the pre-adaptive plan (the
    // pushdown happened earlier, in the optimizer)
    val scan = preAdaptiveScan(agg)
    assert(scan.scan.description().contains("pushedAggregates"))
    // partial: 6 one-row partials flow into a final merge aggregate
    assert(scan.inputRDD.getNumPartitions == 6)
    assert(agg.queryExecution.executedPlan.toString.contains("Aggregate"),
      "ungrouped pushdown stays partial — the final merge must remain")
    val row = agg.collect().head
    assert(row.getLong(0) == 24L && row.getString(1) == "1/6/2024")
  }

  test("unsupported aggregate falls back to the row scan") {
    // AVG is not translatable here: pushAggregation must refuse and the
    // plan must aggregate above a plain row scan
    val agg = read(4, 6)
      .agg(avg(col("`Meditation (Number of Minutes)`").cast("double"))
        .as("m"))
    val scan = preAdaptiveScan(agg)
    assert(!scan.scan.description().contains("pushedAggregates"))
    val expected = read(4, 6).collect()
      .map(_.getAs[String]("Meditation (Number of Minutes)").toDouble)
    assert(math.abs(agg.collect().head.getDouble(0) -
      expected.sum / expected.length) < 1e-9)
  }

  test("LIMIT pushes to the reader: each day block stops early and the " +
      "global limit still holds") {
    val lim = read(5, 4).limit(3)
    val scan = batchScan(lim)
    assert(scan.scan.description().contains("pushedLimit=3"),
      s"limit must reach the scan: ${scan.scan.description()}")
    assert(lim.count() == 3)
    // under a pushed date one partition survives, so the source
    // materializes exactly `limit` rows — scan output == final output
    val one = read(5, 4).filter(col("`Report Date`") === "1/2/2024").limit(2)
    assert(batchScan(one).inputRDD.getNumPartitions == 1)
    assert(one.collect().map(_.getAs[String]("Email Address")).toSeq ==
      Seq("User0@Example.com", "User1@Example.com"))
  }

  test("runtime filtering: join build keys prune day blocks at " +
      "execution time (DSv2 dynamic partition pruning)") {
    val s = spark
    import s.implicits._
    val rows = read(3, 10)
    // the build side must be a real scan with a selective predicate —
    // a LocalRelation constant-folds and the pruning rule skips it
    val dimPath = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    Seq("1/2/2024", "1/4/2024", "nope").toDF("d")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)
      .filter(col("d").isin("1/2/2024", "1/4/2024"))
    val joined = rows.join(dim, col("`Report Date`") === col("d"))
    // execute THIS DataFrame's queryExecution — the runtime filter's
    // subquery result only exists on the executed plan we inspect
    assert(joined.collect().length == 6, "2 matching days x 3 users")
    // AQE wraps executed stages as leaves — unwrap recursively
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    val scans = allScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // runtime filter delivered the build-side keys: only the 2
    // matching blocks survive inside the RDD (the RDD keeps its
    // reported KeyGroupedPartitioning slot count, padding pruned
    // groups empty — so count the actual InputPartitions, not slots)
    val live = scans.head.inputRDD.partitions.map {
      case p: org.apache.spark.sql.execution.datasources.v2
          .DataSourceRDDPartition => p.inputPartitions.size
      case _ => 0
    }.sum
    assert(live == 2, s"expected 2 runtime-pruned day blocks, got $live")
  }

  test("storage-partitioned join: day-block key grouping joins the row " +
      "scan to its daily rollup with NO exchange on either side") {
    val rows = read(3, 5)
    val daily = rows.groupBy(col("`Report Date`"))
      .agg(count(lit(1)).as("n_day"))
    val joined = rows.select(col("`Report Date`"), col("`Email Address`"))
      .join(daily, "Report Date")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"),
      s"SPJ must plan the co-partitioned join shuffle-free:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    // result parity with the obvious closed form: every row joined to
    // its day's user count
    val out = joined.collect()
    assert(out.length == 15 && out.forall(_.getAs[Long]("n_day") == 3L))
  }

  test("DigestSink: V2 commit combines every partition, order-independent") {
    import graft.sources.DigestSink
    val s = spark
    import s.implicits._
    val df = (1 to 500)
      .map(i => (i.toLong, s"row$i", i * 0.5,
        java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00")))
      .toDF("id", "name", "v", "ts")
    DigestSink.clear("spec1"); DigestSink.clear("spec2")
    df.repartition(1).write.format("graft.sources.DigestSink")
      .option("runId", "spec1").mode("append").save()
    df.repartition(7).write.format("graft.sources.DigestSink")
      .option("runId", "spec2").mode("append").save()
    val r1 = DigestSink.result("spec1").get
    val r2 = DigestSink.result("spec2").get
    // expected digest computed driver-side from the external rows
    // (temporal values converted to the internal primitives the
    // executor-side writers render)
    val expect = df.collect().map(DigestSink.rowDigestExternal).sum
    assert(r1.rows == 500 && r2.rows == 500)
    assert(r1.digest == expect && r2.digest == expect,
      "digest must be partitioning- and order-independent")
    assert(r1.partitions == 1 && r2.partitions == 7,
      "driver must have combined one commit message per partition")
    // non-atomic columns are rejected up front, not silently mis-hashed
    val err = intercept[Exception] {
      Seq((1L, Array[Byte](1, 2))).toDF("id", "payload")
        .write.format("graft.sources.DigestSink")
        .option("runId", "specbad").mode("append").save()
    }
    assert(err.getMessage.contains("unsupported: payload"))
  }
}
