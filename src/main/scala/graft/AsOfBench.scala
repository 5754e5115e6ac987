package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the as-of join forms — the recorded evidence
  * behind the `AsOfJoinExec` codegen decision (BASELINE.md "Native
  * as-of join head-to-head"): the interpreted-row native merge vs the
  * fully whole-stage-codegen'd alternatives a user could compose
  * today:
  *
  *   - `composed-window`: union both sides into a padded schema, one
  *     window carry-forward pass ([[graft.ext.AsOf.asofJoin]]).
  *   - `composed-smj`: sort-merge equi-join on the key with the range
  *     predicate as join condition (pair fan-out!), then a max-by
  *     aggregate picks each fact's latest update — every operator in
  *     this plan (SMJ, HashAggregate) runs inside WholeStageCodegen.
  *   - `native-merge` / `native-broadcast` / `native-auto`: the custom
  *     `AsOfJoinExec` stack.
  *
  * Deterministic synthetic inputs (no wall-clock anywhere): ~`nFacts`
  * facts and `nUpdates` updates over `nKeys` keys, timestamps from a
  * fixed multiplicative hash. Each form runs `runs` times against a
  * noop sink; per-form min is printed as one JSON line.
  *
  * Run: `SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g sbt "runMain
  * graft.AsOfBench 20000000 400000 100000 3"`. */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val nFacts = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val nUpdates = args.lift(1).map(_.toLong).getOrElse(400000L)
    val nKeys = args.lift(2).map(_.toLong).getOrElse(100000L)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixed multiplicative hashes — same corpus on every run/engine
    val facts = spark.range(nFacts).select(
        col("id").as("fact_id"),
        pmod(col("id") * 2654435761L, lit(nKeys)).as("k"),
        timestamp_seconds(pmod(col("id") * 40503L, lit(10000000L)))
          .as("ts"))
      .persist()
    val updates = spark.range(nUpdates).select(
        pmod(col("id") * 2246822519L, lit(nKeys)).as("k"),
        timestamp_seconds(pmod(col("id") * 57559L, lit(10000000L)))
          .as("ts"),
        (col("id") % 1000).cast("double").as("pvalue"))
      // the window/native forms assume per-(key,ts) uniqueness like the
      // q_asof_* queries do — collapse dup timestamps the same way
      .groupBy(col("k"), col("ts")).agg(max(col("pvalue")).as("pvalue"))
      .persist()
    facts.count(); updates.count()

    def time(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"form":"$name","min_sec":${secs.min}%.3f,"runs":[${
        secs.map(s => f"$s%.3f").mkString(",")}]}""")
    }

    time("composed-window", () =>
      graft.ext.AsOf.asofJoin(facts, updates, "k", "ts", Seq("pvalue")))
    time("composed-smj", () => {
      // force the equi-join through SortMergeJoin (no broadcast), range
      // predicate rides as the join condition; the max-by HashAggregate
      // then reduces the pair fan-out to one row per fact. Everything
      // codegen'd — this is the strongest composition Spark's built-in
      // operators offer.
      val j = facts.alias("f")
        .hint("merge")
        .join(updates.alias("u"),
          col("f.k") === col("u.k") && col("u.ts") <= col("f.ts"),
          "left")
        .groupBy(col("f.fact_id"))
        .agg(max(struct(col("u.ts"), col("u.pvalue"))).as("m"))
        .select(col("f.fact_id"), col("m.ts").as("asof_ts"),
          col("m.pvalue").as("asof_pvalue"))
      j
    })
    time("native-merge", () =>
      graft.ext.AsOf.asofJoinNative(facts, updates, "k", "ts",
        Seq("pvalue"), broadcast = Some(false)))
    time("native-broadcast", () =>
      graft.ext.AsOf.asofJoinNative(facts, updates, "k", "ts",
        Seq("pvalue"), broadcast = Some(true)))
    time("native-auto", () =>
      graft.ext.AsOf.asofJoinNative(facts, updates, "k", "ts",
        Seq("pvalue")))
    spark.stop()
  }
}
