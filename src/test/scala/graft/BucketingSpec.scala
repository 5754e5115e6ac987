package graft

import graft.load.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed-join plan contract (SCALING.md): two tables
  * bucketed on the join key with the same bucket count join WITHOUT a
  * shuffle exchange — the co-location is paid at write time. */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("join of co-bucketed tables plans with zero shuffle exchange") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_")
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the exchange-vs-bucket effect shows
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val events = (1 to 1000)
        .map(i => (s"u${i % 50}", i.toLong, i * 1.5))
        .toDF("user_email", "event_id", "value")
      val users = (0 until 50).map(i => (s"u$i", s"seg${i % 5}"))
        .toDF("user_email", "segment")
      Bucketing.writeBucketed(events, "graft_spec_ev",
        dir.resolve("ev").toString, "user_email", 8)
      Bucketing.writeBucketed(users, "graft_spec_us",
        dir.resolve("us").toString, "user_email", 8)

      val joined = s.table("graft_spec_ev")
        .join(s.table("graft_spec_us"), "user_email")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")

      // and it is result-identical to the plain join
      val plain = events.join(users, "user_email")
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == plain)

      // contrast: the same join over plain parquet DOES shuffle
      events.write.mode("overwrite").parquet(dir.resolve("flat").toString)
      val flat = s.read.parquet(dir.resolve("flat").toString)
        .join(s.table("graft_spec_us"), "user_email")
      assert(flat.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.sql("DROP TABLE IF EXISTS graft_spec_ev")
      s.sql("DROP TABLE IF EXISTS graft_spec_us")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
