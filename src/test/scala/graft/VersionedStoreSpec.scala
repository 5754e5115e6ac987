package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.load.VersionedStore
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the VersionedStore commit/read contracts the q_time_travel
  * oracle can't see from aggregates alone: partition-scoped rewrite
  * (untouched files carried BY REFERENCE into the next manifest),
  * optimistic-concurrency conflict on the manifest rename, snapshot
  * isolation, and manifest-level day pruning. */
class VersionedStoreSpec extends AnyFunSuite with SparkTestSession {

  private def ts(day: Int, h: Int = 9): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def events(rows: (Long, Timestamp, String, String, Double)*)
      : DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("event_id", "ts", "user_email", "habit", "value")
  }

  private def withStore[T](body: String => T): T = {
    val tmp = Files.createTempDirectory("graft_vspec_")
    try body(tmp.toString + "/store")
    finally FileUtils.deleteDirectory(tmp.toFile)
  }

  private def manifest(path: String, v: Int): Seq[String] = {
    val f = new java.io.File(f"$path/_log/$v%010d.manifest")
    scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty).toList
  }

  test("upsert rewrites only touched day partitions; untouched files " +
      "carry by reference") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0),
        (3L, ts(3), "b@x", "workout", 3.0)), store)
      // batch touches only Jan 2
      VersionedStore.upsert(spark, store,
        events((2L, ts(2), "a@x", "workout", 20.0)))
      val (m0, m1) = (manifest(store, 0).toSet, manifest(store, 1).toSet)
      val carried = m0.intersect(m1)
      assert(carried.forall(f => !f.contains("_vday=2024-01-02")))
      assert(carried.exists(_.contains("_vday=2024-01-01")) &&
        carried.exists(_.contains("_vday=2024-01-03")),
        s"Jan 1/3 files must carry untouched:\nv0=$m0\nv1=$m1")
      assert(m1.exists(f => f.contains("/c1/") &&
        f.contains("_vday=2024-01-02")), "Jan 2 must be rewritten by c1")
      val head = VersionedStore.snapshot(spark, store)
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(head == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
    }
  }

  test("ts-less keys widen the rewrite to the days where matches LIVE: " +
      "a cross-day match is merged, never duplicated") {
    withStore { store =>
      // dim-style store keyed on user_email only: each user's row can
      // live on ANY day, so a batch row must find its match even when
      // their ts days differ
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "b@x", "workout", 2.0)), store)
      // batch updates a@x but carries a Jan-3 ts: the match lives on
      // Jan 1, a day the batch itself never touches
      VersionedStore.upsert(spark, store,
        events((1L, ts(3), "a@x", "workout", 10.0)),
        keys = Seq("user_email"))
      val afterUpsert = VersionedStore.snapshot(spark, store)
        .select("user_email", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // one row per key — the Jan-1 original must NOT survive beside
      // the Jan-3 update
      assert(VersionedStore.snapshot(spark, store).count() == 2)
      assert(afterUpsert == Map("a@x" -> 10.0, "b@x" -> 2.0))
      // mergeInto through the same scoping: update b@x from a Jan-5
      // batch row; its Jan-2 home day must be rewritten
      VersionedStore.mergeInto(spark, store,
        events((2L, ts(5), "b@x", "workout", 20.0)),
        keys = Seq("user_email"))
      val afterMerge = VersionedStore.snapshot(spark, store)
        .select("user_email", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(VersionedStore.snapshot(spark, store).count() == 2)
      assert(afterMerge == Map("a@x" -> 10.0, "b@x" -> 20.0))
      // untouched-day carry still holds: a keyed batch whose match is
      // same-day must not rewrite other days' files
      val (m1, m2) = (manifest(store, 1).toSet, manifest(store, 2).toSet)
      assert(m1.intersect(m2).nonEmpty,
        s"unrelated files must carry by reference:\nv1=$m1\nv2=$m2")
    }
  }

  test("time travel: v0 is unchanged after later commits; append adds") {
    withStore { store =>
      VersionedStore.create(events((1L, ts(1), "a@x", "workout", 1.0)), store)
      VersionedStore.upsert(spark, store,
        events((1L, ts(1), "a@x", "workout", 9.0)))
      VersionedStore.append(spark, store,
        events((2L, ts(5), "b@x", "workout", 5.0)))
      assert(VersionedStore.versions(spark, store) == Seq(0, 1, 2))
      def vals(v: Int) = VersionedStore.snapshot(spark, store, Some(v))
        .select("value").collect().map(_.getDouble(0)).sorted.toSeq
      assert(vals(0) == Seq(1.0))
      assert(vals(1) == Seq(9.0))
      assert(vals(2) == Seq(5.0, 9.0))
    }
  }

  test("restore: a new head republishes the target version's files by " +
      "reference; history and metadata reads stay intact") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "b@x", "workout", 2.0)), store)
      VersionedStore.upsert(spark, store,
        events((1L, ts(1), "a@x", "workout", 9.0)))
      VersionedStore.delete(spark, store, col("event_id") === 2L)
      val rv = VersionedStore.restore(spark, store, 0)
      assert(rv == 3)
      assert(VersionedStore.versions(spark, store) == Seq(0, 1, 2, 3))
      // head reads exactly v0
      def vals(v: Option[Int]) = VersionedStore.snapshot(spark, store, v)
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(vals(None) == Map(1L -> 1.0, 2L -> 2.0))
      // metadata-only: the restore manifest lists v0's files verbatim
      // (meta lines differ — the restore carries its audit key)
      def files(v: Int) = manifest(store, v).filterNot(_.startsWith("#"))
      assert(files(3) == files(0))
      // the rolled-back versions remain time-travelable
      assert(vals(Some(1)) == Map(1L -> 9.0, 2L -> 2.0))
      assert(vals(Some(2)) == Map(1L -> 9.0))
      // commit audit trail
      assert(VersionedStore.commitMeta(spark, store, 3)
        .get("restoredFrom").contains("0"))
      // unknown target rejected
      intercept[IllegalArgumentException] {
        VersionedStore.restore(spark, store, 7)
      }
    }
  }

  test("commit conflict: a second writer publishing the same version fails") {
    withStore { store =>
      VersionedStore.create(events((1L, ts(1), "a@x", "workout", 1.0)), store)
      // two writers racing to publish the same version: the second
      // create-if-absent must lose loudly, not overwrite
      val published = manifest(store, 0)
      val e = intercept[IllegalStateException] {
        VersionedStore.writeManifest(spark, store, 0, Seq("other/file"))
      }
      assert(e.getMessage.contains("commit conflict"))
      // the loser must not have corrupted the published log
      assert(manifest(store, 0) == published)
    }
  }

  test("torn manifest read fails loudly instead of yielding a partial list") {
    withStore { store =>
      VersionedStore.create(events((1L, ts(1), "a@x", "workout", 1.0)), store)
      // a mid-write commit: manifest exists but lacks the end sentinel
      val torn = new java.io.File(f"$store/_log/${1}%010d.manifest")
      Files.writeString(torn.toPath, "data/c1/_vday=2024-01-01/part-0\n")
      val e = intercept[IllegalArgumentException] {
        VersionedStore.snapshot(spark, store, Some(1))
      }
      assert(e.getMessage.contains("torn manifest"))
    }
  }

  test("changes: manifest diff scans only differing days and classifies " +
      "insert/update/delete; unchanged rewrites drop out") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0),
        (3L, ts(3), "b@x", "workout", 3.0)), store)
      // rewrite Jan 2 with one real update + one insert; Jan 1/3 carry
      VersionedStore.upsert(spark, store, events(
        (2L, ts(2), "a@x", "workout", 20.0),
        (4L, ts(2, 12), "c@x", "workout", 4.0)))
      val cdf = VersionedStore.changes(spark, store, 0, 1)
      // only Jan 2 files are scanned on either side
      assert(cdf.inputFiles.forall(_.contains("_vday=2024-01-02")))
      val ops = cdf.select("op", "event_id_old", "event_id_new",
          "value_old", "value_new").collect()
        .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
        .toSet
      assert(ops == Set(("update", Some(2L), Some(2L)),
        ("insert", None, Some(4L))))
      // delete commit: b@x vanishes; Jan 3 was its only day, so the
      // day drops from the manifest file-level (no rewrite)
      VersionedStore.delete(spark, store, col("user_email") === "b@x")
      val del = VersionedStore.changes(spark, store, 1, 2).collect()
      assert(del.length == 1 &&
        del(0).getAs[String]("op") == "delete" &&
        del(0).getAs[Long]("event_id_old") == 3L)
      assert(manifest(store, 2).forall(f =>
        !f.contains("_vday=2024-01-03") || f == "#end"))
    }
  }

  test("restore publishes a new head with the old contents; history stays") {
    withStore { store =>
      VersionedStore.create(events((1L, ts(1), "a@x", "workout", 1.0)), store)
      VersionedStore.upsert(spark, store,
        events((1L, ts(1), "a@x", "workout", 9.0)))
      val v = VersionedStore.restore(spark, store, 0)
      assert(v == 2 && VersionedStore.versions(spark, store) == Seq(0, 1, 2))
      assert(VersionedStore.snapshot(spark, store)
        .select("value").head().getDouble(0) == 1.0)
      // the bad commit stays time-travelable
      assert(VersionedStore.snapshot(spark, store, Some(1))
        .select("value").head().getDouble(0) == 9.0)
    }
  }

  test("vacuum drops unreferenced files and old manifests only") {
    withStore { store =>
      VersionedStore.create(events((1L, ts(1), "a@x", "workout", 1.0)), store)
      VersionedStore.upsert(spark, store,
        events((1L, ts(1), "a@x", "workout", 9.0))) // rewrites Jan 1
      val removed = VersionedStore.vacuum(spark, store, retain = 1)
      assert(removed == 1, "v0's superseded Jan 1 file must be deleted")
      assert(VersionedStore.versions(spark, store) == Seq(1))
      assert(VersionedStore.snapshot(spark, store)
        .select("value").head().getDouble(0) == 9.0)
    }
  }

  test("incremental view: deltas create, mutate, and drop groups exactly") {
    val s = spark
    import s.implicits._
    import graft.load.IncrementalView
    val view = Seq(("g1", 2L, 300L), ("g2", 1L, 50L))
      .toDF("grp", "n", "sum_e6")
    val cdf = Seq(
      ("g1", "update", Some(100L), Some(150L)), // mutate in place
      ("g2", "delete", Some(50L), None),        // group drops at n=0
      ("g3", "insert", None, Some(70L)),        // group created
      ("g3", "insert", None, Some(30L)))
      .toDF("grp", "op", "value_old_e6", "value_new_e6")
    val out = IncrementalView.applyDelta(view, cdf, Seq("grp"),
        col("value_old_e6"), col("value_new_e6"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map("g1" -> ((2L, 350L)), "g3" -> ((2L, 100L))))
  }

  test("mergeInto: clause-gated delete/update/insert in SQL clause " +
      "order; untouched days carry by reference") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(1), "b@x", "workout", 5.0),
        (3L, ts(2), "c@x", "mood", 2.0),
        (4L, ts(3), "d@x", "mood", 7.0)), store) // day 3 untouched
      VersionedStore.mergeInto(spark, store, events(
        (9L, ts(1), "a@x", "workout", 3.0),  // matched, 3>1  → UPDATE
        (9L, ts(1), "b@x", "workout", -1.0), // matched, -1<0 → DELETE
        (9L, ts(2), "c@x", "mood", 1.0),     // matched, 1<2  → keep target
        (9L, ts(2), "e@x", "mood", 50.0),    // not matched   → INSERT
        (9L, ts(2), "f@x", "mood", 99.0)),   // not matched, gated out
        matchedUpdate = expr("s.value > t.value"),
        matchedDelete = expr("s.value < 0"),
        notMatchedInsert = expr("s.value <= 90"))
      val out = VersionedStore.snapshot(spark, store).collect()
        .map(r => r.getAs[String]("user_email") ->
          ((r.getAs[Long]("event_id"), r.getAs[Double]("value")))).toMap
      assert(out == Map(
        "a@x" -> ((9L, 3.0)),  // source row wins wholesale on update
        "c@x" -> ((3L, 2.0)),  // un-updated target survives
        "d@x" -> ((4L, 7.0)),  // untouched day
        "e@x" -> ((9L, 50.0))))
      // day 3 was never read or rewritten
      val (m0, m1) = (manifest(store, 0).toSet, manifest(store, 1).toSet)
      assert(m0.intersect(m1).exists(_.contains("_vday=2024-01-03")))
      // all-defaults mergeInto == upsert semantics
      VersionedStore.mergeInto(spark, store, events(
        (8L, ts(1), "a@x", "workout", 4.0)))
      assert(VersionedStore.snapshot(spark, store)
        .filter(col("user_email") === "a@x").head().getAs[Double]("value")
        == 4.0)
      // within-batch duplicate keys collapse to ONE source row before
      // the clauses run — the full-outer join never fans out
      VersionedStore.mergeInto(spark, store, events(
        (11L, ts(2), "e@x", "mood", 60.0),
        (12L, ts(2), "e@x", "mood", 70.0)))
      val e = VersionedStore.snapshot(spark, store)
        .filter(col("user_email") === "e@x").collect()
      assert(e.length == 1 &&
        Set(60.0, 70.0).contains(e.head.getAs[Double]("value")))
    }
  }

  test("z-ordered layout: per-day Morton rectangles prune files on " +
      "BOTH dimensions; double zone maps carry the value column") {
    val s = spark
    import s.implicits._
    // two days × an exact 8×8 (user, value) grid — quantile range
    // boundaries land on quadrant edges, so the 4 clusterParts are the
    // 4 (user≥4?, value≥4?) quadrants, 4 files per day
    val rows = for {
      d <- Seq(1, 2); u <- 0 until 8; v <- 0 until 8
    } yield ((d * 1000 + u * 8 + v).toLong, ts(d), u.toLong, "h",
      v.toDouble)
    val df = rows.toDF("event_id", "ts", "user_email", "habit", "value")
    withStore { store =>
      val z = graft.load.Layout.zValue(col("user_email"), 0, 8,
        col("value"), 0, 8, bits = 3)
      VersionedStore.create(df, store, clusterParts = 4,
        zorderBy = Some(z))
      val nAll = VersionedStore.snapshot(spark, store).inputFiles.length
      assert(nAll == 8, s"expected 2 days x 4 quadrant files, got $nAll")
      val byUser = VersionedStore.snapshotWhere(spark, store,
        "user_email", 0L, 3L)
      val byValue = VersionedStore.snapshotWhere(spark, store,
        "value", 5.0, 7.0)
      // each selection lives in one half of the space: at most the two
      // matching quadrants per day survive (+1 slack for a sampled
      // boundary cell)
      assert(byUser.inputFiles.length <= 5,
        s"user half-space must prune to <=5/8 files, " +
          s"kept ${byUser.inputFiles.length}")
      assert(byValue.inputFiles.length <= 5,
        s"value half-space must prune to <=5/8 files (double stats), " +
          s"kept ${byValue.inputFiles.length}")
      // exactness is untouched by layout
      assert(byUser.count() == 64 && byValue.count() == 48)
    }
    // clusterParts WITHOUT a z key: per-day ranges on the leading sort
    // column — the single-dimension form of the same layout
    withStore { store =>
      VersionedStore.create(df, store, clusterParts = 4)
      val nAll = VersionedStore.snapshot(spark, store).inputFiles.length
      assert(nAll == 8)
      val sel = VersionedStore.snapshotWhere(spark, store,
        "user_email", 0L, 1L)
      assert(sel.inputFiles.length <= 3,
        s"leading-column range must prune, kept ${sel.inputFiles.length}")
      assert(sel.count() == 32)
    }
    // OPTIMIZE ZORDER BY: an unclustered, append-accreted store (full-
    // range day files — nothing prunes) re-laid by compact into
    // quadrant files; rows preserved, pruning repaired
    withStore { store =>
      VersionedStore.create(df, store)
      VersionedStore.append(spark, store,
        df.filter(col("event_id") % 2 === 0)
          .withColumn("event_id", col("event_id") + 5000))
      val before = VersionedStore.snapshotWhere(spark, store,
        "user_email", 0L, 3L)
      assert(before.inputFiles.length ==
        VersionedStore.snapshot(spark, store).inputFiles.length,
        "unclustered day files must span the full key range (no prune)")
      val z = graft.load.Layout.zValue(col("user_email"), 0, 8,
        col("value"), 0, 8, bits = 3)
      assert(VersionedStore.compact(spark, store, maxFilesPerDay = 1,
        clusterParts = 4, zorderBy = Some(z)) == 2)
      val after = VersionedStore.snapshotWhere(spark, store,
        "user_email", 0L, 3L)
      assert(after.inputFiles.length <
        VersionedStore.snapshot(spark, store).inputFiles.length,
        "compacted z-order layout must prune the user half-space")
      assert(VersionedStore.snapshot(spark, store)
        .groupBy().count().head().getLong(0) == 192L) // 128 + 64, intact
    }
  }

  test("zRelation signs change-feed rows: insert +new, delete -old, " +
      "update both; keys pass through") {
    val s = spark
    import s.implicits._
    import graft.load.IncrementalView
    val cdf = Seq(
      (1L, "insert", None, Some(10.0)),
      (2L, "delete", Some(20.0), None),
      (3L, "update", Some(30.0), Some(35.0)))
      .toDF("k", "op", "v_old", "v_new")
    val z = IncrementalView.zRelation(cdf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(z == Set((1L, 10.0, 1L), (2L, 20.0, -1L),
      (3L, 35.0, 1L), (3L, 30.0, -1L)))
  }

  test("applyJoinDelta maintains a fact⋈dim aggregate through " +
      "two-sided change feeds, bit-equal to recompute") {
    val s = spark
    import s.implicits._
    import graft.load.IncrementalView
    def e6(c: org.apache.spark.sql.Column) = round(c * 1e6).cast("long")
    val contrib = e6(col("v") * col("w"))
    // A0: facts over keys 1..3; B0: dims for keys 1..3
    val a0 = Seq((1L, "x", 2.0), (1L, "y", 3.0), (2L, "x", 5.0),
      (3L, "y", 7.0)).toDF("k", "g", "v")
    val b0 = Seq((1L, 1.5), (2L, 2.0), (3L, 0.5)).toDF("k", "w")
    // ΔA: re-value (1,x), delete (3,y), insert (2,y)
    val cdfA = Seq(
      (1L, "x", "update", Some(2.0), Some(4.0)),
      (3L, "y", "delete", Some(7.0), None),
      (2L, "y", "insert", None, Some(1.0)))
      .toDF("k", "g", "op", "v_old", "v_new")
    // ΔB: reweight key 2, delete key 1 (kills two old facts + the new
    // one via A_old⋈ΔB and ΔA⋈B_new respectively)
    val cdfB = Seq(
      (2L, "update", Some(2.0), Some(3.0)),
      (1L, "delete", Some(1.5), None))
      .toDF("k", "op", "w_old", "w_new")
    val a1 = Seq((1L, "x", 4.0), (1L, "y", 3.0), (2L, "x", 5.0),
      (2L, "y", 1.0)).toDF("k", "g", "v")
    val b1 = Seq((2L, 3.0), (3L, 0.5)).toDF("k", "w")
    val mv0 = IncrementalView.fromSnapshot(a0.join(b0, "k"), Seq("g"), contrib)
    val inc = IncrementalView.applyJoinDelta(mv0,
        IncrementalView.zRelation(cdfA), b1, a0,
        IncrementalView.zRelation(cdfB), Seq("k"), Seq("g"), contrib)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val full = IncrementalView.fromSnapshot(a1.join(b1, "k"), Seq("g"), contrib)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(inc == full)
    // only (2,x)·3.0 = 15e6 and (2,y)·3.0 = 3e6 survive
    assert(inc == Map("x" -> ((1L, 15000000L)), "y" -> ((1L, 3000000L))))
  }

  test("applyJoinDelta rejects overlapping non-key columns") {
    val s = spark
    import s.implicits._
    import graft.load.IncrementalView
    val z = IncrementalView.zRelation(
      Seq((1L, "insert", None: Option[Double], Some(1.0)))
        .toDF("k", "op", "v_old", "v_new"))
    val ex = intercept[IllegalArgumentException] {
      IncrementalView.applyJoinDelta(
        Seq(("g", 1L, 1L)).toDF("g", "n", "sum_e6"),
        z, Seq((1L, 1.0)).toDF("k", "v"),
        Seq((1L, 1.0)).toDF("k", "v"), z, Seq("k"), Seq("g"), lit(0L))
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("schema evolution: an evolve commit widens rewritten days; " +
      "carried days read null; the feed sees the new column") {
    val s = spark
    import s.implicits._
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0)), store)
      val batch = events((2L, ts(2), "a@x", "workout", 20.0))
        .withColumn("channel", lit("reimport"))
      VersionedStore.upsert(spark, store, batch, evolve = true)
      val head = VersionedStore.snapshot(spark, store)
        .select("event_id", "channel").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      // Jan 1 carried with the old schema -> null; Jan 2 rewritten wide
      assert(head == Map(1L -> None, 2L -> Some("reimport")))
      val cdf = VersionedStore.changes(spark, store, 0, 1)
      val row = cdf.collect()
      assert(row.length == 1 && row(0).getAs[String]("op") == "update")
      assert(Option(row(0).getAs[String]("channel_old")).isEmpty &&
        row(0).getAs[String]("channel_new") == "reimport")
    }
  }

  test("manifest-level day pruning selects files before the scan") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0)), store)
      val pruned = VersionedStore.snapshot(spark, store,
        days = Some(Set("2024-01-02")))
      assert(pruned.inputFiles.length == 1 &&
        pruned.inputFiles(0).contains("_vday=2024-01-02"))
      assert(pruned.select("event_id").collect().map(_.getLong(0)).toSeq
        == Seq(2L))
      // fully pruned day set keeps the schema, reads nothing
      val none = VersionedStore.snapshot(spark, store,
        days = Some(Set("2030-01-01")))
      assert(none.count() == 0 &&
        none.columns.toSeq == pruned.columns.toSeq)
    }
  }

  test("zone-map skipping: a key-range read opens only files whose " +
      "stats overlap; results stay exact") {
    withStore { store =>
      val users = ('a' to 'h').map(c => s"$c@x")
      def day(d: Int) = events(users.flatMap(u => Seq(
        (u.hashCode.toLong * 10 + d, ts(d), u, "workout", 1.0),
        (u.hashCode.toLong * 10 + d + 1, ts(d), u, "sleep", 7.0))): _*)
      VersionedStore.create(day(1), store, rangeParts = 4)
      VersionedStore.append(spark, store, day(2), rangeParts = 4)

      val all = VersionedStore.snapshot(spark, store)
      val one = VersionedStore.snapshotWhere(spark, store,
        "user_email", "d@x", "d@x")
      // range clustering puts one user in one file per day-commit
      assert(all.inputFiles.length > 2)
      assert(one.inputFiles.length < all.inputFiles.length)
      val expect = all.filter(col("user_email") === "d@x")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(one.select("event_id").collect().map(_.getLong(0)).sorted
        .toSeq == expect && expect.size == 4)

      // day pruning and zone maps compose multiplicatively
      val dayOne = VersionedStore.snapshotWhere(spark, store,
        "user_email", "d@x", "d@x", days = Some(Set("2024-01-01")))
      assert(dayOne.inputFiles.length < one.inputFiles.length)
      assert(dayOne.count() == 2)

      // deleting one commit's sidecar degrades THAT commit to full
      // scan — never wrong rows
      assert(new java.io.File(f"$store/_log/${0}%010d.stats").delete())
      val fallback = VersionedStore.snapshotWhere(spark, store,
        "user_email", "d@x", "d@x")
      assert(fallback.inputFiles.length > one.inputFiles.length)
      assert(fallback.select("event_id").collect().map(_.getLong(0))
        .sorted.toSeq == expect)
    }
  }

  test("compact coalesces oversized days into fresh clustered files, " +
      "preserves rows and history, re-records zone maps") {
    withStore { store =>
      val users = ('a' to 'h').map(c => s"$c@x")
      def batch(d: Int, off: Int) = events(users.map(u =>
        (u.hashCode.toLong * 100 + d * 10 + off, ts(d), u, s"h$off", 1.0))
        : _*)
      VersionedStore.create(batch(1, 0), store, rangeParts = 4)
      VersionedStore.append(spark, store, batch(1, 1), rangeParts = 4)
      VersionedStore.append(spark, store, batch(2, 0)) // day 2: one file
      val liveBefore = manifest(store, 2).init.filterNot(_.startsWith("#"))
      val rowsBefore = VersionedStore.snapshot(spark, store)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq

      val v = VersionedStore.compact(spark, store, maxFilesPerDay = 1,
        rangeParts = 2)
      assert(v == 3)
      val liveAfter = manifest(store, 3).init.filterNot(_.startsWith("#"))
      assert(liveAfter.size < liveBefore.size)
      // day 2 was compliant — its file carries by reference
      assert(liveAfter.filter(_.contains("_vday=2024-01-02")) ==
        liveBefore.filter(_.contains("_vday=2024-01-02")))
      // rows identical; history intact
      assert(VersionedStore.snapshot(spark, store)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        == rowsBefore)
      assert(VersionedStore.snapshot(spark, store, Some(1)).count()
        == users.size * 2)
      // fresh sidecars: the compacted layout still range-prunes
      val one = VersionedStore.snapshotWhere(spark, store,
        "user_email", "a@x", "a@x")
      assert(one.inputFiles.length <
        VersionedStore.snapshot(spark, store).inputFiles.length)
      assert(one.count() == 3) // a@x: two day-1 habits + one day-2
      // compliant store: compact is a metadata no-op returning head
      assert(VersionedStore.compact(spark, store, maxFilesPerDay = 2,
        rangeParts = 2) == 3)
    }
  }

  test("bloom point skipping: an id lookup opens only files whose " +
      "bloom may contain it; absent ids read nothing") {
    withStore { store =>
      def day(d: Int) = events((1 to 4).map(i =>
        (d * 100L + i, ts(d), s"u$i@x", "workout", i.toDouble)): _*)
      VersionedStore.create(day(1), store, bloomCols = Seq("event_id"))
      VersionedStore.append(spark, store, day(2),
        bloomCols = Seq("event_id"))
      VersionedStore.append(spark, store, day(3),
        bloomCols = Seq("event_id"))
      val all = VersionedStore.snapshot(spark, store)
      assert(all.inputFiles.length == 3)

      val hit = VersionedStore.snapshotPoint(spark, store,
        "event_id", 203L)
      assert(hit.inputFiles.length == 1)
      val r = hit.collect()
      assert(r.length == 1 && r(0).getAs[Long]("event_id") == 203L &&
        r(0).getAs[String]("user_email") == "u3@x")

      // absent id: every bloom says no — nothing is scanned
      val none = VersionedStore.snapshotPoint(spark, store,
        "event_id", 999L)
      assert(none.inputFiles.length == 0 && none.count() == 0)
    }
    // store written WITHOUT blooms: the multi-column zone maps still
    // prune (every eligible column gets footer stats), rows exact
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0)), store)
      val hit = VersionedStore.snapshotPoint(spark, store,
        "event_id", 2L)
      assert(hit.inputFiles.length == 1)
      assert(hit.collect().map(_.getAs[Long]("event_id")).toSeq ==
        Seq(2L))
    }
  }

  test("maintain = compact + vacuum in one call; compliant stores " +
      "no-op both halves") {
    withStore { store =>
      def batch(off: Int) = events(('a' to 'd').map(u =>
        (u.toLong * 10 + off, ts(1), s"$u@x", s"h$off", 1.0)): _*)
      VersionedStore.create(batch(0), store)
      VersionedStore.append(spark, store, batch(1))
      VersionedStore.append(spark, store, batch(2))
      // day 1 now has 3 files; history has 3 versions
      val (head, removed) = VersionedStore.maintain(spark, store,
        maxFilesPerDay = 1, retainVersions = 1)
      assert(head == 3)
      assert(removed == 3) // the three pre-compaction day files
      assert(VersionedStore.versions(spark, store) == Seq(3))
      assert(VersionedStore.snapshot(spark, store).count() == 12)
      // already compliant: nothing published, nothing deleted
      assert(VersionedStore.maintain(spark, store,
        maxFilesPerDay = 1, retainVersions = 1) == (3, 0))
    }
  }

  test("schema enforcement: retyped or unknown batch columns fail the " +
      "commit; evolve opts in deliberately") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0)), store)
      val retyped = events((2L, ts(2), "a@x", "workout", 2.0))
        .withColumn("value", col("value").cast("string"))
      val e1 = intercept[IllegalArgumentException] {
        VersionedStore.append(spark, store, retyped)
      }
      assert(e1.getMessage.contains("never retypes"))
      val widened = events((3L, ts(3), "a@x", "workout", 3.0))
        .withColumn("mood", lit(7L))
      intercept[IllegalArgumentException] {
        VersionedStore.append(spark, store, widened)
      }
      intercept[IllegalArgumentException] {
        VersionedStore.upsert(spark, store, widened)
      }
      // nothing was published by the failed commits
      assert(VersionedStore.versions(spark, store) == Seq(0))
      VersionedStore.upsert(spark, store, widened, evolve = true)
      val snap = VersionedStore.snapshot(spark, store)
      assert(snap.columns.contains("mood") && snap.count() == 2)
    }
  }

  test("snapshotWithLineage attributes each row to the commit that " +
      "wrote its current file") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0),
        (2L, ts(2), "a@x", "workout", 2.0)), store)
      VersionedStore.append(spark, store, events(
        (3L, ts(3), "b@x", "sleep", 7.0)))
      def byCommit = VersionedStore.snapshotWithLineage(spark, store)
        .groupBy("_commit").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byCommit == Map(0 -> 2L, 1 -> 1L))
      // rewriting day 2 re-attributes its rows to the rewriting commit
      VersionedStore.upsert(spark, store, events(
        (2L, ts(2), "a@x", "workout", 20.0)))
      assert(byCommit == Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
    }
  }

  test("multi-column zone maps: any recorded column with disjoint " +
      "per-file ranges prunes, not just the clustering key") {
    withStore { store =>
      def batch(base: Long) = events((0 until 4).map(i =>
        (base + i, ts(1), s"u$i@x", "workout", 1.0)): _*)
      VersionedStore.create(batch(1L), store)
      VersionedStore.append(spark, store, batch(101L))
      // same day, two files; event_id is NOT the clustering key but
      // its per-file ranges are disjoint — stats prune on it anyway
      val hit = VersionedStore.snapshotWhere(spark, store,
        "event_id", 101L, 104L)
      assert(hit.inputFiles.length == 1)
      assert(hit.count() == 4)
    }
  }

  test("metadata aggregates answer without touching data files; " +
      "missing stats fall back or decline") {
    withStore { store =>
      VersionedStore.create(events(
        (5L, ts(1), "a@x", "workout", 1.0),
        (9L, ts(1), "a@x", "sleep", 7.0)), store)
      VersionedStore.append(spark, store, events(
        (2L, ts(2), "b@x", "workout", 1.0)))
      assert(VersionedStore.snapshotRowCount(spark, store) == 3L)
      assert(VersionedStore.snapshotMinMaxLong(spark, store, "event_id")
        == Some((2L, 9L)))
      // day pruning composes
      assert(VersionedStore.snapshotRowCount(spark, store,
        days = Some(Set("2024-01-01"))) == 2L)

      // the no-scan proof: destroy every data file — metadata answers
      val dataDir = new java.io.File(s"$store/data")
      org.apache.commons.io.FileUtils.listFiles(dataDir, null, true)
        .forEach(f => assert(f.delete()))
      assert(VersionedStore.snapshotRowCount(spark, store) == 3L)
      assert(VersionedStore.snapshotMinMaxLong(spark, store, "event_id")
        == Some((2L, 9L)))
      // a non-integral column declines rather than risking truncation
      assert(VersionedStore.snapshotMinMaxLong(spark, store,
        "user_email").isEmpty)
    }
  }

  test("commit constraints: a violating batch throws and writes " +
      "nothing; a clean batch commits") {
    import graft.ext.Expectations.{Complete, InRange}
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0)), store)
      val suite = Seq(Complete("user_email"),
        InRange("value", 0.0, 10.0))
      val bad = events((2L, ts(2), "a@x", "workout", 99.0))
      val e = intercept[IllegalArgumentException] {
        VersionedStore.appendChecked(spark, store, bad, suite)
      }
      assert(e.getMessage.contains("in_range(value)"))
      assert(VersionedStore.versions(spark, store) == Seq(0))
      assert(VersionedStore.snapshot(spark, store).count() == 1)

      val good = events((2L, ts(2), "a@x", "workout", 9.0))
      assert(VersionedStore.appendChecked(spark, store, good, suite) == 1)
      assert(VersionedStore.snapshot(spark, store).count() == 2)
      // upsert path shares the gate
      intercept[IllegalArgumentException] {
        VersionedStore.upsertChecked(spark, store, bad, suite)
      }
      assert(VersionedStore.versions(spark, store) == Seq(0, 1))
    }
  }

  test("appendWithRetry: loses to a mid-flight winner, then rebases " +
      "once the winner publishes") {
    withStore { store =>
      VersionedStore.create(events(
        (1L, ts(1), "a@x", "workout", 1.0)), store)
      // a concurrent winner has claimed data/c1 but not yet published:
      // the loser must keep targeting v1 (skipping ahead would lose
      // the winner's update) and fail loudly when attempts run out
      val claimed = new java.io.File(s"$store/data/c1")
      assert(claimed.mkdirs())
      java.nio.file.Files.writeString(
        claimed.toPath.resolve("placeholder"), "winner in flight")
      val batch = events((2L, ts(2), "a@x", "workout", 2.0))
      intercept[Exception] {
        VersionedStore.appendWithRetry(spark, store, batch, attempts = 2)
      }
      // the winner publishes v1 (metadata-only here); the retry now
      // rebases onto the new head and lands v2
      VersionedStore.writeManifest(spark, store, 1,
        manifest(store, 0).init.filterNot(_.startsWith("#")))
      val v = VersionedStore.appendWithRetry(spark, store, batch,
        attempts = 3)
      assert(v == 2)
      assert(VersionedStore.snapshot(spark, store)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L))
    }
  }

  test("empty versions are legal: delete-all / merge-delete-all read " +
      "as zero rows under the recorded schema, and the store recovers") {
    withStore { store =>
      val df = events((1L, ts(1), "a@x", "h", 1.0), (2L, ts(2), "a@x", "h", 2.0))
      VersionedStore.create(df, store)
      // deleting EVERY row publishes an empty version — SQL semantics
      // say the table now reads as zero rows, not as corruption
      // (ScalaCheck found this via a mergeInto whose delete clause
      // matched the whole store)
      val v1 = VersionedStore.delete(spark, store, col("value") >= 0)
      val empty = VersionedStore.snapshot(spark, store, Some(v1))
      assert(empty.count() == 0)
      assert(empty.schema.fieldNames.toSeq ==
        Seq("event_id", "ts", "user_email", "habit", "value"))
      assert(VersionedStore.snapshotRowCount(spark, store, Some(v1)) == 0L)
      assert(VersionedStore.snapshotWhere(spark, store, "event_id",
        0L, 99L, Some(v1)).count() == 0)
      // mergeInto with a delete-everything clause on a re-created store
      VersionedStore.append(spark, store, df)
      val v3 = VersionedStore.mergeInto(spark, store, df,
        matchedDelete = lit(true), notMatchedInsert = lit(false))
      assert(VersionedStore.snapshot(spark, store, Some(v3)).count() == 0)
      // the store recovers: a later commit on the empty head works and
      // time travel still reads every prior state
      VersionedStore.append(spark, store,
        events((9L, ts(3), "b@x", "h", 3.0)))
      assert(VersionedStore.snapshot(spark, store).count() == 1)
      assert(VersionedStore.snapshot(spark, store, Some(0)).count() == 2)
    }
  }

  test("zone-map stats on integral keys compare numerically") {
    withStore { store =>
      val s = spark
      import s.implicits._
      val df = (1L to 12L).map(u => (u, ts(1), u, "h", 1.0))
        .toDF("event_id", "ts", "user_id", "habit", "value")
      VersionedStore.create(df, store,
        sortCols = Seq("user_id", "ts"), rangeParts = 3)
      val all = VersionedStore.snapshot(spark, store)
      val out = VersionedStore.snapshotWhere(spark, store,
        "user_id", 10, 11)
      // lexical compare would order "2" > "10" and mis-prune
      assert(out.select("user_id").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(10L, 11L))
      assert(all.inputFiles.length >= 2 &&
        out.inputFiles.length < all.inputFiles.length)
    }
  }
}
