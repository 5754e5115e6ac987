package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Extension scope (SURVEY.md §7.5; driver table `embeddings`).
  *
  * The LSH planes are derived from md5 — pseudo-random but fully
  * deterministic and reproducible in ANY engine from the formula
  * `plane[j][d] = (int(md5(\"j,d\")[0:15 hex]) mod 2001 − 1000) / 1000`,
  * so an external oracle can regenerate them without sharing code. Spark
  * gets them as a broadcast literal (computed once on the driver).
  *
  * Scale notes (100 TB): brute-force is a broadcast of the (small) query
  * set against a partitioned scan of the corpus — linear, no shuffle
  * until the per-query top-k (TakeOrdered-style). The LSH variant joins
  * on the bucket id: corpus hashed once, candidates are bucket-local.
  */
object Similarity {

  val NumPlanes = 16
  val Dim = 64

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** First 60 bits of md5 as a non-negative long — same value as
    * Spark SQL `conv(substr(md5(s),1,15),16,10)` and DuckDB
    * `('0x'||substr(md5(s),1,15))::UBIGINT`. */
  def md5H60(s: String): Long = java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  /** Deterministic pseudo-random hyperplanes in [-1, 1]^dim. */
  def planes(nPlanes: Int = NumPlanes, dim: Int = Dim): Seq[Seq[Double]] =
    (0 until nPlanes).map(j => (0 until dim).map(d =>
      (md5H60(s"$j,$d") % 2001 - 1000) / 1000.0))

  /** Random-hyperplane LSH bucket id: bit j = sign(v · plane_j), packed
    * little-endian into a long. 16 planes → 65536 buckets. */
  def lshBucket(v: Column, nPlanes: Int = NumPlanes, dim: Int = Dim): Column =
    lshBucketBand(v, 0, nPlanes, dim)

  /** Bucket id for band `band` of a multi-band LSH scheme: band b draws
    * from the global deterministic plane sequence at indices
    * [b·nPlanes, (b+1)·nPlanes), so bands are independent hash
    * functions and each stays oracle-reproducible from the md5 formula.
    * `lshBucket` is band 0. */
  def lshBucketBand(v: Column, band: Int, nPlanes: Int,
      dim: Int = Dim): Column =
    planes((band + 1) * nPlanes, dim).drop(band * nPlanes).zipWithIndex.map {
      case (p, j) =>
        when(Dedup.dotNative(v, typedLit(p)) >= 0, lit(1L << j))
          .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k by cosine for each query vector (brute force).
    * `queries` should be small (it is broadcast); ranking uses the
    * 4-dp-rounded similarity with id tiebreak so the cut is total-order
    * deterministic.
    *
    * Scoring is map-side (broadcast join, no shuffle); before the
    * per-query ranking window each scan partition is cut to its LOCAL
    * top-k per query (sortWithinPartitions + a streaming counter — the
    * global top-k is a subset of every partition-local top-k, so this
    * is lossless). The window therefore shuffles O(partitions × q × k)
    * rows instead of the full n × q scored relation — the difference
    * between a bounded and a corpus-sized shuffle at 100 TB. */
  /** Chunk → document embedding MEAN POOLING — how document vectors
    * derive from passage/chunk vectors in real retrieval pipelines:
    * dimension-wise mean over each group's chunk embeddings. Emitted
    * in integer micro-units for engine-exact replay: components
    * quantize at 1e-6 BEFORE the sum (order-independent longs), the
    * mean is one textually-mirrored floor(sum/n) per dimension, and no
    * float ever crosses an aggregation boundary. (L2-normalize
    * downstream with [[withNorm]] when cosine geometry is needed —
    * kept out of here so the pooled relation stays integer.)
    *
    * Output: one row per group — `(groupCol, n_chunks, dim, pooled)`
    * exploded by dimension, ready for re-assembly or direct join into
    * the int-quantized kNN stack ([[knnQuantizedInt8]] precedent).
    *
    * Scale shape (100 TB): one narrow dimension explode (rows ×
    * dim — the transpose every distributed mean-pool pays), one
    * (group, dim) aggregate with map-side partials, nothing else. No
    * windows, no joins, no driver state. */
  def meanPoolQuantized(embs: DataFrame, groupExpr: Column,
      vecCol: String, groupAs: String = "group_id"): DataFrame =
    embs
      .select(groupExpr.as(groupAs), posexplode(col(vecCol))
        .as(Seq("dim", "x")))
      .select(col(groupAs), col("dim"),
        floor(col("x").cast("double") * 1e6 + 0.5).cast("long").as("qx"))
      .groupBy(col(groupAs), col("dim"))
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n_chunks"))
      .select(col(groupAs), col("n_chunks"), col("dim"),
        floor(col("sq").cast("double") / col("n_chunks").cast("double"))
          .cast("long").as("pooled"))

  def knnBruteForce(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = Dedup.withNorm(corpus, idCol, vecCol, "nn_id", "cv")
    val q = Dedup.withNorm(queries, idCol, vecCol, "query_id", "qv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        round(Dedup.dotNative(col("qv"), col("cv")) /
          (col("qv_nrm") * col("cv_nrm")), 4).as("cos_sim"))
      // zero-norm vectors are excluded upstream in withNorm (ANSI 0/0
      // raises); the isnan guard remains for NaN-element vectors, whose
      // NaN cosine would rank FIRST under Spark's NaN-is-largest sort
      .filter(!isnan(col("cos_sim")))
    val pruned = localTopK(scored, k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("nn_id"))
    pruned
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Partition-local per-query top-k over a (query_id, nn_id, cos_sim)
    * relation: local sort (no shuffle) in window order, then a streaming
    * counter keeps the first `k` rows of each query per partition. */
  private def localTopK(scored: DataFrame, k: Int,
      scoreCol: String = "cos_sim"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(scored.schema)
    scored
      .sortWithinPartitions(col("query_id"), col(scoreCol).desc,
        col("nn_id"))
      .mapPartitions { it =>
        var cur: Any = null
        var seen = 0
        it.filter { r =>
          val qid = r.get(0)
          if (qid != cur) { cur = qid; seen = 0 }
          seen += 1
          seen <= k
        }
      }(enc)
  }

  /** IVF-style ANN: partition the corpus into `nCentroids` cells (each
    * vector assigned to its max-cosine centroid), probe the query's
    * `nProbes` nearest cells, exact-rank within the probed candidates.
    *
    * Centroids are the first `nCentroids` corpus vectors by id —
    * deterministic seeding, OR pass `trained` centroids from
    * [[kmeansFit]] for data-adaptive cells (better balance → better
    * recall per probe; same plan shape). Assignment ties break by
    * centroid id on the 6-dp-rounded cosine so any engine reproduces
    * the same cells.
    *
    * Plan shape at scale: corpus×centroids is a broadcast nested loop
    * over a tiny build side (centroid count), the probe join is an
    * equi-join on cell id — linear in the corpus, like [[knnLsh]] but
    * with data-adaptive cells. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16,
      nProbes: Int = 4, trained: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val sp = corpus.sparkSession
    import sp.implicits._
    // "first nCentroids by id" literally — filter(id < n) would silently
    // yield zero centroids (and an empty result) for non-0-based ids
    val centSrc = trained match {
      case Some(cs) =>
        // withNorm casts to array<double> — hand the doubles over as-is
        cs.zipWithIndex.map { case (c, j) => (j.toLong, c) }
          .toDF(idCol, vecCol)
      case None => corpus.orderBy(col(idCol)).limit(nCentroids)
    }
    val cents = Dedup.withNorm(centSrc, idCol, vecCol, "cent_id", "ce")
    ivfSearch(ivfAssign(corpus, idCol, vecCol, cents), cents, queries,
      idCol, vecCol, k, nProbes)
  }

  /** 6-dp-rounded centroid cosine — the shared assignment score of the
    * IVF halves; the rounding + cent_id tie-break make cell choices
    * engine-reproducible. */
  private def centCos: Column =
    round(Dedup.dotNative(col("v"), col("ce")) /
      (col("v_nrm") * col("ce_nrm")), 6)

  /** Inverted-list ASSIGNMENT — the index-BUILD half of [[knnIvf]],
    * exposed so the postings relation can be MAINTAINED (appended per
    * ingest tick against frozen centroids) instead of rebuilt per
    * query: each corpus vector meets the broadcast centroids once and
    * lands in its single nearest cell.
    *
    * @param cents `Dedup.withNorm(centSrc, idCol, vecCol, "cent_id",
    *              "ce")` — the broadcast-sized centroid relation
    * @return (nn_id, cv, cv_nrm, cell) — the inverted-list layout */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val byCell = Window.partitionBy(col("id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    Dedup.withNorm(corpus, idCol, vecCol, "id", "v")
      .join(broadcast(cents))
      .select(col("id"), col("v"), col("v_nrm"), col("cent_id"),
        centCos.as("cent_cos"))
      .withColumn("_r", row_number().over(byCell))
      .filter(col("_r") === 1) // corpus vector -> single nearest cell
      .select(col("id").as("nn_id"), col("v").as("cv"),
        col("v_nrm").as("cv_nrm"), col("cent_id").as("cell"))
  }

  /** Probe-side SEARCH over a prebuilt postings relation — the other
    * half of [[knnIvf]]: queries probe their `nProbes` nearest cells,
    * the probe join is an equi-join on the cell id, and unprobed cells
    * are never scanned. */
  def ivfSearch(postings: DataFrame, cents: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Int): DataFrame = {
    val q = Dedup.withNorm(queries, idCol, vecCol, "id", "v")
      .join(broadcast(cents))
      .select(col("id"), col("v"), col("v_nrm"), col("cent_id"),
        centCos.as("cent_cos"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("cent_cos").desc, col("cent_id"))))
      .filter(col("_r") <= nProbes) // query probes its nProbes cells
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("v_nrm").as("qv_nrm"), col("cent_id").as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("nn_id"))
    postings.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        round(Dedup.dotNative(col("qv"), col("cv")) /
          (col("qv_nrm") * col("cv_nrm")), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim"))) // zero-norm guard, see knnBruteForce
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ── K-means centroid training (Lloyd's iterations) ──────────────────

  /** Candidate-sample size for [[farthestSeedVecs]]: large enough that
    * every well-separated region of the corpus lands candidates in the
    * md5-rank sample with overwhelming probability, small enough that
    * the driver-local O(M·k·dim) farthest-point pass is negligible.
    * Shared with the DuckDB oracle ([[graft.SparkEntry]]'s
    * `kmeansSeedSql`) so both engines sample the identical id set. */
  def seedSampleSize(k: Int): Int = math.max(1024, 16 * k)

  /** Deterministic SCATTERED seeding for the Lloyd's trainers —
    * farthest-point (k-center) picks over a bounded candidate sample.
    * ONE Spark job collects the [[seedSampleSize]] md5-rank-smallest
    * rows (a uniform, id-layout-independent draw; TakeOrdered =
    * partition-local top-M + driver merge, so only M×dim doubles move).
    * Farthest-point then runs DRIVER-LOCALLY on the sample: seed 0 is
    * the md5-rank minimum (the sample's first row); each further seed
    * maximizes squared-L2 distance to its nearest already-picked seed,
    * ties broken by id ascending. A first-k-by-id rule seeds a single
    * region of an id-sorted corpus; farthest-point over a uniform
    * sample hits every well-separated region regardless of id layout.
    *
    * Round 6 shipped this as k−1 sequential driver-blocking full-corpus
    * jobs (O(k²/2) distance work, k job barriers — 16.6 s in the
    * driver's bench run and a 100 TB scale-killer); the sample form is
    * one pass, total-work-bounded, and unchanged in RESULT whenever the
    * corpus has ≤ M rows (every spec fixture and the sf0.01 gate).
    *
    * Exactness: distances are direct Σ(aᵢ−bᵢ)² folds in doubles — on
    * int8 codes every term is an integer far below 2^53, so the argmax
    * (and therefore the seed sequence) is engine-exact and the DuckDB
    * oracle replays it from the same sample. The sample itself is
    * re-sorted driver-side by (md5(id), id), so correctness does not
    * lean on collect() preserving TakeOrdered's output order. */
  private def farthestSeedVecs(base: DataFrame, idCol: String,
      k: Int): Seq[Seq[Double]] = {
    val (ids, vecs) = md5RankSample(base, idCol, seedSampleSize(k))
    if (vecs.isEmpty) return Nil
    fpPickLocal(ids, vecs, k).map(vecs(_).toSeq)
  }

  /** The ONE seeding job: collect the `m` md5-rank-smallest `(id, v)`
    * rows of `base` (TakeOrdered — partition-local top-m + driver
    * merge), re-sorted driver-side by (md5(id), id) so correctness does
    * not lean on collect() preserving output order. Shared between the
    * whole-vector seeder and the per-subspace PQ seeders (which slice
    * the SAME sample, so the oracle replays one `cand` CTE for all). */
  private def md5RankSample(base: DataFrame, idCol: String,
      m: Int): (Array[Any], Array[Array[Double]]) = {
    val sample = base.select(col(idCol).as("_sid"),
        col("v").cast("array<double>").as("_sv"))
      .orderBy(md5(col("_sid").cast("string")), col("_sid"))
      .limit(m).collect()
    def cmpIds(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val rows = sample.sortWith { (a, b) =>
      val (ha, hb) = (md5Hex(a.get(0).toString), md5Hex(b.get(0).toString))
      val c = ha.compareTo(hb)
      if (c != 0) c < 0 else cmpIds(a.get(0), b.get(0)) < 0
    }
    (rows.map(_.get(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  /** Driver-local farthest-point (k-center) pass over an in-memory
    * sample: index 0 is always picked first; each further pick
    * maximizes min squared-L2 distance to the picked set, ties by id
    * ascending. Returns picked INDICES in pick order. */
  private def fpPickLocal(ids: Array[Any], vecs: Array[Array[Double]],
      k: Int): Seq[Int] = {
    def cmpIds(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val n = vecs.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val picked = scala.collection.mutable.ArrayBuffer[Int](0)
    val isPicked = new Array[Boolean](n); isPicked(0) = true
    val minD2 = Array.fill(n)(Double.PositiveInfinity)
    while (picked.size < math.min(k, n)) {
      val last = vecs(picked.last)
      var i = 0
      while (i < n) {
        if (!isPicked(i)) {
          val d = d2(vecs(i), last)
          if (d < minD2(i)) minD2(i) = d
        }
        i += 1
      }
      var best = -1
      i = 0
      while (i < n) {
        if (!isPicked(i) && (best < 0 || minD2(i) > minD2(best) ||
            (minD2(i) == minD2(best) && cmpIds(ids(i), ids(best)) < 0)))
          best = i
        i += 1
      }
      picked += best; isPicked(best) = true
    }
    picked.toSeq
  }

  /** Train `k` centroids with Lloyd's algorithm — the centroid-learning
    * step that upgrades [[knnIvf]]'s deterministic seed cells to
    * data-adaptive ones (IVF index build), and the workhorse of
    * embedding-space clustering for corpus curation.
    *
    * Deterministic: seeds come from [[farthestSeedVecs]] (scattered
    * farthest-point picks — id-layout independent, unlike the
    * first-k-by-id rule [[knnIvf]]'s untrained path uses), assignment
    * ties break on centroid index. Each
    * iteration is (1) a map-side argmin over a broadcast centroid
    * literal — no shuffle, no join — and (2) one per-dimension average
    * (`posexplode` → partial-aggregating groupBy on (cell, dim)). Only
    * the k×dim centroid matrix ever reaches the driver, like any
    * fixed-size sketch; the corpus never does. A cell that loses all
    * members keeps its previous centroid.
    *
    * Returns (final centroids, assignment relation `(idCol, cluster)`).
    * Float means depend on summation order, so assignments near a cell
    * boundary are engine-specific — pin results with a spec/purity
    * check, not a cell-exact oracle.
    */
  def kmeansFit(e: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): (Seq[Seq[Double]], DataFrame) = {
    require(k > 0 && iterations >= 0)
    val base = e.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Seq[Seq[Double]] = farthestSeedVecs(base, idCol, k)
    require(centroids.size == k,
      s"kmeansFit: need at least $k vectors, found ${centroids.size}")

    // argmin over squared L2 ⇔ argmax of (v·c − |c|²/2); the dot rides
    // the codegen'd native expression, one term per centroid
    def assignCol(cs: Seq[Seq[Double]]): Column =
      array_min(array(cs.zipWithIndex.map { case (c, j) =>
        val negHalfNorm = -c.map(x => x * x).sum / 2
        struct((-(Dedup.dotNative(col("v"), typedLit(c)) + negHalfNorm))
          .as("d"), lit(j).as("c"))
      }: _*)).getField("c")

    for (_ <- 0 until iterations) {
      val means = base.select(assignCol(centroids).as("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      centroids = centroids.indices.map(j => means.getOrElse(j, centroids(j)))
    }
    (centroids, base.select(col(idCol), assignCol(centroids).as("cluster")))
  }

  /** Lloyd's over INT8 CODES with floor-division centroid updates —
    * every arithmetic step is exact integer math or a correctly-rounded
    * IEEE double op on integer inputs, so any engine reproduces the
    * identical assignments and centroids (unlike [[kmeansFit]], whose
    * float means depend on summation order). This is the ORACLE-ABLE
    * k-means: `q_d = ⌊x_d / gmax · 127 + 0.5⌋` with a single GLOBAL
    * max-abs scale — uniform scaling preserves squared-L2 ordering up
    * to rounding, so the clustering tracks the double-precision
    * geometry (per-vector scales à la [[quantizeInt8]] would make
    * inter-vector distances incomparable). Distances are integer
    * squared-L2 over the codes; the centroid update is
    * `floor(sum / count)` — sum and count are exact longs and the one
    * double division is correctly rounded, so `floor` lands identically
    * everywhere.
    *
    * Same plan shape as [[kmeansFit]]: map-side argmin over broadcast
    * centroid literals (no shuffle), one partial-aggregating
    * (cell, dim) rollup per iteration; only the k×dim centroid matrix
    * (plus the one scale scalar) reaches the driver. Seeds are the
    * scattered farthest-point picks over the CODES ([[farthestSeedVecs]]
    * — integer-exact, so the seed sequence replays in any engine); ties
    * break on centroid index; a cell that loses all members keeps its
    * previous centroid.
    *
    * Returns (final integer centroids, assignment `(idCol, cluster)`).
    */
  /** GLOBAL-scale int8 code relation `(idCol, v: array<long>)` — one
    * max-abs scalar over the whole corpus, `q_d = ⌊x_d / gmax · 127 +
    * 0.5⌋`. Uniform scaling preserves squared-L2 ordering up to
    * rounding, which is what makes the integer trainers
    * ([[kmeansFitInt8]], [[pqTrainInt8]]) track the double-precision
    * geometry AND replay engine-exactly. Null vectors and vectors with
    * null elements are excluded (like zero-norm vectors in
    * `Dedup.withNorm`). NOT persisted — the caller owns lifecycle. */
  private def int8CodeRel(e: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val src = e.select(col(idCol), col(vecCol).cast("array<double>").as("w"))
      .filter(col("w").isNotNull &&
        !exists(col("w"), x => x.isNull))
    val gmaRow = src
      .agg(max(array_max(transform(col("w"), x => abs(x)))).as("g")).first()
    val gma = if (gmaRow.isNullAt(0)) 0d else gmaRow.getDouble(0)
    src.select(col(idCol),
      (if (gma == 0d) transform(col("w"), _ => lit(0L))
       else transform(col("w"),
         x => floor(x / lit(gma) * lit(127d) + lit(0.5d)).cast("long")))
        .as("v"))
  }

  def kmeansFitInt8(e: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): (Seq[Seq[Long]], DataFrame) = {
    val base = int8CodeRel(e, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kmeansFitCodes(base, idCol, k, iterations)
  }

  // argmin over integer squared-L2 via the dot identity: for fixed v,
  // argmin_j Σ(v−c_j)² = argmin_j (|c_j|² − 2·v·c_j), so the common
  // |v|² term never needs evaluating and the per-centroid work is ONE
  // native codegen'd dot (Dedup.dotNative) instead of an interpreted
  // aggregate(zip_with(...)) lambda chain — the same swap that keeps
  // the float kmeansFit fast, and a ~16× wall-clock difference here.
  // Exactness survives the move to doubles: integer codes keep every
  // dot/norm term an integer far below 2^53, so each double op is
  // exact, not rounded. Ties break on centroid index via the
  // (m_j · k + j) encoding (equal m_j ⇔ equal distance); m_j can be
  // negative, so decode with pmod, which returns the j in m_j·k + j
  // regardless of the quotient's sign.
  private def int8ArgminCol(cs: Seq[Seq[Long]], vd: Column): Column = {
    val k = cs.size
    pmod(array_min(array(cs.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => (x * x).toDouble).sum
      (Dedup.dotNative(vd, typedLit(c.map(_.toDouble))) * lit(-2d) +
        lit(c2)) * lit(k.toDouble) + lit(j.toDouble)
    }: _*)).cast("long"), lit(k.toLong)).cast("int")
  }

  /** [[kmeansFitInt8]]'s Lloyd loop over an ALREADY-INTEGER code
    * relation `(idCol, v: array<long>)` — shared with [[knnIvfPq]],
    * whose residual codes live in [-254, 254] and must NOT be
    * re-scaled. `base` should be persisted by the caller. */
  private def kmeansFitCodes(base: DataFrame, idCol: String, k: Int,
      iterations: Int): (Seq[Seq[Long]], DataFrame) = {
    require(k > 0 && iterations >= 0)
    var centroids: Seq[Seq[Long]] =
      farthestSeedVecs(base, idCol, k).map(_.map(_.toLong))
    require(centroids.size == k,
      s"kmeansFitCodes: need at least $k vectors, found ${centroids.size}")
    def assignCol(cs: Seq[Seq[Long]]): Column =
      int8ArgminCol(cs, col("v").cast("array<double>"))
    for (_ <- 0 until iterations) {
      val means = base.select(assignCol(centroids).as("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(floor(sum(col("x")).cast("double") /
          count(lit(1))).cast("long").as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      centroids = centroids.indices.map(j => means.getOrElse(j, centroids(j)))
    }
    (centroids, base.select(col(idCol), assignCol(centroids).as("cluster")))
  }

  // ── Int8 embedding quantization ─────────────────────────────────────

  /** Per-vector symmetric int8 quantization: `q_d = ⌊x_d / max|x| · 127
    * + 0.5⌋` (round-half-up, exact in [-127, 127] since |x_d| ≤ max|x|),
    * plus the dequantization multiplier `scale = max|x| / 127`. The
    * 4×-smaller representation that makes 100 TB of embeddings scan 4×
    * faster and dot products integer-exact; reconstruction error is
    * bounded by `scale / 2` per dimension.
    *
    * Everything is IEEE-deterministic from the float inputs (abs and
    * max are exact on floats; the divide/multiply run in double), so
    * any engine reproduces the identical integer codes — which is what
    * the oracle checks. A zero vector quantizes to all-zero codes with
    * scale 0.
    *
    * Scale notes: pure per-row expression work (codegen'd built-ins),
    * no shuffle.
    *
    * Output: input columns + `q` (array<int> in [-127,127]) + `scale`.
    */
  def quantizeInt8(e: DataFrame, vecCol: String, qCol: String = "q",
      scaleCol: String = "scale"): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    // codes ride the native graft_quantize8 expression when the session
    // registered GraftExtensions (one static call per row instead of ~5
    // interpreted lambda evaluations per ELEMENT on a full-corpus scan
    // pass); property-pinned equal to the HOF fallback chain in ExtSpec
    val qExpr =
      if (e.sparkSession.catalog.functionExists("graft_quantize8"))
        call_function("graft_quantize8", v.cast("array<double>"))
      else {
        // explicit non-finite guard so the fallback fails identically
        // to the native expression regardless of ANSI mode (without it,
        // a non-ANSI session would emit garbage codes where a
        // GraftExtensions session throws)
        val nonFinite = exists(v, x =>
          x.cast("double").isNaN ||
            abs(x.cast("double")) === lit(Double.PositiveInfinity))
        when(nonFinite,
          raise_error(lit("graft_quantize8: non-finite element — " +
            "quantization undefined (filter NaN/Infinity vectors " +
            "upstream)")).cast("array<int>"))
          .when(col("_ma") === 0d || col("_ma").isNull,
            transform(v, _ => lit(0)))
          .otherwise(transform(v, x =>
            floor(x.cast("double") / col("_ma") * 127d + 0.5d)
              .cast("int")))
      }
    e.withColumn("_ma", maxAbs)
      .withColumn(qCol, qExpr)
      .withColumn(scaleCol, coalesce(col("_ma"), lit(0d)) / 127d)
      .drop("_ma")
  }

  /** DETERMINISTIC sign random projection (Johnson–Lindenstrauss /
    * Achlioptas ±1 form): reduce `inDims`-dim vectors to `outDims`
    * dims, `proj[j] = Σᵢ v[i]·r(i,j) / √outDims` with `r(i,j) ∈ {±1}`
    * derived from the codebase's portable md5 idiom (parity of
    * [[Sampling.md5Top60]] of `"i:j"`), so any engine — and the DuckDB
    * oracle — regenerates the identical matrix from the formula alone;
    * no RNG state, no matrix to ship.
    *
    * This is the standard scale pre-step in front of LSH bucketing,
    * k-means, or brute-force rescoring: at 100 TB the projection is
    * pure per-row expression work — `outDims` native codegen'd dot
    * products ([[Dedup.dotNative]]) against CONSTANT-folded literal
    * sign rows, no shuffle, no broadcast variable (the matrix lives in
    * the plan as `outDims` array literals — outDims×inDims ≤ a few
    * thousand doubles for any sane reduction). JL guarantees pairwise
    * distances survive to within ε at `outDims = O(log n / ε²)`.
    *
    * Output: input columns + `projCol` (array<double>, length
    * `outDims`). Null vectors project to null; a vector of the wrong
    * length makes the dot NULL (dotNative's length-mismatch contract)
    * rather than a silently wrong value.
    */
  def projectSign(e: DataFrame, vecCol: String, inDims: Int, outDims: Int,
      projCol: String = "proj"): DataFrame = {
    require(inDims > 0 && outDims > 0, "dims must be positive")
    val invSqrt = 1.0 / math.sqrt(outDims.toDouble)
    val v = col(vecCol).cast("array<double>")
    val rows: Seq[Column] = (0 until outDims).map { j =>
      val signs: Seq[Double] =
        (0 until inDims).map(i => ProjectSign.sign(i, j))
      Dedup.dotNative(v, typedLit(signs)) * lit(invSqrt)
    }
    e.withColumn(projCol, array(rows: _*))
  }

  /** Exact top-k under the QUANTIZED dot product: corpus and queries are
    * int8-quantized ([[quantizeInt8]]) and candidates rank by the
    * integer dot of the codes (descending, id tiebreak). With unit-ish
    * input vectors the integer dot is a monotone proxy for cosine up to
    * quantization error; its virtue here is that ranking is INTEGER
    * ARITHMETIC — exactly reproducible on any engine, no float rounding
    * anywhere (codes ≤ 127, so a dim-64 dot stays ≤ 2^20).
    *
    * Plan shape = [[knnBruteForce]]: broadcast query codes, map-side
    * scoring, partition-local top-k, then the bounded ranking window.
    */
  def knnQuantizedInt8(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def codes(df: DataFrame, as: String, qAs: String) =
      quantizeInt8(df.select(col(idCol), col(vecCol)), vecCol)
        .select(col(idCol).as(as), col("q").as(qAs))
    val c = codes(corpus, "nn_id", "cq")
    val q = codes(queries, "query_id", "qq")
    // the O(corpus × queries) scoring loop rides the native codegen'd
    // dot, not an interpreted aggregate(zip_with(...)) lambda chain
    // (the kmeansFitInt8 lesson — ~16× on the argmin there). Exactness
    // survives the doubles: every partial sum of int8-code products is
    // an integer far below 2^53, so each double add is exact and the
    // final cast back to long reproduces the integer dot bit for bit.
    val dot = Dedup.dotNative(col("qq").cast("array<double>"),
      col("cq").cast("array<double>")).cast("long")
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dot.as("qdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("nn_id"))
    localTopK(scored, k, "qdot")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ── Product quantization (PQ) ───────────────────────────────────────

  /** Product-quantization codebooks + codes over GLOBAL-scale int8
    * vectors — the memory-side ANN scale path: a `dim`-dim vector
    * compresses to `m` small ints (one codebook cell per subspace), so
    * 100 TB of float embeddings become ~m bytes/vector of codes plus a
    * driver-sized codebook, and candidate scoring never touches the
    * original vectors (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011).
    *
    * Every arithmetic step is integer or correctly-rounded-double math
    * on integer inputs (the [[kmeansFitInt8]] discipline), so codebooks,
    * codes, and ADC distances replay engine-exactly — this PQ is
    * DuckDB-oracle-able, unlike float PQ whose cell boundaries drift
    * with summation order. Per subspace `s` (dims `[s·dsub, (s+1)·dsub)`,
    * `dsub = dim / m`): farthest-point seeds over the SHARED md5-rank
    * sample (ONE seeding job for all subspaces — each slices the same
    * collected rows), then `iterations` integer Lloyd rounds. All `m`
    * subspaces train CONCURRENTLY: each round is one map-side argmin
    * projection (no shuffle — centroids ride broadcast literals) and
    * ONE (subspace, cell, dim) partial-aggregating rollup for every
    * subspace together, so the per-round cost is a single corpus pass
    * regardless of `m`. Only the m×k×dsub codebook reaches the driver.
    *
    * Ties break on centroid index. A cell that loses all members keeps
    * its previous centroid.
    *
    * Returns (codebooks indexed [subspace][cell][localDim], code
    * relation `(idCol, v: array<long> int8 codes, code: array<int>
    * length m)`). */
  def pqTrainInt8(e: DataFrame, idCol: String, vecCol: String,
      m: Int, kSub: Int, iterations: Int): (Seq[Seq[Seq[Long]]], DataFrame) = {
    val base = int8CodeRel(e, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pqTrainCodes(base, idCol, m, kSub, iterations)
  }

  /** [[pqTrainInt8]]'s trainer over an ALREADY-INTEGER code relation
    * `(idCol, v: array<long>, extra cols pass through)` — shared with
    * [[knnIvfPq]], whose residual codes must not be re-scaled. `base`
    * should be persisted by the caller. Appends `code` to `base`'s
    * columns in the returned relation. */
  private def pqTrainCodes(base: DataFrame, idCol: String, m: Int,
      kSub: Int, iterations: Int): (Seq[Seq[Seq[Long]]], DataFrame) = {
    require(m > 0 && kSub > 0 && iterations >= 0)
    val (sids, svecs) = md5RankSample(base, idCol, seedSampleSize(kSub))
    require(svecs.nonEmpty, "pqTrainCodes: empty corpus")
    val dim = svecs(0).length
    require(dim % m == 0, s"pqTrainCodes: dim $dim not divisible by m=$m")
    val dsub = dim / m

    // per-subspace farthest-point seeds over SLICES of the one sample
    var books: IndexedSeq[IndexedSeq[Seq[Long]]] = (0 until m).map { s =>
      val sub = svecs.map(v => java.util.Arrays.copyOfRange(v,
        s * dsub, (s + 1) * dsub))
      val picks = fpPickLocal(sids, sub, kSub)
      require(picks.size == kSub,
        s"pqTrainCodes: need at least $kSub vectors, found ${picks.size}")
      picks.map(i => sub(i).toSeq.map(_.toLong)).toIndexedSeq
    }

    // per-subspace argmin over the sliced codes (int8ArgminCol's
    // integer-exact |c|² − 2·v·c identity and index tie-break)
    def assignCol(s: Int, cs: Seq[Seq[Long]]): Column =
      int8ArgminCol(cs,
        slice(col("v"), s * dsub + 1, dsub).cast("array<double>"))
    def cellsCol: Column =
      array((0 until m).map(s => assignCol(s, books(s))): _*)

    for (_ <- 0 until iterations) {
      // ONE rollup for all m subspaces: explode the full vector, route
      // each element to (its subspace's assigned cell, local dim)
      val sub = floor(col("dim") / lit(dsub)).cast("int")
      val means = base.select(cellsCol.as("cells"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .select(sub.as("sub"), pmod(col("dim"), lit(dsub)).as("ldim"),
          element_at(col("cells"), sub + 1).as("cell"), col("x"))
        .groupBy(col("sub"), col("cell"), col("ldim"))
        .agg(floor(sum(col("x")).cast("double") /
          count(lit(1))).cast("long").as("mn"))
        .collect()
      val bySub = means.groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((s, cell), rows) =>
          (s, cell) -> rows.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq
        }
      books = (0 until m).map(s => (0 until kSub).map(j =>
        bySub.getOrElse((s, j), books(s)(j))))
    }
    (books, base.withColumn("code", cellsCol))
  }

  /** ADC (asymmetric distance computation) top-k under a PQ index:
    * candidates rank by the integer squared-L2 between the query's
    * EXACT int8 codes and each corpus vector's codebook RECONSTRUCTION
    * — the query side never quantizes to PQ cells, which is what makes
    * the distance "asymmetric" and recall beat symmetric code-to-code
    * scoring. Integer-exact end to end (codes and codebooks are
    * integers; the Σ(q−r)² terms stay far below 2^53), so ranks and
    * distances replay on any engine — the oracle recomputes them from
    * the replayed codebooks.
    *
    * Plan shape at scale: the corpus side carries ONLY (id, m-byte
    * code) — the reconstruction is an expression over broadcast
    * codebook literals, the scoring join broadcasts the query codes,
    * and a partition-local top-k bounds the ranking window's input, so
    * the full-precision corpus is read exactly once (to encode) and
    * never again. `queries` restricts by id (left-semi over the
    * encoded relation), so query codes come from the same global
    * scale. */
  /** Codebook reconstruction of a PQ-coded vector: concat over
    * subspaces of `codebook[sub][code[sub]]` — element_at on a
    * broadcast nested-array literal, no join, stays in codegen. */
  private def pqReconCol(books: Seq[Seq[Seq[Long]]], codeCol: Column): Column =
    concat(books.indices.map { s =>
      element_at(typedLit(books(s).map(_.map(_.toDouble).toSeq).toSeq),
        element_at(codeCol, s + 1) + 1)
    }: _*)

  /** PQ-encode a corpus: `(idCol, code: array<int> length m, recon_err:
    * bigint)` where `recon_err = Σ_d (v_d − recon_d)²` over the int8
    * codes — the integer-exact per-vector quantization-quality measure
    * (what you'd threshold to route hard vectors to a re-rank tier).
    * Code assignment and error are engine-exact; see [[pqTrainInt8]]. */
  def pqEncodeInt8(e: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, kSub: Int = 8, iterations: Int = 2): DataFrame = {
    val (books, enc) = pqTrainInt8(e, idCol, vecCol, m, kSub, iterations)
    val rv = pqReconCol(books, col("code"))
    val vd = col("v").cast("array<double>")
    enc.select(col(idCol), col("code"),
      (Dedup.dotNative(vd, vd) - lit(2d) * Dedup.dotNative(vd, rv) +
        Dedup.dotNative(rv, rv)).cast("long").as("recon_err"))
  }

  def knnPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, kSub: Int = 8,
      iterations: Int = 2): DataFrame = {
    val (books, enc) = pqTrainInt8(corpus, idCol, vecCol, m, kSub, iterations)
    val c = enc.select(col(idCol).as("nn_id"), col("code"))
      .withColumn("rv", pqReconCol(books, col("code")))
    val q = enc.join(broadcast(queries.select(col(idCol))), Seq(idCol),
        "left_semi")
      .select(col(idCol).as("query_id"),
        col("v").cast("array<double>").as("qv"))
    // Σ(q−r)² = |q|² − 2·q·r + |r|²: three native codegen'd dots, every
    // partial an exact integer in doubles
    val dist = (Dedup.dotNative(col("qv"), col("qv")) -
      lit(2d) * Dedup.dotNative(col("qv"), col("rv")) +
      Dedup.dotNative(col("rv"), col("rv"))).cast("long")
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("nn_id"))
    localTopK(scored.withColumn("_neg", -col("adist")), k, "_neg")
      .drop("_neg")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF+PQ — the full production ANN index layout (FAISS's IVFADC;
    * Jégou et al. 2011 §IV): a coarse integer k-means partitions the
    * corpus into `nCells` inverted lists, PQ codebooks train on the
    * RESIDUALS `v − C[cell]` (residuals concentrate near 0, so the same
    * codebook budget quantizes them much finer than raw vectors), and a
    * query scores ONLY the `nProbes` cells nearest its own codes —
    * corpus-scan cost drops by ~nCells/nProbes while the per-candidate
    * cost stays the m-cell ADC lookup.
    *
    * Integer-exact end to end: coarse centroids, residuals (in
    * [-254, 254]), PQ codebooks, probe choice (ties by cell index), and
    * ADC distances are all integer or exactly-rounded-double math, so
    * the oracle replays the whole index build + search cell-for-cell.
    *
    * Plan shape at scale: the corpus carries (id, cell, m-cell code) —
    * the inverted-list layout; probing is an equi-join on the cell id
    * against the broadcast (query, probed-cell, residual) relation, so
    * unprobed cells are never scanned; partition-local top-k bounds the
    * ranking window. The residual reconstruction is expression work
    * over broadcast codebook literals, no join. */
  def knnIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 8, nProbes: Int = 2,
      m: Int = 4, kSub: Int = 8, iterations: Int = 2): DataFrame = {
    val base = int8CodeRel(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (coarse, _) = kmeansFitCodes(base, idCol, nCells, iterations)
    val centsL = typedLit(coarse.map(_.toSeq).toSeq)
    val centsD = typedLit(coarse.map(_.map(_.toDouble).toSeq).toSeq)
    // residual relation (id, cell, v=residual codes): cell assignment
    // and subtraction are one projection over the persisted codes
    val rbase = base
      .withColumn("cell", int8ArgminCol(coarse,
        col("v").cast("array<double>")))
      .select(col(idCol), col("cell"),
        zip_with(col("v"), element_at(centsL, col("cell") + 1),
          (a, b) => a - b).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (books, enc) = pqTrainCodes(rbase, idCol, m, kSub, iterations)
    val c = enc.select(col(idCol).as("nn_id"), col("cell"),
      pqReconCol(books, col("code")).as("rv"))

    // query side: exact codes → nProbes nearest coarse cells (integer
    // d², ties by cell index) → one residual per probed cell
    val q0 = base.join(broadcast(queries.select(col(idCol))), Seq(idCol),
        "left_semi")
      .select(col(idCol).as("query_id"),
        col("v").cast("array<double>").as("qv"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2"), col("cell"))
    val qc = q0.select(col("query_id"), col("qv"),
        posexplode(centsD).as(Seq("cell", "cv")))
      .withColumn("cd2", (Dedup.dotNative(col("qv"), col("qv")) -
        lit(2d) * Dedup.dotNative(col("qv"), col("cv")) +
        Dedup.dotNative(col("cv"), col("cv"))).cast("long"))
      .withColumn("_p", row_number().over(pw))
      .filter(col("_p") <= nProbes)
      .select(col("query_id"), col("cell"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qres"))

    val dist = (Dedup.dotNative(col("qres"), col("qres")) -
      lit(2d) * Dedup.dotNative(col("qres"), col("rv")) +
      Dedup.dotNative(col("rv"), col("rv"))).cast("long")
    val scored = c.join(broadcast(qc), Seq("cell"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("nn_id"))
    localTopK(scored.withColumn("_neg", -col("adist")), k, "_neg")
      .drop("_neg")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact cosine rank within the bucket. Trades recall for a corpus-
    * hash + bucket-equi-join plan that scales linearly. Pick `nPlanes`
    * so expected bucket occupancy stays in the hundreds-to-thousands
    * (2^nPlanes buckets); use several plane sets (bands) for recall in
    * production. */
  def knnLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 4): DataFrame = {
    val c = Dedup.withNorm(corpus, idCol, vecCol, "nn_id", "cv")
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
    val q = Dedup.withNorm(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("nn_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("bucket"), col("nn_id"),
        round(Dedup.dotNative(col("qv"), col("cv")) /
          (col("qv_nrm") * col("cv_nrm")), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim"))) // zero-norm guard, see knnBruteForce
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * score-free way to merge heterogeneous rankings (BM25 keyword hits
    * with embedding kNN, several ANN indexes, …): each list
    * contributes `1 / (kRrf + rank)` per item, fused items sort by the
    * summed contribution. Contributions quantize to 1e-6 units
    * (`round(1e6 / (kRrf + rank))` — exact longs), so the fused order
    * (ties by id ascending) replays across engines.
    *
    * Each ranking must carry `idCol` and a 1-based `rank` column and
    * is already top-k-small, so everything here — the union, the
    * fuse aggregate, the final cut — runs on k·lists rows regardless
    * of corpus size; the heavy lifting stayed in the rankings. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings
      .map(_.select(col(idCol),
        round(lit(1e6) / (lit(kRrf) + col("rank"))).cast("long")
          .as("c_e6")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("c_e6")).as("rrf_e6"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_e6").desc, col(idCol))
      .limit(topK)
  }

  /** Hard-negative mining for contrastive / triplet training: for each
    * query vector, the top-k most SIMILAR corpus vectors carrying a
    * DIFFERENT label — the negatives closest to the decision boundary,
    * which are the pairs metric-learning losses actually learn from
    * (the mining pass behind every "in-batch negatives aren't hard
    * enough" pipeline). Rides the exact int8 scoring shape of
    * [[knnQuantizedInt8]] — broadcast query codes, integer dots on the
    * codegen'd native expression, partition-local top-k before the
    * ranking window — with the label-mismatch predicate inside the
    * broadcast join itself, so same-label pairs never materialize into
    * the shuffle at all.
    *
    * @return (query_id, rank, neg_id, neg_label, qdot) */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    def codes(df: DataFrame, as: String, qAs: String, lAs: String) =
      quantizeInt8(df.select(col(idCol), col(vecCol), col(labelCol)),
          vecCol)
        .select(col(idCol).as(as), col("q").as(qAs), col(labelCol).as(lAs))
    val c = codes(corpus, "nn_id", "cq", "neg_label")
    val q = codes(queries, "query_id", "qq", "query_label")
    val dot = Dedup.dotNative(col("qq").cast("array<double>"),
      col("cq").cast("array<double>")).cast("long")
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("nn_id") &&
          col("query_label") =!= col("neg_label"))
      .select(col("query_id"), col("nn_id"), col("neg_label"),
        dot.as("qdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("nn_id"))
    localTopK(scored, k, "qdot")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nn_id").as("neg_id"), col("neg_label"), col("qdot"))
  }

  /** Greedy k-center (Gonzalez farthest-point traversal) coreset
    * selection: pick the lowest-id vector, then k−1 times the vector
    * FARTHEST from every center chosen so far — the classic
    * 2-approximation of the k-center cover and the standard
    * diversity-maximizing data-selection pass (the geometric dual of
    * SemDeDup's redundancy removal: keep the spread, not the dense
    * middle). Emits the selection order with each round's covering
    * radius — the radius sequence is the coreset quality curve
    * (monotone non-increasing by construction).
    *
    * Scale design (100 TB): per round, ONE narrow pass updates each
    * point's min-distance against the single newest center (a
    * broadcast literal — the k-means centroid contract) and one
    * `TakeOrderedAndProject` argmax returns ONE row to the driver; the
    * corpus never shuffles and is persisted once across rounds. k
    * rounds = k bounded scans — the selection state on the driver is
    * the k-row output itself.
    *
    * Determinism: distances run on the GLOBAL [[quantizeInt8]] codes
    * as exact integers (‖a‖² + ‖b‖² − 2a·b with every partial product
    * far below 2^53, so the codegen'd double dot reproduces the
    * integer bit for bit), and the argmax breaks ties by
    * (distance DESC, id ASC) — the whole traversal replays
    * engine-exactly in the unrolled SQL oracle.
    *
    * @return (round, idCol, radius): selection order, selected id, and
    *         the point's min-distance to the prior centers at selection
    *         time (0 for the seed) */
  def kcenterSelect(e: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = e.sparkSession
    import spark.implicits._
    val Spill = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = quantizeInt8(e.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol), col("q").cast("array<double>").as("qd"))
      .withColumn("qnorm", Dedup.dotNative(col("qd"), col("qd")).cast("long"))
      .persist(Spill)

    def distToCenter(center: Seq[Double], cnorm: Long): Column =
      col("qnorm") + lit(cnorm) -
        lit(2L) * Dedup.dotNative(col("qd"),
          array(center.map(lit(_)): _*)).cast("long")
    def vec(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Double](r.fieldIndex("qd"))
    def cnorm(r: org.apache.spark.sql.Row): Long =
      r.getLong(r.fieldIndex("qnorm"))

    val first = base.orderBy(col(idCol)).limit(1).collect()(0)
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, first.getLong(first.fieldIndex(idCol)), 0L))
    var cur = base.withColumn("mind", distToCenter(vec(first), cnorm(first)))
      .persist(Spill)
    var prev: DataFrame = null
    var step = 2
    while (step <= k) {
      val best = cur.orderBy(col("mind").desc, col(idCol)).limit(1)
        .collect()(0)
      // the argmax materialized `cur`; its parent is droppable now
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      picks += ((step.toLong, best.getLong(best.fieldIndex(idCol)),
        best.getLong(best.fieldIndex("mind"))))
      prev = cur
      cur = cur.withColumn("mind",
          least(col("mind"), distToCenter(vec(best), cnorm(best))))
        .persist(Spill)
      step += 1
    }
    cur.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    base.unpersist(blocking = false)
    picks.toSeq.toDF("round", idCol, "radius")
  }

  /** Mutual (reciprocal) kNN pairs — the symmetric matching criterion:
    * keep (a, b) only when b is in a's top-k AND a is in b's top-k.
    * One-directional kNN is asymmetric (a hub is "near" everyone;
    * almost no one is near it back), so mutuality is the standard
    * precision filter for matching/near-dup candidates built from an
    * ANN relation. Rides [[knnQuantizedInt8]] with the corpus as its
    * own query set (exact integer dots, engine-replayable ranks); at
    * corpus scale substitute the IVF relation — the mutuality join is
    * the same.
    *
    * Scale: the kNN relation is corpus × k rows; the mutuality check
    * is ONE self-equi-join on the ordered pair key. No new corpus
    * pass.
    *
    * @return (id_a, id_b, rank_ab, rank_ba) with id_a < id_b */
  def mutualKnn(e: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val nn = knnQuantizedInt8(e, e, idCol, vecCol, k)
      .select(col("query_id"), col("nn_id"), col("rank"))
    val ab = nn.filter(col("query_id") < col("nn_id"))
      .select(col("query_id").as("id_a"), col("nn_id").as("id_b"),
        col("rank").cast("long").as("rank_ab"))
    val ba = nn.filter(col("query_id") > col("nn_id"))
      .select(col("nn_id").as("id_a"), col("query_id").as("id_b"),
        col("rank").cast("long").as("rank_ba"))
    ab.join(ba, Seq("id_a", "id_b"))
  }

  /** Maximal Marginal Relevance (MMR) selection — the diversified
    * top-k: greedily pick the candidate maximizing
    * `λ·sim(query, d) − (1−λ)·max_{s∈S} sim(d, s)` at λ = 1/2, i.e.
    * the relevance-minus-redundancy argmax. The RAG re-ranker and the
    * diverse-exemplar picker for data selection: pure top-k returns k
    * near-copies of the best hit; MMR charges each candidate for its
    * similarity to what is ALREADY selected.
    *
    * Same machinery and exactness discipline as [[kcenterSelect]]:
    * int8-quantized vectors, INTEGER dot products (λ = 1/2 makes the
    * score the pure-integer `rel − maxsim`), ties to the smaller id —
    * every round's argmax replays engine-exactly, so the oracle is the
    * same unrolled-CTE chain. Round 1 has no redundancy term
    * (S = ∅): score = rel.
    *
    * Scale (100 TB): per round ONE scan of the candidate relation
    * (update running maxsim against the newly-picked broadcast-literal
    * vector + argmax); the driver holds k rows, never data. k rounds
    * of k·dim literal arithmetic — the k-center cost model exactly.
    *
    * @return (round, idCol, rel, score) in pick order */
  def mmrSelect(e: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = e.sparkSession
    import spark.implicits._
    val Spill = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = quantizeInt8(e.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol), col("q").cast("array<double>").as("qd"))
    val qRows = base.filter(col(idCol) === queryId).collect()
    require(qRows.length == 1, s"query id $queryId not found")
    val qVec = qRows(0).getSeq[Double](qRows(0).fieldIndex("qd"))

    def dotTo(v: Seq[Double]): Column =
      Dedup.dotNative(col("qd"), array(v.map(lit(_)): _*)).cast("long")
    def vec(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Double](r.fieldIndex("qd"))

    var cur = base.filter(col(idCol) =!= queryId)
      .withColumn("rel", dotTo(qVec))
      .persist(Spill)
    val first = cur.orderBy(col("rel").desc, col(idCol)).limit(1)
      .collect()(0)
    def idOf(r: org.apache.spark.sql.Row): Long =
      r.getLong(r.fieldIndex(idCol))
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, idOf(first), first.getLong(first.fieldIndex("rel")),
        first.getLong(first.fieldIndex("rel"))))
    var prev: DataFrame = null
    var prev2: DataFrame = null
    cur = cur.filter(col(idCol) =!= idOf(first))
      .withColumn("maxsim", dotTo(vec(first)))
      .persist(Spill)
    var step = 2
    while (step <= k) {
      val best = cur
        .withColumn("score", col("rel") - col("maxsim"))
        .orderBy(col("score").desc, col(idCol)).limit(1)
        .collect()(0)
      if (prev2 != null) { prev2.unpersist(blocking = false) }
      prev2 = prev
      picks += ((step.toLong, idOf(best),
        best.getLong(best.fieldIndex("rel")),
        best.getLong(best.fieldIndex("score"))))
      prev = cur
      cur = cur.filter(col(idCol) =!= idOf(best))
        .withColumn("maxsim",
          greatest(col("maxsim"), dotTo(vec(best))))
        .persist(Spill)
      step += 1
    }
    cur.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    if (prev2 != null) prev2.unpersist(blocking = false)
    picks.toSeq.toDF("round", idCol, "rel", "score")
  }

  // ── Per-label centroid / dispersion census ──────────────────────────────

  /** Class-separability report over milli-quantized embeddings: per
    * label, the integer component sums `S1_j = Σ x_j` and squared-norm
    * sum `S2 = Σ‖x‖²` are the MERGEABLE sufficient statistics (the
    * ingest-ledger shape — both are vector-additive), and the report
    * derives from them in pure integer arithmetic:
    *
    *   disp = (n·S2 − Σ_j S1_j²) div n²   — E‖x − μ‖² cleared of the
    *                                        rational mean, milli²-units
    *
    * Quantization is `floor(x·10³ + 0.5)` — float→double is exact and
    * floor is IEEE-deterministic, so both engines produce the same
    * longs; milli (not micro) so `Σ_j S1_j²` stays far under 2⁶³ at any
    * plausible class size (S1_j ≤ n·max|x|·10³). A rising `disp` for a
    * label is the embedding-space drift alarm; a falling inter-centroid
    * distance ([[labelCentroidDistances]]) is the separability alarm.
    *
    * Scale notes: one narrow dim-explode (dim × rows, the only
    * expansion) into a (label, dim) partial-agg census, then a
    * label-sized reduction — no joins, no windows, state is
    * labels × dims longs. */
  def labelCentroidCensus(embs: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val dims = embs
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * 1000d + 0.5d).cast("long").as("xq"))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("xq")).as("s1"),
        sum(col("xq") * col("xq")).as("sq"))
    val nPer = embs
      .groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    dims.groupBy(col("label"))
      .agg(sum(col("sq")).as("s2"),
        sum(col("s1") * col("s1")).as("s1_norm2"))
      .join(nPer, "label")
      .select(col("label"), col("n"), col("s2"), col("s1_norm2"),
        expr("(n * s2 - s1_norm2) div (n * n)").as("disp"))
  }

  /** Top principal component by FIXED-ITERATION integer power method —
    * the embedding-whitening / dominant-drift-direction primitive,
    * engine-exactly replayable because every step is long arithmetic:
    *
    *  1. milli-quantize components (`floor(x·10³ + 0.5)` — IEEE-exact)
    *  2. scaled centered scatter `M_jk = n·Σ xq_j xq_k − S1_j·S1_k`
    *     (the covariance numerator ×n² — same eigenvectors, no
    *     rationals)
    *  3. power iteration from `v₀ = 1024·e₀` with an integer rescale
    *     each round: `denom = max|w| div 1024 + 1`, `v ← w div denom`
    *     (truncating division — Spark `div` ≡ DuckDB `//` ≡ Scala `/`)
    *     keeps `max|v| < 1024`, bounding every product far under 2⁶³.
    *
    * A fixed iterate of a deterministic recurrence needs no
    * convergence test: ANY iteration count is a well-defined value
    * both engines reproduce bit-exactly (the kcenter/MMR unrolled-
    * greedy discipline applied to linear algebra). The last `denom` is
    * the growth factor — the power method's eigenvalue proxy.
    *
    * Scale notes: the (dj, dk) scatter census is ONE self-join +
    * partial-agg shuffle into dim² groups (the only corpus-sized
    * work); the dim²-entry matrix and the iteration itself are
    * config-sized driver math (the kmeansFitCodes precedent). Exact
    * longs hold while n²·max|xq|² < 2⁶³ — ~6·10⁵ rows at |x| ≤ 5;
    * beyond that, shard the scatter sums (they are vector-additive
    * sufficient statistics) and divide before the iteration.
    *
    * @return one row per dimension: (d, v, growth) */
  def topComponentPower(embs: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1)
    val sp = embs.sparkSession
    import sp.implicits._
    val m = scatterMatrix(embs, idCol, vecCol)
    val (v, growth) = powerLoop(m, 0, iterations)
    v.zipWithIndex.map { case (value, d) => (d, value, growth) }
      .toSeq.toDF("d", "v", "growth")
  }

  /** The milli-quantized scaled scatter matrix `M = n·Σxxᵀ − S1S1ᵀ` as
    * dim² driver-side longs (config-sized collect — the kmeansFitCodes
    * precedent), with the matvec-exactness guard: every power-method
    * product must stay under 2⁶³, i.e. `dim·max|M|·1024 < 2⁶³`.
    * Worst-case that binds around n ≈ 2·10⁴ rows at |x| ≤ 0.6, though
    * real (near-diagonal) spectra leave orders more headroom — the
    * require turns a silent Scala wrap into a loud failure naming the
    * fix (shard the vector-additive scatter sums, or divide M by a
    * power of two before iterating; both stay deterministic). */
  /** The milli-quantized (vid, d, xq) relation every scatter consumer
    * shares — batch matrix assembly and the per-tick ingest ledger
    * hash IDENTICAL longs, which is what lets them share an oracle. */
  private[graft] def quantizedDims(embs: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    embs.select(col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("vid"), col("d"),
        floor(col("x").cast("double") * 1000d + 0.5d).cast("long").as("xq"))

  /** Assemble `M = n·Σxxᵀ − S1S1ᵀ` from the integer sufficient
    * statistics, with the matvec-exactness guard. */
  private[graft] def assembleScatter(n: Long, s1: Map[Int, Long],
      s2: Seq[(Int, Int, Long)]): Array[Array[Long]] = {
    val dim = s1.size
    val m = Array.ofDim[Long](dim, dim)
    s2.foreach { case (j, k, s) => m(j)(k) = n * s - s1(j) * s1(k) }
    val maxM = m.flatten.map(math.abs).max max 1L
    require(maxM <= Long.MaxValue / (dim.toLong * 1024L),
      s"scatter entries up to $maxM would overflow the integer matvec —" +
        " shard the scatter sums or pre-divide M by a power of two")
    m
  }

  private def scatterMatrix(embs: DataFrame, idCol: String,
      vecCol: String): Array[Array[Long]] = {
    val dims = quantizedDims(embs, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = embs.count()
    val s1 = dims.groupBy(col("d")).agg(sum(col("xq")).as("s1"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val s2 = dims.as("a").join(dims.as("b"), "vid")
      .groupBy(col("a.d").as("dj"), col("b.d").as("dk"))
      .agg(sum(col("a.xq") * col("b.xq")).as("s"))
      .collect()    // dim² rows — config-sized, the documented collect
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    dims.unpersist(blocking = false)
    assembleScatter(n, s1, s2)
  }

  /** [[topComponentPower]] from MAINTAINED scatter ledgers — the read
    * path of [[graft.streaming.Streaming.scatterIngest]]: n, S1, and
    * Σxxᵀ are all vector-additive, so summing the per-tick censuses
    * reproduces the batch matrix exactly and the iteration (driver
    * math) is identical — the whitening direction derives from
    * dim²-sized state at any moment, corpus never rescanned. */
  def topComponentFromLedger(spark: org.apache.spark.sql.SparkSession,
      statePath: String, iterations: Int = 8): DataFrame = {
    import spark.implicits._
    val n = spark.read.parquet(s"$statePath/n")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val s1 = spark.read.parquet(s"$statePath/s1")
      .groupBy(col("d")).agg(sum(col("s1")).as("s1"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val s2 = spark.read.parquet(s"$statePath/s2")
      .groupBy(col("dj"), col("dk")).agg(sum(col("s")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val (v, growth) = powerLoop(assembleScatter(n, s1, s2), 0, iterations)
    v.zipWithIndex.map { case (value, d) => (d, value, growth) }
      .toSeq.toDF("d", "v", "growth")
  }

  /** Fixed-iteration integer power loop over a driver-side matrix:
    * truncating rescale `denom = max|w| div 1024 + 1` each round keeps
    * `max|v| < 1024`. Returns (vector, last denom = growth proxy). */
  private def powerLoop(m: Array[Array[Long]], start: Int,
      iterations: Int): (Array[Long], Long) = {
    val dim = m.length
    var v = Array.tabulate(dim)(d => if (d == start) 1024L else 0L)
    var growth = 1L
    var it = 0
    while (it < iterations) {
      val w = Array.tabulate(dim) { j =>
        var acc = 0L
        var k = 0
        while (k < dim) { acc += m(j)(k) * v(k); k += 1 }
        acc
      }
      growth = w.map(math.abs).max / 1024L + 1L
      v = w.map(_ / growth)
      it += 1
    }
    (v, growth)
  }

  /** SECOND principal component by deflated integer power iteration:
    * run [[topComponentPower]]'s loop for v₁, then iterate from
    * `u₀ = 1024·e₁` with the v₁-component projected out each round —
    * in scaled integer arithmetic, `w′ = (v₁·v₁)·w − (w·v₁)·v₁` (the
    * orthogonal-complement projection cleared of its rational), with
    * TWO truncating rescales per round (to 2²⁰ before the projection
    * so its products stay ≤ ~10¹⁴, then to 2¹⁰) — every step one of
    * the long operations both engines reproduce bit-exactly. The
    * `dot_v1` report column is the residual v₂·v₁ alignment (≈ 0) —
    * the self-check a whitening consumer reads before trusting the
    * axis pair.
    *
    * @return one row per dimension: (d, v, dot_v1) */
  def secondComponentPower(embs: DataFrame, idCol: String,
      vecCol: String, iterations: Int = 8): DataFrame = {
    require(iterations >= 1)
    val sp = embs.sparkSession
    import sp.implicits._
    val m = scatterMatrix(embs, idCol, vecCol)
    val dim = m.length
    val (v1, _) = powerLoop(m, 0, iterations)
    var vv = 0L
    v1.foreach(x => vv += x * x)
    var u = Array.tabulate(dim)(d => if (d == 1) 1024L else 0L)
    var it = 0
    while (it < iterations) {
      val w = Array.tabulate(dim) { j =>
        var acc = 0L
        var k = 0
        while (k < dim) { acc += m(j)(k) * u(k); k += 1 }
        acc
      }
      val d1 = w.map(math.abs).max / 1048576L + 1L
      val w1 = w.map(_ / d1)
      var wv = 0L
      var k = 0
      while (k < dim) { wv += w1(k) * v1(k); k += 1 }
      val w2 = Array.tabulate(dim)(j => vv * w1(j) - wv * v1(j))
      val d2 = w2.map(math.abs).max / 1024L + 1L
      u = w2.map(_ / d2)
      it += 1
    }
    var dot = 0L
    var k = 0
    while (k < dim) { dot += u(k) * v1(k); k += 1 }
    val dotF = dot
    u.zipWithIndex.map { case (value, d) => (d, value, dotF) }
      .toSeq.toDF("d", "v", "dot_v1")
  }

  /** Per-label mean projection onto [[topComponentPower]]'s direction —
    * drift along the dominant axis, per class, in integer milli·v
    * units: `proj_i = Σ_d xq_id·v_d`, reported as the truncated mean
    * `Σ proj div n` per label. One broadcast of the 64-long direction,
    * one narrow pass, one label-sized aggregate. */
  def pcProjectionByLabel(embs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, iterations: Int = 8): DataFrame = {
    val dir = topComponentPower(embs, idCol, vecCol, iterations)
      .select(col("d"), col("v"))
    val nPer = embs
      .groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    embs.select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * 1000d + 0.5d).cast("long").as("xq"))
      .join(broadcast(dir), "d")
      .groupBy(col("label"))
      .agg(sum(col("xq") * col("v")).as("proj_sum"))
      .join(nPer, "label")
      .select(col("label"), col("n"),
        expr("proj_sum div n").as("mean_proj"))
  }

  /** Per-label mean projection onto the whitening axis PAIR
    * ([[topComponentPower]] v₁ × [[secondComponentPower]] v₂) — the
    * 2-D class-drift map, truncated-integer means on both axes. One
    * broadcast of the two 64-long directions, one narrow pass, one
    * label-sized aggregate. */
  def whitenProjectionByLabel(embs: DataFrame, idCol: String,
      vecCol: String, labelCol: String,
      iterations: Int = 8): DataFrame = {
    val d1 = topComponentPower(embs, idCol, vecCol, iterations)
      .select(col("d"), col("v").as("v1"))
    val d2 = secondComponentPower(embs, idCol, vecCol, iterations)
      .select(col("d"), col("v").as("v2"))
    val dirs = d1.join(d2, "d")
    val nPer = embs
      .groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    embs.select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * 1000d + 0.5d).cast("long").as("xq"))
      .join(broadcast(dirs), "d")
      .groupBy(col("label"))
      .agg(sum(col("xq") * col("v1")).as("p1"),
        sum(col("xq") * col("v2")).as("p2"))
      .join(nPer, "label")
      .select(col("label"), col("n"),
        expr("p1 div n").as("mean_p1"),
        expr("p2 div n").as("mean_p2"))
  }

  /** Pairwise inter-centroid squared distances over the same
    * milli-quantized census: centroids are the truncated integer means
    * `μ_j = S1_j div n` (Spark `div` ≡ DuckDB `//`, both toward zero),
    * distances `Σ_j (μ_aj − μ_bj)²` in milli²-units — the
    * class-confusability matrix, labels·(labels−1)/2 rows. The
    * (label, dim) census is the only shuffle; the pair join is over
    * the labels×dims relation (config-sized). */
  def labelCentroidDistances(embs: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val cent = embs
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * 1000d + 0.5d).cast("long").as("xq"))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("xq")).as("s1"), count(lit(1)).as("n"))
      .select(col("label"), col("d"), expr("s1 div n").as("mu"))
    cent.as("a")
      .join(cent.as("b"),
        col("a.d") === col("b.d") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum((col("a.mu") - col("b.mu")) * (col("a.mu") - col("b.mu")))
        .as("dist2"))
  }
}

/** Driver-side regeneration of the [[Similarity.projectSign]] sign
  * matrix — the exact Scala mirror of the portable md5 idiom
  * ([[Sampling.md5Top60]] ≡ DuckDB
  * `('0x' || substr(md5(k), 1, 15))::UBIGINT`): md5 of `"i:j"`, top 60
  * bits, parity → ±1. The matrix is outDims×inDims evaluations at PLAN
  * time (hundreds — negligible), never per row. */
private[graft] object ProjectSign {
  def sign(i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    // top 60 bits = first 15 hex chars; parity = lowest bit of hex
    // char 14 = bit 4 (0x10) of byte 7 — but spelling the arithmetic
    // out is easier to trust: parse the 15-char prefix like the SQL does
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }
}
