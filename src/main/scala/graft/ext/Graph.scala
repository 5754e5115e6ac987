package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over pair relations, Pregel-style
  * message passing expressed as joins + aggregates — no GraphX, no
  * driver-side adjacency. Extension scope (SURVEY.md §7.5): ranking
  * documents by centrality in the near-duplicate graph tells a
  * curation pipeline which copy of a duplicated passage is the
  * canonical, most-connected one (and which templated boilerplate
  * family dominates a source).
  */
object Graph {

  /** PageRank over an undirected pair relation, ENGINE-EXACT: ranks
    * live in 1e-12 units as longs, every per-edge contribution is the
    * integer division `rank div degree`, and the damping update is
    * integer arithmetic throughout — no float ever appears, so sums
    * are order-insensitive and an external SQL oracle unrolling the
    * same `iters` steps reproduces every rank bit for bit. (The
    * integer floor loses ≤ deg·1e-12 of mass per node per step —
    * the standard simplified-PageRank trade, deterministic here.)
    *
    * Nodes without edges hold the teleport mass `(1−d)/N` — isolated
    * documents rank below any connected one, which is exactly the
    * curation signal (dup-cluster hubs float up).
    *
    * Scale (100 TB): each iteration is ONE equi-join of the edge
    * relation with the current ranks (co-shuffled on `src`) plus one
    * partial-aggregating sum on `dst` — the Pregel superstep as plain
    * relational algebra; the edge relation and degrees persist across
    * iterations, ranks stay O(nodes). `iters` bounds the chain, and
    * each rank frame is node-sized, never edge-sized.
    */
  def pageRank(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      iters: Int = 3, dampE6: Long = 850000L): DataFrame = {
    require(iters >= 1 && dampE6 >= 0 && dampE6 <= 1000000L,
      "pageRank: need iters >= 1 and damping in [0, 1e6]")
    val Scale = 1000000000000L
    val n = nodes.count()
    require(n > 0, "pageRank: empty node set")
    val r0 = Scale / n
    val teleport = ((1000000L - dampE6) * r0) / 1000000L
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist()
    try {
      var r = nodes.select(col(idCol).as("id"))
        .withColumn("rank", lit(r0))
      for (_ <- 1 to iters) {
        val msgs = edges.join(deg, "src")
          .join(r.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
        val sums = msgs.groupBy(col("id")).agg(sum(col("c")).as("s"))
        r = nodes.select(col(idCol).as("id"))
          .join(sums, Seq("id"), "left")
          .select(col("id"), (lit(teleport) +
            expr(s"($dampE6 * coalesce(s, cast(0 as long))) div 1000000"))
            .as("rank"))
      }
      // materialize before releasing the cached edge relation
      r.select(col("id").as(idCol), col("rank").as("rank_e12"))
        .localCheckpoint(true)
    } finally { edges.unpersist(); deg.unpersist() }
  }

  /** Per-node triangle counts over an undirected pair relation — the
    * clustering-structure census of the duplicate/co-occurrence graph
    * (a dup cluster that is a clique is template spam; a hub with zero
    * triangles is a crawler artifact linking unrelated docs).
    *
    * Node-iterator with DEGREE ORDERING (the standard distributed
    * shape, cf. Suri & Vassilvitskii's MR triangle counting): each
    * edge is oriented from the (degree, id)-smaller endpoint to the
    * larger, wedges are generated only at each triangle's unique
    * minimum node, and the closing edge is probed in orientation
    * order — so every triangle materializes exactly once and wedge
    * fan-out per node is bounded by its ORIENTED out-degree, which
    * degree ordering caps near √m on any graph (a celebrity node of
    * degree 10⁶ generates no wedges: all its edges point INTO it).
    *
    * Scale (100 TB): three equi-joins (degree attach, wedge, close)
    * and two partial-aggregating counts; the wedge relation is the
    * peak intermediate at Σ out-deg² — the quantity degree ordering
    * minimizes. No driver state; emits every node with its degree and
    * triangle count (0 for triangle-free nodes).
    *
    * The deduped edge set `e` feeds two branches (degree census +
    * orientation), `deg` three (both degree attaches + the final
    * left join), and the oriented relation `o` three (two wedge arms
    * + the closing probe) — without pinning them, each branch replays
    * the whole upstream `pairs` lineage, and whether Spark's exchange
    * reuse rescues the plan depends on what the CALLER stacks on top
    * (round 10 measured the identical lineage at 4 s bare vs 35 s
    * under one extra aggregate). Eager `localCheckpoint` materializes
    * each exactly once — edge-/node-sized block-manager state, the
    * same fault-tolerance trade [[pageRank]] already makes. Repeated
    * library callers release the pinned blocks after consuming the
    * result via [[releaseCheckpoints]]. */
  def triangleCounts(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("degree").as("dv")), "v")
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(true)
    val wedges = o.select(col("src"), col("dst").as("x"), col("ddst").as("dx"))
      .join(o.select(col("src"), col("dst").as("y"), col("ddst").as("dy")),
        Seq("src"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tri = wedges
      .join(o.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .select(col("src").as("a"), col("x").as("b"), col("y").as("c"))
    val tn = tri.select(col("a").as("n"))
      .union(tri.select(col("b").as("n")))
      .union(tri.select(col("c").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.join(tn, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Cleanup hook for the eager-checkpoint trade [[triangleCounts]] and
    * [[pageRank]] make: once a caller has fully consumed a result, this
    * frees every localCheckpoint block in its lineage (the pinned
    * LogicalRDD leaves — `catalog.clearCache` does not cover them, so a
    * long-lived library caller invoking graph ops in a loop would
    * otherwise accumulate edge-sized block-manager state per call). The
    * relation is unusable afterwards — its lineage was truncated at the
    * checkpoint. The Verify/Bench mains achieve the same between
    * queries by sweeping `sparkContext.getPersistentRDDs`. */
  def releaseCheckpoints(df: DataFrame): Unit = Pinned.release(df)
}
