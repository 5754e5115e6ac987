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
}
