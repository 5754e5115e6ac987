package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pre-training data pipeline
  * built from this engine's individually-proven stages:
  *
  *   1. language gate    ([[TextAnalysis.langId]])
  *   2. quality gate     ([[TextAnalysis.qualityScore]])
  *   3. near-dup removal ([[Dedup.simhashDupPairs]] →
  *                        [[Dedup.dupClusters]] → keep each cluster's
  *                        canonical min-id survivor + all singletons)
  *   4. reproducible split assignment ([[Sampling.splitLabel]])
  *
  * Order matters and mirrors production practice: gates first (cheap,
  * narrow, shed rows before any shuffle), dedup on the surviving set
  * (pairs among rejected docs are wasted work), split last (so
  * train/val proportions hold on the final corpus).
  *
  * Scale shape: stages 1-2 and 4 are pure per-row expressions; stage 3
  * is the simhash pigeonhole join + iterative label propagation —
  * the only shuffling stage, keyed on signature chunks and node ids.
  * The cluster relation is dup-docs-sized (usually ≪ corpus), joined
  * back on id.
  */
object Curation {

  /** @param cuts  ascending cumulative split percentages, e.g.
    *              `Seq("train" -> 90)` with `lastLabel = "val"` ⇒ 90/10 */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      lang: String, minQuality: Double, maxHamming: Int = 7,
      cuts: Seq[(String, Int)] = Seq("train" -> 90),
      lastLabel: String = "val"): DataFrame = {
    // `kept` feeds two DAG branches (the dedup pipeline and the final
    // survivor join) — persist so the gate expressions run once per
    // row. Same caching contract as the Dedup pair-finders: lazy
    // persist, released by the caller's clearCache between runs.
    val kept = docs
      .select(col(idCol), col(textCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.nTokens(col(textCol)).as("n_tokens"))
      .filter(TextAnalysis.langId(col(textCol)) === lang &&
        col("quality") >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clusters =
      Dedup.dupClusters(Dedup.simhashDupPairs(kept, idCol, textCol, maxHamming))
        // avoid capture by the caller's possible "id"/"cluster_id" names
        .toDF("_dup_id", "_dup_cluster")
    kept.join(clusters, kept(idCol) === col("_dup_id"), "left")
      // survivors: docs in no duplicate pair (null cluster) + canonicals
      .filter(col("_dup_id").isNull || col("_dup_cluster") === kept(idCol))
      .select(kept(idCol), col("quality"), col("n_tokens"),
        Sampling.splitLabel(kept(idCol), cuts, lastLabel).as("split"))
  }
}
