package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining over a (basket, item) relation —
  * the 2-itemset census with support / confidence / lift, the
  * co-occurrence statistic a curation pipeline uses to find templated
  * page families ("docs containing boilerplate A almost always contain
  * boilerplate B") and a recommender's first-order signal. Extension
  * scope (SURVEY.md §7.5); the reference has no co-occurrence mining.
  *
  * Scale (100 TB): one shuffle on the basket key, then pair generation
  * is PARTITION-LOCAL — a self-equi-join on `basket` whose per-basket
  * cost is bounded by `maxBasketItems`² (oversized baskets are dropped
  * up front, the standard guard: a pathological 10⁶-item basket would
  * otherwise emit 10¹² pairs from one task). Pair and item supports are
  * partial-aggregating group-bys; the basket census is one 1-row frame
  * broadcast back. No driver state, no collect — the full-itemset
  * generalization (FP-growth) only matters past 2-itemsets, which this
  * operator deliberately does not chase.
  */
object Assoc {

  /** Association rules over unordered item PAIRS.
    *
    * Output: one row per unordered co-occurring pair `(item_a <
    * item_b)` with `supp_ab ≥ minSupport`, carrying both directional
    * confidences and the (symmetric) lift:
    * `conf_ab = supp_ab / supp_a`, `lift = supp_ab·N / (supp_a·supp_b)`
    * with N = number of (retained) baskets. Doubles are rounded to 6 dp
    * — counts here are small integers, so the quotient is far inside
    * the cross-engine-stable range (the q_tfidf precedent).
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketItems: Int = 1024): DataFrame = {
    require(minSupport >= 1, "pairRules: minSupport must be >= 1")
    require(maxBasketItems >= 2, "pairRules: maxBasketItems must be >= 2")
    val items = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    // skew guard: drop baskets that would explode the pair join; the
    // size census reuses the distinct's hash partitioning on b
    val sized = items.groupBy(col("b"))
      .agg(count(lit(1)).as("basket_sz"))
      .filter(col("basket_sz") <= maxBasketItems)
      .select(col("b"))
    val kept = items.join(sized, "b")
    val nBaskets = kept.agg(countDistinct(col("b")).as("n_baskets"))
    val supp = kept.groupBy(col("i")).agg(count(lit(1)).as("supp"))
    val pairSupp = kept.as("x")
      .join(kept.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
    pairRulesFromCensus(supp, pairSupp, nBaskets, minSupport)
  }

  /** [[pairRules]] from pre-computed censuses — the consumer of the
    * maintained-at-ingest basket ledger (`Streaming.assocIngest`):
    * `supp(i, supp)`, `pairSupp(item_a, item_b, supp_ab)` and the
    * basket count are all ADDITIVE across ticks PROVIDED ticks
    * partition whole baskets (partition the stream on the basket key —
    * a basket split across ticks would under-count its own pairs).
    * Rules off the summed ledger then equal the batch scan (shared
    * oracle). */
  def pairRulesFromCensus(supp: DataFrame, pairSupp: DataFrame,
      nBaskets: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, "pairRulesFromCensus: minSupport must be >= 1")
    pairSupp
      .filter(col("supp_ab") >= minSupport)
      .join(supp.select(col("i").as("item_a"), col("supp").as("supp_a")),
        "item_a")
      .join(supp.select(col("i").as("item_b"), col("supp").as("supp_b")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("supp_ab"),
        round(col("supp_ab") / col("supp_a"), 6).as("conf_ab"),
        round(col("supp_ab") / col("supp_b"), 6).as("conf_ba"),
        round((col("supp_ab") * col("n_baskets")) /
          (col("supp_a") * col("supp_b")), 6).as("lift"))
  }
}
