package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan contracts: the physical-plan properties the engine's scale
  * story depends on (SCALING.md). These fail if a refactor silently
  * loses predicate pushdown, a broadcast, the top-k plan shape, or
  * map-side partial aggregation. */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate predicate reaches the parquet scan, columns pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_comment"), "projection must prune unused columns")
  }

  test("revenue: dimension join is a broadcast hash join") {
    assert(plan("q_revenue_by_nation").contains("BroadcastHashJoin"))
  }

  test("recent events: ORDER BY + LIMIT plans distributed top-k") {
    assert(plan("q_recent_events").contains("TakeOrderedAndProject"))
  }

  test("knn: query side broadcasts; rank pushes a window group limit") {
    val p = plan("q_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune inside the window, not after it")
  }

  test("habit daily: hash aggregation splits partial/final") {
    val p = plan("q_habit_daily")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected map-side partial + final aggregate")
  }

  test("knn vec_id<8 query filter reaches the embeddings scan") {
    assert(plan("q_knn_bruteforce").contains("LessThan(vec_id,8)"))
  }
}
