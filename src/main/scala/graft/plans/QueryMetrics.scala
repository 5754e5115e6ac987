package graft.plans

import org.apache.spark.sql.DataFrame

/** Physical-plan metrics capture — the "measure, don't guess" utility
  * behind the engine's perf work: execute a frame once and read back
  * the SQLMetrics Spark already collects per operator (output rows,
  * shuffle bytes written, spill), so a shuffle regression or an
  * unexpected spill shows up as a number in a spec instead of a
  * surprise on the cluster.
  *
  * The plan is executed through its own `executedPlan.execute()` RDD so
  * the metrics land on THIS plan instance (a `df.write...` action would
  * build a fresh QueryExecution and populate that one instead).
  */
object QueryMetrics {

  /** Aggregated measurements of one execution. `perNode` keys are
    * `"<nodeName>: <metric name>"` with summed values. */
  case class Profile(outputRows: Long, shuffleBytesWritten: Long,
      spillBytes: Long, perNode: Map[String, Long])

  /** Execute `df` (full evaluation, all partitions) and collect its
    * plan metrics. Runs one job; the frame's own lazy semantics are
    * untouched — callers re-use `df` afterwards as usual. */
  def profile(df: DataFrame): Profile = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ())
    // AQE hides the final tree behind AdaptiveSparkPlanExec and wraps
    // completed shuffles in QueryStageExec whose inner plan is not a
    // child — walk through both or the shuffle metrics are invisible
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val nodes = allNodes(qe.executedPlan)
    val nodeMetrics = nodes.flatMap { p =>
      p.metrics.toSeq.map { case (key, m) =>
        (s"${p.nodeName}: ${m.name.getOrElse(key)}", m.value)
      }
    }
    val byName = nodeMetrics.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    def sumWhere(pred: String => Boolean): Long =
      byName.collect { case (k, v) if pred(k.toLowerCase) => v }.sum
    Profile(
      // result cardinality = the TOPMOST node carrying a row-count
      // metric (`nodes` is pre-order, root first). Cardinality-
      // preserving tops without the metric (Project, Sort, WSCG
      // wrappers) are skipped past to the first counted node below
      // them — never the max across the tree, which is normally the
      // scan's input row count, not the result size.
      outputRows = nodes.iterator.flatMap { p =>
        p.metrics.collectFirst {
          case (k, m) if m.name.getOrElse(k) == "number of output rows" =>
            m.value
        }
      }.nextOption().getOrElse(0L),
      shuffleBytesWritten = sumWhere(_.contains("shuffle bytes written")),
      spillBytes = sumWhere(_.contains("spill size")),
      perNode = byName)
  }
}
