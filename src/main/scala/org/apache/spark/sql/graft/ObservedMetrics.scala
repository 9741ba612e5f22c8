package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Synchronous read of a plan's collected observation metrics.
  *
  * `Observation.get` blocks on a QueryExecutionListener event, and that
  * event is only posted for DATASET actions (count/collect) — forcing a
  * query through `queryExecution.toRdd` (the exact-plan timing
  * convention of `graft.tools.ScaleCurve`) never fires it, so a blocking
  * `get` deadlocks. The metric accumulators themselves ARE populated by
  * the tasks, though; this helper collects them straight off the
  * executed plan after the action returns. Lives in the
  * `org.apache.spark.sql` namespace for `private[sql]` access to
  * [[CollectMetricsExec.collect]].
  */
object ObservedMetrics {

  /** All observation rows of `df`'s executed plan, keyed by observation
    * name. Call AFTER an action has run the plan. Descends into AQE
    * wrapper nodes explicitly — `AdaptiveSparkPlanExec` / `QueryStageExec`
    * keep their physical subtree out of `children`, so the stock
    * [[CollectMetricsExec.collect]] traversal never sees metrics nodes
    * buried under an adaptive plan. */
  def of(df: DataFrame): Map[String, Row] = {
    def find(p: SparkPlan): Seq[CollectMetricsExec] =
      p.collect {
        case c: CollectMetricsExec => Seq(c)
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: QueryStageExec => find(q.plan)
      }.flatten
    find(df.queryExecution.executedPlan)
      .map(c => c.name -> c.collectedMetrics).toMap
  }

  /** The named long metric from any observation on `df`, if present. */
  def long(df: DataFrame, metric: String): Option[Long] =
    of(df).values.flatMap { r =>
      r.schema.fieldNames.zipWithIndex.collect {
        case (`metric`, i) if !r.isNullAt(i) => r.getLong(i)
      }
    }.headOption
}
