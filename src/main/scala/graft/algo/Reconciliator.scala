package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset reconciliation: truth vs current diffing with thresholds.
  *
  * Capability parity with the reference Reconciliator
  * (`lakehouse_engine/algorithms/reconciliator.py:43-312`): full-outer join
  * on the non-metric columns, per-metric absolute/percentage diffs
  * (null-safe via coalesce/try_divide), followed by a single aggregate and
  * driver-side yellow/red threshold evaluation.
  */
object Reconciliator {

  /** Outcome of one metric's threshold evaluation. */
  final case class MetricStatus(
      metric: String, value: Double, yellow: Double, red: Double, status: String)

  /** Row-level reconciliation diff.
    *
    * @param metrics pairs of (truth metric column, current metric column)
    * @return one row per key with `absolute_diff` / `percentage_diff`
    *         columns per metric pair (suffixed when multiple pairs)
    */
  def diff(
      truth: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      metrics: Seq[(String, String)]): DataFrame = {
    val joinCond = keys.map(k => truth(k) <=> current(k)).reduce(_ && _)
    val joined = truth.as("truth").join(current.as("current"), joinCond, "full_outer")
    val keyCols = keys.map(k => coalesce(col(s"truth.$k"), col(s"current.$k")).as(k))
    val metricCols = metrics.flatMap { case (tm, cm) =>
      val suffix = if (metrics.size > 1) s"_$tm" else ""
      val t = coalesce(col(s"truth.$tm"), lit(0)).cast("double")
      val c = coalesce(col(s"current.$cm"), lit(0)).cast("double")
      Seq(
        col(s"truth.$tm").as(tm),
        col(s"current.$cm").as(cm),
        abs(t - c).as(s"absolute_diff$suffix"),
        when(t === 0, lit(null)).otherwise(abs(t - c) / abs(t))
          .as(s"percentage_diff$suffix"))
    }
    joined.select(keyCols ++ metricCols: _*)
  }

  /** Aggregate a diff with a chosen aggregation per metric column (any
    * `org.apache.spark.sql.functions` aggregator name, as in the
    * reference's getattr-based lookup). */
  def aggregateDiff(
      diffDf: DataFrame,
      aggs: Seq[(String, String)]): DataFrame = {
    val aggCols = aggs.map { case (fn, c) =>
      val agg = fn match {
        case "sum" => sum(col(c))
        case "avg" | "mean" => avg(col(c))
        case "max" => max(col(c))
        case "min" => min(col(c))
        case "count" => count(col(c)).cast("double")
        case other => expr(s"$other(`$c`)")
      }
      agg.as(s"${fn}_$c")
    }
    diffDf.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Driver-side yellow/red evaluation of an aggregated 1-row diff. */
  def evaluate(
      aggregated: DataFrame,
      thresholds: Map[String, (Double, Double)]): Seq[MetricStatus] = {
    val row = aggregated.collect()(0)
    thresholds.toSeq.sortBy(_._1).map { case (metric, (yellow, red)) =>
      val v = Option(row.getAs[Any](metric)).map(_.toString.toDouble).getOrElse(0.0)
      val status =
        if (v >= red) "red" else if (v >= yellow) "yellow" else "green"
      MetricStatus(metric, v, yellow, red, status)
    }
  }

  /** Full reconciliation: diff -> aggregate -> evaluate; throws on red
    * breach like the reference's ReconciliationFailedException. */
  def reconcile(
      truth: DataFrame,
      current: DataFrame,
      keys: Seq[String],
      metrics: Seq[(String, String)],
      agg: String = "max",
      thresholds: Map[String, (Double, Double)] = Map.empty,
      failOnRed: Boolean = true): Seq[MetricStatus] = {
    val d = diff(truth, current, keys, metrics).cache()
    val diffCols = d.columns.filter(c => c.startsWith("absolute_diff") || c.startsWith("percentage_diff"))
    val aggregated = aggregateDiff(d, diffCols.toSeq.map(c => agg -> c))
    val statuses = evaluate(aggregated,
      if (thresholds.nonEmpty) thresholds
      else diffCols.map(c => s"${agg}_$c" -> (Double.MaxValue, Double.MaxValue)).toMap)
    d.unpersist()
    if (failOnRed && statuses.exists(_.status == "red"))
      throw new IllegalStateException(
        s"Reconciliation failed (red): ${statuses.filter(_.status == "red")}")
    statuses
  }
}
