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
/** The reference's ReconciliationFailedException
  * (`algorithms/exceptions.py`). */
final class ReconciliationFailedException(msg: String)
    extends RuntimeException(msg)

object Reconciliator {

  /** The reference's ACON-driven entry (`execute_reconciliation`,
    * `algorithms/reconciliator.py:43-312`): read truth/current through
    * any input spec, optionally preprocess each with a SQL query over a
    * `truth`/`current` temp view plus cache/persist transformer args,
    * join on every non-metric column, compute per-metric
    * absolute/percentage diffs with the reference's exact null algebra
    * (null pct from a 0-truth divide counts 0 when the values null-safe
    * match, else 1), aggregate each metric with its own aggregation, and
    * evaluate yellow/red per metric. Raises ReconciliationFailedException
    * with the reference's message on empty inputs or a non-green status.
    *
    * @return the recon results map (metric_type_diff_agg -> value) when
    *         the process succeeds (green)
    */
  def runAcon(
      spark: org.apache.spark.sql.SparkSession,
      acon: Map[String, Any],
      dfs: graft.io.Readers.DfSupplier =
        name => sys.error(s"no DataFrame registered as '$name'")): Map[String, Double] = {
    import graft.spec.Specs.A._
    val metrics = seqOfMaps(acon, "metrics")
    require(metrics.nonEmpty, "reconciliation needs metrics")
    def readSide(specKey: String, queryKey: String, argsKey: String,
        view: String): DataFrame = {
      val in = graft.spec.Specs.inputSpec(anyMap(acon, specKey))
      var df = graft.io.Readers.read(spark, in, dfs)
      str(acon, queryKey).foreach { q =>
        df.createOrReplaceTempView(view)
        df = spark.sql(q)
      }
      // preprocess args: absent -> default cache; [] -> nothing;
      // otherwise only cache/persist are available
      // (ReconciliationTransformers.AVAILABLE_TRANSFORMERS)
      acon.get(argsKey) match {
        case None => df = df.cache()
        case Some(args: Seq[_]) =>
          seqOfMaps(acon, argsKey).foreach { t =>
            str(t, "function").getOrElse("") match {
              case "cache" => df = df.cache()
              case "persist" =>
                val lvl = str(anyMap(t, "args"), "storage_level")
                  .getOrElse("MEMORY_AND_DISK")
                df = df.persist(
                  graft.exec.StorageLevels.parse(lvl))
              case other => sys.error(
                s"reconciliation preprocess transformer '$other' is not available")
            }
          }
        case Some(_) => ()
      }
      df
    }
    val truth = readSide("truth_input_spec", "truth_preprocess_query",
      "truth_preprocess_query_args", "truth")
    val current = readSide("current_input_spec", "current_preprocess_query",
      "current_preprocess_query_args", "current")

    if (bool(acon, "ignore_empty_df") && truth.isEmpty && current.isEmpty)
      return Map.empty // both empty: succeed without reconciling

    if (truth.isEmpty || current.isEmpty)
      throw new ReconciliationFailedException(
        "The reconciliation has failed because either the truth dataset or " +
          "the current results dataset was empty.")

    val metricNames = metrics.flatMap(str(_, "metric")).toSet
    val joinCond = current.columns.filterNot(metricNames)
      .map(c => truth(c) === current(c))
      .reduceOption(_ && _).getOrElse(lit(true))
    var joined = truth.alias("truth").join(current.alias("current"), joinCond, "full")
    metrics.foreach { m =>
      val name = str(m, "metric").get
      val diffCol = s"${name}_${str(m, "type").get}_diff"
      val d = str(m, "type").get match {
        case "percentage" =>
          coalesce(
            abs(try_divide(col(s"current.$name") - col(s"truth.$name"),
              abs(col(s"truth.$name")))),
            when(col(s"current.$name") <=> col(s"truth.$name"), lit(0))
              .otherwise(lit(1)))
        case "absolute" =>
          abs(coalesce(col(s"current.$name"), lit(0)) -
            coalesce(col(s"truth.$name"), lit(0)))
        case other => sys.error(
          s"The requested reconciliation type is not yet implemented: $other")
      }
      joined = joined.withColumn(diffCol, d.cast("float"))
    }
    val aggCols = metrics.map { m =>
      val diffCol = s"${str(m, "metric").get}_${str(m, "type").get}_diff"
      val fn = str(m, "aggregation").get
      (fn match {
        case "sum" => sum(col(diffCol))
        case "avg" | "mean" => avg(col(diffCol))
        case "max" => max(col(diffCol))
        case "min" => min(col(diffCol))
        case other => expr(s"$other(`$diffCol`)")
      }).as(s"${diffCol}_$fn")
    }
    val row = joined.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val results = row.schema.fieldNames.map(f =>
      f -> Option(row.getAs[Any](f)).map(_.toString.toDouble).getOrElse(0.0)).toMap

    var status = "green"
    metrics.foreach { m =>
      val key = s"${str(m, "metric").get}_${str(m, "type").get}_diff_${str(m, "aggregation").get}"
      val v = results(key)
      val yellow = num(m, "yellow").get
      val red = num(m, "red").get
      if (red <= v) status = "red"
      else if (yellow <= v && v < red && status == "green") status = "yellow"
    }
    if (status != "green")
      throw new ReconciliationFailedException(
        s"The Reconciliation process has failed with status: $status.")
    results
  }


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
