package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold Asset Builder: templated cadence aggregation over a calendar.
  *
  * Capability parity with the reference GAB
  * (`lakehouse_engine/algorithms/gab.py`, `core/gab_manager.py`,
  * `core/gab_sql_generator.py`): for a configured use case, aggregate the
  * source at each requested cadence (DAY/WEEK/MONTH/QUARTER/YEAR),
  * union the cadences into one unified insights dataset (the reference's
  * DELETE+INSERT into a unified table), and attach computed metrics —
  * formula-derived columns and window/lag metrics over previous cadence
  * periods (`core/gab_manager.py:630-838`).
  *
  * Scale shape: one shuffle per cadence (partial aggregation map-side),
  * cadence windows derived with `date_trunc` — no calendar-table join
  * needed for standard cadences; a custom calendar join (range BETWEEN)
  * is available via [[calendarJoin]] for fiscal variants.
  */
object Gab {

  /** One metric: output name -> aggregation expression over the source. */
  final case class Metric(name: String, agg: String, sourceCol: String)

  /** Formula metric computed over the aggregated row (any SQL expr). */
  final case class DerivedMetric(name: String, formula: String)

  /** Window metric over previous cadence periods per dimension group. */
  final case class WindowMetric(name: String, metric: String, agg: String,
      fromLag: Int, toLag: Int)

  final case class UseCase(
      name: String,
      dateCol: String,
      dimensions: Seq[String],
      metrics: Seq[Metric],
      cadences: Seq[String],
      derived: Seq[DerivedMetric] = Seq.empty,
      windows: Seq[WindowMetric] = Seq.empty)

  private def aggCol(m: Metric): Column = (m.agg.toLowerCase match {
    case "sum" => sum(col(m.sourceCol))
    case "avg" | "mean" => avg(col(m.sourceCol))
    case "min" => min(col(m.sourceCol))
    case "max" => max(col(m.sourceCol))
    case "count" => count(col(m.sourceCol))
    case "count_distinct" => countDistinct(col(m.sourceCol))
    case other => expr(s"$other(`${m.sourceCol}`)")
  }).as(m.name)

  /** Aggregate one cadence; returns dims + cadence window + metrics. */
  def aggregateCadence(source: DataFrame, uc: UseCase, cadence: String): DataFrame = {
    val trunc = cadence.toUpperCase match {
      case "DAY" => date_trunc("day", col(uc.dateCol))
      case "WEEK" => date_trunc("week", col(uc.dateCol))
      case "MONTH" => date_trunc("month", col(uc.dateCol))
      case "QUARTER" => date_trunc("quarter", col(uc.dateCol))
      case "YEAR" => date_trunc("year", col(uc.dateCol))
      case other => sys.error(s"unknown cadence: $other")
    }
    val grouped = source
      .groupBy((uc.dimensions.map(col) :+ trunc.cast("date").as("from_date")): _*)
      .agg(aggCol(uc.metrics.head), uc.metrics.tail.map(aggCol): _*)
      .withColumn("cadence", lit(cadence.toUpperCase))
      .withColumn("to_date", cadence.toUpperCase match {
        case "DAY" => date_add(col("from_date"), 1)
        case "WEEK" => date_add(col("from_date"), 7)
        case "MONTH" => add_months(col("from_date"), 1)
        case "QUARTER" => add_months(col("from_date"), 3)
        case "YEAR" => add_months(col("from_date"), 12)
      })
    val withDerived = uc.derived.foldLeft(grouped)((df, d) =>
      df.withColumn(d.name, expr(d.formula)))
    uc.windows.foldLeft(withDerived) { (df, w) =>
      val win = Window.partitionBy((uc.dimensions :+ "cadence").map(col): _*)
        .orderBy(col("from_date"))
        .rowsBetween(-w.fromLag, -w.toLag)
      val a = w.agg.toLowerCase match {
        case "sum" => sum(col(w.metric)).over(win)
        case "avg" | "mean" => avg(col(w.metric)).over(win)
        case "min" => min(col(w.metric)).over(win)
        case "max" => max(col(w.metric)).over(win)
        case "lag" => lag(col(w.metric), w.fromLag)
          .over(Window.partitionBy((uc.dimensions :+ "cadence").map(col): _*)
            .orderBy(col("from_date")))
      }
      df.withColumn(w.name, a)
    }
  }

  /** Build the unified insights dataset: union of all cadences. */
  def buildInsights(source: DataFrame, uc: UseCase): DataFrame =
    uc.cadences.map(c => aggregateCadence(source, uc, c))
      .reduce(_ unionByName _)
      .withColumn("use_case", lit(uc.name))

  /** Start date of the reconciliation window: the cutoff `nPeriods`
    * cadence periods back from the source's max date (reference
    * `core/gab_manager.py` recon-window computation). */
  def reconWindowStart(source: DataFrame, uc: UseCase, cadence: String, nPeriods: Int): java.sql.Date = {
    val trunc = date_trunc(cadence.toLowerCase, max(col(uc.dateCol)))
    val shifted = cadence.toUpperCase match {
      case "DAY" => date_add(trunc, -(nPeriods - 1))
      case "WEEK" => date_add(trunc, -7 * (nPeriods - 1))
      case "MONTH" => add_months(trunc, -(nPeriods - 1))
      case "QUARTER" => add_months(trunc, -3 * (nPeriods - 1))
      case "YEAR" => add_months(trunc, -12 * (nPeriods - 1))
    }
    source.agg(shifted.cast("date")).collect()(0).getDate(0)
  }

  /** Execute a use case into a parquet insights location, replacing that
    * use case's rows (the reference's DELETE+INSERT —
    * `algorithms/gab.py:485-532`).
    *
    * @param reconWindow when set, only the last N cadence periods are
    *        recomputed and replaced (the reference's reconciliation
    *        window) — older periods of the use case stay untouched, so an
    *        incremental refresh reads a bounded slice of the source.
    */
  def execute(spark: SparkSession, source: DataFrame, uc: UseCase,
      insightsLocation: String, reconWindow: Option[Int] = None): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(insightsLocation)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(insightsLocation))
    val (insights, keepOld): (DataFrame, DataFrame => DataFrame) = reconWindow match {
      case Some(n) if exists =>
        // per-cadence cutoffs; source pruned to the widest window
        val cutoffs = uc.cadences.map(c => c -> reconWindowStart(source, uc, c, n)).toMap
        val minCutoff = cutoffs.values.min(Ordering.by((d: java.sql.Date) => d.getTime))
        val pruned = source.where(col(uc.dateCol) >= lit(minCutoff))
        val rebuilt = buildInsights(pruned, uc)
          .where(uc.cadences.map(c =>
            col("cadence") === c.toUpperCase && col("from_date") >= lit(cutoffs(c)))
            .reduce(_ || _))
        (rebuilt, old => old.where(col("use_case") =!= uc.name ||
          uc.cadences.map(c =>
            col("cadence") === c.toUpperCase && col("from_date") < lit(cutoffs(c)))
            .reduce(_ || _)))
      case _ =>
        (buildInsights(source, uc), old => old.where(col("use_case") =!= uc.name))
    }
    val existing =
      if (exists) Some(keepOld(spark.read.parquet(insightsLocation)))
      else None
    val unioned = existing.map(_.unionByName(insights, allowMissingColumns = true))
      .getOrElse(insights)
    val stage = insightsLocation.stripSuffix("/") + "__stage"
    unioned.write.mode("overwrite").parquet(stage)
    graft.io.StagedSwap.commit(
      spark.sparkContext.hadoopConfiguration, insightsLocation, stage)
    spark.read.parquet(insightsLocation)
  }

  /** Generate a calendar dimension (one row per day) for range joins. */
  def calendar(spark: SparkSession, from: String, to: String): DataFrame =
    spark.sql(
      s"""SELECT explode(sequence(DATE '$from', DATE '$to', INTERVAL 1 DAY)) AS calendar_date""")

  /** GAB-style calendar range join: attach cadence windows to fact rows
    * via BETWEEN (`algorithms/gab.py:668-684`). The calendar side is tiny
    * and broadcast, so Catalyst plans a broadcast nested-loop join — the
    * right shape for a range condition against a small dimension. */
  def calendarJoin(fact: DataFrame, dateCol: String, windows: DataFrame): DataFrame =
    fact.join(broadcast(windows),
      col(dateCol) >= col("cadence_start_date") && col(dateCol) < col("cadence_end_date"))
}
