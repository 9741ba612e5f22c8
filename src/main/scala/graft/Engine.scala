package graft

import graft.spec.{DQSpec, InputSpec, TerminatorSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library's public entry points, one per reference API function
  * (`lakehouse_engine/engine.py:29-476`) — the surface a user of the
  * reference programs against, re-expressed with Scala signatures. Each
  * call delegates to the corresponding algorithm; nothing here adds
  * behavior, so a caller can equally use the algorithm objects directly.
  */
object Engine {

  /** `load_data`: run an ACON pipeline (read -> transform -> DQ -> write
    * -> terminate); returns the produced DataFrames by spec id. */
  def loadData(
      spark: SparkSession, aconJson: String,
      dfs: Map[String, DataFrame] = Map.empty,
      customFns: Map[String, DataFrame => DataFrame] = Map.empty): Map[String, DataFrame] =
    algo.DataLoader.loadData(spark, aconJson, dfs, customFns)

  /** `execute_reconciliation`: truth-vs-current diff with thresholded
    * metrics; throws on a red breach. */
  def executeReconciliation(
      truth: DataFrame, current: DataFrame, keys: Seq[String],
      metrics: Seq[(String, String)], agg: String = "max",
      thresholds: Map[String, (Double, Double)] = Map.empty,
      failOnRed: Boolean = true): Seq[algo.Reconciliator.MetricStatus] =
    algo.Reconciliator.reconcile(truth, current, keys, metrics, agg, thresholds, failOnRed)

  /** `execute_dq_validation`: stand-alone DQ over any readable input,
    * optionally restoring the previous [[io.Versioned]] generation on a
    * breached policy (the reference's Delta-restore path). */
  def executeDqValidation(
      spark: SparkSession, input: InputSpec, dqSpec: DQSpec,
      restorePrevVersion: Boolean = false): dq.DQRunResult =
    algo.DQValidator.validate(spark, input, dqSpec, restorePrevVersion)

  /** `manage_table`: DDL/maintenance operations. */
  def manageTable(spark: SparkSession): maintain.TableManager =
    new maintain.TableManager(spark)

  /** `manage_files`: file-system operations. */
  def manageFiles(spark: SparkSession): maintain.FileManager =
    new maintain.FileManager(spark)

  /** `execute_sensor`: check one upstream; true when new data acquired. */
  def executeSensor(
      spark: SparkSession, controlLocation: String, sensorId: String,
      upstream: InputSpec, preprocessQuery: Option[String] = None,
      assets: Seq[String] = Seq.empty): Boolean =
    new algo.Sensor(spark, controlLocation)
      .checkUpstream(sensorId, upstream, preprocessQuery, assets)

  /** `update_sensor_status`: mark a sensor's data consumed. */
  def updateSensorStatus(
      spark: SparkSession, controlLocation: String, sensorId: String): Unit =
    new algo.Sensor(spark, controlLocation).markProcessed(sensorId)

  /** `generate_sensor_query`: preprocess query for a sensor config
    * (reference `core/sensor_manager.py:232-328`). With a `filterExp`,
    * builds the counting watermark query over `sensor_new_data` (or
    * `upstreamTableName`), substituting `?upstream_key` /
    * `?upstream_value`; without one, the sensor-on-sensor query over the
    * upstream sensor table's CDF-style feed. */
  def generateSensorQuery(
      sensorId: String,
      filterExp: Option[String] = None,
      upstreamKey: Option[String] = None,
      upstreamValue: Option[String] = None,
      upstreamTableName: Option[String] = None): String =
    filterExp match {
      case Some(exp) =>
        val source = upstreamTableName.getOrElse("sensor_new_data")
        val (select, resolved) = upstreamKey match {
          case Some(k) =>
            val v = upstreamValue.getOrElse("-2147483647")
            (s"SELECT COUNT(1) as count, '$k' as UPSTREAM_KEY, " +
              s"max($k) as UPSTREAM_VALUE",
              exp.replace("?upstream_key", k).replace("?upstream_value", v))
          case None => ("SELECT COUNT(1) as count", exp)
        }
        s"$select FROM $source WHERE $resolved HAVING COUNT(1) > 0"
      case None =>
        "SELECT * FROM sensor_new_data WHERE" +
          " _change_type in ('insert', 'update_postimage')" +
          s" and sensor_id = '$sensorId'" +
          s" and status = '${algo.Sensor.Processed}'"
    }

  /** `send_notification`: render + deliver through the pluggable
    * transport. */
  def sendNotification(spec: TerminatorSpec, failed: Boolean = false): Unit =
    algo.Notifier.notify(spec, failed)

  /** `execute_gab`: run every active config-table use case and register
    * its consumption views. */
  def executeGab(
      spark: SparkSession, config: DataFrame, source: DataFrame,
      insightsLocation: String, reconWindow: Option[Int] = None,
      logLocation: Option[String] = None): Seq[algo.Gab.ConfiguredUseCase] =
    algo.Gab.executeFromConfig(spark, config, source, insightsLocation,
      reconWindow, logLocation)

  /** `execute_heartbeat_sensor`: sweep one sensor source over the
    * heartbeat control table. */
  def executeHeartbeatSensor(
      spark: SparkSession, controlLocation: String,
      sensorControlLocation: String, sensorSource: String): Seq[(String, String)] =
    algo.Heartbeat.sweepControl(spark, controlLocation, sensorControlLocation, sensorSource)

  /** `trigger_heartbeat_sensor_jobs`: fire dependency-satisfied jobs. */
  def triggerHeartbeatSensorJobs(
      spark: SparkSession, controlLocation: String,
      jobTrigger: algo.Heartbeat.JobTrigger): Seq[String] =
    algo.Heartbeat.triggerReadyJobs(spark, controlLocation, jobTrigger)

  /** `execute_heartbeat_sensor_data_feed`: merge a feed into the
    * heartbeat control table. */
  def executeHeartbeatSensorDataFeed(
      spark: SparkSession, controlLocation: String, feed: DataFrame): DataFrame =
    algo.Heartbeat.controlTableDataFeed(spark, controlLocation, feed)

  /** `update_heartbeat_sensor_status`: completion callback for a
    * triggered job. */
  def updateHeartbeatSensorStatus(
      spark: SparkSession, controlLocation: String,
      sensorControlLocation: String, jobId: String): Unit =
    algo.Heartbeat.completeJob(spark, controlLocation, sensorControlLocation, jobId)
}
