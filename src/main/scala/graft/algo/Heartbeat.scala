package graft.algo

import graft.spec.InputSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heartbeat: a fleet of sensors driven by a control dataset, triggering
  * downstream jobs when upstreams have new data.
  *
  * Capability parity with `lakehouse_engine/algorithms/sensors/heartbeat.py`:
  * iterate the heartbeat control rows, build a sensor spec per source, run
  * the sensor check, and on acquisition fire the downstream job. The
  * reference calls the Databricks Jobs `run-now` REST API; here the
  * trigger is a pluggable trait (the same pattern as the REST writer's
  * transport) so schedulers other than Databricks — or a test recorder —
  * plug in without touching the control flow.
  */
object Heartbeat {

  /** Downstream job launcher ("jobs/run-now" in the reference). */
  trait JobTrigger {
    def trigger(jobId: String, sensorId: String): Unit
  }

  /** One heartbeat source row. */
  final case class Source(
      sensorId: String,
      location: String,
      dataFormat: String = "parquet",
      readType: String = "batch",
      schema: Option[String] = None,
      options: Map[String, String] = Map.empty,
      jobId: String = "",
      enabled: Boolean = true)

  final case class Result(sensorId: String, acquiredNewData: Boolean, triggeredJob: Option[String])

  /** Run one heartbeat sweep over the given sources. */
  def run(
      spark: SparkSession,
      controlLocation: String,
      sources: Seq[Source],
      jobTrigger: JobTrigger): Seq[Result] = {
    val sensor = new Sensor(spark, controlLocation)
    sources.filter(_.enabled).map { src =>
      val spec = InputSpec(
        specId = src.sensorId,
        readType = src.readType,
        dataFormat = Some(src.dataFormat),
        location = Some(src.location),
        schema = src.schema,
        options = src.options)
      val acquired = sensor.checkUpstream(src.sensorId, spec)
      val triggered =
        if (acquired && src.jobId.nonEmpty) {
          jobTrigger.trigger(src.jobId, src.sensorId)
          Some(src.jobId)
        } else None
      Result(src.sensorId, acquired, triggered)
    }
  }

  /** Load sources from a heartbeat control DataFrame (columns mirror the
    * reference's heartbeat control table). */
  def sourcesFrom(df: DataFrame): Seq[Source] =
    df.select(
        col("sensor_id"), col("location"),
        coalesce(col("data_format"), lit("parquet")).as("data_format"),
        coalesce(col("read_type"), lit("batch")).as("read_type"),
        col("job_id"),
        coalesce(col("enabled"), lit(true)).as("enabled"))
      .collect().toSeq.map { r =>
        Source(
          sensorId = r.getString(0), location = r.getString(1),
          dataFormat = r.getString(2), readType = r.getString(3),
          jobId = Option(r.getString(4)).getOrElse(""),
          enabled = r.getBoolean(5))
      }
}
