package graft.algo

import graft.io.Readers
import graft.operators.MergeOps
import graft.spec.InputSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Upstream new-data detection with a persistent control table.
  *
  * Capability parity with `lakehouse_engine/algorithms/sensor.py:25-167`
  * and `core/sensor_manager.py`: a sensor reads its upstream (any reader
  * spec), optionally pre-filters with a query over the `sensor_new_data`
  * view, and flips its control-table row to ACQUIRED_NEW_DATA when rows
  * exist. Downstream jobs mark PROCESSED_NEW_DATA after consuming. The
  * control table is a parquet location maintained via the native MERGE
  * (Delta in the reference — `core/definitions.py:1145-1169`).
  */
final class Sensor(spark: SparkSession, controlLocation: String) {

  import Sensor._

  def controlDf(): DataFrame = {
    val fs = new Path(controlLocation).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(controlLocation)))
      spark.read.schema(ControlSchema).parquet(controlLocation)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ControlSchema)
  }

  /** Check one sensor's upstream; returns true when new data was acquired.
    *
    * Registration contract (reference `algorithms/sensor.py:39-88`): a
    * sensor_id must keep its asset set and an asset set must keep its
    * sensor_id — re-registering either under a different partner raises
    * [[Sensor.SensorAlreadyExistsException]]. With `failOnEmptyResult`
    * (the reference's `fail_on_empty_result`), an empty upstream raises
    * [[Sensor.NoNewDataException]] instead of returning false. */
  def checkUpstream(
      sensorId: String,
      upstream: InputSpec,
      preprocessQuery: Option[String] = None,
      assets: Seq[String] = Seq.empty,
      failOnEmptyResult: Boolean = false): Boolean = {
    assertNotDuplicate(sensorId, assets)
    val raw = Readers.read(spark, upstream)
    val hasNew =
      if (raw.isStreaming) {
        // streaming sensor: drain availableNow, flag when any batch has
        // rows (reference `algorithms/sensor.py:90-108`)
        val found = new java.util.concurrent.atomic.AtomicBoolean(false)
        raw.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            s"${controlLocation.stripSuffix("/")}__ckpt/$sensorId")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val candidate = preprocessQuery match {
              case Some(q) =>
                batch.createOrReplaceTempView("sensor_new_data")
                spark.sql(q)
              case None => batch
            }
            if (candidate.limit(1).count() > 0) found.set(true)
          }.start().awaitTermination()
        found.get()
      } else {
        val candidate = preprocessQuery match {
          case Some(q) =>
            raw.createOrReplaceTempView("sensor_new_data")
            spark.sql(q)
          case None => raw
        }
        candidate.limit(1).count() > 0
      }
    if (hasNew) updateStatus(sensorId, Acquired, assets)
    else if (failOnEmptyResult)
      throw Sensor.NoNewDataException(
        s"No data was acquired by $sensorId sensor.")
    hasNew
  }

  /** Mark a sensor's data as consumed (assets registration is kept —
    * status changes must not erase the sensor's identity row). */
  def markProcessed(sensorId: String): Unit =
    updateStatus(sensorId, Processed, registeredAssets(sensorId))

  private def registeredAssets(sensorId: String): Seq[String] =
    controlDf().where(col("sensor_id") === sensorId)
      .select("assets").collect().headOption
      .flatMap(r => Option(r.getSeq[String](0))).getOrElse(Seq.empty)

  /** Reference `sensor.py:74-88`: same id with different assets, or same
    * assets under a different id, is a duplicate registration. */
  private def assertNotDuplicate(sensorId: String, assets: Seq[String]): Unit = {
    val rows = controlDf().select("sensor_id", "assets").collect()
      .map(r => (r.getString(0), Option(r.getSeq[String](1)).getOrElse(Seq.empty)))
    val conflict = rows.exists { case (id, regAssets) =>
      (id == sensorId && regAssets.nonEmpty && assets.nonEmpty && regAssets != assets) ||
        (id != sensorId && assets.nonEmpty && regAssets == assets)
    }
    if (conflict)
      throw Sensor.SensorAlreadyExistsException(
        "There's already a sensor registered with same id or assets!")
  }

  def status(sensorId: String): Option[String] =
    controlDf().where(col("sensor_id") === sensorId)
      .select("status").collect().headOption.map(_.getString(0))

  private def updateStatus(sensorId: String, status: String, assets: Seq[String]): Unit = {
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    import spark.implicits._
    val update = Seq((sensorId, assets, status, now, s"$controlLocation/../checkpoints/$sensorId"))
      .toDF("sensor_id", "assets", "status", "status_change_timestamp", "checkpoint_location")
    val merged = MergeOps.merge(
      controlDf(), update.select(ControlSchema.fieldNames.map(col): _*), Seq("sensor_id"))
    val stage = controlLocation.stripSuffix("/") + "__stage"
    merged.coalesce(1).write.mode("overwrite").parquet(stage)
    graft.io.StagedSwap.commit(
      spark.sparkContext.hadoopConfiguration, controlLocation, stage)
  }
}

object Sensor {
  val Acquired = "ACQUIRED_NEW_DATA"
  val Processed = "PROCESSED_NEW_DATA"

  /** Reference `SensorAlreadyExistsException` (duplicate registration). */
  final case class SensorAlreadyExistsException(msg: String)
    extends RuntimeException(msg)

  /** Reference `NoNewDataException` (`fail_on_empty_result`). */
  final case class NoNewDataException(msg: String)
    extends RuntimeException(msg)

  /** Reference SENSOR_SCHEMA (`core/definitions.py:1145-1155`). */
  val ControlSchema: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("assets", ArrayType(StringType)),
    StructField("status", StringType, nullable = false),
    StructField("status_change_timestamp", TimestampType, nullable = false),
    StructField("checkpoint_location", StringType)))
}

/** Stand-alone data-quality validation over any readable input.
  *
  * Capability parity with `lakehouse_engine/algorithms/dq_validator.py`:
  * read via the reader factory (streaming inputs are drained with a
  * trigger-once foreachBatch, as in the reference), run the DQ engine,
  * optionally write the result sink. `restorePrevVersion` mirrors the
  * reference's Delta restore-on-failure (`dq_validator.py:154-169`) over
  * [[graft.io.Versioned]] parquet locations: a breached policy rolls the
  * input back to its previous version before rethrowing.
  */
object DQValidator {

  def validate(
      spark: SparkSession,
      input: InputSpec,
      dqSpec: graft.spec.DQSpec,
      restorePrevVersion: Boolean = false,
      dfs: Readers.DfSupplier =
        name => sys.error(s"no DataFrame registered as '$name'")): graft.dq.DQRunResult = try {
    val df = Readers.read(spark, input, dfs)
    // duplicated PRISMA rule ids fail the validator before any DQ runs
    // (`dq_validator.py:95-103`)
    graft.dq.Prisma.raiseOnDuplicates(spark, Seq(dqSpec))
    val batchDf =
      if (!df.isStreaming) df
      else {
        // drain the stream once into a temp batch view (reference
        // `dq_validator.py:105-117`)
        val tmp = java.nio.file.Files.createTempDirectory("dq-validate").toString
        df.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$tmp/data")
          }.start().awaitTermination()
        spark.read.parquet(s"$tmp/data")
      }
    // PRISMA specs resolve at the stand-alone execution point
    // (`engine.py:108` execute_dq_validation -> "at_rest")
    val dq = graft.dq.Prisma.resolve(spark, dqSpec, "at_rest")
    val (result, failure) = graft.dq.DQEngine.runOutcome(spark, batchDf, dq)
    dq.resultSink.foreach(sink => graft.io.Writers.writeBatch(
      spark, graft.dq.DQEngine.resultSinkSpec(dq, sink),
      graft.dq.DQEngine.resultSinkOutput(spark, batchDf, dq, result)))
    graft.dq.Prisma.writeProcessedKeys(spark, dq, batchDf, result.runName)
    failure.foreach(throw _)
    result
  } catch {
    case e: graft.dq.DQValidationFailedException
        if restorePrevVersion && resolveLocation(spark, input).isDefined =>
      val loc = resolveLocation(spark, input).get
      // The DQ failure is the primary error: a failed restore (e.g. no
      // archived versions at the location) must not mask it. A Delta
      // input with Delta on the classpath restores through the
      // transaction log (reference `dq_validator.py:154-169`); otherwise
      // through the Versioned parquet history.
      val conf = spark.sparkContext.hadoopConfiguration
      scala.util.Try(
        if (graft.io.DeltaSupport.routes(input.dataFormat) &&
            graft.io.DeltaSupport.available)
          graft.io.DeltaSupport.restorePrevious(spark, loc).toInt
        else if (graft.io.Versioned.hasAppendManifests(conf, loc))
          graft.io.Versioned.restoreAppendManifest(conf, loc)
        else graft.io.Versioned.restorePrevious(conf, loc)) match {
        case scala.util.Success(restored) =>
          throw new graft.dq.DQValidationFailedException(
            "Data Quality Validations Failed! The delta table/files were " +
              s"restored to the previous version! (v$restored at $loc; " +
              s"${e.getMessage})", e)
        case scala.util.Failure(restoreErr) =>
          e.addSuppressed(restoreErr)
          throw e
      }
  }

  /** The input's physical location: explicit, or looked up from the
    * catalog for db_table inputs (the reference restores managed tables
    * through the DeltaTable API; the fallback needs the path). */
  private def resolveLocation(
      spark: SparkSession, input: InputSpec): Option[String] =
    input.location.orElse(input.dbTable.flatMap { t =>
      scala.util.Try {
        val parts = t.split("\\.")
        val ident =
          if (parts.length == 2)
            org.apache.spark.sql.catalyst.TableIdentifier(parts(1), Some(parts(0)))
          else org.apache.spark.sql.catalyst.TableIdentifier(t)
        spark.sessionState.catalog.getTableMetadata(ident)
          .location.getPath
      }.toOption
    })
}
