package graft.spec

import graft.SparkSpec
import graft.algo.SensorControl
import graft.algo.SensorControl.{NoNewDataException, SensorAlreadyExistsException}

import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The reference's sensor feature scenarios executed verbatim
  * (`tests/feature/test_sensors.py`): table sensor over a CDF upstream,
  * duplicate-registration guards, jdbc watermark sensor (Derby standing in
  * for the reference's sqlite), files sensor, and the standalone
  * status-update contract — all over [[SensorControl]]. */
class ReferenceSensorsSpec extends SparkSpec with ReferenceHarness {

  private lazy val lakehouseIn = tmpDir("ref-sensors")

  private def sensorConf[A](body: => A): A =
    withConf("spark.sql.ansi.enabled" -> "false",
      // the reference's INSERT VALUES feeds timestamp columns from string
      // literals — pre-ANSI store assignment
      "spark.sql.storeAssignmentPolicy" -> "LEGACY")(body)

  /** `_TEST_SENSOR_DELTA_TABLE_SCHEMA` (+ the 5-column BASE variant). */
  private def sensorDdl(base: Boolean) =
    "sensor_id string, assets array<string>, status string, " +
      "status_change_timestamp timestamp, checkpoint_location string" +
      (if (base) "" else ", upstream_key string, upstream_value string")

  private def createSensorTable(name: String, base: Boolean = false): Unit = {
    ensureTestDb()
    val loc = s"$lakehouseIn/tables/$name"
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType.fromDDL(sensorDdl(base)))
      .write.mode("overwrite").parquet(loc)
    spark.sql(s"DROP TABLE IF EXISTS test_db.$name")
    spark.sql(s"CREATE TABLE test_db.$name (${sensorDdl(base)}) " +
      s"USING parquet LOCATION '$loc'")
  }

  /** `_insert_data_into_upstream_table`. */
  private def insertUpstream(table: String, values: Option[String] = None): Unit = {
    val v = values.getOrElse(
      "('sensor_id_upstream_1', array('dummy_upstream_asset_1'), " +
        "'PROCESSED_NEW_DATA', '2023-05-30 23:28:49.079522', null, null, null)," +
        "('sensor_id_upstream_2', array('dummy_upstream_asset_2'), " +
        "'PROCESSED_NEW_DATA', '2023-05-30 23:28:49.089522', null, null, null)")
    spark.sql(s"INSERT INTO test_db.$table VALUES $v")
  }

  // ---- table sensor (test_sensors.py:55-161) --------------------------

  private def tableSensorSpec(checkpoint: String): SensorControl.Spec =
    SensorControl.specFromAcon(Map(
      "sensor_id" -> "sensor_id_1",
      "assets" -> Seq("dummy_asset_1"),
      "control_db_table_name" -> "test_db.test_table_sensor",
      "input_spec" -> Map(
        "spec_id" -> "sensor_upstream",
        "read_type" -> "streaming",
        "data_format" -> "delta",
        "db_table" -> "test_db.test_table_sensor_upstream",
        "options" -> Map("readChangeFeed" -> "true")),
      "preprocess_query" ->
        SensorControl.generateSensorQuery(spark, "sensor_id_upstream_1"),
      "base_checkpoint_location" -> checkpoint,
      "fail_on_empty_result" -> true))

  private def tableCkpt = s"$lakehouseIn/test_table_sensor/"

  test("reference table sensor: 1st run acquires nothing") { sensorConf {
    createSensorTable("test_table_sensor")
    createSensorTable("test_table_sensor_upstream")
    val ex = intercept[NoNewDataException] {
      SensorControl.executeSensor(spark, tableSensorSpec(tableCkpt))
    }
    assert(ex.getMessage == "No data was acquired by sensor_id_1 sensor.")
  }}

  test("reference table sensor: has_new_data acquires and flags") { sensorConf {
    insertUpstream("test_table_sensor_upstream")
    val hasNew = SensorControl.executeSensor(spark, tableSensorSpec(tableCkpt))
    assert(hasNew)
    val row = SensorControl.readSensorTableData(spark,
      "test_db.test_table_sensor", Some("sensor_id_1")).get
    assert(row.getString(row.fieldIndex("status")) == SensorControl.Acquired)
  }}

  test("reference table sensor: data from previous execution stays acquired") {
    sensorConf {
      val hasNew = SensorControl.executeSensor(spark, tableSensorSpec(tableCkpt))
      assert(hasNew)
      var row = SensorControl.readSensorTableData(spark,
        "test_db.test_table_sensor", Some("sensor_id_1")).get
      assert(row.getString(row.fieldIndex("status")) == SensorControl.Acquired)
      SensorControl.updateSensorStatusById(spark, "sensor_id_1",
        "test_db.test_table_sensor")
      row = SensorControl.readSensorTableData(spark,
        "test_db.test_table_sensor", Some("sensor_id_1")).get
      assert(row.getString(row.fieldIndex("status")) == SensorControl.Processed)
    }
  }

  test("reference table sensor: upstream acquired but not processed is no new data") {
    sensorConf {
      insertUpstream("test_table_sensor_upstream", Some(
        "('sensor_id_upstream_1', array('dummy_upstream_asset_1'), " +
          "'ACQUIRED_NEW_DATA', '2023-05-30 23:29:49.079522', null, null, null)"))
      val ex = intercept[NoNewDataException] {
        SensorControl.executeSensor(spark, tableSensorSpec(tableCkpt))
      }
      assert(ex.getMessage == "No data was acquired by sensor_id_1 sensor.")
    }
  }

  test("reference table sensor: no new data raises") { sensorConf {
    val ex = intercept[NoNewDataException] {
      SensorControl.executeSensor(spark, tableSensorSpec(tableCkpt))
    }
    assert(ex.getMessage == "No data was acquired by sensor_id_1 sensor.")
  }}

  // ---- duplicate registration (test_sensors.py:163-245) ---------------

  private def duplicateScenario(sensorId: String, assets: Seq[String]): Unit =
    sensorConf {
      val ckpt = s"$lakehouseIn/test_table_sensor_dup/"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      createSensorTable("test_table_sensor")
      createSensorTable("test_table_sensor_upstream")
      insertUpstream("test_table_sensor_upstream")
      def acon(id: String, a: Seq[String]) = SensorControl.specFromAcon(Map(
        "sensor_id" -> id, "assets" -> a,
        "control_db_table_name" -> "test_db.test_table_sensor",
        "input_spec" -> Map(
          "spec_id" -> "sensor_upstream", "read_type" -> "streaming",
          "data_format" -> "delta",
          "db_table" -> "test_db.test_table_sensor_upstream",
          "options" -> Map("readChangeFeed" -> "true")),
        "preprocess_query" ->
          SensorControl.generateSensorQuery(spark, "sensor_id_upstream_1"),
        "base_checkpoint_location" -> ckpt,
        "fail_on_empty_result" -> true))
      SensorControl.executeSensor(spark, acon("sensor_id_1", Seq("dummy_asset_1")))
      val ex = intercept[SensorAlreadyExistsException] {
        SensorControl.executeSensor(spark, acon(sensorId, assets))
      }
      assert(ex.getMessage ==
        "There's already a sensor registered with same id or assets!")
    }

  test("reference sensor duplicate: same assets under a new sensor id") {
    duplicateScenario("sensor_id_2", Seq("dummy_asset_1"))
  }

  test("reference sensor duplicate: same sensor id with new assets") {
    duplicateScenario("sensor_id_1", Seq("dummy_asset_2"))
  }

  // ---- jdbc sensor (test_sensors.py:247-326) --------------------------

  private def jdbcUrl = s"jdbc:derby:$lakehouseIn/test_jdbc_sensor_upstream/testdb;create=true"

  private def insertJdbc(time: Option[String]): Unit = {
    import spark.implicits._
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = time match {
      case None => spark.emptyDataset[(String, String)].toDF("dummy_field", "dummy_time")
      case Some(t) => Seq(("a", t), ("b", t)).toDF("dummy_field", "dummy_time")
    }
    df.write.mode("append")
      // Derby maps StringType to CLOB by default, which cannot take range
      // predicates — the reference's sqlite has no such restriction
      .option("createTableColumnTypes",
        "dummy_field VARCHAR(100), dummy_time VARCHAR(100)")
      .jdbc(jdbcUrl, "test_jdbc_sensor_upstream", props)
  }

  private def jdbcSensorSpec(): SensorControl.Spec =
    SensorControl.specFromAcon(Map(
      "sensor_id" -> "sensor_id_1",
      "assets" -> Seq("dummy_asset_1"),
      "control_db_table_name" -> "test_db.test_jdbc_sensor",
      "input_spec" -> Map(
        "spec_id" -> "sensor_upstream",
        "read_type" -> "batch",
        "data_format" -> "jdbc",
        "jdbc_args" -> Map(
          "url" -> jdbcUrl,
          "table" -> "test_jdbc_sensor_upstream",
          "properties" -> Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))),
      "preprocess_query" -> SensorControl.generateSensorQuery(spark,
        "sensor_id_1", filterExp = Some("?upstream_key > '?upstream_value'"),
        controlDbTableName = Some("test_db.test_jdbc_sensor"),
        upstreamKey = Some("dummy_time")),
      "fail_on_empty_result" -> true))

  private def nowString: String =
    java.time.LocalDateTime.now().format(
      DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))

  private def assertJdbcAcquiresAndProcesses(): Unit = {
    val hasNew = SensorControl.executeSensor(spark, jdbcSensorSpec())
    var row = SensorControl.readSensorTableData(spark,
      "test_db.test_jdbc_sensor", Some("sensor_id_1")).get
    assert(row.getString(row.fieldIndex("status")) == SensorControl.Acquired)
    SensorControl.updateSensorStatusById(spark, "sensor_id_1",
      "test_db.test_jdbc_sensor")
    row = SensorControl.readSensorTableData(spark,
      "test_db.test_jdbc_sensor", Some("sensor_id_1")).get
    assert(row.getString(row.fieldIndex("status")) == SensorControl.Processed)
    assert(hasNew)
  }

  test("reference jdbc sensor: 1st run acquires nothing") { sensorConf {
    createSensorTable("test_jdbc_sensor")
    insertJdbc(None)
    val ex = intercept[NoNewDataException] {
      SensorControl.executeSensor(spark, jdbcSensorSpec())
    }
    assert(ex.getMessage == "No data was acquired by sensor_id_1 sensor.")
  }}

  test("reference jdbc sensor: 2nd run acquires new data and stores the watermark") {
    sensorConf {
      insertJdbc(Some(nowString))
      assertJdbcAcquiresAndProcesses()
    }
  }

  test("reference jdbc sensor: 3rd run without new data raises") { sensorConf {
    val ex = intercept[NoNewDataException] {
      SensorControl.executeSensor(spark, jdbcSensorSpec())
    }
    assert(ex.getMessage == "No data was acquired by sensor_id_1 sensor.")
  }}

  test("reference jdbc sensor: 4th run acquires data newer than the watermark") {
    sensorConf {
      insertJdbc(Some(nowString))
      assertJdbcAcquiresAndProcesses()
    }
  }

  // ---- files sensor (test_sensors.py:329-367) -------------------------

  test("reference files sensor detects landed files") { sensorConf {
    import spark.implicits._
    createSensorTable("test_files_sensor")
    val filesLocation = s"$lakehouseIn/test_files_sensor/files/"
    Seq("a", "b").toDF("dummy_field").write.format("csv").save(filesLocation)
    val schemaJson = StructType(Seq(
      StructField("dummy_field", StringType)) ).json
    val hasNew = SensorControl.executeSensor(spark, SensorControl.specFromAcon(Map(
      "sensor_id" -> "sensor_id_1",
      "assets" -> Seq("dummy_asset_1"),
      "control_db_table_name" -> "test_db.test_files_sensor",
      "input_spec" -> Map(
        "spec_id" -> "sensor_upstream",
        "read_type" -> "streaming",
        "data_format" -> "csv",
        "location" -> filesLocation,
        "schema" -> schemaJson),
      "base_checkpoint_location" -> s"$lakehouseIn/test_files_sensor/",
      "fail_on_empty_result" -> false)))
    assert(hasNew)
  }}

  // ---- standalone status update (test_sensors.py:370-406) -------------

  test("reference update_sensor_status inserts into a base-schema control table") {
    sensorConf {
      createSensorTable("test_checkpoint_sensor", base = true)
      SensorControl.updateSensorStatus(spark,
        SensorControl.Spec("sensor_id_1", Seq("asset_1"),
          "test_db.test_checkpoint_sensor", None, None,
          Some("s3://dummy-bucket/sensors/sensor_id_1")),
        SensorControl.Acquired)
      val row = SensorControl.readSensorTableData(spark,
        "test_db.test_checkpoint_sensor", Some("sensor_id_1")).get
      assert(row.getString(row.fieldIndex("sensor_id")) == "sensor_id_1")
      assert(row.getString(row.fieldIndex("status")) == SensorControl.Acquired)
      assert(row.getString(row.fieldIndex("checkpoint_location")) ==
        "s3://dummy-bucket/sensors/sensor_id_1")
    }
  }
}
