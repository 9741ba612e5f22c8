package graft.algo

import graft.SparkSpec
import graft.spec.Specs
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** The reference's sensor unit contracts run verbatim:
  * `tests/unit/test_sensor_manager.py` (update-set construction, control
  * table reads, every query generator with its exact SQL text) and
  * `tests/unit/test_sensor.py` (spec creation, already-exists detection,
  * validation messages). Where the reference mocks
  * `read_sensor_table_data`, the same rows are materialized as real
  * control tables instead — the unqualified view name stands in for the
  * reference's `test_db.`-qualified one (the name is pass-through and
  * never appears in a generated query). */
class ReferenceSensorUnitSpec extends SparkSpec {

  private val DefaultTs = Timestamp.valueOf("2023-05-26 14:38:16.676508")

  private val controlSchema = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("assets", ArrayType(StringType, containsNull = false)),
    StructField("status", StringType, nullable = false),
    StructField("status_change_timestamp", TimestampType, nullable = false),
    StructField("checkpoint_location", StringType)))

  private def controlView(name: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), controlSchema)
      .createOrReplaceTempView(name)

  // --- test_sensor_update_set ----------------------------------------

  test("sensor update set: default, single and multiple added fields") {
    val base = Map(
      "sensors.sensor_id" -> "updates.sensor_id",
      "sensors.status" -> "updates.status",
      "sensors.status_change_timestamp" -> "updates.status_change_timestamp")
    // should_return_default_update_set_when_empty_fields
    assert(SensorControl.sensorUpdateSet() == base)
    // should_add_just_one_field_to_update_set
    assert(SensorControl.sensorUpdateSet(assets = Seq("asset_1")) ==
      base + ("sensors.assets" -> "updates.assets"))
    // should_add_multiple_fields_to_update_set
    assert(SensorControl.sensorUpdateSet(
      assets = Seq("asset_1"),
      checkpointLocation = Some("s3://dummy-bucket/sensors/sensor_id_1"),
      upstreamKey = Some("dummy_column"),
      upstreamValue = Some("dummy_value")) ==
      base ++ Map(
        "sensors.assets" -> "updates.assets",
        "sensors.checkpoint_location" -> "updates.checkpoint_location",
        "sensors.upstream_key" -> "updates.upstream_key",
        "sensors.upstream_value" -> "updates.upstream_value"))
  }

  // --- test_check_if_sensor_has_acquired_data ------------------------

  test("check_if_sensor_has_acquired_data over the control table") {
    controlView("sensor_acquired_ctrl", Seq(
      Row("sensor_id_1", Seq("asset_1"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1")))
    // true_when_table_data_and_status_acquired_new_data
    assert(SensorControl.checkIfSensorHasAcquiredData(spark, "sensor_id_1",
      "sensor_acquired_ctrl"))
    // false_when_table_data_is_absent
    assert(!SensorControl.checkIfSensorHasAcquiredData(spark, "sensor_id_9",
      "sensor_acquired_ctrl"))
    // false_when_..._status_different_than_acquired_new_data
    controlView("sensor_acquired_ctrl", Seq(
      Row("sensor_id_1", Seq("asset_1"), "PROCESSED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1")))
    assert(!SensorControl.checkIfSensorHasAcquiredData(spark, "sensor_id_1",
      "sensor_acquired_ctrl"))
  }

  // --- test_read_sensor_table_data -----------------------------------

  test("read_sensor_table_data: by id, by assets, neither raises") {
    controlView("sensor_control_db_table", Seq(
      Row("sensor_id_1", Seq.empty[String], "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1"),
      Row("sensor_id_2", Seq("asset_2"), "PROCESSED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_2"),
      Row("sensor_id_3", Seq("asset_3"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_3")))
    // sensor_id_is_present
    val r1 = SensorControl.readSensorTableData(spark,
      "sensor_control_db_table", Some("sensor_id_1")).get
    assert(r1.getString(0) == "sensor_id_1" && r1.getSeq[String](1).isEmpty &&
      r1.getString(2) == "ACQUIRED_NEW_DATA" && r1.getTimestamp(3) == DefaultTs &&
      r1.getString(4) == "s3://dummy-bucket/sensors/sensor_id_1")
    // sensor_id_is_absent_and_assets_is_present
    val r2 = SensorControl.readSensorTableData(spark,
      "sensor_control_db_table", assets = Seq("asset_2")).get
    assert(r2.getString(0) == "sensor_id_2" &&
      r2.getSeq[String](1) == Seq("asset_2") &&
      r2.getString(2) == "PROCESSED_NEW_DATA")
    // sensor_id_and_sensor_asset_are_absent
    val e = intercept[IllegalArgumentException](
      SensorControl.readSensorTableData(spark, "sensor_control_db_table"))
    assert(e.getMessage.contains(
      "Either sensor_id or assets need to be provided as arguments."))
  }

  // --- test_if_generate_filter_exp_preprocess_query ------------------

  test("generate_filter_exp_query renders the reference's SQL verbatim") {
    // sensor_db_table_and_default_dummy_value: stored upstream_value NULL
    // -> the default dummy value
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("sensor_id_1", Seq("asset_1"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1", "dummy_time", null))),
      StructType(controlSchema.fields ++ Seq(
        StructField("upstream_key", StringType),
        StructField("upstream_value", StringType))))
      .createOrReplaceTempView("test_jdbc_sensor_default_dummy_value")
    assert(SensorControl.generateFilterExpQuery(spark, "sensor_id_1",
      "?upstream_key > '?upstream_value'",
      controlDbTableName = Some("test_jdbc_sensor_default_dummy_value"),
      upstreamKey = Some("dummy_time")) ==
      "SELECT COUNT(1) as count, 'dummy_time' as UPSTREAM_KEY, " +
        "max(dummy_time) as UPSTREAM_VALUE " +
        "FROM sensor_new_data " +
        "WHERE dummy_time > '-2147483647' " +
        "HAVING COUNT(1) > 0")

    // sensor_db_table_with_custom_value: stored upstream_value wins
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("sensor_id_1", Seq("asset_1"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1", "dummy_time", "3333333333"))),
      StructType(controlSchema.fields ++ Seq(
        StructField("upstream_key", StringType),
        StructField("upstream_value", StringType))))
      .createOrReplaceTempView("test_jdbc_sensor_custom_value")
    assert(SensorControl.generateFilterExpQuery(spark, "sensor_id_1",
      "?upstream_key > '?upstream_value'",
      controlDbTableName = Some("test_jdbc_sensor_custom_value"),
      upstreamKey = Some("dummy_time"), upstreamValue = Some("3333333333")) ==
      "SELECT COUNT(1) as count, 'dummy_time' as UPSTREAM_KEY, " +
        "max(dummy_time) as UPSTREAM_VALUE " +
        "FROM sensor_new_data " +
        "WHERE dummy_time > '3333333333' " +
        "HAVING COUNT(1) > 0")

    // filter_exp_preprocess_query: no control table -> plain COUNT probe
    assert(SensorControl.generateFilterExpQuery(spark, "sensor_id_1",
      "my_column > 'my_value'") ==
      "SELECT COUNT(1) as count " +
        "FROM sensor_new_data " +
        "WHERE my_column > 'my_value' " +
        "HAVING COUNT(1) > 0")

    // filter_exp_preprocess_query_from_upstream_table_name
    assert(SensorControl.generateFilterExpQuery(spark, "sensor_id_1",
      "?upstream_key > '?upstream_value'",
      controlDbTableName = Some("test_jdbc_sensor_custom_value"),
      upstreamKey = Some("dummy_time"), upstreamValue = Some("3333333333"),
      upstreamTableName = Some("test_db.dummy_table")) ==
      "SELECT COUNT(1) as count, 'dummy_time' as UPSTREAM_KEY, " +
        "max(dummy_time) as UPSTREAM_VALUE " +
        "FROM test_db.dummy_table " +
        "WHERE dummy_time > '3333333333' " +
        "HAVING COUNT(1) > 0")

    // raise_exception_db_name_is_defined_and_upstream_key_not
    val e = intercept[IllegalArgumentException](
      SensorControl.generateFilterExpQuery(spark, "sensor_id_1",
        "my_column > 'my_value'",
        controlDbTableName = Some("test_jdbc_sensor_raise_exception")))
    assert(e.getMessage.contains("If control_db_table_name is defined, " +
      "upstream_key should also be defined!"))
  }

  // --- test_generate_sensor_table_preprocess_query -------------------

  test("generate_sensor_table_preprocess_query is verbatim") {
    assert(SensorControl.generateSensorTablePreprocessQuery("sensor_id_1") ==
      "SELECT * FROM sensor_new_data WHERE" +
        " _change_type in ('insert', 'update_postimage')" +
        " and sensor_id = 'sensor_id_1'" +
        " and status = 'PROCESSED_NEW_DATA'")
  }

  // --- test_generate_sensor_sap_logchain_query -----------------------

  test("generate_sensor_sap_logchain_query: all six reference scenarios") {
    def expected(table: String = "SAPPHA.RSPCLOGCHAIN", status: String = "G",
        engine: String = "sensor_new_data"): String =
      s"WITH $engine AS (" +
        "SELECT CHAIN_ID, CONCAT(DATUM, ZEIT) AS LOAD_DATE, ANALYZED_STATUS " +
        s"FROM $table WHERE " +
        "UPPER(CHAIN_ID) = UPPER('MY_SAP_CHAIN_ID') " +
        "AND UPPER(ANALYZED_STATUS) = UPPER('" + status + "'))"
    assert(SensorControl.generateSensorSapLogchainQuery("MY_SAP_CHAIN_ID") ==
      expected())
    assert(SensorControl.generateSensorSapLogchainQuery("MY_SAP_CHAIN_ID",
      dbtable = "test_db.test_table") == expected(table = "test_db.test_table"))
    assert(SensorControl.generateSensorSapLogchainQuery("MY_SAP_CHAIN_ID",
      status = "A") == expected(status = "A"))
    assert(SensorControl.generateSensorSapLogchainQuery("MY_SAP_CHAIN_ID",
      engineTableName = "test_SAPTABLE") == expected(engine = "test_SAPTABLE"))
    assert(SensorControl.generateSensorSapLogchainQuery("MY_SAP_CHAIN_ID",
      dbtable = "test_db.test_table", status = "A",
      engineTableName = "test_SAPTABLE") ==
      expected(table = "test_db.test_table", status = "A",
        engine = "test_SAPTABLE"))
    val e = intercept[IllegalArgumentException](
      SensorControl.generateSensorSapLogchainQuery(null))
    assert(e.getMessage.contains(
      "To query on log chain SAP table the chain id should be defined!"))
  }

  // --- test_sensor.py: spec creation + already-exists ----------------

  test("sensor spec from acon derives the checkpoint location") {
    val spec = SensorControl.specFromAcon(Map(
      "sensor_id" -> "sensor_id_1",
      "assets" -> Seq("asset_1"),
      "control_db_table_name" -> "control_sensor_table_name",
      "input_spec" -> Map("spec_id" -> "input_spec",
        "read_type" -> "streaming", "data_format" -> "csv"),
      "fail_on_empty_result" -> false,
      "base_checkpoint_location" -> "s3://dummy-bucket"))
    assert(spec.sensorId == "sensor_id_1")
    assert(spec.assets == Seq("asset_1"))
    assert(spec.controlDbTableName == "control_sensor_table_name")
    assert(spec.checkpointLocation.contains(
      "s3://dummy-bucket/lakehouse_engine/sensors/sensor_id_1"))
    assert(spec.preprocessQuery.isEmpty)
    assert(!spec.failOnEmptyResult)
  }

  test("sensor already-exists detection and its raise message") {
    def spec(ctrl: String) = SensorControl.Spec("sensor_id_1", Seq("asset_1"),
      ctrl, Some(Specs.inputSpec(Map("spec_id" -> "input_spec",
        "read_type" -> "streaming", "data_format" -> "csv"))), None,
      Some("s3://dummy-bucket/lakehouse_engine/sensors/sensor_id_1"),
      failOnEmptyResult = false)
    // create_non_existing_sensor_with_sensor_id_and_assets -> False
    controlView("sensor_exists_same", Seq(
      Row("sensor_id_1", Seq("asset_1"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1")))
    assert(!SensorControl.sensorAlreadyExists(spark, spec("sensor_exists_same")))
    // raise_..._same_id_and_different_asset -> True
    controlView("sensor_exists_diff_asset", Seq(
      Row("sensor_id_1", Seq("asset_2"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1")))
    assert(SensorControl.sensorAlreadyExists(spark, spec("sensor_exists_diff_asset")))
    // raise_..._same_asset_and_different_id -> True
    controlView("sensor_exists_diff_id", Seq(
      Row("sensor_id_2", Seq("asset_1"), "ACQUIRED_NEW_DATA", DefaultTs,
        "s3://dummy-bucket/sensors/sensor_id_1")))
    assert(SensorControl.sensorAlreadyExists(spark, spec("sensor_exists_diff_id")))
    // the executeSensor raise carries the reference's exact message
    val e = intercept[SensorControl.SensorAlreadyExistsException](
      SensorControl.executeSensor(spark, spec("sensor_exists_diff_id")))
    assert(e.getMessage ==
      "There's already a sensor registered with same id or assets!")
  }

  // --- test_execute_sensor_raise_no_input_spec_format_implemented ----

  test("sensor validation messages are verbatim") {
    def spec(fmt: String, readType: String) = SensorControl.Spec("sensor_id_1",
      Seq("asset_1"), "control_sensor_table_name",
      Some(Specs.inputSpec(Map("spec_id" -> "input_spec",
        "db_table" -> "test_db.test_table",
        "read_type" -> readType, "data_format" -> fmt))), None,
      Some("s3://dummy-bucket/lakehouse_engine/sensors/sensor_id_1"))
    val e1 = intercept[NotImplementedError](
      SensorControl.executeSensor(spark, spec("dataframe", "batch")))
    assert(e1.getMessage ==
      "A sensor has not been implemented yet for this data format or, " +
        "this data format is not available for the read_type batch. " +
        "Check the allowed combinations of read_type and data_formats: " +
        "{'streaming': ['kafka', 'avro', 'json', 'parquet', 'csv', 'delta', " +
        "'cloudfiles'], 'batch': ['delta', 'jdbc']}")
    val e2 = intercept[NotImplementedError](
      SensorControl.executeSensor(spark, spec("databricks", "batch")))
    assert(e2.getMessage == "Data format databricks isn't implemented yet.")
  }
}
