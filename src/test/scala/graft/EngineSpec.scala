package graft

import graft.spec.{DQFunctionSpec, DQSpec, InputSpec}

/** The public facade delegates faithfully (one smoke case per entry
  * point family; deep behavior is covered by the algorithm suites). */
class EngineSpec extends SparkSpec {

  import spark.implicits._

  test("engine facade: load, dq, sensor, reconciliation, sensor query") {
    val dir = tmpDir("engine")
    Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "name", "v")
      .write.parquet(s"$dir/in")
    // load_data
    val out = Engine.loadData(spark,
      s"""{"input_specs": [{"spec_id": "src", "read_type": "batch",
         |  "data_format": "parquet", "location": "$dir/in"}],
         |"output_specs": [{"spec_id": "res", "input_id": "src",
         |  "data_format": "dataframe"}]}""".stripMargin.replace("\n", " "))
    assert(out("res").count() == 2)
    // dq validation
    val r = Engine.executeDqValidation(spark,
      InputSpec(specId = "in", dataFormat = Some("parquet"), location = Some(s"$dir/in")),
      DQSpec("dq", "in", dqFunctions = Seq(
        DQFunctionSpec("expect_column_values_to_not_be_null", Map("column" -> "name")))))
    assert(r.success)
    // sensor + status update
    assert(Engine.executeSensor(spark, s"$dir/ctl", "s1",
      InputSpec(specId = "up", dataFormat = Some("parquet"), location = Some(s"$dir/in"))))
    Engine.updateSensorStatus(spark, s"$dir/ctl", "s1")
    // reconciliation (identical sides -> green)
    val df = spark.read.parquet(s"$dir/in")
    val statuses = Engine.executeReconciliation(
      df, df, Seq("id"), Seq("v" -> "v"), thresholds = Map.empty)
    assert(statuses.forall(_.status == "green"))
    // sensor preprocess query generation (both shapes)
    val q1 = Engine.generateSensorQuery("s1",
      filterExp = Some("?upstream_key > '?upstream_value'"),
      upstreamKey = Some("load_date"), upstreamValue = Some("20240101"))
    assert(q1 ==
      "SELECT COUNT(1) as count, 'load_date' as UPSTREAM_KEY, " +
        "max(load_date) as UPSTREAM_VALUE FROM sensor_new_data " +
        "WHERE load_date > '20240101' HAVING COUNT(1) > 0")
    val q2 = Engine.generateSensorQuery("s1")
    assert(q2.contains("sensor_id = 's1'") && q2.contains("PROCESSED_NEW_DATA"))
    // table manager passthrough
    assert(Engine.manageTable(spark).executeSql("SELECT 1 AS one").head.count() == 1)
  }
}
