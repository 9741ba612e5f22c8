package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's data_loader_custom_transformer feature scenarios
  * executed verbatim (`tests/feature/data_loader_custom_transformer/`):
  * ACON-provided custom transformers (a Python callable there, a
  * registered Scala function here, addressed by the reference's own
  * `custom_transformer` key), the SQL-transformation variant, and the
  * four-load streaming CDC delta load with a custom transformer ahead of
  * the condense + DQ + merge pipeline — all against the reference's own
  * fixtures and control data. */
class ReferenceCustomTransformerSpec extends SparkSpec with ReferenceHarness {

  private val root = s"$refRoot/data_loader_custom_transformer"
  private val available = new java.io.File(root).isDirectory

  // ---- calculate_kpi (test_data_loader_custom_transformer_calculate_kpi.py)

  test("reference custom_transformer/calculate_kpi runs verbatim") {
    assume(available, s"missing $root")
    val tmp = tmpDir("ref-ct-kpi")
    val scenario = "calculate_kpi"
    val inDir = s"$tmp/in/feature/data_loader_custom_transformer/$scenario"
    copyIn(s"$root/$scenario/source_schema.json", inDir)
    copyIn(s"$root/$scenario/data/source/part-01.csv", s"$inDir/data")
    val acon = s"""{
      |  "input_specs": [{
      |    "spec_id": "sales_source", "read_type": "batch", "data_format": "csv",
      |    "options": {"mode": "FAILFAST", "header": true, "delimiter": "|"},
      |    "schema_path": "file://$inDir/source_schema.json",
      |    "location": "file://$inDir/data"
      |  }],
      |  "transform_specs": [{
      |    "spec_id": "calculated_kpi", "input_id": "sales_source",
      |    "transformers": [{"function": "custom_transformation",
      |      "args": {"custom_transformer": "yet_another_kpi_calculator"}}]
      |  }],
      |  "output_specs": [{
      |    "spec_id": "sales_bronze", "input_id": "calculated_kpi",
      |    "write_type": "overwrite", "data_format": "delta",
      |    "location": "file://$tmp/out/feature/data_loader_custom_transformer/$scenario/data"
      |  }]
      |}""".stripMargin
    graft.algo.DataLoader.loadData(spark, acon, customFns = Map(
      "yet_another_kpi_calculator" -> { df =>
        df.createOrReplaceTempView("sales")
        df.sparkSession.sql(
          "SELECT date, SUM(amount) AS amount FROM sales GROUP BY date")
      }))
    assertMatchesControlCsv(
      s"$tmp/out/feature/data_loader_custom_transformer/$scenario/data",
      s"$root/$scenario/data/control/part-01.csv",
      Some(Files.readString(Paths.get(s"$root/$scenario/control_schema.json"))))
  }

  // ---- sql_transformation (…_sql_transformation.py) ---------------------

  test("reference custom_transformer/sql_transformation runs verbatim") {
    assume(available, s"missing $root")
    val tmp = tmpDir("ref-ct-sql")
    val scenario = "sql_transformation"
    val inDir = s"$tmp/in/feature/data_loader_custom_transformer/$scenario"
    copyIn(s"$root/$scenario/source_schema.json", inDir)
    copyIn(s"$root/$scenario/data/source/part-01.csv", s"$inDir/data")
    val sql = "\\n    SELECT date, SUM(amount) AS amount\\n    FROM sales_sql\\n    GROUP BY date\\n"
    val acon = s"""{
      |  "input_specs": [{
      |    "spec_id": "sales_source", "read_type": "batch", "data_format": "csv",
      |    "options": {"mode": "FAILFAST", "header": true, "delimiter": "|"},
      |    "schema_path": "file://$inDir/source_schema.json",
      |    "location": "file://$inDir/data",
      |    "temp_view": "sales_sql"
      |  }],
      |  "transform_specs": [{
      |    "spec_id": "calculated_kpi", "input_id": "sales_source",
      |    "transformers": [{"function": "sql_transformation", "args": {"sql": "$sql"}}]
      |  }],
      |  "output_specs": [{
      |    "spec_id": "sales_bronze", "input_id": "calculated_kpi",
      |    "write_type": "overwrite", "data_format": "delta",
      |    "location": "file://$tmp/out/feature/data_loader_custom_transformer/$scenario/data"
      |  }]
      |}""".stripMargin
    graft.algo.DataLoader.loadData(spark, acon)
    assertMatchesControlCsv(
      s"$tmp/out/feature/data_loader_custom_transformer/$scenario/data",
      s"$root/$scenario/data/control/part-01.csv",
      Some(Files.readString(Paths.get(s"$root/$scenario/control_schema.json"))))
  }

  // ---- delta_load (…_delta_load.py): 4 streaming merge loads ------------

  test("reference custom_transformer/delta_load four-load streaming merge runs verbatim") {
    assume(available, s"missing $root")
    val tmp = tmpDir("ref-ct-delta")
    val scenario = "delta_load"
    val inDir = s"$tmp/in/feature/data_loader_custom_transformer/$scenario/data"
    val outLoc = s"$tmp/out/feature/data_loader_custom_transformer/$scenario/data"
    // `_create_table`: pre-created Delta table schema (parquet fallback)
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "actrequest_timestamp string, request string, datapakid int, partno int, " +
          "record int, salesorder int, item int, recordmode string, date int, " +
          "customer string, article string, amount int"))
      .write.mode("overwrite").parquet(outLoc)
    def acon = s"""{
      |  "input_specs": [{
      |    "spec_id": "sales_source", "read_type": "streaming", "data_format": "csv",
      |    "options": {"header": true, "delimiter": "|"},
      |    "location": "file://$inDir"
      |  }],
      |  "transform_specs": [{
      |    "spec_id": "transformed_sales_source", "input_id": "sales_source",
      |    "transformers": [
      |      {"function": "custom_transformation",
      |       "args": {"custom_transformer": "multiply_by_100"}},
      |      {"function": "condense_record_mode_cdc", "args": {
      |        "business_key": ["salesorder", "item"],
      |        "ranking_key_desc": ["actrequest_timestamp", "datapakid", "partno", "record"],
      |        "record_mode_col": "recordmode",
      |        "valid_record_modes": ["", "N", "R", "D", "X"]}}
      |    ]
      |  }],
      |  "dq_specs": [{
      |    "spec_id": "checked_transformed_sales_source",
      |    "input_id": "transformed_sales_source",
      |    "dq_type": "validator", "store_backend": "file_system",
      |    "local_fs_root_dir": "$tmp/out/feature/data_loader_custom_transformer/dq",
      |    "unexpected_rows_pk": ["salesorder", "item", "date", "customer"],
      |    "dq_functions": [
      |      {"function": "expect_column_values_to_not_be_null", "args": {"column": "article"}}
      |    ]
      |  }],
      |  "output_specs": [{
      |    "spec_id": "sales_bronze", "input_id": "checked_transformed_sales_source",
      |    "write_type": "merge", "data_format": "delta",
      |    "location": "file://$outLoc",
      |    "options": {"checkpointLocation":
      |      "file://$tmp/out/feature/data_loader_custom_transformer/$scenario/checkpoint"},
      |    "merge_opts": {
      |      "merge_predicate": "current.salesorder = new.salesorder and current.item = new.item and current.date <=> new.date",
      |      "update_predicate": "new.actrequest_timestamp > current.actrequest_timestamp or ( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid > current.datapakid) or ( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid = current.datapakid and new.partno > current.partno) or ( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid = current.datapakid and new.partno = current.partno and new.record >= current.record)",
      |      "delete_predicate": "new.recordmode in ('R','D','X')",
      |      "insert_predicate": "new.recordmode is null or new.recordmode not in ('R','D','X')"
      |    }
      |  }],
      |  "exec_env": {"spark.sql.streaming.schemaInference": true}
      |}""".stripMargin
    val customFns: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
      Map("multiply_by_100" -> (df =>
        df.withColumn("amount", org.apache.spark.sql.functions.col("amount") * 100)))
    // the driver's exact copy/run order: 01, 03, 02, 04
    Seq("part-01", "part-03", "part-02", "part-04").foreach { p =>
      copyIn(s"$root/$scenario/data/source/$p.csv", inDir)
      graft.algo.DataLoader.loadData(spark, acon, customFns = customFns)
    }
    assertMatchesControlCsv(outLoc, s"$root/$scenario/data/control/part-01.csv")
  }
}
