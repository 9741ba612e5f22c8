package graft.spec

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** The reference's custom_expectations feature scenarios executed VERBATIM
  * (`tests/feature/custom_expectations/test_custom_expectations.py`): each
  * of its 7 custom GX expectations driven through execute_dq_validation
  * with the reference's exact argument spellings (column_list,
  * relativedelta timeframe dicts, template_dict aggregates), its fixture
  * data + schemas, batch AND streaming inputs, a RAW (non-exploded) JSON
  * result sink at test_db.sales_order, and its control goldens. */
class ReferenceCustomExpectationsSpec extends SparkSpec with ReferenceHarness {

  private val ceRoot = s"$refRoot/custom_expectations"

  private case class Scenario(
      expectation: String, args: Map[String, Any], readType: String)

  private val scenarios = Seq(
    Scenario("expect_column_pair_a_to_be_smaller_or_equal_than_b",
      Map("column_A" -> "salesorder", "column_B" -> "amount", "margin" -> 9.78), "batch"),
    Scenario("expect_column_pair_a_to_be_smaller_or_equal_than_b",
      Map("column_A" -> "salesorder", "column_B" -> "amount"), "streaming"),
    Scenario("expect_multicolumn_column_a_must_equal_b_or_c",
      Map("column_list" -> Seq("item", "itemcode", "amount")), "batch"),
    Scenario("expect_multicolumn_column_a_must_equal_b_or_c",
      Map("column_list" -> Seq("item", "itemcode", "amount")), "streaming"),
    Scenario("expect_queried_column_agg_value_to_be",
      Map("template_dict" -> Map(
        "column" -> "amount", "group_column_list" -> "year, month, day",
        "agg_type" -> "max", "condition" -> "lesser", "max_value" -> 10000)), "batch"),
    Scenario("expect_queried_column_agg_value_to_be",
      Map("template_dict" -> Map(
        "column" -> "amount", "group_column_list" -> "year,month,day",
        "agg_type" -> "count", "condition" -> "greater", "min_value" -> 0)), "streaming"),
    Scenario("expect_column_values_to_be_date_not_older_than",
      Map("column" -> "date", "timeframe" -> Map("years" -> 100)), "streaming"),
    Scenario("expect_column_values_to_be_date_not_older_than",
      Map("column" -> "date", "timeframe" -> Map("years" -> 100)), "batch"),
    Scenario("expect_column_pair_date_a_to_be_greater_than_or_equal_to_date_b",
      Map("column_A" -> "EDATU", "column_B" -> "ERDAT"), "streaming"),
    Scenario("expect_column_pair_date_a_to_be_greater_than_or_equal_to_date_b",
      Map("column_A" -> "MBDAT", "column_B" -> "ERDATA"), "batch"),
    Scenario("expect_column_pair_a_to_be_not_equal_to_b",
      Map("column_A" -> "group_article", "column_B" -> "article_number"), "streaming"),
    Scenario("expect_column_pair_a_to_be_not_equal_to_b",
      Map("column_A" -> "group_article", "column_B" -> "article_number"), "batch"),
    Scenario("expect_column_values_to_not_be_null_or_empty_string",
      Map("column" -> "number"), "streaming"),
    Scenario("expect_column_values_to_not_be_null_or_empty_string",
      Map("column" -> "number"), "batch"))

  for ((sc, i) <- scenarios.zipWithIndex)
    test(s"reference custom_expectations/${sc.expectation} ${sc.readType} runs verbatim (#$i)") {
      assume(new java.io.File(s"$ceRoot/${sc.expectation}").isDirectory,
        s"missing $ceRoot/${sc.expectation}")
      ensureTestDb()
      spark.sql("DROP TABLE IF EXISTS test_db.sales_order")

      // _generate_dataframe: csv with the scenario's schema file; batch
      // reads part-01 only, streaming reads the whole source dir
      val res = s"$ceRoot/${sc.expectation}"
      val schemaJson = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$res/dq_sales_schema.json"))
      val input =
        if (sc.readType == "batch")
          InputSpec("sales_source", readType = "batch", dataFormat = Some("csv"),
            location = Some(s"$res/data/source/part-01.csv"),
            schema = Some(schemaJson),
            options = Map("header" -> "true", "delimiter" -> "|"))
        else
          InputSpec("sales_source", readType = "streaming", dataFormat = Some("csv"),
            location = Some(s"$res/data/source"),
            schema = Some(schemaJson),
            options = Map("header" -> "true", "delimiter" -> "|"))

      val dq = DQSpec("dq_sales", "sales_source",
        dqFunctions = Seq(DQFunctionSpec(sc.expectation, sc.args)),
        resultSink = Some(OutputSpec(
          specId = "result_sink", inputId = "dq_sales", writeType = "append",
          dataFormat = Some("json"), dbTable = Some("test_db.sales_order"))),
        resultSinkExplode = Some(false))

      graft.Engine.executeDqValidation(spark, input, dq)

      val result = spark.table("test_db.sales_order")
      val control = readControlCsv(s"$res/data/control/dq_control_success.csv")
      def pick(df: DataFrame) = df.select(
        col("spec_id").cast("string"), col("input_id").cast("string"),
        col("success").cast("string"))
      assertSameRows(pick(result),
        pick(control.na.fill("").select(
          coalesce(col("spec_id"), lit("")).as("spec_id"),
          coalesce(col("input_id"), lit("")).as("input_id"), col("success"))))

      // the reference introspects validation_results: each element must
      // carry `success` and `expectation_config`
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      result.select("validation_results").collect().foreach { r =>
        val arr = mapper.readTree(r.getString(0))
        assert(arr.isArray && arr.size() > 0)
        arr.forEach { el =>
          assert(el.has("success") && el.has("expectation_config"),
            s"validation_results element missing keys: $el")
        }
      }
    }
}
