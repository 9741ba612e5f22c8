package graft.spec

import graft.SparkSpec
import graft.dq.{DQDuplicateRuleIdException, DQValidationFailedException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's dq_validator feature scenarios executed VERBATIM
  * (`tests/feature/test_dq_validator.py`): the full validator + PRISMA
  * matrix — dataframe/table/file inputs, batch and streaming, rule-id
  * uniqueness over rules tables, rules imported by execution point and
  * table filter, restore-to-previous-version on failure, failure-policy
  * controls (fail_on_error, critical functions incl. meta notes,
  * max_percentage_failure), and the two-runs result-sink stability
  * regression — against the reference's own fixtures and controls. */
class ReferenceDqValidatorSpec extends SparkSpec with ReferenceHarness {

  private val dvRoot = s"$refRoot/dq_validator"
  private def available = new java.io.File(dvRoot).isDirectory

  private val standardFns = Seq(
    DQFunctionSpec("expect_column_to_exist", Map("column" -> "article")),
    DQFunctionSpec("expect_table_row_count_to_be_between",
      Map("min_value" -> 3, "max_value" -> 11)),
    DQFunctionSpec("expect_column_pair_a_to_be_smaller_or_equal_than_b",
      Map("column_A" -> "salesorder", "column_B" -> "amount")))

  /** `_create_table("dq_sales")`: the pre-created 6-string-column target
    * with the `lakehouse.primary_key` property the PRISMA PK derivation
    * reads. */
  private def createDqSales(tmp: String): String = {
    ensureTestDb()
    val loc = s"$tmp/out/feature/dq_validator/data"
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "salesorder string, item string, date string, customer string, " +
          "article string, amount string"))
      .write.mode("overwrite").parquet(loc)
    spark.sql("DROP TABLE IF EXISTS test_db.dq_sales")
    spark.sql(
      s"""CREATE TABLE test_db.dq_sales (
         |  salesorder string, item string, date string, customer string,
         |  article string, amount string)
         |USING parquet LOCATION '$loc'
         |TBLPROPERTIES('lakehouse.primary_key'='salesorder, `item`, date ,`customer`')
         |""".stripMargin)
    loc
  }

  /** `_execute_load`: part-01 then part-02 through the reference's own
    * batch.json / streaming.json append acons. */
  private def executeLoad(readType: String, tmp: String): Unit = {
    val inDir = s"$tmp/in/feature/dq_validator/data"
    copyIn(s"$dvRoot/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$dvRoot/$readType.json", tmp))
    copyIn(s"$dvRoot/data/source/part-02.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$dvRoot/$readType.json", tmp))
  }

  /** `_create_dq_functions_source_table`: the rules CSV becomes the rules
    * table (saveAsTable overwrite, like the reference util). */
  private def createRulesTable(testName: String, tableName: String): Unit =
    createPrismaRulesTable(s"$dvRoot/$testName/data/dq_functions/$tableName.csv", tableName)

  private def dqSalesSchema: String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dvRoot/dq_sales_schema.json"))

  /** `_generate_dataframe`: headerless csv with the declared schema. */
  private def dataframeInput(readType: String): (InputSpec, graft.io.Readers.DfSupplier) = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(dqSalesSchema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val df =
      if (readType == "batch")
        spark.read.format("csv").schema(schema)
          .load(s"$dvRoot/data/source/part-01.csv")
      else
        spark.readStream.format("csv").schema(schema)
          .load(s"$dvRoot/data/source")
    (InputSpec("sales_source", readType = readType, dfName = Some("src")),
      { case "src" => df })
  }

  private case class Scn(
      name: String, dqType: String, readType: String, inputType: String,
      result: String, restore: Boolean, failOnError: Boolean,
      criticalFns: Seq[DQFunctionSpec] = Seq.empty,
      maxPctFailure: Option[Double] = None, dqDbTable: Option[String] = None)

  private def runScenario(sc: Scn): (String, () => Unit) = {
    val tmp = tmpDir(s"ref-dv")
    spark.conf.set("spark.graft.dqDevBucket", s"$tmp/out/feature")
    val (input, dfs): (InputSpec, graft.io.Readers.DfSupplier) =
      if (sc.inputType.contains("dataframe")) dataframeInput(sc.readType)
      else {
        val outLoc = createDqSales(tmp)
        executeLoad(sc.readType, tmp)
        val spec =
          if (sc.inputType.contains("table"))
            InputSpec("sales_source", readType = sc.readType,
              dbTable = Some("test_db.dq_sales"))
          else
            InputSpec("sales_source", readType = sc.readType,
              dataFormat = Some("delta"), location = Some(outLoc))
        (spec, (name: String) => sys.error(s"no df $name"))
      }
    sc.dqDbTable.foreach(t => createRulesTable(sc.name, t))
    val dq = DQSpec("dq_sales", "sales_source",
      dqType = sc.dqType,
      dqFunctions = standardFns,
      criticalFunctions = sc.criticalFns,
      failOnError = sc.failOnError,
      maxPercentageFailure = sc.maxPctFailure,
      unexpectedRowsPk =
        if (sc.inputType.contains("dataframe"))
          Seq("salesorder", "item", "date", "customer") else Seq.empty,
      tblToDerivePk =
        if (sc.inputType.contains("dataframe")) None else Some("test_db.dq_sales"),
      resultSink = Some(OutputSpec("result_sink", "dq_sales", "append",
        Some("delta"), location = Some(s"$tmp/out/feature/${sc.name}/result_sink/"))),
      resultSinkExplode = Some(false),
      dataProductName = Some(sc.name),
      dqDbTable = sc.dqDbTable,
      dqTableTableFilter = Some("dummy_sales"))
    (tmp, () => { graft.Engine.executeDqValidation(
      spark, input, dq, restorePrevVersion = sc.restore, dfs = dfs); () })
  }

  private def sinkDf(tmp: String, name: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$tmp/out/feature/$name/result_sink/")

  private def assertSinkMatches(tmp: String, name: String, control: String): Unit = {
    val result = sinkDf(tmp, name)
    val ctrl = readControlCsv(s"$dvRoot/data/control/$control.csv")
    def pick(df: DataFrame) = df.select(
      col("spec_id").cast("string"), col("input_id").cast("string"),
      col("success").cast("string"))
    assertSameRows(pick(result), pick(ctrl))
    // every sink row's validation_results introspects (reference loops
    // loads(key.validation_results) checking success + expectation_config)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    result.select("validation_results").collect().foreach { r =>
      val parsed = mapper.readTree(r.getString(0))
      val el = if (parsed.isArray) parsed.get(0) else parsed
      assert(el.has("success") && el.has("expectation_config"), s"bad: $el")
    }
  }

  private def withBucketConf[A](body: => A): A =
    try body finally spark.conf.unset("spark.graft.dqDevBucket")

  // ---- test_dq_rule_id_uniqueness --------------------------------------

  for ((scName, table, readType, dupIds) <- Seq(
      ("table_batch_dq_rule", "test_db.dq_table_rule_id_success", "batch", None),
      ("table_batch_dq_rule", "test_db.dq_table_rule_id_failure", "batch", Some(Seq("rule_3", "rule_4"))),
      ("table_streaming_dq_rule", "test_db.dq_table_rule_id_success", "streaming", None),
      ("table_streaming_dq_rule", "test_db.dq_table_rule_id_failure", "streaming", Some(Seq("rule_3", "rule_5")))))
    test(s"reference dq_validator rule-id uniqueness: $scName/$table") {
      assume(available, s"missing $dvRoot")
      withBucketConf {
        val (_, run) = runScenario(Scn(scName, "prisma", readType, "file_reader",
          "success", restore = false, failOnError = false, dqDbTable = Some(table)))
        if (dupIds.isEmpty) run()
        else {
          val ex = intercept[DQDuplicateRuleIdException](run())
          dupIds.get.foreach(id => assert(ex.getMessage.contains(id), ex.getMessage))
        }
      }
    }

  // ---- test_dq_validator (validator scenarios) -------------------------

  test("reference dq_validator batch_dataframe_success runs verbatim") {
    assume(available, s"missing $dvRoot")
    withBucketConf {
      val (tmp, run) = runScenario(Scn("batch_dataframe_success", "validator",
        "batch", "dataframe_reader", "success", restore = false, failOnError = true))
      run()
      assertSinkMatches(tmp, "batch_dataframe_success", "dq_control_success")
    }
  }

  test("reference dq_validator streaming_dataframe_failure raises and still writes the sink") {
    assume(available, s"missing $dvRoot")
    withBucketConf {
      val (tmp, run) = runScenario(Scn("streaming_dataframe_failure", "validator",
        "streaming", "dataframe_reader", "failure", restore = false, failOnError = true))
      intercept[DQValidationFailedException](run())
      assertSinkMatches(tmp, "streaming_dataframe_failure", "dq_control_failure")
    }
  }

  test("reference dq_validator streaming_failure_disabled does not raise") {
    assume(available, s"missing $dvRoot")
    withBucketConf {
      val (tmp, run) = runScenario(Scn("streaming_failure_disabled", "validator",
        "streaming", "table_reader", "failure_disabled", restore = false,
        failOnError = false))
      run()
      assertSinkMatches(tmp, "streaming_failure_disabled", "dq_control_failure_disabled")
    }
  }

  private def restoreCase(name: String, readType: String, inputType: String,
      criticalFns: Seq[DQFunctionSpec] = Seq.empty,
      maxPct: Option[Double] = None): Unit = {
    withBucketConf {
      val (tmp, run) = runScenario(Scn(name, "validator", readType, inputType,
        "failure", restore = true, failOnError = true,
        criticalFns = criticalFns, maxPctFailure = maxPct))
      val ex = intercept[DQValidationFailedException](run())
      assert(ex.getMessage.contains("restored to the previous version"), ex.getMessage)
      // the table/files rolled back to the part-01-only state
      val restored = spark.read.parquet(s"$tmp/out/feature/dq_validator/data")
      val ctrl = readControlCsv(s"$dvRoot/data/control/data_restore_control.csv")
      assertNoDiffRef(restored, ctrl)
      assertSinkMatches(tmp, name, "dq_control_failure")
    }
  }

  test("reference dq_validator batch_failure restores the previous table version") {
    assume(available, s"missing $dvRoot")
    restoreCase("batch_failure", "batch", "table_reader")
  }

  test("reference dq_validator streaming_failure restores the previous file version") {
    assume(available, s"missing $dvRoot")
    restoreCase("streaming_failure", "streaming", "file_reader")
  }

  test("reference dq_validator streaming_failure_critical (plain, notes, markdown)") {
    assume(available, s"missing $dvRoot")
    restoreCase("streaming_failure_critical", "streaming", "file_reader",
      criticalFns = Seq(DQFunctionSpec("expect_table_row_count_to_be_between",
        Map("min_value" -> 3, "max_value" -> 11))))
    restoreCase("streaming_failure_critical_notes", "streaming", "file_reader",
      criticalFns = Seq(DQFunctionSpec("expect_table_row_count_to_be_between",
        Map("min_value" -> 3, "max_value" -> 11,
          "meta" -> Map("notes" -> "Test notes")))))
    restoreCase("streaming_failure_critical_markdown", "streaming", "file_reader",
      criticalFns = Seq(DQFunctionSpec("expect_table_row_count_to_be_between",
        Map("min_value" -> 3, "max_value" -> 11,
          "meta" -> Map("notes" -> Map("format" -> "markdown",
            "content" -> "**Test Notes**"))))))
  }

  test("reference dq_validator streaming_failure_percentage breaches the threshold") {
    assume(available, s"missing $dvRoot")
    restoreCase("streaming_failure_percentage", "streaming", "file_reader",
      maxPct = Some(0.2))
  }

  // ---- test_dq_validator (PRISMA table scenarios) ----------------------

  for ((name, table, readType, inputType, control) <- Seq(
      ("table_batch_success", "test_db.dq_functions_source_table_success",
        "batch", "file_reader", "dq_control_success_explode"),
      ("table_batch_failure_disabled", "test_db.dq_functions_source_table_failure",
        "batch", "file_reader", "dq_control_success_explode_disabled"),
      ("table_streaming_success", "test_db.dq_functions_source_table_success",
        "streaming", "file_reader", "dq_control_success_explode"),
      ("table_streaming_failure_disabled", "test_db.dq_functions_source_table_failure",
        "streaming", "file_reader", "dq_control_success_explode_disabled"),
      ("table_batch_dataframe_success", "test_db.dq_functions_source_table_success",
        "batch", "dataframe_reader", "dq_control_success_explode"),
      ("table_batch_dataframe_failure_disabled",
        "test_db.dq_functions_source_table_failure",
        "streaming", "dataframe_reader", "dq_control_success_explode_disabled")))
    test(s"reference dq_validator PRISMA $name runs verbatim") {
      assume(available, s"missing $dvRoot")
      withBucketConf {
        val (tmp, run) = runScenario(Scn(name, "prisma", readType, inputType,
          "success", restore = false, failOnError = false, dqDbTable = Some(table)))
        run()
        assertSinkMatches(tmp, name, control)
      }
    }

  // ---- test_dq_validator_two_runs (result-sink stability) --------------

  test("reference dq_validator streaming_dataframe_two_runs: appended sink stays readable") {
    assume(available, s"missing $dvRoot")
    withBucketConf {
      val name = "streaming_dataframe_two_runs"
      val tables = Seq(
        "test_db.dq_functions_streaming_dataframe_two_runs_first_run",
        "test_db.dq_functions_streaming_dataframe_two_runs_second_run")
      var tmp0: String = null
      tables.foreach { t =>
        val (tmp, run) = runScenario(Scn(name, "prisma", "streaming",
          "dataframe_reader", "success", restore = false, failOnError = false,
          dqDbTable = Some(t)))
        if (tmp0 == null) tmp0 = tmp
        // both runs append to the SAME bucket-derived sink location
        spark.conf.set("spark.graft.dqDevBucket", s"$tmp0/out/feature")
        run()
      }
      // the regression: reading the twice-appended sink must not fail
      // (void/long-vs-double types across runs)
      sinkDf(tmp0, name).show(5)
      assert(sinkDf(tmp0, name).count() >= 2)
    }
  }
}
