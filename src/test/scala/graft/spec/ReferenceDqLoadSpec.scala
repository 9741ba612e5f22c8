package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The remaining load_with_dq_validator scenarios executed VERBATIM
  * (`tests/feature/test_data_quality.py` — full_overwrite and
  * delta_with_duplicates already run in ReferenceScenariosSpec): the
  * tagged variants compare the loaded data's `dq_validations` struct
  * against the reference's controls with its own normalization (digits
  * out of run_name, batch ids out of kwargs, details sorted), and
  * no_transformers pins the RAW result-sink layout in a load context. */
class ReferenceDqLoadSpec extends SparkSpec with ReferenceHarness {

  private val dqRoot = s"$refRoot/data_quality/load_with_dq_validator"

  private val volatileCols = Seq("checkpoint_config", "run_name", "run_time",
    "run_results", "validation_results", "validation_result_identifier",
    "exception_info", "batch_id", "run_time_year", "run_time_month",
    "run_time_day", "kwargs", "processed_keys", "meta",
    // GX-side run bookkeeping columns with no engine analogue
    "run_id", "success_percent", "source_primary_key")

  private def runScenario(name: String, readType: String): String = {
    ensureTestDb()
    spark.sql(s"DROP TABLE IF EXISTS test_db.validator_$name")
    val res = s"$dqRoot/$name"
    val tmp = tmpDir(s"ref-dql-$name")
    val inDir = s"$tmp/in/feature/data_quality/load_with_dq_validator/$name/data"
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/${readType}_init.json", tmp))
    if (name.startsWith("full_overwrite")) cleanDir(inDir)
    Files.list(Paths.get(s"$res/data/source")).forEach { p =>
      val n = p.getFileName.toString
      if (n != "part-01.csv") copyIn(p.toString, inDir)
    }
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/${readType}_new.json", tmp))
    tmp
  }

  private def assertSinkMatchesControl(name: String): Unit = {
    val res = s"$dqRoot/$name"
    val controlSchema = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(
        Paths.get(s"$res/data/control/data_validator_schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val control = spark.read.schema(controlSchema)
      .json(s"$res/data/control/data_validator.json")
    // the reference's has_diff projects the CONTROL onto the RESULT's
    // columns (DataframeHelpers.has_diff selects df.columns from both),
    // so extra control-schema columns other scenarios populate are
    // ignored; every result column must exist in the control schema
    val result = spark.table(s"test_db.validator_$name")
    val compared = result.columns.toSeq.filterNot(volatileCols.contains)
    compared.foreach(c => assert(controlSchema.fieldNames.contains(c),
      s"result sink column '$c' not in the reference control schema"))
    def norm(df: DataFrame) = df.select(compared.map {
      // representation delta: GX renders failing keys as structs, the
      // engine as JSON strings — same information; compare cardinality
      case c @ "unexpected_index_list" => size(col(c)).cast("string").as(c)
      case c =>
      val cast = col(c).cast(controlSchema(c).dataType).cast("string")
      (when(cast.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
        cast.cast("double").cast("string")).otherwise(cast)).as(c)
    }: _*)
    assertSameRows(norm(result), norm(control))
  }

  /** The reference's _prepare_validation_df: digits out of run_name,
    * batch ids out of kwargs, failure details sorted. */
  private def prepValidation(df: DataFrame): DataFrame =
    df.withColumn("dq_validations",
      col("dq_validations")
        .withField("run_name",
          regexp_replace(col("dq_validations.run_name"), "[0-9]", ""))
        .withField("dq_failure_details",
          array_sort(transform(col("dq_validations.dq_failure_details"),
            x => x.withField("kwargs",
              regexp_replace(x.getField("kwargs"), "\"batch_id\":.*?,", ""))))))

  private def assertTaggedMatchesControl(name: String, tmp: String): Unit = {
    val res = s"$dqRoot/$name"
    val salesSchema = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(Paths.get(s"$res/data/control/sales_schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val control = prepValidation(spark.read.schema(salesSchema)
      .json(s"$res/data/control/sales.json"))
    val result = prepValidation(spark.read.option("mergeSchema", "true").parquet(
      s"$tmp/out/feature/data_quality/load_with_dq_validator/$name/data"))
    def norm(df: DataFrame) = df.select(control.columns.map(c =>
      col(c).cast(salesSchema(c).dataType)).toSeq: _*)
      .select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  for ((name, readType) <- Seq(
      "delta_with_duplicates_tag" -> "streaming",
      "delta_with_dupl_tag_gen_fail" -> "streaming",
      "full_overwrite_tag" -> "batch"))
    test(s"reference data_quality/load_with_dq_validator/$name: tagged data + sink match the controls") {
      assume(new java.io.File(s"$dqRoot/$name").isDirectory, s"missing $dqRoot/$name")
      val tmp = runScenario(name, readType)
      assertSinkMatchesControl(name)
      assertTaggedMatchesControl(name, tmp)
    }

  test("reference data_quality/load_with_dq_validator/no_transformers: raw result sink matches the control") {
    assume(new java.io.File(s"$dqRoot/no_transformers").isDirectory,
      s"missing $dqRoot/no_transformers")
    runScenario("no_transformers", "streaming")
    assertSinkMatchesControl("no_transformers")
  }
}

/** The load_with_dq_table scenarios executed VERBATIM
  * (`test_data_quality.py` test_load_with_dq_validator_table): the
  * DataLoader-side PRISMA e2e — rules imported from a rules table at the
  * in_motion execution point inside load_data, bucket-derived exploded
  * result sink, and DQ row tagging, against the reference's controls. */
class ReferenceDqTableLoadSpec extends SparkSpec with ReferenceHarness {

  private val dqRoot = s"$refRoot/data_quality/load_with_dq_table"

  private val volatileCols = Seq("checkpoint_config", "run_name", "run_time",
    "run_results", "validation_results", "validation_result_identifier",
    "exception_info", "batch_id", "run_time_year", "run_time_month",
    "run_time_day", "kwargs", "processed_keys", "meta",
    "run_id", "success_percent", "source_primary_key")

  private def prepValidation(df: DataFrame): DataFrame =
    df.withColumn("dq_validations",
      col("dq_validations")
        .withField("run_name",
          regexp_replace(col("dq_validations.run_name"), "[0-9]", ""))
        .withField("dq_failure_details",
          array_sort(transform(col("dq_validations.dq_failure_details"),
            x => x.withField("kwargs",
              regexp_replace(x.getField("kwargs"), "\"batch_id\":.*?,", ""))))))

  for ((name, readType) <- Seq(
      "delta_with_duplicates_tag" -> "streaming",
      "delta_with_dupl_tag_gen_fail" -> "streaming",
      "full_overwrite_tag" -> "batch"))
    test(s"reference data_quality/load_with_dq_table/$name PRISMA load runs verbatim") {
      assume(new java.io.File(s"$dqRoot/$name").isDirectory, s"missing $dqRoot/$name")
      val res = s"$dqRoot/$name"
      val tmp = tmpDir(s"ref-dqt-$name")
      spark.conf.set("spark.graft.dqDevBucket", s"$tmp/out/feature")
      try {
        val inDir = s"$tmp/in/feature/data_quality/load_with_dq_table/$name/data"
        val tablePrefix = s"test_db.dq_functions_source_load_with_dq_table_$name"
        copyIn(s"$res/data/source/part-01.csv", inDir)
        createPrismaRulesTable(
          s"$res/data/dq_functions/${tablePrefix}_init.csv", s"${tablePrefix}_init")
        graft.algo.DataLoader.loadData(spark, rebase(s"$res/${readType}_init.json", tmp))
        if (name.startsWith("full_overwrite")) cleanDir(inDir)
        Files.list(Paths.get(s"$res/data/source")).forEach { p =>
          val n = p.getFileName.toString
          if (n != "part-01.csv") copyIn(p.toString, inDir)
        }
        createPrismaRulesTable(
          s"$res/data/dq_functions/${tablePrefix}_new.csv", s"${tablePrefix}_new")
        graft.algo.DataLoader.loadData(spark, rebase(s"$res/${readType}_new.json", tmp))

        // result sink (bucket-derived, exploded): project the control
        // onto the result's non-volatile columns, like has_diff
        val controlSchema = org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(
            Paths.get(s"$res/data/control/data_validator_schema.json")))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val control = spark.read.schema(controlSchema)
          .json(s"$res/data/control/data_validator.json")
        val result = spark.read.option("mergeSchema", "true")
          .parquet(s"$tmp/out/feature/$name/result_sink/")
        val compared = result.columns.toSeq.filterNot(volatileCols.contains)
        compared.foreach(c => assert(controlSchema.fieldNames.contains(c),
          s"result sink column '$c' not in the reference control schema"))
        def norm(df: DataFrame) = df.select(compared.map {
          case c @ "unexpected_index_list" => size(col(c)).cast("string").as(c)
          case c =>
            val cast = col(c).cast(controlSchema(c).dataType).cast("string")
            (when(cast.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
              cast.cast("double").cast("string")).otherwise(cast)).as(c)
        }: _*)
        assertSameRows(norm(result), norm(control))

        // tagged data
        val salesSchema = org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(Paths.get(s"$res/data/control/sales_schema.json")))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val controlData = prepValidation(spark.read.schema(salesSchema)
          .json(s"$res/data/control/sales.json"))
        val resultData = prepValidation(spark.read.option("mergeSchema", "true")
          .parquet(s"$tmp/out/feature/data_quality/load_with_dq_table/$name/data"))
        def normD(df: DataFrame) = df.select(controlData.columns.map(c =>
          col(c).cast(salesSchema(c).dataType)).toSeq: _*)
          .select(controlData.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
        assertSameRows(normD(resultData), normD(controlData))
      } finally spark.conf.unset("spark.graft.dqDevBucket")
    }
}
