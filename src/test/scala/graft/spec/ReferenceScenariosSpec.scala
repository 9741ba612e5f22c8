package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when}

/** EXECUTION-level conformance on the reference's own feature scenarios:
  * run the reference's actual ACON JSON files — unmodified except for
  * rebasing `/app/tests/lakehouse` onto a local temp root — against the
  * reference's own `data/source` fixtures, following each reference
  * test's copy/run/copy/run choreography, and golden-compare the output
  * against the reference's own `data/control` CSVs.
  *
  * This is one level past AconSweepSpec (which proves every config
  * PLANS): here the bytes of the config AND the bytes of the data AND
  * the bytes of the expected output are all the reference's. The
  * reference writes Delta where this build's writer preserves the same
  * semantics over parquet, so the row-level compare must still match.
  */
class ReferenceScenariosSpec extends SparkSpec {

  private val refRoot = "/root/reference/tests/resources/feature"

  // the reference conftest pre-creates test_db before any scenario runs
  private def ensureTestDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS test_db")

  private def rebase(aconPath: String, tmpRoot: String): String =
    Files.readString(Paths.get(aconPath))
      .replace("file:///app/tests/lakehouse", s"file://$tmpRoot")
      .replace("/app/tests/lakehouse", tmpRoot)

  private def copyIn(src: String, destDir: String): Unit = {
    Files.createDirectories(Paths.get(destDir))
    Files.copy(Paths.get(src),
      Paths.get(destDir, Paths.get(src).getFileName.toString),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def cleanDir(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.isDirectory(p))
      Files.list(p).forEach(f => Files.deleteIfExists(f))
  }

  /** Reference DataframeHelpers-style compare: control CSV read with
    * header/|/inferSchema, both sides cast to string column-for-column. */
  private def assertMatchesControl(outLoc: String, controlCsv: String): Unit = {
    val control = spark.read
      .options(Map("header" -> "true", "delimiter" -> "|", "inferSchema" -> "true"))
      .csv(controlCsv)
    val result = spark.read.parquet(outLoc)
    assert(result.columns.sorted.toSeq == control.columns.sorted.toSeq,
      s"schema mismatch: ${result.columns.sorted.mkString(",")} vs ${control.columns.sorted.mkString(",")}")
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  /** The reference test_batch_full_load choreography for one scenario:
    * part-01 -> init acon, clean, part-02 -> main acon, compare. */
  private def runFullLoad(scenario: String): Unit = {
    val res = s"$refRoot/full_load/$scenario"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    val tmp = tmpDir(s"ref-fl-$scenario")
    val inDir = s"$tmp/in/feature/full_load/$scenario/data"
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    cleanDir(inDir)
    copyIn(s"$res/data/source/part-02.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tmp))
    assertMatchesControl(
      s"$tmp/out/feature/full_load/$scenario/data",
      s"$res/data/control/part-01.csv")
  }

  test("reference full_load/with_filter runs verbatim and matches its control data") {
    runFullLoad("with_filter")
  }

  test("reference full_load/full_overwrite runs verbatim and matches its control data") {
    runFullLoad("full_overwrite")
  }

  test("reference full_load/with_filter_partition_overwrite (replaceWhere) runs verbatim and matches its control data") {
    runFullLoad("with_filter_partition_overwrite")
  }

  test("reference append_load/streaming_dropmalformed runs verbatim and matches its control data") {
    val res = s"$refRoot/append_load/streaming_dropmalformed"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.streaming_dropmalformed_table")
    val tmp = tmpDir("ref-al-drop")
    val inDir = s"$tmp/in/feature/append_load/streaming_dropmalformed/data"
    // reference test_append_load choreography: files arrive one at a
    // time, the streaming acon drains after each arrival
    Seq("part-01.csv", "part-02.csv", "part-03.csv").foreach { f =>
      copyIn(s"$res/data/source/$f", inDir)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming.json", tmp))
    }
    assertMatchesControl(
      s"$tmp/out/feature/append_load/streaming_dropmalformed/data",
      s"$res/data/control/part-01.csv")
  }

  /** Read a reference control CSV, optionally with a reference schema
    * file (`control_schema.json`), mirroring DataframeHelpers. */
  private def readControl(csv: String, schemaJson: Option[String]): DataFrame = {
    val r = spark.read.options(Map("header" -> "true", "delimiter" -> "|"))
    schemaJson match {
      case Some(p) =>
        r.schema(org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(Paths.get(p)))
          .asInstanceOf[org.apache.spark.sql.types.StructType]).csv(csv)
      case None => r.option("inferSchema", "true").csv(csv)
    }
  }

  private def assertNoDiff(result: DataFrame, control: DataFrame): Unit = {
    assert(result.columns.sorted.toSeq == control.columns.sorted.toSeq,
      s"schema mismatch: ${result.columns.sorted.mkString(",")} vs ${control.columns.sorted.mkString(",")}")
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  test("reference transformations/null_handlers scenarios run verbatim and match their control data") {
    val res = s"$refRoot/transformations/null_handlers"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    Seq("replace_nulls", "replace_nulls_col_subset").foreach { scenario =>
      val tmp = tmpDir(s"ref-nh-$scenario")
      val inRoot = s"$tmp/in/feature/transformations/null_handlers"
      copyIn(s"$res/data/source/part-01.csv", s"$inRoot/data")
      copyIn(s"$res/source_schema.json", inRoot)
      copyIn(s"$res/control_schema.json", inRoot)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/$scenario.json", tmp))
      val result = spark.read
        .parquet(s"$tmp/out/feature/transformations/null_handlers/$scenario/data")
        .drop("curr_date") // reference compare drops it (nondeterministic)
      assertNoDiff(result,
        readControl(s"$res/data/control/$scenario.csv",
          Some(s"$res/control_schema.json")).drop("curr_date"))
    }
  }

  test("reference transformations/unions scenarios run verbatim: union, unionByName_diff_schema, diff-schema error") {
    val res = s"$refRoot/transformations/unions"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    def prep(scenario: String): String = {
      val tmp = tmpDir(s"ref-un-$scenario")
      val inRoot = s"$tmp/in/feature/transformations/unions"
      copyIn(s"$res/sales_schema.json", inRoot)
      Files.list(Paths.get(res)).forEach { p =>
        if (p.getFileName.toString.endsWith("schema.json"))
          copyIn(p.toString, inRoot)
      }
      Seq("historical", "new", "shipment").foreach { kind =>
        copyIn(s"$res/data/source/sales-$kind-part-01.csv",
          s"$inRoot/data/sales/sales_$kind")
      }
      tmp
    }
    // batch union by position
    val t1 = prep("batch_union")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_union.json", t1))
    assertNoDiff(
      spark.read.parquet(s"$t1/out/feature/transformations/unions/batch_union/data"),
      readControl(s"$res/data/control/control_sales.csv", None))
    // unionByName with allowMissingColumns across different schemas
    val t2 = prep("batch_unionByName_diff_schema")
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/batch_unionByName_diff_schema.json", t2))
    assertNoDiff(
      spark.read.parquet(
        s"$t2/out/feature/transformations/unions/batch_unionByName_diff_schema/data"),
      readControl(s"$res/data/control/control_sales_shipment.csv", None))
    // positional union across different schemas must raise, as upstream
    val t3 = prep("batch_union_diff_schema")
    intercept[Exception] {
      graft.algo.DataLoader.loadData(spark,
        rebase(s"$res/batch_union_diff_schema.json", t3))
    }
  }

  test("reference transformations/joiners batch + streaming run verbatim and match their control data") {
    val res = s"$refRoot/transformations/joiners"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.batch_join")
    spark.sql("DROP TABLE IF EXISTS test_db.streaming_join")
    def prep(name: String): String = {
      val tmp = tmpDir(s"ref-jn-$name")
      val inRoot = s"$tmp/in/feature/transformations/joiners"
      copyIn(s"$res/data/source/customer-part-01.csv", s"$inRoot/data/customers")
      copyIn(s"$res/data/source/sales-part-01.csv", s"$inRoot/data/sales")
      Files.list(Paths.get(res)).forEach { p =>
        if (p.getFileName.toString.endsWith("schema.json")) copyIn(p.toString, inRoot)
      }
      tmp
    }
    def check(tmp: String, scenario: String): Unit = assertNoDiff(
      spark.read.parquet(s"$tmp/out/feature/transformations/joiners/$scenario/data"),
      readControl(s"$res/data/control/control_scenario_1_and_2.csv",
        Some(s"$res/control_scenario_1_and_2_schema.json")))
    // batch: one load over both sales parts
    val tb = prep("batch")
    copyIn(s"$res/data/source/sales-part-02.csv",
      s"$tb/in/feature/transformations/joiners/data/sales")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tb))
    check(tb, "batch")
    // streaming: drain after part-01, then part-02 arrives and drains
    val ts = prep("streaming")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming.json", ts))
    copyIn(s"$res/data/source/sales-part-02.csv",
      s"$ts/in/feature/transformations/joiners/data/sales")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming.json", ts))
    check(ts, "streaming")
  }

  test("reference transformations/multiple_transform: one input fans out to two transformed outputs") {
    val res = s"$refRoot/transformations/multiple_transform"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    val tmp = tmpDir("ref-mt")
    val inRoot = s"$tmp/in/feature/transformations/multiple_transform"
    copyIn(s"$res/data/source/part-01.csv", s"$inRoot/data")
    copyIn(s"$res/source_schema.json", inRoot)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tmp))
    val control = spark.read.option("multiLine", "true")
      .json(s"$res/data/control/part-01.json")
    assertNoDiff(
      spark.read.parquet(
        s"$tmp/out/feature/transformations/multiple_transform/batch/orders_customer_cols/data"),
      control.select("date", "country", "customer_number"))
    assertNoDiff(
      spark.read.parquet(
        s"$tmp/out/feature/transformations/multiple_transform/batch/orders_kpi_cols/data"),
      control.select("date", "city", "amount"))
  }

  test("reference transformations/date_transformers streaming runs verbatim and matches its control data") {
    val res = s"$refRoot/transformations/date_transformers"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    val tmp = tmpDir("ref-dt")
    val inRoot = s"$tmp/in/feature/transformations/date_transformers"
    copyIn(s"$res/data/source/part-01.csv", s"$inRoot/data")
    copyIn(s"$res/source_schema.json", inRoot)
    copyIn(s"$res/control_schema.json", inRoot)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming.json", tmp))
    assertNoDiff(
      spark.read
        .parquet(s"$tmp/out/feature/transformations/date_transformers/streaming/data")
        .drop("curr_date"),
      readControl(s"$res/data/control/part-01.csv",
        Some(s"$res/control_schema.json")).drop("curr_date"))
  }

  test("reference transformations/column_reshapers batch scenarios run verbatim and match their control data") {
    val fam = s"$refRoot/transformations/column_reshapers"
    assume(new java.io.File(fam).isDirectory, s"missing $fam")
    Seq("flatten_schema", "explode_arrays", "flatten_and_explode_arrays_and_maps")
      .foreach { scenario =>
        val res = s"$fam/$scenario"
        val tmp = tmpDir(s"ref-cr-$scenario")
        val inRoot = s"$tmp/in/feature/transformations/column_reshapers/$scenario"
        Files.list(Paths.get(s"$res/data/source")).forEach(p =>
          copyIn(p.toString, s"$inRoot/data"))
        Files.list(Paths.get(res)).forEach { p =>
          if (p.getFileName.toString.endsWith("schema.json")) copyIn(p.toString, inRoot)
        }
        graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tmp))
        assertNoDiff(
          spark.read.parquet(
            s"$tmp/out/feature/transformations/column_reshapers/$scenario/batch/data"),
          readControl(s"$res/data/control/part-01.csv", None))
      }
  }

  test("reference transformations/data_maskers scenarios run verbatim: SHA-256 + in-place MURMUR3 hashes match the golden") {
    val res = s"$refRoot/transformations/data_maskers"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    Seq("drop_columns", "hash_masking").foreach { scenario =>
      val tmp = tmpDir(s"ref-dm-$scenario")
      val inRoot = s"$tmp/in/feature/transformations/data_maskers"
      copyIn(s"$res/data/source/part-01.csv", s"$inRoot/data")
      Files.list(Paths.get(res)).forEach { p =>
        if (p.getFileName.toString.endsWith("schema.json")) copyIn(p.toString, inRoot)
      }
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/$scenario.json", tmp))
      assertNoDiff(
        spark.read.parquet(
          s"$tmp/out/feature/transformations/data_maskers/$scenario/data"),
        readControl(s"$res/data/control/$scenario.csv",
          Some(s"$res/${scenario}_control_schema.json")))
    }
  }

  test("reference transformations/regex_transformers with_regex_value runs verbatim and matches its control data") {
    val res = s"$refRoot/transformations/regex_transformers/with_regex_value"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    val tmp = tmpDir("ref-rx")
    val inRoot = s"$tmp/in/feature/transformations/regex_transformers/with_regex_value"
    Files.list(Paths.get(s"$res/data/source")).forEach(p =>
      copyIn(p.toString, s"$inRoot/data"))
    Files.list(Paths.get(res)).forEach { p =>
      if (p.getFileName.toString.endsWith("schema.json")) copyIn(p.toString, inRoot)
    }
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tmp))
    assertNoDiff(
      spark.read.parquet(
        s"$tmp/out/feature/transformations/regex_transformers/with_regex_value/data"),
      readControl(s"$res/data/control/part-01.csv", None))
  }

  test("reference transformations/chain_transformations scenarios run verbatim and match their control data") {
    val res = s"$refRoot/transformations/chain_transformations"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    def prep(name: String): String = {
      val tmp = tmpDir(s"ref-ch-$name")
      val inRoot = s"$tmp/in/feature/transformations/chain_transformations"
      Seq("sales_historical", "sales_new", "customers", "struct_data").foreach(k =>
        copyIn(s"$res/source/$k.csv", s"$inRoot/source/$k"))
      Files.list(Paths.get(s"$res/schema")).forEach(p =>
        copyIn(p.toString, s"$inRoot/schema"))
      tmp
    }
    def out(tmp: String, name: String) = spark.read
      .parquet(s"$tmp/out/feature/transformations/chain_transformations/$name/data")
    // batch / streaming / mixed chains against the CSV control. The
    // reference's has_diff projects BOTH sides to the RESULT's columns
    // (the shared control carries the superset); `lhe_row_id` is dropped
    // — with_row_id is documented "sequential but NOT consecutive"
    // (monotonically_increasing_id), so its VALUES are partition-layout
    // dependent, not a portable contract.
    Seq("batch", "streaming", "streaming_batch").foreach { name =>
      val tmp = prep(name)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/acons/$name.json", tmp))
      val result = out(tmp, name).drop("lhe_row_id")
      val control = readControl(s"$res/control/chain_control.csv", None)
      def norm(df: DataFrame) = df.select(
        result.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
      assertSameRows(norm(result), norm(control))
    }
    // micro-batch struct pipeline against the JSON control
    val t4 = prep("wssd")
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/acons/write_streaming_struct_data.json", t4))
    assertNoDiff(out(t4, "write_streaming_struct_data"),
      spark.read.option("multiLine", "true")
        .json(s"$res/control/struct_data.json")
        .select("salesorder", "item", "article", "sample_json_field1",
          "sample_json_field4", "item_amount_json"))
    // The reference FAILS this ACON (chained force_streaming_foreach_batch
    // transforms: its planner defers only the output's direct input, so the
    // second transform's reference to `sample_json_field1` — a micro-batch-
    // internal column of the FIRST transform — is unresolvable at runtime;
    // test_chain_transformations.py pins the StreamingQueryException).
    // Our planner walks the whole transform lineage and collects every
    // link's deferred work upstream-first (DataLoader.buildMicroBatchPlan),
    // so the same ACON now RUNS and must produce the same rows as the
    // non-chained wssd scenario — a documented capability superset, pinned
    // here against the same control data.
    val t5 = prep("wssd-fail")
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/acons/write_streaming_struct_data_fail.json", t5))
    assertNoDiff(out(t5, "write_streaming_struct_data_fail"),
      spark.read.option("multiLine", "true")
        .json(s"$res/control/struct_data.json")
        .select("salesorder", "item", "article", "sample_json_field1",
          "sample_json_field4", "item_amount_json"))
  }

  test("reference transformations/drop_duplicate_rows scenarios run verbatim and match their control data") {
    val res = s"$refRoot/transformations/drop_duplicate_rows"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    Seq("batch", "streaming").foreach { scenario =>
      val tmp = tmpDir(s"ref-dd-$scenario")
      val inRoot = s"$tmp/in/feature/transformations/drop_duplicate_rows"
      Files.list(Paths.get(s"$res/data/source")).forEach(p =>
        copyIn(p.toString, s"$inRoot/data"))
      copyIn(s"$res/source_schema.json", inRoot)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/$scenario.json", tmp))
      // three outputs per acon: keyed dedup vs drop_duplicates control,
      // no-args and empty-cols vs distinct control
      def outAt(sub: String) = spark.read.parquet(
        s"$tmp/out/feature/transformations/drop_duplicate_rows/$scenario/$sub/data")
      def ctl(kind: String) = spark.read.option("multiLine", "true")
        .json(s"$res/data/control/${scenario}_$kind.json")
      assertNoDiff(outAt("columns"), ctl("drop_duplicates"))
      assertNoDiff(outAt("orders_duplicate_no_args"), ctl("distinct"))
      assertNoDiff(outAt("orders_duplicate_empty"), ctl("distinct"))
    }
  }

  test("reference transformations/watermarker scenarios run verbatim: watermarked dedup + stream-stream join") {
    val fam = s"$refRoot/transformations/watermarker"
    assume(new java.io.File(fam).isDirectory, s"missing $fam")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.streaming_drop_duplicates")
    spark.sql("DROP TABLE IF EXISTS test_db.streaming_inner_join")
    // streaming_drop_duplicates: two arrivals through the nested
    // watermarker dedup config; late duplicates stay out of the target
    locally {
      val res = s"$fam/streaming_drop_duplicates"
      val tmp = tmpDir("ref-wm-dd")
      val inRoot = s"$tmp/in/feature/transformations/watermarker/streaming_drop_duplicates"
      copyIn(s"$res/source_schema.json", inRoot)
      Seq("part-01.csv", "part-02.csv").foreach { f =>
        copyIn(s"$res/data/source/$f", s"$inRoot/data")
        graft.algo.DataLoader.loadData(spark,
          rebase(s"$res/streaming_drop_duplicates.json", tmp))
      }
      assertNoDiff(
        spark.read.parquet(
          s"$tmp/out/feature/transformations/watermarker/streaming_drop_duplicates/data"),
        readControl(s"$res/data/control/streaming_drop_duplicates.csv",
          Some(s"$res/source_schema.json")))
    }
    // streaming_inner_join: watermarked stream-stream join, two drains
    locally {
      val res = s"$fam/streaming_inner_join"
      val tmp = tmpDir("ref-wm-ij")
      val inRoot = s"$tmp/in/feature/transformations/watermarker/streaming_inner_join"
      Files.list(Paths.get(res)).forEach { p =>
        if (p.getFileName.toString.endsWith("schema.json")) copyIn(p.toString, inRoot)
      }
      copyIn(s"$res/data/source/customer-part-01.csv", s"$inRoot/data/customers")
      Seq("part-01.csv", "part-02.csv").foreach { f =>
        copyIn(s"$res/data/source/sales-$f", s"$inRoot/data/sales")
        graft.algo.DataLoader.loadData(spark,
          rebase(s"$res/streaming_inner_join.json", tmp))
      }
      assertNoDiff(
        spark.read.parquet(
          s"$tmp/out/feature/transformations/watermarker/streaming_inner_join/data"),
        readControl(s"$res/data/control/streaming_inner_join.csv",
          Some(s"$res/streaming_inner_join_control_schema.json")))
    }
  }

  test("reference transformations/column_creators batch + streaming run verbatim and match their control data") {
    val res = s"$refRoot/transformations/column_creators"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    Seq("batch", "streaming").foreach { scenario =>
      val tmp = tmpDir(s"ref-cc-$scenario")
      val inRoot = s"$tmp/in/feature/transformations/column_creators"
      copyIn(s"$res/data/source/part-01.csv", s"$inRoot/data")
      copyIn(s"$res/source_schema.json", inRoot)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/$scenario.json", tmp))
      val control = spark.read.option("multiLine", "true")
        .json(s"$res/data/control/part-01.json")
        .select("salesorder", "item", "date", "customer", "article", "amount",
          "dummy_string", "dummy_int", "dummy_double", "dummy_boolean")
      val result = spark.read
        .parquet(s"$tmp/out/feature/transformations/column_creators/$scenario/data")
      def norm(df: DataFrame) = df.select(
        result.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
      assertSameRows(norm(result), norm(control))
    }
  }

  test("reference data_quality/load_with_dq_validator/full_overwrite: exploded result sink matches the control") {
    val res = s"$refRoot/data_quality/load_with_dq_validator/full_overwrite"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.validator_full_overwrite")
    val tmp = tmpDir("ref-dq-fo")
    val inDir = s"$tmp/in/feature/data_quality/load_with_dq_validator/full_overwrite/data"
    // reference choreography (test_data_quality.py:115-145): part-01 ->
    // init acon; clean; parts 02-04 -> new acon; the sink table
    // accumulates BOTH runs' expectation rows
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    cleanDir(inDir)
    // the glob part-0[2,3,4] matches whatever parts exist (here: part-02)
    Files.list(Paths.get(s"$res/data/source")).forEach { p =>
      val n = p.getFileName.toString
      if (n != "part-01.csv") copyIn(p.toString, inDir)
    }
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_new.json", tmp))

    val controlSchema = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(
        Paths.get(s"$res/data/control/data_validator_schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val control = spark.read.schema(controlSchema)
      .json(s"$res/data/control/data_validator.json")
    // the reference's own compare drops run-varying columns
    val volatileCols = Seq("checkpoint_config", "run_name", "run_time",
      "run_results", "validation_results", "validation_result_identifier",
      "exception_info", "batch_id", "run_time_year", "run_time_month",
      "run_time_day", "kwargs", "processed_keys", "meta")
    val compared = controlSchema.fieldNames.toSeq.filterNot(volatileCols.contains)
    val result = spark.table("test_db.validator_full_overwrite")
    compared.foreach(c => assert(result.columns.contains(c),
      s"result sink missing reference column '$c' (has ${result.columns.sorted.mkString(",")})"))
    def norm(df: DataFrame) = df.select(compared.map { c =>
      col(c).cast(controlSchema(c).dataType).cast("string").as(c)
    }: _*)
    assertSameRows(norm(result), norm(control))
  }

  test("reference data_quality/load_with_dq_validator/delta_with_duplicates: streaming DQ sink across merge loads matches the control") {
    val res = s"$refRoot/data_quality/load_with_dq_validator/delta_with_duplicates"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.validator_delta_with_duplicates")
    val tmp = tmpDir("ref-dq-dwd")
    val inDir = s"$tmp/in/feature/data_quality/load_with_dq_validator/delta_with_duplicates/data"
    // init: part-01 through the streaming CDC-condense + merge pipeline
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming_init.json", tmp))
    // new: parts 02-04 arrive together -> ONE micro-batch, one DQ run
    Seq("part-02.csv", "part-03.csv", "part-04.csv").foreach(f =>
      copyIn(s"$res/data/source/$f", inDir))
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/streaming_new.json", tmp))

    val controlSchema = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(
        Paths.get(s"$res/data/control/data_validator_schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val control = spark.read.schema(controlSchema)
      .json(s"$res/data/control/data_validator.json")
    val volatileCols = Seq("checkpoint_config", "run_name", "run_time",
      "run_results", "validation_results", "validation_result_identifier",
      "exception_info", "batch_id", "run_time_year", "run_time_month",
      "run_time_day", "kwargs", "processed_keys", "meta")
    val compared = controlSchema.fieldNames.toSeq.filterNot(volatileCols.contains)
    val result = spark.table("test_db.validator_delta_with_duplicates")
    compared.foreach(c => assert(result.columns.contains(c),
      s"result sink missing reference column '$c'"))
    // numeric-text normalization: the reference's GE layer stringifies
    // kwargs through Python floats ("19.0"); round-trip BOTH sides
    // through double so 19 == "19.0"
    def norm(df: DataFrame) = df.select(compared.map { c =>
      val cast = col(c).cast(controlSchema(c).dataType).cast("string")
      (when(cast.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
        cast.cast("double").cast("string")).otherwise(cast)).as(c)
    }: _*)
    assertSameRows(norm(result), norm(control))
  }

  test("reference materialize_cdf: expose_cdf terminator materializes change rows and a second load appends its delta") {
    val res = s"$refRoot/materialize_cdf"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.streaming_with_cdf")
    val tmp = tmpDir("ref-cdf")
    val inDir = s"$tmp/in/feature/materialize_cdf/streaming_with_cdf/data"
    val cdfLoc = s"$tmp/out/feature/materialize_cdf/streaming_with_cdf/cdf_data"
    // (the reference's acon_create_table pre-creates a Delta table with
    // CDF enabled — Delta-only setup; on the core runtime the load's
    // writer creates the external table and expose_cdf uses the
    // snapshot-diff analogue, which carries no _commit_version)
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/streaming_without_clean_cdf.json", tmp))
    val dataCols = Seq("salesorder", "item", "date", "customer", "article", "amount")
    val result1 = spark.read.parquet(cdfLoc)
      .select((dataCols :+ "_change_type").map(col): _*)
    val control = readControl(s"$res/data/control/part-01_cdf.csv",
        Some(s"$res/control_schema.json"))
      .select((dataCols :+ "_change_type").map(col): _*)
    def norm(df: DataFrame) = df.select(
      df.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result1), norm(control))

    // second load (clean_cdf + vacuum variant): only the NEW rows land
    // as inserts; young commits survive days_to_keep
    copyIn(s"$res/data/source/part-02.csv", inDir)
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/streaming_with_clean_and_vacuum.json", tmp))
    val after = spark.read.parquet(cdfLoc)
    assert(after.count() == 13 + 6) // part-01 inserts + part-02 inserts
    assert(after.where(col("_change_type") =!= "insert").count() == 0)
  }

  test("reference append_load/failfast raises on the malformed file") {
    val res = s"$refRoot/append_load/failfast"
    assume(new java.io.File(res).isDirectory, s"missing $res")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.failfast_table")
    val tmp = tmpDir("ref-al-ff")
    val inDir = s"$tmp/in/feature/append_load/failfast/data"
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    // part-03 renames `amount` and adds a column: with the schema
    // enforced from the init-created table, FAILFAST must raise
    // (reference test_append_load.py:69-93 — both files arrive together)
    copyIn(s"$res/data/source/part-02.csv", inDir)
    copyIn(s"$res/data/source/part-03.csv", inDir)
    intercept[Exception] {
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch.json", tmp))
    }
  }
}
