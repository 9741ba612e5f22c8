package graft.algo

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Port of the reference's record-mode-CDC delta-load golden scenarios
  * (`tests/feature/delta_load/test_delta_load_record_mode_cdc.py`, fixtures
  * under `tests/resources/feature/delta_load/record_mode_cdc`): the strongest
  * external check on the condense + incremental-filter + merge + streaming
  * planner composition. Each scenario drives the same ACON flow as the
  * reference (init load, then one or more delta loads over incrementally
  * arriving files) and golden-compares the merged table against the
  * reference's control CSVs, vendored under `src/test/resources/delta_load`.
  *
  * The reference writes Delta; this build's merge writer preserves the same
  * MERGE clause semantics natively over parquet (see `Writers.mergeWrite`),
  * so the golden rows must match bit-for-bit even though the storage format
  * differs. Where the reference gets column types from a pre-created Delta
  * table, the streaming scenarios here declare the same schema on the input
  * spec (13 columns, `test_delta_load_record_mode_cdc.py:283-302`).
  */
class DeltaLoadGoldenSpec extends SparkSpec {

  private def res(path: String): String = {
    val url = getClass.getResource(s"/delta_load/record_mode_cdc/$path")
    assert(url != null, s"missing fixture $path")
    url.getPath
  }

  /** Copy fixture source files into the pipeline's landing dir. */
  private def arrive(scenario: String, inDir: String, names: String*): Unit = {
    Files.createDirectories(Paths.get(inDir))
    names.foreach { n =>
      Files.copy(Paths.get(res(s"$scenario/source/$n")), Paths.get(inDir, n),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Golden compare: merged table vs reference control CSV, aligned to the
    * control's column order and compared as strings (types differ between
    * parquet-from-csv-inference and csv-inference only in width). */
  private def assertMatchesControl(outLoc: String, scenario: String, controlFile: String): Unit = {
    val control = spark.read
      .options(Map("header" -> "true", "delimiter" -> "|", "inferSchema" -> "true"))
      .csv(res(s"$scenario/control/$controlFile"))
    val result = spark.read.parquet(outLoc)
    assert(result.columns.sorted.toSeq == control.columns.sorted.toSeq,
      s"schema mismatch: ${result.columns.sorted.mkString(",")} vs ${control.columns.sorted.mkString(",")}")
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  // ---- ACON fragments (predicates verbatim from the reference fixtures) --

  private val mergePredicate =
    "current.salesorder = new.salesorder and current.item = new.item and current.date <=> new.date"
  private val deletePredicate = "new.recordmode in ('R','D','X')"
  private val insertPredicate = "new.recordmode is null or new.recordmode not in ('R','D','X')"
  private val lateUpdatePredicate =
    "new.extraction_timestamp > current.extraction_timestamp or " +
      "new.actrequest_timestamp > current.actrequest_timestamp or " +
      "( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid > current.datapakid) or " +
      "( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid = current.datapakid and new.partno > current.partno) or " +
      "( new.actrequest_timestamp = current.actrequest_timestamp and new.datapakid = current.datapakid and new.partno = current.partno and new.record >= current.record)"

  private val tableSchemaDdl =
    "extraction_timestamp string, actrequest_timestamp string, request string, " +
      "datapakid int, partno int, record int, salesorder int, item int, " +
      "recordmode string, date int, customer string, article string, amount int"

  private def condense(asc: Boolean): String =
    s"""{"function": "condense_record_mode_cdc", "args": {
       |  "business_key": ["salesorder", "item"],
       |  "ranking_key_desc": ["extraction_timestamp", "actrequest_timestamp", "datapakid", "partno", "record"],
       |  ${if (asc) """"ranking_key_asc": ["recordmode"],""" else ""}
       |  "record_mode_col": "recordmode",
       |  "valid_record_modes": ["", "N", "R", "D", "X"]}}""".stripMargin

  /** Source input spec. The reference pre-creates the target Delta table
    * with a declared 13-column schema and lets MERGE cast into it; here the
    * same schema is declared on the source read, which pins the types from
    * the first load onward (inference over part-01 alone would type
    * `request` as int and diverge from the reference's `request string`). */
  private def sourceInput(loc: String, fmt: String): String = fmt match {
    case "csv" =>
      s"""{"spec_id": "sales_source", "read_type": "batch", "data_format": "csv",
         | "options": {"header": "true", "delimiter": "|"},
         | "schema": "$tableSchemaDdl",
         | "location": "$loc"}""".stripMargin
    case "json" =>
      // JSON carries `date` as a string literal; a declared int schema would
      // null it out on read (JSON does not coerce string->int). Inference +
      // the merge writer's cast-to-target keeps reference semantics.
      s"""{"spec_id": "sales_source", "read_type": "batch", "data_format": "json",
         | "location": "$loc"}""".stripMargin
  }

  private def mergeOutput(inputId: String, loc: String, opts: Seq[(String, String)],
      specId: String = "sales_bronze"): String = {
    val mo = opts.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")
    s"""{"spec_id": "$specId", "input_id": "$inputId", "write_type": "merge",
       | "data_format": "delta", "location": "$loc", "merge_opts": {$mo}}""".stripMargin
  }

  /** batch_init.json shape: source -> condense -> merge-create. */
  private def initAcon(in: String, out: String, fmt: String, asc: Boolean): String =
    s"""{
       | "input_specs": [${sourceInput(in, fmt)}],
       | "transform_specs": [{"spec_id": "condensed_sales", "input_id": "sales_source",
       |   "transformers": [${condense(asc)}]}],
       | "output_specs": [${mergeOutput("condensed_sales", out, Seq("merge_predicate" -> mergePredicate))}]
       |}""".stripMargin

  /** batch_delta.json shape: source + current table -> incremental filter on
    * the table's max actrequest_timestamp -> condense -> merge. */
  private def deltaAcon(in: String, out: String, fmt: String,
      mergeOpts: Seq[(String, String)], greaterOrEqual: Boolean = false): String =
    s"""{
       | "input_specs": [
       |   ${sourceInput(in, fmt)},
       |   {"spec_id": "sales_bronze", "read_type": "batch", "data_format": "delta", "location": "$out"}
       | ],
       | "transform_specs": [
       |   {"spec_id": "max_sales_bronze_timestamp", "input_id": "sales_bronze",
       |    "transformers": [{"function": "get_max_value", "args": {"input_col": "actrequest_timestamp"}}]},
       |   {"spec_id": "condensed_sales", "input_id": "sales_source",
       |    "transformers": [
       |      {"function": "incremental_filter", "args":
       |        {"input_col": "actrequest_timestamp", "increment_df": "max_sales_bronze_timestamp",
       |         "greater_or_equal": $greaterOrEqual}},
       |      ${condense(asc = false)}]}
       | ],
       | "output_specs": [${mergeOutput("condensed_sales", out, mergeOpts)}]
       |}""".stripMargin

  // ---- batch delta loads (test_batch_delta_load) -------------------------

  private val batchScenarios = Seq(
    ("with_deletes_additional_columns", "csv",
      Seq("merge_predicate" -> mergePredicate, "delete_predicate" -> deletePredicate,
        "insert_predicate" -> insertPredicate)),
    ("with_duplicates", "csv",
      Seq("merge_predicate" -> mergePredicate, "delete_predicate" -> deletePredicate)),
    ("with_upserts_only_removed_columns", "json",
      Seq("merge_predicate" -> mergePredicate, "delete_predicate" -> deletePredicate,
        "insert_predicate" -> insertPredicate)))

  for ((scenario, fmt, mergeOpts) <- batchScenarios)
    test(s"golden delta load (batch): $scenario") {
      val in = tmpDir(s"gold-$scenario-in")
      val out = tmpDir(s"gold-$scenario-out") + "/data"
      arrive(scenario, in, s"part-01.$fmt")
      DataLoader.loadData(spark, initAcon(in, out, fmt, asc = true))
      arrive(scenario, in, s"part-02.$fmt", s"part-03.$fmt", s"part-04.$fmt")
      DataLoader.loadData(spark, deltaAcon(in, out, fmt, mergeOpts))
      assertMatchesControl(out, scenario, "part-01.csv")
    }

  // ---- file-by-file: late-arriving and out-of-order (test_file_by_file) --

  private val lateMergeOpts = Seq(
    "merge_predicate" -> mergePredicate, "update_predicate" -> lateUpdatePredicate,
    "delete_predicate" -> deletePredicate, "insert_predicate" -> insertPredicate)

  for (scenario <- Seq("late_arriving_changes", "out_of_order_changes"))
    test(s"golden delta load (file-by-file batch): $scenario") {
      val in = tmpDir(s"gold-$scenario-in")
      val out = tmpDir(s"gold-$scenario-out") + "/data"
      // out_of_order loads part-03 before part-02; the table must converge
      // to the same state either way (update_predicate guards recency)
      val (second, third) =
        if (scenario == "out_of_order_changes") ("part-03.csv", "part-02.csv")
        else ("part-02.csv", "part-03.csv")
      arrive(scenario, in, "part-01.csv")
      DataLoader.loadData(spark, initAcon(in, out, "csv", asc = false))
      for (f <- Seq(second, third, "part-04.csv")) {
        arrive(scenario, in, f)
        // greater_or_equal: late files can share the already-loaded
        // timestamp; update_predicate guards against regressions
        DataLoader.loadData(spark, deltaAcon(in, out, "csv", lateMergeOpts, greaterOrEqual = true))
      }
      assertMatchesControl(out, scenario, "part-01.csv")
    }

  // ---- file-by-file streaming (test_file_by_file, streaming variant) ----

  /** streaming_delta.json shape: one ACON for every run — streaming csv
    * source, condense (re-planned into foreachBatch by the streaming
    * planner), merge per micro-batch; the checkpoint makes successive runs
    * pick up only newly arrived files. */
  private def streamingAcon(in: String, out: String, checkpoint: String): String =
    s"""{
       | "input_specs": [{
       |   "spec_id": "sales_source", "read_type": "streaming", "data_format": "csv",
       |   "options": {"header": "true", "delimiter": "|"},
       |   "schema": "$tableSchemaDdl",
       |   "location": "$in"}],
       | "transform_specs": [{"spec_id": "transformed_sales_source", "input_id": "sales_source",
       |   "transformers": [${condense(asc = false)}]}],
       | "output_specs": [${mergeOutput("transformed_sales_source", out, lateMergeOpts)
          .replace("\"merge_opts\"",
            s""""options": {"checkpointLocation": "$checkpoint"}, "merge_opts"""")}]
       |}""".stripMargin

  for (scenario <- Seq("late_arriving_changes", "out_of_order_changes"))
    test(s"golden delta load (file-by-file streaming): $scenario") {
      val in = tmpDir(s"gold-s-$scenario-in")
      val base = tmpDir(s"gold-s-$scenario-out")
      val out = base + "/data"
      val checkpoint = base + "/checkpoint"
      val (second, third) =
        if (scenario == "out_of_order_changes") ("part-03.csv", "part-02.csv")
        else ("part-02.csv", "part-03.csv")
      for (f <- Seq("part-01.csv", second, third, "part-04.csv")) {
        arrive(scenario, in, f)
        DataLoader.loadData(spark, streamingAcon(in, out, checkpoint))
      }
      assertMatchesControl(out, scenario, "part-01.csv")
    }

  // ---- backfill (test_backfill) ------------------------------------------

  test("golden delta load: backfill re-applies changed history") {
    val scenario = "backfill"
    val in = tmpDir("gold-backfill-in")
    val out = tmpDir("gold-backfill-out") + "/data"
    val backfillOpts = Seq(
      "merge_predicate" -> mergePredicate, "delete_predicate" -> deletePredicate,
      "insert_predicate" -> insertPredicate)
    arrive(scenario, in, "part-01.csv")
    DataLoader.loadData(spark, initAcon(in, out, "csv", asc = false))
    arrive(scenario, in, "part-02.csv", "part-03.csv", "part-04.csv")
    DataLoader.loadData(spark, deltaAcon(in, out, "csv", backfillOpts))
    // the backfill file re-ships all of part-02..04 with amount*10; the
    // fixed >= increment re-reads from the backfill point (batch_backfill.json)
    for (f <- Seq("part-02.csv", "part-03.csv", "part-04.csv"))
      Files.delete(Paths.get(in, f))
    arrive(scenario, in, "part-05.csv")
    val backfillAcon =
      s"""{
         | "input_specs": [${sourceInput(in, "csv")}],
         | "transform_specs": [{"spec_id": "condensed_sales", "input_id": "sales_source",
         |   "transformers": [
         |     {"function": "incremental_filter", "args":
         |       {"input_col": "actrequest_timestamp", "increment_value": "20180110120052t",
         |        "greater_or_equal": true}},
         |     ${condense(asc = false)}]}],
         | "output_specs": [${mergeOutput("condensed_sales", out, backfillOpts)}]
         |}""".stripMargin
    DataLoader.loadData(spark, backfillAcon)
    assertMatchesControl(out, scenario, "part-01.csv")
  }

  // ---- direct silver load (test_direct_silver_load) ----------------------

  test("golden delta load: direct silver load writes bronze and silver in one run") {
    val scenario = "direct_silver_load"
    val in = tmpDir("gold-silver-in")
    val base = tmpDir("gold-silver-out")
    val bronze = base + "/bronze/data"
    val silver = base + "/silver/data"
    // bronze keeps the raw changelog (full ranking-key merge predicate);
    // silver gets the condensed view — both written from one pipeline
    val bronzePredicate =
      "current.actrequest_timestamp = new.actrequest_timestamp and current.datapakid = new.datapakid and " +
        "current.partno = new.partno and current.record = new.record and current.salesorder = new.salesorder and " +
        "current.item = new.item and current.date <=> new.date"
    def silverAcon(withIncrement: Boolean): String = {
      val silverOpts =
        if (withIncrement)
          Seq("merge_predicate" -> mergePredicate, "delete_predicate" -> deletePredicate,
            "insert_predicate" -> insertPredicate)
        else Seq("merge_predicate" -> mergePredicate)
      val inputs =
        if (withIncrement)
          s"""${sourceInput(in, "csv")},
             |{"spec_id": "sales_bronze", "read_type": "batch", "data_format": "delta", "location": "$bronze"}""".stripMargin
        else sourceInput(in, "csv")
      val transforms =
        if (withIncrement)
          s"""{"spec_id": "max_sales_bronze_timestamp", "input_id": "sales_bronze",
             |  "transformers": [{"function": "get_max_value", "args": {"input_col": "actrequest_timestamp"}}]},
             |{"spec_id": "condensed_sales", "input_id": "sales_source",
             |  "transformers": [
             |    {"function": "incremental_filter", "args":
             |      {"input_col": "actrequest_timestamp", "increment_df": "max_sales_bronze_timestamp"}},
             |    ${condense(asc = false)}]}""".stripMargin
        else
          s"""{"spec_id": "condensed_sales", "input_id": "sales_source",
             |  "transformers": [${condense(asc = false)}]}""".stripMargin
      s"""{
         | "input_specs": [$inputs],
         | "transform_specs": [$transforms],
         | "output_specs": [
         |   ${mergeOutput("sales_source", bronze, Seq("merge_predicate" -> bronzePredicate))},
         |   ${mergeOutput("condensed_sales", silver, silverOpts, specId = "sales_silver")}
         | ]
         |}""".stripMargin
    }
    arrive(scenario, in, "part-01.csv")
    DataLoader.loadData(spark, silverAcon(withIncrement = false))
    arrive(scenario, in, "part-02.csv", "part-03.csv", "part-04.csv")
    DataLoader.loadData(spark, silverAcon(withIncrement = true))
    assertMatchesControl(bronze, scenario, "part-01.csv")
    assertMatchesControl(silver, scenario, "part-02.csv")
  }
}
