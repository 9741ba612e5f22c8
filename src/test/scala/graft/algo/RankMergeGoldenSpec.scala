package graft.algo

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Port of the reference's remaining delta-load golden families:
  *
  *  - group-and-rank condensation
  *    (`tests/feature/delta_load/test_delta_load_group_and_rank.py`, fixtures
  *    under `tests/resources/feature/delta_load/group_and_rank`): batch AND
  *    streaming, including the reference's deliberate NEGATIVE scenario
  *    (`fail_with_duplicates_in_same_file`), where a cancellation precedes
  *    its own creation inside one file and the load is EXPECTED to diverge
  *    from the control — the port asserts the divergence, as the reference
  *    test does with `has_diff`.
  *  - merge options (`test_delta_load_merge_options.py`, fixtures under
  *    `tests/resources/feature/delta_load/merge_options`): update_column_set,
  *    insert_column_set and update-all clause composition.
  *
  * Together they pin the exact lhe_row_id arithmetic of
  * `with_auto_increment_id` (ids must be dense and in FILE ORDER — the
  * controls encode specific ids like `lhe_row_id = 103` = file-row 3 + 100),
  * the group_and_rank latest-wins tiebreak on that id, and the
  * whenMatchedUpdate/whenNotMatchedInsert column-set semantics of the merge
  * writer. ACONs are reconstructed from the fixture JSONs; source/control
  * CSVs are vendored verbatim under `src/test/resources/delta_load`.
  */
class RankMergeGoldenSpec extends SparkSpec {

  private def res(path: String): String = {
    val url = getClass.getResource(s"/delta_load/$path")
    assert(url != null, s"missing fixture $path")
    url.getPath
  }

  /** Copy a fixture source file into the landing dir under `destName`
    * (the reference suffixes stream-iteration copies: `.csv1`, `.csv2`). */
  private def arriveAs(family: String, scenario: String, name: String,
      inDir: String, destName: String): Unit = {
    Files.createDirectories(Paths.get(inDir))
    Files.copy(Paths.get(res(s"$family/$scenario/source/$name")),
      Paths.get(inDir, destName), StandardCopyOption.REPLACE_EXISTING)
  }

  private def controlDf(family: String, scenario: String, controlFile: String): DataFrame =
    spark.read
      .options(Map("header" -> "true", "delimiter" -> "|", "inferSchema" -> "true"))
      .csv(res(s"$family/$scenario/control/$controlFile"))

  /** Golden compare, string-normalized (see DeltaLoadGoldenSpec). */
  private def assertMatchesControl(outLoc: String, family: String,
      scenario: String, controlFile: String): Unit = {
    val control = controlDf(family, scenario, controlFile)
    val result = spark.read.parquet(outLoc)
    assert(result.columns.sorted.toSeq == control.columns.sorted.toSeq,
      s"schema mismatch: ${result.columns.sorted.mkString(",")} vs ${control.columns.sorted.mkString(",")}")
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  /** The reference's `has_diff` assertion for the negative scenario. */
  private def assertDiffersFromControl(outLoc: String, family: String,
      scenario: String, controlFile: String): Unit = {
    val control = controlDf(family, scenario, controlFile)
    val result = spark.read.parquet(outLoc)
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    val diff = norm(result).exceptAll(norm(control)).count() +
      norm(control).exceptAll(norm(result)).count()
    assert(diff > 0, s"$scenario unexpectedly matched the control exactly")
  }

  private val sourceSchemaDdl =
    "salesorder int, item int, event string, changed_on int, date int, " +
      "customer string, article string, amount int"

  private def csvInput(loc: String, readType: String = "batch"): String =
    s"""{"spec_id": "sales_bronze", "read_type": "$readType", "data_format": "csv",
       | "options": {"mode": "FAILFAST", "header": "true", "delimiter": "|"},
       | "schema": "$sourceSchemaDdl", "with_filepath": true,
       | "location": "$loc"}""".stripMargin

  // ---- group_and_rank family --------------------------------------------

  private val garMergeOpts =
    """"merge_opts": {
      |  "merge_predicate": "current.salesorder = new.salesorder and current.item = new.item",
      |  "update_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on",
      |  "delete_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on and new.event = 'deleted'"
      |}""".stripMargin

  private val regexTransformer =
    """{"function": "with_regex_value", "args": {
      |  "input_col": "lhe_extraction_filepath", "output_col": "extraction_date",
      |  "drop_input_col": true, "regex": ".*WE_SO_SCL_(\\d+).csv"}}""".stripMargin

  private val groupAndRankTransformer =
    """{"function": "group_and_rank", "args": {
      |  "group_key": ["salesorder", "item"],
      |  "ranking_key": ["extraction_date", "changed_on", "lhe_row_id"]}}""".stripMargin

  /** group_and_rank/batch_init.json: id BEFORE regex, no incremental. */
  private def garInitAcon(in: String, out: String): String =
    s"""{
       | "input_specs": [${csvInput(in)}],
       | "transform_specs": [{"spec_id": "condensed_sales", "input_id": "sales_bronze",
       |   "transformers": [
       |     {"function": "with_auto_increment_id"},
       |     $regexTransformer,
       |     $groupAndRankTransformer]}],
       | "output_specs": [{"spec_id": "sales_silver", "input_id": "condensed_sales",
       |   "write_type": "merge", "data_format": "delta", "location": "$out",
       |   $garMergeOpts}]
       |}""".stripMargin

  /** group_and_rank/batch_delta.json: incremental on silver's max
    * extraction_date, id assigned AFTER the filter (so the control's ids
    * restart at 0 per delta file). `partitioned` mirrors the
    * fail-variant's `"partitions": ["date"]` output option. */
  private def garDeltaAcon(in: String, out: String, partitioned: Boolean): String =
    s"""{
       | "input_specs": [
       |   ${csvInput(in)},
       |   {"spec_id": "sales_silver", "read_type": "batch", "data_format": "delta", "location": "$out"}
       | ],
       | "transform_specs": [
       |   {"spec_id": "max_sales_silver_timestamp", "input_id": "sales_silver",
       |    "transformers": [{"function": "get_max_value", "args": {"input_col": "extraction_date"}}]},
       |   {"spec_id": "condensed_sales", "input_id": "sales_bronze",
       |    "transformers": [
       |      $regexTransformer,
       |      {"function": "incremental_filter", "args":
       |        {"input_col": "extraction_date", "increment_df": "max_sales_silver_timestamp"}},
       |      {"function": "with_auto_increment_id"},
       |      $groupAndRankTransformer]}
       | ],
       | "output_specs": [{"spec_id": "sales_silver", "input_id": "condensed_sales",
       |   "write_type": "merge", "data_format": "delta", "location": "$out",
       |   ${if (partitioned) """"partitions": ["date"],""" else ""}
       |   $garMergeOpts}]
       |}""".stripMargin

  private val garFiles = Seq(
    "WE_SO_SCL_202108111400000000.csv",
    "WE_SO_SCL_202108111500000000.csv",
    "WE_SO_SCL_202108111600000000.csv")

  for (scenario <- Seq("with_duplicates_in_same_file", "fail_with_duplicates_in_same_file"))
    test(s"golden group_and_rank delta load (batch): $scenario") {
      val in = tmpDir(s"gar-$scenario-in")
      val out = tmpDir(s"gar-$scenario-out") + "/data"
      val partitioned = scenario.startsWith("fail")
      arriveAs("group_and_rank", scenario, garFiles(0), in, garFiles(0))
      DataLoader.loadData(spark, garInitAcon(in, out))
      for (f <- garFiles.drop(1)) {
        arriveAs("group_and_rank", scenario, f, in, f)
        DataLoader.loadData(spark, garDeltaAcon(in, out, partitioned))
      }
      if (scenario.startsWith("fail"))
        // order 7 item 1 is cancelled BEFORE created inside one file, so
        // latest-wins keeps `created` while the control expects the
        // cancellation — the reference asserts the divergence
        assertDiffersFromControl(out, "group_and_rank", scenario, "batch.csv")
      else assertMatchesControl(out, "group_and_rank", scenario, "batch.csv")
    }

  /** group_and_rank/streaming_delta.json: one ACON for every run; the
    * condensation chain is re-planned into foreachBatch; with_batch_id
    * stamps the micro-batch id the control encodes (3/4/5 = second
    * iteration batches). */
  private def garStreamingAcon(in: String, out: String, checkpoint: String): String =
    s"""{
       | "input_specs": [${csvInput(in, readType = "streaming")}],
       | "transform_specs": [{"spec_id": "sales_bronze_with_extraction_date", "input_id": "sales_bronze",
       |   "transformers": [
       |     $regexTransformer,
       |     {"function": "with_auto_increment_id"},
       |     $groupAndRankTransformer,
       |     {"function": "repartition", "args": {"num_partitions": 1}}]}],
       | "output_specs": [{"spec_id": "sales_silver", "input_id": "sales_bronze_with_extraction_date",
       |   "write_type": "merge", "data_format": "delta", "location": "$out",
       |   "options": {"checkpointLocation": "$checkpoint"},
       |   "with_batch_id": true,
       |   $garMergeOpts}]
       |}""".stripMargin

  for (scenario <- Seq("with_duplicates_in_same_file", "fail_with_duplicates_in_same_file"))
    test(s"golden group_and_rank delta load (streaming, loaded twice): $scenario") {
      val in = tmpDir(s"gar-s-$scenario-in")
      val base = tmpDir(s"gar-s-$scenario-out")
      val out = base + "/data"
      val checkpoint = base + "/checkpoint"
      // the reference loads the SAME data twice (iteration-suffixed file
      // names); merge >= predicates make the second pass overwrite with
      // fresh batch/row ids instead of duplicating
      for (iteration <- 1 to 2; f <- garFiles) {
        arriveAs("group_and_rank", scenario, f, in, s"$f$iteration")
        DataLoader.loadData(spark, garStreamingAcon(in, out, checkpoint))
      }
      if (scenario.startsWith("fail"))
        assertDiffersFromControl(out, "group_and_rank", scenario, "streaming.csv")
      else assertMatchesControl(out, "group_and_rank", scenario, "streaming.csv")
    }

  // ---- merge_options family ---------------------------------------------

  /** merge_options/batch_init.json: plain OVERWRITE bronze write. */
  private def moInitAcon(in: String, out: String): String =
    s"""{
       | "input_specs": [${csvInput(in)}],
       | "transform_specs": [{"spec_id": "example_transform", "input_id": "sales_bronze",
       |   "transformers": [
       |     {"function": "with_auto_increment_id"},
       |     $regexTransformer]}],
       | "output_specs": [{"spec_id": "example_bronze", "input_id": "example_transform",
       |   "write_type": "overwrite", "data_format": "delta", "location": "$out"}]
       |}""".stripMargin

  private val moMergeOpts = Map(
    "update_all" ->
      """"merge_predicate": "current.salesorder = new.salesorder and current.item = new.item",
        |"update_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on",
        |"delete_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on and new.event = 'deleted'"""".stripMargin,
    "update_column_set" ->
      """"merge_predicate": "current.salesorder = new.salesorder and current.item = new.item",
        |"update_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on",
        |"update_column_set": {"event": "current.event", "lhe_row_id": "new.lhe_row_id + 100"},
        |"delete_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on and new.event = 'deleted'"""".stripMargin,
    "insert_column_set" ->
      """"merge_predicate": "current.salesorder = new.salesorder and current.item = new.item",
        |"insert_predicate": "new.event in ('shipped','cancelled')",
        |"insert_column_set": {"salesorder": "new.salesorder", "item": "new.item",
        |  "event": "new.event", "changed_on": "new.changed_on",
        |  "amount": "new.amount + 101", "lhe_row_id": "new.lhe_row_id",
        |  "extraction_date": "new.extraction_date"},
        |"delete_predicate": "new.extraction_date >= current.extraction_date and new.changed_on >= current.changed_on and new.event = 'deleted'"""".stripMargin)

  /** merge_options/batch_delta.json: regex -> incremental -> id -> merge. */
  private def moDeltaAcon(in: String, out: String, scenario: String): String =
    s"""{
       | "input_specs": [
       |   ${csvInput(in)},
       |   {"spec_id": "example_silver", "read_type": "batch", "data_format": "delta", "location": "$out"}
       | ],
       | "transform_specs": [
       |   {"spec_id": "max_sales_silver_timestamp", "input_id": "example_silver",
       |    "transformers": [{"function": "get_max_value", "args": {"input_col": "extraction_date"}}]},
       |   {"spec_id": "example_transform", "input_id": "sales_bronze",
       |    "transformers": [
       |      $regexTransformer,
       |      {"function": "incremental_filter", "args":
       |        {"input_col": "extraction_date", "increment_df": "max_sales_silver_timestamp"}},
       |      {"function": "with_auto_increment_id"}]}
       | ],
       | "output_specs": [{"spec_id": "example_output", "input_id": "example_transform",
       |   "write_type": "merge", "data_format": "delta", "location": "$out",
       |   "merge_opts": {${moMergeOpts(scenario)}}}]
       |}""".stripMargin

  for (scenario <- Seq("update_all", "update_column_set", "insert_column_set"))
    test(s"golden merge options delta load: $scenario") {
      val in = tmpDir(s"mo-$scenario-in")
      val out = tmpDir(s"mo-$scenario-out") + "/data"
      arriveAs("merge_options", scenario, garFiles(0), in, garFiles(0))
      DataLoader.loadData(spark, moInitAcon(in, out))
      arriveAs("merge_options", scenario, garFiles(1), in, garFiles(1))
      DataLoader.loadData(spark, moDeltaAcon(in, out, scenario))
      assertMatchesControl(out, "merge_options", scenario, "batch.csv")
    }
}
