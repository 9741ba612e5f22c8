package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's delta_load feature scenarios executed VERBATIM — its
  * actual ACON JSONs (rebased), its actual source fixtures, in the exact
  * copy/run choreography of the `tests/feature/delta_load` drivers, compared
  * against its actual control data. The vendored-fixture ports
  * (DeltaLoadGoldenSpec, RankMergeGoldenSpec) pin the same semantics with
  * reconstructed ACONs; this spec additionally pins the CONFIG surface —
  * any drift between what those reconstructions assume and what the
  * reference's real JSONs say fails here. */
class ReferenceDeltaLoadSpec extends SparkSpec with ReferenceHarness {

  private val cdcRoot = s"$refRoot/delta_load/record_mode_cdc"
  private val cdcAvailable = new java.io.File(cdcRoot).isDirectory

  /** The reference's `_create_table`
    * (`test_delta_load_record_mode_cdc.py:273-300`): every scenario
    * pre-creates an EMPTY Delta table with this 13-column schema at the
    * OUT location, and the init merge adopts the table's types (the
    * inputs read with inferSchema — part-01's all-numeric `request`
    * column would otherwise freeze the target column as INT and the
    * delta load's 'request1' would fail the ANSI store-assignment cast).
    * The parquet-fallback analogue: an empty parquet dataset with the
    * declared schema. */
  private def createCdcTable(loc: String): Unit =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "extraction_timestamp string, actrequest_timestamp string, request string, " +
          "datapakid int, partno int, record int, salesorder int, item int, " +
          "recordmode string, date int, customer string, article string, amount int"))
      .write.mode("overwrite").parquet(loc)

  // ---- record_mode_cdc: batch scenarios (test_batch_delta_load) --------

  for ((scenario, fmt) <- Seq(
      "with_deletes_additional_columns" -> "csv",
      "with_duplicates" -> "csv",
      "with_upserts_only_removed_columns" -> "json"))
    test(s"reference delta_load/record_mode_cdc/$scenario actual JSONs run verbatim") {
      assume(cdcAvailable, s"missing $cdcRoot")
      val res = s"$cdcRoot/$scenario"
      val tmp = tmpDir(s"ref-cdc-$scenario")
      val inDir = s"$tmp/in/feature/delta_load/record_mode_cdc/$scenario/data"
      createCdcTable(s"$tmp/out/feature/delta_load/record_mode_cdc/$scenario/data")
      copyIn(s"$res/data/source/part-01.$fmt", inDir)
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
      Seq("part-02", "part-03", "part-04").foreach(p =>
        copyIn(s"$res/data/source/$p.$fmt", inDir))
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_delta.json", tmp))
      assertMatchesControlCsv(
        s"$tmp/out/feature/delta_load/record_mode_cdc/$scenario/data",
        s"$res/data/control/part-01.csv")
    }

  // ---- record_mode_cdc: file-by-file (test_file_by_file) ---------------

  for (scenario <- Seq("late_arriving_changes", "out_of_order_changes");
       mode <- Seq("batch", "streaming"))
    test(s"reference delta_load/record_mode_cdc/$scenario/$mode file-by-file JSONs run verbatim") {
      assume(cdcAvailable, s"missing $cdcRoot")
      val res = s"$cdcRoot/$scenario"
      val tmp = tmpDir(s"ref-cdc-fbf-$scenario-$mode")
      val inDir = s"$tmp/in/feature/delta_load/record_mode_cdc/$scenario/$mode/data"
      createCdcTable(s"$tmp/out/feature/delta_load/record_mode_cdc/$scenario/$mode/data")
      val initAcon =
        if (mode == "batch") s"$res/batch_init.json" else s"$res/streaming_delta.json"
      val deltaAcon =
        if (mode == "batch") s"$res/batch_delta.json" else s"$res/streaming_delta.json"
      copyIn(s"$res/data/source/part-01.csv", inDir)
      graft.algo.DataLoader.loadData(spark, rebase(initAcon, tmp))
      val (second, third) =
        if (scenario == "out_of_order_changes") ("part-03", "part-02")
        else ("part-02", "part-03")
      Seq(second, third, "part-04").foreach { p =>
        copyIn(s"$res/data/source/$p.csv", inDir)
        graft.algo.DataLoader.loadData(spark, rebase(deltaAcon, tmp))
      }
      assertMatchesControlCsv(
        s"$tmp/out/feature/delta_load/record_mode_cdc/$scenario/$mode/data",
        s"$res/data/control/part-01.csv")
    }

  // ---- record_mode_cdc: backfill (test_backfill) -----------------------

  test("reference delta_load/record_mode_cdc/backfill actual JSONs run verbatim") {
    assume(cdcAvailable, s"missing $cdcRoot")
    val res = s"$cdcRoot/backfill"
    val tmp = tmpDir("ref-cdc-backfill")
    val inDir = s"$tmp/in/feature/delta_load/record_mode_cdc/backfill/data"
    createCdcTable(s"$tmp/out/feature/delta_load/record_mode_cdc/backfill/data")
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    Seq("part-02", "part-03", "part-04").foreach(p =>
      copyIn(s"$res/data/source/$p.csv", inDir))
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_delta.json", tmp))
    // the reference deletes the delta files and lands the backfill file
    // (part-05 re-states 02..04's keys with amount*10)
    Seq("part-02", "part-03", "part-04").foreach(p =>
      Files.deleteIfExists(Paths.get(inDir, s"$p.csv")))
    copyIn(s"$res/data/source/part-05.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_backfill.json", tmp))
    assertMatchesControlCsv(
      s"$tmp/out/feature/delta_load/record_mode_cdc/backfill/data",
      s"$res/data/control/part-01.csv")
  }

  // ---- record_mode_cdc: direct_silver_load -----------------------------

  test("reference delta_load/record_mode_cdc/direct_silver_load actual JSONs run verbatim") {
    assume(cdcAvailable, s"missing $cdcRoot")
    val res = s"$cdcRoot/direct_silver_load"
    val tmp = tmpDir("ref-cdc-silver")
    val inDir = s"$tmp/in/feature/delta_load/record_mode_cdc/direct_silver_load/data"
    createCdcTable(s"$tmp/out/feature/delta_load/record_mode_cdc/direct_silver_load/bronze/data")
    createCdcTable(s"$tmp/out/feature/delta_load/record_mode_cdc/direct_silver_load/silver/data")
    copyIn(s"$res/data/source/part-01.csv", inDir)
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    Seq("part-02", "part-03", "part-04").foreach(p =>
      copyIn(s"$res/data/source/$p.csv", inDir))
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_delta.json", tmp))
    val out = s"$tmp/out/feature/delta_load/record_mode_cdc/direct_silver_load"
    assertMatchesControlCsv(s"$out/bronze/data", s"$res/data/control/part-01.csv")
    assertMatchesControlCsv(s"$out/silver/data", s"$res/data/control/part-02.csv")
  }

  // ---- group_and_rank (test_delta_load_group_and_rank) -----------------

  private val garRoot = s"$refRoot/delta_load/group_and_rank"
  private val garFile = "WE_SO_SCL_202108111400000000.csv"
  private val garFiles =
    Seq("WE_SO_SCL_202108111400000000.csv", "WE_SO_SCL_202108111500000000.csv",
      "WE_SO_SCL_202108111600000000.csv")

  private def garLoads(scenario: String, mode: String, tmp: String, iteration: Int): Unit = {
    val res = s"$garRoot/$scenario"
    val inBase = s"$tmp/in/feature/delta_load/group_and_rank/$scenario/$mode"
    // the reference copies every *schema.json into the IN scenario root
    Seq("source_schema.json", s"control_${mode}_schema.json").foreach(f =>
      copyIn(s"$res/$f", inBase))
    val initAcon =
      if (mode == "batch") s"$res/batch_init.json" else s"$res/streaming_delta.json"
    val deltaAcon =
      if (mode == "batch") s"$res/batch_delta.json" else s"$res/streaming_delta.json"
    // arriving copies are suffixed with the iteration (`.csv1`, `.csv2`)
    copyInAs(s"$res/data/source/${garFiles(0)}", s"$inBase/data",
      s"${garFiles(0)}$iteration")
    graft.algo.DataLoader.loadData(spark, rebase(initAcon, tmp))
    copyInAs(s"$res/data/source/${garFiles(1)}", s"$inBase/data",
      s"${garFiles(1)}$iteration")
    graft.algo.DataLoader.loadData(spark, rebase(deltaAcon, tmp))
    copyInAs(s"$res/data/source/${garFiles(2)}", s"$inBase/data",
      s"${garFiles(2)}$iteration")
    graft.algo.DataLoader.loadData(spark, rebase(deltaAcon, tmp))
  }

  for (scenario <- Seq("with_duplicates_in_same_file", "fail_with_duplicates_in_same_file");
       mode <- Seq("batch", "streaming"))
    test(s"reference delta_load/group_and_rank/$scenario/$mode actual JSONs run verbatim") {
      assume(new java.io.File(garRoot).isDirectory, s"missing $garRoot")
      val res = s"$garRoot/$scenario"
      val tmp = tmpDir(s"ref-gar-$scenario-$mode")
      garLoads(scenario, mode, tmp, 1)
      if (mode == "streaming") garLoads(scenario, mode, tmp, 2) // same data twice
      val result = spark.read.parquet(
        s"$tmp/out/feature/delta_load/group_and_rank/$scenario/$mode/data")
      val control = readControlCsv(s"$res/data/control/$mode.csv",
        Some(Files.readString(Paths.get(res, s"control_${mode}_schema.json"))))
      if (scenario == "fail_with_duplicates_in_same_file")
        // the reference's deliberate NEGATIVE: order 7 item 1 cancels
        // before creation inside one file; the load must DIVERGE
        assert(hasDiffRef(result, control), "expected a diff, got none")
      else assertNoDiffRef(result, control)
    }

  // ---- merge_options (test_delta_load_merge_options) -------------------

  private val moRoot = s"$refRoot/delta_load/merge_options"

  for (scenario <- Seq("update_column_set", "insert_column_set", "update_all"))
    test(s"reference delta_load/merge_options/$scenario actual JSONs run verbatim") {
      assume(new java.io.File(moRoot).isDirectory, s"missing $moRoot")
      val res = s"$moRoot/$scenario"
      val tmp = tmpDir(s"ref-mo-$scenario")
      val inBase = s"$tmp/in/feature/delta_load/merge_options/$scenario"
      // schema files live at the FAMILY root and are copied per scenario
      Seq("source_schema.json", "control_batch_schema.json").foreach(f =>
        copyIn(s"$moRoot/$f", inBase))
      copyIn(s"$res/data/source/${garFiles(0)}", s"$inBase/data")
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
      copyIn(s"$res/data/source/${garFiles(1)}", s"$inBase/data")
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_delta.json", tmp))
      val result = spark.read.parquet(
        s"$tmp/out/feature/delta_load/merge_options/$scenario/data")
      val control = readControlCsv(s"$res/data/control/batch.csv",
        Some(Files.readString(Paths.get(moRoot, "control_batch_schema.json"))))
      assertNoDiffRef(result, control)
    }
}
