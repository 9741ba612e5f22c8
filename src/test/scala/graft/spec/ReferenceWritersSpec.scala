package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** The reference's writers feature scenarios executed VERBATIM
  * (`tests/feature/test_writers.py`, acons under
  * `tests/resources/feature/writers/acons`): file, table, console and
  * dataframe sinks across batch / streaming / streaming-foreachBatch,
  * the checkpointed maxFilesPerTrigger dataframe runs, and the
  * multiple-dataframe-outputs chain where one ACON's outputs feed the
  * next. (The jdbc and rest_api writer scenarios are pinned by JdbcSpec
  * and IoSpec against live embedded/fake endpoints.)
  *
  * API note: the reference's load_data returns only the WRITE stage's
  * dataframes keyed by output spec id; this engine returns every stage's
  * dataframe (a strict superset), so the ports assert the output entries
  * rather than the key count. */
class ReferenceWritersSpec extends SparkSpec with ReferenceHarness {

  private val wrRoot = s"$refRoot/writers"
  private def available = new java.io.File(wrRoot).isDirectory

  /** `_prepare_files`: land source csvs (all, or one iteration's),
    * schemas, into the rebased lakehouse IN. */
  private def prepare(tmp: String, iteration: Int = 0): Unit = {
    val in = s"$tmp/in/feature/writers"
    Files.list(Paths.get(s"$wrRoot/source")).forEach { p =>
      val n = p.getFileName.toString
      val want = if (iteration == 0) true else n.endsWith(s"_$iteration.csv")
      if (want) {
        val kind = if (n.startsWith("sales_historical")) "sales_historical" else "sales_new"
        copyIn(p.toString, s"$in/source/$kind")
      }
    }
    Files.list(Paths.get(s"$wrRoot/schema")).forEach(p =>
      copyIn(p.toString, s"$in/schema"))
  }

  private def control(name: String = "writers_control"): DataFrame =
    readControlCsv(s"$wrRoot/control/$name.csv")

  private def run(tmp: String, scenario: String): Map[String, DataFrame] =
    graft.algo.DataLoader.loadData(spark, rebase(s"$wrRoot/acons/$scenario.json", tmp))

  // ---- test_write_to_files ---------------------------------------------

  for (scenario <- Seq("write_batch_files", "write_streaming_files",
      "write_streaming_foreachBatch_files"))
    test(s"reference writers $scenario runs verbatim") {
      assume(available, s"missing $wrRoot")
      val tmp = tmpDir(s"ref-wr-$scenario")
      prepare(tmp)
      run(tmp, scenario)
      assertNoDiffRef(
        spark.read.parquet(s"$tmp/out/feature/writers/$scenario/data"), control())
    }

  // ---- test_write_to_table ---------------------------------------------

  for (scenario <- Seq("write_batch_table", "write_streaming_table",
      "write_streaming_foreachBatch_table"))
    test(s"reference writers $scenario runs verbatim") {
      assume(available, s"missing $wrRoot")
      ensureTestDb()
      spark.sql(s"DROP TABLE IF EXISTS test_db.$scenario")
      val tmp = tmpDir(s"ref-wr-$scenario")
      prepare(tmp)
      run(tmp, scenario)
      assertNoDiffRef(spark.table(s"test_db.$scenario"), control())
    }

  // ---- test_write_to_console -------------------------------------------

  test("reference writers console scenarios run verbatim") {
    assume(available, s"missing $wrRoot")
    for (scenario <- Seq("write_batch_console", "write_streaming_console",
        "write_streaming_foreachBatch_console")) {
      val tmp = tmpDir(s"ref-wr-$scenario")
      prepare(tmp)
      run(tmp, scenario) // the reference asserts captured stdout; here the
      // contract is that the console sink drains the plan without error
    }
  }

  // ---- test_write_to_dataframe -----------------------------------------

  /** A `dataframe`-sink output entry: batch keeps the frame itself;
    * streaming materializes each micro-batch as the
    * `global_temp.lhe_stream_<spec>` view. */
  private def sinkDf(result: Map[String, DataFrame], spec: String): DataFrame = {
    val df = result(spec)
    if (df.isStreaming) spark.table(s"global_temp.lhe_stream_$spec") else df
  }

  for (scenario <- Seq("write_batch_dataframe", "write_streaming_dataframe",
      "write_streaming_foreachBatch_dataframe"))
    test(s"reference writers $scenario returns the united dataframe") {
      assume(available, s"missing $wrRoot")
      val tmp = tmpDir(s"ref-wr-$scenario")
      prepare(tmp)
      val result = run(tmp, scenario)
      assertNoDiffRef(sinkDf(result, "sales"), control())
    }

  // ---- test_write_to_dataframe_checkpoints -----------------------------

  for ((scenario, ctrl) <- Seq(
      "write_streaming_df_with_checkpoint" -> "writers_control_streaming_dataframe_1",
      "write_streaming_foreachBatch_df_with_checkpoint" ->
        "writers_control_streaming_dataframe_foreachBatch_1"))
    test(s"reference writers $scenario honors maxFilesPerTrigger + checkpoint") {
      assume(available, s"missing $wrRoot")
      val tmp = tmpDir(s"ref-wr-$scenario")
      prepare(tmp, iteration = 1)
      val result = run(tmp, scenario)
      assertNoDiffRef(sinkDf(result, "sales"), control(ctrl))
    }

  // ---- test_multiple_write_to_dataframe --------------------------------

  test("reference writers write_streaming_multiple_dfs chains into a second acon") {
    assume(available, s"missing $wrRoot")
    val tmp = tmpDir("ref-wr-multi")
    prepare(tmp)
    val first = run(tmp, "write_streaming_multiple_dfs")
    val hist = sinkDf(first, "sales_historical")
    val nw = sinkDf(first, "sales_new")
    // `_generate_acon_from_source`: the outputs become df_name inputs of
    // a follow-up union acon
    val acon =
      """{
        | "input_specs": [
        |   {"spec_id": "sales_historical", "read_type": "batch", "data_format": "dataframe", "df_name": "hist"},
        |   {"spec_id": "sales_new", "read_type": "batch", "data_format": "dataframe", "df_name": "nw"}
        | ],
        | "transform_specs": [{
        |   "spec_id": "union_dataframes", "input_id": "sales_historical",
        |   "transformers": [{"function": "union", "args": {"union_with": ["sales_new"]}}]
        | }],
        | "output_specs": [{"spec_id": "sales", "input_id": "union_dataframes", "data_format": "dataframe"}]
        |}""".stripMargin
    val second = graft.algo.DataLoader.loadData(spark, acon,
      dfs = Map("hist" -> hist, "nw" -> nw))
    assertNoDiffRef(second("sales"), control())
  }
}
