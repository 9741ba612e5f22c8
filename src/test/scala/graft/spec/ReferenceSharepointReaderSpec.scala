package graft.spec

import graft.SparkSpec
import graft.io.SharepointIo
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference's sharepoint reader feature scenarios executed verbatim
  * (`tests/feature/test_sharepoint_reader.py` with its actual ACON JSONs
  * under `tests/resources/feature/sharepoint/reader/acons`): the Graph
  * transport is mocked there (SharepointUtils patches) and here (a
  * LocalDriveTransport registered under the acons' site:drive), the
  * data fixtures and expected rows/messages are the reference's own. */
class ReferenceSharepointReaderSpec extends SparkSpec with ReferenceHarness {

  private val spRoot = s"$refRoot/sharepoint/reader"
  private val available = new java.io.File(s"$spRoot/acons").isDirectory

  private def stageDrive(tmp: String, files: Seq[String],
      extra: Map[String, Array[Byte]] = Map.empty): SharepointIo.LocalDriveTransport = {
    val drive = s"$tmp/drive"
    Files.createDirectories(Paths.get(drive, "sp_test"))
    files.foreach(f => Files.copy(Paths.get(s"$spRoot/data/$f"),
      Paths.get(drive, "sp_test", f), StandardCopyOption.REPLACE_EXISTING))
    extra.foreach { case (name, bytes) =>
      Files.write(Paths.get(drive, "sp_test", name), bytes) }
    val t = new SharepointIo.LocalDriveTransport(drive)
    SharepointIo.register("mock_site:mock_drive", t)
    t
  }

  private def run(tmp: String, scenario: String): Unit =
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$spRoot/acons/$scenario.json", tmp))

  private def output(tmp: String, sub: String) =
    spark.read.parquet(s"$tmp/out/feature/sharepoint/reader/$sub")

  override def beforeAll(): Unit = { super.beforeAll(); ensureTestDb() }

  // ---- success scenarios ------------------------------------------------

  private val folderFiles =
    Seq("sample_1.csv", "sample_2.csv", "other.csv")

  test("read_single_csv_success") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-single")
    val t = stageDrive(tmp, folderFiles,
      Map("ignore.txt" -> "not,a,csv\n".getBytes))
    run(tmp, "read_single_csv_success")
    val df = output(tmp, "delta")
    assert(df.columns.toSeq == Seq("col_a", "col_b"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)))
    // archive_enabled false: nothing moved
    assert(t.list("sp_test").contains("sample_1.csv"))
  }

  test("read_single_csv_full_path_success") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-full")
    stageDrive(tmp, folderFiles)
    run(tmp, "read_single_csv_full_path_success")
    assert(output(tmp, "delta_full_path").count() == 1)
  }

  test("read_folder_csv_success: csv-only listing, three files combined") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-folder")
    stageDrive(tmp, folderFiles, Map("ignore.txt" -> "x".getBytes))
    run(tmp, "read_folder_csv_success")
    val rows = output(tmp, "delta_folder").orderBy("col_a")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 2), (3, 4), (999, 999)))
  }

  test("read_folder_csv_pattern_success: glob narrows to the sample files") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-pattern")
    stageDrive(tmp, folderFiles)
    run(tmp, "read_folder_csv_pattern_success")
    val rows = output(tmp, "delta_folder_pattern").orderBy("col_a")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 2), (3, 4)))
  }

  test("read_single_csv_archive_enabled_success: file moves to done/") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-arch1")
    val t = stageDrive(tmp, folderFiles)
    run(tmp, "read_single_csv_archive_enabled_success")
    assert(t.list("sp_test/done") == Seq("sample_1.csv"))
    assert(!t.list("sp_test").contains("sample_1.csv"))
  }

  test("read_folder_csv_archive_enabled_success: all three move to done/") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-arch2")
    val t = stageDrive(tmp, folderFiles)
    run(tmp, "read_folder_csv_archive_enabled_success")
    assert(t.list("sp_test/done").sorted ==
      Seq("other.csv", "sample_1.csv", "sample_2.csv"))
  }

  test("read_single_csv_archive_default_enabled_success: archiving is the DEFAULT") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-arch3")
    val t = stageDrive(tmp, folderFiles)
    run(tmp, "read_single_csv_archive_default_enabled_success")
    assert(t.list("sp_test/done") == Seq("sample_1.csv"))
  }

  test("read_single_csv_archive_success_subfolder_override_success: processed/") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-arch4")
    val t = stageDrive(tmp, folderFiles)
    run(tmp, "read_single_csv_archive_success_subfolder_override_success")
    assert(t.list("sp_test/processed") == Seq("sample_1.csv"))
  }

  test("read_folder_csv_archive_success_subfolder_override_success: processed/") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-arch5")
    val t = stageDrive(tmp, folderFiles)
    run(tmp, "read_folder_csv_archive_success_subfolder_override_success")
    assert(t.list("sp_test/processed").sorted ==
      Seq("other.csv", "sample_1.csv", "sample_2.csv"))
  }

  // ---- failure scenarios ------------------------------------------------

  test("read_folder_csv_one_file_schema_mismatch_should_archive_error") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-mismatch")
    val t = stageDrive(tmp, Seq("sample_1.csv", "bad_schema.csv"))
    val e = intercept[Exception](
      run(tmp, "read_folder_csv_one_file_schema_mismatch_should_archive_error"))
    assert(e.getMessage.contains("Schema mismatch"))
    val archived = t.list("sp_test/error")
    assert(archived.nonEmpty &&
      archived.forall(Set("sample_1.csv", "bad_schema.csv")), archived)
  }

  test("read_folder_csv_one_file_schema_mismatch_custom_error_subfolder") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-mismatch2")
    val t = stageDrive(tmp, Seq("sample_1.csv", "bad_schema.csv"))
    val e = intercept[Exception](run(tmp,
      "read_folder_csv_one_file_schema_mismatch_custom_error_subfolder_should_archive_error"))
    assert(e.getMessage.contains("Schema mismatch"))
    assert(t.list("sp_test/failed").nonEmpty)
  }

  test("read_single_csv_empty_file_should_archive_error") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-empty")
    val t = stageDrive(tmp, Seq.empty, Map("empty.csv" -> Array.empty[Byte]))
    val e = intercept[Exception](
      run(tmp, "read_single_csv_empty_file_should_archive_error"))
    assert(e.getMessage.contains("is empty"))
    assert(t.list("sp_test/error") == Seq("empty.csv"))
  }

  test("read_folder_csv_no_csv_files_should_fail: no archive attempts") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-nocsv")
    val t = stageDrive(tmp, Seq.empty, Map("ignore.txt" -> "x".getBytes))
    val e = intercept[Exception](run(tmp, "read_folder_csv_no_csv_files_should_fail"))
    assert(e.getMessage.contains("No CSV files found in folder: sp_test"))
    assert(t.list("sp_test/error").isEmpty && t.list("sp_test/done").isEmpty)
  }

  test("read_folder_csv_pattern_matches_no_files_should_fail") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-nopat")
    val t = stageDrive(tmp, folderFiles)
    val e = intercept[Exception](
      run(tmp, "read_folder_csv_pattern_matches_no_files_should_fail"))
    assert(e.getMessage.contains("No CSV files found in folder: sp_test"))
    assert(t.list("sp_test/error").isEmpty)
  }

  test("read_single_csv_download_error_should_archive_error") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-sp-dl")
    val inner = stageDrive(tmp, folderFiles)
    // a transport whose download always fails, like the driver's mock
    SharepointIo.register("mock_site:mock_drive", new SharepointIo.SharepointTransport {
      def exists(path: String) = inner.exists(path)
      def list(folder: String) = inner.list(folder)
      def download(path: String) = throw new RuntimeException("Download failed")
      def upload(path: String, data: Array[Byte], cb: String) = inner.upload(path, data, cb)
      def move(path: String, toFolder: String) = inner.move(path, toFolder)
    })
    val e = intercept[Exception](
      run(tmp, "read_single_csv_download_error_should_archive_error"))
    assert(e.getMessage.contains("Download failed"))
    assert(inner.list("sp_test/error") == Seq("sample_1.csv"))
  }

  test("spark load failure wraps as the reference's read error and archives") {
    assume(available, s"missing $spRoot")
    // the driver patches Spark's load to raise; here a FAILFAST read of a
    // malformed csv exercises the same wrap-and-archive contract
    val tmp = tmpDir("ref-sp-loadfail")
    val t = stageDrive(tmp, Seq.empty,
      Map("sample_1.csv" -> "col_a,col_b\n\"unclosed,1\n2,3\n".getBytes))
    val e = intercept[Exception] {
      SharepointIo.read(spark, Map(
        "transport" -> "mock_site:mock_drive",
        "folder_relative_path" -> "sp_test", "file_name" -> "sample_1.csv",
        "file_type" -> "csv", "header" -> "true", "inferSchema" -> "true",
        "mode" -> "FAILFAST", "multiLine" -> "true",
        "archive_enabled" -> "true"))
    }
    assert(e.getMessage.contains(
      "Failed to read Sharepoint file: 'sp_test/sample_1.csv'."), e.getMessage)
    assert(t.list("sp_test/error") == Seq("sample_1.csv"))
  }

  // ---- exception scenarios (option validation messages) ------------------

  private val exceptionScenarios = Seq(
    "read_single_csv_full_path_with_file_name_should_fail" ->
      "When `folder_relative_path` points to a file, `file_name` must be None.",
    "read_folder_path_does_not_exist_should_fail" ->
      "Folder 'missing_folder' does not exist in Sharepoint.",
    "read_file_name_and_file_pattern_conflict_should_fail" ->
      "Conflicting options: provide either `file_name` or `file_pattern`, not both.",
    "read_file_name_unsupported_extension_should_fail" ->
      "`file_name` must end with one of ['.csv', '.xlsx']",
    "read_folder_relative_path_looks_like_file_unsupported_extension_should_fail" ->
      ("`folder_relative_path` appears to be a file path but does not end " +
        "with one of ['.csv', '.xlsx']: sp_test/bad.txt"),
    "read_unsupported_file_type_should_fail" ->
      "`file_type` must be one of ['csv', 'xlsx']. Got: 'json'",
    "read_single_csv_full_path_with_file_pattern_should_fail" ->
      "When `folder_relative_path` points to a file, `file_pattern` must be None.",
    "read_single_csv_full_path_with_file_type_should_fail" ->
      "When `folder_relative_path` points to a file, `file_type` must be None")

  for ((scenario, expected) <- exceptionScenarios)
    test(s"$scenario raises the reference's message") {
      assume(available, s"missing $spRoot")
      val tmp = tmpDir(s"ref-sp-exc-${scenario.hashCode.toHexString}")
      stageDrive(tmp, folderFiles)
      val e = intercept[Exception](run(tmp, scenario))
      assert(e.getMessage.contains(expected),
        s"\ngot: ${e.getMessage}\nwant: $expected")
    }
}
