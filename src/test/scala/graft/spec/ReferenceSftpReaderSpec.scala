package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference's sftp_reader feature scenarios executed verbatim
  * (`tests/feature/test_sftp_reader.py` over its `data/` fixtures): the
  * remote layout mirrors the driver's `remote_location` fixture (every
  * file at the top level, file7.zip under `sub_dir/`), each scenario's
  * exact option set (date filters, earliest_file, file_name_contains,
  * sub_dir, gz/zip compression, pandas-style `args`), results compared
  * against the fixtures the driver itself uses as controls. */
class ReferenceSftpReaderSpec extends SparkSpec with ReferenceHarness {

  private val res = s"$refRoot/sftp_reader/data"
  private val available = new java.io.File(res).isDirectory

  /** Build the remote_location layout of the driver's fixture. */
  private def stageRemote(tmp: String): String = {
    val remote = s"$tmp/remote_location"
    Files.createDirectories(Paths.get(remote, "sub_dir"))
    val files = new java.io.File(res).listFiles().map(_.getName)
    files.foreach { f =>
      val dest =
        if (f.endsWith(".zip")) Paths.get(remote, "sub_dir", f)
        else Paths.get(remote, f)
      Files.copy(Paths.get(res, f), dest, StandardCopyOption.REPLACE_EXISTING)
    }
    remote
  }

  private def acon(tmp: String, remote: String, scenarioName: String,
      testName: String, filesFormat: String, options: String): String =
    s"""{
       |  "input_specs": [{
       |    "spec_id": "sftp_source", "read_type": "batch", "data_format": "sftp",
       |    "sftp_files_format": "$filesFormat",
       |    "location": "$remote",
       |    "options": {$options}
       |  }],
       |  "output_specs": [{
       |    "spec_id": "sftp_bronze", "input_id": "sftp_source",
       |    "write_type": "overwrite", "data_format": "csv",
       |    "options": {"header": true, "delimiter": "|", "inferSchema": true},
       |    "location": "file://$tmp/out/$scenarioName/$testName/data"
       |  }]
       |}""".stripMargin

  private def result(tmp: String, scenarioName: String, testName: String) =
    spark.read.options(Map("header" -> "true", "delimiter" -> "|",
      "inferSchema" -> "true")).csv(s"$tmp/out/$scenarioName/$testName/data")

  test("sftp_csv between_dates runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-csv")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_csv",
      "between_dates", "csv",
      """"date_time_gt": "2022-01-01", "date_time_lt": "9999-12-31",
        |"file_name_contains": "e.csv", "args": {"sep": "|"}""".stripMargin))
    assertNoDiffRef(result(tmp, "sftp_csv", "between_dates"),
      spark.read.options(Map("header" -> "true", "delimiter" -> "|",
        "inferSchema" -> "true")).csv(s"$res/file.csv"))
  }

  test("sftp_csv between_dates_fail raises the reference's message") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-csvf")
    val remote = stageRemote(tmp)
    val e = intercept[Exception] {
      graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_csv",
        "between_dates_fail", "csv",
        """"date_time_gt": "2022-01-01", "date_time_lt": "2021-01-01",
          |"file_name_contains": "e.csv", "args": {"sep": "|"}""".stripMargin))
    }
    assert(e.getMessage.contains("No files were found with the specified parameters."))
  }

  test("sftp_fwf earliest_file runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-fwf")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_fwf",
      "earliest_file", "fwf",
      """"earliest_file": true, "file_name_contains": ".txt",
        |"args": {"index_col": false, "names": ["value"]}""".stripMargin))
    assertNoDiffRef(result(tmp, "sftp_fwf", "earliest_file"),
      spark.read.format("text").option("lineSep", "\n").load(s"$res/file5.txt"))
  }

  test("sftp_gz_file compressed gz runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-gz")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_gz_file",
      "compressed_gz_file", "csv",
      """"file_name_contains": "file6", "args": {"sep": "|"}"""))
    assertNoDiffRef(result(tmp, "sftp_gz_file", "compressed_gz_file"),
      spark.read.options(Map("header" -> "true", "delimiter" -> "|",
        "inferSchema" -> "true")).csv(s"$res/file6.compress.gz"))
  }

  test("sftp_json greater_than runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-json")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_json",
      "greater_than", "json",
      """"date_time_gt": "2022-01-01", "file_name_contains": ".json",
        |"args": {"lines": true, "orient": "columns"}""".stripMargin))
    assertNoDiffRef(result(tmp, "sftp_json", "greater_than"),
      spark.read.json(s"$res/file3.json"))
  }

  test("sftp_mult_files file_name_contains runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-mult")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_mult_files",
      "file_name_contains", "csv",
      """"file_name_contains": ".csv", "args": {"sep": "|"}"""))
    assertNoDiffRef(result(tmp, "sftp_mult_files", "file_name_contains"),
      spark.read.options(Map("header" -> "true", "delimiter" -> "|",
        "inferSchema" -> "true")).csv(s"$res/file.csv", s"$res/file1.csv",
        s"$res/file2.csv"))
  }

  test("sftp_xml lower_than runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-xml")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_xml",
      "lower_than", "xml",
      """"date_time_lt": "9999-12-31", "file_name_contains": ".xml""""))
    assertNoDiffRef(result(tmp, "sftp_xml", "lower_than"),
      spark.read.format("xml").option("rowTag", "row").load(s"$res/file4.xml"))
  }

  test("sftp_xml lower_than_fails raises the reference's message") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-xmlf")
    val remote = stageRemote(tmp)
    val e = intercept[Exception] {
      graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_xml",
        "lower_than_fails", "xml",
        """"date_time_lt": "2022-01-01", "file_name_contains": ".xml""""))
    }
    assert(e.getMessage.contains("No files were found with the specified parameters."))
  }

  test("sftp_zip_file sub_dir compressed zip runs verbatim") {
    assume(available, s"missing $res")
    val tmp = tmpDir("ref-sftp-zip")
    val remote = stageRemote(tmp)
    graft.algo.DataLoader.loadData(spark, acon(tmp, remote, "sftp_zip_file",
      "compressed_zip_file", "csv",
      """"sub_dir": true, "file_name_contains": "file7", "args": {"sep": "|"}"""))
    // control: the zip's member csv (the driver reads it through ZipFile)
    val zf = new java.util.zip.ZipFile(s"$res/file7.zip")
    val member = {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala.find(e => !e.isDirectory &&
        !e.getName.startsWith("__MACOSX/") &&
        !e.getName.split("/").last.startsWith("._")).get
    }
    val extracted = Files.createTempFile("ref-sftp-zip-ctl", ".csv")
    try {
      val in = zf.getInputStream(member)
      try Files.copy(in, extracted, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    } finally zf.close()
    assertNoDiffRef(result(tmp, "sftp_zip_file", "compressed_zip_file"),
      spark.read.options(Map("header" -> "true", "delimiter" -> "|",
        "inferSchema" -> "true")).csv(extracted.toString))
  }
}
