package graft.spec

import graft.SparkSpec
import graft.io.SharepointIo
import java.nio.file.{Files, Paths}

/** The reference's sharepoint writer feature scenarios executed verbatim
  * (`tests/feature/test_sharepoint_writer.py` with its actual ACONs under
  * `tests/resources/feature/sharepoint/{exceptions,writer}/acons`):
  * streaming rejection, mandatory-option validation (the CODE's
  * `validate_for_writer` message — the reference test file pins a stale
  * multi-line string its own code no longer raises), missing endpoint,
  * and the local-stage → upload → delete-local choreography. */
class ReferenceSharepointWriterSpec extends SparkSpec with ReferenceHarness {

  private val spRoot = s"$refRoot/sharepoint"
  private val available = new java.io.File(s"$spRoot/exceptions/acons").isDirectory

  private def stageInput(tmp: String): Unit = {
    Files.createDirectories(Paths.get(s"$tmp/in/feature/sharepoint/data"))
    Files.copy(
      Paths.get(s"$spRoot/writer/data/file_source.csv"),
      Paths.get(s"$tmp/in/feature/sharepoint/data/file_source.csv"))
  }

  private def registerDrive(tmp: String,
      endpointExists: Boolean = true): SharepointIo.LocalDriveTransport = {
    val drive = s"$tmp/drive"
    Files.createDirectories(Paths.get(drive, "sp_test"))
    val inner = new SharepointIo.LocalDriveTransport(drive)
    val t =
      if (endpointExists) inner
      else new SharepointIo.SharepointTransport {
        def exists(path: String) = false
        def list(folder: String) = inner.list(folder)
        def download(path: String) = inner.download(path)
        def upload(path: String, data: Array[Byte], cb: String) =
          inner.upload(path, data, cb)
        def move(path: String, toFolder: String) = inner.move(path, toFolder)
      }
    SharepointIo.register("mock_site:mock_drive", inner)
    SharepointIo.register("mock_site:mock_drive", t)
    inner
  }

  private def run(tmp: String, family: String, scenario: String): Unit =
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$spRoot/$family/acons/$scenario.json", tmp))

  test("streaming_exception: the writer rejects streaming input") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-spw-stream")
    stageInput(tmp); registerDrive(tmp)
    val e = intercept[Exception](run(tmp, "exceptions", "streaming_exception"))
    assert(e.getMessage.contains("Sharepoint writer doesn't support streaming!"),
      e.getMessage)
  }

  for ((scenario, missing) <- Seq(
      "drive_exception" -> "drive_name",
      "site_exception" -> "site_name",
      "local_path_exception" -> "local_path"))
    test(s"$scenario: mandatory option validation names the missing field") {
      assume(available, s"missing $spRoot")
      val tmp = tmpDir(s"ref-spw-$scenario")
      stageInput(tmp); registerDrive(tmp)
      val e = intercept[Exception](run(tmp, "exceptions", scenario))
      assert(e.getMessage.contains(
        s"Missing required Sharepoint options for writer: $missing"), e.getMessage)
    }

  test("endpoint_exception: missing endpoint raises the reference's message") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-spw-endpoint")
    stageInput(tmp); registerDrive(tmp, endpointExists = false)
    val e = intercept[Exception](run(tmp, "exceptions", "endpoint_exception"))
    assert(e.getMessage.contains("The provided endpoint does not exist!"),
      e.getMessage)
  }

  test("write_to_local_success: stage locally, upload, delete the local folder") {
    assume(available, s"missing $spRoot")
    val tmp = tmpDir("ref-spw-ok")
    Files.createDirectories(Paths.get(s"$tmp/in/feature/sharepoint/data"))
    Files.copy(
      Paths.get(s"$spRoot/writer/data/file_source.csv"),
      Paths.get(s"$tmp/in/feature/sharepoint/data/file_source.csv"))
    val drive = registerDrive(tmp)
    run(tmp, "writer", "write_to_local_success")
    // the upload landed under the acon's folder/file_name
    assert(drive.exists("sp_test/sharepoint_test"))
    // source row count survives the trip (written csv, default options)
    val uploaded = new String(
      drive.download("sp_test/sharepoint_test").readAllBytes())
    val sourceRows = Files.readAllLines(
      Paths.get(s"$spRoot/writer/data/file_source.csv")).size - 1
    assert(uploaded.linesIterator.count(_.nonEmpty) >= sourceRows)
    // `delete_local_path`: the staging folder exists and is EMPTY
    val localPath = Paths.get(s"$tmp/out/feature/sharepoint/writer/data")
    assert(Files.isDirectory(localPath))
    val s = Files.list(localPath)
    try assert(!s.iterator().hasNext, "local_path not emptied")
    finally s.close()
  }
}
