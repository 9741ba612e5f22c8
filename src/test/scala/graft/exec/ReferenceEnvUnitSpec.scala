package graft.exec

import graft.SparkSpec

/** The reference's environment/session/version unit tests executed
  * verbatim: `tests/unit/test_databricks_utils.py` (serverless usage
  * context), `tests/unit/test_spark_session.py` (get_or_create
  * idempotence) and `tests/unit/test_version.py` (the engine version the
  * usage record carries matches the build's declared version). */
class ReferenceEnvUnitSpec extends SparkSpec {

  test("get_usage_context_for_serverless maps the execution context verbatim") {
    val context = Map(
      "runId" -> "76890",
      "jobId" -> "657890",
      "jobName" -> "sadp-template-dummy_job",
      "workspaceId" -> "213245431",
      "usagePolicyId" -> "4567890")
    val usageStats = EngineUsage.usageContextForServerless(context, "dev")
    assert(usageStats == Map(
      "run_id" -> "76890",
      "job_id" -> "657890",
      "job_name" -> "sadp-template-dummy_job",
      "workspace_id" -> "213245431",
      "policy_id" -> "4567890",
      "dp_name" -> "sadp-template",
      "environment" -> "dev"))
  }

  test("dp_name derivation: last '-' splits, dash-less names pass through") {
    assert(EngineUsage.dpNameFromJobName("sadp-template-my_awesome_job") ==
      "sadp-template")
    assert(EngineUsage.dpNameFromJobName("plainjob") == "plainjob")
    assert(EngineUsage.dpNameFromJobName(null) == null)
  }

  test("a second get_or_create returns the same session object") {
    val oldSession = spark // the suite's live session (ExecEnv.SESSION there)
    val newSession = ExecEnv.getOrCreate()
    assert(oldSession eq newSession,
      s"Sessions pointing to different objects. $newSession vs $oldSession")
  }

  test("engine version matches the build's declared version") {
    val buildVersion = java.nio.file.Files.readString(
      java.nio.file.Paths.get("build.sbt"))
      .linesIterator.find(_.contains("version :="))
      .map(_.split("\"")(1)).getOrElse(sys.error("no version in build.sbt"))
    // the usage record's engine_version carries the library name + the
    // engine's own version line; both must stay in sync with the build
    assert(EngineUsage.EngineVersion.startsWith("graft "))
    assert(EngineUsage.EngineVersion == s"graft $buildVersion",
      s"${EngineUsage.EngineVersion} vs build.sbt $buildVersion")
  }
}
