package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** The reference's custom-config unit test executed verbatim
  * (`tests/unit/test_custom_configs.py` over
  * `core/exec_env.py:22-55` `set_default_engine_config`): overrides via
  * a dict, via a flat YAML file (the reference's own fixture), and a
  * reset back to the package defaults. */
class ReferenceCustomConfigsSpec extends AnyFunSuite {

  private val fixture =
    "/root/reference/tests/resources/unit/custom_configs/custom_engine_config.yaml"

  test("custom configs: dict, file, then package reset") {
    val defaults = EngineConfig.get.notifDisallowedEmailServers
    try {
      // dictionary override
      EngineConfig.setDefaultEngineConfig(
        Map("notif_disallowed_email_servers" -> Seq("dummy.server.test")))
      val dictConfigs = EngineConfig.get.notifDisallowedEmailServers
      assert(dictConfigs == Seq("dummy.server.test"))
      assert(defaults != dictConfigs)

      // file override (the reference's own yaml fixture)
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
      EngineConfig.setDefaultEngineConfigFromFile(fixture)
      val fileConfigs = EngineConfig.get.notifDisallowedEmailServers
      assert(fileConfigs == Seq("dummy.file.server"))
      assert(defaults != fileConfigs)

      // reset to the package defaults
      EngineConfig.resetToPackageDefaults()
      assert(EngineConfig.get.notifDisallowedEmailServers == defaults)
    } finally EngineConfig.resetToPackageDefaults()
  }

  test("defaults mirror the reference's packaged engine.yaml") {
    val c = EngineConfig.get
    assert(c.dqBucket.contains("s3://sample-dq-bucket"))
    assert(c.dqFunctionsColumnList == Seq("dq_rule_id", "execution_point",
      "filters", "schema", "table", "column", "dimension"))
    assert(c.notifDisallowedEmailServers == Seq("sample.blocked.email_server"))
    assert(!c.raiseOnConfigNotAvailable)
    assert(c.environment == "prod")
  }

  test("unknown config field rejects, like dataclasses.replace") {
    intercept[IllegalArgumentException] {
      EngineConfig.setDefaultEngineConfig(Map("nope" -> 1))
    }
  }

  test("flat yaml parser: scalars, lists, comments") {
    val m = EngineConfig.parseFlatYaml(
      """# comment
        |a: x
        |lst:
        |  - one
        |  - two
        |b: 3
        |""".stripMargin)
    assert(m == Map("a" -> "x", "lst" -> Seq("one", "two"), "b" -> "3"))
  }
}
