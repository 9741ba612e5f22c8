package graft.exec

/** Engine-level configuration (reference `core/definitions.py:39-97`
  * EngineConfig + `core/exec_env.py:22-55` `set_default_engine_config` +
  * `utils/configs/config_utils.py` — the packaged `configs/engine.yaml`).
  *
  * The defaults mirror the reference's sample engine.yaml; deployments
  * override them with a dict, a flat YAML file, or a reset to the
  * package defaults — the reference's three override modes, pinned by
  * ReferenceCustomConfigsSpec against `tests/unit/test_custom_configs.py`.
  * Spark-conf overrides (`spark.graft.*`) consulted by individual
  * components take precedence over these engine-wide values where both
  * exist, matching how the reference's DEF_SPARK_CONFS layer sits above
  * the packaged yaml.
  */
final case class EngineConfigValues(
    dqBucket: Option[String] = Some("s3://sample-dq-bucket"),
    dqDevBucket: Option[String] = Some("s3://sample-dq-dev-bucket"),
    dqFunctionsColumnList: Seq[String] = Seq(
      "dq_rule_id", "execution_point", "filters", "schema", "table",
      "column", "dimension"),
    dqResultSinkColumnsToDelete: Seq[String] = Seq(
      "partial_unexpected_list", "partial_unexpected_counts",
      "partial_unexpected_index_list", "unexpected_list"),
    sharepointAuthority: String = "https://login.microsoftonline.com",
    sharepointApiDomain: String = "https://graph.microsoft.com",
    sharepointCompanyDomain: String = "your_company_name.sharepoint.com",
    notifDisallowedEmailServers: Seq[String] = Seq("sample.blocked.email_server"),
    engineUsagePath: Option[String] = Some("s3://sample-log-bucket"),
    engineDevUsagePath: Option[String] = Some("s3://sample-log-dev-bucket"),
    collectEngineUsage: String = "prod_only",
    raiseOnConfigNotAvailable: Boolean = false,
    prodCatalog: String = "sample_catalog",
    environment: String = "prod")

object EngineConfig {

  private val defaults = EngineConfigValues()
  @volatile private var current: EngineConfigValues = defaults

  def get: EngineConfigValues = current

  /** `set_default_engine_config(custom_configs_dict=...)`: replace the
    * named fields, keep the rest. */
  def setDefaultEngineConfig(customConfigsDict: Map[String, Any]): Unit =
    current = applyOverrides(current, customConfigsDict)

  /** `set_default_engine_config(custom_configs_file_path=...)`: overrides
    * from a flat YAML file (scalars and string lists — the shape of the
    * reference's engine.yaml). */
  def setDefaultEngineConfigFromFile(path: String): Unit =
    current = applyOverrides(current, parseFlatYaml(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path))))

  /** `set_default_engine_config(package=...)`: reset to the packaged
    * defaults. */
  def resetToPackageDefaults(): Unit = current = defaults

  private def strSeq(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(String.valueOf(_))
    case other => Seq(String.valueOf(other))
  }

  private def applyOverrides(base: EngineConfigValues,
      o: Map[String, Any]): EngineConfigValues = {
    var c = base
    o.foreach {
      case ("dq_bucket", v) => c = c.copy(dqBucket = Option(v).map(String.valueOf))
      case ("dq_dev_bucket", v) => c = c.copy(dqDevBucket = Option(v).map(String.valueOf))
      case ("dq_functions_column_list", v) => c = c.copy(dqFunctionsColumnList = strSeq(v))
      case ("dq_result_sink_columns_to_delete", v) =>
        c = c.copy(dqResultSinkColumnsToDelete = strSeq(v))
      case ("sharepoint_authority", v) => c = c.copy(sharepointAuthority = String.valueOf(v))
      case ("sharepoint_api_domain", v) => c = c.copy(sharepointApiDomain = String.valueOf(v))
      case ("sharepoint_company_domain", v) =>
        c = c.copy(sharepointCompanyDomain = String.valueOf(v))
      case ("notif_disallowed_email_servers", v) =>
        c = c.copy(notifDisallowedEmailServers = strSeq(v))
      case ("engine_usage_path", v) =>
        c = c.copy(engineUsagePath = Option(v).map(String.valueOf))
      case ("engine_dev_usage_path", v) =>
        c = c.copy(engineDevUsagePath = Option(v).map(String.valueOf))
      case ("collect_engine_usage", v) => c = c.copy(collectEngineUsage = String.valueOf(v))
      case ("raise_on_config_not_available", v) =>
        c = c.copy(raiseOnConfigNotAvailable = String.valueOf(v).equalsIgnoreCase("true"))
      case ("prod_catalog", v) => c = c.copy(prodCatalog = String.valueOf(v))
      case ("environment", v) => c = c.copy(environment = String.valueOf(v))
      case (other, _) => throw new IllegalArgumentException(
        s"unknown engine config field: $other")
    }
    c
  }

  /** Flat YAML: `key: scalar` lines and `key:` followed by `- item`
    * list entries. Comments (#) and blank lines ignored. */
  private[exec] def parseFlatYaml(text: String): Map[String, Any] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var listKey: Option[String] = None
    text.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val trimmed = line.trim
        if (trimmed.startsWith("- ") && listKey.isDefined) {
          val k = listKey.get
          out(k) = out.getOrElse(k, Seq.empty[String])
            .asInstanceOf[Seq[String]] :+ trimmed.stripPrefix("- ").trim
        } else {
          val idx = trimmed.indexOf(':')
          require(idx > 0, s"unparseable engine-config line: $raw")
          val k = trimmed.take(idx).trim
          val v = trimmed.drop(idx + 1).trim
          if (v.isEmpty) { listKey = Some(k); out(k) = Seq.empty[String] }
          else { listKey = None; out(k) = v }
        }
      }
    }
    out.toMap
  }
}
