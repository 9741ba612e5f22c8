package graft.exec

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Engine-usage telemetry, capability parity with the reference's
  * `utils/engine_usage_stats.py:20-110` + `engine.py` wiring: each public
  * engine call can record WHAT ran (the acon, scrubbed of credentials),
  * WHO ran it (`dp_name`) and WHEN, as one JSON file under a configured
  * usage location, partitioned `{path}/{dp_name}/{year}/{month}/`.
  *
  * Collection strategies mirror `CollectEngineUsage`
  * (`core/definitions.py`): `enabled` (always record), `prod_only`
  * (record only when the environment is prod — the reference's default),
  * `disabled`. The environment and paths come from session confs — the
  * engine analogue of the reference's deployed ENGINE_CONFIG — so an acon
  * can set them via `exec_env`:
  *
  *   - `spark.graft.engineUsagePath`     (prod usage location)
  *   - `spark.graft.engineDevUsagePath`  (non-prod usage location)
  *   - `spark.graft.environment`         ("prod" selects the prod path)
  *   - `spark.graft.dpName`              (fallback when the acon has no
  *     `exec_env.dp_name`)
  *
  * Recording NEVER fails the caller: any error is logged to stderr and
  * swallowed, as the reference does (`engine_usage_stats.py:68-73`).
  */
object EngineUsage {

  val Enabled = "enabled"
  val ProdOnly = "prod_only"
  val Disabled = "disabled"

  // kept in lockstep with build.sbt's `version :=` (ReferenceEnvUnitSpec
  // pins the pairing, like the reference's test_version.py does for
  // pyproject.toml)
  val EngineVersion = "graft 0.1.0"

  /** Reference `ConfigUtils.SENSITIVE_INFO` (`utils/configs/config_utils
    * .py:17-26`): keys whose values are masked in the recorded acon. */
  val SensitiveKeys: Set[String] = Set(
    "kafka.ssl.keystore.password", "kafka.ssl.truststore.password",
    "password", "secret", "credential", "credentials", "pass", "key")

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  /** `EngineStats.DEF_DATABRICKS_CONTEXT_KEYS`
    * (`core/definitions.py:98-106`): usage-stats field -> serverless
    * execution-context attribute. */
  val DatabricksContextKeys: Seq[(String, String)] = Seq(
    "environment" -> "environment",
    "dp_name" -> "jobName",
    "run_id" -> "runId",
    "job_id" -> "jobId",
    "job_name" -> "jobName",
    "workspace_id" -> "workspaceId",
    "policy_id" -> "usagePolicyId")

  /** `DatabricksUtils._get_dp_name` (`utils/databricks_utils.py:80-93`):
    * the data-product name is the job name up to its LAST '-'. */
  def dpNameFromJobName(jobName: String): String =
    if (jobName != null && jobName.contains("-"))
      jobName.substring(0, jobName.lastIndexOf('-'))
    else jobName

  /** `DatabricksUtils.get_usage_context_for_serverless`
    * (`utils/databricks_utils.py:137-163`): map the serverless execution
    * context (runId/jobId/jobName/workspaceId/usagePolicyId attributes)
    * into usage-stats fields; dp_name derives from the job name and
    * environment comes from the engine, not the context. Pinned verbatim
    * by ReferenceEnvUnitSpec against `tests/unit/test_databricks_utils.py`. */
  def usageContextForServerless(context: Map[String, String],
      environment: String): Map[String, String] =
    DatabricksContextKeys.map {
      case ("dp_name", attr) => "dp_name" -> dpNameFromJobName(context.get(attr).orNull)
      case ("environment", _) => "environment" -> environment
      case (key, attr) => key -> context.get(attr).orNull
    }.toMap

  /** Recursively mask sensitive values (exact key match, like the
    * reference's `remove_sensitive_info`). */
  def scrub(v: Any): Any = v match {
    case m: Map[_, _] => m.map { case (k, value) =>
      val ks = String.valueOf(k)
      ks -> (if (SensitiveKeys(ks)) "******" else scrub(value))
    }
    case s: Seq[_] => s.map(scrub)
    case other => other
  }

  /** Record one engine invocation. Returns the written file path, or None
    * when collection is off for this strategy/environment (or on error). */
  def record(
      spark: SparkSession,
      aconJson: String,
      funcName: String,
      collect: String = ProdOnly): Option[String] =
    try {
      val acon: Map[String, Any] =
        try mapper.readValue(aconJson, classOf[Map[String, Any]])
        catch { case _: Throwable => Map("raw" -> aconJson) }
      val conf = spark.conf
      val environment = conf.getOption("spark.graft.environment").getOrElse("dev")
      // Databricks cluster-usage tags when deployed there, empty locally
      // (reference DEF_SPARK_CONFS, `core/definitions.py:90-97`)
      def tag(graftKey: String, dbxKey: String): String =
        conf.getOption(graftKey)
          .orElse(conf.getOption(dbxKey)).getOrElse("")
      val path: Option[String] =
        if (environment == "prod") conf.getOption("spark.graft.engineUsagePath")
        else if (collect != ProdOnly) conf.getOption("spark.graft.engineDevUsagePath")
        else None
      if (collect == Disabled || path.isEmpty) return None

      val execEnv = acon.get("exec_env") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => String.valueOf(k) -> v }
        case _ => Map.empty[String, Any]
      }
      val dpName = execEnv.get("dp_name").map(String.valueOf)
        .orElse(conf.getOption("spark.graft.dpName")).getOrElse("unknown")
      val now = LocalDateTime.now()
      val stats: Map[String, Any] = Map(
        "acon" -> scrub(acon),
        "function" -> funcName,
        "engine_version" -> EngineVersion,
        // the reference stamps Python str(datetime): space-separated with
        // microseconds ("2023-12-29 22:43:27.654809")
        "start_timestamp" -> now.format(
          DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")),
        "year" -> now.getYear,
        "month" -> now.getMonthValue,
        "dp_name" -> dpName,
        // record what the deployment tags say, "" outside one — the
        // record mirrors the reference's locally-empty fields even
        // though the PATH selection above keeps its dev default
        "environment" -> conf.getOption("spark.graft.environment").getOrElse(""),
        "workspace_id" -> tag("spark.graft.workspaceId",
          "spark.databricks.clusterUsageTags.orgId"),
        "job_id" -> tag("spark.graft.jobId",
          "spark.databricks.clusterUsageTags.jobId"),
        "job_name" -> tag("spark.graft.jobName",
          "spark.databricks.clusterUsageTags.runName"),
        "run_id" -> tag("spark.graft.runId",
          "spark.databricks.clusterUsageTags.clusterName"))
      val file = new Path(
        s"${path.get.stripSuffix("/")}/$dpName/${now.getYear}/${now.getMonthValue}/" +
          s"eng_usage_${funcName}_${now.format(DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))}.json")
      val fs = file.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(file, true)
      try out.write(mapper.writeValueAsBytes(stats))
      finally out.close()
      Some(file.toString)
    } catch {
      case scala.util.control.NonFatal(e) =>
        Console.err.println(s"[engine-usage] failed to record $funcName: ${e.getMessage}")
        None
    }
}
