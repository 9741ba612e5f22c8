package graft.spec

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** The pipeline specification model ("ACON" in the reference).
  *
  * Capability parity with `lakehouse_engine/core/definitions.py:603-991`:
  * a pipeline is input specs -> ordered transform specs -> data-quality
  * specs -> output specs -> terminate specs. Parsed from JSON (Jackson
  * scala module, ships with Spark) into typed case classes; unknown keys
  * are preserved in `options`-style maps so configs stay forward
  * compatible.
  */
final case class InputSpec(
    specId: String,
    readType: String = "batch", // batch | streaming
    dataFormat: Option[String] = None, // csv/json/parquet/avro/delta/table/jdbc/kafka/sql/dataframe
    dbTable: Option[String] = None,
    location: Option[String] = None,
    query: Option[String] = None,
    dfName: Option[String] = None, // programmatically-provided DataFrame key
    schema: Option[String] = None, // StructType JSON or DDL
    // reference precedence (schema_utils.py:76-99): table > path > inline
    schemaPath: Option[String] = None,
    enforceSchemaFromTable: Option[String] = None,
    options: Map[String, String] = Map.empty,
    withFilepath: Boolean = false,
    tempView: Option[String] = None,
    /** raw (untyped) options view — JDBC/SAP readers need non-scalar
      * values the string view can't carry (e.g. a `predicates` list,
      * reference `core/definitions.py` InputSpec.options) */
    optionsRaw: Map[String, Any] = Map.empty,
    /** spark.read.jdbc(**jdbc_args) passthrough
      * (`io/readers/jdbc_reader.py:57-60`) */
    jdbcArgs: Map[String, Any] = Map.empty,
    /** derive upperBound from MAX(partitionColumn) before the parallel
      * read (`utils/extraction/jdbc_extraction_utils.py:249-296`) */
    calculateUpperBound: Boolean = false,
    calcUpperBoundSchema: Option[String] = None,
    /** one predicate per distinct partition-column value
      * (`jdbc_extraction_utils.py:168-205`) */
    generatePredicates: Boolean = false,
    predicatesAddNull: Boolean = true)

final case class TransformerSpec(function: String, args: Map[String, Any] = Map.empty)

final case class TransformSpec(
    specId: String,
    inputId: String,
    transformers: Seq[TransformerSpec] = Seq.empty,
    /** force all transformers to run stream-side even if flagged unsupported */
    forceStreaming: Boolean = false,
    /** reference `force_streaming_foreach_batch_processing`
      * (`core/definitions.py` TransformSpec): force the WHOLE chain into
      * the output's foreachBatch plan — downstream specs then see the
      * raw stream, not the chain's columns */
    forceForeachBatch: Boolean = false)

final case class DQFunctionSpec(function: String, args: Map[String, Any] = Map.empty)

final case class DQSpec(
    specId: String,
    inputId: String,
    dqType: String = "validator", // validator | prisma (rules from table)
    dqFunctions: Seq[DQFunctionSpec] = Seq.empty,
    criticalFunctions: Seq[DQFunctionSpec] = Seq.empty,
    failOnError: Boolean = true,
    maxPercentageFailure: Option[Double] = None,
    tagSourceData: Boolean = false,
    unexpectedRowsPk: Seq[String] = Seq.empty,
    resultSink: Option[OutputSpec] = None,
    /** reference `source` label stamped on every result-sink row */
    source: Option[String] = None,
    /** Some(true) = reference EXPLODED result-sink layout (one analysis
      * row per expectation, kwargs splatted to columns); Some(false) =
      * reference raw layout; None = the engine-local layout (nested
      * `result_sink` output specs keep their historical shape) */
    resultSinkExplode: Option[Boolean] = None,
    /** prisma variant: table name or parquet location holding rule rows */
    rulesTable: Option[String] = None,
    /** PRISMA rules table (reference `dq_db_table`, `utils/dq_utils.py`) */
    dqDbTable: Option[String] = None,
    /** PRISMA `table` filter on the rules table (mandatory with dqDbTable) */
    dqTableTableFilter: Option[String] = None,
    /** PRISMA extra SQL filter on the rules table */
    dqTableExtraFilters: Option[String] = None,
    /** PRISMA data product (drives the bucket-derived sink locations) */
    dataProductName: Option[String] = None,
    /** PRISMA: derive unexpected_rows_pk from this table's
      * `lakehouse.primary_key` property */
    tblToDerivePk: Option[String] = None,
    /** PRISMA: where the processed source keys of each run are appended */
    processedKeysLocation: Option[String] = None,
    /** max failing-key entries per result-sink row (reference
      * `dq_spec.result_sink_chunk_size`, default 1M) */
    resultSinkChunkSize: Int = 1000000)

final case class MergeOptions(
    mergePredicate: String,
    updatePredicate: Option[String] = None,
    deletePredicate: Option[String] = None,
    insertPredicate: Option[String] = None,
    updateColumnSet: Map[String, String] = Map.empty,
    insertColumnSet: Map[String, String] = Map.empty,
    insertOnly: Boolean = false)

final case class OutputSpec(
    specId: String,
    inputId: String = "",
    writeType: String = "append", // append|overwrite|complete|update|merge|error|ignore
    dataFormat: Option[String] = None,
    dbTable: Option[String] = None,
    location: Option[String] = None,
    partitions: Seq[String] = Seq.empty,
    options: Map[String, String] = Map.empty,
    /** raw (untyped) options view — the REST sink's dict-valued options
      * (`rest_api_extra_json_payload`, `rest_api_header`) need non-scalar
      * values, like InputSpec.optionsRaw */
    optionsRaw: Map[String, Any] = Map.empty,
    mergeOpts: Option[MergeOptions] = None,
    streamingTrigger: Option[String] = None, // availableNow|once|processingTime=<t>|continuous=<t>
    withBatchId: Boolean = false,
    // reference `core/definitions.py:941-944`: await the streaming query
    // (default true — the batch-like contract); false returns immediately
    // for long-running triggers, optional timeout in milliseconds
    streamingAwaitTermination: Boolean = true,
    streamingAwaitTerminationTimeoutMs: Option[Long] = None)

final case class TerminatorSpec(function: String, args: Map[String, Any] = Map.empty)

final case class Acon(
    inputSpecs: Seq[InputSpec],
    transformSpecs: Seq[TransformSpec] = Seq.empty,
    dqSpecs: Seq[DQSpec] = Seq.empty,
    outputSpecs: Seq[OutputSpec] = Seq.empty,
    terminateSpecs: Seq[TerminatorSpec] = Seq.empty,
    /** per-pipeline Spark conf overrides (reference `exec_env` ACON key,
      * `core/exec_env.py:130-146`) — applied tolerantly before reading */
    execEnv: Map[String, String] = Map.empty)

/** JSON -> spec parsing helpers (snake_case keys, as in the reference). */
object Specs {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  def parseJsonMap(json: String): Map[String, Any] =
    mapper.readValue(json, classOf[Map[String, Any]])

  /** Parse a JSON document of ANY root shape (object, array, scalar) to
    * Scala collections — the conformance classifier's entry point. */
  def parseJsonAny(json: String): Any =
    mapper.readValue(json, classOf[Any])

  /** Re-serialize a parsed JSON sub-tree (e.g. a dict-form schema back
    * into `StructType.fromJson` input). */
  def renderJson(v: Any): String = mapper.writeValueAsString(v)

  /** Tolerant typed accessors over a parsed JSON map. */
  object A {
    def str(m: Map[String, Any], k: String): Option[String] =
      m.get(k).collect { case s: String => s }
    def bool(m: Map[String, Any], k: String, default: Boolean = false): Boolean =
      m.get(k).collect { case b: Boolean => b }.getOrElse(default)
    def num(m: Map[String, Any], k: String): Option[Double] =
      m.get(k).collect { case n: Number => n.doubleValue() }
    def strMap(m: Map[String, Any], k: String): Map[String, String] =
      m.get(k).collect { case mm: Map[_, _] =>
        // a null-valued option is "not set" (the reference builds option
        // dicts with None placeholders and treats them as absent — e.g.
        // sap_bw_reader.py resolves every option with dict.get fallbacks)
        mm.collect { case (a, b) if b != null => a.toString -> String.valueOf(b) }.toMap
      }.getOrElse(Map.empty)
    def anyMap(m: Map[String, Any], k: String): Map[String, Any] =
      m.get(k).collect { case mm: Map[_, _] =>
        mm.map { case (a, b) => a.toString -> b }.toMap
      }.getOrElse(Map.empty)
    def seqOfMaps(m: Map[String, Any], k: String): Seq[Map[String, Any]] =
      m.get(k).collect { case s: Seq[_] =>
        s.collect { case mm: Map[_, _] => mm.map { case (a, b) => a.toString -> b } }
      }.getOrElse(Seq.empty)
    def strSeq(m: Map[String, Any], k: String): Seq[String] =
      m.get(k).collect { case s: Seq[_] => s.map(String.valueOf(_)) }.getOrElse(Seq.empty)
  }

  import A._

  /** Flatten the reference's `sharepoint_opts` dataclass dict
    * (`core/definitions.py:203-280` SharepointOptions) into the flat
    * option surface [[graft.io.SharepointIo]] consumes: scalars pass
    * through (null = unset), `local_options` merges in as Spark reader
    * options, list-valued fields comma-join, and — absent an explicit
    * `transport` — the registered-transport name defaults to
    * `"<site_name>:<drive_name>"` (the Graph transport registers itself
    * under that label; tests register fakes the same way). */
  private def sharepointOpts(m: Map[String, Any]): Map[String, String] =
    m.get("sharepoint_opts").collect { case mm: Map[_, _] =>
      val o = mm.map { case (k, v) => String.valueOf(k) -> v }.toMap[String, Any]
      val flat = Map.newBuilder[String, String]
      def scalar(v: Any): String = v match {
        case s: Seq[_] => s.map(String.valueOf(_)).mkString(",")
        case other => String.valueOf(other)
      }
      o.foreach {
        case (_, null) => ()
        case ("local_options", lo: Map[_, _]) =>
          lo.foreach { case (k, v) =>
            if (v != null) flat += (String.valueOf(k) -> scalar(v)) }
        case (k, v) => flat += (k -> scalar(v))
      }
      val r = flat.result()
      if (r.contains("transport")) r
      else (r.get("site_name"), r.get("drive_name")) match {
        case (Some(s), Some(d)) => r + ("transport" -> s"$s:$d")
        case _ => r
      }
    }.getOrElse(Map.empty)

  def inputSpec(m: Map[String, Any]): InputSpec = InputSpec(
    specId = str(m, "spec_id").getOrElse(sys.error("input_spec needs spec_id")),
    readType = str(m, "read_type").getOrElse("batch"),
    dataFormat = str(m, "data_format"),
    dbTable = str(m, "db_table"),
    location = str(m, "location"),
    query = str(m, "query"),
    dfName = str(m, "df_name"),
    schema = m.get("schema").flatMap {
      case s: String => Some(s)
      // the reference's schema is a StructType DICT — re-serialize it
      case mm: Map[_, _] => Some(renderJson(mm))
      case _ => None
    }.orElse(str(m, "schema_ddl")),
    schemaPath = str(m, "schema_path"),
    enforceSchemaFromTable = str(m, "enforce_schema_from_table"),
    // the reference's sftp input spec carries `sftp_files_format` as a
    // TOP-LEVEL field (`core/definitions.py` InputSpec) — fold it into
    // options where the sftp reader looks for it; likewise its
    // `sharepoint_opts` dict flattens into the sharepoint reader's
    // option surface
    options = strMap(m, "options") ++
      str(m, "sftp_files_format").map("sftp_files_format" -> _) ++
      sharepointOpts(m),
    withFilepath = bool(m, "with_filepath"),
    tempView = str(m, "temp_view"),
    optionsRaw = anyMap(m, "options").filter(_._2 != null),
    jdbcArgs = anyMap(m, "jdbc_args"),
    calculateUpperBound = bool(m, "calculate_upper_bound"),
    calcUpperBoundSchema = str(m, "calc_upper_bound_schema"),
    generatePredicates = bool(m, "generate_predicates"),
    predicatesAddNull = bool(m, "predicates_add_null", default = true))

  def transformSpec(m: Map[String, Any]): TransformSpec = TransformSpec(
    specId = str(m, "spec_id").getOrElse(sys.error("transform_spec needs spec_id")),
    inputId = str(m, "input_id").getOrElse(sys.error("transform_spec needs input_id")),
    transformers = seqOfMaps(m, "transformers").map(t =>
      TransformerSpec(str(t, "function").getOrElse(sys.error("transformer needs function")),
        anyMap(t, "args"))),
    forceStreaming = bool(m, "force_streaming"),
    forceForeachBatch = bool(m, "force_streaming_foreach_batch_processing"))

  def dqSpec(m: Map[String, Any]): DQSpec = DQSpec(
    specId = str(m, "spec_id").getOrElse(sys.error("dq_spec needs spec_id")),
    inputId = str(m, "input_id").getOrElse(sys.error("dq_spec needs input_id")),
    dqType = str(m, "dq_type").getOrElse("validator"),
    dqFunctions = seqOfMaps(m, "dq_functions").map(f =>
      DQFunctionSpec(str(f, "function").get, anyMap(f, "args"))),
    criticalFunctions = seqOfMaps(m, "critical_functions").map(f =>
      DQFunctionSpec(str(f, "function").get, anyMap(f, "args"))),
    failOnError = bool(m, "fail_on_error",
      // PRISMA defaults to NOT failing the run (`dq_utils.py`
      // build_prisma_dq_spec: fail_on_error = spec.get(.., False));
      // tag_source_data=true NULLIFIES fail_on_error outright — tagging
      // only works on a run that completes (`core/definitions.py:785`)
      default = !str(m, "dq_type").contains("prisma")) &&
      !bool(m, "tag_source_data"),
    maxPercentageFailure = num(m, "max_percentage_failure"),
    tagSourceData = bool(m, "tag_source_data"),
    unexpectedRowsPk = strSeq(m, "unexpected_rows_pk"),
    resultSink = m.get("result_sink").collect { case mm: Map[_, _] =>
      outputSpec(mm.map { case (a, b) => a.toString -> b })
    }.orElse {
      // reference flat spellings (`core/definitions.py` DQSpec):
      // result_sink_db_table / result_sink_location (+ format,
      // partitions, options) compose the sink output spec; writes append
      if (m.contains("result_sink_db_table") || m.contains("result_sink_location"))
        Some(OutputSpec(
          specId = "result_sink",
          inputId = str(m, "spec_id").getOrElse("dq"),
          writeType = "append",
          dataFormat = Some(str(m, "result_sink_format").getOrElse("delta")),
          dbTable = str(m, "result_sink_db_table"),
          location = str(m, "result_sink_location"),
          partitions = strSeq(m, "result_sink_partitions"),
          options = strMap(m, "result_sink_options")))
      else None
    },
    source = str(m, "source"),
    resultSinkExplode =
      if (m.contains("result_sink_db_table") || m.contains("result_sink_location"))
        Some(bool(m, "result_sink_explode", default = true))
      else None,
    rulesTable = str(m, "rules_table"),
    dqDbTable = str(m, "dq_db_table"),
    dqTableTableFilter = str(m, "dq_table_table_filter"),
    dqTableExtraFilters = str(m, "dq_table_extra_filters"),
    dataProductName = str(m, "data_product_name"),
    tblToDerivePk = str(m, "tbl_to_derive_pk"),
    processedKeysLocation = str(m, "processed_keys_location"),
    resultSinkChunkSize =
      num(m, "result_sink_chunk_size").map(_.toInt).getOrElse(1000000))

  def mergeOptions(m: Map[String, Any]): MergeOptions = MergeOptions(
    mergePredicate = str(m, "merge_predicate").getOrElse(sys.error("merge needs merge_predicate")),
    updatePredicate = str(m, "update_predicate"),
    deletePredicate = str(m, "delete_predicate"),
    insertPredicate = str(m, "insert_predicate"),
    updateColumnSet = strMap(m, "update_column_set"),
    insertColumnSet = strMap(m, "insert_column_set"),
    insertOnly = bool(m, "insert_only"))

  def outputSpec(m: Map[String, Any]): OutputSpec = OutputSpec(
    specId = str(m, "spec_id").getOrElse(sys.error("output_spec needs spec_id")),
    inputId = str(m, "input_id").getOrElse(""),
    writeType = str(m, "write_type").getOrElse("append"),
    dataFormat = str(m, "data_format"),
    dbTable = str(m, "db_table"),
    location = str(m, "location"),
    partitions = strSeq(m, "partitions"),
    options = strMap(m, "options") ++ sharepointOpts(m),
    optionsRaw = anyMap(m, "options").filter(_._2 != null),
    mergeOpts = m.get("merge_opts").collect { case mm: Map[_, _] =>
      mergeOptions(mm.map { case (a, b) => a.toString -> b })
    },
    streamingTrigger = str(m, "streaming_trigger")
      // the reference spells triggers as separate fields
      // (`core/definitions.py:931-966`); accept both
      .orElse(if (bool(m, "streaming_available_now")) Some("availableNow") else None)
      .orElse(if (bool(m, "streaming_once")) Some("once") else None)
      .orElse(str(m, "streaming_processing_time").map(t => s"processingTime=$t"))
      .orElse(str(m, "streaming_continuous").map(t => s"continuous=$t")),
    withBatchId = bool(m, "with_batch_id"),
    streamingAwaitTermination = bool(m, "streaming_await_termination", default = true),
    streamingAwaitTerminationTimeoutMs =
      num(m, "streaming_await_termination_timeout").map(_.toLong))

  def terminatorSpec(m: Map[String, Any]): TerminatorSpec = TerminatorSpec(
    function = str(m, "function").getOrElse(sys.error("terminator needs function")),
    args = anyMap(m, "args"))

  /** Parse a full ACON JSON document. */
  def parseAcon(json: String): Acon = {
    val m = parseJsonMap(json)
    Acon(
      inputSpecs = seqOfMaps(m, "input_specs").map(inputSpec),
      transformSpecs = seqOfMaps(m, "transform_specs").map(transformSpec),
      dqSpecs = seqOfMaps(m, "dq_specs").map(dqSpec),
      outputSpecs = seqOfMaps(m, "output_specs").map(outputSpec),
      terminateSpecs = seqOfMaps(m, "terminate_specs").map(terminatorSpec),
      execEnv = strMap(m, "exec_env"))
  }
}

/** Fail-fast acon validation, capability parity with the reference's
  * `utils/acon_utils.py:38-97` (`validate_and_resolve_acon`): a spec that
  * names an unsupported format raises BEFORE any IO runs, with the
  * format and spec id in the message — not a deep Spark "failed to find
  * data source" stack after half the pipeline executed.
  *
  * The accepted sets mirror the reference's `InputFormat`/`OutputFormat`
  * enums (`core/definitions.py:109-126,430-446`) plus the Spark-native
  * formats this engine adds (orc, text). `cloudfiles` (Databricks
  * Autoloader) is deliberately NOT accepted: it is proprietary runtime
  * glue; streaming file reads cover the use case on open-source Spark.
  */
object AconValidation {

  val InputFormats: Set[String] = Set(
    "jdbc", "avro", "json", "csv", "parquet", "orc", "text", "delta",
    "kafka", "sql", "sap_bw", "sap_b4", "dataframe", "sftp", "sharepoint",
    "table")

  // "file" is deliberately absent: the reference marks it internal-only
  // (`core/definitions.py:444`, the writer-factory routing name for the
  // concrete csv/json/parquet/orc/text formats) — accepting it here
  // would pass validation and then fail DataSource lookup at runtime.
  val OutputFormats: Set[String] = Set(
    "jdbc", "avro", "json", "csv", "parquet", "orc", "text", "delta",
    "kafka", "console", "noop", "dataframe", "rest_api", "table",
    "sharepoint",
    // engine extensions: the streaming ingest dedup faces
    // (graft.streaming.StreamingFaces — index-aware foreachBatch sinks)
    "minhash_dedup", "chunk_dedup", "ivfadc_ingest")

  def validate(acon: Acon): Unit = {
    acon.inputSpecs.foreach { s =>
      s.dataFormat.foreach { f =>
        if (!InputFormats(f.toLowerCase(java.util.Locale.ROOT)) && s.dbTable.isEmpty)
          sys.error(s"Input format not supported: $f (input spec '${s.specId}')")
      }
    }
    acon.outputSpecs.foreach { s =>
      s.dataFormat.foreach { f =>
        if (!OutputFormats(f.toLowerCase(java.util.Locale.ROOT)))
          sys.error(s"Output format not supported: $f (output spec '${s.specId}')")
      }
    }
  }
}
