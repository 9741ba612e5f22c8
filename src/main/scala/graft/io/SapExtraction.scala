package graft.io

import graft.spec.InputSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SAP BW / B4 (ADSO) JDBC extraction.
  *
  * Full behavior of the reference's SAP extraction stack
  * (`lakehouse_engine/utils/extraction/jdbc_extraction_utils.py`,
  * `sap_b4_extraction_utils.py`, `sap_bw_extraction_utils.py`,
  * `io/readers/sap_b4_reader.py`, `sap_bw_reader.py`): the heavy lifting
  * is pushed to the source as generated SQL subqueries used as the JDBC
  * relation, and the driver only issues config-sized probes —
  *
  *  - init extractions read the active table stamped with the extraction
  *    timestamp (+ synthesized changelog technical columns);
  *  - delta extractions read the changelog joined to the
  *    request-status/activation-requests table, windowed between the max
  *    timestamp already in the bronze location (or an explicit
  *    `min_timestamp`) and the max registered request timestamp;
  *  - parallelism comes from `partitionColumn` bounds, an automatically
  *    derived `upperBound` (MAX pushdown), a user predicates list, or
  *    generated predicates (DISTINCT pushdown → one predicate per value).
  *
  * Dialect notes (documented divergences, semantics preserved): SAP HANA
  * normalizes unquoted identifiers to uppercase, and so do Derby and most
  * ANSI engines — but some identifiers the reference interpolates raw
  * (`date`, `time`, `timestamp` partition/probe columns) are reserved
  * words outside sqlite, so generated probe references quote-uppercase
  * unquoted identifiers ([[SapExtraction.quoteIdent]]); derived-table
  * relations carry an explicit alias (sqlite tolerates `FROM (SELECT ..)`
  * bare, ANSI engines do not); generated predicate literals are typed
  * (numbers unquoted) because strict engines reject `int_col='1'`.
  */
object SapExtraction {

  /** Quote-uppercase an identifier unless the caller already quoted it
    * (`"/bic/article"` stays verbatim). Uppercasing preserves what the
    * unquoted identifier would have resolved to on a case-normalizing
    * engine (HANA, Derby). */
  def quoteIdent(ident: String): String = {
    val t = ident.trim
    if (t.startsWith("\"")) t else "\"" + t.toUpperCase + "\""
  }

  /** Parenthesized queries used as the JDBC relation need an alias on
    * ANSI engines; plain table names pass through. */
  def aliased(relation: String): String = {
    val t = relation.trim
    if (t.startsWith("(")) s"$t AS graft_subq" else t
  }

  private[io] final case class Target(
      url: String, user: String, password: String, driver: String) {
    def properties: java.util.Properties = {
      val p = new java.util.Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", driver)
      p
    }
  }

  /** One config-sized probe query against the source. */
  private def probe(spark: SparkSession, t: Target, query: String,
      customSchema: Option[String]): DataFrame = {
    val r = spark.read
    customSchema.foreach(s => r.option("customSchema", s))
    r.jdbc(t.url, aliased(query), t.properties)
  }

  private def stringify(v: Any): String = v match {
    case null => null
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case other => String.valueOf(other)
  }

  /** Shared extraction configuration (reference `JDBCExtraction`
    * dataclass, `jdbc_extraction_utils.py:21-101`), assembled from an
    * input spec with flavor-specific defaults. */
  final case class Common(
      target: Target,
      dbtable: String,
      changelogTable: String,
      partitionColumn: Option[String],
      latestTimestampDataLocation: Option[String],
      latestTimestampDataFormat: String,
      latestTimestampInputCol: String,
      extractionType: String,
      numPartitions: Option[String],
      lowerBound: Option[String],
      upperBound: Option[String],
      defaultUpperBound: Option[String],
      fetchSize: String,
      compress: Boolean,
      customSchema: Option[String],
      minTimestamp: Option[String],
      maxTimestamp: Option[String],
      generatePredicates: Boolean,
      predicates: Seq[String],
      predicatesAddNull: Boolean,
      extractionTimestamp: String,
      maxTimestampCustomSchema: String,
      defaultMaxTimestamp: String,
      defaultMinTimestamp: String,
      calculateUpperBound: Boolean,
      calcUpperBoundSchema: Option[String])

  private def opt(o: Map[String, Any], k: String): Option[String] =
    o.get(k).filter(_ != null).map(stringify)

  private def nowTimestamp(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())

  private[io] def commonFromSpec(spec: InputSpec, changelogTable: String,
      latestTimestampInputCol: String, maxTimestampCustomSchema: String,
      defaultMaxTimestamp: String, defaultMinTimestamp: String,
      defaultCustomSchema: Option[String]): Common = {
    val o = spec.optionsRaw
    Common(
      target = Target(
        url = opt(o, "url").getOrElse(sys.error("sap extraction needs url")),
        user = opt(o, "user").getOrElse(""),
        password = opt(o, "password").getOrElse(""),
        driver = opt(o, "driver").getOrElse("com.sap.db.jdbc.Driver")),
      dbtable = opt(o, "dbtable").getOrElse(sys.error("sap extraction needs dbtable")),
      changelogTable = changelogTable,
      partitionColumn = opt(o, "partitionColumn"),
      latestTimestampDataLocation = opt(o, "latest_timestamp_data_location"),
      latestTimestampDataFormat =
        opt(o, "latest_timestamp_data_format").getOrElse("delta"),
      latestTimestampInputCol =
        opt(o, "latest_timestamp_input_col").getOrElse(latestTimestampInputCol),
      extractionType = opt(o, "extraction_type").getOrElse("delta"),
      numPartitions = opt(o, "numPartitions"),
      lowerBound = opt(o, "lowerBound"),
      upperBound = opt(o, "upperBound"),
      // COALESCE(x, NULL) === x — a null-ish default drops the wrapper
      // (the reference interpolates the raw string, sqlite-only)
      defaultUpperBound = opt(o, "default_upper_bound")
        .filterNot(_.equalsIgnoreCase("null")),
      fetchSize = opt(o, "fetchSize").getOrElse("100000"),
      compress = opt(o, "compress").forall(_.toBoolean),
      customSchema = opt(o, "customSchema").orElse(defaultCustomSchema),
      minTimestamp = opt(o, "min_timestamp"),
      maxTimestamp = opt(o, "max_timestamp"),
      generatePredicates = spec.generatePredicates,
      predicates = o.get("predicates").collect {
        case s: Seq[_] => s.map(String.valueOf)
      }.getOrElse(Seq.empty),
      predicatesAddNull = spec.predicatesAddNull,
      extractionTimestamp = opt(o, "extraction_timestamp").getOrElse(nowTimestamp()),
      maxTimestampCustomSchema =
        opt(o, "max_timestamp_custom_schema").getOrElse(maxTimestampCustomSchema),
      defaultMaxTimestamp =
        opt(o, "default_max_timestamp").getOrElse(defaultMaxTimestamp),
      defaultMinTimestamp =
        opt(o, "default_min_timestamp").getOrElse(defaultMinTimestamp),
      calculateUpperBound = spec.calculateUpperBound,
      calcUpperBoundSchema = spec.calcUpperBoundSchema)
  }

  /** The min timestamp for a delta window: explicit `min_timestamp`, else
    * MAX(latest_timestamp_input_col) of the data already landed at
    * `latest_timestamp_data_location`, else the default
    * (`jdbc_extraction_utils.py` `_get_delta_query` preamble in both
    * flavors). */
  private[io] def resolveMinTimestamp(spark: SparkSession, c: Common): String =
    c.minTimestamp.getOrElse {
      val derived = c.latestTimestampDataLocation.flatMap { loc =>
        val df = Readers.read(spark, InputSpec(
          specId = "data_with_latest_timestamp",
          readType = "batch",
          dataFormat = Some(c.latestTimestampDataFormat),
          location = Some(loc)))
        Option(stringify(df.agg(org.apache.spark.sql.functions
          .max(org.apache.spark.sql.functions.col(c.latestTimestampInputCol)))
          .first().get(0)))
      }
      derived.getOrElse(c.defaultMinTimestamp)
    }

  /** The max timestamp for a delta window: explicit, else the flavor's
    * request-status MAX pushdown. */
  private[io] def resolveMaxTimestamp(spark: SparkSession, c: Common,
      maxTimestampQuery: String): String =
    c.maxTimestamp.getOrElse(stringify(
      probe(spark, c.target, maxTimestampQuery,
        Some(c.maxTimestampCustomSchema)).first().get(0)))

  /** Reference `get_predicates`: DISTINCT pushdown → one equality
    * predicate per value (+ IS NULL). Literal typing is ours: numbers
    * stay unquoted so strict engines can compare them to numeric
    * columns. */
  private[io] def generatePredicatesList(spark: SparkSession, c: Common,
      predicatesQuery: String): Seq[String] = {
    val pcol = c.partitionColumn.getOrElse(
      sys.error("generate_predicates needs partitionColumn"))
    val ref = quoteIdent(pcol)
    val values = probe(spark, c.target, predicatesQuery, None)
      .collect().map(_.get(0)).toSeq
    val eqs = values.collect {
      case v: Number => s"$ref = $v"
      case v if v != null => s"$ref = '${stringify(v)}'"
    }
    if (c.predicatesAddNull) eqs :+ s"$ref IS NULL" else eqs
  }

  /** Reference `get_spark_jdbc_optimal_upper_bound`: MAX(partition
    * column) pushed to the source (COALESCE'd with the configured
    * default), read with `calc_upper_bound_schema`. */
  private[io] def optimalUpperBound(spark: SparkSession, c: Common): String = {
    val pcol = c.partitionColumn.getOrElse(
      sys.error("calculate_upper_bound needs partitionColumn"))
    val table =
      if (c.extractionType == "init") c.dbtable else c.changelogTable
    val agg = c.defaultUpperBound match {
      case Some(d) => s"COALESCE(MAX(${quoteIdent(pcol)}), $d)"
      case None => s"MAX(${quoteIdent(pcol)})"
    }
    val df = probe(spark, c.target,
      s"(SELECT $agg upper_bound FROM $table)", c.calcUpperBoundSchema)
    Option(df.first().get(0)).map(stringify).getOrElse(
      throw new IllegalStateException(
        s"Not able to calculate upper bound from '${c.dbtable}' using " +
          s"the column '$pcol'"))
  }

  /** Forward spark options the user passed on the spec beyond what the
    * extraction consumed (reference `get_additional_spark_options`):
    * scalar, non-null, not already set, not in the ignore list. Unknown
    * keys are ignored by the JDBC source; real spark options (e.g.
    * sessionInitStatement) ride through. */
  private def passthrough(spec: InputSpec, built: Map[String, String],
      ignore: Set[String]): Map[String, String] =
    spec.optionsRaw.collect {
      case (k, v: String) if !built.contains(k) && !ignore(k) => k -> v
      case (k, v: Number) if !built.contains(k) && !ignore(k) => k -> stringify(v)
      case (k, v: Boolean) if !built.contains(k) && !ignore(k) => k -> v.toString
    }

  private val PartitionKeys =
    Set("partitionColumn", "numPartitions", "lowerBound", "upperBound")

  /** Shared read orchestration (reference `get_spark_jdbc_options` +
    * the readers' `_get_options`): build the relation and the predicates
    * or bounds, then one `spark.read.jdbc`. */
  private[io] def run(spark: SparkSession, spec: InputSpec, c: Common,
      extractionQuery: String, predicatesQuery: => String): DataFrame = {
    val base = Map("fetchSize" -> c.fetchSize,
      "compress" -> c.compress.toString) ++
      c.customSchema.map("customSchema" -> _)
    val relation = aliased(extractionQuery)
    if (c.generatePredicates || c.predicates.nonEmpty) {
      val preds =
        if (c.generatePredicates)
          generatePredicatesList(spark, c, predicatesQuery)
        else c.predicates
      val opts = base ++ passthrough(spec, base, PartitionKeys)
      spark.read.options(opts)
        .jdbc(c.target.url, relation, preds.toArray, c.target.properties)
    } else {
      var opts = base
      c.numPartitions.foreach(v => opts += "numPartitions" -> v)
      c.upperBound.foreach(v => opts += "upperBound" -> v)
      c.lowerBound.foreach(v => opts += "lowerBound" -> v)
      c.partitionColumn.foreach(v => opts += "partitionColumn" -> v)
      if (c.calculateUpperBound)
        opts += "upperBound" -> optimalUpperBound(spark, c)
      opts = opts ++ passthrough(spec, opts, Set.empty)
      spark.read.options(opts)
        .jdbc(c.target.url, relation, c.target.properties)
    }
  }
}

/** SAP B4 ADSO extraction (reference `sap_b4_extraction_utils.py` +
  * `io/readers/sap_b4_reader.py`). */
object SapB4Extraction {
  import SapExtraction._

  /** `sap_b4_extraction_utils.py:107-127` get_data_target: explicit, or
    * derived from the dbtable by stripping quotes/backslashes and taking
    * the last `/` segment minus its first and last character. */
  def dataTarget(options: Map[String, Any]): String =
    options.get("data_target").filter(_ != null).map(String.valueOf).getOrElse {
      val cleaned = String.valueOf(options("dbtable")).replaceAll("[\"'\\\\]", "")
      val last = cleaned.split("/").last
      last.substring(1, math.max(1, last.length - 1))
    }

  /** `sap_b4_extraction_utils.py:253-281` `_get_req_status_tbl_filter`. */
  def requestStatusFilter(adsoType: String, dataTarget: String): String =
    adsoType match {
      case "AQ" =>
        "STORAGE = 'AQ' AND REQUEST_IS_IN_PROCESS = 'N' AND " +
          "LAST_OPERATION_TYPE IN ('C', 'U') AND REQUEST_STATUS IN ('GG', 'GR') " +
          s"AND UPPER(DATATARGET) = UPPER('$dataTarget')"
      case "CL" =>
        "STORAGE = 'AT' AND REQUEST_IS_IN_PROCESS = 'N' AND " +
          "LAST_OPERATION_TYPE IN ('C', 'U') AND REQUEST_STATUS IN ('GG') " +
          s"AND UPPER(DATATARGET) = UPPER('$dataTarget')"
      case other => throw new UnsupportedOperationException(
        s"The requested ADSO Type is not fully implemented and/or tested. " +
          s"Supported ADSO Types: AQ, CL (got '$other')")
    }

  def read(spark: SparkSession, spec: InputSpec): DataFrame = {
    val o = spec.optionsRaw
    def s(k: String): Option[String] =
      o.get(k).filter(_ != null).map(String.valueOf)
    val adsoType = s("adso_type").getOrElse(
      sys.error("sap_b4 extraction needs adso_type"))
    val changelog = s("changelog_table").getOrElse {
      if (adsoType == "AQ") String.valueOf(o("dbtable"))
      else sys.error("sap_b4 CL extraction needs changelog_table")
    }
    val c = commonFromSpec(spec,
      changelogTable = changelog,
      latestTimestampInputCol = "REQTSN",
      maxTimestampCustomSchema = "timestamp DECIMAL(23,0)",
      defaultMaxTimestamp = "1970000000000000000000",
      defaultMinTimestamp = "1970000000000000000000",
      defaultCustomSchema = Some("REQTSN DECIMAL(23,0)"))
    val requestStatusTbl = s("request_status_tbl").getOrElse("SAPHANADB.RSPMREQUEST")
    val requestColName = s("request_col_name").getOrElse("REQUEST_TSN")
    val filter = s("request_status_tbl_filter").getOrElse(
      requestStatusFilter(adsoType, dataTarget(o)))
    val includeChangelogTechCols = o.get("include_changelog_tech_cols")
      .collect { case b: Boolean => b }.getOrElse(adsoType != "AQ")
    val extraCols = s("extra_cols_req_status_tbl")

    // `sap_b4_extraction_utils.py:148-166` _get_init_extraction_query
    def initQuery: String = {
      val techCols =
        if (includeChangelogTechCols)
          s"${c.extractionTimestamp}000000000 AS reqtsn, " +
            "'0' AS datapakid, 0 AS record, "
        else ""
      s"(SELECT t.*, ${techCols}CAST(${c.extractionTimestamp} " +
        s"AS DECIMAL(15,0)) AS extraction_start_timestamp " +
        s"FROM ${c.dbtable} t)"
    }

    // `sap_b4_extraction_utils.py:168-250` _get_delta_query
    def deltaParts: (String, String) = {
      val minTs = resolveMinTimestamp(spark, c)
      val maxTs = resolveMaxTimestamp(spark, c,
        s"(SELECT COALESCE(MAX($requestColName), ${c.defaultMaxTimestamp}) " +
          s"""as "TIMESTAMP" FROM $requestStatusTbl WHERE $filter)""")
      val joinCondition = s("act_req_join_condition")
        .getOrElse(s"tbl.reqtsn = req.$requestColName")
      val baseQuery =
        s" FROM ${c.changelogTable} AS tbl " +
          s"JOIN $requestStatusTbl AS req ON $joinCondition " +
          s"WHERE $filter " +
          s"AND req.$requestColName > $minTs " +
          s"AND req.$requestColName <= $maxTs)"
      val mainCols =
        s"(SELECT tbl.*, CAST(${c.extractionTimestamp} AS DECIMAL(15,0)) " +
          "AS extraction_start_timestamp"
      val cols = Seq(Some(mainCols), extraCols).flatten.mkString(", ")
      (cols + baseQuery, baseQuery)
    }

    if (c.extractionType == "delta") {
      val (extraction, baseQuery) = deltaParts
      def predicatesQuery =
        s"(SELECT DISTINCT(${quoteIdent(c.partitionColumn.get)})" + baseQuery
      run(spark, spec, c, extraction, predicatesQuery)
    } else {
      def predicatesQuery =
        s"(SELECT DISTINCT(${quoteIdent(c.partitionColumn.get)}) " +
          s"FROM ${c.dbtable} t)"
      run(spark, spec, c, initQuery, predicatesQuery)
    }
  }
}

/** SAP BW DSO extraction (reference `sap_bw_extraction_utils.py` +
  * `io/readers/sap_bw_reader.py`). */
object SapBwExtraction {
  import SapExtraction._

  /** `sap_bw_extraction_utils.py:176-195` get_odsobject: the table part
    * of a `db.table` dbtable, or the dbtable itself. */
  def odsobject(options: Map[String, Any]): String = {
    val t = String.valueOf(options("dbtable"))
    val parts = t.split("\\.")
    if (parts.length > 1) parts(1) else t
  }

  /** `sap_bw_extraction_utils.py:101-174` get_changelog_table: explicit
    * changelog, else the RSTSODS/RSBASIDOC pushdown lookup (delta with an
    * odsobject), else `<dbtable>_cl`. */
  def deriveChangelogTable(spark: SparkSession, url: String, user: String,
      password: String, driver: String, odsobject: Option[String],
      changelogTable: Option[String], extractionType: String,
      sapBwSchema: String = "SAPPHA", odsPrefix: String = "8",
      logsys: Option[String] = None, dbtable: String = ""): String =
    changelogTable.getOrElse {
      odsobject match {
        case Some(ods) if extractionType != "init" =>
          val logsysCond = logsys match {
            case Some(l) => s"p.slogsys = '$l' AND p.rlogsys = '$l'"
            case None => "p.slogsys = p.rlogsys"
          }
          val (systemTable, prefTable) =
            if (sapBwSchema.nonEmpty) (s"$sapBwSchema.RSTSODS", s"$sapBwSchema.RSBASIDOC")
            else ("RSTSODS", "RSBASIDOC")
          val query =
            s"(SELECT ODSNAME_TECH FROM $systemTable o " +
              s"JOIN $prefTable p ON $logsysCond " +
              s"AND o.ODSNAME = '$odsPrefix$ods" + "_' || p.tsprefix " +
              "AND USERAPP = 'CHANGELOG' AND VERSION = '000')"
          val props = new java.util.Properties()
          props.setProperty("user", user)
          props.setProperty("password", password)
          props.setProperty("driver", driver)
          val df = spark.read.jdbc(url, aliased(query), props)
          val n = df.count()
          if (n > 1) throw new IllegalStateException(
            s"More than one changelog table found for $ods. Aborting.")
          if (n == 0) throw new IllegalStateException(
            s"No changelog table found for $ods. Aborting.")
          val tech = String.valueOf(df.first().get(0))
          if (sapBwSchema.nonEmpty) s"""$sapBwSchema."$tech"""" else tech
        case _ => s"${dbtable}_cl"
      }
    }

  def read(spark: SparkSession, spec: InputSpec): DataFrame = {
    val o = spec.optionsRaw
    def s(k: String): Option[String] =
      o.get(k).filter(_ != null).map(String.valueOf)
    val ods = s("odsobject").getOrElse(odsobject(o))
    val sapBwSchema = s("sap_bw_schema").getOrElse("SAPPHA")
    val extractionType = s("extraction_type").getOrElse("delta")
    val changelog = deriveChangelogTable(spark,
      url = s("url").getOrElse(sys.error("sap_bw extraction needs url")),
      user = s("user").getOrElse(""), password = s("password").getOrElse(""),
      driver = s("driver").getOrElse("com.sap.db.jdbc.Driver"),
      odsobject = Some(ods), changelogTable = s("changelog_table"),
      extractionType = extractionType, sapBwSchema = sapBwSchema,
      odsPrefix = s("ods_prefix").getOrElse("8"), logsys = s("logsys"),
      dbtable = s("dbtable").getOrElse(""))
    val c = commonFromSpec(spec,
      changelogTable = changelog,
      latestTimestampInputCol = "actrequest_timestamp",
      maxTimestampCustomSchema = "timestamp DECIMAL(15,0)",
      defaultMaxTimestamp = "197000000000000",
      defaultMinTimestamp = "197000000000000",
      defaultCustomSchema = Some("REQUEST VARCHAR(30), DATAPAKID VARCHAR(6)"))
    val actRequestTable =
      s("act_request_table").getOrElse(s"$sapBwSchema.RSODSACTREQ")
    val requestColName = s("request_col_name").getOrElse("actrequest")
    val includeChangelogTechCols = o.get("include_changelog_tech_cols")
      .collect { case b: Boolean => b }.getOrElse(true)
    val extraCols = s("extra_cols_act_request")
    val getTimestampFromActRequest = o.get("get_timestamp_from_act_request")
      .collect { case b: Boolean => b }.getOrElse(false)
    val ts = quoteIdent("timestamp")

    // `sap_bw_extraction_utils.py:231-256` _get_init_extraction_query
    def initQuery: String = {
      val techCols =
        if (includeChangelogTechCols)
          s"'0' AS request, CAST(${c.extractionTimestamp} AS DECIMAL(15, 0)) " +
            "AS actrequest_timestamp, '0' AS datapakid, 0 AS partno, 0 AS record, "
        else
          s"CAST(${c.extractionTimestamp} AS DECIMAL(15, 0)) AS actrequest_timestamp, "
      s"(SELECT t.*, ${techCols}CAST(${c.extractionTimestamp} " +
        s"AS DECIMAL(15, 0)) AS extraction_start_timestamp " +
        s"FROM ${c.dbtable} t)"
    }

    // `sap_bw_extraction_utils.py:258-280`: WO-DSO init taking the
    // timestamp from the activation requests table — only legal when the
    // active table IS the changelog (Write Optimised).
    def initQueryFromActRequest: String = {
      if (c.dbtable != c.changelogTable)
        throw new IllegalStateException(
          "Not able to get the extraction query. The option " +
            "'get_timestamp_from_act_request' is only " +
            "available/useful for DSOs of type Write Optimised.")
      s"(SELECT t.*, act_req.$ts as actrequest_timestamp, " +
        s"CAST(${c.extractionTimestamp} AS DECIMAL(15, 0)) " +
        "AS extraction_start_timestamp " +
        s"FROM ${c.dbtable} t " +
        s"JOIN $actRequestTable AS act_req ON " +
        s"t.request = act_req.$requestColName " +
        s"WHERE act_req.odsobject = '$ods' " +
        "AND operation = 'A' AND status = '0')"
    }

    // `sap_bw_extraction_utils.py:282-374` _get_delta_query
    def deltaParts: (String, String) = {
      val minTs = resolveMinTimestamp(spark, c)
      val maxTs = resolveMaxTimestamp(spark, c,
        s"(SELECT COALESCE(MAX($ts), ${c.defaultMaxTimestamp}) as $ts " +
          s"FROM $actRequestTable " +
          s"WHERE odsobject = '$ods' AND operation = 'A' AND status = '0')")
      val joinCondition = s("act_req_join_condition")
        .getOrElse(s"changelog_tbl.request = act_req.$requestColName")
      val baseQuery =
        s" FROM ${c.changelogTable} AS changelog_tbl " +
          s"JOIN $actRequestTable AS act_req ON $joinCondition " +
          s"WHERE act_req.odsobject = '$ods' " +
          s"AND act_req.$ts > $minTs " +
          s"AND act_req.$ts <= $maxTs " +
          "AND operation = 'A' AND status = '0')"
      val mainCols =
        s"(SELECT changelog_tbl.*, act_req.$ts AS actrequest_timestamp, " +
          s"CAST(${c.extractionTimestamp} AS DECIMAL(15,0)) " +
          "AS extraction_start_timestamp"
      val cols = Seq(Some(mainCols), extraCols).flatten.mkString(", ")
      (cols + baseQuery, baseQuery)
    }

    if (c.extractionType == "delta") {
      val (extraction, baseQuery) = deltaParts
      def predicatesQuery =
        s"(SELECT DISTINCT(${quoteIdent(c.partitionColumn.get)})" + baseQuery
      run(spark, spec, c, extraction, predicatesQuery)
    } else {
      val init =
        if (getTimestampFromActRequest) initQueryFromActRequest else initQuery
      def predicatesQuery =
        s"(SELECT DISTINCT(${quoteIdent(c.partitionColumn.get)}) " +
          s"FROM ${c.dbtable} t)"
      run(spark, spec, c, init, predicatesQuery)
    }
  }
}
