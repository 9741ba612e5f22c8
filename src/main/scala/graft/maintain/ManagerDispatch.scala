package graft.maintain

import graft.spec.Specs
import graft.spec.Specs.A
import org.apache.spark.sql.SparkSession

/** `execute_manager`: dispatch a LIST of manager operations in one call
  * (reference `engine.py:140-167` + `utils/acon_utils.py:17-35` /
  * `validate_managers`): every operation is validated first — manager
  * type, function name, mandatory args — and ALL validation errors are
  * collected and thrown together before anything executes, so a bad batch
  * never half-runs.
  */
object ManagerDispatch {

  /** Mandatory-argument registry per manager function (reference
    * `core/definitions.py` TABLE_MANAGER_OPERATIONS /
    * FILE_MANAGER_OPERATIONS, narrowed to the args this build consumes). */
  private val tableOps: Map[String, Seq[String]] = Map(
    "compute_table_statistics" -> Seq("table_or_view"),
    "create_table" -> Seq.empty, // sql | path
    "create_tables" -> Seq.empty,
    "create_view" -> Seq.empty,
    "drop_table" -> Seq("table_or_view"),
    "drop_view" -> Seq("table_or_view"),
    "execute_sql" -> Seq("sql"),
    "truncate" -> Seq("table_or_view"),
    "vacuum" -> Seq.empty,
    "describe" -> Seq("table_or_view"),
    "optimize" -> Seq.empty, // path | table_or_view
    "show_tbl_properties" -> Seq("table_or_view"),
    "get_tbl_pk" -> Seq("table_or_view"),
    "repair_table" -> Seq("table_or_view"),
    "delete_where" -> Seq("where_clause")) // + path | table_or_view

  private val fileOps: Map[String, Seq[String]] = Map(
    "delete_objects" -> Seq("bucket", "object_paths", "dry_run"),
    "copy_objects" -> Seq("bucket", "source_object", "destination_bucket",
      "destination_object", "dry_run"),
    "move_objects" -> Seq("bucket", "source_object", "destination_bucket",
      "destination_object", "dry_run"),
    "request_restore" -> Seq("bucket", "source_object", "restore_expiration",
      "retrieval_tier", "dry_run"),
    "check_restore_status" -> Seq("bucket", "source_object"),
    "request_restore_to_destination_and_wait" -> Seq("bucket", "source_object",
      "destination_bucket", "destination_object", "restore_expiration",
      "retrieval_tier", "dry_run"))

  /** Resolve an S3 client for archive-restore ops: operation args first
    * (`endpoint`, `region`, `access_key`, `secret_key`, `session_token`),
    * AWS_* environment second. None when no endpoint+credentials. */
  private def s3ClientFor(op: Map[String, Any]): Option[graft.io.AwsSig.S3RestoreClient] = {
    def arg(k: String, env: String): Option[String] =
      A.str(op, k).orElse(sys.env.get(env))
    for {
      endpoint <- arg("endpoint", "AWS_ENDPOINT_URL")
      region <- arg("region", "AWS_REGION").orElse(Some("us-east-1"))
      ak <- arg("access_key", "AWS_ACCESS_KEY_ID")
      sk <- arg("secret_key", "AWS_SECRET_ACCESS_KEY")
    } yield new graft.io.AwsSig.S3RestoreClient(endpoint.stripSuffix("/"), region,
      graft.io.AwsSig.Credentials(ak, sk, arg("session_token", "AWS_SESSION_TOKEN")))
  }

  /** Parse an `{"operations": [...]}` ACON and run it. Returns one
    * human-readable status line per executed operation. */
  def execute(spark: SparkSession, aconJson: String): Seq[String] =
    execute(spark, A.seqOfMaps(Specs.parseJsonMap(aconJson), "operations"))

  def execute(spark: SparkSession, operations: Seq[Map[String, Any]]): Seq[String] = {
    if (operations.isEmpty)
      throw new RuntimeException("No operations found in the acon.")
    val errors = operations.zipWithIndex.flatMap { case (op, i) => validate(op, i) }
    if (errors.nonEmpty)
      throw new RuntimeException(
        "Errors found during validation:\n" + errors.mkString("\n"))
    operations.map(run(spark, _))
  }

  /** Storage path of an op's target: explicit `path`, else the catalog
    * location of `table_or_view` (the reference addresses optimize /
    * delete_where by table name; the path-rewrite implementations here
    * need the files). */
  private def storagePath(spark: SparkSession, op: Map[String, Any]): String =
    A.str(op, "path").getOrElse {
      val t = A.str(op, "table_or_view").getOrElse(
        sys.error("needs 'path' or 'table_or_view'"))
      spark.sql(s"DESCRIBE FORMATTED $t").collect()
        .find(r => String.valueOf(r.get(0)).trim.equalsIgnoreCase("Location"))
        .map(r => String.valueOf(r.get(1)).trim)
        .getOrElse(sys.error(s"no resolvable storage location for $t"))
    }

  /** Plan-only validation for the ACON conformance pass: the per-op
    * errors, without executing anything (empty = the config plans). */
  def validationErrors(operations: Seq[Map[String, Any]]): Seq[String] =
    operations.zipWithIndex.flatMap { case (op, i) => validate(op, i) }

  /** Reference manager ACONs are FLAT (`{"function": ..., args...}`) —
    * the manager type is implied by the entrypoint
    * (`execute_table_manager` vs `execute_file_manager`). Infer it from
    * the function name for classification. */
  def inferManager(function: String): Option[String] =
    if (tableOps.contains(function)) Some("table")
    else if (fileOps.contains(function)) Some("file")
    else None

  /** Functions whose SQL text comes from `sql` OR a `path` DDL file —
    * at least one must be present (mandatory-args registry can't express
    * either/or). */
  private val sqlOrPathOps = Set("create_table", "create_view", "execute_sql")

  /** Functions that address their target as a storage `path` OR a
    * catalog `table_or_view` (the reference accepts both —
    * `core/table_manager.py:164-185,277-280` reads `table_or_view`):
    * at least one must be present. */
  private val pathOrTableOps = Set("optimize", "delete_where")

  /** dry_run must be an actual boolean (or the strings "true"/"false"):
    * anything else failing silently to `false` would turn a "dry run"
    * into a destructive one. */
  private def dryRunValue(op: Map[String, Any]): Either[String, Boolean] =
    op.get("dry_run") match {
      case None => Right(false)
      case Some(b: Boolean) => Right(b)
      case Some(s: String) if s.equalsIgnoreCase("true") => Right(true)
      case Some(s: String) if s.equalsIgnoreCase("false") => Right(false)
      case Some(other) => Left(s"dry_run must be boolean, got '$other'")
    }

  private def validate(op: Map[String, Any], i: Int): Seq[String] = {
    val manager = A.str(op, "manager")
    val function = A.str(op, "function")
    val registry = manager match {
      case Some("table") => Right(tableOps)
      case Some("file") => Right(fileOps)
      case Some(other) => Left(s"op[$i]: Manager type not supported: $other")
      case None => Left(s"op[$i]: missing 'manager'")
    }
    registry match {
      case Left(err) => Seq(err)
      case Right(ops) => function match {
        case None => Seq(s"op[$i]: Missing 'function' parameter for manager")
        case Some(fn) if !ops.contains(fn) =>
          Seq(s"op[$i]: Function '$fn' not supported for ${manager.get} manager")
        case Some(fn) =>
          val missing = ops(fn).filterNot(op.contains)
          val missingErr =
            if (missing.nonEmpty)
              Seq(s"op[$i]: Missing mandatory parameters for ${manager.get} " +
                s"manager function $fn: ${missing.mkString(", ")}")
            else Seq.empty
          val sqlErr =
            if (sqlOrPathOps(fn) && !op.contains("sql") && !op.contains("path"))
              Seq(s"op[$i]: $fn needs 'sql' or 'path'")
            else if (fn == "create_tables" && !op.contains("path"))
              Seq(s"op[$i]: create_tables needs 'path'")
            else if (pathOrTableOps(fn) && manager.contains("table") &&
                !op.contains("path") && !op.contains("table_or_view"))
              Seq(s"op[$i]: $fn needs 'path' or 'table_or_view'")
            else Seq.empty
          val dryErr = dryRunValue(op).left.toSeq.map(e => s"op[$i]: $e")
          missingErr ++ sqlErr ++ dryErr
      }
    }
  }

  private def run(spark: SparkSession, op: Map[String, Any]): String = {
    val fn = A.str(op, "function").get
    def s(k: String) = A.str(op, k).get
    // reference acons address SQL scripts as file:// URIs
    def readSqlFile(p: String): String =
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(p.stripPrefix("file://")))
    def readSqlArg(): String =
      A.str(op, "sql").getOrElse(readSqlFile(s("path")))
    A.str(op, "manager").get match {
      case "table" =>
        val tm = new TableManager(spark)
        fn match {
          case "compute_table_statistics" => tm.computeTableStatistics(s("table_or_view"))
          case "create_table" | "create_view" | "execute_sql" =>
            tm.executeSql(readSqlArg(), A.str(op, "delimiter").getOrElse(";"))
          case "create_tables" =>
            // comma-separated list of DDL file paths (reference create_many)
            s("path").split(",").map(_.trim).filter(_.nonEmpty).foreach(p =>
              tm.executeSql(readSqlFile(p)))
          case "drop_table" => tm.dropTable(s("table_or_view"))
          case "drop_view" => tm.dropView(s("table_or_view"))
          case "truncate" => tm.truncate(s("table_or_view"))
          case "vacuum" => tm.vacuum(A.str(op, "path").orElse(A.str(op, "table_or_view")).getOrElse(""),
            A.num(op, "vacuum_hours").map(_.toInt).getOrElse(168))
          case "describe" => tm.describe(s("table_or_view")).collect()
          case "optimize" => tm.optimize(storagePath(spark, op),
            A.num(op, "target_partitions").map(_.toInt).getOrElse(0),
            A.str(op, "optimize_zorder_col_list").toSeq
              .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
            // reference accepts the generic `where_clause` key here too
            // (`table_manager.py:164-167`)
            A.str(op, "optimize_where").orElse(A.str(op, "where_clause")),
            A.str(op, "optimize_curve").getOrElse("zorder"))
          case "show_tbl_properties" => tm.showTblProperties(s("table_or_view")).collect()
          case "get_tbl_pk" => tm.getTablePk(s("table_or_view"))
          case "repair_table" => tm.repairTable(s("table_or_view"))
          case "delete_where" =>
            tm.deleteWhere(storagePath(spark, op), s("where_clause"))
        }
        s"table/$fn: ok"
      case "file" =>
        val fm = new FileManager(spark)
        val dryRun = dryRunValue(op).fold(e => throw new RuntimeException(e), identity)
        def obj(bucketKey: String, objKey: String) =
          s(bucketKey).stripSuffix("/") + "/" + s(objKey).stripPrefix("/")
        fn match {
          case "delete_objects" =>
            val deleted = A.strSeq(op, "object_paths")
              .map(p => s("bucket").stripSuffix("/") + "/" + p.stripPrefix("/"))
              .map(p => p -> fm.delete(p, dryRun))
            s"file/delete_objects: ${deleted.count(_._2)}/${deleted.size}" +
              (if (dryRun) " (dry_run)" else "")
          case "copy_objects" =>
            // Hadoop copy/rename signal failure by RETURN VALUE: a
            // swallowed false would report "ok" for a copy that never
            // happened (and a follow-up source delete would lose data).
            if (!dryRun)
              require(fm.copy(obj("bucket", "source_object"),
                obj("destination_bucket", "destination_object")),
                s"copy_objects failed: ${obj("bucket", "source_object")}")
            s"file/copy_objects: ok" + (if (dryRun) " (dry_run)" else "")
          case "move_objects" =>
            if (!dryRun)
              require(fm.move(obj("bucket", "source_object"),
                obj("destination_bucket", "destination_object")),
                s"move_objects failed: ${obj("bucket", "source_object")}")
            s"file/move_objects: ok" + (if (dryRun) " (dry_run)" else "")
          case "request_restore" | "check_restore_status" |
               "request_restore_to_destination_and_wait" =>
            // Archive restores are issued through the native SigV4
            // client (graft.io.AwsSig — reference `core/s3_file_manager
            // .py` does the same calls via boto3) when an endpoint and
            // credentials resolve from the operation args or AWS_* env;
            // dry_run still only validates.
            if (dryRun) s"file/$fn: validated (dry_run)"
            else s3ClientFor(op) match {
              case None => throw new UnsupportedOperationException(
                s"$fn needs S3 access: set endpoint/region/access_key/" +
                  "secret_key on the operation or AWS_ENDPOINT_URL/" +
                  "AWS_REGION/AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY")
              case Some(client) =>
                val days = A.num(op, "restore_expiration").map(_.toInt).getOrElse(1)
                val tier = A.str(op, "retrieval_tier").getOrElse("Standard")
                fn match {
                  case "request_restore" =>
                    val outcome = client.requestRestore(
                      s("bucket"), s("source_object"), days, tier)
                    s"file/request_restore: ${outcome.describe}"
                  case "check_restore_status" =>
                    val st = client.restoreStatus(s("bucket"), s("source_object")) match {
                      case None => "not under restore"
                      case Some(true) => "in progress"
                      case Some(false) => "restored"
                    }
                    s"file/check_restore_status: $st"
                  case _ =>
                    client.restoreToDestinationAndWait(
                      s("bucket"), s("source_object"),
                      s("destination_bucket"), s("destination_object"),
                      days, tier,
                      pollMillis = A.num(op, "poll_interval_ms")
                        .map(_.toLong).getOrElse(30000L),
                      maxAttempts = A.num(op, "max_wait_attempts")
                        .map(_.toInt).getOrElse(240))
                    s"file/request_restore_to_destination_and_wait: copied"
                }
            }
        }
    }
  }
}
