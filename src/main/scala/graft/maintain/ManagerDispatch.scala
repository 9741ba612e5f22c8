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
        // Reference `core/file_manager.py:54-78` FileManagerFactory:
        // with S3 access configured, try the S3 manager and fall back to
        // the DBFS manager on generic failure — but re-raise
        // ValueError / NotImplementedError / RestoreTypeNotFound (our
        // IllegalArgumentException / UnsupportedOperationException)
        // untouched; `disable_dbfs_retry` pins S3 with no fallback.
        val dryRun = dryRunValue(op).fold(e => throw new RuntimeException(e), identity)
        val disableDbfsRetry = op.get("disable_dbfs_retry").contains(true)
        s3ClientFor(op) match {
          case Some(client) if disableDbfsRetry => runFileS3(op, fn, dryRun, client)
          case Some(client) =>
            try runFileS3(op, fn, dryRun, client)
            catch {
              case e: IllegalArgumentException => throw e
              case e: UnsupportedOperationException => throw e
              case _: Exception => runFileDbfs(spark, op, fn, dryRun)
            }
          case None => runFileDbfs(spark, op, fn, dryRun)
        }
    }
  }

  /** The reference S3 file manager surface (`s3_file_manager.py:129-148`
    * `get_function`): delete/copy + the Glacier restore flows;
    * `move_objects` is NOT in its function table and raises. */
  private def runFileS3(op: Map[String, Any], fn: String, dryRun: Boolean,
      client: graft.io.AwsSig.S3RestoreClient): String = {
    def s(k: String) = A.str(op, k).get
    import S3FileOps.pyDict
    // wait cadence is the reference's 5min-then-30s unless the op tunes
    // it (tests drive the protocol with millisecond waits)
    val poll = A.num(op, "poll_interval_ms").map(_.toLong)
    val ops = new S3FileOps(client,
      firstWaitMillis = poll.getOrElse(300000L),
      nextWaitMillis = poll.getOrElse(30000L),
      maxWaitAttempts = A.num(op, "max_wait_attempts").map(_.toInt).getOrElse(240))
    val days = A.num(op, "restore_expiration").map(_.toInt).getOrElse(1)
    val tier = A.str(op, "retrieval_tier").getOrElse("Standard")
    fn match {
      case "delete_objects" =>
        val paths = A.strSeq(op, "object_paths")
        if (dryRun)
          s"file/delete_objects (dry_run): Paths that would be deleted: " +
            pyDict(ops.dryRun(s("bucket"), paths))
        else {
          ops.deleteObjects(s("bucket"), paths)
          s"file/delete_objects: ok"
        }
      case "copy_objects" =>
        if (dryRun)
          s"file/copy_objects (dry_run): Paths that would be copied: " +
            pyDict(ops.dryRun(s("bucket"), Seq(s("source_object"))))
        else {
          val written = ops.copyObjects(s("bucket"), s("source_object"),
            s("destination_bucket"), s("destination_object"))
          s"file/copy_objects: ok (${written.size} objects)"
        }
      case "request_restore" =>
        if (dryRun)
          s"file/request_restore (dry_run): Paths that would be restored: " +
            pyDict(ops.requestRestore(s("bucket"), s("source_object"), days,
              tier, dry = true))
        else {
          ops.requestRestore(s("bucket"), s("source_object"), days, tier,
            dry = false)
          s"file/request_restore: ok"
        }
      case "check_restore_status" =>
        val st = ops.checkRestoreStatus(s("bucket"), s("source_object"))
        (st.log :+
          (s"Restore status: - Not Started: ${st.notStarted} " +
            s"- Ongoing: ${st.ongoing} - Restored: ${st.restored} " +
            s"Total objects in this restore process: ${st.total}")).mkString("\n")
      case "request_restore_to_destination_and_wait" =>
        // restore + wait, then the same copy choreography (+dry-run
        // passthrough) as the reference
        // (`s3_file_manager.py:268-305`).
        ops.requestRestoreAndWait(s("bucket"), s("source_object"), days,
          tier, dryRun)
        if (dryRun)
          s"file/request_restore_to_destination_and_wait (dry_run): " +
            "Paths that would be copied: " +
            pyDict(ops.dryRun(s("bucket"), Seq(s("source_object"))))
        else {
          val written = ops.copyObjects(s("bucket"), s("source_object"),
            s("destination_bucket"), s("destination_object"))
          s"file/request_restore_to_destination_and_wait: copied " +
            s"(${written.size} objects)"
        }
      case other => throw new UnsupportedOperationException(
        s"The requested function $other is not implemented.")
    }
  }

  /** The reference DBFS file manager surface
    * (`dbfs_file_manager.py:85-101` `get_function`): delete/copy/move
    * through the filesystem API (Hadoop FileSystem here — local, HDFS
    * and s3a uniformly); the restore family is S3-only and raises. */
  private def runFileDbfs(spark: SparkSession, op: Map[String, Any],
      fn: String, dryRun: Boolean): String = {
    def s(k: String) = A.str(op, k).get
    import S3FileOps.pyDict
    val fm = new FileManager(spark)
    // reference `_get_path` (`dbfs_file_manager.py:56-76`): non-empty
    // bucket prefixes the path; empty bucket means the path is complete
    def joined(bucket: String, path: String): String =
      if (bucket.trim.isEmpty) path.trim
      else bucket.stripSuffix("/") + "/" + path.stripPrefix("/")
    def dict(paths: Seq[String]): String = pyDict(paths.map { p =>
      val full = joined(A.str(op, "bucket").getOrElse(""), p)
      val listed = fm.listFilesRecursively(full)
      full -> (if (listed.nonEmpty) listed else Seq("No such key"))
    })
    fn match {
      case "delete_objects" =>
        val paths = A.strSeq(op, "object_paths")
        if (dryRun)
          s"file/delete_objects (dry_run): Paths that would be deleted: " +
            dict(paths)
        else {
          paths.map(p => joined(s("bucket"), p)).foreach(p =>
            require(fm.delete(p), s"Not able to delete: $p"))
          s"file/delete_objects: ok"
        }
      case "copy_objects" =>
        if (dryRun)
          s"file/copy_objects (dry_run): Paths that would be copied: " +
            dict(Seq(s("source_object")))
        else {
          // Hadoop copy/rename signal failure by RETURN VALUE: a
          // swallowed false would report "ok" for a copy that never
          // happened (and a follow-up source delete would lose data).
          require(fm.copy(joined(s("bucket"), s("source_object")),
            joined(s("destination_bucket"), s("destination_object"))),
            s"copy_objects failed: ${joined(s("bucket"), s("source_object"))}")
          s"file/copy_objects: ok"
        }
      case "move_objects" =>
        if (dryRun)
          s"file/move_objects (dry_run): Paths that would be moved: " +
            dict(Seq(s("source_object")))
        else {
          require(fm.move(joined(s("bucket"), s("source_object")),
            joined(s("destination_bucket"), s("destination_object"))),
            s"move_objects failed: ${joined(s("bucket"), s("source_object"))}")
          s"file/move_objects: ok"
        }
      case other => throw new UnsupportedOperationException(
        s"The requested function $other is not implemented.")
    }
  }
}
