package graft.io

import java.io.InputStream
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import scala.util.control.NonFatal

/** Sharepoint ingestion/upload behind a pluggable Graph-API-shaped
  * transport (reference `io/readers/sharepoint_reader.py:26-320`,
  * `io/writers/sharepoint_writer.py:41-106`,
  * `utils/sharepoint_utils.py:30-660`).
  *
  * The reference talks to MS Graph (`sites/{site}/drives/{drive}/items`)
  * with msal auth, chunked downloads and conflict-aware uploads; everything
  * Spark-side is "stage the file locally, read/write it with Spark, archive
  * the remote file". This build keeps that exact shape but isolates the
  * Graph surface in [[SharepointTransport]] (exists/list/download/upload/
  * move): the zero-egress build ships a local-drive impl used by tests; a
  * Graph HTTP impl is a drop-in without touching the read/write paths.
  *
  * Scale note: like the reference, this is a driver-staged, single-file
  * channel for partner/report exchange — control-plane-sized data, not the
  * 100 TB path. The writer's single-file constraint is the reference's own
  * documented behavior (`sharepoint_writer.py:20-27`).
  */
object SharepointIo {

  /** Graph-API-shaped surface: paths are drive-relative, '/'-separated. */
  trait SharepointTransport {
    /** True if the folder or file exists in the drive. */
    def exists(path: String): Boolean
    /** Names of files (not folders) directly inside `folder`. */
    def list(folder: String): Seq[String]
    def download(path: String): InputStream
    /** Upload bytes to `path`. `conflictBehaviour`: replace | fail. */
    def upload(path: String, data: Array[Byte], conflictBehaviour: String): Unit
    /** Move a file into `toFolder` (creating it), keeping the basename. */
    def move(path: String, toFolder: String): Unit
  }

  /** Local-directory drive: the test/reference implementation. A drive's
    * root maps to a local dir; drive-relative paths nest under it. */
  final class LocalDriveTransport(root: String) extends SharepointTransport {
    private def p(rel: String): Path = Paths.get(root, rel.split("/").toSeq: _*)
    def exists(path: String): Boolean = Files.exists(p(path))
    def list(folder: String): Seq[String] = {
      val dir = p(folder)
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isRegularFile(_))
            .map(_.getFileName.toString).toList.sorted
        } finally s.close()
      }
    }
    def download(path: String): InputStream = Files.newInputStream(p(path))
    def upload(path: String, data: Array[Byte], conflictBehaviour: String): Unit = {
      val target = p(path)
      if (Files.exists(target) && conflictBehaviour == "fail")
        sys.error(s"sharepoint upload conflict: $path exists (conflict_behaviour=fail)")
      Files.createDirectories(target.getParent)
      Files.write(target, data)
    }
    def move(path: String, toFolder: String): Unit = {
      val from = p(path)
      val dir = p(toFolder)
      Files.createDirectories(dir)
      Files.move(from, dir.resolve(from.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private val transports =
    scala.collection.concurrent.TrieMap.empty[String, SharepointTransport]

  /** Register a transport under a name referenced by option `transport`. */
  def register(name: String, transport: SharepointTransport): Unit =
    transports(name) = transport

  /** Resolve `transport`: a registered name, or `local:<dir>` to construct
    * a [[LocalDriveTransport]] on the fly. */
  private def transportFor(options: Map[String, String]): SharepointTransport = {
    val name = options.getOrElse("transport",
      sys.error("sharepoint io needs a `transport` option"))
    if (name.startsWith("local:")) new LocalDriveTransport(name.stripPrefix("local:"))
    else transports.getOrElse(name,
      sys.error(s"no Sharepoint transport registered as '$name'"))
  }

  private val Formats = Set("csv", "json")

  private def fmtOf(options: Map[String, String], path: String): String = {
    // Scan ALL dot segments for a known format so compressed names
    // ("jan.csv.gz") resolve to csv, not gz; Spark decompresses by the
    // trailing extension on its own.
    val fromExt = path.toLowerCase.split('.').drop(1).findLast(Formats.contains)
    val fmt = options.get("file_type").map(_.toLowerCase).orElse(fromExt)
      .getOrElse(sys.error("sharepoint reader needs file_type or a file extension"))
    require(Formats(fmt),
      s"sharepoint file_type must be one of $Formats, got '$fmt' " +
        "(the reference's Excel reader needs a spreadsheet lib not in this build)")
    fmt
  }

  /** fnmatch-style pattern (reference `sharepoint_reader.py:4,143`). */
  private def fnmatch(pattern: String, name: String): Boolean =
    name.matches(pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    })

  private def sparkOpts(options: Map[String, String]): Map[String, String] =
    options -- Seq("transport", "folder_relative_path", "file_name",
      "file_pattern", "file_type", "file_metadata", "archive",
      "archive_success_subfolder", "archive_error_subfolder",
      "conflict_behaviour", "expected_columns")

  // ------------------------------------------------------------------
  // CSV delimiter resolution (`sharepoint_reader.py:470-598`
  // `SharepointCsvReader.detect_delimiter` / `resolve_spark_csv_options`):
  // an explicit `sep`/`delimiter` wins (sep over delimiter); otherwise
  // the delimiter is sniffed from the file's first line over the
  // reference's candidate set ";,|\t" (comma fallback on undecodable or
  // delimiter-free content), with the reference's expected-columns
  // warnings. Pinned verbatim by ReferenceSharepointCsvSpec against
  // `tests/unit/test_sharepoint_csv_reader.py`.
  // ------------------------------------------------------------------

  private val SniffCandidates = Seq(';', ',', '|', '\t')

  /** Strict UTF-8 decode (like Python `bytes.decode` — malformed input
    * raises instead of replacing). */
  private def decodeUtf8(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** `detect_delimiter`: explicit delimiter wins; else sniff the first
    * line (most frequent candidate), warning on suspicious column counts;
    * comma fallback when sniffing fails. */
  def detectDelimiter(fileContent: Array[Byte],
      providedDelimiter: Option[String] = None,
      expectedColumns: Option[Seq[String]] = None,
      warn: String => Unit = _ => ()): String =
    providedDelimiter.filter(_.nonEmpty).getOrElse {
      try {
        val text = decodeUtf8(fileContent)
        val firstLine = text.linesIterator.toSeq.headOption.getOrElse("").trim
        val counts = SniffCandidates.map(c => c -> firstLine.count(_ == c))
        val (detected, n) = counts.maxBy(_._2)
        if (n == 0) throw new IllegalArgumentException("Could not determine delimiter")
        val actualColumnCount = firstLine.split(
          java.util.regex.Pattern.quote(detected.toString), -1).length
        expectedColumns match {
          case Some(exp) if actualColumnCount != exp.length =>
            warn(s"Detected delimiter '$detected' resulted in $actualColumnCount " +
              s"columns, but ${exp.length} were expected. Consider specifying " +
              "the delimiter explicitly.")
          case None if actualColumnCount <= 1 =>
            warn(s"Detected delimiter '$detected' resulted in only " +
              s"$actualColumnCount column. Consider specifying the delimiter " +
              "explicitly in 'sharepoint_opts.local_options'.")
          case _ => ()
        }
        detected.toString
      } catch {
        case NonFatal(e) =>
          warn(s"Failed to auto-detect delimiter. Defaulting to comma. Reason: $e")
          ","
      }
    }

  /** `resolve_spark_csv_options`: sep > delimiter > sniffed; `delimiter`
    * is dropped from the returned options (Spark uses `sep`); expected
    * columns validated against the header with the reference's warning
    * texts. */
  def resolveSparkCsvOptions(localOptions: Map[String, String],
      fileContent: Array[Byte],
      warn: String => Unit = _ => ()): Map[String, String] = {
    val userDelimiter = localOptions.get("sep")
      .orElse(localOptions.get("delimiter"))
    val expectedColumns = localOptions.get("expected_columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val finalDelimiter0 =
      detectDelimiter(fileContent, userDelimiter, expectedColumns, warn)
    expectedColumns.foreach { exp =>
      try {
        val headerLine = decodeUtf8(fileContent).linesIterator.toSeq
          .headOption.getOrElse("").trim
        val actual = headerLine.split(
          java.util.regex.Pattern.quote(finalDelimiter0), -1).map(_.trim).toSeq
        if (actual.map(_.toLowerCase) != exp.map(_.trim.toLowerCase))
          warn(s"Expected columns don't match CSV header using delimiter " +
            s"'$finalDelimiter0'. Expected: $exp vs. Actual: $actual. The read " +
            "will proceed; consider specifying the correct delimiter or " +
            "updating expected_columns.")
      } catch {
        case NonFatal(e) =>
          warn("Failed to validate expected_columns against CSV header. " +
            s"The read will proceed. Reason: $e")
      }
    }
    val finalDelimiter = if (finalDelimiter0.isEmpty) "," else finalDelimiter0
    (localOptions - "delimiter" - "expected_columns") + ("sep" -> finalDelimiter)
  }

  /** Resolve the reference's folder/file path rules
    * (`sharepoint_reader.py:39-61`): folder+file_name, a full path with an
    * extension, or a folder (optionally pattern-filtered). Returns
    * (folder, Seq(fileName)). */
  private def resolveTargets(t: SharepointTransport,
      options: Map[String, String]): (String, Seq[String]) = {
    val folderOpt = options.get("folder_relative_path").map(_.stripSuffix("/"))
    val fileName = options.get("file_name")
    (folderOpt, fileName) match {
      case (Some(folder), Some(name)) =>
        val folderBase = folder.split('/').last
        require(!folderBase.contains("."),
          s"Invalid path setup: `folder_relative_path` ('$folder') appears to " +
            s"include a file, but `file_name` ('$name') was also provided. " +
            "Provide either a folder+file_name, or a full file path, not both.")
        (folder, Seq(name))
      case (Some(path), None) if path.split('/').last.contains(".") =>
        val parts = path.split('/')
        (parts.dropRight(1).mkString("/"), Seq(parts.last))
      case (Some(folder), None) =>
        require(t.exists(folder), s"Folder '$folder' does not exist in Sharepoint.")
        val pattern = options.get("file_pattern")
        val files = t.list(folder).filter(n => pattern.forall(fnmatch(_, n)))
        require(files.nonEmpty, "No files were found with the specified parameters.")
        (folder, files)
      case (None, _) =>
        sys.error("sharepoint reader needs folder_relative_path (and/or file_name)")
    }
  }

  /** Read file(s) from a Sharepoint drive. Options (ACON surface):
    *   - `transport`: registered name or `local:<dir>` (mandatory)
    *   - `folder_relative_path` / `file_name` / `file_pattern`: reference
    *     path rules (single file, full path, or fnmatch-filtered folder)
    *   - `file_type`: csv | json (else derived from the extension)
    *   - `file_metadata`: "true" adds a `filename` column
    *   - `archive`: "true" moves each file after the read into
    *     `archive_success_subfolder` (default "done") or, on failure,
    *     `archive_error_subfolder` (default "error")
    *   - remaining options pass through to the Spark file reader.
    */
  def read(spark: SparkSession, options: Map[String, String]): DataFrame = {
    val t = transportFor(options)
    val (folder, names) = resolveTargets(t, options)
    // One format per read: a folder pattern that matches mixed
    // .csv/.json files must not be silently parsed with the first
    // file's format (wrong rows, no error). With explicit `file_type`
    // fmtOf ignores extensions, so this collapses to one element.
    val fmts = names.map(fmtOf(options, _)).distinct
    require(fmts.size == 1,
      s"sharepoint folder read matched files with mixed formats $fmts " +
        s"(${names.mkString(", ")}); pass file_type explicitly or narrow file_pattern")
    val fmt = fmts.head
    val withMeta = options.get("file_metadata").contains("true")
    val archive = options.get("archive").contains("true")
    val doneDir = s"$folder/${options.getOrElse("archive_success_subfolder", "done")}"
    val errDir = s"$folder/${options.getOrElse("archive_error_subfolder", "error")}"

    val spool = Files.createTempDirectory("graft-sharepoint-")
    spool.toFile.deleteOnExit()
    try {
      val staged = names.zipWithIndex.map { case (name, i) =>
        val local = spool.resolve(f"$i%05d-$name")
        // deleteOnExit per FILE: a dir-only registration is a no-op on a
        // non-empty dir, leaking the staged bytes of every read for the
        // lifetime of a long-running driver.
        local.toFile.deleteOnExit()
        val in = t.download(s"$folder/$name")
        try Files.copy(in, local, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        require(Files.size(local) > 0,
          s"File '$folder/$name' is empty or could not be downloaded.")
        (name, local)
      }
      // csv reads resolve their delimiter from the first file's head
      // bytes (explicit sep/delimiter wins; sniffed otherwise)
      val readOpts =
        if (fmt != "csv") sparkOpts(options)
        else {
          val head = new Array[Byte](8192)
          val in = Files.newInputStream(staged.head._2)
          val n = try in.read(head) finally in.close()
          // a full buffer may end mid-multibyte-char: cut at the last
          // newline so strict UTF-8 decoding can't fail on a torn tail
          val end =
            if (n < head.length) math.max(n, 0)
            else { val nl = head.lastIndexOf('\n'.toByte); if (nl > 0) nl else n }
          resolveSparkCsvOptions(
            sparkOpts(options) ++ options.get("expected_columns").map("expected_columns" -> _),
            java.util.Arrays.copyOf(head, end),
            w => Console.err.println(s"[graft] sharepoint csv: $w"))
        }
      val df =
        if (!withMeta)
          spark.read.format(fmt).options(readOpts).load(spool.toString)
        else staged.map { case (name, local) =>
          spark.read.format(fmt).options(readOpts).load(local.toString)
            .withColumn("filename", lit(s"$folder/$name"))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
      if (archive) {
        // Materialize with a LINEAGE CUT before moving the remote files
        // and deleting the spool copies: a plain cache().count() leaves
        // the file scan in the lineage, so an evicted/unpersisted cache
        // would recompute from files that no longer exist. After
        // localCheckpoint the returned plan holds the rows themselves.
        // Each done-move is BEST-EFFORT: one failed move must not fail
        // the whole read — a file that stays in the folder is re-read
        // next run (duplicate, recoverable), whereas failing here would
        // strand the already-done files as ingested-but-never-consumed
        // (silent loss).
        val materialized = df.localCheckpoint()
        names.foreach { n =>
          try t.move(s"$folder/$n", doneDir) catch {
            case NonFatal(e) => Console.err.println(
              s"[graft] sharepoint archive move '$folder/$n' -> '$doneDir' failed " +
                s"(file will be re-read next run): $e")
          }
        }
        // the checkpointed df no longer needs the spool copies
        staged.foreach { case (_, local) => Files.deleteIfExists(local) }
        materialized
      } else df
    } catch {
      case NonFatal(e) =>
        if (archive) names.foreach { n =>
          try t.move(s"$folder/$n", errDir) catch {
            case NonFatal(e2) => Console.err.println(
              s"[graft] sharepoint error-archive move '$folder/$n' -> '$errDir' failed: $e2")
          }
        }
        throw e
    }
  }

  /** Upload a DataFrame as ONE file to a Sharepoint drive (the reference
    * writer's documented single-file contract). Batch only. Options:
    * `transport`, `folder_relative_path`, `file_name`, `file_type`
    * (csv|json, else from extension), `conflict_behaviour` (replace|fail,
    * default replace); remaining options pass to the Spark file writer. */
  def write(df: DataFrame, options: Map[String, String]): Unit = {
    require(!df.isStreaming, "Sharepoint writer doesn't support streaming!")
    val t = transportFor(options)
    val folder = options.getOrElse("folder_relative_path",
      sys.error("sharepoint writer needs folder_relative_path")).stripSuffix("/")
    val name = options.getOrElse("file_name",
      sys.error("sharepoint writer needs file_name"))
    require(t.exists(folder), "The provided endpoint does not exist!")
    val fmt = fmtOf(options, name)
    val conflict = options.getOrElse("conflict_behaviour", "replace")

    val stage = Files.createTempDirectory("graft-sharepoint-out-")
    try {
      // coalesce(1): the remote side is a single file by contract.
      df.coalesce(1).write.format(fmt).options(sparkOpts(options))
        .save(stage.resolve("out").toString)
      val part = {
        val s = Files.list(stage.resolve("out"))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.find(p =>
            p.getFileName.toString.startsWith("part-")).getOrElse(
            sys.error("sharepoint writer: no part file produced"))
        } finally s.close()
      }
      t.upload(s"$folder/$name", Files.readAllBytes(part), conflict)
    } finally {
      // best-effort local cleanup (reference delete_local_path)
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try { import scala.jdk.CollectionConverters._
            s.iterator().asScala.toList.foreach(rm)
          } finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(stage)
    }
  }
}
