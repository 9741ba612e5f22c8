package graft.functions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** Shared sidecar IO for self-describing persisted indexes (round 19):
  * [[MinhashIndex]] and [[ChunkIndex]] both persist their build
  * parameters as a `<location>__meta.json` SIBLING file (sibling, not a
  * file inside the store dir, because the bin-pack compaction atomically
  * swaps the store dir), and both need the same three disciplines —
  * previously duplicated near-verbatim in each object, where a fix to
  * one had to be remembered in the other:
  *
  *  1. WRITE is atomic-overwrite: temp file + rename-with-OVERWRITE via
  *     [[FileContext]], so on filesystems with atomic rename there is NO
  *     window in which the sidecar is missing or torn (the plain
  *     `FileSystem.rename` cannot overwrite, and the delete-then-rename
  *     it forces leaves a missing-sidecar window that silently downgrades
  *     the store to unvalidated pre-meta semantics). Filesystems without
  *     an AbstractFileSystem binding fall back to delete+rename — whose
  *     worst crash state is a MISSING sidecar (loud or legacy-explicit
  *     open), never a torn one.
  *  2. DROP runs before a store overwrite: a crash between the new
  *     store's commit and the new sidecar's write must leave a loud
  *     missing-meta store, never a STALE sidecar describing the previous
  *     build's parameters — which `open(location)` would trust, silently
  *     mis-hashing every probe against the new store while rejecting the
  *     correct parameters as a contradiction.
  *  3. READ sits under one loud-error umbrella covering the FS read AND
  *     the JSON parse: a torn file on a checksummed FS surfaces as a
  *     ChecksumException at open/read, not at Jackson, and either way the
  *     caller gets the recovery hint instead of a bare stack trace.
  */
private[graft] object MetaSidecar {

  def path(location: String): Path =
    new Path(location.stripSuffix("/") + "__meta.json")

  private def activeConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Atomically (re)write the sidecar. `what` names the store family in
    * failure messages ("minhash meta", "chunk index meta"). */
  def write(conf: Configuration, location: String, json: String, what: String): Unit = {
    val p = path(location)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
    try FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding for this scheme: fall back to the
        // non-atomic pair — crash window is a MISSING sidecar, never torn
        fs.delete(p, false)
        require(fs.rename(tmp, p), s"$what rename $tmp -> $p failed")
    }
  }

  /** Drop the sidecar if present — call BEFORE overwriting the store it
    * describes (discipline 2 above). */
  def delete(conf: Configuration, location: String): Unit = {
    val p = path(location)
    p.getFileSystem(conf).delete(p, false)
    ()
  }

  /** The parsed sidecar, or None when the store has none (stores seeded
    * before round 19 — callers keep passing parameters explicitly). A
    * sidecar that EXISTS but cannot be read or parsed fails loudly with
    * `recoveryHint` appended. */
  def read[T](location: String, what: String, recoveryHint: String)(
      parse: com.fasterxml.jackson.databind.JsonNode => T): Option[T] = {
    val p = path(location)
    val fs = p.getFileSystem(activeConf())
    if (!fs.exists(p)) None
    else {
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(parse(new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)))
      } catch {
        case e: Exception => sys.error(
          s"$what at $p exists but is unreadable (${e.getMessage}) — $recoveryHint")
      }
    }
  }
}
