package graft.functions

/** Parameter sidecar for the persisted CHUNK-HASH dedup index (round 19):
  * the chunk-dedup store is a bare parquet hash set, and a `chunk_tokens`
  * drift between the ACON that seeded it and the ACON that runs against
  * it would hash incoming chunks at a different granularity — never
  * matching any indexed hash and silently missing every duplicate, the
  * exact failure class the minhash `__meta.json` sibling closes
  * ([[MinhashIndex.Meta]]). Same discipline: a SIBLING file (compaction
  * atomically swaps the store dir), write-temp-then-rename, loud errors
  * on a torn file.
  */
object ChunkIndex {

  final case class Meta(chunkTokens: Int)

  private def metaPath(location: String) =
    new org.apache.hadoop.fs.Path(location.stripSuffix("/") + "__meta.json")

  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def writeMeta(
      conf: org.apache.hadoop.conf.Configuration, location: String, m: Meta): Unit = {
    val p = metaPath(location)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"chunk_tokens":${m.chunkTokens}}""".getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"chunk index meta rename $tmp -> $p failed")
  }

  /** Guard for path-taking consumers (the streaming face's
    * [[graft.streaming.StreamingChunkDedup.dedupBatch]] and anything
    * else probing a persisted store by location): when the store carries
    * a sidecar, the caller's granularity must MATCH it — a drift hashes
    * probe chunks at a different granularity and silently misses every
    * duplicate. Pre-sidecar stores pass through unchecked (the caller's
    * value is all there is). One exists()+read per call — noise next to
    * the anti-join it protects. */
  def validate(location: String, stated: Int): Unit =
    readMeta(location).filter(_.chunkTokens != stated).foreach(m => sys.error(
      s"chunk index at $location was seeded with chunk_tokens=" +
        s"${m.chunkTokens} but the caller probes with chunk_tokens=" +
        s"$stated — chunks would hash at a different granularity and " +
        "silently miss every duplicate; pass chunkTokens=" +
        s"${m.chunkTokens} or re-seed the index"))

  /** The persisted chunk granularity, when the store has it (stores
    * seeded before round 19 have no sidecar — callers keep passing the
    * parameter explicitly). A sidecar that exists but does not parse
    * fails loudly with a recovery hint. */
  def readMeta(location: String): Option[Meta] = {
    val p = metaPath(location)
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) None
    else {
      // read under the same loud-error umbrella as the parse: a torn
      // file on a checksummed FS fails at open/read, not at Jackson
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
        require(root.hasNonNull("chunk_tokens"), "missing field chunk_tokens")
        Some(Meta(root.get("chunk_tokens").asInt))
      } catch {
        case e: Exception => sys.error(
          s"chunk index meta at $p exists but is unreadable " +
            s"(${e.getMessage}) — re-seed the index (write_type " +
            "index_build) or delete the meta file and state chunk_tokens " +
            "explicitly")
      }
    }
  }
}
