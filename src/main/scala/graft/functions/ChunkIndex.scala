package graft.functions

import org.apache.spark.sql.DataFrame

/** Parameter sidecar for the persisted CHUNK-HASH dedup index (round 19):
  * the chunk-dedup store is a bare parquet hash set, and a `chunk_tokens`
  * drift between the ACON that seeded it and the ACON that runs against
  * it would hash incoming chunks at a different granularity — never
  * matching any indexed hash and silently missing every duplicate, the
  * exact failure class the minhash `__meta.json` sibling closes
  * ([[MinhashIndex.Meta]]). The sidecar disciplines (sibling placement,
  * atomic overwrite-rename, drop-before-store-overwrite, loud torn-file
  * errors) are shared with the minhash store via [[MetaSidecar]].
  */
object ChunkIndex {

  final case class Meta(chunkTokens: Int)

  def writeMeta(
      conf: org.apache.hadoop.conf.Configuration, location: String, m: Meta): Unit =
    MetaSidecar.write(conf, location,
      s"""{"chunk_tokens":${m.chunkTokens}}""", "chunk index meta")

  /** Seed (overwrite) a chunk-hash store from a corpus and persist its
    * granularity sidecar. The stale sidecar (if any) is dropped BEFORE
    * the store overwrite: a crash between the new store's commit and the
    * new sidecar's write must leave a loud missing-meta store, never a
    * sidecar describing the PREVIOUS seed's granularity — which the run
    * faces would trust, silently missing every duplicate while rejecting
    * the correct value as a contradiction. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      location: String, chunkTokens: Int): Unit = {
    val conf = corpus.sparkSession.sparkContext.hadoopConfiguration
    MetaSidecar.delete(conf, location)
    DedupFunctions.chunkHashIndex(corpus, idCol, textCol, chunkTokens)
      .write.mode("overwrite").parquet(location)
    writeMeta(conf, location, Meta(chunkTokens))
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
  def readMeta(location: String): Option[Meta] =
    MetaSidecar.read(location, "chunk index meta",
      "re-seed the index (write_type index_build) or delete the meta " +
        "file and state chunk_tokens explicitly") { root =>
      require(root.hasNonNull("chunk_tokens"), "missing field chunk_tokens")
      Meta(root.get("chunk_tokens").asInt)
    }
}
