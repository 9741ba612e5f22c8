package graft.streaming

import graft.functions.DedupFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest face of chunk-granularity exact-substring dedup —
  * the continuous-ingest shape of [[graft.functions.DedupFunctions
  * .chunkDedup]], completing the family matrix alongside the minhash
  * ([[StreamingDedup]]) and vector ([[StreamingVectorIngest]] /
  * [[StreamingPqIngest]]) streaming faces.
  *
  * Each micro-batch anti-joins its chunk hashes against the persisted
  * hash-only index (`chunkHashIndex` layout — 32-byte md5 per distinct
  * corpus chunk, corpus text never lands in it), drops within-batch
  * repeats at global (id, pos) first occurrence, reassembles survivors,
  * writes them to the sink, and only then appends the survivors' chunk
  * hashes to the index — the same sink-before-append ordering as
  * [[StreamingDedup.dedupBatch]] (a failed sink write must not leave
  * phantom hashes that silently drop re-submitted text forever).
  *
  * Replay is BENIGN in both failure orders — the family contract, shared
  * with the minhash face since it moved to appending all corpus-fresh
  * signatures ([[StreamingDedup.dedupBatch]]): the batch computation is a pure
  * function of (batch, index state) — sink-failed replays recompute the
  * identical survivors; and a replay AFTER a successful append drains to
  * empty (every batch chunk is then either indexed from the corpus or a
  * within-batch dup of a surviving chunk whose hash just landed —
  * full chunks are exactly `chunkTokens` tokens, so survivor clean_text
  * re-chunks to exactly the kept chunks; pinned as a PropertySpec law),
  * so a sink that deduplicates nothing still sees each clean_text at
  * most twice, never a growing replay tail.
  */
object StreamingChunkDedup {

  /** One micro-batch of the plan — exposed for batch-mode reuse and
    * direct testing. Returns the surviving reassembled docs
    * (id, clean_text, kept_chunks, total_chunks); fully-duplicate
    * documents vanish. Set `append = false` for a pure evaluation of
    * the batch semantics against the current index state. */
  def dedupBatch(
      batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, chunkTokens: Int,
      sink: DataFrame => Unit,
      append: Boolean = true): DataFrame = {
    // a store seeded with a chunk_tokens sidecar (r19) rejects a
    // contradicting granularity here too, not only on the ACON route —
    // the drift silently misses every duplicate
    graft.functions.ChunkIndex.validate(indexPath, chunkTokens)
    // lazy stage checkpoints (r20) — same single materialization per
    // stage (at the sink write), minus one dedicated job per checkpoint;
    // see StreamingPqIngest.ingestBatch
    val b = batch.localCheckpoint(false) // bounded; avoids re-running the source
    val index = b.sparkSession.read.parquet(indexPath)
    val survivors = DedupFunctions.chunkDedupAgainstIndex(
        b, index, idCol, textCol, chunkTokens)
      .localCheckpoint(false) // the sink write and the index append read this
    sink(survivors)
    if (append)
      DedupFunctions.appendToChunkIndex(
        survivors, idCol, "clean_text", indexPath, chunkTokens)
    survivors
  }

  /** Start the streaming query. `stream` must be a streaming DataFrame
    * with `idCol` and `textCol`; `indexPath` must hold an existing
    * `chunkHashIndex` parquet (seed it from the corpus, or write an
    * empty one for a cold start). If the store carries a `chunk_tokens`
    * sidecar ([[graft.functions.ChunkIndex]]), `chunkTokens` must match
    * it — the first micro-batch fails loudly otherwise. */
  def start(
      stream: DataFrame, idCol: String, textCol: String,
      indexPath: String, sinkDir: String, checkpointDir: String,
      chunkTokens: Int = 5,
      compactEvery: Int = 0,
      compactFiles: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      prepare: DataFrame => DataFrame = identity): StreamingQuery =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(prepare(batch), idCol, textCol, indexPath, chunkTokens,
          _.write.mode("append").parquet(sinkDir))
        // Periodic index maintenance: each batch appends one file, so
        // without this the anti-join side degenerates into a
        // small-files scan over the ingest lifetime. Runs AFTER the
        // sink+append (single writer; a replayed batch re-runs the
        // compaction harmlessly — it is semantics-neutral by law).
        // `compactFiles` keys the cadence on the store's file count
        // (the degradation signal itself — see the r18 soak's IVFADC
        // listing cliff); `compactEvery` keeps the cycles spelling.
        if (compactFiles > 0)
          graft.maintain.IndexMaintenance.compactIfNeeded(
            batch.sparkSession, indexPath, maxFiles = compactFiles,
            distinctRows = true)
        else if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          DedupFunctions.compactChunkIndex(batch.sparkSession, indexPath)
        ()
      }
      .start()
}
