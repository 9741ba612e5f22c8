package graft.streaming

import graft.functions.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vector ingest over a persisted [[IvfIndex]]: the embedding
  * counterpart of [[StreamingDedup]]. Each micro-batch is (optionally)
  * screened against the index AND within itself for near-duplicate
  * vectors (keep-lowest-id, mirroring StreamingDedup's two-stage clean),
  * the fresh vectors are written to the sink and appended to the
  * cell-partitioned index layout — cells are assigned with the EXISTING
  * centroids (the standard IVF ingest trade; retrain offline when drift
  * warrants).
  *
  * Same ordering discipline as StreamingDedup: the sink write happens
  * BEFORE the index append, so a failed sink cannot leave phantom vectors
  * in the index that would silently drop re-submitted near-identical
  * vectors forever; replay is at-least-once.
  */
object StreamingVectorIngest {

  /** One micro-batch: screen vs the index, then within the batch itself
    * (both only if `dedupThreshold` is set), sink, append. Returns the
    * fresh rows that reached the sink. */
  def ingestBatch(
      batch: DataFrame, idCol: String, vecCol: String,
      index: IvfIndex, indexLocation: String,
      sink: DataFrame => Unit,
      dedupThreshold: Option[Double] = None,
      nProbe: Int = 4,
      append: Boolean = true): (DataFrame, IvfIndex) = {
    // Lazy stage checkpoints (r20) — same contract, same single
    // materialization per stage (at the sink write), minus one dedicated
    // job per checkpoint; see StreamingPqIngest.ingestBatch.
    val b = batch.localCheckpoint(false)
    val fresh = dedupThreshold match {
      case None => b
      case Some(t) =>
        val dups = index.search(b, idCol, vecCol, k = 1, nProbe = nProbe)
          .where(col("score") >= t)
          .select(col("query_id").as(idCol)).distinct()
        // checkpoint: the within-batch pass references this subtree four
        // times (cell tagging, both vector joins, the final anti-join) —
        // without the cut each reference re-runs the index probe/search.
        val freshVsIndex = b.join(dups, Seq(idCol), "left_anti").localCheckpoint(false)
        // within-batch pass: near-dup vectors arriving in the SAME
        // micro-batch must not all survive; keep-lowest-id like
        // StreamingDedup (drop id_b of each verified pair).
        val innerDups = index
          .batchNearDuplicates(freshVsIndex, idCol, vecCol, t, nProbe)
          .select(col("id_b").as(idCol)).distinct()
        freshVsIndex.join(innerDups, Seq(idCol), "left_anti").localCheckpoint(false)
    }
    sink(fresh)
    val next =
      if (append) index.appendToPersisted(indexLocation, fresh, idCol, vecCol)
      else index
    (fresh, next)
  }

  /** Start the streaming query. `stream` must carry `idCol` and `vecCol`
    * (`array<float>`). The index state threads through batches on the
    * driver (foreachBatch runs there), re-reading the persisted layout
    * after each append. */
  def start(
      stream: DataFrame, idCol: String, vecCol: String,
      initial: IvfIndex, indexLocation: String,
      sinkDir: String, checkpointDir: String,
      dedupThreshold: Option[Double] = None,
      nProbe: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    @volatile var current = initial
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (_, next) = ingestBatch(batch, idCol, vecCol, current,
          indexLocation, _.write.mode("append").parquet(sinkDir),
          dedupThreshold, nProbe)
        current = next
        ()
      }
      .start()
  }
}
