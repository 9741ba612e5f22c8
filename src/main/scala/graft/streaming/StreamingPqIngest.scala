package graft.streaming

import graft.functions.IvfPqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming IVFADC ingest: the PQ-coded composition of
  * [[StreamingVectorIngest]] (IVF-Flat screen + cell append) with the
  * [[graft.functions.IvfPq]] residual path. Each micro-batch is
  * optionally screened against the index by residual ADC distance
  * (cheap: distance tables against m-byte codes, never raw vectors) and
  * within itself at quantization granularity, then the fresh vectors are
  * written to the sink and appended to the cell-partitioned codes store
  * PQ-CODED — the streamed rows land in exactly the q108 store layout
  * (id, cell, codes), so a probe after ingest partition-prunes over both
  * built and streamed vectors identically.
  *
  * Cells are assigned with the EXISTING centroids and codes with the
  * EXISTING codebooks (the standard IVF ingest trade; retrain offline
  * when drift warrants). Same ordering discipline as StreamingDedup /
  * StreamingVectorIngest: sink BEFORE index append, so a failed sink
  * cannot leave phantom codes that would silently swallow re-submitted
  * vectors; replay is at-least-once.
  */
object StreamingPqIngest {

  /** One micro-batch. The screen (on by default) drops, in order:
    *
    *  1. QUANTIZATION-IDENTICAL vs the store — same (cell, codes) as an
    *     existing entry. This is the exact duplicate test at the
    *     resolution the store itself has (an exact re-submission always
    *     quantizes identically, regardless of codebook quality — an ADC
    *     radius alone cannot promise that, because a duplicate's ADC
    *     distance equals the stored vector's quantization error);
    *  2. optionally, vectors within `dedupMaxDist` residual ADC distance
    *     of an existing entry (near-dup radius, domain-tuned);
    *  3. within-batch quantization-identical arrivals — one window over
    *     the encoded batch keeps the lowest id, no self-join.
    *
    * Then sink the fresh rows and append them PQ-coded. Returns
    * (fresh rows, extended index). */
  def ingestBatch(
      batch: DataFrame, idCol: String, vecCol: String,
      index: IvfPqIndex, indexLocation: String,
      sink: DataFrame => Unit,
      dedup: Boolean = true,
      dedupMaxDist: Option[Double] = None,
      nProbe: Int = 4,
      append: Boolean = true): (DataFrame, IvfPqIndex) = {
    // All three stage checkpoints are LAZY (r20): each still materializes
    // exactly once — at its first consuming action (ultimately the sink
    // write) — and later consumers (the index append, the caller) read
    // the persisted blocks, so the replay contract is unchanged; what
    // disappears is the dedicated materialization job each eager
    // checkpoint paid per micro-batch (3 jobs at gate scale).
    val b = batch.localCheckpoint(false)
    val fresh = if (!dedup) b else {
      val tagged = b
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
          graft.functions.IvfPq.nearestCellUdf(index.centroids)(col(vecCol)).as("cell"))
        .withColumn("res",
          graft.functions.IvfPq.residualUdf(index.centroids)(col("vec"), col("cell")))
      // checkpoint: consumed by the store screen, the ADC screen's
      // exclusion and the within-batch window
      val encoded = graft.functions.PqIndex
        .encode(tagged, "id", "res", index.codebooks)
        .join(tagged.select(col("id"), col("cell")), Seq("id"))
        .localCheckpoint(false)
      val storeDups = encoded
        .join(index.codes.select(col("cell"), col("codes")),
          Seq("cell", "codes"), "left_semi")
        .select(col("id"))
      val adcDups = dedupMaxDist match {
        case None => storeDups.limit(0)
        case Some(t) => index
          .search(b, idCol, vecCol, k = 1, probe = index.kmeansProbe(nProbe))
          .where(col("adc_dist") <= t)
          .select(col("query_id").as("id")).distinct()
      }
      val dropped = storeDups.union(adcDups).distinct()
      val keep = encoded
        .join(dropped, Seq("id"), "left_anti")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("cell"), col("codes")).orderBy(col("id"))))
        .where(col("rn") === 1)
        .select(col("id").as("__keep_id"))
      b.join(keep, b(idCol).cast("long") === col("__keep_id"), "left_semi")
        .localCheckpoint(false)
    }
    sink(fresh)
    val next =
      if (append) index.appendToPersisted(indexLocation, fresh, idCol, vecCol)
      else index
    (fresh, next)
  }

  /** Start the streaming query: `stream` carries `idCol` and `vecCol`
    * (`array<float>`). Index state threads through batches on the driver
    * (foreachBatch runs there), re-reading the persisted cell layout
    * after each append. */
  def start(
      stream: DataFrame, idCol: String, vecCol: String,
      initial: IvfPqIndex, indexLocation: String,
      sinkDir: String, checkpointDir: String,
      dedup: Boolean = true,
      dedupMaxDist: Option[Double] = None,
      nProbe: Int = 4,
      compactEvery: Int = 0,
      compactFiles: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      prepare: DataFrame => DataFrame = identity): StreamingQuery = {
    @volatile var current = initial
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (_, next) = ingestBatch(prepare(batch), idCol, vecCol, current,
          indexLocation, _.write.mode("append").parquet(sinkDir),
          dedup, dedupMaxDist, nProbe)
        // Periodic cell-store bin-pack (each append leaves one file per
        // touched cell); layout-only, preserves cell partition pruning.
        // `compactFiles` keys the cadence on the store's FILE COUNT —
        // the r18 sf0.1 soak's own conclusion for exactly this store: a
        // 23 s listing cliff appeared past ~2.5k files regardless of how
        // many batches produced them, and recovered to 0.28 s after the
        // rewrite, so cycles are the wrong clock. The listing probe is
        // one FS round trip per batch (IndexMaintenance.stats).
        current =
          if (compactFiles > 0 && graft.maintain.IndexMaintenance
              .stats(batch.sparkSession, indexLocation)._1 > compactFiles)
            next.compactPersisted(indexLocation)
          else if (compactEvery > 0 && compactFiles == 0 &&
              (batchId + 1) % compactEvery == 0)
            next.compactPersisted(indexLocation)
          else next
        ()
      }
      .start()
  }
}
