package graft.streaming

import graft.spec.OutputSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Config-addressable spellings for the three streaming ingest faces —
  * round 18, closing the last config-surface gap: the reference is
  * ACON-driven end-to-end (`algorithms/data_loader.py:227-255`), and
  * until now continuous-ingest dedup was the one headline family a
  * config-only user could not reach without Scala.
  *
  * An output spec routes here when its `data_format` names a face —
  * mirroring the batch curation stages' transformer names:
  *
  * {{{
  * {"spec_id": "sink", "input_id": "stream",
  *  "data_format": "chunk_dedup",            // | minhash_dedup | ivfadc_ingest
  *  "location": "/sink/dir",                 // survivor parquet dir
  *  "streaming_trigger": "availableNow",     // standard trigger fields
  *  "options": {
  *    "index_location": "/idx/chunks",       // persisted index (required)
  *    "checkpointLocation": "/ckpt/chunks",  // required
  *    "compact_every": "64",                 // optional bin-pack cadence
  *    "id_col": "doc_id", "text_col": "text",// column names
  *    "chunk_tokens": "5",                   // chunk face
  *    "threshold": "0.4", "shingle_size": "3",
  *    "num_hashes": "32", "num_bands": "4",  // minhash face
  *    "vec_col": "embedding", "dedup": "true",
  *    "dedup_max_dist": "0.5", "n_probe": "4" // IVFADC face
  * }}}
  *
  * Index seeding stays an explicit prior step (build the corpus index
  * with the batch operator, or `IvfPqIndex.persisted` for the vector
  * store — reopened here via `IvfPq.open`): the faces' own contract is
  * "the index exists", so a config typo cannot silently cold-start a
  * dedup pipeline against an empty corpus. The standard foreachBatch
  * transformer/DQ plan composes: it runs on each raw micro-batch BEFORE
  * the face's dedup plan (the `prepare` hook on each face's `start`).
  */
object StreamingFaces {

  val Formats: Set[String] = Set("minhash_dedup", "chunk_dedup", "ivfadc_ingest")

  def routes(dataFormat: Option[String]): Boolean =
    dataFormat.exists(f => Formats(f.toLowerCase(java.util.Locale.ROOT)))

  private final case class Parsed(
      spec: OutputSpec, sinkDir: String, indexLoc: String,
      compactEvery: Int, idCol: String, format: String) {
    def opt(k: String): Option[String] = spec.options.get(k)
    def textCol: String = opt("text_col").getOrElse("text")
  }

  private def parsed(spec: OutputSpec): Parsed = {
    def opt(k: String): Option[String] = spec.options.get(k)
    Parsed(spec,
      sinkDir = spec.location.getOrElse(sys.error(
        s"output spec '${spec.specId}': ${spec.dataFormat.get} needs " +
          "location (the survivor sink dir)")),
      indexLoc = opt("index_location").getOrElse(sys.error(
        s"output spec '${spec.specId}': ${spec.dataFormat.get} needs " +
          "options.index_location")),
      compactEvery = opt("compact_every").map(_.trim.toInt).getOrElse(0),
      idCol = opt("id_col").getOrElse("id"),
      format = spec.dataFormat.get.toLowerCase(java.util.Locale.ROOT))
  }

  private def minhashIdx(p: Parsed): graft.functions.MinhashIndex =
    graft.functions.MinhashIndex.open(p.indexLoc,
      shingleSize = p.opt("shingle_size").map(_.trim.toInt).getOrElse(3),
      numHashes = p.opt("num_hashes").map(_.trim.toInt).getOrElse(32),
      numBands = p.opt("num_bands").map(_.trim.toInt).getOrElse(4),
      threshold = p.opt("threshold").map(_.trim.toDouble).getOrElse(0.5))

  def start(
      spark: SparkSession,
      spec: OutputSpec,
      stream: DataFrame,
      prepare: DataFrame => DataFrame): StreamingQuery = {
    val p = parsed(spec)
    val ckpt = p.opt("checkpointLocation").orElse(p.opt("checkpoint_location"))
      .getOrElse(sys.error(s"output spec '${spec.specId}': " +
        s"${spec.dataFormat.get} needs options.checkpointLocation"))
    val trigger = graft.io.Writers.resolveTrigger(spec)
    p.format match {
      case "minhash_dedup" =>
        StreamingDedup.start(stream, p.idCol, p.textCol, minhashIdx(p),
          p.sinkDir, ckpt, p.compactEvery, trigger, prepare)
      case "chunk_dedup" =>
        StreamingChunkDedup.start(stream, p.idCol, p.textCol, p.indexLoc,
          p.sinkDir, ckpt,
          chunkTokens = p.opt("chunk_tokens").map(_.trim.toInt).getOrElse(5),
          compactEvery = p.compactEvery, trigger = trigger, prepare = prepare)
      case "ivfadc_ingest" =>
        StreamingPqIngest.start(stream, p.idCol,
          p.opt("vec_col").getOrElse("embedding"),
          graft.functions.IvfPq.open(spark, p.indexLoc), p.indexLoc,
          p.sinkDir, ckpt,
          dedup = p.opt("dedup").forall(_.trim.toBoolean),
          dedupMaxDist = p.opt("dedup_max_dist").map(_.trim.toDouble),
          nProbe = p.opt("n_probe").map(_.trim.toInt).getOrElse(4),
          compactEvery = p.compactEvery, trigger = trigger, prepare = prepare)
    }
  }

  /** Batch mode of the same specs: ONE micro-batch unit of work (check
    * the whole input against the index, sink survivors, append) — the
    * config spelling of the incremental batch-ingest loop the q76/q116
    * family exercises. No checkpoint involved; compaction still honors
    * `compact_every` as a files-threshold hint when > 0. */
  def writeBatch(spark: SparkSession, spec: OutputSpec, df: DataFrame): Unit = {
    val p = parsed(spec)
    def sink(s: DataFrame): Unit = s.write.mode("append").parquet(p.sinkDir)
    p.format match {
      case "minhash_dedup" =>
        StreamingDedup.dedupBatch(df, p.idCol, p.textCol, minhashIdx(p), sink)
      case "chunk_dedup" =>
        StreamingChunkDedup.dedupBatch(df, p.idCol, p.textCol, p.indexLoc,
          p.opt("chunk_tokens").map(_.trim.toInt).getOrElse(5), sink)
      case "ivfadc_ingest" =>
        StreamingPqIngest.ingestBatch(df, p.idCol,
          p.opt("vec_col").getOrElse("embedding"),
          graft.functions.IvfPq.open(spark, p.indexLoc), p.indexLoc, sink,
          dedup = p.opt("dedup").forall(_.trim.toBoolean),
          dedupMaxDist = p.opt("dedup_max_dist").map(_.trim.toDouble),
          nProbe = p.opt("n_probe").map(_.trim.toInt).getOrElse(4))
    }
    if (p.compactEvery > 0)
      graft.maintain.IndexMaintenance.compactIfNeeded(
        spark, p.indexLoc, maxFiles = p.compactEvery,
        partitionBy = p.format match {
          case "minhash_dedup" => Seq("band")
          case "ivfadc_ingest" => Seq("cell")
          case _ => Nil
        },
        distinctRows = p.format == "chunk_dedup")
    ()
  }
}
