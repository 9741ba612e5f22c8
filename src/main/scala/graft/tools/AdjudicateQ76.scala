package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 adjudication of the q76 bench movement (r16 0.388 s -> r17
  * 0.778 s raw, ~1.33x normalized): is the r17 replay contract — the
  * removal of checkBatch's `batch_id =!= corpus_id` filter — a real
  * per-batch cost, or host noise on a sub-second query?
  *
  * Static claim to verify: in q76's setup the batch (doc_id < 100) and
  * the indexed corpus (doc_id >= 100) are id-disjoint, so the old filter
  * never dropped a row and its removal cannot change any intermediate
  * size. This tool measures it: INTERLEAVED min-of-N of the shipping
  * checkBatch vs an inline reconstruction of the r16 variant (the same
  * plan with the filter back), plus candidate-count equality, at the
  * base corpus and (when SPARK_GRAFT_SCALE_DIR names a generated corpus)
  * the 500x index point.
  *
  * Also measures the OTHER half of the r17 contract — dedupBatch now
  * appends ALL corpus-fresh signatures (survivors AND
  * within-batch-dropped) instead of survivors only: reports how many
  * extra rows that policy adds on the gate batch and times a follow-up
  * checkBatch against both index states, which is the only place the
  * contract can cost anything at steady state.
  */
object AdjudicateQ76 {

  /** The r16 checkBatch, reconstructed verbatim against the same index
    * files (graft.functions.MinhashIndex at 7f14084^ minus the filter
    * removal): identical plan with `batch_id =!= corpus_id` restored. */
  private def oldCheckBatch(
      spark: SparkSession, idx: graft.functions.MinhashIndex,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = idx.signed(batch, idCol, textCol).localCheckpoint()
    val keys = idx.banded(sigs)
      .select(col("id").as("batch_id"), col("band"), col("bucket"))
    val idxDf = spark.read.parquet(idx.location)
    val candidates = idxDf.select(col("id").as("corpus_id"), col("band"), col("bucket"))
      .join(broadcast(keys), Seq("band", "bucket"))
      .where(col("batch_id") =!= col("corpus_id")) // the r16 filter
      .select(col("batch_id"), col("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    val corpusSh = idxDf.where(col("band") === 0)
      .select(col("id").as("corpus_id"), col("sh").as("sh_c"))
    val batchSh = sigs.select(col("id").as("batch_id"), col("sh").as("sh_b"))
    candidates
      .join(corpusSh, Seq("corpus_id"))
      .join(batchSh, Seq("batch_id"))
      .select(col("batch_id"), col("corpus_id"),
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double").as("inter"),
        (size(col("sh_b")) + size(col("sh_c"))).cast("double").as("szsum"))
      .select(col("batch_id"), col("corpus_id"),
        (col("inter") / (col("szsum") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= idx.threshold)
  }

  private def time(spark: SparkSession)(run: () => DataFrame): Double = {
    val t0 = System.nanoTime()
    run().queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    dt
  }

  private def abPoint(spark: SparkSession, tag: String, dir: String,
      idxPath: String, reps: Int): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx =
      if (new java.io.File(s"$idxPath/_SUCCESS").exists())
        graft.functions.MinhashIndex.open(idxPath, threshold = Some(0.4))
      else graft.functions.MinhashIndex.build(
        docs.where(col("doc_id") >= 100), "doc_id", "text", idxPath,
        threshold = 0.4)
    val batch = docs.where(col("doc_id") < 100)
    // filter no-op proof: identical output row count, both ways
    val newRows = idx.checkBatch(batch, "doc_id", "text").count()
    val oldRows = oldCheckBatch(spark, idx, batch, "doc_id", "text").count()
    println(s"[q76-ab] $tag rows new=$newRows old=$oldRows")
    // interleaved min-of-N (new first in odd rounds, old first in even,
    // so JIT/page-cache warm-up cannot systematically favor one side)
    val (ns, os) = (1 to reps).map { i =>
      val tNew = () => time(spark)(() => idx.checkBatch(batch, "doc_id", "text"))
      val tOld = () => time(spark)(() =>
        oldCheckBatch(spark, idx, batch, "doc_id", "text"))
      if (i % 2 == 1) { val n = tNew(); val o = tOld(); (n, o) }
      else { val o = tOld(); val n = tNew(); (n, o) }
    }.unzip
    println(f"[q76-ab] $tag new min=${ns.min}%.3f med=${ns.sorted.apply(ns.size / 2)}%.3f runs=[${ns.map(s => f"$s%.2f").mkString(",")}]")
    println(f"[q76-ab] $tag old min=${os.min}%.3f med=${os.sorted.apply(os.size / 2)}%.3f runs=[${os.map(s => f"$s%.2f").mkString(",")}]")
  }

  /** The append-policy half: survivors-only (r16) vs all-corpus-fresh
    * (r17) on the gate batch — extra index rows and the cost to the NEXT
    * batch's check. */
  private def appendPolicy(spark: SparkSession, dir: String, work: String,
      tag: String, dupDense: Boolean): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") >= 100)
    val gate = docs.where(col("doc_id") < 100).select("doc_id", "text")
    // dup-dense variant: every gate doc plus an exact clone under a new
    // id — the worst case for the policy divergence, since every clone
    // is a within-batch drop whose signatures only the r17 policy indexes
    val batch = if (!dupDense) gate
      else gate.unionByName(gate.select(
        (col("doc_id") + lit(10000L)).as("doc_id"), col("text")))
    Seq("all_fresh", "survivors_only").foreach { policy =>
      val p = s"$work/apx_${tag}_$policy"
      val idx = graft.functions.MinhashIndex.build(
        corpus, "doc_id", "text", p, threshold = 0.4)
      val before = spark.read.parquet(p).count()
      if (policy == "all_fresh")
        graft.streaming.StreamingDedup.dedupBatch(
          batch, "doc_id", "text", idx, _ => ())
      else {
        // the r16 policy, reconstructed: append survivors only
        val vsCorpus = idx.checkBatch(batch, "doc_id", "text")
          .select(col("batch_id").as("doc_id")).distinct()
        val fresh = batch.join(vsCorpus, Seq("doc_id"), "left_anti").localCheckpoint()
        val inner = graft.functions.DedupFunctions.minhashNearDuplicates(
            fresh, "doc_id", "text", shingleSize = idx.shingleSize,
            numHashes = idx.numHashes, numBands = idx.numBands,
            threshold = idx.threshold)
          .select(col("id_b").as("doc_id")).distinct()
        idx.append(fresh.join(inner, Seq("doc_id"), "left_anti"), "doc_id", "text")
      }
      val after = spark.read.parquet(p).count()
      // follow-up probe: the same batch re-checked against the grown index
      val secs = (1 to 3).map(_ => time(spark)(() =>
        idx.checkBatch(batch, "doc_id", "text")))
      println(f"[q76-ab] $tag append_policy=$policy idx_rows $before -> $after " +
        f"(+${after - before}) next_check min=${secs.min}%.3f runs=[${secs.map(s => f"$s%.2f").mkString(",")}]")
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = sys.env.get("SPARK_GRAFT_SCALE_DIR")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MINOF", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = s"/tmp/graft-q76ab-${ProcessHandle.current().pid()}"
    val spark = graft.exec.ExecEnv.getOrCreate("q76-ab", Some(s"local[$cpus]"),
      Map("spark.sql.shuffle.partitions" -> cpus, "spark.ui.enabled" -> "false"))
    println(f"[q76-ab] cpu_cal=${graft.Bench.cpuCal()}%.3fs")
    abPoint(spark, "base", base, s"$work/idx_base", reps)
    appendPolicy(spark, base, work, "gate", dupDense = false)
    appendPolicy(spark, base, work, "dup_dense", dupDense = true)
    scaled.foreach(d => abPoint(spark, "scaled", d, s"$work/idx_scaled", reps))
    spark.stop()
  }
}
