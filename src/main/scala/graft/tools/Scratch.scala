package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Heap-artifact check for the r18 ledger: the x2000 legs of q31/q91/
    // q76 read 4x above their r17 same-corpus records when measured
    // under a 48g driver heap. r17's Scratch note: oversized heaps turn
    // shuffle spills into giant in-memory sorts whose full GCs dominate.
    // Re-measure the three flagged ops under the 32g budget the prior
    // records used (run with SPARK_DRIVER_MEM=32g).
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false",
        "spark.network.timeout" -> "600s"))
    val dir = "/tmp/graft-scale-r17s2/x2000"
    def time(tag: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      println(f"[scratch] $tag min=${runs.min}%.2fs runs=${runs.map(r => f"$r%.1f").mkString(",")}")
    }
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("q31_x2000")(() => graft.functions.DedupFunctions.minhashNearDuplicates(
      docs, "doc_id", "text", threshold = 0.4))
    time("q91_x2000")(() => {
      val bits = math.min(18, math.max(8,
        graft.functions.SimilarityFunctions.ceilLog2(math.max(1L, emb.count() / 20L))))
      graft.functions.SimilarityFunctions.semanticDedup(emb, "vec_id", "embedding",
        dim = 64, numBits = bits, simThreshold = 0.3)
    })
    val idx = graft.functions.MinhashIndex.open(
      "/tmp/graft-scale-r17s2/idx/_tmp_graft_scale_r17s2_x2000", threshold = Some(0.4))
    time("q76_x2000")(() => idx.checkBatch(
      docs.where(col("doc_id") < 100), "doc_id", "text"))
    spark.stop()
  }
}
