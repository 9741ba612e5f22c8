package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Same-JVM head-to-head on the 500x q78 pair graph (124M edges,
    // 998k vertices, ~4k near-cliques): broadcast-min-contraction
    // duplicateClusters vs plain-Pregel fallback, interleaved 3x each so
    // host drift hits both arms equally.
    val scaled = "/tmp/graft-scale-r16/x500"
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val emb = spark.read.parquet(s"$scaled/embeddings.parquet")
    val pairs = graft.functions.SimilarityFunctions.embeddingNearDuplicates(
        emb, "vec_id", "embedding", dim = 64, threshold = 0.3)
      .select("id_a", "id_b").localCheckpoint()
    println(s"[scratch] edges=${pairs.count()}")

    def run(limit: String): Double = {
      spark.conf.set("graft.cc.broadcastVertices", limit)
      val t0 = System.nanoTime()
      graft.functions.DedupFunctions.duplicateClusters(pairs)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = (1 to 3).flatMap { i =>
      Seq("contract" -> run("4000000"), "pregel" -> run("0"))
    }
    results.groupBy(_._1).foreach { case (arm, xs) =>
      println(f"[scratch] $arm min=${xs.map(_._2).min}%.2f s " +
        s"runs=${xs.map(x => f"${x._2}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
