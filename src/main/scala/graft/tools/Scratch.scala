package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence.
  *
  * Last r19 measurements run through here (recorded in
  * OPTIMIZATION_r19.md): the q56 pairs-vs-clusters decomposition that
  * motivated the driver union-find, the q77 stage decomposition that
  * motivated the qualityStats kernel, and the tokenize-formulation A/B
  * (HOF vs fenced kernel: parity — scan-dominated; kept the HOF form). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val dir = "/root/testdata/sf0.1"
    def time(tag: String, n: Int = 5)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag min=${runs.min}%.3fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    time("q56_clusters_on_pairs")(() =>
      graft.functions.DedupFunctions.duplicateClusters(
        graft.functions.DedupFunctions.minhashNearDuplicates(
          docs, "doc_id", "text", threshold = 0.4).select("id_a", "id_b")))
    spark.stop()
  }
}
