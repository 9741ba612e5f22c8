package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // BPE merge-count scaling: train() at merges = 16 / 256 / 2048 on the
    // sf0.1 documents corpus. With the incremental in-memory trainer the
    // wall for 256 merges must be FAR below 16x the 16-merge wall (the
    // pre-round-11 distributed loop was ~linear in merges); the one-off
    // corpus->vocab collapse dominates. Also times the forced-distributed
    // fallback at 16 merges for the same corpus, for the ratio record.
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.count() // warm the scan

    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("bpe_train_m16")(graft.functions.Bpe.train(docs, "text", 16))
    time("bpe_train_m256")(graft.functions.Bpe.train(docs, "text", 256))
    time("bpe_train_m2048")(graft.functions.Bpe.train(docs, "text", 2048))
    time("bpe_train_m16_distributed")(
      graft.functions.Bpe.train(docs, "text", 16, maxDriverVocab = 0))
    spark.stop()
  }
}
