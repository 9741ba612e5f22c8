package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // BPE vocab-bound claim: train(16 merges) on sf0.1 docs vs a
    // 50x REPEATED corpus (same text, offset ids -> identical vocab).
    // If merge rounds run on the (word, count) table, the 50x corpus
    // should cost ~the same per round — only the one-off word-count
    // scan grows.
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val repeated = (0 until 50).map { i =>
      if (i == 0) docs
      else docs.withColumn("doc_id", col("doc_id") + lit(i * (maxId + 1)))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet("/tmp/bpe-repeat-50x")
    val big = spark.read.parquet("/tmp/bpe-repeat-50x")

    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label min=${ts.min}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("bpe_train16_base")(graft.functions.Bpe.train(docs, "text", 16))
    time("bpe_train16_repeat50x")(graft.functions.Bpe.train(big, "text", 16))
    spark.stop()
  }
}
