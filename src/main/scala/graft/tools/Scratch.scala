package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Shuffle-bytes A/B for q87_top_spans: raw-span-keyed single pass vs
    // fingerprint-keyed two pass, at sf0.1.
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[16]"),
      Map("spark.sql.shuffle.partitions" -> "16", "spark.ui.enabled" -> "false"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    @volatile var written = 0L
    @volatile var recordsW = 0L
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          written += m.shuffleWriteMetrics.bytesWritten
          recordsW += m.shuffleWriteMetrics.recordsWritten
        }
      }
    }

    def measure(label: String)(mk: => DataFrame): Unit = {
      written = 0L; recordsW = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = mk.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"$label: rows=$n shuffleWrite=${written / 1048576.0}%.1f MiB records=$recordsW wall=$sec%.2f s")
    }

    def singlePass(): DataFrame =
      docs.select(col("doc_id").as("id"),
          explode(graft.functions.Kernels.allShingles(col("text"), 8)).as("span"))
        .groupBy(col("span"), col("id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("span"))
        .agg(sum(col("c")).as("n_occ"), count(lit(1)).as("n_docs"))
        .where(col("n_occ") >= 2)
        .orderBy(col("n_occ").desc, col("span"))
        .limit(20)

    // warm both shapes once
    singlePass().count()
    graft.functions.DedupFunctions.topRepeatedSpans(docs, "doc_id", "text").count()
    measure("single-pass raw-span keys")(singlePass())
    measure("two-pass fp keys        ")(
      graft.functions.DedupFunctions.topRepeatedSpans(docs, "doc_id", "text"))
    spark.stop()
  }
}
