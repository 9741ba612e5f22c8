package graft.tools

import graft.functions.{DedupFunctions, Kernels, TextFunctions}
import graft.util.PlanBarrier
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    spark.range(100).count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    (1 to 2).foreach { round =>
      time(s"r$round udf eval only (sum of sizes)") {
        docs.where(col("doc_id") >= 100)
          .select(size(Kernels.distinctShingles(col("text"), 3)).as("n"))
          .agg(sum(col("n"))).collect()
      }
      time(s"r$round fence+count") {
        PlanBarrier.fence(docs.where(col("doc_id") >= 100)
          .select(col("doc_id").as("id"),
            Kernels.distinctShingles(col("text"), 3).as("gs"))).count()
      }
      time(s"r$round fence+explode+count") {
        PlanBarrier.fence(docs.where(col("doc_id") >= 100)
          .select(col("doc_id").as("id"),
            Kernels.distinctShingles(col("text"), 3).as("gs")))
          .select(explode(col("gs"))).count()
      }
      time(s"r$round bench distinct") {
        PlanBarrier.fence(docs.where(col("doc_id") < 100)
          .select(Kernels.distinctShingles(col("text"), 3).as("gs")))
          .select(explode(col("gs")).as("g")).distinct().count()
      }
      time(s"r$round full contamination") {
        graft.operators.TrainingData.contamination(
          docs.where(col("doc_id") >= 100), docs.where(col("doc_id") < 100),
          "doc_id", "text", n = 3).count()
      }
    }
    spark.stop()
  }
}
