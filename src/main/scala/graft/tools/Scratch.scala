package graft.tools

import graft.functions.{DedupFunctions, Kernels, TextFunctions}
import graft.util.PlanBarrier
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val (as, bs) = {
      val m = classOf[DedupFunctions.type].getDeclaredMethod("minhashCoefficients", classOf[Int])
      m.setAccessible(true)
      m.invoke(DedupFunctions, Integer.valueOf(32)).asInstanceOf[(Array[Long], Array[Long])]
    }
    val p = (1L << 31) - 1

    (1 to 2).foreach { r =>
      time(s"r$r sig kernel only") {
        docs.select(col("doc_id").as("id"),
          Kernels.shingleMinhash(TextFunctions.whitespaceTokens(col("text")), 3, as, bs, p).as("ss"))
          .select(col("id"), size(col("ss._1")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      time(s"r$r full minhash pairs") {
        DedupFunctions.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.4).count()
      }
    }
    spark.stop()
  }
}
