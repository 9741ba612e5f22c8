package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // r19 optimization round: decompose q77_curation_pipeline's floor.
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
    val bench = docs.where(col("doc_id") < 100)
    val corpus = docs.where(col("doc_id") >= 100)
    def flags() = graft.operators.TrainingData.qualityFlags(
      corpus, "doc_id", "text", minWords = 30, maxWords = 100000,
      minMeanWordLen = 1.0, maxMeanWordLen = 20.0, minAlphaRatio = 0.8,
      keep = Seq("text"))
    def qualifiedRaw() = flags()
      .where(col("passes_gopher") && col("distinct_word_ratio") >= 0.35)
      .select("doc_id", "text")
    time("q77_a_flags_only")(() => qualifiedRaw())
    val qualified = qualifiedRaw().localCheckpoint(true)
    time("q77_b_contamination")(() => graft.operators.TrainingData.contamination(
      qualified, bench, "doc_id", "text", n = 3))
    val cont = graft.operators.TrainingData.contamination(
      qualified, bench, "doc_id", "text", n = 3)
    val clean = qualified.join(
      cont.where(col("contamination") < 0.2)
        .select(col("id").as("doc_id")), Seq("doc_id"))
    time("q77_c_clean_dedup")(() => {
      clean.withColumn("__fp", TextFunctions.fingerprint(col("text")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__fp")).orderBy(col("doc_id"))))
        .where(col("__rn") === 1).drop("__fp", "__rn")
    })
    val deduped = clean.withColumn("__fp", TextFunctions.fingerprint(col("text")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(col("doc_id"))))
      .where(col("__rn") === 1).drop("__fp", "__rn")
    time("q77_d_pack_on_top")(() => graft.operators.TrainingData.packSequences(
      deduped, "doc_id", "text", tokenBudget = 1024, nShards = 4)
      .orderBy(col("shard"), col("pack_id")))
    spark.stop()
  }
}
