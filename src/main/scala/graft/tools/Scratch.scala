package graft.tools

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[16]"),
      Map("spark.sql.shuffle.partitions" -> "16", "spark.ui.enabled" -> "false"))
    spark.range(100).count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .where(col("doc_id") < 300)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val toks = docs.select(col("doc_id").as("id"),
      TextFunctions.whitespaceTokens(col("text")).as("toks"))
    time("tokens")(toks.count())
    val grams = toks.select(col("id"), DedupFunctions.shingles(col("toks"), 2).as("grams"))
      .select(col("id"), col("grams"), size(col("grams")).as("n_grams"))
    time("grams")(grams.count())
    val exploded = grams.select(col("id"), col("n_grams"), explode(col("grams")).as("g"))
    time("exploded")(exploded.count())
    val a = exploded.select(col("g"), col("id").as("id_a"), col("n_grams").as("n_a"))
    val b = exploded.select(col("g"), col("id").as("id_b"), col("n_grams").as("n_b"))
    val joined = a.join(b, Seq("g")).where(col("id_a") < col("id_b"))
    time("joined")(joined.count())
    val grouped = joined.groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    time("grouped")(grouped.count())
    time("grouped-again")(grouped.count())
    spark.stop()
  }
}
