package graft.tools

import graft.functions.{DedupFunctions, TextFunctions}
import graft.util.PlanBarrier
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    spark.range(100).count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val p = (1L << 31) - 1
    val withSig = PlanBarrier.fence(docs
      .select(col("doc_id").as("id"),
        TextFunctions.whitespaceTokens(col("text")).as("toks"))
      .select(col("id"), DedupFunctions.shingles(col("toks"), 3).as("shs"))
      .select(col("id"),
        array_distinct(transform(col("shs"),
          s => pmod(hash(s).cast("long"), lit(p)))).as("sh"))
      .select(col("id"), col("sh"),
        DedupFunctions.minhashSignatureFromHashes(col("sh"), 32).as("sig")))
    val banded = withSig
      .select(col("id"),
        explode(DedupFunctions.lshBands(col("sig"), 32, 4)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.cache()
    println("== banded rows: " + banded.count())
    val bucketSizes = banded.groupBy("band", "bucket").count()
    println("== distinct buckets: " + bucketSizes.count())
    bucketSizes.orderBy(col("count").desc).show(10)
    val pairs = bucketSizes.agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println("== candidate pairs (with dups): " + pairs)
    banded.unpersist()
    spark.stop()
  }
}
