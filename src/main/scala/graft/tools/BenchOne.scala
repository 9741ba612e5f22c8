package graft.tools

import graft.queries.QueryCatalog

/** Dev-only: replicate Bench's exact conditions (fresh local[32] session,
  * same warm-up, each query timed once cold) for a subset of queries.
  * Args: sfDir names...
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.exec.ExecEnv.getOrCreate("bench-one", Some(s"local[$cpus]"),
      Map("spark.sql.shuffle.partitions" -> cpus, "spark.ui.enabled" -> "false"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    QueryCatalog.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"== ${q.name}: rows=$n cold=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
