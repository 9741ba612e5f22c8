package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Same-JVM interleaved head-to-head on the x2000 corpus (10M docs):
    // q88 span removal with the static window plan (adaptivePartitions
    // off) vs the input-proportional repartition — host drift today is
    // 2-5x between measurement windows, so only interleaved arms are
    // comparable.
    // 32g heap (set SPARK_DRIVER_MEM): 8g OOMs the 10M-doc window sort
    // outright, and 96g turns it into giant in-memory TimSorts whose
    // stop-the-world full GCs exceed the 120 s heartbeat (measured —
    // the driver executor got removed mid-sort); 32g spills like a real
    // per-executor memory budget. network.timeout covers residual
    // multi-minute GC pauses.
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false",
        "spark.network.timeout" -> "600s"))
    val docs = spark.read.parquet("/tmp/graft-scale-r17s2/x2000/documents.parquet")
    def run(adaptive: Boolean): Double = {
      spark.conf.set("graft.window.adaptivePartitions", adaptive.toString)
      val t0 = System.nanoTime()
      graft.functions.DedupFunctions.removeRepeatedSpans(
        docs, "doc_id", "text", k = 8).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      println(f"[scratch] adaptive=$adaptive ${dt}%.1f s")
      dt
    }
    val results = (1 to 2).flatMap { _ =>
      Seq("static" -> run(false), "proportional" -> run(true))
    }
    results.groupBy(_._1).foreach { case (arm, xs) =>
      println(f"[scratch] $arm min=${xs.map(_._2).min}%.1f s " +
        s"runs=${xs.map(x => f"${x._2}%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
