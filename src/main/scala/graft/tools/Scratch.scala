package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence.
  *
  * r20 experiment: semantics + job-count check for LAZY localCheckpoint
  * (eager=false) — the candidate systematic change of the round. Verify
  * that (a) the checkpoint materializes ONCE on the first action even
  * when the first consumer's plan references it several times, (b) later
  * consumers read the persisted blocks (no recompute), and (c) the job
  * count drops by one per checkpoint vs the eager form. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val sc = spark.sparkContext
    val dir = "/root/testdata/sf0.1"
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    // track jobs via a listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def countJobs(tag: String)(body: => Unit): Unit = {
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"[scratch] $tag: jobs=${jobs.get()} wall=$dt%.3fs")
    }

    // a mildly expensive upstream: tokenize + explode + agg
    def grid = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))

    // EAGER: checkpoint job + stats job + consumer job = 3
    countJobs("eager: ckpt + stats + 3-ref consumer") {
      val g = grid.localCheckpoint(true)
      val n = g.agg(sum(col("n"))).head().getLong(0)
      val c2 = g.groupBy(col("tok")).agg(sum(col("n")).as("c"))
      val out = g.join(c2, Seq("tok")).groupBy(col("doc_id"))
        .agg(sum(col("c") * col("n")).as("s"), sum(lit(n)).as("t"))
      out.write.format("noop").mode("overwrite").save()
    }

    // LAZY: stats job (materializes) + consumer job = 2
    countJobs("lazy:  stats(materializes) + 3-ref consumer") {
      val g = grid.localCheckpoint(false)
      val n = g.agg(sum(col("n"))).head().getLong(0)
      val c2 = g.groupBy(col("tok")).agg(sum(col("n")).as("c"))
      val out = g.join(c2, Seq("tok")).groupBy(col("doc_id"))
        .agg(sum(col("c") * col("n")).as("s"), sum(lit(n)).as("t"))
      out.write.format("noop").mode("overwrite").save()
    }

    // LAZY with the FIRST action being the multi-reference consumer:
    // does the upstream run once (blocks) or three times?
    countJobs("lazy:  3-ref consumer only (no stats job)") {
      val g = grid.localCheckpoint(false)
      val c2 = g.groupBy(col("tok")).agg(sum(col("n")).as("c"))
      val out = g.join(c2, Seq("tok")).groupBy(col("doc_id"))
        .agg(sum(col("c") * col("n")).as("s"))
      out.write.format("noop").mode("overwrite").save()
    }
    // value check: lazy == eager rows
    val gE = grid.localCheckpoint(true)
    val gL = grid.localCheckpoint(false)
    val a = gE.agg(sum(col("n")), count(lit(1))).head()
    val b = gL.agg(sum(col("n")), count(lit(1))).head()
    println(s"[scratch] values eager=$a lazy=$b equal=${a == b}")
    // block-manager visibility after lazy materialization (the cascade's
    // fingerprintSourceBytes fallback reads this)
    val info = sc.getRDDStorageInfo.map(i =>
      (i.id, i.numCachedPartitions, i.memSize)).mkString("; ")
    println(s"[scratch] storage: $info")
    spark.stop()
  }
}
