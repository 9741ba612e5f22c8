package graft.tools

import graft.queries.QueryCatalog
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for catalog queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization rounds' evidence
  * files (the judge reads plan claims against these).
  *
  * Args: suffix [tag] [names...]  (default tag r19; empty names = all).
  * The formatted explain is captured AFTER a count() so AQE's final plan
  * (join rewrites, coalesced reads) is what lands in the file, followed
  * by the executed-plan tree for shuffle/join counting.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val tag = if (args.length > 1) args(1) else "r19"
    val names: String => Boolean =
      if (args.length > 2) args.drop(2).toSet else (_ => true)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.exec.ExecEnv.getOrCreate("dump-plans", Some(s"local[$cpus]"),
      Map("spark.sql.shuffle.partitions" -> cpus, "spark.ui.enabled" -> "false"))
    val dir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(dir)
    QueryCatalog.all.filter(q => names(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        // Execute THIS DataFrame's own physical plan (the ScaleCurve
        // convention): count()/noop each wrap the logical plan in a NEW
        // QueryExecution, leaving the dumped plan AdaptiveSparkPlan
        // isFinalPlan=false; toRdd.count() runs the exact executedPlan so
        // the dump shows the AQE-final join strategies and coalesced reads.
        df.queryExecution.toRdd.count()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val executed = df.queryExecution.executedPlan.toString()
        val shuffles = graft.operators.ScaleOps.countShuffles(df)
        val body = s"== ${q.name} @ $sfDir (shuffle exchanges: $shuffles) ==\n\n" +
          formatted + "\n\n== executed plan (post-AQE) ==\n\n" + executed
        Files.writeString(dir.resolve(s"${q.name}_$suffix.txt"), body)
        println(s"wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable => println(s"FAILED ${q.name}: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
