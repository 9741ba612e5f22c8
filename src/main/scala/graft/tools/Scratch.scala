package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    spark.range(100).count()
    spark.stop()
  }
}
