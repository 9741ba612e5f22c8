package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint: run ACON pipelines from files.
  *
  * {{{
  * spark-submit --class graft.RunAcon graft.jar load my_pipeline.json
  * spark-submit --class graft.RunAcon graft.jar manage ops.json
  * }}}
  *
  * The reference is invoked as a library from orchestration notebooks;
  * this main is the equivalent batch-cluster front door — parse nothing,
  * delegate everything to [[Engine]], exit non-zero on any failure so
  * the scheduler sees it.
  */
object RunAcon {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunAcon <load|manage> <acon.json> [<acon.json> ...]")
    val mode = args(0)
    val spark = SparkSession.getActiveSession.getOrElse(
      graft.exec.ExecEnv.getOrCreate("graft-run"))
    args.drop(1).foreach { path =>
      val acon = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      mode match {
        case "load" => Engine.loadData(spark, acon)
        case "manage" => Engine.executeManager(spark, acon).foreach(println)
        case other => sys.error(s"unknown mode '$other' (load | manage)")
      }
    }
  }
}
