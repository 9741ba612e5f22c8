package graft.tools

import graft.exec.ExecEnv

/** Dev-only scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = ExecEnv.getOrCreate("scratch", Some("local[8]"),
      Map("spark.sql.shuffle.partitions" -> "8"))
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
