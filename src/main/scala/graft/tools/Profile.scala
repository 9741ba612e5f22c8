package graft.tools

import graft.queries.QueryCatalog

/** Dev-only: time + explain selected catalog queries. Args: sfDir names... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = graft.exec.ExecEnv.getOrCreate("profile", Some("local[16]"),
      Map("spark.sql.shuffle.partitions" -> "16", "spark.ui.enabled" -> "false"))
    spark.range(100).count()
    QueryCatalog.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      // Time construction + count: some operators (GraphX CC, KMeans
      // training) run jobs eagerly while the DataFrame is being built,
      // exactly as Bench measures them.
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      val n = df.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      q.run(spark, sfDir).count()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"== ${q.name}: rows=$n cold=$t1%.2fs warm=$t3%.2fs")
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
