package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence.
  *
  * r20 experiment #2 (verdict item 4): the q108/q113/q100 centroid
  * rewrite (ONE cell-keyed aggregate with 64 avg columns, r19) was
  * adopted on structure + the r17 1M-vector measurement but never
  * re-measured at volume in its committed form. A/B both shapes on the
  * x2000 scaled embeddings corpus (10M vectors): old = posexplode into a
  * (cell, pos) dim-fold row stream, aggregate, reassemble + collect
  * cells x 64 rows; new = one aggregate, collect cells x 1 rows.
  * (r20 experiment #1 — lazy localCheckpoint semantics/job-count — is
  * recorded in OPTIMIZATION_r20.md; values identical, jobs -1/site.)
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.exec.ExecEnv.getOrCreate("scratch", Some("local[32]"),
      Map("spark.sql.shuffle.partitions" -> "32", "spark.ui.enabled" -> "false"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_DIR",
      "/tmp/graft-scale-r20/x2000")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"[scratch] corpus rows=${emb.count()}")
    val tagged = emb.select(col("vec_id"), col("embedding"),
      graft.functions.SimilarityFunctions
        .lshSignature(col("embedding"), 64, 4).as("cell"))
      .localCheckpoint(false)
    tagged.write.format("noop").mode("overwrite").save() // materialize outside the A/B

    def time(tag: String, n: Int = 3)(body: () => Unit): Unit = {
      val runs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        body()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag min=${runs.min}%.3fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    // NEW shape (committed): one cell-keyed aggregate, 64 avg columns
    time("centroids_new_64avg") { () =>
      val cavgs = (0 until 64).map(i =>
        round(avg(col("embedding")(i).cast("double")), 6).as(s"__c$i"))
      val m = tagged.groupBy(col("cell")).agg(cavgs.head, cavgs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> Array.tabulate(64)(i => r.getDouble(i + 1)))
        .toMap
      println(s"  cells=${m.size}")
    }

    // OLD shape (pre-r19): posexplode dim-fold + (cell, pos) aggregate,
    // collect cells x 64 rows and reassemble on the driver
    time("centroids_old_dimfold") { () =>
      val rows = tagged
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("cv"))
        .collect()
      val m = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
        val arr = new Array[Double](64)
        rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        c -> arr
      }
      println(s"  cells=${m.size}")
    }
    spark.stop()
  }
}
