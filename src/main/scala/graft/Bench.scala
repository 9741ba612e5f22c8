package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every catalog query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...,"queries":{...}}. */
object Bench {

  /** JVM-health snapshot appended to the bench line so a slow run can be
    * attributed (code-cache exhaustion / GC pressure / missing flags)
    * instead of averaged away. All values come from standard MXBeans. */
  private[graft] def jvmDiag(): String = {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.toLowerCase.contains("codeheap"))
      .map { p =>
        val u = p.getUsage
        s""""${p.getName}":{"used_mb":${u.getUsed / 1048576},"max_mb":${u.getMax / 1048576}}"""
      }.mkString("{", ",", "}")
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(g => s""""${g.getName.replace(' ', '_')}":{"count":${g.getCollectionCount},"sec":${g.getCollectionTime / 1000.0}}""")
      .mkString("{", ",", "}")
    val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val ccFlag = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .find(_.contains("ReservedCodeCacheSize")).getOrElse("unset")
    s"""{"code_cache":$pools,"gc":$gc,"heap_used_mb":${heap.getUsed / 1048576},"heap_max_mb":${heap.getMax / 1048576},"cc_flag":"$ccFlag"}"""
  }

  /** Single-thread CPU calibration: a fixed 400M multiply-add loop whose
    * wall time depends only on host speed. Recorded in every bench line so
    * cross-round query deltas can be divided by the calibration ratio —
    * "queries elevated AND cal elevated by the same factor" = host;
    * "cal flat, one query up" = real regression. (`acc` is returned
    * inside the tuple so the loop cannot be dead-code-eliminated.) */
  private[graft] def cpuCal(): Double = {
    val t0 = System.nanoTime()
    var acc = 0L; var i = 0
    while (i < 400000000) { acc += i * 2654435761L; i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (acc == 42) println(acc) // defeat DCE; never true for this loop
    sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cal = cpuCal() // before any Spark work contends for the core
    val spark = graft.exec.ExecEnv.getOrCreate(
      appName = "graft-bench",
      master = Some(s"local[$cpus]"),
      confs = Map(
        "spark.sql.shuffle.partitions" -> cpus,
        "spark.ui.enabled" -> "false"))
    // I/O calibration: one timed scan of the largest fixed input, taken
    // before any warm-up touches the page cache. Pairs with cpu_cal so a
    // bench delta can be attributed — "queries and io_cal elevated
    // together" = storage/host; "io_cal flat, queries up" = real. Includes
    // first-job scheduler startup by design: that cost is identical every
    // round, so the round-over-round RATIO stays meaningful.
    val ioCal = {
      val t0 = System.nanoTime()
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // Warm up the JVM/codegen/parquet-footer paths so per-query timings
    // measure the queries, not session startup. A full catalog pass at the
    // SMALLEST scale factor (~6k rows) compiles and JITs every query shape
    // without building up the heavy shuffle/broadcast state a warm-up at
    // the timed SF would leave behind.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    sys.env.get("SPARK_GRAFT_WARM_DIR")
      .orElse(Some("/root/testdata/sf0.001").filter(d => new java.io.File(d).isDirectory))
      .foreach { warmDir =>
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
        spark.catalog.clearCache()
      }
    // FORCING CONVENTION: queries are forced with count(), the same
    // convention as every prior round — the bench is a RELATIVE series
    // (BENCH_rN vs BENCH_r(N-1) vs the driver's recorded curve), so the
    // constant matters more than the absolute. Note count() lets
    // Catalyst prune work past the last count-relevant node (final
    // projections; unique-key left joins), so ABSOLUTE work claims come
    // from graft.tools.ScaleCurve, which forces the exact physical plan
    // via queryExecution.toRdd (see its time()).
    // Failed queries are reported as NEGATIVE elapsed time plus an entry in
    // "errors", so a crash is never mistaken for a fast pass. Each query is
    // timed in THREE passes and the minimum is reported: host speed on this
    // box varies ~2x run-to-run (documented across rounds — r13 and r15
    // both needed manual noise adjudication on 2-pass numbers), and
    // min-of-N is the standard way to measure the code instead of the
    // noise; the third pass costs ~1 min and halves the odds a uniform
    // noise burst spans every sample of a query. A query that fails in
    // SOME passes but succeeds in another still reports its min success
    // time, but the failure is kept in "intermittent" (with the exception
    // class) instead of being silently erased.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val failCount = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes = (1 to 3).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              errors(name) = e.getClass.getName
              failCount(name) = failCount.getOrElse(name, 0) + 1
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        name -> (if (ok) dt else -dt)
      }.toMap
    }
    val intermittent = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = ordered.map { case (name, _) =>
      val ts = passes.map(_(name))
      val oks = ts.filter(_ >= 0)
      name -> (if (oks.nonEmpty) {
        errors.remove(name).foreach { cls =>
          intermittent(name) = s"$cls x${failCount(name)}"
        }
        oks.min
      } else ts.head)
    }
    // Per-query MEDIAN alongside the min makes uniform host-noise
    // inflation machine-checkable: a real regression moves min and median
    // together on the affected query; an I/O-noise burst inflates medians
    // across the board while the mins stay put (median/min ratio drifts
    // uniformly). Upper median on an even sample count — conservative.
    val medians = ordered.map { case (name, _) =>
      val oks = passes.map(_(name)).filter(_ >= 0).sorted
      name -> (if (oks.nonEmpty) oks(oks.length / 2) else passes.head(name))
    }
    val totalMedian = medians.collect { case (_, v) if v >= 0 => v }.sum
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v) => k -> v.toString })
    val errJson = jmap(errors.map { case (k, v) => k -> ("\"" + v + "\"") })
    val interJson = jmap(intermittent.map { case (k, v) => k -> ("\"" + v + "\"") })
    // Per-pass totals expose warm-vs-cold drift inside a single run: a
    // later pass exceeding pass1 means something accumulates
    // (GC/code-cache); all three passes differing ~uniformly from another
    // run's is the host.
    val passTotals = passes.map(p => p.values.filter(_ >= 0).sum)
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // The driver keeps only the last ~2000 chars of stdout, so the
    // 110-query full-name JSON never fits. Two artifacts instead:
    //  1. BENCH_FULL.json — the complete record (full names, full
    //     precision, jvm diag), written where the driver/judge can read it.
    //  2. ONE compact stdout line — qNN short keys, 3 decimals — small
    //     enough to survive the tail capture and parse.
    val qsMedian = jmap(medians.map { case (k, v) => k -> v.toString })
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","value_median":$totalMedian,"failed":${errors.size},"errors":$errJson,"intermittent":$interJson,"pass_totals":$passTotals,"cpu_cal_sec":$cal,"io_cal_sec":$ioCal,"jvm":${jvmDiag()},"queries":$qs,"queries_median":$qsMedian,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      java.nio.file.Files.write(p, fullJson.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // never fail the bench over the side-file
    val shortKeys = results.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val qsShort =
      if (shortKeys.map(_._1).distinct.size == results.size)
        jmap(shortKeys.map { case (k, v) => k -> f"$v%.3f" })
      else qs // fall back to full names if short ids ever collide
    // value_median rides the compact line (per-query medians live in
    // BENCH_FULL.json — a second 115-entry map would push the queries map
    // out of the driver's 2000-char stdout tail): value_median/value
    // drifting while per-query mins hold = uniform host noise, not code.
    println(s"""{"metric":"total","value":$total,"unit":"sec","value_median":${f"$totalMedian%.3f"},"failed":${errors.size},"errors":$errJson,"intermittent":$interJson,"pass_totals":$passTotals,"cpu_cal_sec":$cal,"io_cal_sec":$ioCal,"queries_file":"BENCH_FULL.json","queries":$qsShort,"sf":"$sfDir"}""")
    spark.stop()
  }
}
