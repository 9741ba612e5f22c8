package graft.io

import graft.spec.MergeOptions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Capability-gated Delta Lake adapter.
  *
  * The reference engine assumes Delta Lake throughout (merge:
  * `io/writers/delta_merge_writer.py:28-210`, restore-on-failed-DQ:
  * `algorithms/dq_validator.py:154-169`). This build ships in a
  * zero-egress environment with no Delta jars, so those semantics are
  * natively re-implemented (MergeOps + StagedSwap, Versioned,
  * ChangeCapture) and oracle-checked. A user pointing the engine at an
  * EXISTING Delta lakehouse, though, should get real transaction-log
  * commits, not staged directory swaps over a table whose log Spark
  * would then ignore.
  *
  * So: when `io.delta.tables.DeltaTable` is loadable at runtime, merge
  * and restore route here and execute against the published DeltaTable
  * API — reflectively, because the API cannot be a compile-time
  * dependency in this build. The reflective surface is the stable
  * public one (forPath / as / merge / whenMatched / whenNotMatched /
  * updateAll / updateExpr / delete / insertAll / execute /
  * restoreToVersion / history), and the clause ORDER mirrors the
  * reference's builder: matched-delete first, then matched-update, then
  * not-matched-insert (first matching clause wins in Delta, so delete
  * takes precedence — the same precedence MergeOps implements natively).
  *
  * When Delta is absent (this environment), `available` is false, every
  * caller falls back to the native path, and nothing here executes —
  * see DeltaAdapterSpec, which asserts the routing and skips the live
  * assertions with a reason.
  */
object DeltaSupport {

  /** True when Delta Lake is on the classpath. */
  lazy val available: Boolean =
    try { Class.forName("io.delta.tables.DeltaTable"); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  /** Should `spec` with this data format route to Delta? */
  def routes(dataFormat: Option[String]): Boolean =
    dataFormat.contains("delta") && available

  private def call(target: AnyRef, name: String, args: (Class[_], AnyRef)*): AnyRef =
    target.getClass.getMethod(name, args.map(_._1): _*)
      .invoke(target, args.map(_._2): _*)

  private def forPath(spark: SparkSession, location: String): AnyRef = {
    val dt = Class.forName("io.delta.tables.DeltaTable")
    dt.getMethod("forPath", classOf[SparkSession], classOf[String])
      .invoke(null, spark, location)
  }

  /** MERGE `source` into the Delta table at `location` with the
    * reference's ACON merge options. Predicates already use the
    * `current.` / `new.` aliases — the same aliases the reference passes
    * to Delta, so they go through verbatim (no translation). */
  def merge(spark: SparkSession, location: String,
      source: DataFrame, opts: MergeOptions): Unit = {
    require(available, "Delta Lake is not on the classpath")
    val aliased = call(forPath(spark, location), "as", classOf[String] -> "current")
    var b = call(aliased, "merge",
      classOf[org.apache.spark.sql.Dataset[_]] -> source.as("new"),
      classOf[String] -> opts.mergePredicate)
    def whenMatched(pred: Option[String]): AnyRef = pred match {
      case Some(p) => call(b, "whenMatched", classOf[String] -> p)
      case None => call(b, "whenMatched")
    }
    if (!opts.insertOnly) {
      opts.deletePredicate.foreach { d =>
        b = call(whenMatched(Some(d)), "delete")
      }
      val m = whenMatched(opts.updatePredicate)
      b =
        if (opts.updateColumnSet.isEmpty) call(m, "updateAll")
        else {
          val jm = new java.util.HashMap[String, String]()
          opts.updateColumnSet.foreach { case (k, v) => jm.put(k, v) }
          call(m, "updateExpr", classOf[java.util.Map[_, _]] -> jm)
        }
    }
    val nm = opts.insertPredicate match {
      case Some(p) => call(b, "whenNotMatched", classOf[String] -> p)
      case None => call(b, "whenNotMatched")
    }
    call(call(nm, "insertAll"), "execute")
    ()
  }

  /** Delta Change Data Feed read — the native source behind the
    * reference's CDF terminator (`terminators/cdf_processor.py`). Only
    * with Delta jars; the no-Delta equivalent of the same `_change_type`
    * rows is [[graft.operators.ChangeCapture.snapshotDiff]]. */
  /** Read the change feed for `(startingVersion, endingVersion)` both
    * inclusive. Bounding the end matters for incremental exposes: commits
    * landing between the caller's `latestVersion()` probe and this read
    * must not be emitted, or the caller's recorded watermark would lag
    * what was actually exposed and the next run would duplicate them.
    * `extraOptions` carries the caller's reader options (the reference's
    * `materialized_cdf_options` configure this read,
    * `terminators/cdf_processor.py:100-112`). */
  def changeFeed(spark: SparkSession, location: String,
      startingVersion: Long, endingVersion: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    require(available, "Delta Lake is not on the classpath")
    val r = spark.read.format("delta").options(extraOptions)
      .option("readChangeFeed", "true")
      .option("startingVersion", startingVersion)
    endingVersion.fold(r)(v => r.option("endingVersion", v)).load(location)
  }

  /** Latest committed version of the Delta table at `location`. */
  def latestVersion(spark: SparkSession, location: String): Long =
    call(forPath(spark, location), "history", java.lang.Integer.TYPE -> Int.box(1))
      .asInstanceOf[DataFrame].select("version").collect()(0).getLong(0)

  /** Restore the table to the version before the current one — the
    * Delta-native analogue of [[Versioned.restorePrevious]], used by the
    * DQ validator's restore-on-failure. Returns the restored version. */
  def restorePrevious(spark: SparkSession, location: String): Long = {
    val prev = latestVersion(spark, location) - 1
    require(prev >= 0, s"delta restore: no previous version at $location")
    call(forPath(spark, location), "restoreToVersion",
      java.lang.Long.TYPE -> Long.box(prev))
    prev
  }
}
