package graft.io

import graft.SparkSpec
import graft.spec.{MergeOptions, OutputSpec}

/** Capability-gated Delta adapter checks.
  *
  * This environment ships no Delta jars, so the live assertions are
  * skipped with a reason (`assume`); what ALWAYS runs is the routing
  * contract: with Delta absent, `data_format: delta` merges must take
  * the native MergeOps + StagedSwap path and produce correct results —
  * i.e. the fallback is exercised, not just implied.
  */
class DeltaAdapterSpec extends SparkSpec {

  import spark.implicits._

  test("capability detection is consistent with the classpath") {
    val loadable =
      try { Class.forName("io.delta.tables.DeltaTable"); true }
      catch { case _: Throwable => false }
    assert(DeltaSupport.available == loadable)
    assert(DeltaSupport.routes(Some("delta")) == loadable)
    assert(!DeltaSupport.routes(Some("parquet")))
    assert(!DeltaSupport.routes(None))
  }

  test("delta-format merge falls back to the native path when Delta is absent") {
    assume(!DeltaSupport.available, "Delta IS present; fallback not in play")
    val loc = tmpDir("delta-fallback") + "/t"
    val spec = OutputSpec(specId = "m", dataFormat = Some("delta"),
      writeType = "merge", location = Some(loc),
      mergeOpts = Some(MergeOptions(
        mergePredicate = "current.id = new.id")))
    // first write: target does not exist -> plain save
    Writers.writeBatch(spark, spec, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // merge: update 2, insert 3 (native join + staged swap; Delta write
    // without jars would throw DATA_SOURCE_NOT_FOUND before this round)
    Writers.writeBatch(spark, spec, Seq((2, "B"), (3, "c")).toDF("id", "v"))
    val out = spark.read.parquet(loc).as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("live DeltaTable merge commits through the transaction log") {
    assume(DeltaSupport.available,
      "skipped: no Delta jars in /opt/spark/jars (zero-egress build)")
    val loc = tmpDir("delta-live") + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.format("delta").save(loc)
    DeltaSupport.merge(spark, loc,
      Seq((2, "B"), (3, "c")).toDF("id", "v"),
      MergeOptions(mergePredicate = "current.id = new.id"))
    val out = spark.read.format("delta").load(loc)
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 2 -> "B", 3 -> "c"))
    assert(DeltaSupport.latestVersion(spark, loc) == 1L)
    DeltaSupport.restorePrevious(spark, loc)
    assert(spark.read.format("delta").load(loc).count() == 2)
  }
}
