package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scaled-corpus writer's staged swap (round 19, r18 advice):
  * generation appends into a `__gen` staging dir, the previous corpus is
  * renamed aside to `__old` BEFORE the staging dir takes its place (so a
  * rename failure can never leave no corpus at all), and both scratch
  * dirs are gone once the swap completes.
  */
class ScaleCurveSwapSpec extends SparkSpec {

  private def gen(out: String, marker: String, copies: Int): Unit =
    ScaleCurve.writeGrouped(spark, out,
      i => spark.range(10).select(col("id"), lit(marker).as("v"), lit(i).as("copy")),
      copies = copies)

  test("writeGrouped: regeneration replaces the corpus and leaves no scratch dirs") {
    val dir = tmpDir("scale-swap")
    val out = s"$dir/documents.parquet"

    gen(out, "v1", copies = 3)
    val first = spark.read.parquet(out)
    assert(first.count() == 30)
    assert(first.select("v").distinct().collect().map(_.getString(0)).toSeq == Seq("v1"))

    // Second generation over an EXISTING corpus: the old data must be
    // replaced (not appended to), via the aside-rename swap.
    gen(out, "v2", copies = 2)
    val second = spark.read.parquet(out)
    assert(second.count() == 20)
    assert(second.select("v").distinct().collect().map(_.getString(0)).toSeq == Seq("v2"))

    val root = new java.io.File(dir)
    val residue = root.listFiles().map(_.getName).filter(n =>
      n.endsWith("__gen") || n.endsWith("__old"))
    assert(residue.isEmpty, s"scratch dirs left behind: ${residue.mkString(",")}")
  }

  test("writeGrouped: a crashed generation leaves the previous corpus intact") {
    val dir = tmpDir("scale-swap-crash")
    val out = s"$dir/documents.parquet"
    gen(out, "v1", copies = 2)

    // Simulate a generation that dies mid-append: a partial __gen staging
    // dir exists, the corpus was never touched. The corpus must still
    // read back complete, and the NEXT generation must clear the debris.
    val stale = new java.io.File(s"$dir/documents.parquet__gen")
    stale.mkdirs()
    new java.io.FileOutputStream(s"$stale/part-junk").close()
    assert(spark.read.parquet(out).count() == 20)

    gen(out, "v3", copies = 1)
    val after = spark.read.parquet(out)
    assert(after.select("v").distinct().collect().map(_.getString(0)).toSeq == Seq("v3"))
    assert(!new java.io.File(s"$dir/documents.parquet__gen").exists())
    assert(!new java.io.File(s"$dir/documents.parquet__old").exists())
  }
}
