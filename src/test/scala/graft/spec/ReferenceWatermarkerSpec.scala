package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's remaining watermarker scenarios executed VERBATIM
  * (`tests/feature/transformations/test_watermarker.py`; the dedup +
  * inner-join pair already runs in ReferenceScenariosSpec): the
  * overall-watermark dedup variant and the stream-stream OUTER joins,
  * where null-padded matches only emit once the watermark passes — the
  * left-outer choreography drives five loads for exactly that reason. */
class ReferenceWatermarkerSpec extends SparkSpec with ReferenceHarness {

  private val fam = s"$refRoot/transformations/watermarker"

  private def copySchemas(res: String, inRoot: String): Unit =
    Files.list(Paths.get(res)).forEach { p =>
      if (p.getFileName.toString.endsWith("schema.json"))
        copyIn(p.toString, inRoot)
    }

  test("reference watermarker streaming_drop_duplicates_overall_watermark runs verbatim") {
    assume(new java.io.File(fam).isDirectory, s"missing $fam")
    ensureTestDb()
    val name = "streaming_drop_duplicates_overall_watermark"
    spark.sql(s"DROP TABLE IF EXISTS test_db.$name")
    val res = s"$fam/$name"
    val tmp = tmpDir("ref-wm-ddow")
    val inRoot = s"$tmp/in/feature/transformations/watermarker/$name"
    copySchemas(res, inRoot)
    Seq("part-01.csv", "part-02.csv").foreach { f =>
      copyIn(s"$res/data/source/$f", s"$inRoot/data")
      graft.algo.DataLoader.loadData(spark, rebase(s"$res/$name.json", tmp))
    }
    assertMatchesControlCsv(
      s"$tmp/out/feature/transformations/watermarker/$name/data",
      s"$res/data/control/$name.csv",
      Some(Files.readString(Paths.get(s"$res/source_schema.json"))))
  }

  for ((name, loads) <- Seq(
      "streaming_right_outer_join" -> 2, "streaming_left_outer_join" -> 5))
    test(s"reference watermarker $name runs verbatim ($loads loads)") {
      assume(new java.io.File(fam).isDirectory, s"missing $fam")
      ensureTestDb()
      val res = s"$fam/$name"
      val tmp = tmpDir(s"ref-wm-$name")
      val inRoot = s"$tmp/in/feature/transformations/watermarker/$name"
      val outLoc = s"$tmp/out/feature/transformations/watermarker/$name/data"
      if (name == "streaming_right_outer_join") {
        // _drop_and_create_table: empty pre-created target with the
        // joined schema (test_watermarker.py:153-176)
        spark.sql("DROP TABLE IF EXISTS test_db.streaming_outer_join")
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "salesorder int, item int, date timestamp, customer string, " +
              "article string, amount int, customer_name string"))
          .write.mode("overwrite").parquet(outLoc)
        spark.sql(
          s"""CREATE TABLE test_db.streaming_outer_join (
             |  salesorder int, item int, date timestamp, customer string,
             |  article string, amount int, customer_name string)
             |USING parquet LOCATION '$outLoc'""".stripMargin)
      }
      (1 to loads).foreach { load =>
        // the reference's glob copy is a silent no-op for missing files
        // (right-outer ships only customer-part-01)
        if (Files.exists(Paths.get(s"$res/data/source/customer-part-0$load.csv")))
          copyIn(s"$res/data/source/customer-part-0$load.csv", s"$inRoot/data/customers")
        copyIn(s"$res/data/source/sales-part-0$load.csv", s"$inRoot/data/sales")
        copySchemas(res, inRoot)
        graft.algo.DataLoader.loadData(spark, rebase(s"$res/$name.json", tmp))
      }
      assertMatchesControlCsv(outLoc, s"$res/data/control/$name.csv",
        Some(Files.readString(Paths.get(s"$res/${name}_control_schema.json"))))
    }
}
