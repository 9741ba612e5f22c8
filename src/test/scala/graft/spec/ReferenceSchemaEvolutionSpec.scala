package graft.spec

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The reference's schema_evolution feature scenarios executed VERBATIM
  * (`tests/feature/test_schema_evolution.py`, resources under
  * `tests/resources/feature/schema_evolution`): the full
  * autoMerge-enabled/disabled matrix over delta loads (merge), append
  * loads, and full loads (overwrite, incl. `overwriteSchema`), using the
  * reference's actual ACON JSONs, fixtures, and control schemas.
  *
  * Delta semantics surface through two engine pieces: MergeOps'
  * evolveForAutoMerge (merge path) and Writers.deltaSchemaContract
  * (append/overwrite parquet fallback). The reference asserts Delta's
  * exact error strings; this port asserts the failure plus the
  * distinguishing column name in the message. */
class ReferenceSchemaEvolutionSpec extends SparkSpec with ReferenceHarness {

  private val seRoot = s"$refRoot/schema_evolution"
  private val autoMergeConf = "spark.databricks.delta.schema.autoMerge.enabled"

  /** `_create_table` (`test_schema_evolution.py:523-545`): each scenario
    * pre-creates an empty table with this 13-column schema (note ARTICLE's
    * casing and `code`) at the OUT location. */
  private val tableDdl =
    "actrequest_timestamp string, request string, datapakid int, " +
      "partno int, record int, salesorder int, item int, recordmode string, " +
      "date int, customer string, ARTICLE string, amount int, code int"

  private def createTable(loc: String, table: Option[String] = None): Unit = {
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType.fromDDL(tableDdl)).write.mode("overwrite").parquet(loc)
    table.foreach { t =>
      ensureTestDb()
      spark.sql(s"DROP TABLE IF EXISTS test_db.$t")
      spark.sql(s"CREATE TABLE test_db.$t ($tableDdl) USING parquet LOCATION '$loc'")
    }
  }

  private def tableDf(loc: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(loc)

  /** Case-insensitive (name, type) schema view — Spark/Delta resolution
    * is case-insensitive and the reference's control schemas mix cases. */
  private def schemaKey(s: StructType): Seq[(String, String)] =
    s.fields.map(f => (f.name.toLowerCase, f.dataType.sql)).sortBy(_._1).toSeq

  private def controlSchema(path: String): StructType =
    org.apache.spark.sql.types.DataType.fromJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      .asInstanceOf[StructType]

  private def withCleanConf[A](body: => A): A =
    try body finally spark.conf.unset(autoMergeConf)

  // ---- delta_load (merge) ----------------------------------------------

  /** Choreography of test_schema_evolution_delta_load: pre-create, land
    * part-01 + its schema, init load, land the scenario part + its schema
    * as source_delta_schema.json, run the scenario acon. Returns
    * (tmp root, schema after init). */
  private def runDeltaLoadScenario(part: String, enabled: Boolean,
      acon: String): (String, StructType) = {
    val res = s"$seRoot/delta_load"
    val tmp = tmpDir(s"ref-se-dl")
    val inBase = s"$tmp/in/feature/schema_evolution/delta_load"
    val outLoc = s"$tmp/out/feature/schema_evolution/delta_load/data"
    createTable(outLoc)
    copyIn(s"$res/data/source/part-01.csv", s"$inBase/data")
    copyIn(s"$res/schema/source/source_part-01_schema.json", inBase)
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/batch_init_${if (enabled) "enabled" else "disabled"}.json", tmp))
    val initialSchema = tableDf(outLoc).schema
    copyIn(s"$res/data/source/$part.csv", s"$inBase/data")
    copyInAs(s"$res/schema/source/source_${part}_schema.json", inBase,
      "source_delta_schema.json")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/$acon.json", tmp))
    (tmp, initialSchema)
  }

  private def deltaOut(tmp: String): String =
    s"$tmp/out/feature/schema_evolution/delta_load/data"

  test("reference schema_evolution delta_load: auto_merge_enabled_add_column") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-02", enabled = true, "batch_delta_enabled")
      val control = readControlCsv(s"$seRoot/delta_load/data/control/part-02.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/delta_load/schema/control/control_schema_add_column.json"))))
      // control uses lowercase `article`; the table keeps ARTICLE — align CI
      val result = tableDf(deltaOut(tmp))
      assert(schemaKey(result.schema) == schemaKey(control.schema))
      val resultAligned = result.select(control.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)).toSeq: _*)
      assertNoDiffRef(resultAligned, control)
    }
  }

  test("reference schema_evolution delta_load: auto_merge_disabled_add_column ignores the new column") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-02", enabled = false, "batch_delta_disabled")
      assert(!tableDf(deltaOut(tmp)).columns.map(_.toLowerCase).contains("new_column"))
    }
  }

  test("reference schema_evolution delta_load: auto_merge_enabled_remove_column keeps it, nulls new rows") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-03", enabled = true, "batch_delta_enabled")
      val control = readControlCsv(s"$seRoot/delta_load/data/control/part-03.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/delta_load/schema/control/control_schema.json"))))
      assertNoDiffRef(tableDf(deltaOut(tmp)), control)
    }
  }

  test("reference schema_evolution delta_load: auto_merge_disabled_remove_column fails the merge") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val ex = intercept[Exception] {
        runDeltaLoadScenario("part-03", enabled = false, "batch_delta_disabled")
      }
      // reference: "Cannot resolve customer in UPDATE clause"
      assert(ex.getMessage.toLowerCase.contains("customer"), ex.getMessage)
    }
  }

  test("reference schema_evolution delta_load: cast column never changes the table type (both modes)") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, initial) = runDeltaLoadScenario("part-04", enabled = true, "batch_delta_enabled")
      assert(schemaKey(tableDf(deltaOut(tmp)).schema) == schemaKey(initial))
    }
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-04", enabled = false, "batch_delta_disabled")
      assert(tableDf(deltaOut(tmp)).schema("code").dataType ==
        org.apache.spark.sql.types.IntegerType)
    }
  }

  test("reference schema_evolution delta_load: auto_merge_enabled_rename_column_file adds the renamed column") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-05", enabled = true, "batch_delta_enabled")
      val control = readControlCsv(s"$seRoot/delta_load/data/control/part-05.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/delta_load/schema/control/control_schema_rename.json"))))
      assertNoDiffRef(tableDf(deltaOut(tmp)), control)
    }
  }

  test("reference schema_evolution delta_load: auto_merge_disabled_rename_column_file fails the merge") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val ex = intercept[Exception] {
        runDeltaLoadScenario("part-05", enabled = false, "batch_delta_disabled")
      }
      // reference: "Cannot resolve request in UPDATE clause"
      assert(ex.getMessage.toLowerCase.contains("request"), ex.getMessage)
    }
  }

  test("reference schema_evolution delta_load: rename_column_transform is ignored (both modes)") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      // enabled: the acon renames ARTICLE->article; CI resolution matches
      // the existing column, so the schema must not change
      val (tmp, initial) = runDeltaLoadScenario("part-06", enabled = true, "batch_delta_enabled")
      assert(schemaKey(tableDf(deltaOut(tmp)).schema) == schemaKey(initial))
    }
    withCleanConf {
      val (tmp, _) = runDeltaLoadScenario("part-06", enabled = false, "batch_delta_disabled_rename")
      val control = readControlCsv(s"$seRoot/delta_load/data/control/part-06.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/delta_load/schema/control/control_schema.json"))))
      assertNoDiffRef(tableDf(deltaOut(tmp)), control)
    }
  }

  // ---- append_load -----------------------------------------------------

  private def runAppendLoadScenario(part: String, enabled: Boolean,
      acon: String): (String, StructType) = {
    val res = s"$seRoot/append_load"
    val tmp = tmpDir(s"ref-se-al")
    val inBase = s"$tmp/in/feature/schema_evolution/append_load"
    val outLoc = s"$tmp/out/feature/schema_evolution/append_load/data"
    createTable(outLoc, table = Some("schema_evolution_append_load"))
    copyIn(s"$res/data/source/part-01.csv", s"$inBase/data")
    copyIn(s"$res/schema/source/source_part-01_schema.json", inBase)
    graft.algo.DataLoader.loadData(spark,
      rebase(s"$res/batch_init_${if (enabled) "enabled" else "disabled"}.json", tmp))
    val initialSchema = tableDf(outLoc).schema
    copyIn(s"$res/data/source/$part.csv", s"$inBase/data")
    copyInAs(s"$res/schema/source/source_${part}_schema.json", inBase,
      "source_append_schema.json")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/$acon.json", tmp))
    (tmp, initialSchema)
  }

  private def appendOut(tmp: String): String =
    s"$tmp/out/feature/schema_evolution/append_load/data"

  test("reference schema_evolution append_load: auto_merge_enabled_add_column evolves the schema") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runAppendLoadScenario("part-02", enabled = true, "batch_append_enabled")
      val control = readControlCsv(s"$seRoot/append_load/data/control/part-02.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/append_load/schema/control/control_schema_add_column.json"))))
      assertNoDiffRef(tableDf(appendOut(tmp)), control)
    }
  }

  test("reference schema_evolution append_load: auto_merge_disabled_add_column fails the write") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val ex = intercept[Exception] {
        runAppendLoadScenario("part-02", enabled = false, "batch_append_disabled")
      }
      // reference: "A schema mismatch detected when writing to the Delta table"
      assert(ex.getMessage.contains("schema mismatch"), ex.getMessage)
    }
  }

  test("reference schema_evolution append_load: remove_column appends nulls in both modes") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runAppendLoadScenario("part-03", enabled = true, "batch_append_enabled")
      val control = readControlCsv(s"$seRoot/append_load/data/control/part-03.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/append_load/schema/control/control_schema.json"))))
      assertNoDiffRef(tableDf(appendOut(tmp)), control)
    }
    withCleanConf {
      val (tmp, initial) = runAppendLoadScenario("part-03", enabled = false, "batch_append_disabled")
      assert(schemaKey(tableDf(appendOut(tmp)).schema) == schemaKey(initial))
    }
  }

  test("reference schema_evolution append_load: cast column — enabled fails, disabled keeps the type") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      // the enabled_cast acon casts `code` to string; appending a string
      // column over an int table column cannot up-cast
      val ex = intercept[Exception] {
        runAppendLoadScenario("part-04", enabled = true, "batch_append_enabled_cast")
      }
      // reference: "Failed to merge fields"
      assert(ex.getMessage.contains("Failed to merge"), ex.getMessage)
    }
    withCleanConf {
      val (tmp, initial) = runAppendLoadScenario("part-04", enabled = false, "batch_append_disabled")
      assert(schemaKey(tableDf(appendOut(tmp)).schema) == schemaKey(initial))
    }
  }

  test("reference schema_evolution append_load: rename_column_file — enabled adds, disabled fails") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val (tmp, _) = runAppendLoadScenario("part-05", enabled = true, "batch_append_enabled")
      val control = readControlCsv(s"$seRoot/append_load/data/control/part-05.csv",
        Some(java.nio.file.Files.readString(java.nio.file.Paths.get(
          s"$seRoot/append_load/schema/control/control_schema_rename.json"))))
      assertNoDiffRef(tableDf(appendOut(tmp)), control)
    }
    withCleanConf {
      val ex = intercept[Exception] {
        runAppendLoadScenario("part-05", enabled = false, "batch_append_disabled")
      }
      assert(ex.getMessage.contains("schema mismatch"), ex.getMessage)
    }
  }

  test("reference schema_evolution append_load: rename_column_transform is ignored in both modes") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    for (enabled <- Seq(true, false)) withCleanConf {
      val acon = if (enabled) "batch_append_enabled" else "batch_append_disabled"
      val (tmp, initial) = runAppendLoadScenario("part-06", enabled, acon)
      assert(schemaKey(tableDf(appendOut(tmp)).schema) == schemaKey(initial))
    }
  }

  // ---- full_load (overwrite) -------------------------------------------

  private def runFullLoadScenario(acon: String): String = {
    val res = s"$seRoot/full_load"
    val tmp = tmpDir(s"ref-se-fl")
    val inBase = s"$tmp/in/feature/schema_evolution/full_load"
    val outLoc = s"$tmp/out/feature/schema_evolution/full_load/data"
    createTable(outLoc)
    copyIn(s"$res/data/source/part-01.csv", s"$inBase/data")
    copyInAs(s"$res/schema/source/source_part-01_schema.json", inBase, "source_schema.json")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/batch_init.json", tmp))
    copyIn(s"$res/data/source/part-02.csv", s"$inBase/data")
    copyInAs(s"$res/schema/source/source_part-02_schema.json", inBase, "source_schema.json")
    graft.algo.DataLoader.loadData(spark, rebase(s"$res/$acon.json", tmp))
    tmp
  }

  test("reference schema_evolution full_load: auto_merge_enabled unions the schema on overwrite") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val tmp = runFullLoadScenario("batch_merge_enabled")
      val want = controlSchema(
        s"$seRoot/full_load/schema/control/control_schema_merge_enabled.json")
      val got = tableDf(s"$tmp/out/feature/schema_evolution/full_load/data").schema
      assert(schemaKey(got) == schemaKey(want))
    }
  }

  test("reference schema_evolution full_load: auto_merge_disabled fails the overwrite") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val ex = intercept[Exception] { runFullLoadScenario("batch_merge_disabled") }
      // reference: "Failed to merge"
      assert(ex.getMessage.contains("Failed to merge"), ex.getMessage)
    }
  }

  test("reference schema_evolution full_load: overwriteSchema replaces the schema") {
    assume(new java.io.File(seRoot).isDirectory, s"missing $seRoot")
    withCleanConf {
      val tmp = runFullLoadScenario("batch_overwrite")
      val want = controlSchema(
        s"$seRoot/full_load/schema/control/control_schema_overwrite.json")
      val got = tableDf(s"$tmp/out/feature/schema_evolution/full_load/data").schema
      assert(schemaKey(got) == schemaKey(want))
    }
  }
}
