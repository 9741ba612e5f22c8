package graft.spec

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared machinery for executing the reference's own feature scenarios
  * verbatim: rebase its ACON JSONs' `/app/tests/lakehouse` root onto a
  * local tmp dir, copy `data/source` fixtures per the reference test's
  * choreography (read the driver under `tests/feature`), run, and golden-compare against
  * its `data/control` files. See [[ReferenceScenariosSpec]] for the
  * original per-family cases. */
trait ReferenceHarness { self: SparkSpec =>

  val refRoot = "/root/reference/tests/resources/feature"

  /** The reference conftest pre-creates test_db before any scenario. */
  def ensureTestDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS test_db")

  def rebase(aconPath: String, tmpRoot: String): String =
    Files.readString(Paths.get(aconPath))
      .replace("file:///app/tests/lakehouse", s"file://$tmpRoot")
      .replace("/app/tests/lakehouse", tmpRoot)

  def copyIn(src: String, destDir: String): Unit = {
    Files.createDirectories(Paths.get(destDir))
    Files.copy(Paths.get(src),
      Paths.get(destDir, Paths.get(src).getFileName.toString),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Copy with an explicit destination file name (the reference's
    * group_and_rank loads suffix arriving files with the iteration). */
  def copyInAs(src: String, destDir: String, name: String): Unit = {
    Files.createDirectories(Paths.get(destDir))
    Files.copy(Paths.get(src), Paths.get(destDir, name),
      StandardCopyOption.REPLACE_EXISTING)
  }

  def cleanDir(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.isDirectory(p))
      Files.list(p).forEach(f => Files.deleteIfExists(f))
  }

  /** Control CSV read the way the reference's DataframeHelpers does
    * (header, `|` delimiter, inferSchema unless a schema is given). */
  def readControlCsv(csv: String, schemaDdlOrJson: Option[String] = None): DataFrame = {
    val r = spark.read.options(Map("header" -> "true", "delimiter" -> "|"))
    schemaDdlOrJson match {
      case Some(s) if s.trim.startsWith("{") =>
        r.schema(org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).csv(csv)
      case Some(ddl) => r.schema(ddl).csv(csv)
      case None => r.option("inferSchema", "true").csv(csv)
    }
  }

  /** has_diff-style compare: align on the CONTROL's columns, cast both
    * sides to string, two-sided exceptAll. */
  def assertNoDiffRef(result: DataFrame, control: DataFrame): Unit = {
    assert(result.columns.sorted.toSeq == control.columns.sorted.toSeq,
      s"schema mismatch: ${result.columns.sorted.mkString(",")} vs ${control.columns.sorted.mkString(",")}")
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    assertSameRows(norm(result), norm(control))
  }

  /** Result parquet vs control CSV. */
  def assertMatchesControlCsv(outLoc: String, controlCsv: String,
      schema: Option[String] = None): Unit =
    assertNoDiffRef(spark.read.parquet(outLoc), readControlCsv(controlCsv, schema))

  /** The reference's `_create_dq_functions_source_table`: an
    * 11-string-column rules table whose data comes from a `|`-CSV; the
    * pre-created schema survives the overwrite, null-filling the columns
    * the CSV lacks (`tests/utils/dq_rules_table_utils.py`). */
  def createPrismaRulesTable(csvPath: String, tableName: String): Unit = {
    val cols = Seq(
      "dq_rule_id", "dq_check_type", "dq_tech_function", "execution_point",
      "schema", "table", "column", "filters", "arguments",
      "expected_technical_expression", "dimension")
    ensureTestDb()
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val csv = spark.read.options(Map("header" -> "true", "delimiter" -> "|"))
      .csv(csvPath)
    csv.select(cols.map(c =>
        if (csv.columns.contains(c)) col(c).cast("string").as(c)
        else org.apache.spark.sql.functions.lit(null).cast("string").as(c)): _*)
      .write.mode("overwrite").saveAsTable(tableName)
  }

  /** True when the two frames differ (the reference's has_diff). */
  def hasDiffRef(result: DataFrame, control: DataFrame): Boolean = {
    def norm(df: DataFrame) =
      df.select(control.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    result.columns.sorted.toSeq != control.columns.sorted.toSeq ||
      norm(result).exceptAll(norm(control)).count() != 0 ||
      norm(control).exceptAll(norm(result)).count() != 0
  }
}
