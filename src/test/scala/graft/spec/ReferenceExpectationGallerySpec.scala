package graft.spec

import graft.SparkSpec
import graft.dq.DQEngine
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The reference's custom-expectation GALLERY examples executed verbatim.
  *
  * Each of the 7 custom GX expectations under
  * `lakehouse_engine/dq_processors/custom_expectations/` embeds an
  * `examples` block (positive + negative cases with expected `success` and
  * `unexpected_index_list`), exercised in the reference by
  * `tests/feature/custom_expectations/test_expectation_validity.py:14-30`
  * via GX's gallery diagnostics. The GX docstring-convention checks that
  * runner also performs are N/A to a GX-free engine (see COVERAGE.md);
  * the example fixtures themselves are real and are executed here, one
  * test per example case, asserting BOTH the success flag and the
  * complete unexpected index list (entry set keyed by the case's
  * `unexpected_index_column_names` plus the expectation's domain columns,
  * exactly as GX's COMPLETE result format reports them).
  */
class ReferenceExpectationGallerySpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Render-normalize a value for comparison: JSON timestamp spellings
    * ("2023-06-01T12:00:00.000Z") and the examples' python spellings
    * ("2023-06-01 12:00:00") compare equal on the minute prefix. */
  private def norm(s: String): String = {
    val t = s.replace("T", " ").stripSuffix("Z")
    val noFrac = if (t.contains(".")) t.substring(0, t.indexOf('.')) else t
    // compare timestamps at minute precision like the expected fixtures
    if (noFrac.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}.*"""))
      noFrac.substring(0, 16)
    else noFrac
  }

  /** Run one expectation exactly as the gallery runner does: COMPLETE
    * result format with the given unexpected-index columns; returns
    * (success, unexpected_index_list as entry maps). */
  private def runCase(
      df: DataFrame,
      expectation: String,
      args: Map[String, Any],
      indexCols: Seq[String]): (Boolean, Set[Map[String, String]]) = {
    val spec = DQSpec("gallery", "gallery_input",
      dqFunctions = Seq(DQFunctionSpec(expectation, args)),
      unexpectedRowsPk = indexCols)
    val (result, _) = DQEngine.runOutcome(spark, df, spec)
    val o = result.outcomes.head
    val entries = o.unexpectedIndexList.map { json =>
      val node = mapper.readTree(json)
      node.properties().asScala
        .map(e => e.getKey -> norm(e.getValue.asText())).toMap
    }.toSet
    (o.success, entries)
  }

  private def expectEntries(raw: Seq[Map[String, String]]): Set[Map[String, String]] =
    raw.map(_.map { case (k, v) => k -> norm(v) }).toSet

  // ---- expect_column_pair_a_to_be_smaller_or_equal_than_b.py:99-160 ----

  private lazy val smallerDf = {
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, IntegerType)))
    spark.createDataFrame(
      Seq(Row(11, 10, 9), Row(22, 21, 21), Row(50, 100, 30)).asJava, schema)
  }

  test("gallery smaller_or_equal_than_b negative_test") {
    val (success, entries) = runCase(smallerDf,
      "expect_column_pair_a_to_be_smaller_or_equal_than_b",
      Map("column_A" -> "a", "column_B" -> "c"), Seq("c", "a"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("c" -> "9", "a" -> "11"),
      Map("c" -> "21", "a" -> "22"),
      Map("c" -> "30", "a" -> "50"))))
  }

  test("gallery smaller_or_equal_than_b positive_test") {
    val (success, entries) = runCase(smallerDf,
      "expect_column_pair_a_to_be_smaller_or_equal_than_b",
      Map("column_A" -> "a", "column_B" -> "b", "margin" -> 1), Seq("a"))
    assert(success && entries.isEmpty)
  }

  // ---- expect_column_pair_a_to_be_not_equal_to_b.py:87-147 --------------

  private lazy val notEqualDf = {
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, StringType)))
    spark.createDataFrame(Seq(
      Row("IE4019", "IE4019", "IE1404"),
      Row("IM6092", "IM6092", "IN6192"),
      Row("IE1405", "IE1405", "842075")).asJava, schema)
  }

  test("gallery a_to_be_not_equal_to_b negative_test") {
    val (success, entries) = runCase(notEqualDf,
      "expect_column_pair_a_to_be_not_equal_to_b",
      Map("column_A" -> "a", "column_B" -> "b"), Seq("b", "a"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("b" -> "IE4019", "a" -> "IE4019"),
      Map("b" -> "IM6092", "a" -> "IM6092"),
      Map("b" -> "IE1405", "a" -> "IE1405"))))
  }

  test("gallery a_to_be_not_equal_to_b positive_test") {
    val (success, entries) = runCase(notEqualDf,
      "expect_column_pair_a_to_be_not_equal_to_b",
      Map("column_A" -> "a", "column_B" -> "c"), Seq("a"))
    assert(success && entries.isEmpty)
  }

  // ---- expect_column_pair_date_a_to_be_greater_than_or_equal_to_date_b
  //      .py:83-159 --------------------------------------------------------

  private lazy val datePairDf = {
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, DateType)))
    def d(s: String) = java.sql.Date.valueOf(s)
    spark.createDataFrame(Seq(
      Row(d("2029-01-12"), d("2019-02-11"), d("2010-02-11")),
      Row(d("2024-11-21"), d("2014-12-22"), d("2015-12-22")),
      Row(d("2022-01-01"), d("2012-09-09"), d("2022-09-09"))).asJava, schema)
  }

  test("gallery date_a_greater_or_equal_date_b positive_test") {
    val (success, entries) = runCase(datePairDf,
      "expect_column_pair_date_a_to_be_greater_than_or_equal_to_date_b",
      Map("column_A" -> "a", "column_B" -> "b"), Seq("a", "b"))
    assert(success && entries.isEmpty)
  }

  test("gallery date_a_greater_or_equal_date_b negative_test") {
    val (success, entries) = runCase(datePairDf,
      "expect_column_pair_date_a_to_be_greater_than_or_equal_to_date_b",
      Map("column_A" -> "b", "column_B" -> "c"), Seq("a", "b", "c"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("a" -> "2024-11-21", "b" -> "2014-12-22", "c" -> "2015-12-22"),
      Map("a" -> "2022-01-01", "b" -> "2012-09-09", "c" -> "2022-09-09"))))
  }

  // ---- expect_column_values_to_be_date_not_older_than.py:107-173 --------

  private lazy val notOlderDf = {
    val schema = StructType(Seq("a", "b").map(StructField(_, TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    spark.createDataFrame(Seq(
      Row(ts("2023-06-01 12:00:00"), ts("1800-06-01 12:00:00")),
      Row(ts("2023-06-02 12:00:00"), ts("2023-06-02 12:00:00")),
      Row(ts("2023-06-03 12:00:00"), ts("1800-06-03 12:00:00"))).asJava, schema)
  }

  test("gallery date_not_older_than positive_test") {
    val (success, entries) = runCase(notOlderDf,
      "expect_column_values_to_be_date_not_older_than",
      Map("column" -> "a", "timeframe" -> Map("years" -> 100)), Seq("b"))
    assert(success && entries.isEmpty)
  }

  test("gallery date_not_older_than negative_test") {
    val (success, entries) = runCase(notOlderDf,
      "expect_column_values_to_be_date_not_older_than",
      Map("column" -> "b", "timeframe" -> Map("years" -> 100)), Seq("a", "b"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("a" -> "2023-06-01 12:00", "b" -> "1800-06-01 12:00"),
      Map("a" -> "2023-06-03 12:00", "b" -> "1800-06-03 12:00"))))
  }

  // ---- expect_column_values_to_not_be_null_or_empty_string.py:79-139 ----

  private lazy val notEmptyDf = {
    val schema = StructType(Seq("a", "b").map(StructField(_, StringType)))
    spark.createDataFrame(Seq(
      Row("4061622965678", "4061622965678"),
      Row("4061622965679", ""),
      Row("4061622965680", "4061622965680")).asJava, schema)
  }

  test("gallery not_null_or_empty_string positive_test") {
    val (success, entries) = runCase(notEmptyDf,
      "expect_column_values_to_not_be_null_or_empty_string",
      Map("column" -> "a"), Seq("b"))
    assert(success && entries.isEmpty)
  }

  test("gallery not_null_or_empty_string negative_test") {
    val (success, entries) = runCase(notEmptyDf,
      "expect_column_values_to_not_be_null_or_empty_string",
      Map("column" -> "b"), Seq("a", "b"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("a" -> "4061622965679", "b" -> ""))))
  }

  // ---- expect_multicolumn_column_a_must_equal_b_or_c.py:89-150 ----------

  private lazy val multiDf = {
    val schema = StructType(Seq("a", "b", "c", "d").map(StructField(_, StringType)))
    spark.createDataFrame(Seq(
      Row("d001", null, "d001", "d001"),
      Row("1000", "1000", "d002", "d002"),
      Row("1001", "1001", "d002", "1001")).asJava, schema)
  }

  test("gallery a_must_equal_b_or_c negative_test") {
    val (success, entries) = runCase(multiDf,
      "expect_multicolumn_column_a_must_equal_b_or_c",
      Map("column_list" -> Seq("d", "b", "c"),
        "validation_regex_c" -> "d[0-9]{3}$"), Seq("d", "b", "c"))
    assert(!success)
    assert(entries == expectEntries(Seq(
      Map("d" -> "d002", "b" -> "1000", "c" -> "d002"))))
  }

  test("gallery a_must_equal_b_or_c positive_test") {
    val (success, _) = runCase(multiDf,
      "expect_multicolumn_column_a_must_equal_b_or_c",
      Map("column_list" -> Seq("a", "b", "c"),
        "validation_regex_c" -> "d[0-9]{3}$"), Seq("a", "b", "c"))
    assert(success)
  }

  // ---- expect_queried_column_agg_value_to_be.py:264-399 -----------------
  // (table-level: the examples assert the success flag only)

  private lazy val salaryDf = {
    val schema = StructType(Seq(
      StructField("ID", IntegerType), StructField("Names", StringType),
      StructField("Age", IntegerType), StructField("Gender", StringType),
      StructField("Salary", IntegerType)))
    spark.createDataFrame(Seq(
      Row(1, "Ramesh", 25, "Male", 1000),
      Row(2, "Nasser", 25, "Male", 2500),
      Row(3, "Jessica", 25, "Female", 5000),
      Row(4, "Komal", 20, "Female", 3500),
      Row(5, "Jude", 20, "Male", 6900),
      Row(6, "Muffy", 25, "Female", 1200)).asJava, schema)
  }

  private val aggCases: Seq[(String, Map[String, Any], Boolean)] = Seq(
    ("sum by Gender greater 2000",
      Map("column" -> "Salary", "group_column_list" -> "Gender",
        "agg_type" -> "sum", "condition" -> "greater", "min_value" -> 2000), true),
    ("sum by Gender,Age between 2000..7000",
      Map("column" -> "Salary", "group_column_list" -> "Gender,Age",
        "agg_type" -> "sum", "condition" -> "between",
        "max_value" -> 7000, "min_value" -> 2000), true),
    ("max by Age lesser 10000",
      Map("column" -> "Salary", "group_column_list" -> "Age",
        "agg_type" -> "max", "condition" -> "lesser", "max_value" -> 10000), true),
    ("count by Gender greater 4",
      Map("column" -> "Salary", "group_column_list" -> "Gender",
        "agg_type" -> "count", "condition" -> "greater", "min_value" -> 4), false),
    ("sum by Gender,Age between 1000..2000",
      Map("column" -> "Salary", "group_column_list" -> "Gender,Age",
        "agg_type" -> "sum", "condition" -> "between",
        "max_value" -> 2000, "min_value" -> 1000), false))

  for ((title, templateDict, expected) <- aggCases)
    test(s"gallery queried_column_agg_value_to_be: $title") {
      val (success, _) = runCase(salaryDf,
        "expect_queried_column_agg_value_to_be",
        Map("template_dict" -> templateDict), Seq.empty)
      assert(success == expected)
    }
}
