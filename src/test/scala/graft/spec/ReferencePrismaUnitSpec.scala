package graft.spec

import graft.SparkSpec
import graft.dq.{DQSpecMalformedException, Prisma}
import scala.collection.immutable.ListMap

/** The reference's PRISMA unit contracts run verbatim:
  * `tests/unit/test_prisma_dq_rule_id.py` (rule-id duplication reporting
  * over inline dq_functions) and
  * `tests/unit/test_prisma_function_definition.py` (meta-field validation
  * messages, byte-for-byte). */
class ReferencePrismaUnitSpec extends SparkSpec {

  /** A dq function carrying the scenario's meta dict, insertion-ordered
    * exactly as the reference test writes it. */
  private def fn(meta: Seq[(String, Any)]): DQFunctionSpec =
    DQFunctionSpec("expect_column_to_exist",
      ListMap("column" -> "test_column", "meta" -> ListMap(meta: _*)))

  private def fullMeta(ruleId: String, extra: Seq[(String, Any)] = Seq.empty) =
    Seq[(String, Any)]("dq_rule_id" -> ruleId, "execution_point" -> "in_motion",
      "schema" -> "test_db", "table" -> "dummy_sales", "column" -> "",
      "dimension" -> "", "filters" -> "") ++ extra

  // --- test_prisma_dq_rule_id.py -------------------------------------

  test("prisma rule-id duplication: spec without duplicates reports nothing") {
    val spec = DQSpec("spec_without_duplicates",
      "Definition of DQ Functions using parameters without duplicates",
      dqType = "prisma",
      dqFunctions = Seq("rule_2", "rule_1", "rule_3").map(id => fn(
        fullMeta(id, Seq("note" -> "Test Notes")))))
    assert(Prisma.ruleIdDuplication(spark, Seq(spec)).isEmpty)
  }

  test("prisma rule-id duplication: duplicates report EVERY rule id") {
    val spec = DQSpec("spec_with_duplicates",
      "Error: Definition of DQ Functions using parameters with duplicates",
      dqType = "prisma",
      dqFunctions = Seq("rule_2", "rule_1", "rule_2").map(id => fn(
        fullMeta(id, Seq("note" -> "Test Notes")))))
    // the reference's expected_error dict, verbatim: the value is the
    // WHOLE id list, not just the duplicated entries
    assert(Prisma.ruleIdDuplication(spark, Seq(spec)) ==
      Seq("dq_spec_id: spec_with_duplicates" -> "rule_2; rule_1; rule_2"))
  }

  // --- test_prisma_function_definition.py ----------------------------

  test("prisma meta validation: missing meta parameters message is verbatim") {
    val spec = DQSpec("s", "Error: missing meta parameters", dqType = "prisma",
      dqFunctions = Seq(fn(Seq("table" -> "test_table",
        "execution_point" -> "in_motion"))))
    val e = intercept[DQSpecMalformedException](
      Prisma.validateMeta(spec, "in_motion"))
    assert(e.getMessage ==
      "The dq function meta field must contain all the fields defined" +
        ": ['dq_rule_id', 'execution_point', 'filters', 'schema', " +
        "'table', 'column', 'dimension'].\n" +
        "Found fields: ['table', 'execution_point'].\n" +
        "Diff: ['column', 'dimension', 'dq_rule_id', 'filters', 'schema']")
  }

  test("prisma meta validation: missing meta message is verbatim") {
    val spec = DQSpec("s", "Error: missing meta", dqType = "prisma",
      dqFunctions = Seq(DQFunctionSpec("expect_column_to_exist",
        Map("column" -> "test_column"))))
    val e = intercept[DQSpecMalformedException](
      Prisma.validateMeta(spec, "in_motion"))
    assert(e.getMessage ==
      "The dq function must have a meta field containing all the " +
        "fields defined: ['dq_rule_id', " +
        "'execution_point', 'filters', 'schema', 'table', 'column', " +
        "'dimension'].")
  }

  test("prisma meta validation: complete meta passes, with and without extra params") {
    Prisma.validateMeta(DQSpec("s", "Definition of DQ Functions",
      dqType = "prisma", dqFunctions = Seq(fn(fullMeta("rule_2")))),
      "in_motion")
    Prisma.validateMeta(DQSpec("s", "Definition of DQ Functions with extra params",
      dqType = "prisma", dqFunctions = Seq(fn(
        fullMeta("rule_2", Seq("note" -> "Test Notes"))))),
      "in_motion")
  }

  test("prisma meta validation: execution point must match the spec's") {
    // `utils/dq_utils.py:159-164` — a meta declaring in_motion fails an
    // at_rest validation run
    val spec = DQSpec("s", "in", dqType = "prisma",
      dqFunctions = Seq(fn(fullMeta("rule_1"))))
    val e = intercept[DQSpecMalformedException](
      Prisma.validateMeta(spec, "at_rest"))
    assert(e.getMessage ==
      "The dq function execution point must be the same as " +
        "the execution point of the dq spec.")
    Prisma.validateMeta(spec, "in_motion")
    Prisma.validateMeta(spec) // no execution point → no check
  }

  // --- the two raise paths over duplication --------------------------

  test("validator raise renders the reference's error dict verbatim") {
    val spec = DQSpec("spec_with_duplicates", "in", dqType = "prisma",
      dqFunctions = Seq("rule_2", "rule_1", "rule_2").map(id =>
        fn(fullMeta(id))))
    val e = intercept[graft.dq.DQDuplicateRuleIdException](
      Prisma.raiseOnDuplicates(spark, Seq(spec)))
    assert(e.getMessage ==
      "Duplicate dq_rule_id detected in dq_spec definition.\n" +
        "We have identified one or more duplicate dq_rule_id entries in " +
        "the dq_spec definition. Please review and verify the following " +
        "dq_rules:\n" +
        "{'dq_spec_id: spec_with_duplicates': 'rule_2; rule_1; rule_2'}")
  }

  test("data loader with duplicate rule ids writes the data, skips DQ, raises last") {
    // `data_loader.py:130-177` + `:245-253`: the duplicate-rule failure is
    // reported AFTER write/terminate complete — the load is not lost, the
    // DQ stage simply never runs
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("dup-load").toString
    val df = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "name")
    def f(id: String): String =
      s"""{"function": "expect_column_to_exist", "args": {"column": "id",
         |  "meta": {"dq_rule_id": "$id", "execution_point": "in_motion",
         |    "schema": "s", "table": "t", "column": "", "dimension": "",
         |    "filters": ""}}}""".stripMargin
    val acon =
      s"""{
         |  "input_specs": [{"spec_id": "src", "data_format": "dataframe", "df_name": "d"}],
         |  "dq_specs": [{
         |    "spec_id": "dup_spec", "input_id": "src", "dq_type": "prisma",
         |    "data_product_name": "dp", "unexpected_rows_pk": ["id"],
         |    "dq_functions": [${f("rule_2")}, ${f("rule_1")}, ${f("rule_2")}]
         |  }],
         |  "output_specs": [{"spec_id": "sink", "input_id": "dup_spec",
         |    "data_format": "parquet", "location": "$out/data",
         |    "write_type": "overwrite"}]
         |}""".stripMargin
    val e = intercept[graft.dq.DQDuplicateRuleIdException](
      graft.algo.DataLoader.loadData(spark, acon, dfs = Map("d" -> df)))
    assert(e.getMessage.startsWith(
      "Data Written Successfully, but DQ Process Encountered an Issue.\n"))
    assert(e.getMessage.endsWith(
      "{'dq_spec_id: dup_spec': 'rule_2; rule_1; rule_2'}"))
    // the write completed before the raise
    assert(spark.read.parquet(s"$out/data").count() == 3)
  }

  test("rules-table duplication reports GROUP BY rows in Python Row repr") {
    import spark.implicits._
    Seq(("rule_1", "f"), ("rule_2", "f"), ("rule_2", "g"))
      .toDF("dq_rule_id", "dq_tech_function")
      .createOrReplaceTempView("prisma_unit_rules")
    val spec = DQSpec("table_spec", "in", dqType = "prisma",
      dqDbTable = Some("prisma_unit_rules"))
    assert(Prisma.ruleIdDuplication(spark, Seq(spec)) ==
      Seq("dq_spec_id: table_spec" -> "Row(dq_rule_id='rule_2', count=2)"))
  }
}
