package graft.spec

import graft.Engine
import org.scalatest.funsuite.AnyFunSuite

/** The reference's manager-ACON validation unit tests executed verbatim
  * (`tests/unit/test_acon_validation.py` over
  * `utils/acon_utils.py:17-35,99-152` / `validate_manager_list`):
  * each scenario's ACON runs through validation and, where the reference
  * asserts an exception, the FULL message must match character for
  * character (Python list reprs included). */
class ReferenceAconValidationSpec extends AnyFunSuite {

  private def expectError(aconJson: String, expected: String): Unit = {
    val e = intercept[RuntimeException](Engine.validateManagerList(aconJson))
    assert(e.getMessage == expected, s"\ngot:\n${e.getMessage}\nwant:\n$expected")
  }

  test("validate delete objects function (valid) passes") {
    val ops = Engine.validateManagerList(
      """{"operations": [
        |  {"manager": "file", "function": "delete_objects",
        |   "bucket": "example-bucket",
        |   "object_paths": ["path/to/delete/"], "dry_run": true}
        |]}""".stripMargin)
    assert(ops.size == 1)
  }

  test("validate copy objects function with missing parameters") {
    expectError(
      """{"operations": [
        |  {"manager": "file", "function": "copy_objects",
        |   "bucket": "example-bucket", "source_object": ["path/to/copy/"]}
        |]}""".stripMargin,
      "Errors found during validation:\n" +
        "Missing mandatory parameters for file manager function copy_objects: " +
        "['destination_bucket', 'destination_object', 'dry_run']\n" +
        "Type validation errors for file manager function copy_objects: " +
        "[\"Parameter 'source_object' expected str, got list\"]")
  }

  test("validate list of operations (all valid) passes") {
    val ops = Engine.validateManagerList(
      """{"operations": [
        |  {"manager": "file", "function": "delete_objects",
        |   "bucket": "example-bucket",
        |   "object_paths": ["path/to/delete/"], "dry_run": true},
        |  {"manager": "table", "function": "execute_sql",
        |   "sql": "create example_table"},
        |  {"manager": "table", "function": "optimize",
        |   "table_or_view": "example_table"}
        |]}""".stripMargin)
    assert(ops.size == 3)
  }

  test("validate list of operations with errors") {
    expectError(
      """{"operations": [
        |  {"manager": "file", "function": "delete_objects",
        |   "bucket": "example-bucket",
        |   "object_paths": "path/to/delete/", "dry_run": "test string"},
        |  {"manager": "table", "function": "execute_sql", "sql": 10},
        |  {"manager": "table", "function": "optimize_dataset",
        |   "table_or_view": "example_table"}
        |]}""".stripMargin,
      "Errors found during validation:\n" +
        "Type validation errors for file manager function delete_objects: " +
        "[\"Parameter 'object_paths' expected list, got str\", " +
        "\"Parameter 'dry_run' expected bool, got str\"]\n" +
        "Type validation errors for table manager function execute_sql: " +
        "[\"Parameter 'sql' expected str, got int\"]\n" +
        "Function 'optimize_dataset' not supported for table manager")
  }

  test("empty operations list raises the reference's message") {
    val e = intercept[RuntimeException](
      Engine.validateManagerList("""{"operations": []}"""))
    assert(e.getMessage == "No operations found in the acon.")
  }
}
