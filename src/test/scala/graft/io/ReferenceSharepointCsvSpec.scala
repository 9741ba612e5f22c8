package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The reference's Sharepoint CSV reader unit tests executed verbatim
  * (`tests/unit/test_sharepoint_csv_reader.py` over
  * `io/readers/sharepoint_reader.py:470-598`): delimiter detection and
  * Spark CSV option resolution. */
class ReferenceSharepointCsvSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("detect_delimiter uses the user-provided delimiter") {
    assert(SharepointIo.detectDelimiter(
      bytes("column_a;column_b\n1;2\n"), providedDelimiter = Some("|")) == "|")
  }

  test("detect_delimiter autodetects semicolon") {
    assert(SharepointIo.detectDelimiter(
      bytes("column_a;column_b\n1;2\n")) == ";")
  }

  test("detect_delimiter defaults to comma on decode error") {
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(SharepointIo.detectDelimiter(
      Array(0xff.toByte, 0xfe.toByte), warn = warnings += _) == ",")
    assert(warnings.exists(_.startsWith(
      "Failed to auto-detect delimiter. Defaulting to comma.")))
  }

  test("resolve_spark_csv_options prefers sep over delimiter, drops delimiter") {
    val opts = SharepointIo.resolveSparkCsvOptions(
      Map("sep" -> "|", "delimiter" -> ",", "header" -> "true"),
      bytes("column_a,column_b\n1,2\n"))
    assert(opts("sep") == "|")
    assert(!opts.contains("delimiter"))
  }

  test("resolve_spark_csv_options maps delimiter into sep when sep missing") {
    val opts = SharepointIo.resolveSparkCsvOptions(
      Map("delimiter" -> ";", "header" -> "true"),
      bytes("column_a,column_b\n1,2\n"))
    assert(opts("sep") == ";")
    assert(!opts.contains("delimiter"))
  }

  test("resolve_spark_csv_options autodetects when no delimiter provided") {
    val opts = SharepointIo.resolveSparkCsvOptions(
      Map("header" -> "true"),
      bytes("column_a|column_b\n1|2\n"))
    assert(opts("sep") == "|")
  }

  test("warns when expected column names mismatch the header") {
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    SharepointIo.resolveSparkCsvOptions(
      Map("header" -> "true", "expected_columns" -> "col_a,col_b"),
      bytes("wrong_a;wrong_b\n1;2\n"), warnings += _)
    assert(warnings.exists(_.contains(
      "Expected columns don't match CSV header")))
  }

  test("warns when expected-columns validation cannot decode the header") {
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    SharepointIo.resolveSparkCsvOptions(
      Map("header" -> "true", "expected_columns" -> "col_a,col_b"),
      Array(0xff.toByte, 0xfe.toByte), warnings += _)
    assert(warnings.exists(_.contains(
      "Failed to validate expected_columns against CSV header")))
  }
}
