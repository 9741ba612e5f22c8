package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (reference tests the same way:
  * a real session, no mocks — `tests/utils/exec_env_helpers.py`). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.exec.ExecEnv.getOrCreate(
    appName = "graft-test",
    master = Some("local[4]"),
    confs = Map(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.ui.enabled" -> "false",
      "spark.sql.warehouse.dir" -> s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}"))

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Two-sided exceptAll diff, as the reference's golden compare
    * (`tests/utils/dataframe_helpers.py:32-70`). */
  def assertSameRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    val left = a.exceptAll(b)
    val right = b.exceptAll(a)
    val (l, r) = (left.count(), right.count())
    assert(l == 0 && r == 0,
      s"dataframes differ: ${l} rows only in left, ${r} rows only in right\n" +
        s"left-only sample: ${left.take(5).mkString("; ")}\n" +
        s"right-only sample: ${right.take(5).mkString("; ")}")
  }
}
