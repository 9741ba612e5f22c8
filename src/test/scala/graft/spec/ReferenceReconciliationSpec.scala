package graft.spec

import graft.SparkSpec
import graft.algo.{Reconciliator, ReconciliationFailedException}

/** The reference's reconciliation feature scenarios executed VERBATIM
  * (`tests/feature/test_reconciliation.py`): the inline ACONs
  * (with/without preprocess queries, empty-df checks) over the
  * reference's own JSON fixtures, asserting the exact recon-results
  * values and failure messages the reference asserts. */
class ReferenceReconciliationSpec extends SparkSpec with ReferenceHarness {

  private val rcRoot = s"$refRoot/reconciliation/data"
  private def available = new java.io.File(rcRoot).isDirectory

  private def input(file: String): Map[String, Any] = Map(
    "spec_id" -> "src", "read_type" -> "batch", "data_format" -> "json",
    "options" -> Map("multiline" -> "true"),
    "location" -> s"$rcRoot/$file")

  private def metric(tpe: String, agg: String, yellow: Double, red: Double) =
    Map("metric" -> "net_sales", "type" -> tpe, "aggregation" -> agg,
      "yellow" -> yellow, "red" -> red)

  private def aconWithQueries(current: String, truth: String,
      ignoreEmpty: Option[Boolean] = None, emptyQueries: Boolean = false): Map[String, Any] = {
    val where = if (emptyQueries) " WHERE 1 = 0" else ""
    Map(
      "metrics" -> Seq(
        metric("absolute", "sum", 0.05, 0.1),
        metric("percentage", "avg", 0.04, 0.08)),
      "truth_input_spec" -> input(truth),
      "truth_preprocess_query" ->
        s"SELECT country, sum(net_sales) as net_sales FROM truth$where GROUP BY country",
      "truth_preprocess_query_args" -> Seq(Map(
        "function" -> "persist",
        "args" -> Map("storage_level" -> "MEMORY_AND_DISK_DESER"))),
      "current_input_spec" -> input(current),
      "current_preprocess_query" ->
        s"SELECT country, sum(net_sales) as net_sales FROM current$where GROUP BY country",
      "current_preprocess_query_args" -> Seq(Map(
        "function" -> "persist",
        "args" -> Map("storage_level" -> "MEMORY_AND_DISK")))) ++
      ignoreEmpty.map("ignore_empty_df" -> _)
  }

  private def aconWithoutQueries(current: String, truth: String,
      m1: Map[String, Any] = metric("absolute", "sum", 0.01, 0.05),
      m2: Map[String, Any] = metric("absolute", "avg", 0.04, 0.08)): Map[String, Any] =
    Map(
      "metrics" -> Seq(m1, m2),
      "truth_input_spec" -> input(truth),
      "truth_preprocess_query_args" -> Seq(Map("function" -> "cache")),
      "current_input_spec" -> input(current),
      "current_preprocess_query_args" -> Seq.empty[Map[String, Any]])

  /** Recon results despite a breaching status: same acon, thresholds
    * lifted out of reach (the reference asserts the logged results). */
  private def resultsOf(acon: Map[String, Any]): Map[String, Double] = {
    val lifted = acon + ("metrics" -> Specs.A.seqOfMaps(acon, "metrics")
      .map(m => m + ("yellow" -> 1e18) + ("red" -> 1e18)))
    Reconciliator.runAcon(spark, lifted)
  }

  test("reference reconciliation with_queries_pct succeeds") {
    assume(available, s"missing $rcRoot")
    Reconciliator.runAcon(spark, aconWithQueries("current.json", "truth.json"))
  }

  test("reference reconciliation with_files_abs succeeds") {
    assume(available, s"missing $rcRoot")
    Reconciliator.runAcon(spark, aconWithoutQueries("current.json", "truth.json"))
  }

  test("reference reconciliation failed_reconciliation_pct fails red with the exact results") {
    assume(available, s"missing $rcRoot")
    val acon = aconWithQueries("current_fail.json", "truth.json")
    val r = resultsOf(acon)
    assert(r("net_sales_absolute_diff_sum") == 100.0, r)
    assert(r("net_sales_percentage_diff_avg") == 0.0625, r)
    val ex = intercept[ReconciliationFailedException](Reconciliator.runAcon(spark, acon))
    assert(ex.getMessage == "The Reconciliation process has failed with status: red.")
  }

  test("reference reconciliation empty_truth fails with the empty-dataset message") {
    assume(available, s"missing $rcRoot")
    val ex = intercept[ReconciliationFailedException](
      Reconciliator.runAcon(spark, aconWithoutQueries("current.json", "truth_empty.json")))
    assert(ex.getMessage == "The reconciliation has failed because either the " +
      "truth dataset or the current results dataset was empty.")
  }

  test("reference reconciliation different_rows fails red with the exact results") {
    assume(available, s"missing $rcRoot")
    val acon = aconWithoutQueries("current_different_rows.json", "truth_different_rows.json")
    val r = resultsOf(acon)
    assert(r("net_sales_absolute_diff_sum") == 500.0, r)
    assert(r("net_sales_absolute_diff_avg") == 100.0, r)
    val ex = intercept[ReconciliationFailedException](Reconciliator.runAcon(spark, acon))
    assert(ex.getMessage == "The Reconciliation process has failed with status: red.")
  }

  test("reference reconciliation empty_df_true_check succeeds on empty inputs") {
    assume(available, s"missing $rcRoot")
    Reconciliator.runAcon(spark, aconWithQueries("current.json", "truth.json",
      ignoreEmpty = Some(true), emptyQueries = true))
  }

  test("reference reconciliation empty_df_false_check fails on empty inputs") {
    assume(available, s"missing $rcRoot")
    val ex = intercept[ReconciliationFailedException](
      Reconciliator.runAcon(spark, aconWithQueries("current.json", "truth.json",
        ignoreEmpty = Some(false), emptyQueries = true)))
    assert(ex.getMessage.contains("was empty"))
  }

  test("reference reconciliation nulls-and-zeros: pass / zero-threshold / null-is-not-zero") {
    assume(available, s"missing $rcRoot")
    // pass: 0s and nulls on both sides reconcile to zero diff
    val pass = aconWithoutQueries("current_nulls_and_zeros.json",
      "truth_nulls_and_zeros.json",
      metric("percentage", "sum", 0.05, 0.1), metric("percentage", "avg", 0.05, 0.1))
    val rPass = Reconciliator.runAcon(spark, pass)
    assert(rPass("net_sales_percentage_diff_sum") == 0.0, rPass)
    assert(rPass("net_sales_percentage_diff_avg") == 0.0, rPass)
    // zero thresholds always breach (0 <= diff)
    val zero = aconWithoutQueries("current_nulls_and_zeros_fail.json",
      "truth_nulls_and_zeros_fail.json",
      metric("percentage", "sum", 0, 0), metric("percentage", "avg", 0, 0))
    val rZero = resultsOf(zero)
    assert(rZero("net_sales_percentage_diff_sum") == 1.0, rZero)
    assert(math.abs(rZero("net_sales_percentage_diff_avg") - 1.0 / 3) < 1e-12, rZero)
    val ex = intercept[ReconciliationFailedException](Reconciliator.runAcon(spark, zero))
    assert(ex.getMessage.endsWith("status: red."))
    // null truth vs 0 current is a FULL difference (1), not a match
    val nn = aconWithoutQueries("current_nulls_and_zeros_fail.json",
      "truth_nulls_and_zeros_fail.json",
      metric("percentage", "sum", 0.05, 0.1), metric("percentage", "avg", 0.05, 0.1))
    val ex2 = intercept[ReconciliationFailedException](Reconciliator.runAcon(spark, nn))
    assert(ex2.getMessage.endsWith("status: red."))
  }
}
