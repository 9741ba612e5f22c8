package graft.spec

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's published TPCH tutorial executed verbatim
  * (`samples/tpch_load_and_analysis_tutorial.py`): the exact two ACONs —
  * load (delta reads, add_current_date, "left outer" join with
  * select_cols aliases, the `is_a_super_vip` custom transformation,
  * overwrite to an external table) and analysis (sql read of the created
  * table, a 3-expectation validator DQ spec, dataframe output, the two
  * dashboard SQLs over a temp view) — against the driver's TPC-H
  * testdata, whose orders/customer schemas match the tutorial's. */
class ReferenceTutorialSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val available = new java.io.File(s"$sfDir/orders.parquet").exists()

  test("tpch tutorial: load acon (join + custom super-vip transformation)") {
    assume(available, s"missing $sfDir")
    spark.sql("CREATE DATABASE IF NOT EXISTS test_db")
    spark.sql("DROP TABLE IF EXISTS test_db.tpch_orders")
    val out = tmpDir("tut-tpch") + "/tpch_orders"
    // the tutorial's Databricks-dataset delta paths rebased onto the
    // driver's parquet testdata; everything else is the sample's acon
    val acon = s"""{
      |  "input_specs": [
      |    {"spec_id": "tpch_orders", "read_type": "batch",
      |     "data_format": "parquet", "location": "$sfDir/orders.parquet"},
      |    {"spec_id": "tpch_customer", "read_type": "batch",
      |     "data_format": "parquet", "location": "$sfDir/customer.parquet"}
      |  ],
      |  "transform_specs": [{
      |    "spec_id": "tpch_orders_transformed", "input_id": "tpch_orders",
      |    "transformers": [
      |      {"function": "add_current_date", "args": {"output_col": "lak_load_date"}},
      |      {"function": "join", "args": {
      |        "join_with": "tpch_customer",
      |        "join_type": "left outer",
      |        "join_condition": "a.o_custkey = b.c_custkey",
      |        "select_cols": ["a.*", "b.c_name as customer_name"]}},
      |      {"function": "custom_transformation",
      |       "args": {"custom_transformer": "is_a_super_vip"}}
      |    ]
      |  }],
      |  "output_specs": [{
      |    "spec_id": "tpch_orders_output", "input_id": "tpch_orders_transformed",
      |    "write_type": "overwrite", "db_table": "test_db.tpch_orders",
      |    "location": "$out", "data_format": "delta"
      |  }]
      |}""".stripMargin
    graft.algo.DataLoader.loadData(spark, acon, customFns = Map(
      "is_a_super_vip" -> { df =>
        val p90 = df.stat.approxQuantile("o_totalprice", Array(0.9), 0.0)(0)
        df.withColumn("is_a_super_vip",
          col("o_totalprice") >= p90 && col("o_orderpriority") === "1-URGENT")
      }))
    val result = spark.table("test_db.tpch_orders")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // left join keeps every order; every custkey resolves a name
    assert(result.count() == orders.count())
    assert(result.where(col("customer_name").isNull).count() == 0)
    assert(result.columns.contains("lak_load_date"))
    // super-vip contract: top-decile total price AND urgent priority
    val p90 = orders.stat.approxQuantile("o_totalprice", Array(0.9), 0.0)(0)
    val expected = orders.where(
      col("o_totalprice") >= p90 && col("o_orderpriority") === "1-URGENT").count()
    assert(result.where(col("is_a_super_vip")).count() == expected)
    assert(expected > 0, "fixture should contain super vips")
  }

  test("tpch tutorial: analysis acon (sql read + validator DQ + dashboard SQLs)") {
    assume(available, s"missing $sfDir")
    assume(spark.catalog.tableExists("test_db.tpch_orders"),
      "load acon runs first")
    val dqRoot = tmpDir("tut-tpch-dq")
    val acon = s"""{
      |  "input_specs": [{
      |    "spec_id": "tpch_orders", "read_type": "batch", "data_format": "sql",
      |    "query": "SELECT o_orderkey, customer_name, o_totalprice, is_a_super_vip FROM test_db.tpch_orders"
      |  }],
      |  "dq_specs": [{
      |    "spec_id": "tpch_orders_dq", "input_id": "tpch_orders",
      |    "dq_type": "validator", "store_backend": "file_system",
      |    "local_fs_root_dir": "$dqRoot",
      |    "dq_functions": [
      |      {"function": "expect_column_values_to_not_be_null", "args": {"column": "o_orderkey"}},
      |      {"function": "expect_column_values_to_not_be_null", "args": {"column": "customer_name"}},
      |      {"function": "expect_column_values_to_not_be_null", "args": {"column": "o_totalprice"}}
      |    ]
      |  }],
      |  "output_specs": [{
      |    "spec_id": "validated_tpch_orders", "input_id": "tpch_orders_dq",
      |    "data_format": "dataframe"
      |  }]
      |}""".stripMargin
    val dfs = graft.algo.DataLoader.loadData(spark, acon)
    val validated = dfs("validated_tpch_orders")
    validated.createOrReplaceTempView("tpch_order_analysis")
    // dashboard SQL 1: grouped analysis over the validated frame
    val analysis = spark.sql(
      """SELECT customer_name, o_totalprice, is_a_super_vip
        |FROM tpch_order_analysis
        |GROUP BY customer_name, o_totalprice, is_a_super_vip
        |ORDER BY o_totalprice desc""".stripMargin)
    assert(analysis.count() > 0)
    // dashboard SQL 2: top-10 super vips, descending by total price
    val top = spark.sql(
      """SELECT customer_name, o_totalprice
        |FROM tpch_order_analysis
        |WHERE is_a_super_vip is True
        |GROUP BY customer_name, o_totalprice
        |ORDER BY o_totalprice desc
        |LIMIT 10""".stripMargin).collect()
    assert(top.nonEmpty && top.length <= 10)
    val prices = top.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
