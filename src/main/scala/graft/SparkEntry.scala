package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in [[graft.queries.QueryCatalog]]; each
  * entry is one SURVEY §2 operator family (or LLM-pipeline parity-plus op)
  * with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs through the declarative engine end-to-end: ACON JSON -> reader
    * factory -> transformer chain -> DQ gate -> DataFrame sink. */
  def entry(spark: SparkSession): DataFrame = {
    val acon =
      """{
        |  "input_specs": [{
        |    "spec_id": "lineitem", "read_type": "batch", "data_format": "parquet",
        |    "location": "/root/testdata/sf0.001/lineitem.parquet"
        |  }],
        |  "transform_specs": [{
        |    "spec_id": "pricing_summary", "input_id": "lineitem",
        |    "transformers": [
        |      {"function": "expression_filter", "args": {"exp": "l_shipdate <= '2002-09-02'"}},
        |      {"function": "temp_view", "args": {"name": "pricing_input"}},
        |      {"function": "sql_transformation", "args": {"sql": "
        |        SELECT l_returnflag, l_linestatus,
        |               round(sum(l_quantity), 2) AS sum_qty,
        |               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |               count(*) AS count_order
        |        FROM pricing_input GROUP BY l_returnflag, l_linestatus
        |        ORDER BY l_returnflag, l_linestatus"}}
        |    ]
        |  }],
        |  "dq_specs": [{
        |    "spec_id": "dq_pricing", "input_id": "pricing_summary",
        |    "dq_functions": [
        |      {"function": "expect_column_values_to_not_be_null", "args": {"column": "l_returnflag"}},
        |      {"function": "expect_table_row_count_to_be_between", "args": {"min_value": 1}}
        |    ]
        |  }],
        |  "output_specs": [{
        |    "spec_id": "result", "input_id": "pricing_summary", "data_format": "dataframe"
        |  }]
        |}""".stripMargin.replace("\n", " ")
    graft.algo.DataLoader.loadData(spark, acon)("pricing_summary")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
