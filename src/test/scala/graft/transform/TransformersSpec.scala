package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Per-transformer unit tests (reference `tests/feature/transformations/`). */
class TransformersSpec extends SparkSpec {

  import spark.implicits._

  private def sales: DataFrame =
    Seq((1, "a", 10.0, "20211201"), (2, "b", -3.0, "20211205"), (3, "c", 7.5, "20211209"))
      .toDF("id", "name", "amount", "date")

  private def run(df: DataFrame, fn: String, args: Map[String, Any],
      ctx: TransformContext = TransformContext(spark)): DataFrame =
    df.transform(Transformers.resolve(fn, args, ctx))

  test("column_selector selects and renames in order") {
    val out = run(sales, "column_selector",
      Map("cols" -> Map("id" -> "order_id", "amount" -> "value")))
    assert(out.columns.toSeq == Seq("order_id", "value"))
  }

  test("expression_filter / column_filter_exp") {
    assert(run(sales, "expression_filter", Map("exp" -> "amount > 0")).count() == 2)
    val proj = run(sales, "column_filter_exp", Map("exp" -> Seq("id", "amount * 2 AS dbl")))
    assert(proj.columns.toSeq == Seq("id", "dbl"))
  }

  test("incremental_filter with literal and derived increment") {
    assert(run(sales, "incremental_filter",
      Map("input_col" -> "id", "increment_value" -> 1)).count() == 2)
    val maxDf = Seq(Tuple1(2)).toDF("latest")
    val ctx = TransformContext(spark, data = { case "inc" => maxDf })
    assert(run(sales, "incremental_filter",
      Map("input_col" -> "id", "increment_df" -> "inc", "increment_col" -> "latest"),
      ctx).count() == 1)
  }

  test("cast / rename / with_expressions / with_literals") {
    val out = run(run(run(run(sales,
      "cast", Map("cols" -> Map("amount" -> "int"))),
      "rename", Map("cols" -> Map("name" -> "label"))),
      "with_expressions", Map("cols" -> Map("double_amount" -> "amount * 2"))),
      "with_literals", Map("literals" -> Map("src" -> "test")))
    assert(out.schema("amount").dataType.typeName == "integer")
    assert(out.columns.contains("label") && out.columns.contains("double_amount"))
    assert(out.select("src").distinct().as[String].collect().toSeq == Seq("test"))
  }

  test("drop_duplicate_rows") {
    val dup = sales.union(sales)
    assert(run(dup, "drop_duplicate_rows", Map.empty).count() == 3)
    assert(run(dup, "drop_duplicate_rows", Map("cols" -> Seq("id"))).count() == 3)
  }

  test("with_row_id / with_auto_increment_id") {
    val out = run(sales, "with_auto_increment_id", Map.empty)
    assert(out.select("lhe_row_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    assert(run(sales, "with_row_id", Map.empty)
      .select("lhe_row_id").distinct().count() == 3)
  }

  test("with_auto_increment_id is distributed and dense on a multi-partition input") {
    // zipWithIndex shape (r8 hardening): ids must stay consecutive
    // 0-based over many partitions, keep each row's columns intact, and
    // the plan must NOT funnel everything through a single-partition
    // window
    val wide = spark.range(0, 10000).repartition(16)
      .selectExpr("id AS k", "concat('v', id) AS s")
    val out = run(wide, "with_auto_increment_id", Map("output_col" -> "seq"))
    assert(out.rdd.getNumPartitions == 16)
    val rows = out.select("seq", "k", "s").as[(Long, Long, String)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until 10000L))
    // ids are assigned in partition order, but every row keeps its own
    // payload regardless of which id it got
    assert(rows.forall { case (_, k, s) => s == s"v$k" })
  }

  test("explode_columns and flatten_schema") {
    val nested = Seq((1, Seq("x", "y"))).toDF("id", "tags")
    assert(run(nested, "explode_columns", Map("explode_arrays" -> true)).count() == 2)
    val struct = spark.sql("SELECT 1 AS id, named_struct('a', 2, 'b', named_struct('c', 3)) AS s")
    val flat = run(struct, "flatten_schema", Map.empty)
    assert(flat.columns.toSeq == Seq("id", "s_a", "s_b_c"))
  }

  test("from_json / to_json round trip") {
    val js = Seq((1, """{"k": 5, "v": "x"}""")).toDF("id", "payload")
    val parsed = run(js, "from_json",
      Map("input_col" -> "payload", "output_col" -> "parsed", "schema" -> "k INT, v STRING"))
    assert(parsed.select("parsed.k").as[Int].collect().head == 5)
    val back = run(parsed.select("id", "parsed.k", "parsed.v"), "to_json",
      Map("in_cols" -> Seq("k", "v"), "out_col" -> "payload"))
    assert(back.select("payload").as[String].collect().head == """{"k":5,"v":"x"}""")
  }

  test("hash_masker / column_dropper / replace_nulls / with_regex_value") {
    val masked = run(sales, "hash_masker", Map("cols" -> Seq("name")))
    assert(masked.columns.contains("name_hash"))
    assert(run(sales, "column_dropper", Map("cols" -> Seq("date"))).columns.length == 3)
    val withNull = Seq((1, null.asInstanceOf[String])).toDF("id", "name")
    assert(run(withNull, "replace_nulls", Map("replace_on_strings_value" -> "missing"))
      .where("name = 'missing'").count() == 1)
    val rx = run(sales, "with_regex_value",
      Map("input_col" -> "date", "regex" -> "^(\\d{4})", "output_col" -> "yr"))
    assert(rx.select("yr").as[String].collect().toSet == Set("2021"))
  }

  test("date transformers") {
    val out = run(run(sales,
      "convert_to_date", Map("cols" -> Seq("date"), "source_format" -> "yyyyMMdd")),
      "get_date_hierarchy", Map("cols" -> Seq("date")))
    assert(out.where("date_year = 2021 AND date_month = 12").count() == 3)
    val fmt = run(run(sales,
      "convert_to_date", Map("cols" -> Seq("date"), "source_format" -> "yyyyMMdd")),
      "format_date", Map("cols" -> Seq("date"), "target_format" -> "yyyy/MM"))
    assert(fmt.select("date").as[String].collect().toSet == Set("2021/12"))
  }

  test("join with broadcast and select_cols") {
    val dims = Seq((1, "gold"), (2, "silver")).toDF("cid", "tier")
    val ctx = TransformContext(spark, data = { case "dims" => dims })
    val out = run(sales, "join", Map(
      "join_with" -> "dims",
      "join_condition" -> "a.id = b.cid",
      "join_type" -> "left",
      "broadcast_join" -> true,
      "select_cols" -> Seq("a.id", "b.tier")), ctx)
    assert(out.columns.toSeq == Seq("id", "tier"))
    assert(out.where("tier IS NULL").count() == 1)
  }

  test("union / union_by_name / except / intersect") {
    val other = Seq((9, "z", 1.0, "20220101")).toDF("id", "name", "amount", "date")
    val ctx = TransformContext(spark, data = { case "o" => other })
    assert(run(sales, "union", Map("union_with" -> Seq("o")), ctx).count() == 4)
    val reordered = other.select("date", "name", "id", "amount")
    val ctx2 = TransformContext(spark, data = { case "o" => reordered })
    assert(run(sales, "union_by_name", Map("union_with" -> Seq("o")), ctx2).count() == 4)
    assert(run(sales, "except", Map("except_with" -> "o"), ctx).count() == 3)
    assert(run(sales, "intersect", Map("intersect_with" -> "o"), ctx).count() == 0)
  }

  test("get_max_value / group_and_rank / condense_record_mode_cdc") {
    assert(run(sales, "get_max_value", Map("input_col" -> "id"))
      .as[Int].collect().head == 3)
    val cdc = Seq(
      (1, "2021-01-01", "N", 10), (1, "2021-01-02", "U", 20),
      (2, "2021-01-01", "N", 5), (2, "2021-01-03", "D", 0))
      .toDF("key", "ts", "mode", "amount")
    val condensed = run(cdc, "condense_record_mode_cdc", Map(
      "business_key" -> Seq("key"), "ranking_key_desc" -> Seq("ts"),
      "record_mode_col" -> "mode", "valid_record_modes" -> Seq("N", "U")))
    assert(condensed.count() == 1) // key 1 latest=U kept; key 2 latest=D dropped
    assert(condensed.where("key = 1 AND amount = 20").count() == 1)
    val ranked = run(cdc, "group_and_rank",
      Map("group_key" -> Seq("key"), "ranking_key" -> Seq("ts")))
    assert(ranked.count() == 2)
  }

  test("repartition / coalesce / cache") {
    assert(run(sales, "repartition", Map("num_partitions" -> 2)).rdd.getNumPartitions == 2)
    assert(run(sales, "coalesce", Map("num_partitions" -> 1)).rdd.getNumPartitions == 1)
    val cached = run(sales, "cache", Map.empty)
    assert(cached.storageLevel.useMemory)
    cached.unpersist()
  }

  test("sql_transformation reads temp views") {
    sales.createOrReplaceTempView("sales_tv")
    val out = run(sales, "sql_transformation",
      Map("sql" -> "SELECT count(*) AS n FROM sales_tv"),
      TransformContext(spark))
    assert(out.as[Long].collect().head == 3)
  }

  test("curation transformers: minhash_dedup / perplexity_filter / importance_filter / hash_sample") {
    val rep = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "en", rep),                          // near-dup of 2, lowest id
      (2L, "en", rep.replace("w3 ", "w99 ")),   // near-dup of 1
      (3L, "en", "common common common words"), // low-perplexity tokens
      (4L, "de", "xq zk vj qp wm yt"))          // rare-token soup
      .toDF("doc_id", "lang", "text")

    val deduped = run(docs, "minhash_dedup",
      Map("id_col" -> "doc_id", "text_col" -> "text", "threshold" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(deduped == Set(1L, 3L, 4L)) // clique keeps canonical min id

    val calm = run(docs, "perplexity_filter",
      Map("id_col" -> "doc_id", "text_col" -> "text", "max_nll" -> 3.5))
      .select("doc_id").as[Long].collect().toSet
    assert(calm.contains(3L) && !calm.contains(4L)) // soup scores high

    val en = run(docs, "importance_filter",
      Map("id_col" -> "doc_id", "text_col" -> "text",
        "target_exp" -> "lang = 'en'", "min_log_weight" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(en.contains(4L) == false) // de-only tokens weigh negative
    assert(en.nonEmpty)

    val sampled = run(docs, "hash_sample",
      Map("key_col" -> "doc_id", "fraction" -> 1.0))
    assert(sampled.count() == 4) // fraction 1 keeps everything
    assert(run(docs, "hash_sample",
      Map("key_col" -> "doc_id", "fraction" -> 0.0)).count() == 0)
  }

  test("unknown transformer raises") {
    intercept[IllegalArgumentException] {
      Transformers.resolve("no_such_op", Map.empty, TransformContext(spark))
    }
  }
}
