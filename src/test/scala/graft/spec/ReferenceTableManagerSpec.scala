package graft.spec

import graft.SparkSpec

/** The reference's table_manager feature scenarios executed VERBATIM
  * (`tests/feature/test_table_manager.py`): the manage_table ACON
  * sequence over each scenario — create table from its SQL file,
  * execute_sql inserts, create view, describe, show properties,
  * get_tbl_pk, delete_where, drop view/table — with the reference's own
  * JSON configs rebased. `USING DELTA` in the DDL maps to the session's
  * default source (no Delta jars); vacuum/optimize run through the
  * fallback implementations. */
class ReferenceTableManagerSpec extends SparkSpec with ReferenceHarness {

  private val tmRoot = s"$refRoot/table_manager"
  private def available = new java.io.File(tmRoot).isDirectory

  private def manage(tmp: String, rel: String): Seq[String] = {
    // `USING DELTA` needs the delta source jar; the fallback stores
    // parquet with the same DDL shape, like the engine's writers
    val json = rebase(s"$tmRoot/$rel", tmp).replace("USING DELTA", "USING PARQUET")
    graft.Engine.manageTable(spark, json)
  }

  private def stageSql(tmp: String, kind: String, name: String): Unit = {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmRoot/create/$kind/$name"))
    val dest = java.nio.file.Paths.get(
      s"$tmp/in/feature/table_manager/create/$kind/$name")
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.writeString(dest,
      src.replace("file:///app/tests/lakehouse", s"file://$tmp")
        .replace("/app/tests/lakehouse", tmp)
        .replace("USING DELTA", "USING PARQUET"))
  }

  test("reference table_manager simple_split_scenario full op sequence runs verbatim") {
    assume(available, s"missing $tmRoot")
    ensureTestDb()
    spark.sql("DROP TABLE IF EXISTS test_db.DummyTableBronzeSimpleSplitScenario")
    spark.sql("DROP VIEW IF EXISTS test_db.DummyVwBronzeSimpleSplitScenario")
    val tmp = tmpDir("ref-tm-simple")
    stageSql(tmp, "table", "test_table_simple_split_scenario.sql")
    stageSql(tmp, "view", "test_view_simple_split_scenario.sql")

    manage(tmp, "create/acon_create_table_simple_split_scenario.json")
    assert(spark.catalog.tableExists("test_db.DummyTableBronzeSimpleSplitScenario"))
    manage(tmp, "execute_sql/acon_execute_sql_simple_split_scenario.json")
    // the executed SQL comments col1; DESCRIBE must surface it
    val described = spark.sql(
      "DESCRIBE TABLE test_db.DummyTableBronzeSimpleSplitScenario")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(described.get("col1").contains("comment for col1"), described)
    manage(tmp, "create/acon_create_view_simple_split_scenario.json")
    manage(tmp, "describe/acon_describe_simple_split_scenario.json")
    manage(tmp, "vacuum/acon_vacuum_table_simple_split_scenario.json")
    manage(tmp, "vacuum/acon_vacuum_location_simple_split_scenario.json")
    manage(tmp, "show_tbl_properties/show_tbl_properties_simple_split_scenario.json")
    // the reference asserts the pk parses to ['id', 'col1'] from the
    // lakehouse.primary_key property (backticks + spaces stripped)
    assert(graft.dq.Prisma.derivePk(spark,
      "test_db.DummyTableBronzeSimpleSplitScenario") == Seq("id", "col1"))
    manage(tmp, "delete/acon_delete_where_table_simple_split_scenario.json")
    manage(tmp, "drop/acon_drop_view_simple_split_scenario.json")
    manage(tmp, "drop/acon_drop_table_simple_split_scenario.json")
    assert(!spark.catalog.tableExists("test_db.DummyTableBronzeSimpleSplitScenario"))
  }

  for (scenario <- Seq("complex_default_scenario", "complex_different_delimiter_scenario"))
    test(s"reference table_manager $scenario create+sql+view sequence runs verbatim") {
      assume(available, s"missing $tmRoot")
      ensureTestDb()
      val names = Seq(s"${scenario}1", s"${scenario}2").map(n =>
        "DummyTableBronze" + n.split("_").map(_.capitalize).mkString)
      names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS test_db.$n"))
      val tmp = tmpDir(s"ref-tm-$scenario")
      stageSql(tmp, "table", s"test_table_$scenario.sql")
      stageSql(tmp, "view", s"test_view_$scenario.sql")
      manage(tmp, s"create/acon_create_table_$scenario.json")
      names.foreach(n => assert(spark.catalog.tableExists(s"test_db.$n"),
        s"missing test_db.$n"))
      manage(tmp, s"execute_sql/acon_execute_sql_$scenario.json")
      manage(tmp, s"create/acon_create_view_$scenario.json")
      // no cleanup: the reference's scenarios share one session and the
      // different-delimiter execute_sql targets the default scenario's
      // tables (its own quirk, preserved verbatim)
    }
}
