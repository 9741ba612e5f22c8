package graft.io

import graft.SparkSpec
import graft.spec.{InputSpec, OutputSpec}

/** End-to-end JDBC reader/writer coverage against embedded Derby (the
  * JDBC engine that ships with Spark's jars). */
class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dbUrl = {
    val dir = tmpDir("derby")
    s"jdbc:derby:$dir/testdb;create=true"
  }
  private def baseOpts = Map(
    "url" -> dbUrl,
    "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("jdbc write then read round trip through the factories") {
    val df = Seq((1, "a", 10.5), (2, "b", 20.5), (3, "c", 30.5))
      .toDF("id", "name", "amount")
    Writers.writeBatch(spark, OutputSpec(
      specId = "out", writeType = "overwrite", dataFormat = Some("jdbc"),
      options = baseOpts + ("dbtable" -> "people")), df)
    val back = Readers.read(spark, InputSpec(
      specId = "in", dataFormat = Some("jdbc"),
      options = baseOpts + ("dbtable" -> "people")))
    assertSameRows(back, df)
  }

  test("jdbc predicate-parallel extraction: one partition per distinct value") {
    val df = (1 to 50).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    // Derby maps StringType to CLOB (no DISTINCT support) unless told otherwise
    Writers.writeBatch(spark, OutputSpec(
      specId = "out", writeType = "overwrite", dataFormat = Some("jdbc"),
      options = baseOpts + ("dbtable" -> "grouped",
        "createTableColumnTypes" -> "grp VARCHAR(10)")), df)
    val parallel = JdbcExtraction.read(spark,
      baseOpts + ("dbtable" -> "grouped", "generate_predicates_col" -> "grp"))
    assert(parallel.count() == 50)
    // one predicate per distinct grp value + IS NULL
    assert(parallel.rdd.getNumPartitions == 4)
  }

  test("jdbc auto upper-bound derivation feeds range partitioning") {
    val df = (1 to 40).map(i => (i, s"v$i")).toDF("id", "v")
    Writers.writeBatch(spark, OutputSpec(
      specId = "out", writeType = "overwrite", dataFormat = Some("jdbc"),
      options = baseOpts + ("dbtable" -> "ranged")), df)
    val ranged = JdbcExtraction.read(spark, baseOpts ++ Map(
      "dbtable" -> "ranged",
      "partitionColumn" -> "id",
      "lowerBound" -> "1",
      "numPartitions" -> "4",
      "calculate_upper_bound" -> "true"))
    assert(ranged.count() == 40)
    assert(ranged.rdd.getNumPartitions == 4)
  }
}
