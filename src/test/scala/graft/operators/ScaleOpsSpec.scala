package graft.operators

import graft.SparkSpec
import graft.dq.DQEngine
import graft.spec.{DQFunctionSpec, DQSpec}

class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals plain join") {
    val left = (1 to 100).map(i => (i % 3, i)).toDF("k", "v") // skewed: 3 keys
    val right = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val salted = ScaleOps.saltedJoin(left, right, Seq("k"), salts = 8)
    val plain = left.join(right, Seq("k"))
    assertSameRows(salted.select("k", "v", "name"), plain.select("k", "v", "name"))
  }

  test("bandJoin equals the naive theta join, exactly once per pair") {
    import org.apache.spark.sql.functions._
    // keys straddle bucket boundaries (radius 10: buckets [0,10),[10,20)...)
    val left = Seq((1L, "u", 9L), (2L, "u", 11L), (3L, "u", 35L), (4L, "v", 10L))
      .toDF("id_a", "grp", "ka")
    val right = Seq((10L, "u", 19L), (11L, "u", 21L), (12L, "u", 36L), (13L, "v", 20L))
      .toDF("id_b", "grp", "kb")
    val banded = RangeJoin.bandJoin(left, col("ka"), right, col("kb"),
      Seq("grp"), radius = 10L)
      .select("grp", "id_a", "id_b")
    val naive = left.join(right, Seq("grp"))
      .where(abs(col("ka") - col("kb")) <= 10)
      .select("grp", "id_a", "id_b")
    assertSameRows(banded, naive)
    // exactly-once: no pair appears twice despite the x3 bucket explode
    assert(banded.count() == banded.distinct().count())
    // boundary |diff| == radius is IN (1,10: 9 vs 19); cross-group never
    // pairs (4,10 differ by 9 but grp u vs v)
    val pairs = banded.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains(("u", 1L, 10L)))
    assert(!pairs.exists { case (_, a, b) => a == 4L && b != 13L })
    // the plan is an equi-join: no nested-loop/cartesian node
    val plan = banded.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "bv")
    ScaleOps.writeBucketed(a, "graft_bucket_a", Seq("id"), 4)
    ScaleOps.writeBucketed(b, "graft_bucket_b", Seq("id"), 4)
    try {
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("id"))
      joined.count() // materialize so AQE finalizes the plan
      assert(ScaleOps.countShuffles(joined) == 0,
        s"expected shuffle-free bucketed join:\n${joined.queryExecution.executedPlan}")
      // and the same join on raw dataframes DOES shuffle (force a
      // sort-merge plan: the tiny test inputs would otherwise broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val unbucketed = a.join(b, Seq("id"))
        unbucketed.count()
        assert(ScaleOps.countShuffles(unbucketed) > 0)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("prisma rules load from a table with unique-id validation") {
    val rules = Seq(
      ("r1", """expect_column_values_to_not_be_null({"column": "name"})""", "in_motion"),
      ("r2", """expect_table_row_count_to_be_between({"min_value": 1})""", "in_motion"),
      ("r3", """expect_column_values_to_not_be_null({"column": "other"})""", "at_rest"))
      .toDF("dq_rule_id", "dq_tech_function", "execution_point")
    val fns = DQEngine.rulesFromTable(spark, rules, executionPoint = Some("in_motion"))
    assert(fns.map(_.function) ==
      Seq("expect_column_values_to_not_be_null", "expect_table_row_count_to_be_between"))
    assert(fns.head.args("column") == "name")

    val dup = rules.union(rules)
    intercept[IllegalArgumentException] {
      DQEngine.rulesFromTable(spark, dup)
    }

    // end-to-end: prisma rules drive a run
    val data = Seq((1, "x"), (2, "y")).toDF("id", "name")
    val result = DQEngine.run(spark, data,
      DQSpec("p", "p", dqFunctions = fns, failOnError = true))
    assert(result.success)
  }

  test("sketches stay within their error bounds vs exact answers") {
    import graft.functions.Sketches
    // zipf-ish: value v appears 5000/v times
    val rows = (1L to 50L).flatMap(v => Seq.fill((5000 / v).toInt)(v))
    val df = rows.toDF("v")
    // count-min: one-sided (estimate >= truth), small overestimate
    val est = Sketches.heavyHitterCounts(df, "v", Seq(1L, 2L, 10L), eps = 0.001)
    est.foreach { case (v, e) =>
      val truth = 5000 / v
      assert(e >= truth && e <= truth + (0.001 * rows.size).toLong + 50,
        s"cms estimate for $v: $e vs $truth")
    }
    // hll: within 3 * rsd relative error
    val d = Sketches.approxDistinct(df, "v", rsd = 0.05)
    assert(math.abs(d - 50.0) / 50.0 <= 0.15, s"hll: $d vs 50")
    // gk quantiles: rank error <= relativeError * n
    val Seq(p50) = Sketches.approxQuantiles(df, "v", Seq(0.5), relativeError = 0.01)
    val sorted = rows.sorted
    val rankOfEst = sorted.count(_ <= p50).toDouble / rows.size
    assert(math.abs(rankOfEst - 0.5) <= 0.02 + 1.0 / rows.size,
      s"gk p50=$p50 sits at rank $rankOfEst")
  }

  test("bloom-prefiltered semi-join equals the plain semi-join") {
    val big = (0L until 5000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = (0L until 5000L by 37).map(i => Tuple1(i)).toDF("sk")
    val bloom = ScaleOps.bloomSemiJoin(big, small, "k", "sk", expectedItems = 200)
    val plain = big.join(small.withColumnRenamed("sk", "k"), Seq("k"), "left_semi")
    assertSameRows(bloom, plain)
    // the prefilter really prunes: far fewer rows pass the bloom stage
    // than the big side holds (fpp 1% of 5000 non-matching ~ 50)
    import org.apache.spark.sql.functions.col
    val bf = small.stat.bloomFilter("sk", 200, 0.01)
    val passed = big.collect().count(r => bf.mightContainLong(r.getLong(0)))
    assert(passed < 500, s"bloom passed $passed of 5000")
  }
}
