package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(-1.0f, -2.0f, -3.0f)),
    (3L, Array(3.0f, -1.0f, 0.0f)))
    .toDF("id", "v")

  test("native expression matches the UDF kernel bit-for-bit") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        SimilarityFunctions.cosine(col("a.v"), col("b.v")).as("native"),
        Kernels.cosine(col("a.v"), col("b.v")).as("kernel"))
    assert(pairs.where("native != kernel").count() == 0)
    assert(pairs.where("abs(native) > 1.0001").count() == 0)
  }

  test("expression is registered as a SQL function via session extensions") {
    vecs.createOrReplaceTempView("cos_vecs")
    val self = spark.sql(
      "SELECT cosine_sim(v, v) AS s FROM cos_vecs").as[Double].collect()
    assert(self.forall(s => math.abs(s - 1.0) < 1e-12))
    val opposite = spark.sql(
      """SELECT cosine_sim(a.v, b.v) AS s
        |FROM cos_vecs a JOIN cos_vecs b ON a.id = 0 AND b.id = 2""".stripMargin)
      .as[Double].collect().head
    assert(math.abs(opposite + 1.0) < 1e-12)
  }

  test("null inputs yield null; codegen path executes") {
    val withNull = Seq((0L, Array(1.0f, 0.0f)), (1L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val out = withNull.select(
      SimilarityFunctions.cosine(col("v"), col("v")).as("s"))
    assert(out.where("s IS NULL").count() == 1)
    // whole-stage codegen over a real scan (a local relation would be
    // constant-folded away before reaching the physical plan)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val scored = emb.select(
      SimilarityFunctions.cosine(col("embedding"), col("embedding")).as("s"))
    assert(scored.where("abs(s - 1.0) > 1e-9").count() == 0)
    val plan = scored.queryExecution.executedPlan.toString()
    // "*(n)" marks a WholeStageCodegen stage in the plan string
    assert(plan.contains("*(1) Project"), s"expected codegen:\n$plan")
    assert(plan.contains("cosine_sim"), s"expected the native expression:\n$plan")
  }
}
