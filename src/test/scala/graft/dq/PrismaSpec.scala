package graft.dq

import graft.SparkSpec
import graft.spec.DQSpec
import java.nio.file.Files

/** Focused PRISMA contract cases (reference `utils/dq_utils.py`,
  * `dq_processors/dq_factory.py:359-371`). */
class PrismaSpec extends SparkSpec {

  import spark.implicits._

  test("dqBucket is strict per environment: dev never falls back to the prod bucket") {
    // non-prod + only the prod bucket configured → None (the reference
    // selects strictly dq_dev_bucket outside prod, utils/dq_utils.py:199-203)
    withConf("spark.graft.dqBucket" -> "s3://prod-bucket") {
      assert(Prisma.dqBucket(spark).isEmpty)
    }
    withConf("spark.graft.environment" -> "prod",
        "spark.graft.dqBucket" -> "s3://prod-bucket") {
      assert(Prisma.dqBucket(spark).contains("s3://prod-bucket"))
    }
    // prod never reads the dev bucket either
    withConf("spark.graft.environment" -> "prod",
        "spark.graft.dqDevBucket" -> "s3://dev-bucket") {
      assert(Prisma.dqBucket(spark).isEmpty)
    }
    withConf("spark.graft.dqDevBucket" -> "s3://dev-bucket") {
      assert(Prisma.dqBucket(spark).contains("s3://dev-bucket"))
    }
  }

  test("processed keys write only for the prisma dq type") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val base = Files.createTempDirectory("prisma-keys").toString
    // a validator spec carrying processed_keys_location gets NO append
    // (dq_factory.py:362 guards on DQType.PRISMA)
    Prisma.writeProcessedKeys(spark,
      DQSpec("s", "in", dqType = "validator", unexpectedRowsPk = Seq("id"),
        processedKeysLocation = Some(s"$base/validator")), df, "run-1")
    assert(!new java.io.File(s"$base/validator").exists())
    Prisma.writeProcessedKeys(spark,
      DQSpec("s", "in", dqType = "prisma", unexpectedRowsPk = Seq("id"),
        processedKeysLocation = Some(s"$base/prisma")), df, "run-1")
    val keys = spark.read.parquet(s"$base/prisma")
    assert(keys.columns.toSeq == Seq("id", "run_name"))
    assert(keys.select("id").as[String].collect().sorted.toSeq == Seq("1", "2"))
    assert(keys.select("run_name").distinct().as[String].collect().toSeq == Seq("run-1"))
  }
}
