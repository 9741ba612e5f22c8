package graft.spec

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The reference's optimizers feature scenarios executed VERBATIM
  * (`tests/feature/transformations/test_optimizers.py`): a
  * persist -> assert-cached -> unpersist -> assert-not-cached -> cache ->
  * assert-cached chain driven through the data loader, batch AND
  * streaming (forced foreachBatch). The reference passes its assertion
  * callables as `custom_transformation` transformers; the engine's
  * analogue is the named customFns registry. */
class ReferenceOptimizersSpec extends SparkSpec with ReferenceHarness {

  private val res = s"$refRoot/transformations/optimizers"

  private def isCached(df: DataFrame): DataFrame = {
    assert(df.storageLevel != StorageLevel.NONE, "expected the frame to be cached")
    df
  }
  private def isNotCached(df: DataFrame): DataFrame = {
    assert(df.storageLevel == StorageLevel.NONE, "expected the frame to be uncached")
    df
  }

  for (readType <- Seq("batch", "streaming"))
    test(s"reference optimizers $readType scenario runs verbatim") {
      assume(new java.io.File(res).isDirectory, s"missing $res")
      val tmp = tmpDir(s"ref-opt-$readType")
      val inDir = s"$tmp/in/feature/transformations/optimizers/data"
      copyIn(s"$res/data/source/part-01.csv", inDir)
      val forceFb =
        if (readType == "streaming")
          """"force_streaming_foreach_batch_processing": true,""" else ""
      val execEnv =
        if (readType == "streaming")
          ""","exec_env": {"spark.sql.streaming.schemaInference": true}""" else ""
      val acon =
        s"""{
           | "input_specs": [{
           |   "spec_id": "sales_source", "read_type": "$readType",
           |   "data_format": "csv",
           |   "options": {"header": true, "delimiter": "|", "inferSchema": true},
           |   "location": "file://$inDir/"
           | }],
           | "transform_specs": [{
           |   "spec_id": "transformed_sales_source", "input_id": "sales_source",
           |   $forceFb
           |   "transformers": [
           |     {"function": "persist", "args": {"storage_level": "MEMORY_AND_DISK"}},
           |     {"function": "custom_transformation", "args": {"function_name": "is_df_cached"}},
           |     {"function": "unpersist"},
           |     {"function": "custom_transformation", "args": {"function_name": "is_df_not_cached"}},
           |     {"function": "cache"},
           |     {"function": "custom_transformation", "args": {"function_name": "is_df_cached"}}
           |   ]
           | }],
           | "output_specs": [{
           |   "spec_id": "sales_bronze", "input_id": "transformed_sales_source",
           |   "data_format": "console"
           | }]$execEnv
           |}""".stripMargin
      graft.algo.DataLoader.loadData(spark, acon, customFns = Map(
        "is_df_cached" -> isCached, "is_df_not_cached" -> isNotCached))
    }
}
