package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and layout-aware join helpers for cluster-scale execution.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.exec.ExecEnv]]) handles most skew at runtime; these
  * operators cover the two cases AQE cannot:
  *   - a *known* heavily-skewed key distribution where pre-salting beats
  *     runtime splitting (saltedJoin), and
  *   - co-locating repeated large-large joins via bucketed tables
  *     (writeBucketed), which removes the shuffle entirely on reuse.
  */
object ScaleOps {

  /** Salted equi-join for skewed left keys: the left (large, skewed) side
    * gets a random salt in [0, salts), the right side is exploded to all
    * salt values, and the join key becomes (key, salt) — splitting each
    * hot key across `salts` reducers. Right-side duplication costs
    * |right| * salts rows, so use for dimension-ish right sides.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Semi-join with a Bloom-filter pre-filter: build a sketch of the
    * small side's keys, prune the big side map-side BEFORE its shuffle,
    * then run the exact semi-join on the survivors. At 100 TB the win is
    * that non-matching big-side rows (usually the vast majority) never
    * enter the exchange — only bloom false positives (rate `fpp`) pay the
    * shuffle, and the exact join removes them, so results are identical
    * to a plain semi-join. Key must be integral (the sketch hashes longs).
    */
  def bloomSemiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.where(mightContain(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Write a DataFrame as a bucketed+sorted table: subsequent equi-joins
    * or aggregations on the bucket keys read shuffle-free. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      format: String = "parquet",
      mode: String = "overwrite"): Unit =
    df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Count the shuffle exchanges in a DataFrame's physical plan — the
    * metric bucketing is meant to drive to zero. Unwraps AQE's adaptive
    * plan and query stages, which hide the finalized tree from a plain
    * TreeNode traversal. */
  def countShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case s: ShuffleExchangeLike => 1 + s.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
