package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics over corpora too large for exact
  * answers: heavy hitters (Count-Min), distinct counts (HyperLogLog++),
  * quantiles (Greenwald-Khanna). All three compose Spark's built-in
  * mergeable sketches — each is a single pass with map-side partial
  * merge, the only shapes that work at 100 TB.
  */
object Sketches {

  /** Heavy hitters via Count-Min: estimated frequency of each candidate
    * value. The sketch is built distributed (mergeable per partition,
    * `DataFrameStatFunctions.countMinSketch`) and read on the driver.
    *
    * @return (value, estimated_count), estimate >= true count (one-sided
    *         error eps * n with probability 1 - confidence)
    */
  def heavyHitterCounts(
      df: DataFrame, colName: String, candidates: Seq[Long],
      eps: Double = 0.001, confidence: Double = 0.99): Seq[(Long, Long)] = {
    val cms = df.stat.countMinSketch(colName, eps, confidence, seed = 42)
    candidates.map(v => v -> cms.estimateCount(v))
  }

  /** Approximate distinct count (HyperLogLog++), relative error `rsd`. */
  def approxDistinct(df: DataFrame, colName: String, rsd: Double = 0.05): Long =
    df.select(approx_count_distinct(col(colName), rsd)).head().getLong(0)

  /** Approximate quantiles (Greenwald-Khanna), absolute rank error
    * `relativeError` * n. */
  def approxQuantiles(
      df: DataFrame, colName: String, probabilities: Seq[Double],
      relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(colName, probabilities.toArray, relativeError).toSeq

  /** Membership sketch for join pruning — see
    * [[graft.operators.ScaleOps.bloomSemiJoin]] for the join-side use. */
  def bloomFilter(df: DataFrame, colName: String, expectedItems: Long, fpp: Double = 0.01) =
    df.stat.bloomFilter(colName, expectedItems, fpp)
}
