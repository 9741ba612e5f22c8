package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic numeric band (proximity/range) join as a bucketed equi-join.
  *
  * The naive formulation — `JOIN ON abs(l.k − r.k) <= radius` — is a
  * theta join Spark can only run as a broadcast-nested-loop: every left
  * row against every right row, quadratic at scale (the same failure mode
  * q44's calendar join retired). Bucketing by `floor(key / radius)` turns
  * it into an equi-join: a right row within `radius` of a left row sits
  * in the left row's bucket or one of its two neighbors, so the right
  * side explodes ×3 (constant) and the join keys on
  * (equi columns, bucket) — a shuffle on high-cardinality keys, with the
  * exact |Δkey| ≤ radius predicate verified after the match. Each
  * qualifying pair matches EXACTLY once (the one right copy whose bucket
  * equals the left row's), so no dedup pass is needed.
  *
  * This is the general-purpose instance of the family: GAB's calendar
  * join ([[graft.algo.Gab]]) is the date-grain version, the as-of join
  * ([[AsofJoin]]) the latest-prior version.
  */
object RangeJoin {

  /** Pairs of (left, right) rows sharing `equiCols` with
    * |leftKey − rightKey| <= radius. Column name collisions between the
    * two sides are the caller's to resolve (as with any join). */
  def bandJoin(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      equiCols: Seq[String], radius: Long): DataFrame = {
    require(radius > 0, "bandJoin radius must be positive")
    val lb = left.withColumn("__band_bucket", floor(leftKey / radius))
    val rb = right
      .withColumn("__b0", floor(rightKey / radius))
      .withColumn("__band_bucket",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    lb.join(rb, equiCols :+ "__band_bucket")
      .where(abs(leftKey - rightKey) <= radius)
      .drop("__band_bucket")
  }
}
