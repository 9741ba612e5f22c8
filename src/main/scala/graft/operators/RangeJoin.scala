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

  /** Attach an integral floor-division bucket id as `out`.
    * `floor(key / radius)` would evaluate as DOUBLE division — beyond
    * |key| ~ 2^53 the bucket id can be off by one, silently DROPPING
    * qualifying pairs (the post-filter only removes false positives; it
    * cannot recover a missed match). `(k - pmod(k, r)) div r` stays in
    * long arithmetic throughout: pmod is in [0, r), the numerator is an
    * exact multiple of r, and SQL `div` is integral division. Keys are
    * cast to long (the contract is integral keys — timestamps in micros,
    * ids, offsets). */
  private def withBucket(df: DataFrame, key: Column, radius: Long, out: String): DataFrame =
    df.withColumn("__band_k", key.cast("long"))
      .withColumn(out,
        expr(s"(__band_k - pmod(__band_k, ${radius}L)) div ${radius}L"))
      .drop("__band_k")

  /** Pairs of (left, right) rows sharing `equiCols` with
    * |leftKey − rightKey| <= radius. Keys must be integral (long-valued);
    * column name collisions between the two sides are the caller's to
    * resolve (as with any join). */
  def bandJoin(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      equiCols: Seq[String], radius: Long): DataFrame = {
    require(radius > 0, "bandJoin radius must be positive")
    val lb = withBucket(left, leftKey, radius, "__band_bucket")
    val rb = withBucket(right, rightKey, radius, "__b0")
      .withColumn("__band_bucket",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    lb.join(rb, equiCols :+ "__band_bucket")
      .where(abs(leftKey - rightKey) <= radius)
      .drop("__band_bucket")
  }
}
