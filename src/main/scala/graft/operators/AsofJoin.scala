package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for every left row, attach the latest
  * right row with the same key whose time is <= the left row's time
  * (backward as-of, inclusive), optionally within a tolerance.
  *
  * Spark has no built-in as-of join; the naive theta-join formulation
  * (`l.k = r.k AND r.t <= l.t` + rank) explodes into |L| x |R| rows per
  * key before ranking. This operator instead UNIONS both sides tagged
  * with a side marker and takes a running `last(right_payload,
  * ignoreNulls)` over (key, time, side) — one shuffle on the key, one
  * sort, zero row blow-up, the formulation that survives 100 TB event
  * streams. Right rows sort before left rows at equal times, so an
  * exact-time match is inclusive (DuckDB ASOF `l.t >= r.t` semantics).
  *
  * Determinism: if the right side has several rows at the SAME (key,
  * time), which of them attaches is unspecified (matching DuckDB ASOF);
  * keep (key, rightTime) unique for reproducible output.
  *
  * @param keys      equi-join key columns (same names both sides)
  * @param leftTime  left time column, castable to long
  * @param rightTime right time column, castable to long
  * @param rightPrefix prefix for attached right columns (avoids clashes)
  * @param tolerance max allowed (leftTime - rightTime); older matches null out
  * @return left rows (all columns) + prefixed right non-key columns,
  *         null when no right row qualifies — LEFT as-of semantics
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Long] = None): DataFrame = {
    val rPayloadFields = right.schema.fields.filterNot(f => keys.contains(f.name))
    val rPayloadType = StructType(rPayloadFields)
    val lStructType = StructType(left.schema.fields)

    val leftU = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rPayloadType).as("__r")): _*)
    // Null right times never qualify under SQL comparison semantics
    // (r.t <= l.t is NULL, not true) — drop them before the union so a
    // null __t cannot sort NULLS FIRST into the running-last frame and
    // attach to a null-time left row. Null-time LEFT rows are kept (LEFT
    // as-of semantics) and get no match: with null right rows gone, every
    // row preceding them in the NULLS FIRST frame is a left row (__r null).
    val rightU = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lStructType).as("__l"),
        struct(rPayloadFields.map(f => col(f.name)): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftU.unionByName(rightU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull &&
            col("__t") - col(s"__m.$rightTime").cast("long") <= tol, col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        rPayloadFields.map(f => col(s"__m.${f.name}").as(rightPrefix + f.name)): _*)
  }
}
