package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder: turn a change log into
  * validity intervals.
  *
  * The reference engine expresses SCD2 indirectly through Delta MERGE
  * recipes (`io/writers/delta_merge_writer.py` usage docs); this operator
  * is the declarative batch formulation: one rank window per business
  * key, `valid_to` = the next change's time (lead), open interval for the
  * current version. One shuffle on the business key, zero joins, linear
  * in the change log — the shape that survives a 100 TB history rebuild.
  *
  * Determinism: `orderCols` must be a total order within a key (include a
  * unique change id as tie-break) or interval attribution of same-time
  * changes is unspecified.
  */
object Scd2 {

  /** @param changes   change log (one row per version of a key)
    * @param keys      business-key columns
    * @param orderCols total version order within a key
    * @param timeCol   change-time column that bounds validity intervals
    * @return input rows + (valid_from, valid_to, is_current [0/1 long]);
    *         valid_to is null for the latest version of each key
    */
  def fromChangeLog(
      changes: DataFrame, keys: Seq[String],
      orderCols: Seq[Column], timeCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
  }
}
