package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change capture between dataset snapshots.
  *
  * The reference exposes Delta's Change Data Feed
  * (`lakehouse_engine/terminators/cdf_processor.py`); without a
  * transaction log this build derives the same change rows by diffing two
  * snapshots on a business key: one full-outer join keyed on the PK, one
  * struct comparison for update detection. Output mirrors CDF's
  * `_change_type` values (insert / delete / update_preimage /
  * update_postimage).
  *
  * Scale shape: a single key-partitioned shuffle join; with both
  * snapshots bucketed on the key it becomes co-located.
  *
  * With Delta jars on the classpath, the transaction-log-native feed is
  * available instead via [[graft.io.DeltaSupport.changeFeed]] (same
  * `_change_type` vocabulary).
  */
object ChangeCapture {

  /** Diff `current` against `previous` on `keys`.
    * @return all changed rows with a `_change_type` column */
  def snapshotDiff(previous: DataFrame, current: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = previous.columns.toSeq
    val p = previous.select(struct(dataCols.map(col): _*).as("p"))
    val c = current.select(struct(dataCols.map(col): _*).as("c"))
    val cond = keys.map(k => col(s"p.$k") <=> col(s"c.$k")).reduce(_ && _)
    val joined = p.join(c, cond, "full_outer")

    val inserted = col("p").isNull && col("c").isNotNull
    val deleted = col("p").isNotNull && col("c").isNull
    val updated = col("p").isNotNull && col("c").isNotNull && !(col("p") <=> col("c"))

    // unchanged rows emit a null-tagged placeholder (keeps the array
    // element type uniform) that the filter below drops
    joined
      .select(explode(
        when(inserted, array(struct(lit("insert").as("t"), col("c").as("r"))))
          .when(deleted, array(struct(lit("delete").as("t"), col("p").as("r"))))
          .when(updated, array(
            struct(lit("update_preimage").as("t"), col("p").as("r")),
            struct(lit("update_postimage").as("t"), col("c").as("r"))))
          .otherwise(array(struct(lit(null.asInstanceOf[String]).as("t"), col("p").as("r"))))
      ).as("e"))
      .where(col("e.t").isNotNull)
      .select(col("e.r.*"), col("e.t").as("_change_type"))
  }
}
