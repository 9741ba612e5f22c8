package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge (upsert) semantics as a pure DataFrame operator.
  *
  * Capability parity with the reference's Delta MERGE writer
  * (`lakehouse_engine/io/writers/delta_merge_writer.py:28-210`): matched
  * delete / matched update (full or per-column set, optionally predicated)
  * / not-matched insert (optionally insert_only). This environment ships
  * no Delta jars, so the engine expresses MERGE as a keyed full-outer join
  * and the writers persist the result transactionally (stage + swap).
  *
  * Scale notes: the join shuffles both sides on the merge key — the same
  * partitioning Delta's low-shuffle merge would use for touched files. For
  * 100 TB targets, pre-bucketing the target table on the merge key turns
  * this into a co-located join with no target-side shuffle.
  */
object MergeOps {

  /** One merge clause's column assignments (target column -> expression
    * over the `source` alias). Empty map means "all source columns". */
  type ColumnSet = Map[String, Column]

  /** Delta-style MERGE of `source` into `target` on equality of `keys`.
    *
    * @param keys            merge key columns (null-safe equality)
    * @param updateCondition extra predicate for the matched-update clause
    * @param updateSet       columns to update on match (empty = all)
    * @param deleteCondition matched rows satisfying this are dropped
    * @param insertOnly      suppress all matched actions (append-new-only)
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCondition: Option[Column] = None,
      updateSet: ColumnSet = Map.empty,
      deleteCondition: Option[Column] = None,
      insertCondition: Option[Column] = None,
      insertOnly: Boolean = false): DataFrame = {
    val dataCols = target.columns.toSeq
    val t = target.select(struct(dataCols.map(col): _*).as("t") +:
      keys.map(k => col(k).as(s"tk_$k")): _*)
    val s = source.select(struct(dataCols.map(col): _*).as("s") +:
      keys.map(k => col(k).as(s"sk_$k")): _*)
    val joinCond = keys.map(k => col(s"tk_$k") <=> col(s"sk_$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val matched = col("t").isNotNull && col("s").isNotNull
    // Conditions reference source/target fields via the "s."/"t." aliases.
    val sourceOnly = col("t").isNull && col("s").isNotNull

    val updatedStruct =
      if (updateSet.isEmpty) col("s")
      else struct(dataCols.map(c =>
        updateSet.getOrElse(c, col(s"t.$c")).as(c)): _*)

    val keep = when(matched && !insertOnly,
        deleteCondition match {
          case Some(d) => when(d, lit(null)).otherwise(
            updateCondition match {
              case Some(u) => when(u, updatedStruct).otherwise(col("t"))
              case None => updatedStruct
            })
          case None => updateCondition match {
            case Some(u) => when(u, updatedStruct).otherwise(col("t"))
            case None => updatedStruct
          }
        })
      .when(matched && insertOnly, col("t"))
      .when(sourceOnly,
        insertCondition match {
          case Some(i) => when(i, col("s")).otherwise(lit(null))
          case None => col("s")
        })
      .otherwise(col("t"))

    joined.select(keep.as("r")).where(col("r").isNotNull).select(col("r.*"))
  }
}
