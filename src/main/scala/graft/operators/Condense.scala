package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record condensation (latest-per-key) operators.
  *
  * Capability parity with the reference's condensers
  * (`lakehouse_engine/transformers/condensers.py:20-130`): CDC changelog
  * condensation and generic group-and-rank dedup. Both compile to a single
  * window (`row_number` over partition/order) which Catalyst executes as a
  * partial top-1-per-key (WindowGroupLimit pushdown in Spark 3.5+/4.x), so
  * at scale each shuffle partition only materializes the winning rows.
  */
object Condense {

  /** Keep the first row per group under the given ordering.
    * Mirrors `group_and_rank` (`transformers/condensers.py:90-130`). */
  def groupAndRank(
      df: DataFrame,
      groupKey: Seq[Column],
      ordering: Seq[Column],
      ranksToKeep: Int = 1): DataFrame = {
    val w = Window.partitionBy(groupKey: _*).orderBy(ordering: _*)
    df.withColumn("lhe_rank", row_number().over(w))
      .where(col("lhe_rank") <= ranksToKeep)
  }

  /** SAP-style CDC changelog condensation: rank change records per business
    * key by extraction recency, keep the latest, and drop keys whose latest
    * record is a deletion-style record mode.
    * Mirrors `condense_record_mode_cdc` (`transformers/condensers.py:20-88`).
    *
    * @param businessKey       columns identifying one entity
    * @param rankingDesc       recency columns, newest-first (e.g. extraction ts)
    * @param rankingAsc        ascending tie-break columns
    * @param recordModeCol     optional record-mode column
    * @param validRecordModes  record modes to keep after condensation
    */
  def condenseRecordModeCdc(
      df: DataFrame,
      businessKey: Seq[String],
      rankingDesc: Seq[String],
      rankingAsc: Seq[String] = Seq.empty,
      recordModeCol: Option[String] = None,
      validRecordModes: Seq[String] = Seq.empty): DataFrame = {
    val ordering = rankingDesc.map(c => col(c).desc) ++ rankingAsc.map(c => col(c).asc)
    val ranked = groupAndRank(df, businessKey.map(col), ordering).drop("lhe_rank")
    recordModeCol match {
      case Some(rm) if validRecordModes.nonEmpty =>
        ranked.where(col(rm).isNull || col(rm).isInCollection(validRecordModes))
      case _ => ranked
    }
  }
}
