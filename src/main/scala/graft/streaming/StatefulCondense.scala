package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming CDC condensation: a continuously-maintained
  * latest-record-per-key view of a change stream.
  *
  * The batch condensation (`condense_record_mode_cdc`,
  * `graft.operators.Condense`) re-ranks every micro-batch in
  * `foreachBatch`; this operator instead keeps the winning version per
  * key in the state store (`flatMapGroupsWithState`) and emits a key only
  * when a batch actually changes it — the incremental formulation, with
  * per-key state instead of a per-batch window sort. The reference has no
  * custom stateful operator (SURVEY §2.8); this is the parity-plus path
  * for streaming merge/dedup views at scale: state is partitioned by key
  * across executors, each micro-batch shuffles only its own rows.
  *
  * Records are carried through state as JSON of the full row (schema
  * round-trips via `from_json`); the version column must be castable to
  * long and monotone per key (CDC commit timestamp / LSN). Ties keep the
  * first-seen record, matching the batch condensation's stable rank.
  */
object StatefulCondense {

  /** to_json's default timestamp formats are milli-precision; CDC versions
    * are micro-precision, so the state round-trip must carry micros or
    * re-emitted records silently lose them. */
  private val jsonTsOpts: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** @param df        streaming (or batch) DataFrame of change records
    * @param keys      primary-key columns
    * @param versionCol monotone version/timestamp column — a numeric
    *                   (cast to long) or a timestamp / timestamp_ntz
    *                   (compared at micro precision), covering both
    *                   LSN-style and commit-timestamp-style CDC versions
    * @return stream of (key-changed) latest records, schema = df's schema;
    *         run with OutputMode.Update
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val versionAsLong = df.schema(versionCol).dataType match {
      case TimestampType => unix_micros(col(versionCol))
      case TimestampNTZType => unix_micros(col(versionCol).cast(TimestampType))
      case _ => col(versionCol).cast("long")
    }
    val keyed = df.select(
        concat_ws("\u0001", keys.map(k => col(k).cast("string")): _*).as("k"),
        to_json(struct(df.columns.map(col): _*), jsonTsOpts).as("j"),
        versionAsLong.as("v"))
      .as[(String, String, Long)]

    val updated = keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, String, Long)],
         state: GroupState[(Long, String)]) =>
          val prior = state.getOption
          var bestV = prior.map(_._1).getOrElse(Long.MinValue)
          var bestJ = prior.map(_._2).getOrElse("")
          var changed = false
          rows.foreach { case (_, j, v) =>
            if (v > bestV) { bestV = v; bestJ = j; changed = true }
          }
          if (changed) {
            state.update((bestV, bestJ))
            Iterator.single(bestJ)
          } else Iterator.empty
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING), Encoders.STRING)

    updated.select(from_json(col("value"), schema, jsonTsOpts).as("r")).select("r.*")
  }
}
