package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard against driver testdata regeneration changing the `events.ts`
  * physical type out from under the catalog.
  *
  * The driver's events table has shipped in two vintages: parquet
  * TIMESTAMP(NANOS) — which Spark surfaces as a nanosecond LONG under
  * `spark.sql.legacy.parquet.nanosAsLong` — and parquet timestamp[us]
  * without timezone — which Spark surfaces as TIMESTAMP_NTZ. Between
  * rounds 8 and 9 the driver silently flipped from the first to the
  * second and every hard-coded nanos assumption in the catalog failed
  * analysis (q41/q55/q61/q63, VERDICT r9 "What's wrong" #1).
  *
  * This spec regenerates BOTH vintages of a small events fixture locally
  * and runs every events-reading catalog query against each, asserting
  * identical row sets — so the next silent regeneration (in either
  * direction) fails here, in-repo, instead of in the driver's gate.
  *
  * The nanos fixture carries sub-microsecond components that the
  * timestamp[us] fixture cannot represent, mirroring real data: the
  * queries normalize to micro precision, so results must still agree.
  */
class EventsVintageSpec extends SparkSpec {

  import spark.implicits._

  /** Queries whose Spark plan reads the events table. */
  private val eventQueries = Seq(
    "q08_condense_cdc", "q22_json_extract", "q41_event_hourly",
    "q55_sessionize", "q61_stateful_condense", "q63_asof_join",
    "q111_band_join")

  private val eventTypes = Seq("click", "view", "purchase", "signup")

  /** Deterministic base rows: (event_id, micros, user_id, type, value, props). */
  private def baseRows: Seq[(Long, Long, Long, String, Double, String)] =
    (0L until 400L).map { i =>
      val user = i % 13
      // Base stride between a user's consecutive events is 13 x 137 s =
      // 1781 s; the parity term alternates +/-600 s on top, so per-user
      // gaps alternate 2381 s (> the q55 30-minute session gap -> split)
      // and 1181 s (< gap -> same session). Unique (user_id, micros).
      val micros = 1706600000000000L + i * 137000000L + user * 977L +
        (i % 2) * 600000000L
      (i, micros, user, eventTypes((i % 7 % 4).toInt),
        (i % 100) / 7.0, s"""{"k": ${i % 23}}""")
    }

  private def writeVintages(): (String, String) = {
    val nanosDir = tmpDir("events-nanos")
    val microsDir = tmpDir("events-micros")
    val base = baseRows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    // Vintage A — TIMESTAMP(NANOS) as Spark surfaces it under nanosAsLong:
    // a plain int64 of epoch nanos, WITH sub-microsecond components.
    base.select(col("event_id"),
        (col("ts_us") * 1000L + col("event_id") % 997L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // Vintage B — parquet timestamp[us] without timezone (TIMESTAMP_NTZ).
    base.select(col("event_id"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  private def canon(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)

  test("every events-reading catalog query agrees across both ts vintages") {
    val (nanosDir, microsDir) = writeVintages()
    // sanity: the two fixtures surface the intended types
    assert(spark.read.parquet(s"$nanosDir/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(spark.read.parquet(s"$microsDir/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    eventQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = canon(fn(spark, nanosDir))
      val b = canon(fn(spark, microsDir))
      assert(a.count() > 0, s"$name: empty result on nanos vintage")
      // the fixture must actually exercise session splitting: more
      // sessions than users proves gaps straddle the 30-minute boundary
      if (name == "q55_sessionize")
        assert(a.count() > 13, s"$name: fixture produced no session splits")
      withClue(s"$name disagrees across ts vintages: ") {
        assertSameRows(a, b)
      }
    }
  }
}
