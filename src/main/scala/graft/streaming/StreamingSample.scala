package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted reservoir: the unbounded-stream form of
  * [[graft.operators.TrainingData.weightedSample]].
  *
  * Each row draws the same deterministic Efraimidis-Spirakis key as the
  * batch operator (ln(u)/weight from a 60-bit md5 of the id), and a
  * per-stratum `mapGroupsWithState` keeps only the current top-k keys —
  * O(k) state per stratum regardless of stream length, emitted as the
  * refreshed reservoir after every micro-batch.
  *
  * Because the keys are deterministic, the reservoir satisfies an exact
  * law: after ANY prefix of the stream, the state equals the batch
  * operator run over the same rows seen so far — regardless of batch
  * boundaries or arrival order (top-k of a union is the top-k of
  * per-part top-ks). That law is what StreamingSpec pins.
  */
object StreamingSample {

  case class Drawn(strata: String, id: Long, esKey: Double)
  case class Sampled(strata: String, id: Long, rnk: Long)

  /** The E-S key projection shared with the batch operator. */
  private def drawn(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String): DataFrame = {
    val u = (conv(substring(md5(
        concat(lit("ws-"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit(1.152921504606846976e18)
    df.select(col(strataCol).cast("string").as("strata"),
      col(idCol).cast("long").as("id"),
      (log(u) / col(weightCol).cast("double")).as("esKey"))
  }

  private def updateReservoir(k: Int)(
      strata: String, rows: Iterator[Drawn],
      state: GroupState[Seq[(Long, Double)]]): Iterator[Sampled] = {
    val prev = state.getOption.getOrElse(Seq.empty)
    val merged = (prev ++ rows.map(d => (d.id, d.esKey)))
      .sortBy { case (id, key) => (-key, id) }
      .take(k)
    state.update(merged)
    merged.iterator.zipWithIndex.map { case ((id, _), i) =>
      Sampled(strata, id, i + 1L)
    }
  }

  /** Attach the stateful reservoir to a (possibly streaming) DataFrame.
    * Emits the refreshed per-stratum reservoir each micro-batch (Update
    * mode). */
  def weightedReservoir(
      df: DataFrame, idCol: String, strataCol: String, weightCol: String,
      k: Int): Dataset[Sampled] = {
    val spark = df.sparkSession
    import spark.implicits._
    drawn(df, idCol, strataCol, weightCol).as[Drawn]
      .groupByKey(_.strata)
      .mapGroupsWithState[Seq[(Long, Double)], Seq[Sampled]](
        GroupStateTimeout.NoTimeout()) {
        (strata: String, rows: Iterator[Drawn], state: GroupState[Seq[(Long, Double)]]) =>
          updateReservoir(k)(strata, rows, state).toSeq
      }
      .flatMap(identity)
  }

  /** Convenience runner for tests and batch-parity checks: stream
    * `df` through the reservoir into an in-memory sink, return the
    * final reservoir per stratum. */
  def runToMemory(
      spark: SparkSession, stream: DataFrame, idCol: String,
      strataCol: String, weightCol: String, k: Int,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    weightedReservoir(stream, idCol, strataCol, weightCol, k)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
