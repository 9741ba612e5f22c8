package graft.io

import graft.operators.MergeOps
import graft.spec.{MergeOptions, OutputSpec}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Writer factory: output spec + DataFrame -> persisted result.
  *
  * Capability parity with `lakehouse_engine/io/writer_factory.py:29-84`
  * and the writers under `lakehouse_engine/io/writers/`:
  *   - FileWriter / TableWriter, batch + streaming, partitionBy, all save
  *     modes (append/overwrite/error/ignore)
  *   - MergeWriter: Delta-style MERGE re-expressed natively over parquet
  *     (this build ships no Delta jars) with staged-swap atomicity
  *   - JDBC / Kafka / Console / DataFrame sinks
  *   - streaming trigger resolution (availableNow default, once,
  *     processingTime, continuous) and per-micro-batch transform plans
  *     via foreachBatch
  */
object Writers {

  /** A per-micro-batch plan: transformations + DQ to apply inside
    * foreachBatch before the terminal write (reference
    * `algorithms/data_loader.py:265-330`, `io/writer.py:58-135`). */
  final case class MicroBatchPlan(transform: DataFrame => DataFrame)

  def write(
      spark: SparkSession,
      spec: OutputSpec,
      df: DataFrame,
      microBatchPlan: Option[MicroBatchPlan] = None): Option[StreamingQuery] = {
    if (df.isStreaming) Some(writeStreaming(spark, spec, df, microBatchPlan))
    else { writeBatch(spark, spec, applyBatchId(df, spec, None)); None }
  }

  // ---- batch ------------------------------------------------------------

  def writeBatch(spark: SparkSession, spec: OutputSpec, df: DataFrame): Unit = {
    val fmt = spec.dataFormat.getOrElse(if (spec.dbTable.isDefined) "parquet" else "parquet")
    spec.writeType match {
      case "merge" => mergeWrite(spark, spec, df)
      case writeType =>
        val mode = writeType match {
          case "overwrite" | "complete" => "overwrite"
          case "append" | "update" => "append"
          case "error" => "error"
          case "ignore" => "ignore"
          case other => sys.error(s"unsupported write_type for batch: $other")
        }
        fmt match {
          case "jdbc" =>
            df.write.format("jdbc").options(spec.options).mode(mode).save()
          case "kafka" =>
            df.write.format("kafka").options(spec.options).save()
          case "console" =>
            df.show(spec.options.get("limit").map(_.toInt).getOrElse(20),
              truncate = spec.options.get("truncate").forall(_.toBoolean))
          case "dataframe" => // terminal no-op: caller keeps the DataFrame
          case "sharepoint" => SharepointIo.write(df, spec.options)
          case _ =>
            // `delta` without the Delta jars: store as parquet, like the
            // merge path's documented fallback (same data, different log)
            val effFmt =
              if (fmt == "delta" && !DeltaSupport.available) "parquet" else fmt
            val w = df.write.format(effFmt).options(spec.options).mode(mode)
            val withParts =
              if (spec.partitions.nonEmpty) w.partitionBy(spec.partitions: _*) else w
            (spec.dbTable, spec.location) match {
              case (Some(t), _) => withParts.saveAsTable(t)
              case (_, Some(loc)) => withParts.save(loc)
              case _ => sys.error(s"output spec ${spec.specId}: needs db_table or location")
            }
        }
    }
  }

  // ---- merge (native, no Delta in this build) ---------------------------

  /** MERGE into a parquet location/table: read current target, apply
    * Delta-semantics merge, write staged, swap via [[StagedSwap]] (checked
    * renames; see its doc for the crash window). At cluster scale the
    * target should be bucketed/partitioned by the merge key so the join
    * co-locates; rewrite cost is bounded by touched partitions when a
    * partition filter is part of the merge predicate. */
  private def mergeWrite(spark: SparkSession, spec: OutputSpec, source: DataFrame): Unit = {
    val opts = spec.mergeOpts.getOrElse(sys.error("merge write_type needs merge_opts"))
    val loc = spec.location.getOrElse(sys.error("native merge needs a location"))
    val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Settle any interrupted previous swap BEFORE probing existence: a
    // crash between StagedSwap's renames leaves loc missing while the
    // staged data (and intent) exist — probing then would take the
    // create branch and silently drop every previously merged row.
    // recover() rolls that swap forward first; no-op on a clean location.
    StagedSwap.recover(spark.sparkContext.hadoopConfiguration, loc)
    val targetExists = fs.exists(new Path(loc))
    // data_format: delta + Delta jars on the classpath -> the real
    // DeltaTable MERGE (transaction-log commit); otherwise the native
    // join + staged swap below. Same ACON, same clause semantics.
    if (DeltaSupport.routes(spec.dataFormat) && targetExists) {
      DeltaSupport.merge(spark, loc, source, opts)
      return
    }
    // `delta` requested but not on the classpath: store as parquet —
    // the merge semantics are preserved by the native join + staged
    // swap; only the storage format differs (documented fallback).
    val mergeFmt = spec.dataFormat match {
      case Some("delta") if !DeltaSupport.available => "parquet"
      case other => other.getOrElse("parquet")
    }
    if (!targetExists) {
      val w = source.write.format(mergeFmt)
        .options(spec.options).mode("overwrite")
      (if (spec.partitions.nonEmpty) w.partitionBy(spec.partitions: _*) else w).save(loc)
    } else {
      val target = spark.read.format(mergeFmt).load(loc)
      val merged = MergeOps.mergeWithOptions(target, source, opts)
      val stage = loc.stripSuffix("/") + "__stage"
      val w = merged.write.format(mergeFmt)
        .options(spec.options).mode("overwrite")
      (if (spec.partitions.nonEmpty) w.partitionBy(spec.partitions: _*) else w).save(stage)
      StagedSwap.commit(spark.sparkContext.hadoopConfiguration, loc, stage)
    }
  }

  // ---- streaming --------------------------------------------------------

  def resolveTrigger(spec: OutputSpec): Trigger = spec.streamingTrigger match {
    case None | Some("availableNow") => Trigger.AvailableNow()
    case Some("once") => Trigger.Once()
    case Some(s) if s.startsWith("processingTime=") =>
      Trigger.ProcessingTime(s.stripPrefix("processingTime="))
    case Some(s) if s.startsWith("continuous=") =>
      Trigger.Continuous(s.stripPrefix("continuous="))
    case Some(other) => sys.error(s"unknown streaming_trigger: $other")
  }

  private def applyBatchId(df: DataFrame, spec: OutputSpec, batchId: Option[Long]): DataFrame =
    if (spec.withBatchId) df.withColumn("lhe_batch_id", lit(batchId.getOrElse(-1L)))
    else df

  private def writeStreaming(
      spark: SparkSession,
      spec: OutputSpec,
      df: DataFrame,
      plan: Option[MicroBatchPlan]): StreamingQuery = {
    val trigger = resolveTrigger(spec)
    val needsForeachBatch = plan.isDefined || spec.writeType == "merge" ||
      spec.dataFormat.contains("jdbc") || spec.dataFormat.contains("dataframe")
    if (needsForeachBatch) {
      df.writeStream
        .trigger(trigger)
        .options(spec.options.filter { case (k, _) => k == "checkpointLocation" })
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val transformed = plan.map(_.transform(batch)).getOrElse(batch)
          val withId = applyBatchId(transformed, spec, Some(batchId))
          if (spec.dataFormat.contains("dataframe"))
            withId.createOrReplaceGlobalTempView(s"lhe_stream_${spec.specId}")
          else writeBatch(spark, spec, withId)
        }
        .start()
    } else {
      val base = df.writeStream.trigger(trigger)
        .outputMode(spec.writeType match {
          case "complete" => "complete"
          case "update" => "update"
          case _ => "append"
        })
        .options(spec.options)
      spec.dataFormat match {
        case Some("console") => base.format("console").start()
        case Some("kafka") => base.format("kafka").start()
        case _ =>
          val fmt = spec.dataFormat.getOrElse("parquet")
          val withParts =
            if (spec.partitions.nonEmpty) base.partitionBy(spec.partitions: _*) else base
          (spec.dbTable, spec.location) match {
            case (Some(t), _) => withParts.format(fmt).toTable(t)
            case (_, Some(loc)) => withParts.format(fmt).start(loc)
            case _ => sys.error(s"output spec ${spec.specId}: needs db_table or location")
          }
      }
    }
  }
}
