package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * Design for 100 TB media corpora: the binary payload stays an opaque
  * `binary` column (or an external-path reference) that flows through the
  * pipeline untouched; metadata extraction is a cheap projection; decoding
  * / feature extraction runs per-partition with bounded batch size.
  *
  * The actual image/audio decode is STUBBED (`decodeStub`) — codec
  * libraries are not in this environment — but the Spark-side plumbing
  * (schema, partitioning, per-partition batching) is real and tested.
  */
object Multimodal {

  /** Result schema of [[extractFeatures]]: id + deterministic fake
    * "decoded" feature vector + shape metadata. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType)),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Attach binary-payload metadata columns (`<name>_n_bytes`,
    * `<name>_md5`) derived from a content column cast to binary. */
  def withBinaryMetadata(df: DataFrame, content: Column, name: String): DataFrame =
    df.withColumn(s"${name}_bin", content.cast("binary"))
      .withColumn(s"${name}_n_bytes", octet_length(col(s"${name}_bin")).cast("long"))
      .withColumn(s"${name}_md5", md5(col(s"${name}_bin")))
      .drop(s"${name}_bin")

  /** STUB decoder: a real deployment would link an image/audio codec here.
    * This deterministic fake derives an 8-float "feature vector" and a
    * fake width/height from the payload bytes so the distributed plumbing
    * (schema, batching, partition parallelism) is fully exercisable. */
  private[operators] def decodeStub(id: Long, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0 else payload.length
    val feats = (0 until 8).map { i =>
      if (n == 0) 0.0f
      else payload(i % n).toFloat / 128.0f + i.toFloat
    }.toArray
    Row(id, n.toLong, feats, (n % 640) + 1, (n % 480) + 1)
  }

  /** Per-partition decode / feature extraction over binary payloads.
    *
    * Runs as `mapPartitions` (the Scala analogue of the reference-era
    * `mapInPandas` batch UDF): one decoder instance per partition, rows
    * streamed through it — no driver involvement, scales with partitions.
    */
  def extractFeatures(df: DataFrame, idCol: String, binaryCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(binaryCol).cast("binary"))
      .rdd.mapPartitions { rows =>
        // decoder init would happen here, once per partition
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Deterministic frame sampling for (fake) video payloads: pick every
    * k-th byte offset as a "frame"; mirrors the shape of real frame
    * samplers (explode to one row per sampled frame). */
  def sampleFrames(df: DataFrame, idCol: String, binaryCol: String, everyK: Int): DataFrame =
    df.select(col(idCol), col(binaryCol).cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(floor((col("n_bytes") - 1) / everyK).cast("int"), lit(0)))))
      .select(col(idCol), col("frame_idx"),
        (col("frame_idx") * everyK).as("frame_offset"))
}
