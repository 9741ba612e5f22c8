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
  * Image payloads are REALLY decoded ([[ImageCodec]], pure-JDK
  * `javax.imageio`: PNG/JPEG/BMP/GIF) into exact dimensions, per-channel
  * stats and a 64-bit perceptual dHash usable for image near-dup. Payloads
  * no image reader recognises (text, audio, unknown codecs) fall back to
  * the deterministic synthetic path so the distributed plumbing still
  * carries every row.
  */
object Multimodal {

  /** Result schema of [[extractFeatures]]. For decoded images the channel
    * sums are exact integers over the pixels (oracle-checkable); for
    * non-image payloads the image columns are null and `features` carries
    * the synthetic byte-derived vector. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", LongType),
    StructField("is_image", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("std_r", DoubleType),
    StructField("std_g", DoubleType),
    StructField("std_b", DoubleType),
    StructField("dhash", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Attach binary-payload metadata columns (`<name>_n_bytes`,
    * `<name>_md5`) derived from a content column cast to binary. */
  def withBinaryMetadata(df: DataFrame, content: Column, name: String): DataFrame =
    df.withColumn(s"${name}_bin", content.cast("binary"))
      .withColumn(s"${name}_n_bytes", octet_length(col(s"${name}_bin")).cast("long"))
      .withColumn(s"${name}_md5", md5(col(s"${name}_bin")))
      .drop(s"${name}_bin")

  /** Fallback for payloads that are not a decodable image (a real
    * deployment would dispatch to audio/video codecs here): a
    * deterministic byte-derived 8-float vector and byte-derived fake
    * dimensions, so every row still flows through the pipeline. */
  private[operators] def decodeFallback(id: Long, payload: Array[Byte]): Row = {
    val n = if (payload == null) 0 else payload.length
    val feats = (0 until 8).map { i =>
      if (n == 0) 0.0f
      else payload(i % n).toFloat / 128.0f + i.toFloat
    }.toArray
    Row(id, n.toLong, false, (n % 640) + 1, (n % 480) + 1,
      null, null, null, null, null, null, null, null, null, null, feats)
  }

  private def decodeOne(id: Long, payload: Array[Byte]): Row =
    ImageCodec.decode(payload) match {
      case Some(d) =>
        val feats = Array(d.meanR, d.meanG, d.meanB, d.stdR, d.stdG, d.stdB,
          d.width.toDouble, d.height.toDouble).map(_.toFloat)
        Row(id, payload.length.toLong, true, d.width, d.height,
          d.sumR, d.sumG, d.sumB, d.meanR, d.meanG, d.meanB,
          d.stdR, d.stdG, d.stdB, d.dHash, feats)
      case None => decodeFallback(id, payload)
    }

  /** Per-partition decode / feature extraction over binary payloads.
    *
    * Runs as `mapPartitions` (the Scala analogue of the reference-era
    * `mapInPandas` batch UDF): one decoder pass per partition, rows
    * streamed through it — no driver involvement, scales with partitions.
    */
  def extractFeatures(df: DataFrame, idCol: String, binaryCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(binaryCol).cast("binary"))
      .rdd.mapPartitions { rows =>
        // per-partition decoder scope: ImageIO reader caches are JVM-wide,
        // nothing per-row is allocated beyond the decode buffers
        rows.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Image near-duplicate pairs by perceptual dHash with Hamming distance
    * <= maxDistance, banded on `maxDistance + 1` contiguous blocks of the
    * 64-bit hash (pigeonhole: a pair within maxDistance matches at least
    * one block exactly, for ANY maxDistance) — the same bounded-bucket
    * candidate generation as the text SimHash path, never a cross join.
    * Non-image payloads are excluded before banding. */
  def imageNearDuplicates(
      df: DataFrame,
      idCol: String,
      binaryCol: String,
      maxDistance: Int = 3,
      maxBucketSize: Int = 100000): DataFrame = {
    val hashes = extractFeatures(df, idCol, binaryCol)
      .where(col("is_image"))
      .select(col("id"), col("dhash"))
    val banded = hashes.select(
      explode(graft.functions.DedupFunctions
        .hammingBandKeys(col("dhash"), 64, maxDistance)).as("bk"),
      struct(col("id"), col("dhash")).as("m"))
    banded
      .groupBy(col("bk.block").as("block"), col("bk.key").as("key"))
      .agg(collect_list(col("m")).as("ms"))
      .where(size(col("ms")).between(2, maxBucketSize))
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.DedupFunctions
          .hammingDistance(col("a.dhash"), col("b.dhash")).as("hamming"))
      .where(col("hamming") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
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
