package graft.exec

import org.apache.spark.sql.SparkSession

/** SparkSession management with engine defaults.
  *
  * Capability parity with the reference's execution environment
  * (`lakehouse_engine/core/exec_env.py:54-104`): a single place that
  * creates/fetches the session and applies engine-default confs (AQE on,
  * UTC session timezone). Confs that the running Spark build does not
  * support are skipped silently, mirroring the reference's tolerant
  * conf application (`core/exec_env.py:130-146`).
  */
object ExecEnv {

  /** Engine-default Spark confs, applied unless the caller overrides. */
  val defaultConfs: Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.exec.GraftExtensions",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // The driver test data writes event timestamps as parquet
    // INT64(TIMESTAMP(NANOS,...)), which vanilla Spark rejects; read them
    // as nanosecond longs and convert explicitly where needed.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    // RDD-shuffle paths (GraphX connected components) serialize edge/vertex
    // objects; Kryo halves their payload vs Java serialization. SQL/Tungsten
    // paths are unaffected (they use UnsafeRow).
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer"
  )

  /** Create (or fetch) the engine SparkSession. */
  def getOrCreate(
      appName: String = "graft",
      master: Option[String] = None,
      confs: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    (defaultConfs ++ confs).foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
