package graft.maintain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bin-pack compaction for the persisted, append-only dedup/ANN indexes
  * (chunk-hash index, MinHash-LSH posting lists, IVFADC cell store) —
  * the maintenance op the reference expresses as Delta `OPTIMIZE`
  * (reference `terminators/dataset_optimizer.py:17-138`), re-expressed
  * for the plain-parquet index layouts this engine persists.
  *
  * Why it must exist: every streaming face appends one parquet file per
  * micro-batch per partition dir forever
  * ([[graft.functions.DedupFunctions.appendToChunkIndex]],
  * [[graft.functions.MinhashIndex.append]],
  * [[graft.functions.IvfPqIndex.appendToPersisted]]). After 10^4
  * batches the read side of every incremental check degenerates into a
  * small-files scan — footer fetches and task scheduling dominate the
  * actual hash/code reads. Compaction rewrites the index into
  * ~`targetFileBytes` files (preserving the partition layout that makes
  * probes partition-pruned) and swaps it in crash-recoverably via
  * [[graft.io.StagedSwap]] — same protocol as the Z-order rewrite.
  *
  * Semantics: a pure LAYOUT rewrite — the row multiset is unchanged
  * (`distinctRows = false`), or collapsed to the distinct row SET when
  * the index's read side is set-semantic anyway (`distinctRows = true`;
  * the chunk-hash index is consumed only by a hash anti-join, and
  * re-chunked survivor text can legitimately re-emit a hash an earlier
  * batch already indexed, so cross-batch duplicate rows accumulate).
  * Either way every incremental check reads identically pre/post —
  * pinned as a PropertySpec law per index family.
  */
object IndexMaintenance {

  /** (data files, data bytes) under a parquet location — recursive,
    * skipping `_SUCCESS`/metadata/hidden files. The FILE COUNT is the
    * degradation signal appends accumulate; bytes size the rewrite. */
  def stats(spark: SparkSession, location: String): (Int, Long) = {
    val p = new Path(location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0, 0L)
    val it = fs.listFiles(p, true)
    var files = 0
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Distinct partition-value tuples, from the DIRECTORY layout (one
    * `col=value` level per partition column) — no data scan. */
  private def partitionDirCount(
      spark: SparkSession, location: String, depth: Int): Long = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var level = Seq(root)
    (0 until depth).foreach { _ =>
      level = level.flatMap(d => fs.listStatus(d).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath))
    }
    level.size.toLong
  }

  final case class CompactionResult(
      filesBefore: Int, filesAfter: Int, bytes: Long, outputTasks: Int)

  /** Compact the parquet index at `location` in place (staged swap).
    *
    * Layout reasoning, sized for the 100 TB deployment: unpartitioned
    * indexes bin-pack to `ceil(bytes / targetFileBytes)` files.
    * Partitioned indexes keep their `partitionBy` dirs (partition
    * pruning is the whole point of the layout) and write
    * `ceil(bytes / nDirs / targetFileBytes)` files per dir: rows
    * repartition on (partition cols + a row-hash salt bounded by that
    * per-dir file budget), so each output task holds exactly one
    * (dir, salt) slice and writes exactly one file — no dir ever
    * collapses to a single multi-hundred-GB object, and no task writes
    * into more than one dir.
    */
  def compactIndex(
      spark: SparkSession,
      location: String,
      partitionBy: Seq[String] = Nil,
      distinctRows: Boolean = false,
      targetFileBytes: Long = 128L << 20): CompactionResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    graft.io.StagedSwap.recover(conf, location)
    val (filesBefore, bytes) = stats(spark, location)
    val df0 = spark.read.parquet(location)
    val df = if (distinctRows) df0.distinct() else df0
    val stage = location.stripSuffix("/") + "__compact"
    val tasks: Int =
      if (partitionBy.isEmpty) {
        val n = math.max(1L, math.min(1 << 20, (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
        df.repartition(n).write.mode("overwrite").parquet(stage)
        n
      } else {
        val dirs = math.max(1L, partitionDirCount(spark, location, partitionBy.size))
        val perDir = math.max(1L,
          (bytes / dirs + targetFileBytes - 1) / targetFileBytes)
        val n = math.min(1L << 20, dirs * perDir).toInt
        val dataCols = df.columns.filterNot(partitionBy.contains)
        val salt = pmod(hash(dataCols.map(col).toSeq: _*), lit(perDir))
        df.repartition(n, partitionBy.map(col) :+ salt: _*)
          .write.mode("overwrite").partitionBy(partitionBy: _*).parquet(stage)
        n
      }
    graft.io.StagedSwap.commit(conf, location, stage)
    val (filesAfter, _) = stats(spark, location)
    CompactionResult(filesBefore, filesAfter, bytes, tasks)
  }

  /** Compact only past a file-count threshold — the cheap periodic-
    * maintenance form a streaming face calls every N micro-batches (the
    * listing is one FS round-trip; the rewrite only runs when appends
    * have actually accumulated). Returns the result when it ran. */
  def compactIfNeeded(
      spark: SparkSession,
      location: String,
      maxFiles: Int,
      partitionBy: Seq[String] = Nil,
      distinctRows: Boolean = false,
      targetFileBytes: Long = 128L << 20): Option[CompactionResult] = {
    val (files, _) = stats(spark, location)
    if (files <= maxFiles) None
    else Some(compactIndex(spark, location, partitionBy, distinctRows, targetFileBytes))
  }
}
