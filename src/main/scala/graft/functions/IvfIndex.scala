package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A reusable IVF-Flat index: build once (KMeans centroids + cell-tagged
  * corpus), search many times.
  *
  * [[SimilarityFunctions.ivfTopK]] trains per call — fine for one-shot
  * jobs; an index that is queried repeatedly should pay the clustering
  * and cell assignment once. At cluster scale the cell-tagged corpus
  * would be persisted partitioned by `cell`, so each probe reads only
  * nProbe partitions (the parquet analogue of an IVF inverted list).
  */
final class IvfIndex private (
    val cellTagged: DataFrame, // (neighbor_id, cvec, cell)
    centroids: Array[Array[Double]]) extends Serializable {

  private def probeCellsUdf(nProbe: Int) = udf { (v: Seq[Float]) =>
    centroids.indices.map { c =>
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      val n = math.min(ctr.length, v.length)
      while (i < n) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
      (d, c)
    }.sortBy(_._1).take(nProbe).map(_._2)
  }

  /** Approximate top-k for each query vector, probing `nProbe` cells.
    * Ranking uses the bounded [[TopKAggregator]] (map-side partial top-k;
    * see `SimilarityFunctions.rankTopK`). */
  def search(
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      explode(probeCellsUdf(nProbe)(col(queryVec))).as("cell"))
    val cands = cellTagged.join(q, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        SimilarityFunctions.cosine(col("qvec"), col("cvec")).as("score"))
    cands.groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k, col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).as("rnk"))
  }

  /** Within-batch near-duplicate pairs under this index's cell geometry:
    * each vector expands to its `nProbe` nearest cells, candidates are
    * same-cell id pairs (vectors joined back only for survivors), verified
    * by exact cosine. Recall matches [[search]]'s nProbe semantics — a
    * pair straddling more than nProbe cells on both sides is missed, the
    * standard IVF trade. Intended for micro-batch-sized inputs: a
    * degenerate batch landing entirely in one cell expands O(B^2) pairs,
    * which for a bounded micro-batch is the exact-check worst case anyway. */
  def batchNearDuplicates(
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nProbe: Int = 4): DataFrame = {
    val tagged = batch.select(col(idCol).as("id"),
      explode(probeCellsUdf(nProbe)(col(vecCol))).as("cell"))
    val cands = tagged.select(col("cell"), col("id").as("id_a"))
      .join(tagged.select(col("cell"), col("id").as("id_b")), Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = batch.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val vb = batch.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    cands.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        SimilarityFunctions.cosine(col("vec_a"), col("vec_b")).as("score"))
      .where(col("score") >= threshold)
  }

  /** Persist the cell-tagged corpus partitioned by cell (so each probe
    * prunes to nProbe partitions) and return an index over the stored
    * layout. */
  def persisted(location: String): IvfIndex = {
    cellTagged.write.mode("overwrite").partitionBy("cell").parquet(location)
    new IvfIndex(
      cellTagged.sparkSession.read.parquet(location)
        .select(col("neighbor_id"), col("cvec"), col("cell")),
      centroids)
  }

  /** Incrementally ingest a batch into a persisted index: assign cells
    * with the EXISTING centroids (no retraining — the standard IVF
    * ingest trade; retrain with [[IvfIndex.build]] when drift warrants)
    * and append to the cell-partitioned layout. Returns an index over
    * the extended store. `location` must be the path this index was
    * persisted at. */
  def appendToPersisted(
      location: String, batch: DataFrame, idCol: String, vecCol: String): IvfIndex = {
    val tagged = batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      IvfIndex.assignCellUdf(centroids)(col(vecCol)).as("cell"))
    tagged.write.mode("append").partitionBy("cell").parquet(location)
    new IvfIndex(
      batch.sparkSession.read.parquet(location)
        .select(col("neighbor_id"), col("cvec"), col("cell")),
      centroids)
  }
}

object IvfIndex {

  /** Session-level centroid cache keyed by (corpus semantic hash, data
    * fingerprint, params): training is deterministic, so re-building the
    * index over the same corpus (e.g. repeated queries in one session)
    * reuses the centroids instead of re-collecting the sample and
    * re-running Lloyd's. The fingerprint covers the backing files'
    * paths + lengths + modification times, so rewriting data at the same
    * path invalidates the entry (a bare plan hash would not), and it
    * disambiguates Int semanticHash collisions across corpora. Bounded
    * by access-order LRU eviction (removeEldest), all under one lock —
    * concurrent builds can never wipe each other's fresh entries. */
  private val CentroidCacheMax = 64
  private val centroidCache =
    new java.util.LinkedHashMap[(Int, Long, Int, Int), Array[Array[Double]]](
      CentroidCacheMax, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Long, Int, Int), Array[Array[Double]]]): Boolean =
        size() > CentroidCacheMax
    }

  private def cachedCentroids(key: (Int, Long, Int, Int))(
      compute: => Array[Array[Double]]): Array[Array[Double]] = {
    centroidCache.synchronized(Option(centroidCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val fresh = compute // outside the lock: training takes seconds
        centroidCache.synchronized {
          Option(centroidCache.get(key)).getOrElse { centroidCache.put(key, fresh); fresh }
        }
    }
  }

  /** Fingerprint of the DataFrame's backing files (path, length, mtime),
    * order-independent. 0 for non-file-backed plans (in-memory test data):
    * those fall back to the semantic hash alone, which is exact for a
    * fully in-plan corpus. Capped stat fan-out: beyond `maxStat` files
    * only the path-set hash is used (paths still catch re-writes that
    * change the file listing, e.g. new part files). */
  private def dataFingerprint(df: DataFrame, maxStat: Int = 1000): Long = {
    val files = df.inputFiles
    if (files.isEmpty) 0L
    else {
      var acc = 0L
      // every term is keyed by the file's path hash, so two files whose
      // (length, mtime) happen to coincide cannot cancel under XOR
      def pathHash(p: String): Long =
        scala.util.hashing.MurmurHash3.stringHash(p).toLong * 0x9e3779b97f4a7c15L
      files.foreach(p => acc ^= pathHash(p))
      if (files.length <= maxStat) {
        val conf = df.sparkSession.sessionState.newHadoopConf()
        files.foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            val st = path.getFileSystem(conf).getFileStatus(path)
            acc ^= java.lang.Long.rotateLeft(
              pathHash(p) ^ (st.getLen * 0x100000001b3L + st.getModificationTime), 17)
          } catch { case _: java.io.IOException => () }
        }
      }
      acc
    }
  }

  /** Bounded DETERMINISTIC training sample of a single vector column.
    * A bare `.limit(n)` takes whatever partitions answer first — fine on
    * a single-file fixture, but on a cluster the codebooks would then
    * vary run-to-run, breaking engine reproducibility. Ordering by a
    * content hash (value tie-break for total order) makes the sample a
    * pure function of the DATA, and the plan stays cheap: orderBy+limit
    * compiles to TakeOrderedAndProject — per-partition top-n, driver
    * merge of n·#partitions rows, no full sort shuffle. */
  private[functions] def deterministicSample(df: DataFrame, vecCol: String, n: Int): Array[Seq[Float]] =
    df.select(col(vecCol).as("v"))
      .orderBy(xxhash64(col("v")), col("v"))
      .limit(n)
      .collect().map(_.getSeq[Float](0))

  /** Driver-local Lloyd's KMeans over a bounded sample.
    *
    * The training sample is bounded by design (`trainSampleSize`), so
    * clustering it is a driver-sized problem — ~10k x 64 doubles, ~50M
    * flops for 5 iterations — and running it locally avoids the many
    * tiny Spark jobs a distributed trainer schedules per iteration. The
    * full-corpus cell ASSIGNMENT stays distributed (broadcast centroid
    * matrix, tight-loop kernel), which is the part that actually scales
    * with data size. Deterministic: seeded init, fixed iteration order. */
  private[functions] def lloyd(
      points: Array[Array[Double]], k: Int, maxIter: Int, tol: Double, seed: Long)
      : Array[Array[Double]] = {
    require(points.nonEmpty, "kmeans: empty training sample")
    val dim = points(0).length
    val n = points.length
    val rnd = new scala.util.Random(seed)
    // init: k distinct sample points, seeded shuffle
    val centroids = rnd.shuffle(points.indices.toList).take(math.min(k, n))
      .map(i => points(i).clone()).toArray
    val kk = centroids.length
    val sums = Array.ofDim[Double](kk, dim)
    val counts = new Array[Long](kk)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var p = 0
      while (p < n) {
        val v = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val ctr = centroids(c)
          var d = 0.0; var i = 0
          while (i < dim) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      moved = 0.0
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) {
            val nv = sums(c)(i) / counts(c)
            val diff = nv - centroids(c)(i)
            moved += diff * diff
            centroids(c)(i) = nv
            i += 1
          }
        }
        c += 1
      }
      iter += 1
    }
    centroids
  }

  /** Build the index: Lloyd's KMeans over a bounded deterministic sample
    * (driver-local, cached per corpus+params), then cell-tag the full
    * corpus with a tight-loop assignment kernel. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, trainSampleSize: Int = 10000): IvfIndex = {
    val key = (corpus.select(col(vecCol)).semanticHash(), dataFingerprint(corpus),
      nLists, trainSampleSize)
    val centroids = cachedCentroids(key) {
      val sample = deterministicSample(corpus, vecCol, trainSampleSize)
        .map(_.toArray.map(_.toDouble))
      lloyd(sample, nLists, maxIter = 5, tol = 1e-3, seed = 42L)
    }
    new IvfIndex(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        assignCellUdf(centroids)(col(vecCol)).as("cell")),
      centroids)
  }

  /** Nearest-centroid cell assignment (tight loop, broadcast matrix). */
  private[functions] def assignCellUdf(centroids: Array[Array[Double]]) =
    udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ctr = centroids(c)
        var d = 0.0; var i = 0
        val n = math.min(ctr.length, v.length)
        while (i < n) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
}
