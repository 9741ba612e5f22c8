package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for approximate nearest neighbor (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search"): vectors are
  * cut into `m` subspaces, each quantized to one of `ksub` per-subspace
  * centroids, so a D-float vector compresses to m small codes — the
  * memory-side scale path that complements [[IvfIndex]]'s candidate
  * pruning (IVF bounds what you SCAN, PQ bounds what you STORE; the
  * composition is the classic IVFADC).
  *
  * Asymmetric distance (ADC): a query stays exact; its distance to a code
  * is the sum over subspaces of ||q_sub − centroid(code)||², read from a
  * per-query M×ksub lookup table computed once — so scanning N codes
  * costs N·m adds instead of N·D multiply-adds, over data ~D·4/m times
  * smaller.
  *
  * Scale shape: codebooks are tiny (m·ksub·(D/m) doubles) and ride the
  * closure; encoding is a pure map over the corpus; an ADC scan is a map
  * over the CODES table (the only wide state, ~m bytes/vector) with the
  * bounded query set's distance tables broadcast, then the bounded
  * [[TopKAggregator]] — no join, no corpus shuffle. All argmins break
  * ties toward the lower code/id, so encode and search are deterministic
  * and engine-reproducible.
  */
final class PqIndex private[functions] (
    /** codebooks(m)(code) = centroid of subspace m, length D/m. */
    val codebooks: Array[Array[Array[Double]]],
    /** (id, codes array<int>) — the compressed corpus. */
    val codes: DataFrame) extends Serializable {

  import PqIndex._

  def subspaces: Int = codebooks.length
  def subDim: Int = codebooks(0)(0).length

  /** Exact top-k by asymmetric distance for each query vector. Queries
    * are collected (bounded by construction, as in brute-force top-k) and
    * their distance tables broadcast through the closure; the codes table
    * streams map-side.
    *
    * @return (query_id, neighbor_id, adc_dist, rnk) — ascending distance,
    *         ties toward the lower neighbor id
    */
  def adcSearch(
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val cbs = codebooks
    val q = queries.select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // Distance tables: tables(qi)(m)(code) = ||q_sub - centroid||², the
    // one-off O(|q|·ksub·D) cost that makes the scan O(N·m).
    val tables: Array[(Long, Array[Array[Double]])] = q.map { case (qid, v) =>
      qid -> Array.tabulate(cbs.length) { mi =>
        val base = mi * cbs(0)(0).length
        cbs(mi).map(ctr => subDist(v, base, ctr))
      }
    }
    val score = udf { (id: Long, cs: Seq[Int]) =>
      tables.flatMap { case (qid, tab) =>
        if (qid == id) None
        else {
          var d = 0.0
          var mi = 0
          while (mi < tab.length) { d += tab(mi)(cs(mi)); mi += 1 }
          // Negated: TopKAggregator ranks score DESC; re-negated on output.
          Some((qid, -d))
        }
      }
    }
    codes
      .select(col("id").as("neighbor_id"),
        explode(score(col("id"), col("codes"))).as("s"))
      .select(col("s._1").as("query_id"), col("neighbor_id"),
        col("s._2").as("score"))
      .groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k, col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        (lit(0.0) - col("col.score")).as("adc_dist"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Worst reconstruction (= quantization) error over the corpus — the
    * number that says whether `m`/`ksub` are adequate for the data. */
  def maxReconstructionError(corpus: DataFrame, idCol: String, vecCol: String): Double = {
    val cbs = codebooks
    val err = udf { (v: Seq[Float], cs: Seq[Int]) =>
      var d = 0.0
      var mi = 0
      while (mi < cbs.length) {
        d += subDist(v.toArray, mi * cbs(0)(0).length, cbs(mi)(cs(mi)))
        mi += 1
      }
      math.sqrt(d)
    }
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(codes, Seq("id"))
      .agg(max(err(col("vec"), col("codes")))).head().getDouble(0)
  }

  /** Persist codes plus codebooks-as-data (rank, code, centroid rows) so
    * a later session — or another engine — can load the tokenizer-like
    * artifact without retraining. */
  def persisted(location: String): PqIndex = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$location/codes")
    codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (ctr, code) => (mi, code, ctr.toSeq) }
    }.toSeq.toDF("m", "code", "centroid")
      .write.mode("overwrite").parquet(s"$location/codebooks")
    new PqIndex(codebooks, spark.read.parquet(s"$location/codes"))
  }
}

object PqIndex {

  /** Squared L2 between v[base, base+ctr.length) and ctr — ascending
    * fold, so it is bit-identical to a SQL mirror's list arithmetic. */
  @inline private[functions] def subDist(v: Array[Float], base: Int, ctr: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < ctr.length && base + i < v.length) {
      val diff = v(base + i).toDouble - ctr(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Per-subspace KMeans codebooks over a bounded deterministic sample
    * (driver-local Lloyd's — same rationale as [[IvfIndex.build]]: the
    * sample is bounded, the distributed part is the corpus-wide encode). */
  def trainCodebooks(
      corpus: DataFrame, vecCol: String, dim: Int, m: Int, ksub: Int,
      trainSampleSize: Int = 10000, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    // hash-ordered: deterministic under any partitioning (see
    // IvfIndex.deterministicSample)
    val sample = IvfIndex.deterministicSample(corpus, vecCol, trainSampleSize)
      .map(_.toArray)
    Array.tabulate(m) { mi =>
      val sub = sample.map(v =>
        Array.tabulate(dsub)(i => v(mi * dsub + i).toDouble))
      IvfIndex.lloyd(sub, ksub, maxIter = 5, tol = 1e-3, seed = seed + mi)
    }
  }

  /** Rank-1 uniform grid codebooks: centroid j of every subspace is the
    * constant vector at the j-th of `ksub` grid centers over [lo, hi].
    * Degenerate as a quantizer but exactly SQL-derivable — the instance
    * that lets the generic encode/ADC machinery be hash-verified against
    * a DuckDB oracle (a broken argmin or table lookup cannot match the
    * oracle's closed-form mirror). */
  def uniformCodebooks(lo: Double, hi: Double, dim: Int, m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val step = (hi - lo) / ksub
    Array.fill(m)(Array.tabulate(ksub)(j => Array.fill(dsub)(lo + (j + 0.5) * step)))
  }

  /** Encode the corpus: per subspace, the nearest codebook centroid
    * (strict-less argmin — ties to the lower code). Pure map. */
  def encode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val enc = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      val dsub = codebooks(0)(0).length
      Array.tabulate(codebooks.length) { mi =>
        val cb = codebooks(mi)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          val d = subDist(arr, mi * dsub, cb(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }
    corpus.select(col(idCol).cast("long").as("id"), enc(col(vecCol)).as("codes"))
  }

  /** Train + encode. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, ksub: Int = 16,
      trainSampleSize: Int = 10000): PqIndex = {
    val cbs = trainCodebooks(corpus, vecCol, dim, m, ksub, trainSampleSize)
    new PqIndex(cbs, encode(corpus, idCol, vecCol, cbs))
  }

  /** Index over externally supplied codebooks (e.g. the uniform grid). */
  def fromCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): PqIndex =
    new PqIndex(codebooks, encode(corpus, idCol, vecCol, codebooks))
}
