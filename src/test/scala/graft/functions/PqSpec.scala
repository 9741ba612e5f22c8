package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization laws: exactness on grid-valued data, recall and
  * error behaviour of the KMeans codebooks, determinism, persistence. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val rnd = new scala.util.Random(7L)

  /** Seeded random corpus as (id, vec) rows. */
  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))

  test("uniform-grid corpus encodes exactly: zero error, ADC == true squared L2") {
    // Vectors that are grid-center CONSTANT within each subspace (the
    // rank-1 codebook's representable set): quantization is lossless, so
    // ADC must equal the exact distance.
    val centers = Array.tabulate(8)(j => -1.0 + (j + 0.5) * 0.25)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(m)(_ => centers(rnd.nextInt(8)).toFloat)
        .flatMap(cv => Array.fill(dim / m)(cv)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val idx = PqIndex.fromCodebooks(df, "vec_id", "embedding",
      PqIndex.uniformCodebooks(-1.0, 1.0, dim, m, ksub = 8))
    assert(idx.maxReconstructionError(df, "vec_id", "embedding") == 0.0)

    val got = idx.adcSearch(df.where(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rnk").collect()
    // Exact distances, computed independently.
    val byId = vecs.toMap
    got.foreach { r =>
      val q = byId(r.getLong(0)); val nb = byId(r.getLong(1))
      val exact = q.zip(nb).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      assert(math.abs(r.getDouble(2) - exact) < 1e-9)
    }
    // Every query returns k ranked ascending rows.
    assert(got.groupBy(_.getLong(0)).forall { case (_, rows) =>
      rows.map(_.getLong(3)).toSeq == (1L to 5L) &&
        rows.map(_.getDouble(2)).toSeq == rows.map(_.getDouble(2)).sorted.toSeq
    })
  }

  test("KMeans codebooks: ADC recall against brute force, error shrinks with ksub") {
    val data = corpus(300)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 10)

    val idx = PqIndex.build(df, "vec_id", "embedding", dim, m, ksub = 32,
      trainSampleSize = 300)
    val approx = idx.adcSearch(queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // Brute-force L2 top-10, independent computation.
    val byId = data.toMap
    val exact = (0L until 10L).flatMap { qid =>
      data.filter(_._1 != qid)
        .map { case (id, v) =>
          val q = byId(qid)
          (id, q.zip(v).map { case (a, b) =>
            (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum)
        }
        .sortBy { case (id, d) => (d, id) }.take(10).map(p => (qid, p._1))
    }.toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ADC recall@10 $recall under 0.5")

    // More codes per subspace -> tighter quantization.
    val coarse = PqIndex.build(df, "vec_id", "embedding", dim, m, ksub = 4,
      trainSampleSize = 300)
    assert(idx.maxReconstructionError(df, "vec_id", "embedding") <
      coarse.maxReconstructionError(df, "vec_id", "embedding"))
  }

  test("codebooks are a pure function of the data: identical across partitionings") {
    // The training sample is hash-ordered, not partition-ordered — so a
    // 1-partition and a 16-partition layout of the SAME corpus (worst
    // case: reversed insertion order) must train bit-identical codebooks.
    // This is the cluster-reproducibility law: `limit` alone would take
    // whichever partitions answered first.
    val data = corpus(500)
    val df1 = data.toDF("vec_id", "embedding").repartition(1)
    val df16 = data.reverse.toDF("vec_id", "embedding").repartition(16)
    val cb1 = PqIndex.trainCodebooks(df1, "embedding", dim, m, ksub = 8, trainSampleSize = 200)
    val cb16 = PqIndex.trainCodebooks(df16, "embedding", dim, m, ksub = 8, trainSampleSize = 200)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb16.map(_.map(_.toSeq).toSeq).toSeq)
    // Same law for the IVFADC coarse+residual codebooks.
    val i1 = IvfPq.build(df1, "vec_id", "embedding", dim, nLists = 4, m = m,
      ksub = 8, trainSampleSize = 200)
    val i16 = IvfPq.build(df16, "vec_id", "embedding", dim, nLists = 4, m = m,
      ksub = 8, trainSampleSize = 200)
    assert(i1.centroids.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toSeq) } ==
      i16.centroids.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toSeq) })
    assert(i1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      i16.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode is deterministic and ties break to the lower code") {
    val df = corpus(50).toDF("vec_id", "embedding")
    val cbs = PqIndex.trainCodebooks(df, "embedding", dim, m, ksub = 8,
      trainSampleSize = 50)
    val a = PqIndex.encode(df, "vec_id", "embedding", cbs)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    val b = PqIndex.encode(df, "vec_id", "embedding", cbs)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)

    // Duplicated centroid: both codes are equidistant everywhere, the
    // strict-less argmin must keep the first.
    val dup = Array.fill(m)(Array.fill(2)(Array.fill(dim / m)(0.25)))
    val codes = PqIndex.encode(df, "vec_id", "embedding", dup)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.forall(_ == 0)))
  }

  test("persisted index round-trips codes and codebooks; search unchanged") {
    val df = corpus(80).toDF("vec_id", "embedding")
    val idx = PqIndex.build(df, "vec_id", "embedding", dim, m, ksub = 8,
      trainSampleSize = 80)
    val loc = tmpDir("pq")
    val reloaded = idx.persisted(loc)
    val before = idx.adcSearch(df.where(col("vec_id") < 4), "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk").collect().toSeq
    val after = reloaded.adcSearch(df.where(col("vec_id") < 4), "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(before == after)
    // The codebook artifact is complete data: m * ksub rows, dsub-wide.
    val cb = spark.read.parquet(s"$loc/codebooks")
    assert(cb.count() == m * 8L)
    assert(cb.select(size(col("centroid"))).distinct().as[Int].collect().toSeq == Seq(dim / m))
  }
}
