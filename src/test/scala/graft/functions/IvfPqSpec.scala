package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVFADC laws on clustered data: recall under bounded probes, the
  * residual advantage, probe confinement, persistence. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(11L)

  /** 4 Gaussian-ish blobs, widely separated centers, tight spread. */
  private def blobs(n: Int) = {
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 8 - 4))
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() - 0.5f) * 0.6f))
    }
  }

  private def bruteTop10(data: Seq[(Long, Array[Float])], qids: Seq[Long]) = {
    val byId = data.toMap
    qids.flatMap { qid =>
      data.filter(_._1 != qid).map { case (id, v) =>
        val q = byId(qid)
        (id, q.zip(v).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(p => (qid, p._1))
    }.toSet
  }

  test("kmeans IVFADC: nProbe=2 recall on blobs; residuals beat raw PQ at the same budget") {
    val data = blobs(240)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 8)
    val idx = IvfPq.build(df, "vec_id", "embedding", dim,
      nLists = 4, m = 8, ksub = 16, trainSampleSize = 240)

    val got = idx.search(queries, "vec_id", "embedding", k = 10, idx.kmeansProbe(2))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = bruteTop10(data, 0L until 8L)
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVFADC recall@10 $recall under 0.6")

    // Same code budget, no coarse cells: plain PQ on raw vectors. On
    // clustered data the residual codebook spends its resolution on the
    // within-cell spread, so full-probe IVFADC should recall at least
    // as well as raw PQ.
    val raw = PqIndex.build(df, "vec_id", "embedding", dim, m = 8, ksub = 16,
      trainSampleSize = 240)
    val rawRecall = (raw.adcSearch(queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet & exact)
      .size.toDouble / exact.size
    val fullRecall = (idx.search(queries, "vec_id", "embedding", k = 10,
        idx.kmeansProbe(4))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet & exact)
      .size.toDouble / exact.size
    assert(fullRecall >= rawRecall,
      s"residual IVFADC full-probe recall $fullRecall < raw PQ $rawRecall")
  }

  test("search scans only probed cells; empty probe yields no candidates") {
    val data = blobs(120)
    val df = data.toDF("vec_id", "embedding")
    val idx = IvfPq.build(df, "vec_id", "embedding", dim,
      nLists = 4, m = 4, ksub = 8, trainSampleSize = 120)
    val q1 = df.where(col("vec_id") === 0)
    assert(idx.search(q1, "vec_id", "embedding", 5, _ => Seq.empty).count() == 0)
    // Single-probe results all come from the probed cell.
    val probed = idx.kmeansProbe(1)(data.head._2)
    val cellsOfResults = idx.search(q1, "vec_id", "embedding", 5, idx.kmeansProbe(1))
      .select(col("neighbor_id").as("id")).join(idx.codes, Seq("id"))
      .select("cell").distinct().as[Long].collect().toSet
    assert(cellsOfResults.subsetOf(probed.toSet))
  }

  test("persisted index round-trips and prunes to cell partitions") {
    val data = blobs(100)
    val df = data.toDF("vec_id", "embedding")
    val idx = IvfPq.build(df, "vec_id", "embedding", dim,
      nLists = 4, m = 4, ksub = 8, trainSampleSize = 100)
    val loc = tmpDir("ivfpq")
    val reloaded = idx.persisted(loc)
    val q = df.where(col("vec_id") < 4)
    val a = idx.search(q, "vec_id", "embedding", 5, idx.kmeansProbe(2))
      .orderBy("query_id", "rnk").collect().toSeq
    val b = reloaded.search(q, "vec_id", "embedding", 5, reloaded.kmeansProbe(2))
      .orderBy("query_id", "rnk").collect().toSeq
    assert(a == b && a.nonEmpty)
    // The store is hive-partitioned by cell — the probe's pruning unit.
    val dirs = new java.io.File(loc).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).toSet
    assert(dirs.nonEmpty)
  }
}
