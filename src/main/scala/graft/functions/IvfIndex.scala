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

  /** Approximate top-k for each query vector, probing `nProbe` cells. */
  def search(
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      explode(probeCellsUdf(nProbe)(col(queryVec))).as("cell"))
    val cands = cellTagged.join(q, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        SimilarityFunctions.cosine(col("qvec"), col("cvec")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rnk"))
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
}

object IvfIndex {

  /** Build the index: KMeans over a bounded deterministic sample, then
    * cell-tag the full corpus with a tight-loop assignment kernel. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, trainSampleSize: Int = 10000): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val train = corpus.select(toVec(col(vecCol)).as("features")).limit(trainSampleSize)
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(5).setTol(1e-3).fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    val assignCell = udf { (v: Seq[Float]) =>
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
    new IvfIndex(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        assignCell(col(vecCol)).as("cell")),
      centroids)
  }
}
