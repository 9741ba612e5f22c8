package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox", "en"),
    (2L, "der schnelle braune fuchs", "de"),
    (3L, "one two three four five six seven eight", "en"),
    (4L, "uno dos tres", "es"),
    (5L, "alpha beta gamma delta epsilon", "en"))
    .toDF("doc_id", "text", "lang")

  test("hashSample is deterministic, map-side, and roughly proportional") {
    val big = spark.range(10000).toDF("id")
    val s1 = TrainingData.hashSample(big, col("id"), 0.3).collect().map(_.getLong(0))
    val s2 = TrainingData.hashSample(big, col("id"), 0.3).collect().map(_.getLong(0))
    assert(s1.sameElements(s2)) // reproducible
    assert(math.abs(s1.length - 3000) < 300) // ~30%
    // different salt draws a different sample
    val s3 = TrainingData.hashSample(big, col("id"), 0.3, salt = 7).collect().map(_.getLong(0))
    assert(!s1.sameElements(s3))
    // a sample at a smaller fraction is a subset of the larger one
    val s4 = TrainingData.hashSample(big, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(s4.subsetOf(s1.toSet))
  }

  test("mixSources applies per-source weights") {
    val mixed = TrainingData.mixSources(Seq(
      docs.where(col("lang") === "en") -> 1.0,
      docs.where(col("lang") =!= "en") -> 0.0), "doc_id")
    assert(mixed.select("lang").distinct().as[String].collect().toSet == Set("en"))
    assert(mixed.count() == 4) // all en docs kept, nothing else
  }

  test("packSequences fills budgets in id order per shard") {
    val packed = TrainingData.packSequences(docs, "doc_id", "text",
      tokenBudget = 10, nShards = 1).orderBy("pack_id")
    val rows = packed.select("pack_id", "n_docs", "pack_tokens").as[(Long, Long, Long)].collect()
    // 9+4+4+8+3+5 tokens, budget 10: packs split on the running prefix sum
    assert(rows.map(_._3).sum == 33L)
    assert(rows.map(_._2).sum == 6L)
    // pack assignment is cum_before / budget: doc0 (cum 0) -> pack 0,
    // doc1 (cum 9) -> pack 0, doc2 (cum 13) -> pack 1, ...
    assert(rows.head._1 == 0L && rows.head._2 == 2L)
    // sharding keeps every doc exactly once
    val sharded = TrainingData.packSequences(docs, "doc_id", "text",
      tokenBudget = 10, nShards = 3)
    assert(sharded.agg(sum("n_docs")).as[Long].collect().head == 6L)
  }

  test("asofJoin attaches the latest prior right row per key") {
    val quotes = Seq( // (sym, t, px)
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 50.0)).toDF("sym", "t", "px")
    val trades = Seq( // (sym, t, qty)
      ("A", 0L, 1L), ("A", 5L, 2L), ("A", 7L, 3L), ("A", 100L, 4L),
      ("B", 3L, 5L), ("C", 1L, 6L)).toDF("sym", "t", "qty")
    val j = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t")
      .select("sym", "t", "qty", "asof_px").as[(String, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._4).toMap
    assert(j(("A", 0L)).isEmpty) // before any quote
    assert(j(("A", 5L)).contains(11.0)) // exact-time match is inclusive
    assert(j(("A", 7L)).contains(11.0))
    assert(j(("A", 100L)).contains(12.0)) // latest quote, however old
    assert(j(("B", 3L)).isEmpty)
    assert(j(("C", 1L)).isEmpty) // key with no right side at all
    // tolerance nulls out stale matches
    val tol = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
        tolerance = Some(10L))
      .select("sym", "t", "asof_px").as[(String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(tol(("A", 100L)).isEmpty) // 100 - 9 > 10
    assert(tol(("A", 7L)).contains(11.0))
  }

  test("asofJoin ignores null times on both sides (SQL comparison semantics)") {
    val quotes = Seq(
      ("A", Some(1L), 10.0), ("A", None, 99.0)) // null-time quote must never attach
      .toDF("sym", "t", "px")
    val trades = Seq(
      ("A", Some(0L), 1L), // before all non-null quotes -> no match
      ("A", Some(2L), 2L), // matches the t=1 quote
      ("A", None, 3L)) // null-time left row: kept, no match (DuckDB ASOF parity)
      .toDF("sym", "t", "qty")
    val j = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t")
      .select("qty", "asof_px").as[(Long, Option[Double])].collect().toMap
    assert(j.size == 3) // all left rows survive
    assert(j(1L).isEmpty)
    assert(j(2L).contains(10.0))
    assert(j(3L).isEmpty)
  }

  test("int8 quantization error is bounded by half a quantization step") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 127.0f)),
      (2L, Array(0.001f, -0.002f, 0.0015f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: excluded
      .toDF("vec_id", "embedding")
    val stats = TrainingData.int8QuantizationStats(vecs, "vec_id", "embedding")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!stats.contains(3L))
    stats.foreach { case (id, (scale, err)) =>
      assert(scale > 0)
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err vs step $scale")
    }
  }

  test("distinctiveTerms ranks rare terms above common ones") {
    val terms = TrainingData.distinctiveTerms(docs, "doc_id", "text", k = 2)
    val top0 = terms.where("id = 0 AND rnk = 1").select("term").as[String].collect().head
    // "the" appears in 2 docs; doc 0's top term must be one of its unique words
    assert(top0 != "the")
    assert(terms.where("rnk > 2").count() == 0)
    assert(terms.groupBy("id").count().where("count > 2").count() == 0)
  }
}
