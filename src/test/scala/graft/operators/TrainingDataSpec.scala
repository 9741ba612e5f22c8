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

  test("chunkDocuments: sliding windows reconstruct the token stream") {
    val long = Seq((1L, (1 to 23).map(i => s"t$i").mkString(" ")),
      (2L, "short doc only"), (3L, "")).toDF("doc_id", "text")
    val out = TrainingData.chunkDocuments(long, "doc_id", "text",
        chunkTokens = 10, overlapTokens = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()
    // doc 1: n=23, stride=6 -> chunks = ceil((23-4)/6) = 4
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.head._3.startsWith("t1 ") && d1.head._4 == 10)
    assert(d1.last._4 == 5) // tokens 19..23
    // de-overlapped reconstruction: chunk 0 fully + each later chunk
    // minus its leading overlap == the original token stream
    val rebuilt = d1.head._3.split(" ").toSeq ++
      d1.tail.toSeq.flatMap(_._3.split(" ").drop(4).toSeq)
    assert(rebuilt == (1 to 23).map(i => s"t$i"))
    // consecutive chunks share exactly the overlap
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(" ").takeRight(4).toSeq == b._3.split(" ").take(4).toSeq)
    }
    // short and empty docs emit exactly one chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "short doc only", 3L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "", 0L)))
    intercept[IllegalArgumentException] {
      TrainingData.chunkDocuments(long, "doc_id", "text", 10, 10)
    }
  }

  test("chunkDocuments property: coverage/count/overlap laws on random docs") {
    // 60 random docs of 0..300 tokens through ONE chunking call per
    // parameter set; invariants checked per doc against the driver-side
    // formula (seeded, reproducible)
    val rng = new scala.util.Random(7)
    val corpus = (0 until 60).map { id =>
      (id.toLong, Seq.fill(rng.nextInt(301))(s"w${rng.nextInt(1000)}").mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((64, 16), (32, 0), (17, 13))) {
      val stride = chunk - overlap
      val byDoc = TrainingData.chunkDocuments(df, "doc_id", "text", chunk, overlap)
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      corpus.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        val chunks = byDoc(id)
        // count law
        assert(chunks.length ==
          math.max(1, math.ceil((toks.length - overlap).toDouble / stride).toInt),
          s"doc $id count, chunk=$chunk overlap=$overlap")
        // chunk i holds exactly tokens [i*stride, i*stride + chunk)
        chunks.foreach { case (_, i, ctext, n) =>
          val want = toks.slice(i.toInt * stride, i.toInt * stride + chunk)
          assert(ctext.split(" ").filter(_.nonEmpty).toSeq == want)
          assert(n == math.max(0, math.min(chunk, toks.length - i.toInt * stride)))
        }
        // de-overlapped concatenation reconstructs the full stream
        val rebuilt = chunks.head._3.split(" ").filter(_.nonEmpty).toSeq ++
          chunks.tail.toSeq.flatMap(
            _._3.split(" ").filter(_.nonEmpty).drop(overlap).toSeq)
        assert(rebuilt == toks, s"doc $id reconstruction")
      }
    }
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

  test("hashSplit is a disjoint, complete, deterministic partition") {
    val big = spark.range(10000).toDF("id")
    val s1 = TrainingData.hashSplit(big, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L) // complete: every row gets one split
    assert(math.abs(counts("train") - 8000) < 300)
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
    // deterministic: same assignment on re-run
    val s2 = TrainingData.hashSplit(big, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s1.except(s2).count() == 0 && s2.except(s1).count() == 0)
    // the train split contains the 0.8-fraction hashSample exactly
    val sample = TrainingData.hashSample(big, col("id"), 0.8)
      .as[Long].collect().toSet
    assert(s1.where("split = 'train'").select("id").as[Long].collect().toSet == sample)
    intercept[IllegalArgumentException] {
      TrainingData.hashSplit(big, col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("stratifiedSample keeps exactly n per stratum, deterministically") {
    val rows = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = TrainingData.stratifiedSample(rows, Seq("grp"), col("id"), 10)
    val counts = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L))
    val s2 = TrainingData.stratifiedSample(rows, Seq("grp"), col("id"), 10)
    assert(s1.except(s2).count() == 0)
    // a stratum smaller than n passes through whole
    val tiny = TrainingData.stratifiedSample(rows.where("id < 4"), Seq("grp"), col("id"), 10)
    assert(tiny.count() == 4)
  }

  test("contamination counts shared n-grams against the benchmark set") {
    val bench = Seq((100L, "one two three four")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three four five"), // shares "one two three", "two three four"
      (2L, "six seven eight nine"), // shares nothing
      (3L, "one two three")) // exactly one trigram, shared
      .toDF("doc_id", "text")
    val c = TrainingData.contamination(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(c(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(c(2L) == ((2L, 0L, 0.0)))
    assert(c(3L) == ((1L, 1L, 1.0)))
  }

  test("vocabulary ranks terms by frequency with deterministic ties") {
    val v = TrainingData.vocabulary(docs, "doc_id", "text", k = 5)
      .orderBy("rnk").as[(String, Long, Long, Long)].collect()
    assert(v.length == 5)
    assert(v.head._1 == "the") // 3 occurrences over docs 0, 1
    assert(v.head._2 == 3L && v.head._3 == 2L)
    // ranks are 1..5 and occurrence counts never increase
    assert(v.map(_._4).toSeq == (1L to 5L))
    assert(v.sliding(2).forall(p => p(0)._2 >= p(1)._2))
  }

  test("Scd2 builds contiguous validity intervals per key") {
    val changes = Seq(
      (1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 30L),
      (4L, "k2", 15L)).toDF("change_id", "key", "t")
    val scd = graft.operators.Scd2.fromChangeLog(
      changes, Seq("key"), Seq(col("t"), col("change_id")), "t")
      .select("change_id", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(scd(1L) == ((10L, Some(20L), 0L)))
    assert(scd(2L) == ((20L, Some(30L), 0L)))
    assert(scd(3L) == ((30L, None, 1L)))
    assert(scd(4L) == ((15L, None, 1L))) // single version is current
  }

  test("redactPii masks emails before digit runs") {
    val out = Seq("reach me at jane.doe+x@corp.example.org or 555123456",
      "no pii here", "ref 1234 and code 99")
      .toDF("s").select(graft.functions.TextFunctions.redactPii(col("s")))
      .as[String].collect()
    assert(out(0) == "reach me at <EMAIL> or <NUM>")
    assert(out(1) == "no pii here")
    assert(out(2) == "ref <NUM> and code 99") // runs < 4 digits survive
  }

  test("qualityFlags applies the Gopher bounds exactly") {
    val corpus = Seq(
      (1L, Seq.fill(60)("word").mkString(" ")),              // repeated: low TTR, passes bounds
      (2L, "too short"),                                     // < minWords
      (3L, (1 to 60).map(i => "x" * 15).mkString(" ")),      // mean word len 15 > 10
      (4L, (1 to 60).map(_ => "1234").mkString(" ")))        // alpha ratio 0
      .toDF("doc_id", "text")
    val flags = TrainingData.qualityFlags(corpus, "doc_id", "text")
      .select("doc_id", "passes_gopher", "distinct_word_ratio", "mean_word_len")
      .as[(Long, Boolean, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(flags(1L)._2 && flags(1L)._3 == 1.0 / 60)
    assert(!flags(2L)._2)
    assert(!flags(3L)._2 && flags(3L)._4 == 15.0)
    assert(!flags(4L)._2)
  }

  test("repetitionMetrics: top-gram share and duplicate fraction") {
    val corpus = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> top 'a b' 3/5, distinct 2
      (2L, "u v w x y z"),   // all 5 bigrams unique
      (3L, "solo"))          // short doc: one whole-doc gram
      .toDF("doc_id", "text")
    val m = TrainingData.repetitionMetrics(corpus, "doc_id", "text", n = 2)
      .select("id", "total_grams", "top_gram_share", "dup_gram_fraction")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 5L, 3.0 / 5, (5.0 - 2) / 5)))
    assert(m(2L) == ((2L, 5L, 1.0 / 5, 0.0)))
    assert(m(3L) == ((3L, 1L, 1.0, 0.0)))
  }

  test("distinctiveTerms ranks rare terms above common ones") {
    val terms = TrainingData.distinctiveTerms(docs, "doc_id", "text", k = 2)
    val top0 = terms.where("id = 0 AND rnk = 1").select("term").as[String].collect().head
    // "the" appears in 2 docs; doc 0's top term must be one of its unique words
    assert(top0 != "the")
    assert(terms.where("rnk > 2").count() == 0)
    assert(terms.groupBy("id").count().where("count > 2").count() == 0)
  }

  test("weightedSample: aggregator path == window formulation; weights bias selection") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 500L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", if (i <= 10) 1000.0 else 1.0))
      .toDF("id", "strata", "w")
    val got = TrainingData.weightedSample(rows, "id", "strata", col("w"), k = 5)
    // Law: identical to the rank-window formulation over the same keys.
    val u = (conv(substring(md5(concat(lit("ws-"), col("id").cast("string"))), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit(1.152921504606846976e18)
    val win = rows
      .withColumn("k", log(u) / col("w"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("strata").orderBy(col("k").desc, col("id"))).cast("long"))
      .where(col("rnk") <= 5)
      .select(col("strata"), col("id"), col("rnk"))
    assertSameRows(got.select("strata", "id", "rnk"), win)
    // The 10 heavy rows (1000x weight, 2% of rows) should dominate the
    // sample: each stratum has 5 heavy members, expect most of the top-5.
    val heavy = got.where(col("id") <= 10).count()
    assert(heavy >= 6, s"expected heavy rows to dominate, got $heavy of 10")
    // Deterministic.
    assertSameRows(got,
      TrainingData.weightedSample(rows, "id", "strata", col("w"), k = 5))
  }

  test("temperatureMixRates: alpha=1 is natural, small alpha flattens, rates cap") {
    val rows = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (1000L + i, "small"))).toDF("id", "source")
    val natural = TrainingData.temperatureMixRates(rows, "source", 1.0, 500L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(natural("big")._2 === 0.9 && natural("small")._2 === 0.1)
    val flat = TrainingData.temperatureMixRates(rows, "source", 0.3, 500L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // 0.3-temperature pulls the 9:1 imbalance toward uniform.
    assert(flat("small") > 0.1 && flat("small") < 0.5)
    assert(math.abs(flat("small") + flat("big") - 1.0) < 1e-9)
    // A tiny source asked for more rows than it has caps at rate 1.
    val capped = TrainingData.temperatureMixRates(rows, "source", 0.01, 900L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(capped("small") === 1.0)
    intercept[IllegalArgumentException] {
      TrainingData.temperatureMixRates(rows, "source", 0.0, 10L)
    }
  }

  test("unigramNll matches a hand-computed corpus LM; filter thresholds on it") {
    import graft.functions.TextFunctions
    // Corpus counts: a->4, b->1, total 5.
    val corpus = Seq((1L, "a a a"), (2L, "a b"), (3L, "  ")).toDF("doc_id", "text")
    val scored = TextFunctions.unigramNll(corpus, "doc_id", "text")
      .orderBy("id").collect()
    // Zero-token doc 3 is absent.
    assert(scored.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val nll1 = scored(0).getDouble(2)
    val nll2 = scored(1).getDouble(2)
    assert(nll1 == math.round(-math.log(4.0 / 5.0) * 1e4) / 1e4) // 0.2231
    val expected2 = -(math.log(4.0 / 5.0) + math.log(1.0 / 5.0)) / 2.0
    assert(math.abs(nll2 - expected2) < 1e-4) // 0.9163
    assert(scored(0).getLong(1) == 3L && scored(1).getLong(1) == 2L)

    val kept = TextFunctions.perplexityFilter(corpus, "doc_id", "text", maxNll = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("writeShards: bounded shards, exact manifest, deterministic membership") {
    val docs = (1L to 107L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = tmpDir("shards")
    val manifest = TrainingData.writeShards(docs, "doc_id", out, rowsPerShard = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 107 rows / 25 per shard -> 5 shards, last one short.
    assert(manifest.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(manifest.map(_._2).toSeq == Seq(25L, 25L, 25L, 25L, 7L))
    // Id-ordered membership: shard spans partition the id range in order.
    assert(manifest.map(m => (m._3, m._4)).toSeq ==
      Seq((1L, 25L), (26L, 50L), (51L, 75L), (76L, 100L), (101L, 107L)))
    // Data round-trips and each shard dir holds exactly its rows.
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() == 107L)
    assert(data.where("shard = 2").agg(min("doc_id"), max("doc_id"))
      .head.toSeq == Seq(51L, 75L))
    // Re-running produces identical shard membership.
    val again = TrainingData.writeShards(docs, "doc_id", out, rowsPerShard = 25)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(again.toSeq == manifest.map(m => (m._1, m._4)).toSeq)
  }

  test("vocabEncode: frequency-ranked ids, OOV = 0, order preserved") {
    import graft.functions.TextFunctions
    // counts: b=3, a=2, z=1 -> vocab(2): b=1, a=2; z OOV.
    val corpus = Seq((1L, "a b z b"), (2L, "b a")).toDF("doc_id", "text")
    val got = TextFunctions.vocabEncode(corpus, "doc_id", "text",
        vocabSize = 2, maxTokens = 3)
      .orderBy("id").collect()
    assert(got(0).getString(2) == "2-1-0") // a b z (truncated at 3 of 4)
    assert(got(1).getString(2) == "1-2")   // b a
    assert(got(0).getLong(1) == 4L && got(1).getLong(1) == 2L)
  }

  test("sourceDivergence matches a hand-computed KL") {
    import graft.functions.TextFunctions
    // Corpus: a,a,b,c (n=4). Source A = "a a b" (p: a 2/3, b 1/3),
    // source B = "c" (p: c 1). KL(A)=ln(4/3), KL(B)=ln(4).
    val corpus = Seq(("A", "a a b"), ("B", "c")).toDF("source", "text")
    val kl = TextFunctions.sourceDivergence(corpus, "source", "text")
      .orderBy("source").collect()
    assert(kl.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(math.abs(kl(0).getDouble(2) - math.log(4.0 / 3)) < 1e-4)
    assert(math.abs(kl(1).getDouble(2) - math.log(4.0)) < 1e-4)
    assert(kl(0).getLong(1) == 3L && kl(1).getLong(1) == 1L)
  }

  test("importanceWeights matches a hand-computed DSIR ratio; 1 bucket is the zero model") {
    import graft.functions.TextFunctions
    // Target doc "t t", raw doc "r": nt=2, nr=3 (raw includes target).
    // "t" and "r" land in different md5 buckets (6 and 76 mod 256), so
    // with k=256: w(doc1) = 2*(ln(3/258) - ln(3/259)) = 2*ln(259/258),
    // w(doc2) = ln(1/258) - ln(2/259) = ln(259/516).
    val corpus = Seq((1L, "en", "t t"), (2L, "de", "r"), (3L, "de", " "))
      .toDF("doc_id", "lang", "text")
    val got = TextFunctions.importanceWeights(
        corpus, "doc_id", "text", col("lang") === "en", buckets = 256)
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // empty doc absent
    assert(math.abs(got(0).getDouble(2) - 2 * math.log(259.0 / 258)) < 1e-4)
    assert(math.abs(got(1).getDouble(2) - math.log(259.0 / 516)) < 1e-4)
    assert(got(0).getLong(1) == 2L && got(1).getLong(1) == 1L)
    // The target doc scores above the raw doc — the resampling order.
    assert(got(0).getDouble(2) > got(1).getDouble(2))
    // Degenerate single-bucket model: smoothed target and raw
    // distributions are both the constant 1, so every weight is 0.
    val one = TextFunctions.importanceWeights(
        corpus, "doc_id", "text", col("lang") === "en", buckets = 1)
      .select("log_weight").as[Double].collect()
    assert(one.forall(_ == 0.0))
  }

  test("bigramNll matches a hand-computed conditional model") {
    import graft.functions.TextFunctions
    // Bigrams: (a b) x2 from docs 1,2; (b a) x1; (a a) x1.
    // c2: (a,b)=2, (b,a)=1, (a,a)=1; c1: a·=3, b·=1.
    val corpus = Seq((1L, "a b a a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextFunctions.bigramNll(corpus, "doc_id", "text")
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // "x" has no bigrams
    // doc 1: pairs (a,b),(b,a),(a,a): -[ln(2/3)+ln(1/1)+ln(1/3)]/3
    val exp1 = -(math.log(2.0 / 3) + math.log(1.0) + math.log(1.0 / 3)) / 3
    assert(math.abs(got(0).getDouble(2) - exp1) < 1e-4)
    // doc 2: single pair (a,b): -ln(2/3)
    assert(math.abs(got(1).getDouble(2) + math.log(2.0 / 3)) < 1e-4)
    assert(got(0).getLong(1) == 3L && got(1).getLong(1) == 1L)
  }

  test("perplexityBuckets: rank-equal terciles per stratum, head = most natural") {
    import graft.functions.TextFunctions
    // Nine docs in one stratum; doc i repeats the common token 'a' less
    // and the rare-but-distinct tokens more as i grows -> nll increases.
    val corpus = (1 to 9).map { i =>
      val commons = Seq.fill(10 - i)("a")
      val rares = (1 to i).map(j => s"rare_${i}_$j")
      (i.toLong, "en", (commons ++ rares).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val b = TextFunctions.perplexityBuckets(corpus, "doc_id", "lang", "text")
      .orderBy("id").collect()
    // Balanced cut: 3 docs per bucket.
    assert(b.map(_.getLong(4)).groupBy(identity).view.mapValues(_.length).toMap
      == Map(1L -> 3, 2L -> 3, 3L -> 3))
    // nll is monotone in the bucket assignment.
    val byBucket = b.groupBy(_.getLong(4)).view.mapValues(_.map(_.getDouble(3))).toMap
    assert(byBucket(1L).max <= byBucket(2L).min + 1e-9)
    assert(byBucket(2L).max <= byBucket(3L).min + 1e-9)
  }
}
