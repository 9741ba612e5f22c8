package graft.tools

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Two-point scale curve for the dedup/ANN family: times
  * q31/q32/q39/q50/q76's underlying operators at the base SF and at a
  * COPIES-times-larger derived corpus, so the "near-linear in corpus
  * size" claim PLANS.md makes is measured, not asserted.
  *
  * The scaled corpus is derived from the driver's own testdata (never
  * synthesized from scratch): each copy offsets the ids and rewrites
  * every token with a copy-suffix, which keeps the per-copy duplicate
  * structure byte-identical while making cross-copy shingles disjoint —
  * the workload grows linearly instead of quadratically, which is the
  * scaling regime the operators are designed for. Query/batch sides stay
  * FIXED (vec_id < 10 probes, doc_id < 100 batch), so the curve isolates
  * corpus growth. `dropped_buckets` observations are reported alongside
  * timings: recall loss under the bucket caps must stay measured.
  */
object ScaleCurve {

  private val Copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt

  /** Chunked scaled-corpus writer (round 18): a single Copies-way union
    * OOMed the single-JVM driver at 2000 branches (every scan branch
    * holds its own parquet read-ahead buffers x 32 task threads), so
    * copies write in groups of <= 64, appending into a staging dir that
    * renames into place only on success — a crashed generation can never
    * masquerade as a complete corpus via a mid-append _SUCCESS. */
  private[tools] def writeGrouped(
      spark: SparkSession, out: String, branch: Int => org.apache.spark.sql.DataFrame,
      copies: Int = Copies): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(out + "__gen")
    fs.delete(tmp, true)
    val groups = (0 until copies).grouped(64).toSeq
    groups.zipWithIndex.foreach { case (g, gi) =>
      val files = math.max(4, 32 * g.size / copies)
      g.map(branch).reduce(_.unionByName(_))
        .repartition(files)
        .write.mode(if (gi == 0) "overwrite" else "append").parquet(tmp.toString)
    }
    // Swap order (round 19, r18 advice): rename the OLD corpus aside
    // before renaming the staging dir into place, deleting it only after
    // the swap succeeds — delete-then-rename could leave NO corpus at
    // all on a rename failure, which the old code's comment wrongly
    // advertised as crash-safe.
    val outPath = new org.apache.hadoop.fs.Path(out)
    val oldAside = new org.apache.hadoop.fs.Path(out + "__old")
    fs.delete(oldAside, true)
    if (fs.exists(outPath))
      require(fs.rename(outPath, oldAside),
        s"scaled-corpus aside-rename $outPath -> $oldAside failed")
    require(fs.rename(tmp, outPath),
      s"scaled-corpus rename $tmp -> $out failed (previous corpus kept at $oldAside)")
    fs.delete(oldAside, true)
  }

  private def scaleDocs(spark: SparkSession, base: String, out: String): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    writeGrouped(spark, s"$out/documents.parquet", i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * (maxId + 1)))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1c$i")))
  }

  /** Scale a keyed relational table: each copy offsets the key so
    * uniqueness (merge keys, DQ uniqueness expectations) is preserved;
    * every other column repeats, so groups stay fixed while rows-per-group
    * grow — the aggregation-scaling regime for the GAB/merge/DQ family. */
  private def scaleKeyed(
      spark: SparkSession, base: String, out: String,
      table: String, keyCol: String): Unit = {
    val df = spark.read.parquet(s"$base/$table.parquet")
    val maxId = df.agg(max(keyCol)).head.getLong(0)
    writeGrouped(spark, s"$out/$table.parquet", i =>
      if (i == 0) df
      else df.withColumn(keyCol, col(keyCol) + lit(i * (maxId + 1))))
  }

  private def scaleEmbeddings(spark: SparkSession, base: String, out: String): Unit = {
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    writeGrouped(spark, s"$out/embeddings.parquet", i =>
      if (i == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(i * (maxId + 1)))
        // Per-copy deterministic SIGN FLIP per dimension: cosine within a
        // copy is untouched (both vectors flip the same dims), cosine
        // across copies decorrelates to ~0 — the embedding analogue of
        // the per-copy token suffix on documents. Without it every vector
        // has Copies-1 exact clones and the true-pair workload grows
        // QUADRATICALLY in Copies, drowning the scaling signal in an
        // adversarial all-clones corpus.
        //
        // r17 fix: the original linear-congruential condition
        // ((i*odd + j*odd) mod 2) collapses to (i+j) parity, so every
        // SAME-parity copy pair shared one flip pattern — exact clones,
        // the quadratic regime the flip exists to prevent (it is exactly
        // the ~250-member near-clique structure the r17 CC anatomy
        // measured on the r16-generated x500 corpus). Murmur3 over
        // (copy, dim) gives independent per-copy patterns. Corpora
        // generated before/after this change are NOT pair-workload
        // comparable; regenerate rather than extend an old corpus.
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            x * when(pmod(hash(lit(i), j), lit(2)) === 0,
              1.0f).otherwise(-1.0f))))
  }

  /** min-of-2 wall seconds + observed dropped buckets for one operator.
    *
    * Forces the EXACT physical plan via `queryExecution.toRdd.count()`
    * rather than `df.count()`: Catalyst rewrites a count — dropping
    * final projections (a rebuild UDF costs nothing under count) and
    * eliminating unique-key left joins — so count-based timings
    * understate any operator whose expensive work lives past the last
    * count-relevant node (measured: q88 span removal read 0.2 s counted
    * vs 21.6 s fully evaluated at the 500x point). toRdd materializes
    * every output row without collecting to the driver. */
  private def time(
      spark: SparkSession,
      run: () => (DataFrame, Option[Observation])): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val (df, obs) = run()
      df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // toRdd forcing never posts the SQL-execution-end event a blocking
      // Observation.get waits on (found the hard way in round 17: the
      // full-family sweep deadlocked on q31's observation) — read the
      // populated metric accumulators straight off the executed plan.
      val dropped = obs.flatMap(_ =>
        org.apache.spark.sql.graft.ObservedMetrics.long(df, "dropped_buckets"))
        .getOrElse(0L)
      // Run-to-run independence (round 17): operators that
      // localCheckpoint intermediates (near-dup auto path, cluster edge
      // lists) leave multi-GB blocks behind; a second run measured
      // against that storage pressure reads 2-4x slower than fresh
      // (q78 CC stage: 6.4 s fresh vs 26.8 s after the pair-gen blocks).
      // Cross-run state an op WANTS to keep lives on disk (parquet), so
      // dropping every persistent block between runs is safe.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (dt, dropped)
    }
    (runs.map(_._1).min, runs.map(_._2).max)
  }

  /** One-off setup for the merge head-to-head: a bucket-partitioned and an
    * unpartitioned copy of `dir`'s orders (bucket count scales with rows,
    * rows-per-bucket ~constant at ~18750) plus a stable one-bucket delta
    * (same keys, bumped price — merging it twice is idempotent, so the
    * min-of-2 timing mutates nothing). Cached on disk per dir. */
  private def mergeTables(spark: SparkSession, dir: String, work: String)
      : (String, String, String) = {
    val pLoc = s"$work/part_tbl"; val fLoc = s"$work/flat_tbl"; val dLoc = s"$work/delta"
    if (!new java.io.File(s"$dLoc/_SUCCESS").exists()) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val buckets = math.max(8L, orders.count() / 18750L)
      val tagged = orders.withColumn("o_bucket",
        pmod(hash(col("o_orderkey")), lit(buckets)).cast("int"))
      tagged.write.partitionBy("o_bucket").mode("overwrite").parquet(pLoc)
      tagged.write.mode("overwrite").parquet(fLoc)
      tagged.where(col("o_bucket") === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        .write.mode("overwrite").parquet(dLoc)
    }
    (pLoc, fLoc, dLoc)
  }

  private def mergeSpec(loc: String): graft.spec.OutputSpec =
    graft.spec.OutputSpec(specId = "m", inputId = "m", writeType = "merge",
      dataFormat = Some("parquet"), location = Some(loc),
      mergeOpts = Some(graft.spec.MergeOptions(
        // pins the partition column — the condition under which the
        // scoped path is semantically equal to the full merge
        mergePredicate =
          "current.o_orderkey = new.o_orderkey and current.o_bucket = new.o_bucket")))

  private def ops(spark: SparkSession, dir: String, idxBase: String)
      : Seq[(String, () => (DataFrame, Option[Observation]))] = {
    import graft.functions.{DedupFunctions, MinhashIndex, SimilarityFunctions}
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Seq(
      "q31_minhash" -> (() => {
        val o = Observation()
        (DedupFunctions.minhashNearDuplicates(docs, "doc_id", "text",
          threshold = 0.4, dropObservation = Some(o)), Some(o))
      }),
      "q115_chunk_dedup" -> (() =>
        (DedupFunctions.chunkDedup(docs, "doc_id", "text", chunkTokens = 5),
          None)),
      "q32_simhash" -> (() => {
        val o = Observation()
        (DedupFunctions.simhashNearDuplicates(docs, "doc_id", "text",
          maxDistance = 3, dropObservation = Some(o)), Some(o))
      }),
      "q39_ann_lsh" -> (() => {
        val e = emb
        (SimilarityFunctions.lshTopK(e, "vec_id", "embedding",
          e.where(col("vec_id") < 10), "vec_id", "embedding",
          dim = 64, k = 5), None)
      }),
      "q50_ann_ivf" -> (() => {
        val e = emb
        (SimilarityFunctions.ivfTopK(e, "vec_id", "embedding",
          e.where(col("vec_id") >= 10 && col("vec_id") < 20), "vec_id", "embedding",
          k = 7, nLists = 16, nProbe = 16), None)
      }),
      // Embedding near-dup + clustering at the ADAPTIVE key width (the
      // round-9 default: rowsPerBand = clamp(ceilLog2(n)+2, 4, 16), so
      // 2k vectors get 13-bit keys and 400k vectors get 16-bit keys —
      // the width the r6 runs set manually via numBits=64). The derived
      // width keeps random collisions per band <= n/4 at every corpus
      // size, so the measured growth reflects the operator as users run
      // it, not a hand-tuned configuration.
      "q40_neardup_auto" -> (() => {
        val o = Observation()
        (SimilarityFunctions.embeddingNearDuplicates(
          emb, "vec_id", "embedding", dim = 64, threshold = 0.3,
          dropObservation = Some(o)), Some(o))
      }),
      // Semantic dedup with the cell width growing with the corpus
      // (target ~20 vectors/cell): measures that the in-cell pair
      // expansion, the centroid aggregation and the dominance join all
      // stay near-linear when cells scale out instead of filling up.
      "q91_semantic_dedup" -> (() => {
        val e = emb
        val bits = math.min(18, math.max(8,
          SimilarityFunctions.ceilLog2(math.max(1L, e.count() / 20L))))
        (SimilarityFunctions.semanticDedup(e, "vec_id", "embedding",
          dim = 64, numBits = bits, simThreshold = 0.3), None)
      }),
      "q78_clusters_auto" -> (() => (
        // the fused operator: verified pairs dedup cross-band on bare
        // (id_a, id_b) rows — score-free distinct — before contraction
        SimilarityFunctions.embeddingClusters(
          emb, "vec_id", "embedding", dim = 64, threshold = 0.3), None)),
      // The CC stage ISOLATED from its pair generator (round 17): the
      // edge list is written to PARQUET once outside the timed closure
      // (disk, not block-manager residency — the realistic pipeline
      // boundary for a persisted pair table), so the measured growth is
      // the clustering itself on a near-dup graph whose component
      // structure replicates per copy.
      "q78_cc_stage" -> {
        lazy val pairsLoc = {
          val p = s"$idxBase/cc78_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
          if (!new java.io.File(s"$p/_SUCCESS").exists())
            SimilarityFunctions.embeddingNearDuplicates(
                emb, "vec_id", "embedding", dim = 64, threshold = 0.3)
              .select("id_a", "id_b").write.mode("overwrite").parquet(p)
          p
        }
        () => (DedupFunctions.duplicateClusters(spark.read.parquet(pairsLoc)), None)
      },
      "q56_cc_stage" -> {
        lazy val pairsLoc = {
          val p = s"$idxBase/cc56_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
          if (!new java.io.File(s"$p/_SUCCESS").exists())
            DedupFunctions.minhashNearDuplicates(
                docs, "doc_id", "text", threshold = 0.4)
              .select("id_a", "id_b").write.mode("overwrite").parquet(p)
          p
        }
        () => (DedupFunctions.duplicateClusters(spark.read.parquet(pairsLoc)), None)
      },
      // Partition-scoped merge head-to-head (round 9): the same one-bucket
      // delta merged into (a) a bucket-partitioned table -> the scoped
      // path rewrites ONE partition dir, and (b) an unpartitioned copy of
      // the same rows -> the full-rewrite fallback. Bucket count grows
      // with the corpus while rows-per-bucket stay ~constant, so at every
      // scale point (a) should cost O(one partition) and (b) O(table) —
      // the measured form of the mergeWrite O(touched) claim.
      "merge_scoped_1part" -> {
        lazy val t = mergeTables(spark, dir, s"$idxBase/${dir.replaceAll("[^a-zA-Z0-9]", "_")}_merge")
        () => {
          graft.io.Writers.write(spark, mergeSpec(t._1), spark.read.parquet(t._3))
          (spark.read.parquet(t._3).limit(1), None)
        }
      },
      "merge_full_table" -> {
        lazy val t = mergeTables(spark, dir, s"$idxBase/${dir.replaceAll("[^a-zA-Z0-9]", "_")}_merge")
        () => {
          graft.io.Writers.write(spark, mergeSpec(t._2), spark.read.parquet(t._3))
          (spark.read.parquet(t._3).limit(1), None)
        }
      },
      // index build is one-off; the timed op is the incremental check,
      // mirroring the bench's own q76 treatment
      "q76_check_batch" -> {
        lazy val idx = MinhashIndex.build(
          docs.where(col("doc_id") >= 100), "doc_id", "text",
          s"$idxBase/${dir.replaceAll("[^a-zA-Z0-9]", "_")}", threshold = 0.4)
        () => (idx.checkBatch(docs.where(col("doc_id") < 100), "doc_id", "text"), None)
      },
      // same treatment for the chunk-hash index: the one-off build is
      // untimed, the batch anti-join + reassembly is the measured op.
      // The build also reports the index artifact's on-disk size against
      // the corpus text bytes — the unbounded-growth question a persisted
      // 100 TB index must answer (hash-only rows: ~32 B per DISTINCT
      // corpus chunk, so the artifact is a measured fraction of corpus
      // size and dedup-compresses with the corpus's own repetition).
      "q116_chunk_check_batch" -> {
        lazy val chunkIdxPath = {
          val p = s"$idxBase/chunk_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
          val corpus = docs.where(col("doc_id") >= 100)
          DedupFunctions.chunkHashIndex(corpus, "doc_id", "text", chunkTokens = 5)
            .write.mode("overwrite").parquet(p)
          val idxBytes = Option(new java.io.File(p).listFiles())
            .map(_.filter(_.isFile).map(_.length).sum).getOrElse(0L)
          val textBytes = corpus.agg(sum(length(col("text")))).head.getLong(0)
          val idxRows = spark.read.parquet(p).count()
          println(s"[scale-curve] chunk_index $dir rows=$idxRows " +
            s"bytes=$idxBytes corpus_text_bytes=$textBytes " +
            f"ratio=${idxBytes.toDouble / textBytes}%.3f")
          p
        }
        () => (DedupFunctions.chunkDedupAgainstIndex(
          docs.where(col("doc_id") < 100), spark.read.parquet(chunkIdxPath),
          "doc_id", "text", chunkTokens = 5), None)
      })
  }

  /** Catalog queries that read ONLY documents.parquet or
    * embeddings.parquet — the rest of the training-data pipeline, timed
    * as-is on both corpus sizes. */
  private val catalogFamily = Seq(
    "q30_dedup_exact", "q33_ngram_jaccard", "q34_text_quality",
    "q35_lang_id", "q58_sequence_pack", "q60_distinctive_terms",
    "q66_contamination", "q69_vocabulary", "q75_repetition_metrics",
    "q77_curation_pipeline",
    // GAB / merge / DQ / range-join family over the scaled orders +
    // customer tables (round-6 addition: the relational operators get
    // measured growth factors, not just the dedup/ANN family)
    "q25_window_cadence", "q27_merge_upsert", "q29_gab_cadence",
    "q44_range_join", "q51_dq_summary", "q72_gab_week_sunday_snapshot",
    // round-10 additions: data selection, tokenizer training, PQ/IVFADC
    // (query sides fixed at vec_id < 5, so the curve isolates the corpus
    // scan; q108's centroid collect is bounded by the 16 LSH cells at
    // any corpus size)
    "q105_importance_weights", "q106_bpe_pair_stats", "q107_pq_adc",
    "q108_ivfpq_adc",
    // round-11 additions: the multi-k span-removal cascade (two full
    // single-k passes over progressively cleaned text) and the streaming
    // IVFADC ingest batch face (fixed 20-vector batch screened + encoded
    // against the corpus-derived store — the curve isolates the corpus
    // side: centroids, store codes, and the store-identity screen join)
    "q112_span_cascade", "q113_pq_ingest_batch",
    // round-16 additions: the documents/embeddings-family queries the
    // table hadn't yet measured — multi-probe ANN (query-side growth
    // only), containment + edit-distance near-dup, single-k span
    // removal, CCNet perplexity filter, the curation-v2 chain and vocab
    // encoding
    // (q96 containment is NOT here: its catalog query fixes doc_id < 300,
    // so corpus growth never touches it — a flat row would be vacuous)
    "q79_ann_multiprobe", "q110_edit_distance_pairs",
    "q88_remove_spans", "q90_lm_perplexity", "q98_curation_v2",
    "q101_vocab_encode",
    // round-18 addition: top repeated spans (never scaled before its
    // fingerprint-first rewrite; the operator is EAGER at build, so the
    // timed closure includes its checkpoint + threshold jobs)
    "q87_top_spans",
    // round-17 additions: the full cluster queries (pair generation +
    // GraphX CC end-to-end; the isolated CC stages live in ops above)
    "q56_dedup_clusters", "q57_clusters_exact")

  /** Measured LSH pair-recall on a ~500-vector sample of `dir`'s corpus:
    * brute-force the sample's true cos≥threshold pairs, run the banded
    * operator on the same sample, report |caught| / |true|. Pair recall
    * depends only on the two signatures, so sampling is unbiased; this
    * turns the SCALING claim "LSH recall, not the candidate join, bounds
    * the output" into a number. */
  private def lshRecallSample(
      spark: SparkSession, dir: String, numBits: Int, threshold: Double)
      : (Long, Long, Double) = {
    import graft.functions.SimilarityFunctions
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = math.max(1L, emb.count() / 500L)
    // hash-based pick: a plain modulus interacts with the copy-offset id
    // structure and samples the same few ORIGINAL vectors in every copy
    val sample = emb.where(pmod(hash(col("vec_id")), lit(k)) === 0).localCheckpoint()
    val a = sample.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = sample.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val truePairs = a.join(b, col("id_a") < col("id_b"))
      .where(SimilarityFunctions.cosine(col("va"), col("vb")) >= threshold)
      .select("id_a", "id_b")
    val caught = SimilarityFunctions.embeddingNearDuplicates(
        sample, "vec_id", "embedding", dim = 64, threshold = threshold,
        numBits = numBits, numBands = 4)
      .select("id_a", "id_b")
    val nTrue = truePairs.count()
    val nCaught = truePairs.join(caught, Seq("id_a", "id_b"), "left_semi").count()
    (nTrue, nCaught, if (nTrue == 0) 1.0 else nCaught.toDouble / nTrue)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft-scale-${ProcessHandle.current().pid()}")
    val scaled = s"$work/x$Copies"
    val spark = graft.exec.ExecEnv.getOrCreate(
      appName = "graft-scale-curve",
      master = Some(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"),
      confs = Map(
        "spark.sql.shuffle.partitions" -> sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
        "spark.ui.enabled" -> "false"))
    // Reuse an already-generated scaled corpus (same dir + copies):
    // generation is the expensive one-off, the timings are the point.
    // SPARK_GRAFT_SCALE_TABLES limits which tables get scaled — a
    // documents-only 500× run shouldn't pay for 75M scaled orders rows.
    val tables = sys.env.getOrElse("SPARK_GRAFT_SCALE_TABLES",
      "documents,embeddings,orders,customer").split(',').map(_.trim).toSet
    if (tables("documents") &&
        !new java.io.File(s"$scaled/documents.parquet/_SUCCESS").exists())
      scaleDocs(spark, base, scaled)
    if (tables("embeddings") &&
        !new java.io.File(s"$scaled/embeddings.parquet/_SUCCESS").exists())
      scaleEmbeddings(spark, base, scaled)
    if (tables("orders") &&
        !new java.io.File(s"$scaled/orders.parquet/_SUCCESS").exists())
      scaleKeyed(spark, base, scaled, "orders", "o_orderkey")
    if (tables("customer") &&
        !new java.io.File(s"$scaled/customer.parquet/_SUCCESS").exists())
      scaleKeyed(spark, base, scaled, "customer", "c_custkey")
    val nDocs = spark.read.parquet(s"$scaled/documents.parquet").count()
    // Heap protocol pin (round 19): the r18 ledger measured a 48g
    // single-JVM heap reading shuffle-heavy families at 4.5-6.5x their
    // 32g values (oversized heaps defer spilling into giant in-memory
    // TimSorts whose full GCs dominate), so rows taken off-protocol are
    // NOT comparable. Every SCALE JSON records the heap; a run outside
    // the 32g pin warns loudly.
    val heapMaxMb = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getMax / 1048576
    if (heapMaxMb < 28000 || heapMaxMb > 36000)
      println(s"[scale-curve] WARNING: heap_max_mb=$heapMaxMb is OFF the " +
        "32g ledger protocol (SPARK_DRIVER_MEM=32g) — rows from this run " +
        "are not comparable to the canonical ledger (see PLANS.md)")

    val catalog = graft.SparkEntry.queries
    // SPARK_GRAFT_SCALE_ONLY: comma-separated substring filter on op
    // names, so a single added row doesn't force re-timing the table.
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String) = only.forall(_.exists(name.contains))
    val sections = Seq("base" -> base, s"x$Copies" -> scaled).map { case (tag, dir) =>
      val rows = ops(spark, dir, s"$work/idx").filter(o => selected(o._1))
        .map { case (name, run) =>
        val (sec, dropped) = time(spark, run)
        println(s"[scale-curve] $tag $name ${f"$sec%.2f"}s dropped=$dropped")
        s""""$name":{"sec":$sec,"dropped_buckets":$dropped}"""
      } ++ catalogFamily.filter(selected).map { name =>
        val (sec, _) = time(spark, () => (catalog(name)(spark, dir), None))
        println(s"[scale-curve] $tag $name ${f"$sec%.2f"}s")
        s""""$name":{"sec":$sec}"""
      }
      s""""$tag":{${rows.mkString(",")}}"""
    }
    val recallJson = if (sys.env.get("SPARK_GRAFT_SCALE_RECALL").contains("true")) {
      val (nTrue, nCaught, recall) = lshRecallSample(spark, scaled, 64, 0.3)
      println(f"[scale-curve] x$Copies lsh_recall_sample $recall%.3f ($nCaught/$nTrue)")
      s""","lsh_recall":{"true_pairs":$nTrue,"caught":$nCaught,"recall":$recall}"""
    } else ""
    println(s"""{"metric":"scale_curve","copies":$Copies,"scaled_docs":$nDocs,"heap_max_mb":$heapMaxMb,${sections.mkString(",")}$recallJson}""")
    spark.stop()
  }
}
