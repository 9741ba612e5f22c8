package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators: deterministic sampling and source
  * mixing, fixed-budget sequence packing, and distinctive-term
  * extraction.
  *
  * Everything here is reproducible pure arithmetic — no RNG state, no
  * driver-side loops — so results are identical across engines, runs and
  * partitionings, and every operator parallelizes trivially at 100 TB.
  */
object TrainingData {

  /** Knuth's multiplicative-hash constant (2^32 / phi). */
  private val HashMultiplier = 2654435761L
  private val HashBuckets = 1000000L

  /** Deterministic hash sample: keep rows whose multiplicative key hash
    * lands below `fraction` of the bucket space. Embarrassingly parallel
    * (a map-side filter, no shuffle, no RNG), stable across re-runs, and
    * disjoint samples can be drawn with different salts. */
  def hashSample(df: DataFrame, key: Column, fraction: Double, salt: Long = 0L): DataFrame =
    df.where(
      pmod((key.cast("long") + salt) * HashMultiplier, lit(HashBuckets)) <
        math.round(fraction * HashBuckets))

  /** Weighted mix of sources: hash-sample each source at its weight and
    * union by name — the standard "data mixing" step of a pre-training
    * pipeline, as a pure map-side plan. */
  def mixSources(sources: Seq[(DataFrame, Double)], keyCol: String, salt: Long = 0L): DataFrame =
    sources.map { case (df, w) => hashSample(df, col(keyCol), w, salt) }
      .reduce(_.unionByName(_))

  /** Shard the corpus into size-bounded training shards with a manifest —
    * the export stage of a curation pipeline (the parquet analogue of
    * webdataset-style sharding): rows are globally ordered by `idCol`
    * (deterministic shard membership across runs), cut into shards of
    * `rowsPerShard`, written hive-partitioned by shard id, and described
    * by a manifest table (one row per shard: row count + id span) the
    * training loader can consume without listing data files.
    *
    * The global rank is the distributed zipWithIndex shape (range
    * partition + in-partition sort, then per-partition counts + offsets —
    * no single-partition window), so sharding 100 TB is as parallel as
    * the sort. Returns the manifest.
    *
    * @return manifest (shard, n_rows, min_id, max_id), also written to
    *         `outDir/manifest`
    */
  def writeShards(
      df: DataFrame, idCol: String, outDir: String,
      rowsPerShard: Long, sortPartitions: Int = 0): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    val spark = df.sparkSession
    val parts = if (sortPartitions > 0) sortPartitions
      else spark.sparkContext.defaultParallelism.max(1)
    val ordered = df.repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
    val schema = ordered.schema.add("__rank", org.apache.spark.sql.types.LongType,
      nullable = false)
    val ranked = spark.createDataFrame(
      ordered.rdd.zipWithIndex.map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
      }, schema)
    val sharded = ranked
      .withColumn("shard", (col("__rank") / lit(rowsPerShard)).cast("long"))
      .drop("__rank")
    sharded.write.partitionBy("shard").mode("overwrite")
      .parquet(s"${outDir.stripSuffix("/")}/data")
    // partition-dir inference surfaces `shard` as int; pin it back to long
    val manifest = spark.read
      .parquet(s"${outDir.stripSuffix("/")}/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .orderBy(col("shard"))
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"${outDir.stripSuffix("/")}/manifest")
    spark.read.parquet(s"${outDir.stripSuffix("/")}/manifest")
  }

  /** Temperature-scaled mixture rates: the standard multilingual /
    * multi-source rebalancing formula (sampling probability proportional
    * to count^alpha, alpha in (0, 1] — alpha 1 = natural proportions,
    * alpha -> 0 = uniform across sources; "Unsupervised Cross-lingual
    * Representation Learning at Scale", Conneau et al. 2020, §3). For a
    * target corpus size `nTarget`, each source's per-row keep rate is
    * min(1, nTarget * weight / count). One count aggregation (narrow
    * shuffle on the source key); feed the rates into [[hashSample]] /
    * [[mixSources]] for the actual draw.
    *
    * @return (source, n_rows, weight, rate) — weights sum to 1
    */
  def temperatureMixRates(
      df: DataFrame, sourceCol: String, alpha: Double,
      nTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(
      sum(pow(col("n_rows").cast("double"), lit(alpha)))).head().getDouble(0)
    counts.select(col("source"), col("n_rows"),
      (pow(col("n_rows").cast("double"), lit(alpha)) / lit(total)).as("weight"))
      .withColumn("rate",
        least(lit(1.0), lit(nTarget.toDouble) * col("weight") / col("n_rows")))
  }

  /** Fixed-budget sequence packing: within each shard, documents fill
    * context windows of `tokenBudget` tokens in id order; a document's
    * pack is `floor(tokens-before-it / budget)` (prefix-sum packing, so
    * a document may straddle a boundary — the deterministic, one-window
    * formulation used to batch corpora for training).
    *
    * Sharding bounds the window state: each shard's prefix sum is an
    * independent partition of the window shuffle, so packing 100 TB is
    * `nShards`-way parallel, not one global sort.
    *
    * @return one row per (shard, pack_id): n_docs, pack_tokens, doc span
    */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Int, nShards: Int): DataFrame = {
    // Two-level prefix sum. A single window partitioned by shard caps
    // parallelism at nShards (typically single digits): every shard's
    // full row set lands in ONE task that sorts and scans it — the
    // measured q77 bottleneck at 500x corpus scale. Bucketing doc ids
    // restores parallelism while keeping the EXACT same cumulative sums:
    //   cum_before(row) = bucket_offset(shard, bucket) + within-bucket
    //                     prefix sum ordered by id
    // where bucket offsets come from a window over the per-bucket totals
    // — a frame ~BucketWidth times smaller than the data. Both remaining
    // data-sized shuffles carry only (id, n_tokens, shard, bucket).
    val BucketWidth = 4096L
    val narrow = df.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"),
      floor(col(idCol).cast("long") / BucketWidth).as("__bucket"))
    val bucketTotals = narrow.groupBy(col("shard"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("__bucket_tokens"))
    val wb = Window.partitionBy(col("shard")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.withColumn("__bucket_offset",
      coalesce(sum(col("__bucket_tokens")).over(wb), lit(0L)))
      .select(col("shard"), col("__bucket"), col("__bucket_offset"))
    val wl = Window.partitionBy(col("shard"), col("__bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    narrow
      .withColumn("__local_before", coalesce(sum(col("n_tokens")).over(wl), lit(0L)))
      .join(broadcast(offsets), Seq("shard", "__bucket"))
      .withColumn("cum_before", col("__bucket_offset") + col("__local_before"))
      .withColumn("pack_id", floor(col("cum_before") / tokenBudget))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
  }

  /** Sliding-window document chunking: split each document's tokens
    * into fixed-size chunks of `chunkTokens` with `overlapTokens` of
    * context carried between consecutive chunks (stride =
    * chunkTokens - overlapTokens) — the standard long-document
    * preparation for a bounded-context model, distinct from
    * [[packSequences]] (which BINS whole short documents into budgeted
    * packs). Chunk count per doc is `max(1, ceil((n - overlap) /
    * stride))`, so every document emits at least one chunk and no
    * trailing chunk is empty. One narrow projection + explode: no
    * shuffle, scales with the corpus scan. */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap ($overlapTokens) < chunk size ($chunkTokens)")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol),
        TextFunctions.whitespaceTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__chunks", greatest(lit(1),
        ceil((col("__n") - lit(overlapTokens)).cast("double") / stride).cast("int")))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__chunks") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong),
          (col("__n") - col("chunk_id") * stride).cast("long")).as("n_tokens"))
  }

  /** Symmetric int8 quantization stats for an embedding column: per
    * vector, the max-abs scale (`max|v| / 127`) and the worst-case
    * reconstruction error after quantize/dequantize with round-half-up
    * (`floor(x/scale + 0.5)` — floor, not round(), so half-way cases are
    * identical across engines; every op is exact IEEE double arithmetic,
    * making the output hash-comparable to a SQL oracle).
    *
    * This is the storage-shrink step of an embedding pipeline (4x smaller
    * vectors for ANN recall screening); the stats quantify the quality
    * loss per vector. Zero vectors (scale 0) are excluded — quantization
    * is undefined for them.
    */
  def int8QuantizationStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = col(vecCol)
    val m = array_max(transform(x, e => abs(e.cast("double"))))
    val scale = m / 127.0d
    // Fence the scale derivation: without it CollapseProject +
    // PushDownPredicates inline the O(dim) HOF into the filter AND both
    // downstream uses — three evaluations per row instead of one.
    graft.util.PlanBarrier.fence(
        df.select(col(idCol), x.as("v"), scale.as("scale")))
      .where(col("scale") > 0)
      .select(col(idCol), col("scale"),
        array_max(transform(col("v"), e =>
          abs(e.cast("double") -
            floor(e.cast("double") / col("scale") + 0.5d) * col("scale"))))
          .as("max_abs_err"))
  }

  /** Deterministic train/validation/test split: assign each row a split
    * label by where its multiplicative key hash lands in the cumulative
    * fraction ranges. Pure map-side arithmetic — no RNG, no shuffle — so
    * the assignment is stable across runs, engines and partitionings,
    * and disjoint by construction (each bucket maps to exactly one
    * split). The standard way to split a 100 TB corpus: a row's split is
    * a function of its id alone, so late-arriving data lands in the same
    * split without global coordination.
    *
    * @param splits ordered (name, fraction) pairs; fractions must sum to 1
    */
  def hashSplit(
      df: DataFrame, key: Column, splits: Seq[(String, Double)],
      salt: Long = 0L): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = pmod((key.cast("long") + salt) * HashMultiplier, lit(HashBuckets))
    val cutoffs = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * HashBuckets))
    // The last split is the CASE's ELSE branch (mirroring the SQL oracle):
    // a NULL / non-castable key falls through every `bucket < cut` test, so
    // without the otherwise() it would get a NULL label and silently break
    // the "every row belongs to exactly one split" contract.
    val labeled = splits.init.zip(cutoffs.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cut)) =>
        val cond = bucket < cut
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split", labeled)
  }

  /** Exact per-stratum sample: the first `nPerStratum` rows of each
    * stratum in deterministic hash order (multiplicative hash of the key,
    * key as tie-break). One rank window partitioned by the strata — the
    * shuffle is on the strata key, and only the sampled rows survive.
    * Equivalent to a seeded shuffle + LIMIT per group, but reproducible
    * across engines and runs. */
  def stratifiedSample(
      df: DataFrame, strata: Seq[String], key: Column, nPerStratum: Int,
      salt: Long = 0L): DataFrame = {
    val bucket = pmod((key.cast("long") + salt) * HashMultiplier, lit(HashBuckets))
    val w = Window.partitionBy(strata.map(col): _*).orderBy(bucket, key)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nPerStratum)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum (Efraimidis &
    * Spirakis 2006): each row draws a deterministic uniform u from a
    * 60-bit md5 of its id and competes on the exponential key
    * ln(u)/weight — the top-k keys per stratum are a bona fide weighted
    * sample without replacement, with heavier rows proportionally more
    * likely to win. No RNG state: the same corpus always yields the same
    * sample, and the SQL oracle reproduces u bit-for-bit from the same
    * md5 arithmetic.
    *
    * Scale shape: the per-stratum selection runs through the k-bounded
    * [[graft.functions.TopKAggregator]] (map-side partial top-k), so only
    * ~k rows per stratum per input partition reach the shuffle — a giant
    * stratum never sorts, unlike the rank-window formulation. Weights
    * must be strictly positive.
    *
    * @return (strata, id, rnk) — rnk 1..k best-first within each stratum
    */
  def weightedSample(
      df: DataFrame, idCol: String, strataCol: String, weightCol: Column,
      k: Int): DataFrame = {
    val u = (conv(substring(md5(
        concat(lit("ws-"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit(1.152921504606846976e18)
    val esKey = log(u) / weightCol.cast("double")
    df.select(col(strataCol).as("strata"), col(idCol).as("id"), esKey.as("es_key"))
      .groupBy(col("strata"))
      .agg(graft.functions.TopKAggregator.topK(k, col("id"), col("es_key")).as("top"))
      .select(col("strata"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("strata"), col("s.neighbor_id").as("id"),
        (col("i") + 1).cast("long").as("rnk"))
  }

  /** Benchmark decontamination: for every corpus document, the number of
    * its distinct word n-grams that appear in ANY benchmark document
    * (`contamination` = shared / total, in [0, 1]; filter on it to drop
    * contaminated training docs).
    *
    * Plan shape for a 100 TB corpus vs a ~MB benchmark suite: the
    * benchmark gram SET is distinct-ed (bounded by the benchmark's
    * vocabulary, not the corpus) and BROADCAST, so the corpus side is a
    * map-side explode + broadcast-hash left join; the only corpus
    * shuffle is the per-doc count aggregation, which map-side combines.
    */
  def contamination(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // Gram derivation is a tight-loop kernel (the HOF shingle chain is
    // CodegenFallback — interpreted per shingle), and MUST stay fenced
    // before the explode: without the barrier Catalyst inlines the
    // derived array into the Generate's inferred filters and evaluates
    // the whole gram pipeline per consumer (measured 30x slower at sf0.1).
    val grams: Column = graft.functions.Kernels.distinctShingles(col(textCol), n)
    val benchGrams = graft.util.PlanBarrier.fence(bench.select(grams.as("gs")))
      .select(explode(col("gs")).as("g"))
      .distinct().withColumn("__hit", lit(1L))
    val corpusGrams = graft.util.PlanBarrier.fence(
      corpus.select(col(idCol).as("id"), grams.as("gs")))
    corpusGrams.select(col("id"), explode(col("gs")).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("shared_grams"))
      .withColumn("contamination",
        col("shared_grams").cast("double") / col("n_grams"))
  }

  /** Gopher-style quality-filter flags per document (Rae et al. 2021
    * §A1.1 heuristics, the pre-training corpus gate): word count bounds,
    * mean word length bounds, alphabetic-word ratio, plus a type-token
    * (distinct-word) ratio for degenerate-repetition screening. Pure
    * per-row projections — map-side, no shuffle, exact integer-ratio
    * arithmetic so a SQL oracle matches bit-for-bit.
    */
  def qualityFlags(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaRatio: Double = 0.8,
      keep: Seq[String] = Nil): DataFrame = {
    // One tight-loop pass per row (r19; guide §4 "eliminate non-codegen
    // expressions in the hot path"): the previous formulation walked the
    // token array through four separate CodegenFallback HOF chains
    // (aggregate, transform, filter+rlike, array_distinct) — interpreted,
    // with per-element boxing — measured ~0.6 s of q77's gate stage at
    // sf0.1. Values are identical by construction (Kernels.qualityStats
    // scaladoc). The fence pins ONE kernel evaluation: a caller's filter
    // on the flags would otherwise push below the field extraction and
    // re-run the UDF per consumer (PlanAuditSpec gates the class).
    // `keep` passes source columns through so a caller gating on the
    // flags doesn't need a second corpus scan + self-join.
    graft.util.PlanBarrier.fence(
        df.select(col(idCol) +: keep.map(col) :+
          graft.functions.Kernels.qualityStats(col(textCol)).as("__qs"): _*))
      .select(col(idCol) +: keep.map(col) :+
        col("__qs._1").as("n_words") :+ col("__qs._2").as("mean_word_len") :+
        col("__qs._3").as("alpha_word_ratio") :+
        col("__qs._4").as("distinct_word_ratio"): _*)
      .withColumn("passes_gopher",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("alpha_word_ratio") >= minAlphaRatio)
  }

  /** Within-document repetition metrics (the Gopher/C4 repetition
    * screens): the share of the most frequent word n-gram and the
    * duplicated-gram fraction (1 - distinct/total). Plan shape: the gram
    * multiset comes from a fenced tight-loop kernel, grams explode into
    * ONE hash aggregation keyed by (doc, gram) with map-side combine,
    * then a doc-sized rollup — both shuffles are on the doc id, so the
    * operator partitions cleanly at any corpus size.
    */
  def repetitionMetrics(
      df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val grams = graft.util.PlanBarrier.fence(
      df.select(col(idCol).as("id"),
        graft.functions.Kernels.allShingles(col(textCol), n).as("gs")))
    grams.select(col("id"), explode(col("gs")).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("total_grams"), max(col("c")).as("__top"),
        count(lit(1)).as("__distinct"))
      .select(col("id"), col("total_grams"),
        (col("__top").cast("double") / col("total_grams")).as("top_gram_share"),
        ((col("total_grams") - col("__distinct")).cast("double") / col("total_grams"))
          .as("dup_gram_fraction"))
  }

  /** Global vocabulary with frequencies: one row per distinct lowercased
    * whitespace token, with total occurrences, document frequency, and a
    * deterministic rank (count desc, term asc), truncated to the top `k`.
    *
    * The corpus-sized work is the two hash aggregations (map-side
    * combined); the rank window runs over the |vocab|-sized aggregate —
    * orders of magnitude smaller than the corpus — so the single-
    * partition window is a non-issue at any corpus scale (vocabulary
    * grows sublinearly; cap with a pre-filter on n_occurrences if not).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = df.select(col(idCol).as("id"),
      explode(TextFunctions.whitespaceTokens(lower(col(textCol)))).as("term"))
    val stats = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("id")).as("n_docs"))
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject: map-side
    // partial top-k, no global sort to one partition), THEN rank the k
    // survivors — the unpartitioned window runs over k rows, not the
    // whole vocabulary (at 100 TB the raw term-stats table is millions
    // of rows; ranking it globally was the plan's one single-partition
    // stage)
    val w = Window.orderBy(col("n_occurrences").desc, col("term").asc)
    stats.orderBy(col("n_occurrences").desc, col("term").asc).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Top-k distinctive terms per document, scored by tf * N / df (the
    * log-free tf-idf variant: exact integer ratios in double, so the
    * score is bit-identical across engines). Ties break on the term
    * itself for a deterministic ranking.
    *
    * Plan shape: explode tokens -> two hash aggregations (term frequency
    * per doc, document frequency per term) -> broadcast-friendly join on
    * term -> per-doc rank window. The doc-frequency side is |vocab|-sized
    * — orders of magnitude smaller than the corpus.
    */
  def distinctiveTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val nDocs = df.count()
    val terms = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.whitespaceTokens(lower(col(textCol)))).as("term"))
    // Materialized: the (id, term) grid feeds BOTH the document-frequency
    // rollup and the score join — without the checkpoint each consumer
    // re-ran the tokenize+explode corpus scan, and df additionally paid a
    // countDistinct Expand over the raw token stream. Deriving df from
    // the grid is exact (one row per (id, term), so count(*) per term ==
    // countDistinct(id) over raw tokens) and turns the second corpus
    // pass into a small rollup of the staged grid (r19; guide §2.3
    // "aggregate before you shuffle" + §5 lineage truncation).
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      // lazy (r20): both consumers live in the final plan — the first
      // action materializes the grid without a dedicated checkpoint job
      .localCheckpoint(false)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf") * nDocs / col("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("id"), col("term"), col("score"), col("rnk"))
  }
}
