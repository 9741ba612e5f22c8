package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure Column expressions (whole-stage-codegen friendly,
  * no UDFs) so they scale linearly with partitions: per-row work only, no
  * shuffles, no driver collects. Capability superset of the reference's
  * text handling (the reference exposes the Spark scalar surface through
  * expression transformers — `lakehouse_engine/transformers/column_reshapers.py:180-204`).
  */
object TextFunctions {

  /** Small English stopword list used for quality scoring / lang-ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it",
      "for", "on", "as", "with", "was", "at", "by", "this", "be", "are")

  /** Language marker regexes: language -> word-boundary alternation.
    * Kept RE2-compatible (the DuckDB oracle mirrors these patterns). */
  val LanguageMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|for|was)\\b",
    "de" -> "\\b(der|die|das|und|nicht|ist|ich|ein|mit|sich)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|que|pour|dans|pas)\\b",
    "es" -> "\\b(el|los|las|que|y|es|una|por|para|con)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]"
  )

  /** Non-empty whitespace tokens (single-space tokenizer, mirrors the
    * oracle's `string_split(text, ' ')`). */
  def whitespaceTokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(whitespaceTokens(c))

  /** BPE-ish token count: runs of alphanumerics plus single punctuation
    * marks, the usual pre-tokenization shape of byte-pair encoders. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      length(regexp_replace(c, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / length(c))
      .otherwise(lit(0.0))

  /** Ratio of digit characters to total characters. */
  def digitRatio(c: Column): Column =
    when(length(c) > 0,
      length(regexp_replace(c, "[^0-9]", "")).cast("double") / length(c))
      .otherwise(lit(0.0))

  /** Fraction of tokens that are (lowercased) English stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = whitespaceTokens(c)
    when(size(toks) > 0,
      size(filter(toks, t => lower(t).isInCollection(EnglishStopwords))).cast("double")
        / size(toks))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def avgTokenLen(c: Column): Column = {
    val toks = whitespaceTokens(c)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic language ID: count marker-word hits per language, pick the
    * argmax (first language in [[LanguageMarkers]] order wins ties; "und"
    * when no marker fires at all). */
  def languageId(c: Column): Column = {
    val scores = LanguageMarkers.map { case (lang, re) =>
      lang -> size(regexp_extract_all(c, lit(re), lit(0)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Content fingerprint: md5 of case-folded, whitespace-normalized text.
    * Stable under reflow/case changes — the cheap exact-near-dup key. */
  def fingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** Email pattern, deliberately RE2-compatible (no lookaround, no
    * backreferences) so the identical regex runs under java.util.regex
    * (Spark) and RE2-based engines with the same matches. */
  val EmailRegex: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII redaction for training corpora: mask email addresses, then any
    * remaining run of 4+ digits (phone/account/ssn-ish). Codegen'd
    * regexp_replace — a map-side projection, no UDF. Order matters:
    * emails first, so their digits don't get half-masked as numbers. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRegex, "<EMAIL>"),
      "[0-9]{4,}", "<NUM>")

  /** Corpus-LM negative log-likelihood per document — the scoring stage of
    * CCNet-style perplexity filtering ("CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", Wenzek et al. 2020), with
    * the unigram model trained on the corpus itself. `nll` is the mean
    * negative natural-log probability of the document's tokens (the log of
    * its per-token perplexity); natural text scores low, keyboard-mash and
    * rare-token soup score high.
    *
    * Scale shape (the same at any n-gram order — only the count key
    * widens): one shuffle builds the token count table, the score join
    * re-shuffles the token stream on the same key (the count side reuses
    * its partitioning), one narrow shuffle aggregates per doc. The corpus
    * token total is a 1-row driver aggregate. No driver-side vocabulary,
    * no broadcast of the (at web scale, multi-GB) count table.
    *
    * Documents with zero tokens have no defined perplexity and are absent
    * from the output. `nll` is rounded (default 4 decimals) because the
    * per-doc mean is a float reduction whose summation order is
    * engine-dependent.
    *
    * @return (id, n_tokens, nll)
    */
  def unigramNll(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      roundTo: Int = 4): org.apache.spark.sql.DataFrame = {
    // Materialized LAZILY (r20): the count build and the score join both
    // consume the token stream; without the checkpoint the tokenize chain
    // runs twice, and with an EAGER one the materialization was a whole
    // extra job — the corpus-total aggregate below is the first action
    // and persists the blocks in the same pass. (r19: a fenced tight-loop
    // tokens kernel was measured against this HOF form — interleaved
    // min-of-6 parity, the stage is scan-dominated — so the
    // codegen-composable Column form stays.)
    val toks = df.select(col(idCol).as("id"),
      explode(whitespaceTokens(col(textCol))).as("tok"))
      .localCheckpoint(false)
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val n = counts.agg(sum(col("c"))).head().getLong(0).toDouble
    toks.join(counts, "tok")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(log(col("c").cast("double") / lit(n))), roundTo).as("nll"))
  }

  /** Bigram conditional NLL per document — the order-2 instance of the
    * [[unigramNll]] shape (the count key widens to the token pair; the
    * conditional denominator c1(w1) is the pair table re-aggregated, not
    * a second corpus pass). nll = mean over adjacent pairs of
    * -ln(c2(w1,w2) / c1(w1·)), unsmoothed MLE — every observed pair has
    * positive probability by construction. Documents with fewer than two
    * tokens are absent (no bigram events).
    *
    * @return (id, n_bigrams, nll)
    */
  def bigramNll(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      roundTo: Int = 4): org.apache.spark.sql.DataFrame = {
    // Pair emission is a fused tight-loop kernel (r19): the
    // transform(sequence(...), struct(element_at ...)) chain was
    // CodegenFallback — interpreted per pair with boxing
    // (Kernels.bigramPairs emits identical pairs; docs with < 2 tokens
    // yield an empty array the explode drops, exactly the old size
    // guard). Fenced against Generate/Project re-evaluation. Then
    // materialized: both the count build and the score join consume the
    // pair stream; without this the tokenize+pair chain runs twice.
    val pairs = graft.util.PlanBarrier.fence(
        df.select(col(idCol).as("id"),
          Kernels.bigramPairs(col(textCol)).as("ps")))
      .select(col("id"), explode(col("ps")).as("p"))
      .select(col("id"), col("p._1").as("w1"), col("p._2").as("w2"))
      // lazy (r20): both the count build and the score join live in the
      // consumer's one plan — the first action materializes the pair
      // blocks without the eager form's dedicated checkpoint job
      .localCheckpoint(false)
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-avg(log(col("c2").cast("double") / col("c1").cast("double"))),
          roundTo).as("nll"))
  }

  /** CCNet's head/middle/tail partition (Wenzek et al. 2020 §4.3): within
    * each stratum (language, in the paper), rank documents by ascending
    * NLL and cut into `buckets` rank-equal groups — "head" is the most
    * natural text, "tail" the least; downstream pipelines keep head+middle
    * or sample per bucket. Rank ties resolve by id, so the split is
    * deterministic and engine-reproducible (ntile over an explicit total
    * order). One stratum-keyed window over the (id, nll) score table —
    * document text never enters the shuffle.
    *
    * @return (id, strata, n_tokens, nll, bucket) — bucket 1..`buckets`
    */
  def perplexityBuckets(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      strataCol: String,
      textCol: String,
      buckets: Int = 3): org.apache.spark.sql.DataFrame = {
    val scored = unigramNll(df, idCol, textCol)
      .join(df.select(col(idCol).as("id"), col(strataCol).as("strata")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("strata")).orderBy(col("nll"), col("id"))
    scored.select(col("id"), col("strata"), col("n_tokens"), col("nll"),
      ntile(buckets).over(w).cast("long").as("bucket"))
  }

  /** Word-level vocabulary encoding — the tokenize-to-ids stage of a
    * training pipeline, with the vocabulary derived from the corpus:
    * the `vocabSize` most frequent tokens get ids 1..vocabSize (rank by
    * count desc, token asc — deterministic), everything else encodes as
    * 0 (OOV). Output is the first `maxTokens` ids per document as a
    * '-'-joined string (engine-stable; no float or array comparisons).
    *
    * Scale shape: token counts are one shuffle; the global rank window
    * runs AFTER the top-`vocabSize` cut, so it orders a bounded table
    * (vocabSize rows), and the id mapping joins back broadcast. The
    * per-doc reassembly shuffles (id, pos, vid) triples once.
    *
    * @return (id, n_tokens, ids)
    */
  def vocabEncode(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int = 1000,
      maxTokens: Int = 32): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode(whitespaceTokens(col(textCol))).as(Seq("pos", "tok")))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
    val vocab = top.withColumn("vid",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("tok"))).cast("long"))
      .select(col("tok"), col("vid"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("id"), col("pos"), coalesce(col("vid"), lit(0L)).as("vid"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws("-", slice(transform(
          array_sort(collect_list(struct(col("pos"), col("vid")))),
          s => s.getField("vid").cast("string")), 1, maxTokens)).as("ids"))
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * the mixture diagnostic for multi-source corpora: KL(p_source ||
    * p_corpus) = Σ_t p_s(t) · ln(p_s(t) / p_c(t)). A source of generic
    * text scores near 0; a source with its own vocabulary scores high —
    * the number that tells you which source a mixture weight change will
    * actually move. Always well-defined without smoothing: every token a
    * source emits is in the corpus by construction, so p_c(t) > 0
    * wherever p_s(t) > 0.
    *
    * Scale shape: one shuffle to the (source, token) count grid, one
    * token-keyed aggregation for the corpus marginal that joins back on
    * the token key, one narrow per-source rollup. Nothing is collected
    * except the two scalar totals.
    *
    * @return (source, n_tokens, kl) — kl in nats, rounded
    */
  def sourceDivergence(
      df: org.apache.spark.sql.DataFrame,
      sourceCol: String,
      textCol: String,
      roundTo: Int = 4): org.apache.spark.sql.DataFrame = {
    // Staged (r20): the (source, token) grid feeds the corpus marginal,
    // the per-source totals, the scalar total AND the score join — four
    // consumers that each re-ran the tokenize+explode+aggregate chain
    // (exchange reuse only dedupes within one physical plan, and the
    // scalar total is its own job). Lazy checkpoint: the scalar-total job
    // below materializes the grid once; every later consumer reads the
    // blocks.
    val st = df.select(col(sourceCol).as("source"),
        explode(whitespaceTokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cs"))
      .localCheckpoint(false)
    val corpus = st.groupBy(col("tok")).agg(sum(col("cs")).as("cc"))
    val totals = st.groupBy(col("source")).agg(sum(col("cs")).as("ns"))
    val n = st.agg(sum(col("cs"))).head().getLong(0).toDouble
    st.join(corpus, Seq("tok")).join(totals, Seq("source"))
      .select(col("source"), col("ns"),
        ((col("cs").cast("double") / col("ns")) *
          log((col("cs").cast("double") / col("ns")) /
              (col("cc").cast("double") / lit(n)))).as("term"))
      .groupBy(col("source"))
      .agg(first(col("ns")).as("n_tokens"),
        round(sum(col("term")), roundTo).as("kl"))
  }

  /** DSIR-style importance weights ("Data Selection for Language Models
    * via Importance Resampling", Xie et al. 2023): score every document
    * by how much more likely its hashed-unigram bag is under the target
    * domain's token distribution than under the raw corpus distribution,
    *   logw(d) = Σ_b n_d(b) · (ln p̂_t(b) − ln p̂_r(b)),
    * over `buckets` hashed feature buckets with add-one smoothing. The
    * target domain is any row predicate (in the paper, a small
    * high-quality sample; here typically a language or source marker);
    * raw is the whole input. Downstream, resampling keeps the top weights
    * (or Gumbel-perturbed top-k) — the weight itself is the deliverable.
    *
    * The bucket hash is md5-prefix arithmetic (not Spark's internal
    * hash), so the features — and therefore the weights — are
    * engine-reproducible; the paper's hashing-trick property only needs
    * any fixed uniform hash.
    *
    * Scale shape: ONE tokenize pass builds the (doc, bucket) count grid
    * (materialized — both consumers below read it); both distributions
    * roll up from that grid as conditional sums (no second corpus scan),
    * and the bucket table is `buckets` rows — broadcast to the score
    * join, so the only wide shuffle is the grid aggregation itself. The
    * corpus totals are a 1-row driver aggregate. Documents with zero
    * tokens have no features and are absent from the output.
    *
    * @return (id, n_tokens, log_weight) — natural-log weight, rounded
    */
  def importanceWeights(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 256,
      roundTo: Int = 4): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Bucket derivation is a fused tight-loop kernel (r19): the previous
    // chain exploded token STRINGS and ran md5-hex + substring + base-16
    // conv per row; Kernels.tokenBuckets emits the identical
    // md5Hash60-mod values (see its scaladoc) as one long array per doc,
    // so only (id, is_tgt, bucket longs) ever reach the explode. Fenced:
    // a Generate over a UDF array would otherwise re-evaluate the kernel
    // in both the Generate and its input Project (the PlanAuditSpec-gated
    // duplication class).
    val grid = graft.util.PlanBarrier.fence(
        df.select(col(idCol).as("id"), targetPred.as("is_tgt"),
          Kernels.tokenBuckets(col(textCol), buckets).as("__bs")))
      .select(col("id"), col("is_tgt"), explode(col("__bs")).as("bucket"))
      .groupBy(col("id"), col("is_tgt"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      // lazy (r20): the corpus-totals aggregate below is the first action
      // and materializes the grid blocks in the same job
      .localCheckpoint(false)
    val dist = grid.groupBy(col("bucket")).agg(
      sum(col("n")).as("cr"),
      sum(when(col("is_tgt"), col("n")).otherwise(lit(0L))).as("ct"))
    val tot = dist.agg(sum(col("cr")), sum(col("ct"))).head()
    val nr = tot.getLong(0).toDouble
    val nt = tot.getLong(1).toDouble
    val k = buckets.toDouble
    grid.join(broadcast(dist), Seq("bucket"))
      .select(col("id"), col("n"),
        (col("n") * (log((col("ct") + lit(1.0)) / lit(nt + k)) -
                     log((col("cr") + lit(1.0)) / lit(nr + k)))).as("term"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_tokens"),
        round(sum(col("term")), roundTo).as("log_weight"))
  }

  /** Keep documents whose unigram NLL is at or below `maxNll` — the
    * filter stage of perplexity filtering. The score join moves only
    * (id, token); document text is semi-joined afterwards by id, so text
    * bytes are shuffled at most once regardless of width. */
  def perplexityFilter(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      maxNll: Double): org.apache.spark.sql.DataFrame = {
    val keep = unigramNll(df, idCol, textCol).where(col("nll") <= maxNll)
    df.join(keep.select(col("id").as(idCol)), Seq(idCol), "left_semi")
  }
}
