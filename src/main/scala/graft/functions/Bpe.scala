package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-construction stage of a training-data pipeline, as a
  * distributed corpus computation.
  *
  * Scale shape: the corpus collapses to the (word, count) vocabulary in
  * ONE wide shuffle, and every training iteration after that runs on the
  * vocabulary table — whose size is corpus-independent (unique words, not
  * tokens), so 100 TB of text costs the same per merge round as 1 GB
  * once the word counts exist. Each round is: explode adjacent symbol
  * pairs weighted by word count → one bounded aggregation → a 1-row
  * argmax collect → a per-word greedy rewrite. The vocabulary is
  * eagerly localCheckpoint'ed every round, so round k does not replay
  * rounds 1..k-1 (O(K) total work, and bounded lineage).
  *
  * Ties on pair count break lexicographically (left, then right symbol),
  * so the merge table is deterministic and engine-reproducible.
  */
object Bpe {

  /** One learned merge: rank is 0-based priority order. */
  final case class Merge(rank: Int, left: String, right: String, count: Long) {
    def merged: String = left + right
  }

  /** End-of-word marker symbol (its own symbol, per the paper, so word
    * boundaries survive subword merging and decoding is exact). */
  val EndOfWord = "</w>"

  /** Whitespace word counts with a pathological-length guard — the
    * corpus-collapse stage shared by training and the pair-stats query. */
  def wordCounts(df: DataFrame, textCol: String, maxWordLen: Int = 64): DataFrame =
    df.select(explode(TextFunctions.whitespaceTokens(col(textCol))).as("w"))
      .where(length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Initial symbol sequence of a word: characters plus [[EndOfWord]]. */
  private def initialSymbols(w: Column): Column =
    concat(split(w, ""), array(lit(EndOfWord)))

  /** Adjacent-pair stream of a symbol-sequence column (l, r structs). */
  private def adjacentPairs(syms: Column): Column =
    transform(sequence(lit(0), size(syms) - 2),
      i => struct(element_at(syms, i + 1).as("l"),
        element_at(syms, i + 2).as("r")))

  /** Weighted adjacent-pair counts over a (syms, c) vocabulary table —
    * the per-round statistics (and, on the initial character symbols,
    * the round-1 stats a SQL oracle can mirror). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      // Fully-fused words (1 symbol) have no pairs — and sequence(0, -1)
      // would descend, not produce an empty list.
      .where(size(col("syms")) >= 2)
      .select(col("c"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("c")).as("pair_count"))

  /** Round-1 pair statistics straight from text — the SQL-mirrorable
    * face of training (each subsequent round differs only in the symbol
    * table it counts over). */
  def initialPairCounts(df: DataFrame, textCol: String, maxWordLen: Int = 64): DataFrame =
    pairCounts(wordCounts(df, textCol, maxWordLen)
      .select(initialSymbols(col("w")).as("syms"), col("c")))

  /** Greedy left-to-right single-pair rewrite (the scan the paper's
    * `merge_vocab` does): non-overlapping occurrences of (a, b) fuse
    * into a+b. Tight JVM loop — the vocabulary table is bounded, but a
    * fold via the `aggregate` HOF would still interpret an expression
    * tree per symbol per round. */
  private[functions] def mergeOnce(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges on the corpus. Returns the ordered merge
    * table (bounded by `numMerges` — inherently driver-sized: each round
    * ends in a 1-row argmax regardless of corpus scale). Stops early if
    * every word has fused to a single symbol.
    *
    * Scale shape — BOTH dimensions:
    *  - CORPUS: collapses to the (word, count) vocabulary in one wide
    *    shuffle; everything after is corpus-size-independent (unique
    *    words, not tokens).
    *  - MERGES: when the vocabulary fits `maxDriverVocab` (the common
    *    case — unique whitespace words ≤ a few million even at 100 TB of
    *    natural text), the merge loop runs INCREMENTALLY in driver
    *    memory: a pair→count table, a pair→words index, and a
    *    lazy-deletion heap, exactly the structure single-node tokenizer
    *    trainers use. Each merge touches only the words containing the
    *    merged pair — O(affected) work, no Spark job — so 32k merges is
    *    seconds, not 32k sequential cluster round-trips. Semantics are
    *    IDENTICAL to the sequential formulation (same argmax, same
    *    (count desc, left, right) tie-break), verified by BpeSpec.
    *  - Oversized vocabularies fall back to the distributed per-round
    *    loop (one bounded aggregation + rewrite per merge, prior
    *    checkpoint unpersisted each round).
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWordLen: Int = 64,
      maxDriverVocab: Int = 2000000): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    val wc = wordCounts(df, textCol, maxWordLen)
    // Size probe and fast-path collect in one action: ≤ maxDriverVocab
    // rows means the limit returned the WHOLE vocabulary.
    val probe =
      if (maxDriverVocab > 0) wc.limit(maxDriverVocab + 1).collect() else Array.empty[org.apache.spark.sql.Row]
    if (maxDriverVocab > 0 && probe.length <= maxDriverVocab) {
      val words = probe.map { row =>
        val w = row.getString(0)
        (w.map(_.toString).toArray :+ EndOfWord, row.getLong(1))
      }
      trainInMemory(words, numMerges)
    } else trainDistributed(wc, numMerges)
  }

  /** Distributed fallback merge loop for vocabularies beyond driver
    * memory: per round one bounded pair aggregation, a 1-row argmax, and
    * a map-side rewrite, with the vocabulary localCheckpoint'ed so round
    * k does not replay rounds 1..k-1. The PREVIOUS round's checkpoint is
    * unpersisted once the new one materializes — block-manager storage
    * stays O(1) vocabulary copies, not O(numMerges). */
  private def trainDistributed(wc: DataFrame, numMerges: Int): Seq[Merge] = {
    var vocab = wc
      .select(initialSymbols(col("w")).as("syms"), col("c"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val best = top(0)
        val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += Merge(rank, l, r, c)
        val doMerge = udf((syms: Seq[String]) =>
          mergeOnce(syms.toIndexedSeq, l, r))
        val prev = vocab
        vocab = prev
          .select(doMerge(col("syms")).as("syms"), col("c"))
          .localCheckpoint(true) // eager: materialized before prev goes away
        prev.unpersist()
        rank += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Incremental in-memory merge loop over a complete (symbols, count)
    * vocabulary — the classic single-node BPE trainer structure:
    *
    *  - `pairCount`: current weighted count of every adjacent pair;
    *  - `pairWords`: which word indices currently contain each pair;
    *  - a max-heap ordered (count desc, left asc, right asc) with LAZY
    *    deletion — entries are validated against `pairCount` when
    *    popped, stale ones discarded.
    *
    * Per merge only the words containing the winning pair are rewritten
    * (their old pairs decremented, new pairs incremented), so total work
    * is O(sum of affected-word lengths), independent of merge count ×
    * vocabulary size. Produces the exact sequential-BPE merge sequence. */
  private[functions] def trainInMemory(
      words: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(_._1)
    val cnt: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // (count, l, r): max count wins; ties break to the LEXICOGRAPHICALLY
    // SMALLEST (l, r) — i.e. smaller strings compare GREATER here.
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val l = y._2.compareTo(x._2)
          if (l != 0) l else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    // Every count CHANGE (increment or decrement) enqueues the new value:
    // lazy deletion only works if the current value of a live pair is
    // always somewhere in the heap — stale (older) entries are discarded
    // at pop time by comparing against `pairCount`.
    def applyDelta(p: (String, String), delta: Long): Long = {
      val nv = pairCount.getOrElse(p, 0L) + delta
      if (nv <= 0L) pairCount.remove(p) else pairCount(p) = nv
      if (nv > 0L) heap.enqueue((nv, p._1, p._2))
      nv
    }
    def bump(p: (String, String), delta: Long, wi: Int, add: Boolean): Unit = {
      applyDelta(p, delta)
      if (add) pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
    }

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi); var i = 0
      while (i < s.length - 1) { bump((s(i), s(i + 1)), cnt(wi), wi, add = true); i += 1 }
      wi += 1
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // Pop until a live entry (count matches the current table) surfaces.
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val t = heap.dequeue()
        if (pairCount.get((t._2, t._3)).contains(t._1)) best = t
      }
      if (best == null) exhausted = true
      else {
        val (c, l, r) = best
        merges += Merge(rank, l, r, c)
        val affected = pairWords.get((l, r)).map(_.toArray).getOrElse(Array.empty)
        java.util.Arrays.sort(affected)
        affected.foreach { w =>
          val old = syms(w); val wcnt = cnt(w)
          var i = 0
          while (i < old.length - 1) {
            val p = (old(i), old(i + 1))
            applyDelta(p, -wcnt)
            pairWords.get(p).foreach(_ -= w)
            i += 1
          }
          val nw = mergeOnce(old.toIndexedSeq, l, r).toArray
          syms(w) = nw
          i = 0
          while (i < nw.length - 1) { bump((nw(i), nw(i + 1)), wcnt, w, add = true); i += 1 }
        }
        pairCount.remove((l, r))
        pairWords.remove((l, r))
        rank += 1
      }
    }
    merges.result()
  }

  /** Merge table as a DataFrame (for persisting the tokenizer as data). */
  def mergesDF(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.merged, m.count))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode a word with a trained rank map: repeatedly rewrite the
    * lowest-rank adjacent pair present (greedy left-to-right within a
    * rank), until no learned pair remains — the paper's apply-time
    * algorithm. Tight loop; O(len · merges-applied). */
  private[functions] def encodeWord(word: String, ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] =
      word.map(_.toString).toIndexedSeq :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = mergeOnce(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Tokenize documents with a trained merge list: per word, the
    * apply-time BPE; per document, the concatenation of word subword
    * sequences (each word ends in its [[EndOfWord]]-bearing symbol).
    * Pure map-side — the rank map (bounded by the merge count) rides
    * the closure to every executor.
    *
    * @return (id, n_subwords, subwords) — subwords space-joined,
    *         engine-stable
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf { (text: String) =>
      if (text == null) null
      else text.split(" ").filter(_.nonEmpty).toIndexedSeq
        .flatMap(w => encodeWord(w, ranks))
    }
    df.select(col(idCol).as("id"), enc(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).cast("long").as("n_subwords"),
        concat_ws(" ", col("toks")).as("subwords"))
  }
}
