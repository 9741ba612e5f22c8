package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training/encoding vs an independent single-node reference
  * implementation (written here, from the algorithm statement in
  * Sennrich et al. 2016 — the same oracle style as ZOrderSpec's
  * bit-loop). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- independent naive reference ------------------------------------

  private type Word = Vector[String]

  private def naiveRewrite(w: Word, a: String, b: String): Word = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { out += (a + b); i += 2 }
      else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def naiveTrain(wordCounts: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Word, Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> c
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var stop = false
    while (round < k && !stop) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, c) =>
        w.sliding(2).foreach {
          case Vector(a, b) => stats((a, b)) = stats.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (stats.isEmpty) stop = true
      else {
        val ((a, b), c) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        vocab = vocab.groupMapReduce(kv => naiveRewrite(kv._1, a, b))(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }

  private def naiveEncode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var w: Word = word.map(_.toString).toVector :+ Bpe.EndOfWord
    var done = false
    while (!done && w.length > 1) {
      val cands = w.sliding(2).collect {
        case Vector(a, b) if ranks.contains((a, b)) => ((a, b), ranks((a, b)))
      }.toSeq
      if (cands.isEmpty) done = true
      else {
        val (a, b) = cands.minBy(_._2)._1
        w = naiveRewrite(w, a, b)
      }
    }
    w
  }

  // --- cases ----------------------------------------------------------

  test("train reproduces the paper's corpus merge-by-merge") {
    // Sennrich et al. 2016 §3.2 example vocabulary.
    val counts = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val corpus = counts.toSeq.zipWithIndex.map { case ((w, c), i) =>
      (i.toLong, (s"$w " * c.toInt).trim)
    }.toDF("doc_id", "text")

    val got = Bpe.train(corpus, "text", numMerges = 10)
    val want = naiveTrain(counts, 10)
    assert(got.map(m => (m.left, m.right, m.count)) == want)
    // First merge is (e, s) with weight 9 (newest 6 + widest 3); ties on
    // count 9 ((e,s),(s,t),(t,</w>)) break to the lexicographic min.
    assert((got.head.left, got.head.right, got.head.count) == ("e", "s", 9L))
    assert(got.head.merged == "es")
  }

  test("train matches the naive reference on a messier corpus, incl. early exhaustion") {
    val docs = Seq(
      (1L, "aa aa ab ba"), (2L, "abab aa b"), (3L, "b b a"), (4L, "  aa  "))
      .toDF("doc_id", "text")
    val counts = Map("aa" -> 4L, "ab" -> 1L, "ba" -> 1L, "abab" -> 1L,
      "b" -> 3L, "a" -> 1L)
    val got = Bpe.train(docs, "text", numMerges = 50)
    assert(got.map(m => (m.left, m.right, m.count)) == naiveTrain(counts, 50))
    // Every word fuses to one symbol before 50 merges: training stops.
    assert(got.length < 50)
    assert(got.map(_.rank) == got.indices)
  }

  test("encode matches the naive apply-time algorithm and reconstructs text") {
    val corpus = Seq((1L, "low low low lower newest newest widest"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap

    // Includes a word never seen in training ("lowest").
    val docs = Seq((1L, "low lower"), (2L, "lowest newest"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("id").collect()
    val wantToks = Seq("low lower", "lowest newest", "").map(
      _.split(" ").filter(_.nonEmpty).toVector.flatMap(naiveEncode(_, ranks)))
    assert(got.map(_.getString(2)).toSeq == wantToks.map(_.mkString(" ")))
    assert(got.map(_.getLong(1)).toSeq == wantToks.map(_.length.toLong))
    // Reconstruction: dropping the markers re-yields the original words.
    got.zip(Seq("low lower", "lowest newest", "")).foreach { case (row, txt) =>
      val rebuilt = row.getString(2).split(" ").filter(_.nonEmpty)
        .mkString("").replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt == txt.split(" ").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("in-memory incremental trainer and distributed fallback produce identical merges") {
    val docs = Seq(
      (1L, "aa aa ab ba"), (2L, "abab aa b"), (3L, "b b a"), (4L, "  aa  "),
      (5L, "low low lower newest newest widest banana bandana"))
      .toDF("doc_id", "text")
    val fast = Bpe.train(docs, "text", numMerges = 30) // in-memory path
    val dist = Bpe.train(docs, "text", numMerges = 30, maxDriverVocab = 0) // forced distributed
    assert(fast.map(m => (m.rank, m.left, m.right, m.count)) ==
      dist.map(m => (m.rank, m.left, m.right, m.count)))
  }

  test("incremental trainer handles count DECREASES of previously-seen pairs") {
    // Merging (a,a) on "aaa b"-style words lowers (a,b)'s count without
    // touching other words — the lazy-deletion heap must surface the
    // decreased value, not a stale one. Verified against the naive
    // reference over a corpus engineered to decrement counts.
    val counts = Map("aab" -> 10L, "aa" -> 9L, "ab" -> 8L, "ba" -> 7L, "bb" -> 3L)
    val corpus = counts.toSeq.zipWithIndex.map { case ((w, c), i) =>
      (i.toLong, (s"$w " * c.toInt).trim)
    }.toDF("doc_id", "text")
    val got = Bpe.train(corpus, "text", numMerges = 20)
    assert(got.map(m => (m.left, m.right, m.count)) == naiveTrain(counts, 20))
  }

  test("mergeOnce is the greedy non-overlapping scan") {
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "b", "b"), "a", "b") == Vector("ab", "b"))
    assert(Bpe.mergeOnce(Vector("x"), "a", "b") == Vector("x"))
  }

  test("initialPairCounts covers single-char words and the word-length guard") {
    val docs = Seq((1L, "a bc " + ("z" * 70))).toDF("doc_id", "text")
    val got = Bpe.initialPairCounts(docs, "text")
      .as[(String, String, Long)].collect().toSet
    // The 70-char word is dropped by the guard; "a" contributes only its
    // end-of-word pair.
    assert(got == Set(("a", Bpe.EndOfWord, 1L), ("b", "c", 1L),
      ("c", Bpe.EndOfWord, 1L)))
  }
}
