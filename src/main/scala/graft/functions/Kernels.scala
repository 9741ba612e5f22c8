package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Tight-loop JVM kernels for per-row array math.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback expressions: every element evaluates an interpreted
  * expression tree, and `zip_with` allocates an intermediate array per
  * step — O(tokens x bits) allocations for a simhash. These kernels do the
  * same math as a single JVM loop behind a Scala UDF (the middle tier of
  * the preference order: native Expression > Scala UDF > interpreted HOF
  * for this shape). Where a kernel backs an oracle-checked query (cosine),
  * the loop preserves the exact left-to-right double fold order of the
  * HOF formulation so results stay bit-identical.
  */
object Kernels {

  /** splitmix64 finalizer: turns a weak 32-bit hash into 64 mixed bits. */
  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit token hash (deterministic, engine-internal). */
  @inline def tokenHash64(t: String): Long =
    mix64(scala.util.hashing.MurmurHash3.stringHash(t).toLong)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits (15 hex chars) of the MD5 of the UTF-8 bytes: a
    * CROSS-ENGINE token hash — any SQL engine with md5() reproduces it
    * exactly (DuckDB: `CAST(('0x' || substring(md5(t), 1, 15)) AS
    * BIGINT)`), which is what lets the MinHash/SimHash/LSH pipelines be
    * verified against a SQL oracle instead of rows-only checks. Always
    * non-negative (< 2^60). */
  def md5Hash60(t: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** SimHash bitmap over tokens: signed per-bit votes, sign -> bit.
    * Token hashes are [[md5Hash60]] (60 usable bits), so the bitmap is
    * reproducible in a SQL oracle bit-for-bit. */
  def simhash(tokens: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 60, "simhash supports 1..60 bits")
    val f = udf { (toks: Seq[String]) =>
      if (toks == null) null.asInstanceOf[java.lang.Long]
      else {
        val votes = new Array[Int](bits)
        val it = toks.iterator
        while (it.hasNext) {
          val h = md5Hash60(it.next())
          var i = 0
          while (i < bits) {
            if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
        var sig = 0L
        var i = 0
        while (i < bits) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
        java.lang.Long.valueOf(sig)
      }
    }
    f(tokens)
  }

  /** MinHash signature over mod-p shingle hashes with (a*h+b) mod p. */
  def minhashSignature(hashes: Column, as: Array[Long], bs: Array[Long], p: Long): Column = {
    val n = as.length
    val f = udf { (hs: Seq[Long]) =>
      if (hs == null) null
      else {
        val sig = Array.fill(n)(p)
        val it = hs.iterator
        while (it.hasNext) {
          val h = it.next()
          var i = 0
          while (i < n) {
            val v = (as(i) * h + bs(i)) % p
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        sig
      }
    }
    f(hashes)
  }

  /** Fused shingle + MinHash kernel: word k-shingle hashes (polynomial
    * combine of token hashes over a sliding window — no shingle string is
    * ever materialized) deduplicated, plus the (a*h+b) mod p signature,
    * in one pass. Returns struct(_1 = distinct shingle hashes asc,
    * _2 = signature). Docs shorter than k get one whole-doc shingle,
    * mirroring [[DedupFunctions.shingles]].
    *
    * Every step is cross-engine arithmetic: token hash = [[md5Hash60]]
    * mod p, shingle hash = poly fold `h = (h*1000003 + th) % p` from 0,
    * signature = min of `(a*h + b) % p` — all exactly reproducible in a
    * SQL oracle (no JVM-only murmur3/xxhash64 in the signature path).
    */
  def shingleMinhash(
      tokens: Column, k: Int, as: Array[Long], bs: Array[Long], p: Long): Column = {
    val nh = as.length
    val f = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        val n = toks.length
        val th = new Array[Long](n)
        var i = 0
        while (i < n) { th(i) = md5Hash60(toks(i)) % p; i += 1 }
        val m = if (n >= k) n - k + 1 else 1
        val win = math.min(k, n)
        val hs = new Array[Long](m)
        var s = 0
        while (s < m) {
          var h = 0L
          var j = 0
          while (j < win) { h = (h * 1000003L + th(s + j)) % p; j += 1 }
          hs(s) = h
          s += 1
        }
        java.util.Arrays.sort(hs)
        var distinct = 0
        i = 0
        while (i < m) {
          if (i == 0 || hs(i) != hs(i - 1)) { hs(distinct) = hs(i); distinct += 1 }
          i += 1
        }
        val sh = java.util.Arrays.copyOf(hs, distinct)
        val sig = Array.fill(nh)(p)
        i = 0
        while (i < distinct) {
          val h = sh(i)
          var b = 0
          while (b < nh) {
            val v = (as(b) * h + bs(b)) % p
            if (v < sig(b)) sig(b) = v
            b += 1
          }
          i += 1
        }
        (sh, sig)
      }
    }
    f(tokens)
  }

  /** LSH band buckets for a minhash signature: one bucket per band, each
    * the polynomial fold `acc = (acc*1000003 + v) % p` (from acc = 0)
    * over that band's contiguous signature slice. Pure modular
    * arithmetic, so a SQL oracle reproduces the buckets exactly
    * (DuckDB: `list_reduce(sig[lo:hi], (a, b) -> (a*1000003 + b) % p)`
    * — first-element init equals fold-from-0 because 0*K + v = v).
    * Returns array<long> of length `numBands`. */
  def polyBandBuckets(sig: Column, numBands: Int, p: Long): Column = {
    val f = udf { (s: Seq[Long]) =>
      if (s == null) null
      else {
        val rows = s.length / numBands
        Array.tabulate(numBands) { b =>
          var acc = 0L
          var i = 0
          while (i < rows) { acc = (acc * 1000003L + s(b * rows + i)) % p; i += 1 }
          acc
        }
      }
    }
    f(sig)
  }

  /** Distinct word k-shingle strings in one pass: single-space split,
    * drop empty tokens, join each k-window with spaces, keep first
    * occurrence. Output is identical to
    * `array_distinct(DedupFunctions.shingles(whitespaceTokens(c), k))`
    * (docs shorter than k yield one whole-doc shingle), but runs as a
    * single JVM loop instead of the `transform`/`sequence`/`concat_ws`
    * HOF chain, which is CodegenFallback — interpreted per shingle with
    * per-element boxing (measured ~10x slower at sf0.1). */
  def distinctShingles(text: Column, k: Int): Column = {
    require(k >= 1, "shingle size must be >= 1")
    val f = udf { (s: String) =>
      val raw = if (s == null) Array.empty[String] else s.split(" ", -1)
      val toks = new Array[String](raw.length)
      var nt = 0
      var i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { toks(nt) = raw(i); nt += 1 }
        i += 1
      }
      if (nt < k) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < nt) { if (j > 0) sb.append(' '); sb.append(toks(j)); j += 1 }
        Array(sb.toString)
      } else {
        val seen = new java.util.LinkedHashSet[String]
        var s0 = 0
        while (s0 <= nt - k) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(s0 + j)); j += 1 }
          seen.add(sb.toString)
          s0 += 1
        }
        seen.toArray(new Array[String](seen.size))
      }
    }
    f(text)
  }

  /** Shared window-emission loop: the k-token sliding windows of
    * toks[0, nt), with the whole-doc window of short documents (m = 1,
    * win = min(k, nt) — an empty doc emits one "" window). Both
    * [[allShingles]] and the cascade's fused stage windowing
    * (`DedupFunctions.composeSpanWindows`) emit THROUGH this one loop:
    * the cascade's single-k equivalence law depends on byte-identical
    * windows, so the short/empty-doc semantics must be structurally
    * unable to drift apart. */
  private[functions] def windowsOf(toks: Array[String], nt: Int, k: Int): Array[String] = {
    val m = if (nt >= k) nt - k + 1 else 1
    val win = math.min(k, nt)
    val out = new Array[String](m)
    var s0 = 0
    while (s0 < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < win) { if (j > 0) sb.append(' '); sb.append(toks(s0 + j)); j += 1 }
      out(s0) = sb.toString
      s0 += 1
    }
    out
  }

  /** ALL word k-shingle strings (non-distinct, document order): the
    * multiset variant of [[distinctShingles]], for repetition metrics
    * where gram frequencies matter. Same short-doc semantics (one
    * whole-doc shingle when tokens < k). */
  def allShingles(text: Column, k: Int): Column = {
    require(k >= 1, "shingle size must be >= 1")
    val f = udf { (s: String) =>
      val raw = if (s == null) Array.empty[String] else s.split(" ", -1)
      val toks = new Array[String](raw.length)
      var nt = 0
      var i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { toks(nt) = raw(i); nt += 1 }
        i += 1
      }
      windowsOf(toks, nt, k)
    }
    f(text)
  }

  /** Hashed-unigram feature buckets in ONE pass (round 19): single-space
    * split dropping empties, each token mapped to
    * `md5Hash60(token) mod buckets` — value-identical to the column chain
    * `pmod(conv(substring(md5(tok), 1, 15), 16, 10) mod buckets)` (the
    * hash is non-negative, so mod == pmod), which built a hex string, a
    * decimal string and a substring PER TOKEN through three codegen'd
    * expressions. One thread-local MessageDigest, no intermediate
    * strings. */
  def tokenBuckets(text: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    val f = udf { (s: String) =>
      val raw = if (s == null) Array.empty[String] else s.split(" ", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Long](raw.length)
      var i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) out += md5Hash60(raw(i)) % buckets
        i += 1
      }
      out.toArray
    }
    f(text)
  }

  /** Adjacent token bigrams in ONE pass (round 19): single-space split
    * dropping empties, then (tk(i), tk(i+1)) pairs in document order —
    * value-identical to the `transform(sequence(0, size-2), i ->
    * struct(element_at ...))` HOF chain (CodegenFallback, interpreted
    * with per-element boxing), with fewer than two tokens yielding an
    * empty array (the caller's explode drops those docs either way). */
  def bigramPairs(text: Column): Column = {
    val f = udf { (s: String) =>
      val raw = if (s == null) Array.empty[String] else s.split(" ", -1)
      val toks = new Array[String](raw.length)
      var nt = 0
      var i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { toks(nt) = raw(i); nt += 1 }
        i += 1
      }
      if (nt < 2) Array.empty[(String, String)]
      else {
        val out = new Array[(String, String)](nt - 1)
        var j = 0
        while (j < nt - 1) { out(j) = (toks(j), toks(j + 1)); j += 1 }
        out
      }
    }
    f(text)
  }

  /** Gopher quality stats in ONE pass over the text (round 19): returns
    * a struct (_1 n_words, _2 mean_word_len, _3 alpha_word_ratio,
    * _4 distinct_word_ratio) value-identical to the HOF formulation —
    * single-space split dropping empties; word length in CODE POINTS
    * (Spark `length()` counts code points, not UTF-16 units); alpha =
    * contains an ASCII letter (the `rlike("[A-Za-z]")` contract);
    * distinct by string equality; every ratio the same integer-count
    * double division (n = 0 divides to NaN exactly like the column
    * expression). Replaces four interpreted CodegenFallback HOF chains
    * (aggregate/transform/filter/array_distinct) that each re-walked the
    * token array per row. */
  def qualityStats(text: Column): Column = {
    val f = udf { (s: String) =>
      val raw = if (s == null) Array.empty[String] else s.split(" ", -1)
      var n = 0L
      var sumLen = 0L
      var alpha = 0L
      val seen = new java.util.HashSet[String]
      var i = 0
      while (i < raw.length) {
        val w = raw(i)
        if (w.nonEmpty) {
          n += 1
          sumLen += w.codePointCount(0, w.length)
          var hasAlpha = false
          var j = 0
          while (j < w.length && !hasAlpha) {
            val c = w.charAt(j)
            if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
            j += 1
          }
          if (hasAlpha) alpha += 1
          seen.add(w)
        }
        i += 1
      }
      val nd = n.toDouble
      (n, sumLen.toDouble / nd, alpha.toDouble / nd, seen.size.toDouble / nd)
    }
    f(text)
  }

  /** Cosine similarity in double precision. Fold order is ascending index
    * (identical to the `aggregate`/`zip_with` formulation and to the
    * DuckDB oracle's list_sum over list_transform), so results are
    * bit-exact across all three. */
  def cosine(a: Column, b: Column): Column = {
    val f = udf { (x: Seq[Float], y: Seq[Float]) =>
      if (x == null || y == null) null.asInstanceOf[java.lang.Double]
      else {
        val n = math.min(x.length, y.length)
        var dot = 0.0
        var nx = 0.0
        var ny = 0.0
        var i = 0
        while (i < n) {
          val xi = x(i).toDouble
          val yi = y(i).toDouble
          dot += xi * yi
          nx += xi * xi
          ny += yi * yi
          i += 1
        }
        java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
      }
    }
    f(a, b)
  }

  /** 2-D Hilbert curve index of a (x, y) cell pair in a 2^bits x 2^bits
    * grid — the better-locality alternative to the Morton interleave for
    * layout clustering (every consecutive pair of Hilbert indices is a
    * grid 4-neighbor; Morton jumps). The standard iterative
    * quadrant-rotation algorithm; a kernel rather than column math
    * because the per-step rotation feeds (x, y) state into the next
    * step — as a Column tree, 16 self-referencing steps explode
    * exponentially under CollapseProject. Used by layout REWRITES (a
    * one-off job per table), not hot query paths. Reproducible
    * cross-engine: the catalog oracle replays the identical integer
    * steps as chained SQL CTEs. */
  def hilbertIndex(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "hilbert bits must be in [1, 31]")
    val n = 1L << bits
    val f = udf { (xIn: java.lang.Long, yIn: java.lang.Long) =>
      if (xIn == null || yIn == null) null.asInstanceOf[java.lang.Long]
      else {
        var x = xIn.longValue() & (n - 1)
        var y = yIn.longValue() & (n - 1)
        var d = 0L
        var s = n >> 1
        while (s > 0) {
          val rx = if ((x & s) > 0) 1L else 0L
          val ry = if ((y & s) > 0) 1L else 0L
          d += s * s * ((3L * rx) ^ ry)
          // rotate quadrant
          if (ry == 0L) {
            if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
            val t = x; x = y; y = t
          }
          s >>= 1
        }
        java.lang.Long.valueOf(d)
      }
    }
    f(xCol, yCol)
  }
}
